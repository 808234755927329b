"""Optional-dependency fallbacks.

``google.protobuf`` is required by Spark 4's transformWithStateInPandas
state protocol (the JVM↔Python state client speaks protobuf) but is not
a pyspark install dependency, so minimal container images ship without
it. Some of those images DO ship a pure-Python protobuf inside other
vendored tooling (e.g. the google-cloud-sdk bundles one under a proper
``google.protobuf`` namespace). ``ensure_protobuf()`` makes the
dependency importable from such a bundled copy when no installed one
exists — with a lenient gencode-version check, since a bundled runtime
one minor version behind pyspark's generated code is an environmental
skew, not a wire-format change (serialized FileDescriptorProto is
stable across those versions).

Driver side: call ``ensure_protobuf()`` before building the session.
Worker side: Python workers are separate interpreters, so the fallback
must load at interpreter startup — put ``PBSHIM_DIR`` (which holds a
self-contained ``sitecustomize.py``) on ``PYTHONPATH`` before the JVM
launches and every spawned worker applies it automatically.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

#: places a pure-Python google.protobuf may be vendored on an image
#: that has no installed copy (list order = preference)
KNOWN_PROTOBUF_DIRS = ("/usr/lib/google-cloud-sdk/platform/google_appengine",)

#: directory whose sitecustomize.py applies this fallback in worker
#: interpreters when present on PYTHONPATH
PBSHIM_DIR = str(Path(__file__).resolve().parent.parent / "tests" / "pbshim")


def _patch_lenient_version_check() -> None:
    """Downgrade a gencode-newer-than-runtime VersionError to a no-op.

    Only ever applied to a *fallback* (bundled) runtime: pyspark's
    generated StateMessage_pb2 pins the protoc version it was built
    with, and a bundled 6.x runtime one minor behind parses the same
    serialized descriptors. A real installed protobuf is never patched.
    """
    from google.protobuf import runtime_version as rv

    if getattr(rv, "__bdpe_lenient__", False):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def lenient(domain, major, minor, patch, suffix, location):  # noqa: ANN001
        try:
            orig(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            pass  # same-major skew on a bundled runtime: tolerated

    rv.ValidateProtobufRuntimeVersion = lenient
    rv.__bdpe_lenient__ = True


def _real_protobuf_importable() -> bool:
    """True only for a REAL runtime, not a bare namespace package.

    Jars and resource dirs on sys.path can contain a ``google/``
    directory (the spark-core jar does), making ``import
    google.protobuf`` "succeed" as an empty namespace package with
    ``__file__ = None`` and no ``descriptor`` inside. A real runtime —
    installed or vendored — is a regular package with ``__file__``.
    """
    try:
        import google.protobuf as gp
    except ImportError:
        return False
    return getattr(gp, "__file__", None) is not None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; True if it is (or became so).

    Prefers an installed copy untouched; otherwise appends the first
    known vendored location that actually contains ``google/protobuf``
    and relaxes its version check. A regular package beats a namespace
    portion during resolution whatever the sys.path order, so the
    vendored copy wins over jar resource dirs but never over a real
    installed copy.
    """
    if _real_protobuf_importable():
        return True
    for d in KNOWN_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        # drop any cached bare-namespace module so the re-import
        # resolves the regular package portion
        sys.modules.pop("google.protobuf", None)
        sys.path.append(d)
        if not _real_protobuf_importable():
            sys.path.remove(d)
            continue
        _patch_lenient_version_check()
        return True
    return False


def propagate_protobuf_to_workers() -> None:
    """Expose the fallback to Spark Python workers.

    Must run BEFORE the JVM starts (workers inherit the driver
    process's environment in local mode). Prepends the pbshim dir —
    whose sitecustomize.py re-applies ``ensure_protobuf()`` at worker
    interpreter startup — to PYTHONPATH. No-op if already present.
    """
    existing = os.environ.get("PYTHONPATH", "")
    if PBSHIM_DIR in existing.split(os.pathsep):
        return
    os.environ["PYTHONPATH"] = (
        PBSHIM_DIR + (os.pathsep + existing if existing else "")
    )
