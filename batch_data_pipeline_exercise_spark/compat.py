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
must load at interpreter startup — ``worker_env_conf()`` returns a
``spark.executorEnv.PYTHONPATH`` entry pointing at ``PBSHIM_DIR``
(which holds a self-contained ``sitecustomize.py``); Spark ships
``spark.executorEnv.*`` to every Python worker it launches (pyspark
``core/context.py`` folds them into ``sc.environment``, which becomes
the worker env), so the shim applies in workers WITHOUT mutating this
process's environment — an ``os.environ['PYTHONPATH']`` mutation would
leak the sitecustomize (and its lenient version-check patch) into every
subsequently spawned Python process, Spark or not.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

#: places a pure-Python google.protobuf may be vendored on an image
#: that has no installed copy (list order = preference)
KNOWN_PROTOBUF_DIRS = ("/usr/lib/google-cloud-sdk/platform/google_appengine",)

#: RETIREMENT CHECK (round 9, 2026-08-15): still required on the pinned
#: stack. pyspark 4.1.2's generated StateMessage_pb2 calls
#: ValidateProtobufRuntimeVersion(PUBLIC, 6, 33, 0) while the image has
#: NO installed google.protobuf (`import google` → ModuleNotFoundError)
#: and the only discoverable runtime is the cloud-sdk-bundled 6.32.0 —
#: so BOTH halves stay: the PYTHONPATH fallback (makes protobuf
#: importable at all) and the lenient check (6.32.0 runtime < 6.33.0
#: gencode raises VersionError otherwise). Delete the shim only when
#: the image ships google.protobuf >= 6.33.0.

#: directory whose sitecustomize.py applies this fallback in worker
#: interpreters when present on PYTHONPATH — shipped INSIDE the package
#: so an installed distribution works without the tests tree
PBSHIM_DIR = str(Path(__file__).resolve().parent / "_pbshim")

#: set by ensure_protobuf(): True only when the vendored fallback (not
#: an installed runtime) is what made google.protobuf importable —
#: workers need the shim exactly in that case
_fallback_active = False


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
    global _fallback_active
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
        _fallback_active = True
        return True
    return False


def worker_env_conf() -> dict[str, str]:
    """Spark conf exposing the fallback to Python workers — scoped.

    Returns ``{"spark.executorEnv.PYTHONPATH": PBSHIM_DIR}`` when (and
    only when) the driver needed the vendored fallback; empty otherwise
    (a real installed runtime is visible to workers the normal way).
    Spark merges this entry into each Python worker's PYTHONPATH
    (PythonWorkerFactory merges envVars' PYTHONPATH with the process
    one), where the shim's sitecustomize.py runs at interpreter startup.
    Must be applied at session build time — ``spark.executorEnv.*`` is
    read when the SparkContext is created.
    """
    ensure_protobuf()
    return {"spark.executorEnv.PYTHONPATH": PBSHIM_DIR} if _fallback_active else {}
