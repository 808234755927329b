"""Worker-side protobuf fallback (see batch_data_pipeline_exercise_spark/compat.py).

This directory is placed on PYTHONPATH before the Spark JVM launches;
Python imports ``sitecustomize`` automatically at interpreter startup,
so every spawned Python worker gets the same bundled-protobuf fallback
as the driver. Self-contained on purpose — workers may not have the
repo root on sys.path yet when this runs.

Subtlety: the JVM puts the spark-core JAR itself on the worker's
PYTHONPATH, and that jar contains a ``google/`` resource directory —
so a bare ``import google.protobuf`` can "succeed" as an EMPTY
namespace package (``__file__`` is None, no ``descriptor`` inside).
Importability alone is therefore not the test; a real runtime has a
``__file__``. A regular package (the vendored copy, which has an
``__init__.py``) always beats a namespace portion during resolution,
whatever the sys.path order, so appending the vendored dir and
re-importing yields the real module.
"""

import os
import sys

_KNOWN = ("/usr/lib/google-cloud-sdk/platform/google_appengine",)


def _real_protobuf() -> bool:
    try:
        import google.protobuf as _gp
    except ImportError:
        return False
    return getattr(_gp, "__file__", None) is not None


if not _real_protobuf():
    for _d in _KNOWN:
        if not os.path.isdir(os.path.join(_d, "google", "protobuf")):
            continue
        # drop the bare-namespace module so the re-import resolves the
        # regular package portion instead of the cached empty one
        sys.modules.pop("google.protobuf", None)
        sys.path.append(_d)
        if not _real_protobuf():
            sys.path.remove(_d)
            continue
        try:
            from google.protobuf import runtime_version as _rv

            if not getattr(_rv, "__bdpe_lenient__", False):
                _orig = _rv.ValidateProtobufRuntimeVersion

                def _lenient(domain, major, minor, patch, suffix, location):
                    try:
                        _orig(domain, major, minor, patch, suffix, location)
                    except _rv.VersionError:
                        pass

                _rv.ValidateProtobufRuntimeVersion = _lenient
                _rv.__bdpe_lenient__ = True
        except ImportError:
            pass
        break
