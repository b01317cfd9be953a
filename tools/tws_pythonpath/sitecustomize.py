"""Opt-in shim making transformWithStateInPandas runnable in this container.

The TWS Python worker speaks protobuf to the JVM state server, but this
container has no installed ``google.protobuf``. A pure-python protobuf
runtime (6.32.0) ships inside the preinstalled Google Cloud SDK's App
Engine platform dir; PySpark's generated ``StateMessage_pb2`` is built
with gencode 6.33.0, one minor version ahead, which only trips the
conservative cross-version validator — the wire format and descriptor
APIs are unchanged across that skew (protobuf's own guarantee covers
same-major gencode<=runtime; 6.33->6.32 is one step outside, accepted
here deliberately and verified by the round-trip in tools/check_tws.py).

Activate by putting this DIRECTORY on PYTHONPATH before starting Spark
(driver and workers both inherit it):

    PYTHONPATH=/root/repo/tools/tws_pythonpath python tools/check_tws.py
"""

import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
if _APPENGINE not in sys.path:
    # append, not prepend: never shadow real site-packages
    sys.path.append(_APPENGINE)

try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix,
                 location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix,
                  location)
        except _rv.VersionError:
            # Only the documented one-minor-ahead same-major skew (6.33
            # gencode on the 6.32 App Engine runtime) is accepted; any
            # other violation is real and must propagate.
            if not (gen_major == _rv.MAJOR and gen_minor == _rv.MINOR + 1):
                raise
            import warnings

            warnings.warn(
                "Suppressing known protobuf gencode/runtime skew "
                f"{gen_major}.{gen_minor}.{gen_patch} on "
                f"{_rv.MAJOR}.{_rv.MINOR}.{_rv.PATCH} at {location}",
                stacklevel=2,
            )

    _rv.ValidateProtobufRuntimeVersion = _lenient
except Exception:  # pragma: no cover - no protobuf at all: stay silent
    pass
