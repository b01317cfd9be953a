"""Best-effort protobuf enablement for transformWithStateInPandas (TWS).

The TWS Python worker speaks protobuf to the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), so TWS needs an
importable ``google.protobuf`` in BOTH the driver process and every
Python worker.  This container has no installed protobuf, but a
pure-python protobuf runtime ships inside the preinstalled Google Cloud
SDK's App Engine platform directory.  This module wires it in, opt-out
by absence:

- **current process**: append the App Engine dir to ``sys.path`` (append,
  never prepend — real site-packages always win) and relax the
  gencode/runtime cross-version validator (PySpark's gencode is 6.33.0,
  the vendored runtime 6.32.0 — one minor step outside protobuf's formal
  guarantee; the StateMessage wire format is unchanged across it, and
  ``tools/check_tws.py`` verifies the full TWS round-trip end-to-end).
- **future worker processes**: put ``tools/tws_pythonpath`` (which holds a
  ``sitecustomize.py`` doing the same two steps) on ``PYTHONPATH`` so the
  workers the JVM spawns inherit it.  This must happen BEFORE the
  SparkSession (and thus the JVM) is created — ``session.get_spark``
  calls :func:`ensure_protobuf` first.

Everything is existence-gated: on hosts with a real protobuf install the
first import succeeds and nothing is touched; on hosts with neither, the
returned reason string feeds the loud environment-gap report.
"""

from __future__ import annotations

import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tools",
    "tws_pythonpath",
)


def _probe() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except Exception:
        return False


def ensure_protobuf() -> str | None:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns ``None`` when protobuf is usable (natively or via the App
    Engine shim), else a human-readable reason for the gap.
    """
    if not _probe():
        if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
            return (
                "google.protobuf is unusable in this container (no install "
                f"and no App Engine shim at {_APPENGINE}) — the TWS Python "
                "worker speaks protobuf to the JVM state server, so "
                "transformWithStateInPandas cannot start."
            )
        if _APPENGINE not in sys.path:
            sys.path.append(_APPENGINE)
        if not _probe():
            return (
                "google.protobuf failed to import even from the App Engine "
                f"shim dir {_APPENGINE}."
            )
    # Relax the gencode>runtime version check (see module docstring); a
    # no-op when versions already agree or the module is absent.
    try:
        from google.protobuf import runtime_version as _rv

        if not getattr(_rv.ValidateProtobufRuntimeVersion, "_tws_lenient", False):
            _orig = _rv.ValidateProtobufRuntimeVersion

            def _lenient(gen_domain, gen_major, gen_minor, gen_patch,
                         gen_suffix, location):
                try:
                    _orig(gen_domain, gen_major, gen_minor, gen_patch,
                          gen_suffix, location)
                except _rv.VersionError:
                    # Suppress ONLY the documented skew: same major,
                    # gencode exactly one minor ahead of the runtime
                    # (6.33 gencode on the App Engine 6.32 runtime). Any
                    # other violation is a genuine incompatibility and
                    # must propagate.
                    if not (gen_major == _rv.MAJOR
                            and gen_minor == _rv.MINOR + 1):
                        raise
                    import warnings

                    warnings.warn(
                        "Suppressing known protobuf gencode/runtime skew "
                        f"{gen_major}.{gen_minor}.{gen_patch} on "
                        f"{_rv.MAJOR}.{_rv.MINOR}.{_rv.PATCH} at {location}",
                        stacklevel=2,
                    )

            _lenient._tws_lenient = True
            _rv.ValidateProtobufRuntimeVersion = _lenient
    except Exception:
        pass
    # Workers: sitecustomize on PYTHONPATH replays the same steps in every
    # Python process the JVM spawns.  Only effective for JVMs started after
    # this point — get_spark calls us before building the session.
    if os.path.isdir(_SHIM_DIR):
        parts = os.environ.get("PYTHONPATH", "")
        if _SHIM_DIR not in parts.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _SHIM_DIR + (os.pathsep + parts if parts else "")
            )
    return None
