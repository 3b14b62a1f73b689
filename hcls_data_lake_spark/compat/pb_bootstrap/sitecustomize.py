"""google.protobuf activation bootstrap — runs in EVERY Python process
whose PYTHONPATH leads with this directory (Python's `site` imports
`sitecustomize` from sys.path at startup), which is how the activation
reaches Spark's Python WORKER processes: transformWithStateInPandas
speaks its state-server protocol from the worker, so a driver-only
shim is not enough.

Self-contained on purpose (no package imports): workers do not
necessarily have the repo on their path. compat/protobuf_vendor.py
EXECs this file for the driver process so there is exactly one copy
of the logic.

What it does, and only when `google.protobuf` is not already
importable from the normal environment:
1. Appends known machine-local locations of the PURE-PYTHON protobuf
   runtime (the Google Cloud SDK ships the Apache-2.0 runtime under
   lib/third_party — both roots are needed: one exports ``google``,
   the other the ``cloudsdk`` package its internals import).
2. Purges namespace-package shadows: Spark workers carry
   spark-core's JAR on sys.path, whose ``google/protobuf/*.proto``
   RESOURCE entries make the failed first probe cache
   ``google``/``google.protobuf`` as empty namespace packages —
   PEP 420 would let the real (regular) package win on a fresh scan,
   but never replaces a cached module, so the cache must be dropped
   before the retry.
3. Shims ``google.protobuf.runtime_version`` when the discovered
   runtime predates protobuf 5.27 (where the module first appeared):
   Spark 4.x's generated proto modules are protoc-5.x gencode whose
   only 5.x-runtime dependency is the
   ``ValidateProtobufRuntimeVersion`` call — a no-op shim lets the
   stable descriptor wire format do the actual work. The golden TWS
   round-trip test is the proof this combination works; the shim
   never touches a real >=5.27 installation.
"""

import importlib
import importlib.util
import os
import sys
import types

_PB_ROOTS = [
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk",
    "/usr/lib/google-cloud-sdk/lib/third_party",
]


def _find_descriptor_spec():
    """Locate google.protobuf.descriptor WITHOUT executing it: a
    find_spec is a path scan plus the (tiny) parent ``__init__``
    executions, ~1000x cheaper than importing the descriptor
    machinery itself. This bootstrap runs in EVERY Python worker the
    JVM spawns, and most workers never touch protobuf — eagerly
    importing descriptor here taxed every Python-worker start ~0.2 s
    (measured on the Python-data-source query, r5→r6 0.42→0.61 s).
    Workers that actually speak the TWS state-server protocol pay the
    real import at first use, exactly once."""
    try:
        return importlib.util.find_spec("google.protobuf.descriptor")
    except (ImportError, ModuleNotFoundError):
        return None


def _activate_protobuf() -> bool:
    try:
        spec = _find_descriptor_spec()
        if spec is None:
            for root in _PB_ROOTS:
                if os.path.isdir(root) and root not in sys.path:
                    sys.path.append(root)
            for mod in ("google.protobuf", "google"):
                cached = sys.modules.get(mod)
                if cached is not None and getattr(cached, "__file__", None) is None:
                    del sys.modules[mod]  # namespace shadow (see 2.)
            importlib.invalidate_caches()
            spec = _find_descriptor_spec()
            if spec is None:
                return False
        # parents (google, google.protobuf) were imported by the spec
        # probe; descriptor itself stays unexecuted until first use
        import google.protobuf as _pb

        # sys.modules check first: find_spec raises ValueError on an
        # already-installed shim (its __spec__ is None), which would
        # make a SECOND activation call report failure
        if (
            "google.protobuf.runtime_version" not in sys.modules
            and importlib.util.find_spec("google.protobuf.runtime_version")
            is None
        ):
            rv = types.ModuleType("google.protobuf.runtime_version")

            class _Domain:
                GOOGLE_INTERNAL = 1
                PUBLIC = 2

            rv.Domain = _Domain
            rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            sys.modules["google.protobuf.runtime_version"] = rv
            _pb.runtime_version = rv
        return True
    except Exception:
        return False


_activate_protobuf()
