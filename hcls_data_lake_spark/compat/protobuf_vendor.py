"""Vendored google.protobuf activation for the TransformWithState path.

Spark 4's transformWithStateInPandas requires the Python protobuf
runtime in both the driver AND the Python workers (the state-server
protocol runs worker-side); this container does not ship the package
and installing is off the table. The machine DOES carry the
Apache-licensed pure-Python runtime inside the Google Cloud SDK —
``pb_bootstrap/sitecustomize.py`` activates it (path append + a
``runtime_version`` no-op shim for protoc-5.x gencode) and this module
wires that bootstrap into the session lifecycle:

- :func:`activate` runs the bootstrap in the CURRENT process (execs
  the sitecustomize file, so there is one copy of the logic).
- :func:`ensure_protobuf_env` additionally prepends the bootstrap dir
  to ``PYTHONPATH`` so Python workers spawned by a JVM launched AFTER
  this call inherit the activation — session factories call it before
  ``getOrCreate()``.
- :func:`workers_have_protobuf` answers "may this session run TWS?":
  True when a genuine protobuf installation exists (workers resolve it
  the normal way), or when the running JVM's environment carries the
  bootstrap on PYTHONPATH (our workers will self-activate). A
  driver-supplied session whose JVM predates the bootstrap keeps the
  graceful applyInPandasWithState degradation.
"""

from __future__ import annotations

import importlib.util
import os

_HERE = os.path.dirname(os.path.abspath(__file__))
BOOTSTRAP_DIR = os.path.join(_HERE, "pb_bootstrap")
_BOOTSTRAP_FILE = os.path.join(BOOTSTRAP_DIR, "sitecustomize.py")

_PB_ROOTS = [
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk",
    "/usr/lib/google-cloud-sdk/lib/third_party",
]


def activate() -> bool:
    """Make ``google.protobuf`` importable in this process (vendored
    activation when missing). Returns True when protobuf is usable."""
    ns: dict = {"__name__": "hcls_pb_bootstrap", "__file__": _BOOTSTRAP_FILE}
    with open(_BOOTSTRAP_FILE, encoding="utf-8") as fh:
        exec(compile(fh.read(), _BOOTSTRAP_FILE, "exec"), ns)
    return bool(ns["_activate_protobuf"]())


def ensure_protobuf_env() -> bool:
    """activate() here AND export the bootstrap on PYTHONPATH so Python
    workers of a not-yet-launched JVM self-activate. Call BEFORE
    SparkSession.getOrCreate()."""
    if not activate():
        return False
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if BOOTSTRAP_DIR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([BOOTSTRAP_DIR] + parts)
    return True


def workers_have_protobuf(spark) -> bool:
    """True iff this session's Python WORKERS can import
    google.protobuf — the gate for attempting the real
    TransformWithState path instead of degrading."""
    try:
        # find_spec on a dotted name imports the parent package and
        # raises ModuleNotFoundError when even `google` is absent
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        spec = None
    if spec is not None and spec.origin is not None:
        vendored = any(spec.origin.startswith(r) for r in _PB_ROOTS)
        if not vendored:
            return True  # genuine installation: workers resolve it too
    try:
        jvm_pp = spark._jvm.System.getenv("PYTHONPATH") or ""
    except Exception:
        return False
    return BOOTSTRAP_DIR in jvm_pp and activate()
