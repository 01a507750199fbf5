"""Make ``google.protobuf`` importable from a host-vendored copy.

``transformWithStateInPandas`` (arbitrary stateful processing v2)
talks to the JVM state server through protobuf messages
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``, gencode 6.33),
so executing a v2 query needs the ``google.protobuf`` runtime in the
DRIVER (query planning builds messages) and in every Python WORKER
(the state-server client runs there). This container has no protobuf
wheel and no network for ``pip install`` — but the google-cloud-sdk
installation vendors a pure-Python protobuf **6.32** runtime at
``platform/google_appengine/google/protobuf``.

6.32 runtime under 6.33 gencode trips protobuf's runtime-version
POLICY check, not a real incompatibility: the wire format is stable
within a major version, and protobuf itself ships the
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch for
exactly this skew. The shim therefore:

1. prepends the vendored dir to ``sys.path`` and ``PYTHONPATH`` (the
   env var so a JVM launched AFTER the call hands it to its Python
   workers);
2. sets the version-check flag in ``os.environ`` (same inheritance);
3. when a live session is passed, mirrors both into
   ``SparkContext.environment`` — pyspark copies that dict into every
   PythonFunction's ``envVars``, which is how workers of an
   ALREADY-RUNNING local JVM receive them.

Best-effort by design: when no vendored runtime exists on the host
the function returns False and changes nothing, so callers keep
their documented skip. Round-trip of the actual StateMessage proto
(serialize + parse) was verified against the 6.32 runtime before
adopting the skew waiver.
"""

from __future__ import annotations

import importlib
import os
import sys

# Known host locations of a vendored pure-Python protobuf runtime
# (checked in order; each must contain google/protobuf/__init__.py).
VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


def _importable() -> bool:
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except ImportError:
        return False


def enable_protobuf_shim(spark=None) -> bool:
    """Best-effort: make ``google.protobuf`` importable here and in
    Spark Python workers. Returns True when the runtime is usable
    after the call (whether natively installed or shimmed)."""
    native = _importable()
    vendored = None
    if not native:
        for cand in VENDORED_PROTOBUF_DIRS:
            if os.path.isfile(
                os.path.join(cand, "google", "protobuf", "__init__.py")
            ):
                vendored = cand
                break
        if vendored is None:
            return False
        if vendored not in sys.path:
            sys.path.insert(0, vendored)
        if not _importable():  # pragma: no cover - corrupt vendored copy
            return False
    if vendored is not None:
        prior = os.environ.get("PYTHONPATH", "")
        if vendored not in prior.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                vendored + (os.pathsep + prior if prior else "")
            )
        # the vendored runtime may be OLDER-minor than pyspark's
        # gencode; waive the policy check (wire-compatible within a
        # major — see module docstring)
        os.environ[_FLAG] = "true"
    if spark is not None:
        env = spark.sparkContext.environment
        if vendored is not None:
            env[_FLAG] = "true"
            prior = env.get("PYTHONPATH", "")
            if vendored not in prior.split(os.pathsep):
                env["PYTHONPATH"] = (
                    vendored + (os.pathsep + prior if prior else "")
                )
    return True
