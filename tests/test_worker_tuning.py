"""The worker-side import-cache gate (pigeon_optics_spark.__init__).

PySpark's worker boot path calls ``importlib.invalidate_caches()`` per TASK
(~0.2 cpu-s each with the spark zips + site-packages on sys.path — measured
~10 cpu-s of pure overhead for an otherwise-empty 32-task Python stage).
Importing this package inside a worker replaces it with a sys.path-gated
wrapper.  These tests pin the arming condition both ways and the gate's
semantics (real invalidation still runs when sys.path changes — the
addPyFile signal)."""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"

_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import importlib
import pigeon_optics_spark
print("gated:", getattr(importlib.invalidate_caches, "_po_path_gated", False))
"""

_SEMANTICS = """
import sys
sys.path.insert(0, {repo!r})
import importlib
calls = []
_orig = importlib.invalidate_caches
importlib.invalidate_caches = lambda: calls.append(1)
import pigeon_optics_spark
assert getattr(importlib.invalidate_caches, "_po_path_gated", False)
gate = importlib.invalidate_caches
gate()                      # first call: snapshot + real invalidation
gate(); gate()              # unchanged sys.path: no-ops
sys.path.append("/tmp/_po_new_pyfile_dir")   # the addPyFile signal
gate()                      # changed path: real invalidation again
gate()                      # unchanged again: no-op
print("real_calls:", len(calls))
"""


def _run(code: str, env_extra: dict | None = None) -> str:
    import os

    env = dict(os.environ)
    env.pop("PYTHON_WORKER_FACTORY_SOCK_PATH", None)
    env.pop("PYTHON_WORKER_FACTORY_PORT", None)
    env.update(env_extra or {})
    out = subprocess.run([sys.executable, "-c", code.format(repo=REPO)],
                         capture_output=True, text=True, env=env, check=True)
    return out.stdout.strip()


def test_driver_process_is_not_patched():
    assert _run(_PROBE) == "gated: False"


def test_worker_env_arms_the_gate():
    out = _run(_PROBE, {"PYTHON_WORKER_FACTORY_SOCK_PATH": "/tmp/x.sock"})
    assert out == "gated: True"


def test_gate_invalidates_only_on_syspath_change():
    out = _run(_SEMANTICS, {"PYTHON_WORKER_FACTORY_SOCK_PATH": "/tmp/x.sock"})
    # one real invalidation for the first call, one for the path change
    assert out == "real_calls: 2"
