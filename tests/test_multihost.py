"""Two-process ``jax.distributed`` execution (≙ MCMCDistributed across
OS processes, reference test/runtests.jl:96-110).

The round-2 suite exercised the mesh path only inside one process (8
virtual devices). This test spawns TWO real OS processes × 4 virtual CPU
devices each, forms the global 8-device mesh through
``parallel.multihost.initialize`` (beyond the single-process no-op path),
and asserts in each worker (tests/multihost_worker.py):

- sharded RWMH is bitwise-equal to the unsharded vmap run, and
- pooled RAM's shared S replicates across chains AND processes.
"""
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_sampling():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The workers pick their own XLA_FLAGS/platform (multihost_worker.py);
    # scrub pytest-process overrides that would fight them.
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=_REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process run timed out:\n" + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNAVAILABLE" in out or "failed to connect" in out.lower()
        ):
            pytest.skip(f"distributed coordination unavailable:\n{out[-2000:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {i}" in out
