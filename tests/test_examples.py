"""The examples/ quickstarts must actually run.

Each quickstart is a user-facing self-contained script (see
``examples/README.md``); they are executed here as real subprocesses with a
clean environment, exactly as a user would run them.  These are the scripts
most likely to rot silently — they exercise long chains (train -> checkpoint
triple -> deploy classifier; export -> serve CLI -> client) that no single
unit test covers end to end, and one already broke once (the torch-less
``.pt.npz`` sidecar resolution in train_quickstart).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name: str, timeout: int) -> str:
    env = dict(os.environ)
    # the scripts pin CPU themselves; keep the suite's TPU-free discipline
    # anyway (only one process may hold the chip — CLAUDE.md)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (
        f"{name} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    )
    return proc.stdout


@pytest.mark.slow
def test_serving_quickstart_runs():
    out = _run_example("serving_quickstart.py", timeout=300)
    assert "encoded 3 images" in out
    assert "server exit code: 0" in out


@pytest.mark.slow
def test_train_quickstart_runs():
    out = _run_example("train_quickstart.py", timeout=600)
    # the full chain printed its terminal artifacts: a written checkpoint
    # triple and a deploy-route classification over it
    assert "checkpoint triple:" in out
    assert "deploy classify: top-k" in out
