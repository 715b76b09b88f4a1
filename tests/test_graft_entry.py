"""Driver-contract tests for __graft_entry__.

The driver invokes ``dryrun_multichip(8)`` in a bare subprocess — no
JAX_PLATFORMS / XLA_FLAGS env vars — on a machine whose default backend may
be a single TPU chip.  The entry point must self-provision the virtual CPU
mesh (VERDICT round 1, item 1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bare_subprocess():
    """Bare invocation (driver contract): env vars stripped, must exit 0."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # Keep any axon plugin pinning intact except platform forcing — the entry
    # point itself must survive whatever sitecustomize does.
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "8-device mesh OK" in proc.stdout


def test_dryrun_multichip_inprocess():
    """With jax already initialized on >=8 devices (pytest conftest), the
    provisioning path is a no-op and the dry run executes in-process."""
    import jax

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 devices")
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)
