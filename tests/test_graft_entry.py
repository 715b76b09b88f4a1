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


def test_bench_emits_one_json_line_on_cpu(tmp_path):
    """The driver parses bench.py's stdout as ONE JSON line; the CPU
    fallback must uphold that contract (diagnostics go to stderr).
    Runs in a temp cwd so the repo's real bench_details.json (a TPU
    artifact) is not clobbered by CPU numbers."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "PROTOCLIP_PALLAS": "0",
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    row = json.loads(lines[0])
    assert row["metric"] == "vit_b16_encode_images_per_sec_per_chip"
    assert set(row) == {"metric", "value", "unit", "vs_baseline"}
    assert row["value"] > 0


def test_dryrun_multihost_two_process_cluster():
    """Multi-host for real (round-2 VERDICT item 1): two separate OS
    processes, 4 virtual CPU devices each, joined by
    ``parallel.mesh.init_distributed`` into ONE 8-device cluster running
    the sharded Q^T step.  The parent process must stay off the cluster,
    so the whole dryrun runs in a bare subprocess."""
    env = dict(os.environ)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8, processes=2)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "2-process x 4-device cluster OK" in proc.stdout
