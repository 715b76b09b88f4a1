"""Driver-contract tests for __graft_entry__.

The driver invokes ``dryrun_multichip(8)`` in a bare subprocess — no
JAX_PLATFORMS / XLA_FLAGS env vars — on a machine whose default backend may
be a single TPU chip.  The entry point must self-provision the virtual CPU
mesh (VERDICT round 1, item 1).
"""

import os
import subprocess
import sys

import pytest

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


@pytest.mark.slow
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
    # "note" is present exactly when the CPU debug fallback ran (so the
    # recorded number can never read as a TPU regression); this run IS cpu
    assert set(row) == {"metric", "value", "unit", "vs_baseline", "note"}
    assert "CPU debug fallback" in row["note"]
    assert row["value"] > 0


@pytest.mark.slow
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


@pytest.mark.slow
def test_dryrun_multihost_four_process_cluster():
    """Scale-out shape #2 (VERDICT r3 item 6): FOUR processes x 2 devices
    each — more process boundaries than devices-per-process, the opposite
    aspect ratio of the 2x4 case above — joined into one 8-device cluster."""
    import pytest

    pytest.importorskip("jax")
    env = dict(os.environ)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8, processes=4)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "4-process x 2-device cluster OK" in proc.stdout


def test_init_distributed_env_fallbacks(monkeypatch):
    """$PROTOCLIP_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID must feed
    jax.distributed.initialize verbatim (SCALING.md multi-host contract)."""
    from protoclip_tpu.parallel import mesh as mesh_mod

    calls = {}

    class FakeDistributed:
        @staticmethod
        def initialize(coordinator_address=None, num_processes=None,
                       process_id=None, local_device_ids=None):
            calls.update(
                coordinator=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )

    class FakeGlobalState:
        client = None

    monkeypatch.setenv("PROTOCLIP_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("PROTOCLIP_NUM_PROCESSES", "4")
    monkeypatch.setenv("PROTOCLIP_PROCESS_ID", "2")
    monkeypatch.setattr(mesh_mod.jax, "distributed", FakeDistributed)
    import jax._src.distributed as _dist

    monkeypatch.setattr(_dist, "global_state", FakeGlobalState)
    assert mesh_mod.init_distributed() is True
    assert calls == {
        "coordinator": "10.0.0.1:1234", "num_processes": 4, "process_id": 2
    }

    # already-initialized probe must not re-initialize
    class FakeGlobalStateLive:
        client = object()
        num_processes = 4

    calls.clear()
    monkeypatch.setattr(_dist, "global_state", FakeGlobalStateLive)
    assert mesh_mod.init_distributed() is True
    assert calls == {}
