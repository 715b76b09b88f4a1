"""Executed-reference TRAINER differential harness.

Round-4 closed the parity loop for the reference's *library* code (utils,
CLIP modules, tokenizer, adapters, samplers) by executing it verbatim; the
single largest reference component — the trainer ``run_proto_clip``
(``/root/reference/main.py:105-465``) and its Q^T twin
(``main.qt.py:75-417``) — was still a trusted transcription.  This module
executes BOTH trainers verbatim at tiny geometry (CPU torch, the reference's
own fp16 weights) on synthetic cached features and diffs them against
``train/runner.py`` / ``train/qt_runner.py``:

- the cosine-LR schedule the reference steps once per epoch
  (``main.py:134-137,315``) vs ``train.optim.cosine_lr`` — EXACT;
- the best-checkpoint selection decisions (``val_acc >= best_acc``, later
  epoch wins ties, ``main.py:364-369``) replayed over the reference's own
  per-epoch val accuracies — EXACT;
- the checkpoint *write* path (``main.py:350-369``): the files the verbatim
  reference saves sit at exactly the paths ``io.checkpoint.checkpoint_paths``
  computes (``alpha-beta/`` episodic, ``best-alpha-beta/`` Q^T,
  ``main.qt.py:292``);
- cross-load BOTH directions: a checkpoint trained by the reference's own
  loop scored by our ``evaluate_checkpoint`` reproduces the reference's
  printed fixed-alpha/beta AND re-searched test accuracies
  (``main.py:383-455``); a triple trained/saved by OUR runner fed through
  the reference's own test phase (``only_test``) reproduces ours;
- converged accuracy agreement within a statistical band (the two loops
  share features but differ in adapter init / episode RNG by construction);
- AdamW(eps=1e-4, wd=0.05): torch.optim.AdamW vs ``train.optim
  .make_optimizer`` stepped over an identical gradient sequence — EXACT;
- Q^T unique bits: the frozen per-step CLIP re-encode of live queries
  (``main.qt.py:198-209``, both sides driven by the same item->feature
  table), and the ``input()`` gate (``main.qt.py:186``) the rebuild
  deliberately drops.

Everything reference-side executes VERBATIM through
``tests.conftest.pinned_reference_path`` (content-hash gated); only absent
deps (clip, info_nce, torchvision, datasets, tensorboard) are stubbed and
``.cuda()`` is identity on this CPU-only torch build.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os
import re
import sys
import types
from typing import Dict, Tuple

import numpy as np
import pytest

from tests.conftest import pinned_reference_path, requires_reference

torch = pytest.importorskip("torch")

pytestmark = [requires_reference]

# tiny geometry: big enough that training visibly improves val accuracy and
# the alpha/beta re-search is non-trivial, small enough for seconds-scale runs
N_CLS, K_SHOTS, DIM = 10, 4, 32
N_EVAL = 8  # per class -> 80 val / 80 test queries
EPOCHS = 25
LR = 1e-3
ALPHA, BETA = 0.7, 5.0
ONE_FLIP = 1.5 / (N_CLS * N_EVAL)  # one argmax flip of slack on 80 queries


# ---------------------------------------------------------------------------
# shared synthetic problem (both sides consume the SAME feature tensors)
# ---------------------------------------------------------------------------


def make_problem(seed: int = 3) -> Dict[str, np.ndarray]:
    """Clustered unit-norm features: per-class mean directions plus noise,
    mimicking the cached CLIP features both trainers consume
    (ref ``main.py:529-544``)."""
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((N_CLS, DIM)).astype(np.float32)
    means /= np.linalg.norm(means, axis=-1, keepdims=True)

    def draw(n_per: int, noise: float, sub: int):
        r = np.random.default_rng(seed * 1000 + sub)
        rows, labels = [], []
        for c in range(N_CLS):
            x = means[c][None] + noise * r.standard_normal((n_per, DIM)).astype(
                np.float32
            )
            x /= np.linalg.norm(x, axis=-1, keepdims=True)
            rows.append(x)
            labels.extend([c] * n_per)
        return np.concatenate(rows), np.asarray(labels, np.int64)

    bank_rows, bank_labels = draw(K_SHOTS, 0.35, 1)  # (N*K, d), label-sorted
    text_rows, _ = draw(1, 0.30, 2)  # (N, d)
    val_rows, val_labels = draw(N_EVAL, 0.40, 3)
    test_rows, test_labels = draw(N_EVAL, 0.40, 4)
    # per-item Q^T query features: what the frozen CLIP re-encode of each
    # (augmented) support image yields — near the bank rows, not identical
    qt_rows, _ = draw(K_SHOTS, 0.35, 5)
    return dict(
        bank_rows=bank_rows,
        bank_labels=bank_labels,
        values=np.eye(N_CLS, dtype=np.float32)[bank_labels],
        text_rows=text_rows,
        val=val_rows,
        val_labels=val_labels,
        test=test_rows,
        test_labels=test_labels,
        qt_rows=qt_rows,
    )


# ---------------------------------------------------------------------------
# verbatim import of main.py / main.qt.py (deps stubbed, sources hash-pinned)
# ---------------------------------------------------------------------------


class _CaptureWriter:
    """SummaryWriter stand-in recording every scalar the trainer logs."""

    last: "_CaptureWriter" = None

    def __init__(self, log_dir=None, *a, **k):
        self.scalars: Dict[str, list] = {}
        _CaptureWriter.last = self

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append((step, float(value)))

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


_REF_TRAINERS: Dict[str, types.ModuleType] = {}


def _load_ref_trainer(which: str) -> types.ModuleType:
    """Import ``main.py`` or ``main.qt.py`` VERBATIM, once per session, with
    the reference's own ``utils.py`` and ``model.py`` (also verbatim) bound
    as their import names and absent deps stubbed."""
    if which in _REF_TRAINERS:
        return _REF_TRAINERS[which]
    from tests.test_reference_diff import _info_nce_module

    os.environ.setdefault("MPLBACKEND", "Agg")
    clip_stub = types.ModuleType("clip")
    clip_stub.tokenize = lambda texts: torch.zeros((len(texts), 77), dtype=torch.long)
    clip_stub.load = None  # only main() touches it; run_proto_clip does not
    info_nce = _info_nce_module()
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")
    tv_f.to_tensor = lambda img: torch.as_tensor(np.asarray(img))
    tv.transforms = tv_t
    tv_t.functional = tv_f
    ds = types.ModuleType("datasets")
    ds.build_dataset = None
    ds_utils = types.ModuleType("datasets.utils")
    ds_utils.build_data_loader = None
    ds_imagenet = types.ModuleType("datasets.imagenet")
    ds_imagenet.ImageNet = object
    ds_imagenet.get_random_train_tfm = lambda: None
    ds.utils, ds.imagenet = ds_utils, ds_imagenet
    tb = types.ModuleType("torch.utils.tensorboard")
    tb.SummaryWriter = _CaptureWriter
    stubs = {
        "clip": clip_stub,
        "info_nce": info_nce,
        "torchvision": tv,
        "torchvision.transforms": tv_t,
        "torchvision.transforms.functional": tv_f,
        "datasets": ds,
        "datasets.utils": ds_utils,
        "datasets.imagenet": ds_imagenet,
        "torch.utils.tensorboard": tb,
    }

    names = ["utils", "model", f"_ref_trainer_{which}"]
    saved = {k: sys.modules.get(k) for k in list(stubs) + names}
    sys.modules.update(stubs)
    try:

        def _load(name, relpath):
            spec = importlib.util.spec_from_file_location(
                name, pinned_reference_path(relpath)
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        _load("utils", "utils.py")  # main.py: ``from utils import *``
        _load("model", "model.py")  # Adapter / Adapter_FC
        main_mod = _load(f"_ref_trainer_{which}", which)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    _REF_TRAINERS[which] = main_mod
    return main_mod


def _parse_ref_output(out: str) -> Dict[str, float]:
    """The test-phase numbers the reference prints (``main.py:436-455``)."""
    d = {}
    m = re.search(r"Fixed-alp-beta: Proto-CLIP's test accuracy: ([\d.]+)%", out)
    d["fixed"] = float(m.group(1)) / 100
    m = re.search(r"HP-search: Proto-CLIP's test accuracy: ([\d.]+)%", out)
    d["searched"] = float(m.group(1)) / 100
    m = re.search(r"hp_search_best_alpha ([\d.]+) hp_search_best_beta ([\d.]+)", out)
    d["alpha"], d["beta"] = float(m.group(1)), float(m.group(2))
    m = re.search(r"best_val_acc = \s*([\d.]+), best_val_epoch = (\d+)", out)
    if m:
        d["best_val"], d["best_epoch"] = float(m.group(1)) / 100, int(m.group(2))
    return d


def _ref_cfg(tmpdir: str, **over) -> dict:
    cfg = {
        "dataset": "caltech101",
        "shots": K_SHOTS,
        "backbone": "RN50",
        "lr": LR,
        "augment_epoch": 1,
        "train_epoch": EPOCHS,
        "losses": ["L1", "L2", "L3"],
        "alpha": ALPHA,
        "beta": BETA,
        "adapter": "fc",
        "train_vis_mem_only": False,
        "only_test": False,
        "logs_dir_path": os.path.join(tmpdir, "logs"),
        "cache_dir": os.path.join(tmpdir, "caches", "caltech101"),
    }
    cfg.update(over)
    return cfg


def _run_ref_trainer(
    which: str,
    problem: Dict[str, np.ndarray],
    tmpdir: str,
    cfg_over: dict,
    extra_args: tuple = (),
    fp32: bool = True,
    clip_model=None,
    gate_calls=None,
) -> Tuple[str, dict, _CaptureWriter]:
    """Execute the verbatim ``run_proto_clip`` on the shared features.

    The reference assumes fp16 tensors on a CUDA device (``main.py:114-125``,
    adapters hard-coded ``dtype=torch.half``); this CPU torch build supports
    fp16 natively, so ``fp32=False`` is truly verbatim with ``.cuda()`` =
    identity.  The default ``fp32=True`` additionally maps ``torch.half`` ->
    ``torch.float32`` for the run's duration: control flow, selection rules,
    schedules and formulas are untouched, but accuracies become EXACTLY
    comparable with the fp32 rebuild (no half-precision argmax flips) —
    ``test_fp16_verbatim_matches_fp32_within_band`` pins that precision is
    the only thing the stub changes.  Plot paths are cwd-relative
    (``utils.py:192-195``), hence the chdir.
    """
    main_mod = _load_ref_trainer(which)
    cfg = _ref_cfg(tmpdir, **cfg_over)
    os.makedirs(tmpdir, exist_ok=True)  # chdir target (plots are cwd-relative)
    os.makedirs(cfg["cache_dir"], exist_ok=True)
    half = torch.float32 if fp32 else torch.half
    args = (
        cfg,
        torch.from_numpy(problem["bank_rows"].T.copy()).to(half),  # (d, N*K)
        torch.from_numpy(problem["values"].copy()).to(half),
        torch.from_numpy(problem["val"].copy()).to(half),
        torch.from_numpy(problem["val_labels"].copy()),
        torch.from_numpy(problem["test"].copy()).to(half),
        torch.from_numpy(problem["test_labels"].copy()),
        torch.from_numpy(problem["text_rows"].T.copy()).to(half),  # (d, N)
        clip_model or types.SimpleNamespace(dtype=half),
        [f"a photo of class {i}" for i in range(N_CLS)],
        *extra_args,
    )
    np.random.seed(1)  # the reference samples episodes from the global
    torch.manual_seed(1)  # stream and seeds everything to 1 (utils.py:22-26)
    mp = pytest.MonkeyPatch()
    buf = io.StringIO()
    cwd = os.getcwd()
    try:
        mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)
        mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=False)
        if fp32:
            # scoped to the loaded reference module only (a global
            # ``torch.half`` override corrupts torch.load's storage-type
            # map): main.py touches ``torch.half`` solely when constructing
            # the adapters (main.py:119-121)
            from tests.conftest import TorchFp32Proxy

            mp.setattr(main_mod, "torch", TorchFp32Proxy())
        if gate_calls is not None:
            mp.setattr(
                "builtins.input", lambda prompt="": gate_calls.append(prompt) or ""
            )
        os.chdir(tmpdir)
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(io.StringIO()):
            main_mod.run_proto_clip(*args)
    finally:
        os.chdir(cwd)
        mp.undo()
    return buf.getvalue(), cfg, _CaptureWriter.last


# ---------------------------------------------------------------------------
# our side: runner.run on the SAME features (prepare_experiment stubbed)
# ---------------------------------------------------------------------------


def _our_cfg(tmpdir: str, **over):
    from protoclip_tpu.core.config import Config

    kw = dict(
        dataset="caltech101",
        shots=K_SHOTS,
        backbone="RN50",
        lr=LR,
        augment_epoch=1,
        train_epoch=EPOCHS,
        alpha=ALPHA,
        beta=BETA,
        adapter="fc",
        losses=["L1", "L2", "L3"],
        cache_root=os.path.join(tmpdir, "caches"),
        logs_dir_path=os.path.join(tmpdir, "logs"),
        compute_dtype="float32",
    )
    kw.update(over)
    return Config(**kw)


def _our_setup(cfg, problem):
    from protoclip_tpu.memory.cache import FeatureCache
    from protoclip_tpu.train import runner

    return runner.ExperimentSetup(
        encode_fn=None,
        text_fn=None,
        clip_cfg=types.SimpleNamespace(image_resolution=16),
        clip_params={},
        cache=FeatureCache(cfg.cache_dir, cfg.backbone, cfg.shots),
        dataset=types.SimpleNamespace(
            classnames=[f"class {i}" for i in range(N_CLS)],
            num_classes=N_CLS,
            template=["a photo of a {}."],
            train_x=[],
        ),
        bank_v=problem["bank_rows"],
        bank_values=problem["values"],
        bank_t=problem["text_rows"],
        val_feats=problem["val"],
        val_labels=problem["val_labels"],
        test_feats=problem["test"],
        test_labels=problem["test_labels"],
    )


# ---------------------------------------------------------------------------
# fixtures: each expensive run happens once per module
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def problem():
    return make_problem()


@pytest.fixture(scope="module")
def ref_run(problem, tmp_path_factory):
    """The verbatim episodic reference trainer, trained once."""
    tmp = str(tmp_path_factory.mktemp("ref_trainer"))
    out, cfg, writer = _run_ref_trainer("main.py", problem, tmp, {})
    return {
        "out": out,
        "cfg": cfg,
        "parsed": _parse_ref_output(out),
        "scalars": writer.scalars,
    }


@pytest.fixture(scope="module")
def our_run(problem, tmp_path_factory):
    """Our runner.run trained once on the same features."""
    from protoclip_tpu.train import runner

    tmp = str(tmp_path_factory.mktemp("our_trainer"))
    cfg = _our_cfg(tmp)
    setup = _our_setup(cfg, problem)
    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(runner, "prepare_experiment", lambda *a, **k: setup)
        result = runner.run(cfg, progress=False)
    finally:
        mp.undo()
    return {"cfg": cfg, "result": result, "tmp": tmp}


# ---------------------------------------------------------------------------
# episodic trainer diffs
# ---------------------------------------------------------------------------


def test_ref_trainer_improves_val_accuracy(ref_run):
    """Sanity: the verbatim loop actually trains on this problem (so the
    diffs below compare trainers, not no-ops)."""
    vals = [v for _, v in ref_run["scalars"]["Accuracy/val"]]
    assert len(vals) == EPOCHS
    assert max(vals[-5:]) > vals[0] + 0.05


def test_lr_schedule_matches_torch_cosine(ref_run):
    """torch CosineAnnealingLR(T_max=train_epoch*N*K) stepped per EPOCH
    (``main.py:134-137,315-316``) vs ``train.optim.cosine_lr``.  The
    reference logs the post-step value (T_cur = epoch+1); the value the
    optimizer USED during epoch e is cosine(e) on both sides, so matching
    the logged sequence at e+1 pins the whole schedule exactly."""
    from protoclip_tpu.train.optim import cosine_lr

    logged = [v for _, v in ref_run["scalars"]["HP/lr"]]
    t_max = EPOCHS * N_CLS * K_SHOTS
    ours = [cosine_lr(LR, e + 1, t_max) for e in range(EPOCHS)]
    np.testing.assert_allclose(logged, ours, rtol=0, atol=1e-12)


def test_best_checkpoint_selection_rule(ref_run):
    """Replaying OUR selection rule (``va >= best`` -> later epoch wins
    ties, runner.py) over the reference's own per-epoch val accuracies
    reproduces the reference's chosen best epoch (``main.py:364-369``)."""
    vals = [v for _, v in ref_run["scalars"]["Accuracy/val"]]
    best, best_ep = 0.0, 0
    for e, va in enumerate(vals):
        if va >= best:
            best, best_ep = va, e
    assert best_ep == ref_run["parsed"]["best_epoch"]
    assert best == pytest.approx(ref_run["parsed"]["best_val"], abs=0.006)


def test_checkpoint_paths_match_reference_writes(ref_run):
    """The triple the verbatim trainer SAVED (``main.py:350-369``) sits at
    exactly the paths ``io.checkpoint.checkpoint_paths`` computes."""
    from protoclip_tpu.io.checkpoint import checkpoint_paths

    paths = checkpoint_paths(
        ref_run["cfg"]["cache_dir"], "RN50", K_SHOTS, ALPHA, BETA, LR, 1, EPOCHS
    )
    for p in paths:
        assert os.path.exists(p), f"reference did not write {p}"


def test_crossload_reference_checkpoint_into_rebuild(ref_run, problem, tmp_path):
    """A checkpoint trained by the REFERENCE'S OWN LOOP, scored by our
    ``evaluate_checkpoint`` on the same features, reproduces the
    reference's printed test numbers: the fixed-alpha/beta accuracy, the
    re-searched (alpha, beta) cell, and the searched accuracy
    (``main.py:383-455``)."""
    from protoclip_tpu.io.checkpoint import checkpoint_paths
    from protoclip_tpu.obs.logging import MetricLogger
    from protoclip_tpu.train import runner

    ref = ref_run["parsed"]
    cfg = _our_cfg(
        str(tmp_path),
        cache_root=os.path.dirname(ref_run["cfg"]["cache_dir"]),
        only_test=True,
    )
    setup = _our_setup(cfg, problem)
    paths = checkpoint_paths(
        ref_run["cfg"]["cache_dir"], "RN50", K_SHOTS, ALPHA, BETA, LR, 1, EPOCHS
    )
    logger = MetricLogger(os.path.join(str(tmp_path), "logs-eval"))
    res = runner.evaluate_checkpoint(cfg, setup, paths, ALPHA, BETA, logger, False)
    # printed at 2 decimals; exact modulo that rounding
    assert res.test_acc_fixed == pytest.approx(ref["fixed"], abs=0.006)
    assert res.searched_alpha == pytest.approx(ref["alpha"], abs=1e-6)
    assert res.searched_beta == pytest.approx(ref["beta"], abs=1e-6)
    assert res.test_acc_searched == pytest.approx(ref["searched"], abs=0.006)


def test_reference_reads_rebuild_checkpoint(our_run, problem):
    """The reverse direction: the triple OUR runner trained and saved, fed
    through the verbatim reference's own test phase (``only_test`` load at
    ``main.py:392-398``), reproduces our fixed and re-searched numbers —
    the layouts are behaviorally interchangeable, not merely byte-shaped."""
    result = our_run["result"]
    out, _, _ = _run_ref_trainer(
        "main.py",
        problem,
        our_run["tmp"] + "-refrun",
        {
            "only_test": True,
            "cache_dir": os.path.join(our_run["cfg"].cache_root, "caltech101"),
            "logs_dir_path": our_run["tmp"] + "-refrun/logs",
        },
    )
    ref = _parse_ref_output(out)
    assert ref["fixed"] == pytest.approx(result.test_acc_fixed, abs=0.006)
    assert ref["alpha"] == pytest.approx(result.searched_alpha, abs=1e-6)
    assert ref["beta"] == pytest.approx(result.searched_beta, abs=1e-6)
    assert ref["searched"] == pytest.approx(result.test_acc_searched, abs=0.006)


def test_converged_accuracy_band(ref_run, our_run):
    """Independent trainings (same features, different adapter init /
    episode RNG by construction — exact PyTorch RNG replay is impossible)
    must land in the same accuracy regime; both far above chance (0.1)."""
    ref_fixed = ref_run["parsed"]["fixed"]
    our_fixed = our_run["result"].test_acc_fixed
    assert ref_fixed > 0.3 and our_fixed > 0.3
    assert abs(ref_fixed - our_fixed) <= 0.15


def test_fp16_verbatim_matches_fp32_within_band(ref_run, problem, tmp_path):
    """The TRULY verbatim run — reference fp16 adapters/banks, no
    ``torch.half`` stub (``main.py:115,119-121``) — lands within a few
    argmax flips of the fp32 run used for the exact diffs above, pinning
    that numeric precision is the ONLY thing the fp32 stub changes."""
    out, _, writer = _run_ref_trainer(
        "main.py", problem, str(tmp_path / "fp16"), {}, fp32=False
    )
    fp16 = _parse_ref_output(out)
    fp32 = ref_run["parsed"]
    assert abs(fp16["fixed"] - fp32["fixed"]) <= 3 * ONE_FLIP
    assert abs(fp16["searched"] - fp32["searched"]) <= 3 * ONE_FLIP
    # identical schedule regardless of precision
    lr16 = [v for _, v in writer.scalars["HP/lr"]]
    lr32 = [v for _, v in ref_run["scalars"]["HP/lr"]]
    np.testing.assert_allclose(lr16, lr32, rtol=0, atol=1e-12)


def test_adamw_matches_torch_exactly():
    """``make_optimizer`` (optax) vs ``torch.optim.AdamW(lr, eps=1e-4,
    weight_decay=0.05)`` (``main.py:134-135``) over an identical gradient
    sequence: parameter trajectories agree to float tolerance."""
    import jax.numpy as jnp
    import optax

    from protoclip_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((8, 5)).astype(np.float32)
    grads = [rng.standard_normal((8, 5)).astype(np.float32) for _ in range(12)]
    lrs = [LR * (0.9**t) for t in range(12)]  # exercise the per-step lr too

    # torch side
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([p], lr=LR, eps=1e-4, weight_decay=0.05)
    for g, lr in zip(grads, lrs):
        for group in opt.param_groups:
            group["lr"] = lr
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()

    # optax side
    params = {"w": jnp.asarray(w0)}
    tx = make_optimizer(LR)
    state = tx.init(params)
    for g, lr in zip(grads, lrs):
        state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), p.detach().numpy(), rtol=0, atol=2e-6
    )


# ---------------------------------------------------------------------------
# Q^T variant (main.qt.py) — unique bits
# ---------------------------------------------------------------------------


class _QTLoaderRef:
    """The reference's ``train_loader_F`` stand-in: every ``__iter__``
    reshuffles all N*K items (like ``DataLoader(shuffle=True)``,
    ``main.qt.py:456-468``) and yields one (ids, labels) batch; the stub
    clip model maps ids to the shared per-item feature table."""

    def __init__(self, n_items: int, labels: np.ndarray):
        self.n_items, self.labels = n_items, labels

    def __iter__(self):
        perm = np.random.permutation(self.n_items)  # ref uses global numpy RNG
        yield (
            torch.from_numpy(perm.copy()),
            torch.from_numpy(self.labels[perm].copy()),
        )


@pytest.fixture(scope="module")
def qt_ref_run(problem, tmp_path_factory):
    """The verbatim Q^T trainer, trained once: queries re-encoded by the
    (stubbed) frozen CLIP each step (``main.qt.py:198-209``)."""
    tmp = str(tmp_path_factory.mktemp("ref_qt"))
    feats = torch.from_numpy(problem["qt_rows"].copy())
    clip_model = types.SimpleNamespace(
        dtype=torch.float32,
        encode_image=lambda images: feats[images.long()],
    )
    loader = _QTLoaderRef(N_CLS * K_SHOTS, problem["bank_labels"].astype(np.int64))
    gate_calls = []
    out, cfg, writer = _run_ref_trainer(
        "main.qt.py", problem, tmp, {}, extra_args=(loader,),
        clip_model=clip_model, gate_calls=gate_calls,
    )
    return {
        "out": out,
        "cfg": cfg,
        "parsed": _parse_ref_output(out),
        "scalars": writer.scalars,
        "gate_calls": gate_calls,
    }


def test_qt_input_gate_is_real(qt_ref_run):
    """The reference Q^T trainer blocks on ``input()`` before training
    (``main.qt.py:186``) — a deliberate drop in the rebuild (qt_runner.py
    has no gate); prove the quirk exists by observing the verbatim call."""
    assert qt_ref_run["gate_calls"] == ["Please enter to start training."]


def test_qt_checkpoint_dir_is_best_alpha_beta(qt_ref_run):
    """Q^T saves under ``best-alpha-beta/`` (``main.qt.py:292``) where the
    episodic trainer uses ``alpha-beta/``; ``checkpoint_paths(qt=True)``
    lands on the files the verbatim Q^T trainer wrote."""
    from protoclip_tpu.io.checkpoint import checkpoint_paths

    paths = checkpoint_paths(
        qt_ref_run["cfg"]["cache_dir"], "RN50", K_SHOTS, ALPHA, BETA, LR, 1,
        EPOCHS, qt=True,
    )
    assert all("best-alpha-beta" in p for p in paths)
    for p in paths:
        assert os.path.exists(p), f"reference qt trainer did not write {p}"


def test_qt_crossload_reference_checkpoint_into_rebuild(
    qt_ref_run, problem, tmp_path
):
    """Our ``evaluate_checkpoint`` on the Q^T-trained triple reproduces the
    verbatim Q^T test phase (``main.qt.py:325-410``)."""
    from protoclip_tpu.io.checkpoint import checkpoint_paths
    from protoclip_tpu.obs.logging import MetricLogger
    from protoclip_tpu.train import runner

    ref = qt_ref_run["parsed"]
    cfg = _our_cfg(
        str(tmp_path),
        cache_root=os.path.dirname(qt_ref_run["cfg"]["cache_dir"]),
        only_test=True,
    )
    setup = _our_setup(cfg, problem)
    paths = checkpoint_paths(
        qt_ref_run["cfg"]["cache_dir"], "RN50", K_SHOTS, ALPHA, BETA, LR, 1,
        EPOCHS, qt=True,
    )
    logger = MetricLogger(os.path.join(str(tmp_path), "logs-eval"))
    res = runner.evaluate_checkpoint(cfg, setup, paths, ALPHA, BETA, logger, False)
    assert res.test_acc_fixed == pytest.approx(ref["fixed"], abs=0.006)
    assert res.searched_alpha == pytest.approx(ref["alpha"], abs=1e-6)
    assert res.searched_beta == pytest.approx(ref["beta"], abs=1e-6)
    assert res.test_acc_searched == pytest.approx(ref["searched"], abs=0.006)


@pytest.mark.slow
def test_qt_rebuild_trains_and_reference_reads(problem, tmp_path, monkeypatch):
    """Full reverse cycle for Q^T: OUR ``qt_runner.run_qt`` trains on the
    same per-item query-feature table (the frozen-encode step is driven
    through a stub ``encode_image`` keyed on image content — the dataset
    images are constant-color PNGs carrying their item id, which survives
    the real RandomResizedCrop bit-exactly), saves under
    ``best-alpha-beta/``, and the verbatim reference Q^T test phase
    reproduces our numbers from that triple."""
    from PIL import Image

    import jax.numpy as jnp

    from protoclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from protoclip_tpu.data.types import Datum
    from protoclip_tpu.train import qt as qt_mod
    from protoclip_tpu.train import qt_runner
    from protoclip_tpu.train import runner

    tmp = str(tmp_path)
    n_items = N_CLS * K_SHOTS
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    train_x = []
    for i in range(n_items):
        # constant pixel value = item id + 10 (offset clears 0); constant
        # images are invariant under RandomResizedCrop + flip
        path = os.path.join(img_dir, f"{i}.png")
        Image.fromarray(np.full((20, 20, 3), i + 10, np.uint8)).save(path)
        train_x.append(
            Datum(
                impath=path,
                label=int(problem["bank_labels"][i]),
                classname=f"class {problem['bank_labels'][i]}",
            )
        )

    table = jnp.asarray(problem["qt_rows"])
    mean0, std0 = CLIP_MEAN[0] * 255.0, CLIP_STD[0] * 255.0

    def stub_encode(cp, images, cfg):
        # invert normalize_batch on one pixel to recover the item id
        ids = jnp.round(images[:, 0, 0, 0] * std0 + mean0).astype(jnp.int32) - 10
        return jnp.take(table, jnp.clip(ids, 0, n_items - 1), axis=0)

    monkeypatch.setattr(qt_mod, "encode_image", stub_encode)

    cfg = _our_cfg(tmp)
    setup = _our_setup(cfg, problem)
    setup.dataset.train_x = train_x
    monkeypatch.setattr(qt_runner, "prepare_experiment", lambda *a, **k: setup)
    monkeypatch.setattr(runner, "prepare_experiment", lambda *a, **k: setup)
    result = qt_runner.run_qt(cfg, progress=False)
    assert result.test_acc_fixed > 0.3  # trained, not noise

    out, _, _ = _run_ref_trainer(
        "main.qt.py",
        problem,
        tmp + "-refrun",
        {
            "only_test": True,
            "cache_dir": os.path.join(cfg.cache_root, "caltech101"),
            "logs_dir_path": tmp + "-refrun/logs",
        },
        extra_args=(_QTLoaderRef(n_items, problem["bank_labels"].astype(np.int64)),),
    )
    ref = _parse_ref_output(out)
    assert ref["fixed"] == pytest.approx(result.test_acc_fixed, abs=0.006)
    assert ref["searched"] == pytest.approx(result.test_acc_searched, abs=0.006)
