"""Executed-reference differential harness.

Every other parity test in this suite compares the rebuild against a
*re-transcription* of the reference's formulas (or against HF).  This module
instead imports ``/root/reference/utils.py`` VERBATIM — stubbing only its
absent deps (``clip``, ``torchvision``, ``info_nce``) and patching
``Tensor.cuda`` to identity on the CPU-only torch build — runs the
reference's own torch code, and diffs the outputs against the rebuild:

- ``P`` (ref ``utils.py:225-244``) over the full 11 x 29 alpha/beta grid vs
  ``ops.proto.proto_probs`` / ``eval.gridsearch.alpha_beta_sweep``;
- ``build_cache_model``'s post-encode arithmetic + ``torch.save`` layout
  (ref ``utils.py:284-332``) vs ``memory.banks.build_visual_memory_bank``,
  including adopting the reference-written ``.pt`` tree byte-for-byte;
- ``pre_load_features`` (ref ``utils.py:335-361``) vs
  ``memory.banks.pre_load_features`` + ``.pt`` interop;
- ``clip_classifier`` / ``get_textual_memory_bank`` reduction arithmetic and
  prompt formatting (ref ``utils.py:54-69,256-273``) vs
  ``memory.banks.build_textual_memory_bank`` + ``.pkl`` interop;
- the hp-search pickle row lists (ref ``main.py:152-207``) round-tripped
  through ``memory.cache.FeatureCache`` / ``eval.gridsearch``;
- ``cls_acc`` / ``compute_loss_and_matches`` / ``get_target_inds`` /
  ``beautify`` / ``get_model_dir_root`` against their counterparts;
- the episodic sampler: the reference's sampling statements
  (``main.py:233-258,313``) are extracted from source and executed verbatim,
  and the chunk-size / episodes-per-epoch / queries-per-class /
  per-(class,slot) marginals are compared statistically against
  ``train.episodic._sample_epoch`` (exact RNG replay is impossible — the
  reference uses the legacy numpy global stream, the rebuild a
  ``np.random.Generator`` — so the diff is distributional).

The interop direction rebuild -> reference covers what the reference can
read: its caches are ``torch.save``/``pickle`` files, and the rebuild's
writes are ``.npz`` (reference cannot read those by design — MIGRATION.md);
the reference->rebuild direction is the one users migrate across.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import textwrap
import types

import numpy as np
import pytest

from tests.conftest import (
    REFERENCE_DIR,
    pinned_reference_dir,
    pinned_reference_path,
    requires_reference,
)

torch = pytest.importorskip("torch")

REF_UTILS_PATH = os.path.join(REFERENCE_DIR, "utils.py")
REF_MAIN_PATH = os.path.join(REFERENCE_DIR, "main.py")

pytestmark = [
    requires_reference,
    pytest.mark.skipif(
        not os.path.exists(REF_UTILS_PATH), reason="reference utils.py not mounted"
    ),
]


# ---------------------------------------------------------------------------
# verbatim import of /root/reference/utils.py with dependency stubs
# ---------------------------------------------------------------------------


def _feat_for(text: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding for a prompt string (shared by both
    sides of the textual-bank diff)."""
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def _make_clip_stub() -> types.ModuleType:
    """A ``clip`` module stub: ``tokenize`` records the formatted prompt
    strings the reference passes in and returns index-carrying tensors."""
    mod = types.ModuleType("clip")
    mod._prompts = []  # every text ever tokenized, in call order

    def tokenize(texts):
        idx = []
        for t in texts:
            idx.append(len(mod._prompts))
            mod._prompts.append(t)
        out = torch.zeros((len(texts), 77), dtype=torch.long)
        out[:, 0] = torch.as_tensor(idx)
        return out

    mod.tokenize = tokenize
    return mod


def _info_nce_module():
    """The third-party ``info_nce`` package the reference depends on
    (``utils.py:19``), supplied as the VENDORED published source
    (``tests/vendor/info_nce_pytorch.py``, info-nce-pytorch v0.1.4, MIT) —
    not a local paraphrase: the reference's L2-L5 legs therefore diff
    against package-defined values, golden-pinned in
    ``tests/test_ops.py::test_vendored_info_nce_golden_vectors``."""
    from tests.vendor import info_nce_pytorch

    return info_nce_pytorch


_REF_UTILS = None


def _load_ref_utils():
    """Import the reference's utils.py verbatim, once per session."""
    global _REF_UTILS
    if _REF_UTILS is not None:
        return _REF_UTILS

    os.environ.setdefault("MPLBACKEND", "Agg")
    stubs = {}
    if "clip" not in sys.modules:
        stubs["clip"] = _make_clip_stub()
    if "info_nce" not in sys.modules:
        stubs["info_nce"] = _info_nce_module()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv_f.to_tensor = lambda img: torch.as_tensor(np.asarray(img))
        tv.transforms = tv_t
        tv_t.functional = tv_f
        stubs.update(
            {
                "torchvision": tv,
                "torchvision.transforms": tv_t,
                "torchvision.transforms.functional": tv_f,
            }
        )
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_utils", pinned_reference_path("utils.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        # drop the stubs so no other test accidentally imports them as real
        for name in stubs:
            sys.modules.pop(name, None)
    _REF_UTILS = mod
    return mod


@pytest.fixture()
def ref_utils(monkeypatch):
    """The verbatim reference module, with ``.cuda()`` as identity (the torch
    build here is CPU-only; the reference assumes a GPU)."""
    mod = _load_ref_utils()
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **kw: self, raising=False
    )
    return mod


# ---------------------------------------------------------------------------
# P over the full alpha/beta grid (ref utils.py:225-244, main.py:140-199)
# ---------------------------------------------------------------------------


def _grid_problem(q_rows=160, n_class=10, dim=24, seed=7):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((q_rows, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    zi = rng.standard_normal((n_class, dim)).astype(np.float32)
    zi /= np.linalg.norm(zi, axis=-1, keepdims=True)
    zt = rng.standard_normal((n_class, dim)).astype(np.float32)
    zt /= np.linalg.norm(zt, axis=-1, keepdims=True)
    labels = rng.integers(0, n_class, q_rows).astype(np.int64)
    return q, zi, zt, labels


def test_P_matches_reference_over_full_grid(ref_utils):
    """Run the reference's ``P`` verbatim over every cell of its 11 x 29
    alpha/beta grid (``main.py:142-146``) and diff the probability tensors
    against ``ops.proto.proto_probs`` (the matmul reformulation)."""
    from protoclip_tpu.eval.gridsearch import default_alpha_beta_grid
    from protoclip_tpu.ops.proto import proto_probs

    q, zi, zt, _ = _grid_problem()
    alphas, betas = default_alpha_beta_grid()
    assert len(alphas) == 11 and len(betas) == 29

    tq, tzi, tzt = map(torch.from_numpy, (q, zi, zt))
    worst = 0.0
    for alpha in alphas:
        for beta in betas:
            p_ref = ref_utils.P(tq, tzi, tzt, float(alpha), float(beta)).numpy()
            p_ours = np.asarray(proto_probs(q, zi, zt, float(alpha), float(beta)))
            worst = max(worst, float(np.abs(p_ref - p_ours).max()))
    assert worst < 1e-5, f"max |P_ref - P_ours| over the grid = {worst}"


def test_sweep_accuracy_grid_matches_reference_loop(ref_utils):
    """The reference's per-cell accuracy loop (``main.py:187-199``) executed
    verbatim vs the single-dispatch ``alpha_beta_sweep``."""
    from protoclip_tpu.eval.gridsearch import alpha_beta_sweep, default_alpha_beta_grid

    q, zi, zt, labels = _grid_problem()
    alphas, betas = default_alpha_beta_grid()

    tq, tzi, tzt = map(torch.from_numpy, (q, zi, zt))
    tlabels = torch.from_numpy(labels)
    acc_ref = np.zeros((len(alphas), len(betas)), np.float32)
    for i, alpha in enumerate(alphas):
        for j, beta in enumerate(betas):
            p = ref_utils.P(tq, tzi, tzt, float(alpha), float(beta))
            acc_ref[i, j] = (p.max(1)[1] == tlabels).float().mean().item()

    acc_ours = alpha_beta_sweep(q, labels, zi, zt, alphas, betas)
    # accuracy is discrete: demand agreement to better than half a query
    assert np.abs(acc_ref - acc_ours).max() < 0.5 / len(labels)


# ---------------------------------------------------------------------------
# build_cache_model (ref utils.py:284-332) vs build_visual_memory_bank
# ---------------------------------------------------------------------------


class _SharedEncoder:
    """Deterministic stand-in for CLIP's image encoder, shared by both sides.

    ``feats[pass, item]`` is the feature the encoder must emit for ``item``
    on augmentation pass ``pass`` (pass-dependent, like real random crops).
    Batches carry item indices in column 0; a call counter tracks the pass.
    """

    def __init__(self, n_items, dim, n_batches, seed=11):
        rng = np.random.default_rng(seed)
        # 8 passes is more than any test uses
        self.feats = rng.standard_normal((8, n_items, dim)).astype(np.float32)
        self.n_batches = n_batches
        self.calls = 0

    def _encode(self, item_idx: np.ndarray) -> np.ndarray:
        aug_pass = self.calls // self.n_batches
        self.calls += 1
        return self.feats[aug_pass, item_idx]

    # reference side: torch "clip model"
    def encode_image(self, images: "torch.Tensor") -> "torch.Tensor":
        return torch.from_numpy(self._encode(images[:, 0].long().numpy()))

    # rebuild side: encode_fn(images) -> features
    def encode_fn(self, images: np.ndarray) -> np.ndarray:
        return self._encode(np.asarray(images)[:, 0].astype(np.int64))


class _NeverIterate:
    """Loader sentinel for cache-hit paths: iterating it is a test failure."""

    shuffle = False

    def __iter__(self):
        raise AssertionError("cache hit expected; loader must not be touched")

    def __len__(self):
        return 0


def _canon_class_blocks(keys: np.ndarray, labels_sorted: np.ndarray) -> np.ndarray:
    """Sort rows lexicographically within each class block.

    ``torch.argsort`` (ref ``utils.py:324``) gives no stability guarantee, so
    within-class row order is implementation-defined on both sides; prototype
    math is invariant to it."""
    out = np.empty_like(keys)
    for cls in np.unique(labels_sorted):
        block = keys[labels_sorted == cls]
        order = np.lexsort(block.T[::-1])
        out[labels_sorted == cls] = block[order]
    return out


def _visual_bank_problem(n_class=5, k_shots=4, dim=16, batch=7, aug=3, seed=3):
    """Item stream with shuffled labels (exercises the argsort) + loaders."""
    rng = np.random.default_rng(seed)
    n_items = n_class * k_shots
    labels = rng.permutation(np.repeat(np.arange(n_class), k_shots)).astype(np.int64)
    item_idx = np.arange(n_items)

    ref_loader = []  # list of (images, target) torch batches
    our_batches = []  # list of (images, labels, n_valid)
    for start in range(0, n_items, batch):
        sl = slice(start, min(start + batch, n_items))
        imgs = np.zeros((sl.stop - sl.start, 4), np.float32)
        imgs[:, 0] = item_idx[sl]
        ref_loader.append((torch.from_numpy(imgs), torch.from_numpy(labels[sl])))
        our_batches.append((imgs, labels[sl], sl.stop - sl.start))

    class _Loader:
        shuffle = False

        def __iter__(self):
            return iter(our_batches)

        def __len__(self):
            return len(our_batches)

    n_batches = len(ref_loader)
    return labels, ref_loader, _Loader(), n_batches, aug, dim, n_items


def test_build_cache_model_matches_reference(ref_utils, tmp_path):
    from protoclip_tpu.memory.banks import build_visual_memory_bank
    from protoclip_tpu.memory.cache import FeatureCache

    labels, ref_loader, our_loader, n_batches, aug, dim, n_items = (
        _visual_bank_problem()
    )
    cfg = {
        "cache_dir": str(tmp_path / "caches"),
        "backbone": "RN50",
        "shots": 4,
        "augment_epoch": aug,
    }

    enc = _SharedEncoder(n_items, dim, n_batches)
    ref_keys, ref_values = ref_utils.build_cache_model(cfg, enc, ref_loader)
    ref_keys = ref_keys.numpy()  # (d, M) — reference keeps the transpose
    ref_values = ref_values.numpy()  # (M, N) one-hot int64

    enc2 = _SharedEncoder(n_items, dim, n_batches)  # identical stream
    our_keys, our_values = build_visual_memory_bank(
        enc2.encode_fn, our_loader, augment_epochs=aug, cache=None, progress=False
    )

    labels_sorted = np.sort(labels)
    np.testing.assert_array_equal(our_values.argmax(1), ref_values.argmax(1))
    np.testing.assert_allclose(
        _canon_class_blocks(our_keys, labels_sorted),
        _canon_class_blocks(ref_keys.T, labels_sorted),
        atol=1e-6,
    )

    # interop: the rebuild adopts the reference-written torch.save tree
    cache = FeatureCache(cfg["cache_dir"], cfg["backbone"], cfg["shots"])
    adopted_keys, adopted_values = build_visual_memory_bank(
        None, _NeverIterate(), augment_epochs=aug, cache=cache, progress=False
    )
    np.testing.assert_allclose(adopted_keys, ref_keys.T, atol=0)
    np.testing.assert_array_equal(adopted_values, ref_values)


def test_pre_load_features_matches_reference(ref_utils, tmp_path):
    from protoclip_tpu.memory.banks import pre_load_features
    from protoclip_tpu.memory.cache import FeatureCache

    labels, ref_loader, our_loader, n_batches, _, dim, n_items = (
        _visual_bank_problem(seed=9)
    )
    cfg = {"cache_dir": str(tmp_path / "caches"), "backbone": "RN50", "shots": 4}
    os.makedirs(ref_utils.get_model_dir_root(cfg), exist_ok=True)

    enc = _SharedEncoder(n_items, dim, n_batches, seed=13)
    ref_feats, ref_labels = ref_utils.pre_load_features(cfg, "val", enc, ref_loader)

    enc2 = _SharedEncoder(n_items, dim, n_batches, seed=13)
    our_feats, our_labels = pre_load_features(
        enc2.encode_fn, our_loader, "val", cache=None, progress=False
    )
    np.testing.assert_allclose(our_feats, ref_feats.numpy(), atol=1e-6)
    np.testing.assert_array_equal(our_labels, ref_labels.numpy())

    # interop: rebuild reads the reference-written val_{features,labels}.pt
    cache = FeatureCache(cfg["cache_dir"], cfg["backbone"], cfg["shots"])
    got_feats, got_labels = pre_load_features(
        None, _NeverIterate(), "val", cache=cache, progress=False
    )
    np.testing.assert_allclose(got_feats, ref_feats.numpy(), atol=0)
    np.testing.assert_array_equal(got_labels, ref_labels.numpy())


# ---------------------------------------------------------------------------
# clip_classifier / get_textual_memory_bank (ref utils.py:54-69,256-273)
# ---------------------------------------------------------------------------


class _RefTextEncoder:
    """Reference-side ``clip_model``: resolves the index-carrying tokens the
    clip stub produced back to the shared prompt->feature table."""

    def __init__(self, clip_stub, dim):
        self.stub = clip_stub
        self.dim = dim

    def encode_text(self, tokens):
        texts = [self.stub._prompts[int(i)] for i in tokens[:, 0]]
        return torch.from_numpy(np.stack([_feat_for(t, self.dim) for t in texts]))


def _run_ref_clip_classifier(ref_utils, classnames, template, dim):
    """Execute the reference's clip_classifier with the clip stub installed
    in its module globals (it resolves ``clip`` at call time)."""
    stub = _make_clip_stub()
    old = ref_utils.clip
    ref_utils.clip = stub
    try:
        _, weights = ref_utils.clip_classifier(
            classnames, template, _RefTextEncoder(stub, dim)
        )
    finally:
        ref_utils.clip = old
    return stub._prompts, weights.numpy()  # (d, N)


def _our_text_encode_fn(prompts, dim):
    """Rebuild-side encode_text_fn: maps batch rows back to the global prompt
    order (the rebuild encodes all N*T prompts in one batched sweep)."""
    state = {"next": 0}

    def encode(tokens):
        n = len(tokens)
        rows = []
        for i in range(state["next"], state["next"] + n):
            if i < len(prompts):
                rows.append(_feat_for(prompts[i], dim))
            else:  # padding rows the rebuild trims afterwards
                rows.append(np.zeros(dim, np.float32))
        state["next"] += n
        return np.stack(rows)

    return encode


def test_textual_bank_matches_reference(ref_utils):
    from protoclip_tpu.memory.banks import build_textual_memory_bank

    dim = 32
    classnames = ["wood_block", "power drill", "a", "banana", "scissors", "mug"]
    template = ["a photo of a {}.", "a bad photo of the {}."]

    ref_prompts, ref_weights = _run_ref_clip_classifier(
        ref_utils, classnames, template, dim
    )

    our_prompts = [
        t.format(name.replace("_", " ")) for name in classnames for t in template
    ]
    # formatting parity: same strings in the same (class-major) order
    assert our_prompts == ref_prompts

    bank = build_textual_memory_bank(
        _our_text_encode_fn(our_prompts, dim),
        classnames,
        template,
        cache=None,
        batch_size=5,  # not a divisor of N*T: exercises the pad path
    )
    np.testing.assert_allclose(bank, ref_weights.T, atol=1e-6)


def test_textual_bank_pkl_interop(ref_utils, tmp_path):
    """get_textual_memory_bank run verbatim writes its pickle cache; the
    rebuild adopts that exact file through FeatureCache (restricted
    unpickler + inline-storage torch tensor decode)."""
    from protoclip_tpu.memory.banks import build_textual_memory_bank
    from protoclip_tpu.memory.cache import FeatureCache

    dim = 32
    classnames = ["wood_block", "power drill", "banana", "mug"]
    template = ["a photo of a {}."]
    cfg = {"cache_dir": str(tmp_path / "caches"), "backbone": "ViT-B/16", "shots": 2}

    stub = _make_clip_stub()
    old = ref_utils.clip
    ref_utils.clip = stub
    try:
        _, ref_bank = ref_utils.get_textual_memory_bank(
            cfg, classnames, template, _RefTextEncoder(stub, dim)
        )
    finally:
        ref_utils.clip = old
    ref_bank = ref_bank.numpy()  # (d, N)

    cache = FeatureCache(cfg["cache_dir"], cfg["backbone"], cfg["shots"])
    raw = cache.load(cache.text_bank_stem())
    assert raw is not None, "rebuild failed to see the reference pickle"

    def _must_not_encode(tokens):  # cache hit expected
        raise AssertionError("adoption path must not re-encode")

    bank = build_textual_memory_bank(_must_not_encode, classnames, template, cache=cache)
    np.testing.assert_allclose(bank, ref_bank.T, atol=0)


# ---------------------------------------------------------------------------
# hp-search pickles (ref main.py:152-207) through the rebuild's readers
# ---------------------------------------------------------------------------


def test_hp_search_pickle_interop(ref_utils, tmp_path):
    from protoclip_tpu.eval.gridsearch import (
        default_alpha_beta_grid,
        sweep_to_triples,
        triples_to_sweep,
    )
    from protoclip_tpu.memory.cache import FeatureCache

    alphas, betas = default_alpha_beta_grid()
    rng = np.random.default_rng(0)
    acc = rng.random((len(alphas), len(betas))).astype(np.float32)

    # the reference builds [alpha, beta, acc] rows alpha-major (main.py:187-199)
    rows = []
    for alpha in alphas:
        for beta in betas:
            rows.append([alpha, beta, acc[alphas.tolist().index(alpha), betas.tolist().index(beta)]])
    ref_rows = np.array(rows, np.float32)

    cfg = {"cache_dir": str(tmp_path / "caches"), "backbone": "RN50", "shots": 16}
    root = ref_utils.get_model_dir_root(cfg)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(
        root,
        f"zero_shot_hp_search_val_{ref_utils.beautify(cfg['backbone'])}_K_{cfg['shots']}.pkl",
    )
    ref_utils.save(ref_rows, path, "hp grid")  # verbatim pickle writer

    cache = FeatureCache(cfg["cache_dir"], cfg["backbone"], cfg["shots"])
    loaded = cache.load(cache.hp_search_stem("val"))
    assert loaded is not None
    grid = triples_to_sweep(loaded["array"], alphas, betas)
    np.testing.assert_allclose(grid, acc, atol=0)

    # and the rebuild's row list is exactly the reference's
    np.testing.assert_allclose(sweep_to_triples(acc, alphas, betas), ref_rows, atol=0)

    # round-trip through the reference's own load()
    back = ref_utils.load(path, "hp grid")
    np.testing.assert_allclose(back, ref_rows, atol=0)


# ---------------------------------------------------------------------------
# cls_acc / losses / target inds / path helpers
# ---------------------------------------------------------------------------


def test_cls_acc_matches_reference(ref_utils):
    from protoclip_tpu.eval.metrics import top_k_accuracy

    rng = np.random.default_rng(2)
    scores = rng.standard_normal((257, 40)).astype(np.float32)
    labels = rng.integers(0, 40, 257).astype(np.int64)
    for k in (1, 5):
        ref = ref_utils.cls_acc(torch.from_numpy(scores), torch.from_numpy(labels), k)
        ours = top_k_accuracy(scores, labels, k)
        assert abs(ref - ours) < 1e-9


def test_loss_L1_matches_reference(ref_utils):
    """compute_loss_and_matches with losses=['L1'] runs NLLLoss verbatim."""
    import jax.numpy as jnp

    from protoclip_tpu.ops.losses import protoclip_loss

    rng = np.random.default_rng(5)
    q_rows, n_class, dim = 64, 8, 16
    p = rng.random((q_rows, n_class)).astype(np.float32) + 1e-3
    p /= p.sum(axis=1, keepdims=True)
    labels = rng.integers(0, n_class, q_rows).astype(np.int64)
    zi = rng.standard_normal((n_class, dim)).astype(np.float32)
    zt = rng.standard_normal((n_class, dim)).astype(np.float32)

    matches, loss, *_ = ref_utils.compute_loss_and_matches(
        torch.from_numpy(p),
        torch.from_numpy(labels),
        torch.from_numpy(zi),
        torch.from_numpy(zt),
        {"losses": ["L1"]},
    )
    terms = protoclip_loss(jnp.asarray(p), jnp.asarray(labels), jnp.asarray(zi), jnp.asarray(zt), ("L1",))
    our_matches = int(np.sum(np.argmax(p, axis=1) == labels))
    assert int(matches.item()) == our_matches
    np.testing.assert_allclose(float(terms["total"]), loss.item(), atol=1e-6)


def test_loss_stack_plumbing_matches_reference(ref_utils):
    """L1+L2+L3+L4 term routing/summation; the InfoNCE terms come from the
    VENDORED published info_nce package (see _info_nce_module)."""
    import jax.numpy as jnp

    from protoclip_tpu.ops.losses import protoclip_loss

    rng = np.random.default_rng(6)
    q_rows, n_class, dim = 48, 9, 20
    p = rng.random((q_rows, n_class)).astype(np.float32) + 1e-3
    p /= p.sum(axis=1, keepdims=True)
    labels = rng.integers(0, n_class, q_rows).astype(np.int64)
    zi = rng.standard_normal((n_class, dim)).astype(np.float32)
    zt = rng.standard_normal((n_class, dim)).astype(np.float32)

    matches, loss, _, l2, l3, l4, l5 = ref_utils.compute_loss_and_matches(
        torch.from_numpy(p),
        torch.from_numpy(labels),
        torch.from_numpy(zi),
        torch.from_numpy(zt),
        {"losses": ["L1", "L2", "L3", "L4"]},
    )
    terms = protoclip_loss(
        jnp.asarray(p), jnp.asarray(labels), jnp.asarray(zi), jnp.asarray(zt),
        ("L1", "L2", "L3", "L4"),
    )
    np.testing.assert_allclose(float(terms["L2"]), l2.item(), atol=1e-5)
    np.testing.assert_allclose(float(terms["L3"]), l3.item(), atol=1e-5)
    np.testing.assert_allclose(float(terms["L4"]), l4.item(), atol=1e-5)
    np.testing.assert_allclose(float(terms["L5"]), l5.item(), atol=1e-5)
    np.testing.assert_allclose(float(terms["total"]), loss.item(), atol=1e-5)


def test_get_target_inds_matches_episode_labels(ref_utils):
    n_class, k_query = 7, 3
    target = ref_utils.get_target_inds((n_class, None, k_query)).numpy()
    expected = np.repeat(np.arange(n_class), k_query).reshape(n_class, k_query, 1)
    np.testing.assert_array_equal(target, expected)


def test_path_helpers_match_reference(ref_utils):
    from protoclip_tpu.io.checkpoint import beautify, model_dir_root

    for backbone in ["RN50", "ViT-B/16", "ViT-L/14", " RN50x16 "]:
        assert beautify(backbone) == ref_utils.beautify(backbone)
        cfg = {"cache_dir": "caches/dtd", "backbone": backbone, "shots": 8}
        assert model_dir_root("caches/dtd", backbone, 8) == ref_utils.get_model_dir_root(cfg)


# ---------------------------------------------------------------------------
# episodic sampler: reference statements executed verbatim, compared
# statistically (ref main.py:218-220,233-258,313)
# ---------------------------------------------------------------------------


def _extract_block(source_lines, first_marker, last_marker):
    first = last = None
    for i, line in enumerate(source_lines):
        if first is None and first_marker in line:
            first = i
        if first is not None and last_marker in line:
            last = i
            break
    assert first is not None and last is not None, (first_marker, last_marker)
    return source_lines[first : last + 1]


def _build_ref_sampler():
    """Compile the reference's sampling statements into a callable.

    The sampling lines (``main.py:233-258``) and the loop-advance line
    (``main.py:313``) are lifted verbatim from source; only a capture hook is
    appended at while-body depth (the torch/training statements between them
    consume no numpy randomness, so dropping them preserves the stream)."""
    with open(pinned_reference_path("main.py")) as fh:
        lines = fh.read().splitlines()

    block = _extract_block(
        lines,
        "class_indexes = np.random.permutation(N)",
        "zq_labels.extend([cls] * len(query))",
    )
    advance = _extract_block(lines, "start += len(class_index)", "start += len(class_index)")[0]
    snippet = textwrap.dedent("\n".join(block))
    # sanity-pin the extraction: these exact statements are what we certify
    for must in [
        "while start < N-1:",
        "num_class = np.random.randint(class_lower, class_upper)",
        "class_indexes[start:min(start + num_class, N-1)])",
        "item_indexes = np.random.permutation(K)",
        "n = np.random.randint(1, K) if K > 1 else K",
        "query = sorted(item_indexes[n:])",
    ]:
        assert must in snippet, f"reference sampler drifted: {must!r} not found"
    body_indent = " " * 4  # while-body depth after dedent
    code = (
        snippet
        + "\n"
        + body_indent
        + "_capture(class_index, support_index, query_index, zq_labels)\n"
        + body_indent
        + advance.strip()
        + "\n"
    )
    compiled = compile(code, "<reference-sampler main.py:233-258>", "exec")

    bounds = _extract_block(lines, "class_upper = int(N * 0.4)", "class_lower = max(int(N * 0.2), 1)")

    def run_epoch(n_class, k_shots):
        """One epoch of reference episodes -> list of per-episode
        (chunk_classes, query_cells) with query_cells = [(cls, slot), ...]."""
        episodes = []

        def _capture(class_index, support_index, query_index, zq_labels):
            cells = [(int(q) // k_shots, int(q) % k_shots) for q in query_index]
            episodes.append((list(class_index), cells))

        env = {"np": np, "N": n_class, "K": k_shots, "_capture": _capture}
        for line in bounds:
            exec(line.strip(), env)
        # per-iteration captures are cumulative lists in the reference
        # (support_index/query_index extend across classes of ONE episode but
        # reset per while-iteration) — reset them here like main.py:242-244
        exec(compiled, env)
        # keep only the per-iteration delta: the reference resets
        # support/query per while-iteration (main.py:242-244), so each
        # capture already holds exactly one episode
        return episodes

    return run_epoch


def _tv_distance(a, b):
    """Total-variation distance between two empirical samples."""
    keys = sorted(set(a) | set(b))
    pa = np.array([a.count(k) for k in keys], np.float64) / max(len(a), 1)
    pb = np.array([b.count(k) for k in keys], np.float64) / max(len(b), 1)
    return 0.5 * float(np.abs(pa - pb).sum())


@pytest.mark.slow
def test_sampler_distributions_match_reference():
    """Chunk-size / episodes-per-epoch / query-count / per-(class,slot)
    marginals of the rebuild's sampler vs the reference statements executed
    verbatim (VERDICT r3 items #1/#9). Exact replay is impossible (legacy
    global RandomState vs np.random.Generator, different draw order), so the
    comparison is distributional over many epochs."""
    from protoclip_tpu.train.episodic import _sample_epoch, episode_bounds

    n_class, k_shots, n_epochs = 12, 4, 4000
    lower, upper = episode_bounds(n_class)
    assert (lower, upper) == (int(n_class * 0.2), int(n_class * 0.4))

    ref_epoch = _build_ref_sampler()
    np.random.seed(20240817)
    ref_chunks, ref_eps, ref_qcounts = [], [], []
    ref_cell = np.zeros((n_class, k_shots), np.int64)
    for _ in range(n_epochs):
        episodes = ref_epoch(n_class, k_shots)
        ref_eps.append(len(episodes))
        for chunk, cells in episodes:
            ref_chunks.append(len(chunk))
            per_class = {}
            for cls, slot in cells:
                ref_cell[cls, slot] += 1
                per_class[cls] = per_class.get(cls, 0) + 1
            ref_qcounts.extend(per_class.values())

    rng = np.random.default_rng(99)
    our_chunks, our_eps, our_qcounts = [], [], []
    our_cell = np.zeros((n_class, k_shots), np.int64)
    for _ in range(n_epochs):
        episodes = _sample_epoch(rng, n_class, k_shots)
        our_eps.append(len(episodes))
        for cells in episodes:
            classes = {cls for cls, _ in cells}
            our_chunks.append(len(classes))
            per_class = {}
            for cls, slot in cells:
                our_cell[cls, slot] += 1
                per_class[cls] = per_class.get(cls, 0) + 1
            our_qcounts.extend(per_class.values())

    assert _tv_distance(ref_chunks, our_chunks) < 0.03
    assert _tv_distance(ref_eps, our_eps) < 0.03
    assert _tv_distance(ref_qcounts, our_qcounts) < 0.03

    ref_rate = ref_cell / n_epochs
    our_rate = our_cell / n_epochs
    assert np.abs(ref_rate - our_rate).max() < 0.05
    assert np.abs(ref_rate - our_rate).mean() < 0.012

    # the reference's N-1 quirk must show on BOTH sides identically: every
    # class still participates with the same marginal (the excluded slot is
    # a random permutation POSITION, not a fixed class)
    assert ref_rate.std(axis=1).max() < 0.02
    assert np.abs(ref_rate.mean() - our_rate.mean()) < 0.01


# ---------------------------------------------------------------------------
# few-shot sampler (ref datasets/utils.py:215-257) executed verbatim:
# EXACT equality, not distributional — both sides draw from the stdlib
# Mersenne Twister with the same seed, so the per-class random.sample /
# random.choices picks must be identical item-for-item.
# ---------------------------------------------------------------------------

_REF_DS_UTILS = None


def _load_ref_dataset_utils():
    """Import the reference's datasets/utils.py verbatim (gdown and
    torchvision stubbed — only referenced inside download/transform helpers
    this diff never calls)."""
    global _REF_DS_UTILS
    if _REF_DS_UTILS is not None:
        return _REF_DS_UTILS
    stubs = {}
    if "gdown" not in sys.modules:
        stubs["gdown"] = types.ModuleType("gdown")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv.transforms = tv_t
        stubs.update({"torchvision": tv, "torchvision.transforms": tv_t})
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_ds_utils", pinned_reference_path(os.path.join("datasets", "utils.py"))
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    _REF_DS_UTILS = mod
    return mod


def _fewshot_problem():
    """Synthetic class layout exercising both sampler branches: big classes
    (random.sample), a class smaller than K (random.choices repeat), and
    interleaved insertion order (grouping is first-appearance ordered)."""
    sizes = {0: 9, 1: 4, 2: 2, 3: 16}  # K=4 -> class 2 takes the choices path
    order = []
    for i in range(max(sizes.values())):
        for label, n in sizes.items():
            if i < n:
                order.append((f"img_{label}_{i}.jpg", label, f"class{label}"))
    return order


@pytest.mark.parametrize("num_shots", [4, 1, -1])
def test_fewshot_sampler_exactly_matches_reference(num_shots):
    import random as stdlib_random

    from protoclip_tpu.data.types import Datum, generate_fewshot

    ref = _load_ref_dataset_utils()
    rows = _fewshot_problem()

    ref_items = [
        ref.Datum(impath=p, label=l, classname=c) for p, l, c in rows
    ]
    base = ref.DatasetBase(train_x=ref_items)
    state = stdlib_random.getstate()
    try:
        stdlib_random.seed(1)  # the reference seeds the GLOBAL stream (utils.py:22-26)
        theirs = base.generate_fewshot_dataset(ref_items, num_shots=num_shots)
    finally:
        stdlib_random.setstate(state)

    ours = generate_fewshot(
        [Datum(impath=p, label=l, classname=c) for p, l, c in rows],
        num_shots=num_shots,
        seed=1,
    )

    assert [d.impath for d in ours] == [d.impath for d in theirs]
    assert [d.label for d in ours] == [d.label for d in theirs]


def test_fewshot_sampler_no_repeat_matches_reference():
    import random as stdlib_random

    from protoclip_tpu.data.types import Datum, generate_fewshot

    ref = _load_ref_dataset_utils()
    rows = _fewshot_problem()
    ref_items = [ref.Datum(impath=p, label=l, classname=c) for p, l, c in rows]
    base = ref.DatasetBase(train_x=ref_items)
    state = stdlib_random.getstate()
    try:
        stdlib_random.seed(1)
        theirs = base.generate_fewshot_dataset(
            ref_items, num_shots=4, repeat=False
        )
    finally:
        stdlib_random.setstate(state)

    ours = generate_fewshot(
        [Datum(impath=p, label=l, classname=c) for p, l, c in rows],
        num_shots=4,
        seed=1,
        repeat=False,
    )
    assert [d.impath for d in ours] == [d.impath for d in theirs]


# ---------------------------------------------------------------------------
# best-HP extraction from the sweep surface (ref utils.py:167-222) executed
# verbatim: the (alpha, beta) the reference extracts from its flattened
# alpha-major accuracy lists must equal best_operating_point on our 2-D
# grid — including argmax tie-breaking (first max wins).
# ---------------------------------------------------------------------------


class _ScalarRecorder:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), step))


def test_best_hp_extraction_matches_reference(ref_utils, tmp_path, monkeypatch):
    from protoclip_tpu.eval.gridsearch import best_cell, best_operating_point

    monkeypatch.chdir(tmp_path)  # the reference writes plots/ under cwd
    alphas = np.round(np.arange(0.0, 1.05, 0.25), 2)   # 5
    betas = np.asarray([0.5, 1.0, 2.0, 4.0], np.float64)  # 4
    rng = np.random.default_rng(17)
    val = rng.uniform(0.2, 0.8, (5, 4))
    test = rng.uniform(0.2, 0.8, (5, 4))
    train = rng.uniform(0.2, 0.8, (5, 4))
    # deliberate tie on val: cells 6 and 13 (flat, alpha-major) share the max
    val.flat[6] = val.flat[13] = 0.95
    test.flat[17] = 0.99

    alpha_flat = np.repeat(alphas, len(betas))
    beta_flat = np.tile(betas, len(alphas))
    writer = _ScalarRecorder()
    cfg = {"dataset": "tiny", "logs_dir_path": "logs"}
    (ref_best_val, ref_val_a, ref_val_b, ref_test_a, ref_test_b) = (
        ref_utils.plot_zero_shot_alpha_beta(
            alpha_flat, beta_flat, val.ravel(), test.ravel(), train.ravel(),
            cfg, writer, 0,
        )
    )

    our_val_a, our_val_b, our_val_acc = best_operating_point(val, alphas, betas)
    our_test_a, our_test_b, _ = best_operating_point(test, alphas, betas)
    assert (our_val_a, our_val_b) == (ref_val_a, ref_val_b)  # tie -> first max
    assert (our_test_a, our_test_b) == (ref_test_a, ref_test_b)
    assert our_val_acc == pytest.approx(float(ref_best_val))

    # test-accuracy AT the val-selected cell (the reference's second scalar)
    i, j = best_cell(val)
    test_at_val = [
        v for t, v, s in writer.scalars
        if t == "Accuracy/zsval-zstestval-zstest-3F-test" and s == 2
    ]
    assert test_at_val == [pytest.approx(float(test[i, j]))]


# ---------------------------------------------------------------------------
# the ImageNet classname + prompt-template asset vs the reference's in-code
# lists (ref datasets/imagenet.py:26-199) executed verbatim: the JSON asset
# was extracted by hand once — this pins it against drift.
# ---------------------------------------------------------------------------


def test_imagenet_asset_matches_reference_lists():
    import json

    stubs = {}
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        stubs = {"torchvision": tv, "torchvision.transforms": tv.transforms}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_imagenet", pinned_reference_path(os.path.join("datasets", "imagenet.py"))
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)

    asset_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "protoclip_tpu", "data", "assets", "imagenet_clip.json",
    )
    with open(asset_path) as fh:
        asset = json.load(fh)

    assert asset["classnames"] == list(mod.imagenet_classes)   # all 1000, in order
    assert asset["templates"] == list(mod.imagenet_templates)  # the 7-template tau


_REF_DS_PKG = None


def _load_ref_datasets_pkg():
    """Import the WHOLE reference datasets package verbatim (relative
    imports intact), once per session; gdown/torchvision stubbed.  Returns
    {submodule_name: module}."""
    global _REF_DS_PKG
    if _REF_DS_PKG is not None:
        return _REF_DS_PKG
    stubs = {}
    if "gdown" not in sys.modules:
        stubs["gdown"] = types.ModuleType("gdown")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        stubs.update({"torchvision": tv, "torchvision.transforms": tv.transforms})
    sys.modules.update(stubs)
    try:
        pkg_dir = pinned_reference_dir("datasets")
        spec = importlib.util.spec_from_file_location(
            "refdatasets",
            os.path.join(pkg_dir, "__init__.py"),
            submodule_search_locations=[pkg_dir],
        )
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["refdatasets"] = pkg
        spec.loader.exec_module(pkg)
        _REF_DS_PKG = {
            name.split(".", 1)[1]: mod
            for name, mod in sys.modules.items()
            if name.startswith("refdatasets.")
        }
    finally:
        for name in list(stubs) + [
            m for m in sys.modules if m.startswith("refdatasets")
        ]:
            sys.modules.pop(name, None)
    return _REF_DS_PKG


def test_dataset_templates_match_reference_modules():
    """Every dataset's prompt template vs the reference adapter modules
    executed verbatim (the ``template = [...]`` at the top of each
    ``datasets/<name>.py``) — the registry's strings were transcribed once;
    this pins them."""
    from protoclip_tpu.data.registry import _JSON_SPECS

    mods = _load_ref_datasets_pkg()
    ref_templates = {
        alias: list(mods[alias].template)
        for alias in (
            "caltech101", "dtd", "eurosat", "food101", "oxford_flowers",
            "oxford_pets", "stanford_cars", "sun397", "ucf101",
            "fewsol", "fgvc",
        )
    }

    for alias, spec_entry in _JSON_SPECS.items():
        assert list(spec_entry.template) == ref_templates[alias], alias
    # fgvc's template lives in its raw-layout builder, not _JSON_SPECS
    assert ref_templates["fgvc"] == ["a photo of a {}, a type of aircraft."]


def test_read_split_matches_reference_executed(tmp_path):
    """The CoOp split-JSON reader (ref ``datasets/oxford_pets.py:108-127``)
    executed verbatim vs ``data/splits.read_split`` on the same file:
    identical (impath, label, classname) triples per split, including the
    path-prefix join."""
    import json as _json

    from protoclip_tpu.data.splits import read_split

    rows = {
        "train": [["a/0.jpg", 0, "ant"], ["b/1.jpg", 1, "bee"]],
        "val": [["a/2.jpg", 0, "ant"]],
        "test": [["b/3.jpg", 1, "bee"], ["a/4.jpg", 0, "ant"]],
    }
    path = tmp_path / "split_zhou_Tiny.json"
    path.write_text(_json.dumps(rows))

    ref_oxford_pets = _load_ref_datasets_pkg()["oxford_pets"]
    theirs = ref_oxford_pets.OxfordPets.read_split(str(path), "/data/imgs")
    ours = read_split(str(path), "/data/imgs")
    for our_items, ref_items in zip(ours, theirs):
        assert [(d.impath, d.label, d.classname) for d in our_items] == [
            (d.impath, d.label, d.classname) for d in ref_items
        ]


def test_listdir_nohidden_bug_divergence_demonstrated(tmp_path):
    """Execute the reference's ``listdir_nohidden`` (``datasets/utils.py:
    57-68``) on a synthetic DTD-style layout and demonstrate the documented
    bug our rebuild deliberately fixes: the ``'sh' not in f`` filter
    silently drops the real DTD classes ``crosshatched`` and ``meshed``
    (PARITY.md 'Deliberate fix')."""
    from protoclip_tpu.data.splits import listdir_nohidden

    ref = _load_ref_dataset_utils()
    for name in ("banded", "crosshatched", "meshed", "dotted", ".hidden"):
        (tmp_path / name).mkdir()

    theirs = sorted(ref.listdir_nohidden(str(tmp_path)))
    ours = sorted(listdir_nohidden(str(tmp_path)))

    assert theirs == ["banded", "dotted"]  # the bug, demonstrated live
    assert ours == ["banded", "crosshatched", "dotted", "meshed"]


def test_tsne_coordinates_match_reference_executed():
    """The reference toolkit's ``get_tsne_coordinates`` (ref
    ``toolkit/.../utils/tsne.py:57-68``) executed verbatim vs
    ``toolkit/tsne.py::_tsne_embed``'s embedding on the same prototypes —
    pins the TSNE hyperparameters (n_components=2, perplexity=10,
    random_state=1) that make the plots reproducible.  The function is
    extracted from source (its module imports cv2/proto_datasets, absent
    here) with a drift guard on the statements."""
    sklearn = pytest.importorskip("sklearn")  # noqa: F841
    from sklearn.manifold import TSNE

    from protoclip_tpu.toolkit.tsne import _tsne_embed

    path = pinned_reference_path(
        os.path.join("toolkit", "proto_clip_toolkit", "utils", "tsne.py")
    )
    src = open(path).read()
    start = src.index("def get_tsne_coordinates(")
    end = src.index("\n\n", src.index("return zi, zt", start))
    snippet = textwrap.dedent(src[start:end])
    for must in (
        "TSNE(n_components=2, perplexity=10, random_state=1).fit_transform(X)",
        "torch.vstack((",
        "tsne_X[:n_class]",
    ):
        assert must in snippet, f"reference tsne drifted: {must!r} not found"

    ns = {"torch": torch, "TSNE": TSNE}
    exec(compile(snippet, path, "exec"), ns)  # noqa: S102 — reference code under test

    rng = np.random.default_rng(23)
    n_class, dim = 6, 16
    zi_in = rng.standard_normal((n_class, dim)).astype(np.float32)
    zt_in = rng.standard_normal((n_class, dim)).astype(np.float32)

    ref_zi, ref_zt = ns["get_tsne_coordinates"](
        torch.from_numpy(zi_in), torch.from_numpy(zt_in), n_class
    )
    our_zi, our_zt = _tsne_embed(zi_in, zt_in, perplexity=10.0)

    np.testing.assert_allclose(our_zi, ref_zi, atol=1e-4)
    np.testing.assert_allclose(our_zt, ref_zt, atol=1e-4)


# ---------------------------------------------------------------------------
# Tip-Adapter search geometry: the reference's search_scale_step executed
# verbatim vs core/config.py (ref main.py:74-102,111 — injected into every
# cfg, then deliberately unused per the comment at main.py:141)
# ---------------------------------------------------------------------------


def test_search_scale_step_matches_executed_reference():
    from protoclip_tpu.core.config import TIP_ADAPTER_SEARCH, search_scale_step

    with open(pinned_reference_path("main.py")) as fh:
        lines = fh.read().splitlines()
    block = _extract_block(lines, "def search_scale_step(cfg):", "return cfg")
    snippet = "\n".join(block)
    for must in (
        "dataset_dict = {'caltech101': ([12, 5], [200, 20]),",
        "search_scale, search_step = dataset_dict.get(dataset, (None, None))",
        "cfg['search_scale'] = search_scale",
    ):
        assert must in snippet, f"reference search table drifted: {must!r}"

    ns = {}
    exec(compile(snippet, "<reference search_scale_step main.py:74-102>", "exec"), ns)  # noqa: S102
    ref_fn = ns["search_scale_step"]

    datasets = sorted(TIP_ADAPTER_SEARCH) + ["unknown-ds"]
    for name in datasets:
        ref_cfg = ref_fn({"dataset": name})
        scale, step = search_scale_step(name)
        assert scale == ref_cfg["search_scale"], name
        assert step == ref_cfg["search_step"], name
    # every reference row is covered (none invented, none missed)
    assert len(TIP_ADAPTER_SEARCH) == 12
    # our fewsol_198 alias resolves to the reference's fewsol row
    ref_fewsol = ref_fn({"dataset": "fewsol"})
    assert search_scale_step("fewsol_198") == (
        ref_fewsol["search_scale"],
        ref_fewsol["search_step"],
    )


# ---------------------------------------------------------------------------
# QueryDataset: the reference's binned-uniform query sampler executed
# verbatim vs data/query.py (ref datasets/utils.py:397-428 — shipped but
# referenced nowhere in the reference itself)
# ---------------------------------------------------------------------------


def test_query_dataset_matches_executed_reference():
    import random as stdlib_random

    from protoclip_tpu.data.query import iter_query_batches, query_bin_data

    ref = _load_ref_dataset_utils()

    state = stdlib_random.getstate()
    try:
        for n, k in [(37, 5), (12, 12), (8, 3), (6, 1)]:
            # the reference consumes the GLOBAL random stream; replaying the
            # same seed on both sides must give item-for-item equality
            stdlib_random.seed(7)
            theirs = ref.QueryDataset(n, k)
            stdlib_random.seed(7)
            ours = query_bin_data(n, k)
            assert ours == theirs.data, (n, k)
            assert len(ours) == len(theirs) == n  # total is exactly n
            assert ours[0] == theirs[0]  # __getitem__ passthrough
    finally:
        stdlib_random.setstate(state)

    # batch contract vs the reference's create_dataloader/collate_fn
    # (shuffle=True, fp32, drop_last=False short tail): same multiset of
    # values and the same batch-shape sequence — shuffle ORDER is RNG-
    # implementation-defined on both sides, so it is not part of parity
    stdlib_random.seed(3)
    loader = ref.create_dataloader(n=37, k=5, batch_size=8)
    ref_batches = [b.numpy() for b in loader]
    stdlib_random.seed(3)
    our_batches = list(iter_query_batches(query_bin_data(37, 5), 8, seed=0))
    assert [b.shape for b in our_batches] == [b.shape for b in ref_batches]
    assert all(b.dtype == np.float32 for b in our_batches)
    np.testing.assert_allclose(
        np.sort(np.concatenate(our_batches)),
        np.sort(np.concatenate(ref_batches)),
        rtol=0, atol=1e-6,  # collate goes through fp32; generation is f64
    )
