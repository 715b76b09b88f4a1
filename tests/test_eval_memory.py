"""Grid sweep, metrics, memory-bank construction, and cache interop."""

import numpy as np
import pytest

import jax.numpy as jnp

from protoclip_tpu.eval import (
    alpha_beta_sweep,
    best_operating_point,
    default_alpha_beta_grid,
    sweep_to_triples,
    top_k_accuracy,
)
from protoclip_tpu.memory import (
    FeatureCache,
    build_textual_memory_bank,
    build_visual_memory_bank,
    pre_load_features,
)
from protoclip_tpu.data.loader import ArrayLoader
from protoclip_tpu.ops import proto_probs


def test_default_grid_matches_reference():
    alphas, betas = default_alpha_beta_grid()
    assert alphas.tolist() == pytest.approx([0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0])
    assert len(betas) == 29  # 9 fractional + 20 integer
    assert betas[0] == pytest.approx(0.1) and betas[-1] == pytest.approx(20.0)


def test_sweep_matches_naive_loop(rng):
    Q, N, d = 40, 5, 16
    feats = rng.standard_normal((Q, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = rng.integers(0, N, Q)
    img_p = rng.standard_normal((N, d)).astype(np.float32)
    img_p /= np.linalg.norm(img_p, axis=-1, keepdims=True)
    txt_p = rng.standard_normal((N, d)).astype(np.float32)
    txt_p /= np.linalg.norm(txt_p, axis=-1, keepdims=True)

    alphas = np.asarray([0.0, 0.5, 1.0], np.float32)
    betas = np.asarray([0.5, 5.0], np.float32)
    acc = alpha_beta_sweep(feats, labels, img_p, txt_p, alphas, betas)
    assert acc.shape == (3, 2)
    for i, a in enumerate(alphas):
        for j, b in enumerate(betas):
            p = np.asarray(proto_probs(jnp.asarray(feats), jnp.asarray(img_p), jnp.asarray(txt_p), float(a), float(b)))
            expected = float((p.argmax(1) == labels).mean())
            assert acc[i, j] == pytest.approx(expected, abs=1e-6)


def test_best_operating_point_and_triples():
    alphas = np.asarray([0.0, 1.0])
    betas = np.asarray([1.0, 2.0])
    acc = np.asarray([[0.1, 0.9], [0.4, 0.2]])
    a, b, best = best_operating_point(acc, alphas, betas)
    assert (a, b, best) == (0.0, 2.0, pytest.approx(0.9))
    triples = sweep_to_triples(acc, alphas, betas)
    assert triples.shape == (4, 3)
    assert triples[1].tolist() == [0.0, 2.0, pytest.approx(0.9)]


def test_top_k_accuracy():
    scores = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.asarray([1, 2])
    assert top_k_accuracy(scores, labels, 1) == pytest.approx(50.0)
    assert top_k_accuracy(scores, labels, 2) == pytest.approx(50.0)
    assert top_k_accuracy(scores, labels, 3) == pytest.approx(100.0)


# -- memory banks -----------------------------------------------------------


def _fake_encode(images_u8):
    """Deterministic 'encoder': mean-pool pixels into a feature."""
    x = np.asarray(images_u8, np.float32)
    b = x.shape[0]
    feats = np.stack(
        [x.mean((1, 2, 3)), x[:, 0].mean((1, 2)), x[:, :, 0].mean((1, 2)), np.ones(b)],
        axis=1,
    )
    return jnp.asarray(feats)


def test_visual_bank_build(rng, tmp_path):
    # 3 classes x 2 shots of distinct constant images, shuffled order
    images = np.stack([np.full((8, 8, 3), v, np.uint8) for v in (10, 10, 200, 200, 90, 90)])
    labels = np.asarray([2, 2, 0, 0, 1, 1], np.int32)
    loader = ArrayLoader(images, labels, batch_size=4)
    cache = FeatureCache(str(tmp_path), "RN50", 2)
    keys, values = build_visual_memory_bank(_fake_encode, loader, augment_epochs=3, cache=cache, progress=False)
    assert keys.shape == (6, 4) and values.shape == (6, 3)
    np.testing.assert_allclose(np.linalg.norm(keys, axis=-1), 1.0, atol=1e-5)
    # sorted by label: first two rows are label 0 (value 200 images)
    assert values.argmax(1).tolist() == [0, 0, 1, 1, 2, 2]
    # cache round-trips
    keys2, values2 = build_visual_memory_bank(_fake_encode, loader, augment_epochs=3, cache=cache, progress=False)
    np.testing.assert_array_equal(keys, keys2)
    np.testing.assert_array_equal(values, values2)


def test_cache_survives_truncated_npz(tmp_path):
    """Regression: a preemption mid-save used to leave a truncated archive
    that permanently crashed every later load (BadZipFile) until the user
    hand-deleted it.  Saves are now atomic AND loads discard+recompute on
    a corrupt entry."""
    import os

    cache = FeatureCache(str(tmp_path), "RN50", 2)
    path = cache._npz_path("val_features")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"PK\x03\x04 truncated")  # zip magic, garbage body
    assert cache.load("val_features") is None  # discarded, not crashed
    assert not os.path.exists(path)
    cache.save("val_features", features=np.ones((3, 4), np.float32))
    out = cache.load("val_features")
    np.testing.assert_array_equal(out["features"], np.ones((3, 4), np.float32))


def test_bank_caches_reject_other_dataset_variant(rng, tmp_path):
    """fewsol (52-class) and fewsol_198 share one cache tree; a cached bank
    from the other variant must be rebuilt, not silently adopted (the same
    guard pre_load_features applies via expected_count)."""
    images = np.stack([np.full((8, 8, 3), v, np.uint8) for v in (10, 10, 200, 200, 90, 90)])
    labels = np.asarray([2, 2, 0, 0, 1, 1], np.int32)
    loader = ArrayLoader(images, labels, batch_size=4)
    cache = FeatureCache(str(tmp_path), "RN50", 2)
    # poison the cache as if a 7-class variant ran first
    key_stem, value_stem = cache.visual_bank_stems(3)
    cache.save(key_stem, keys=np.ones((14, 4), np.float32))
    cache.save(value_stem, values=np.eye(7, dtype=np.float32)[np.zeros(14, np.int64)])
    keys, values = build_visual_memory_bank(
        _fake_encode, loader, augment_epochs=3, cache=cache, progress=False,
        expected_classes=3,
    )
    assert values.shape == (6, 3)  # rebuilt at the requested variant

    from protoclip_tpu.memory.banks import build_textual_memory_bank

    cache.save(cache.text_bank_stem(), bank=np.ones((7, 4), np.float32))
    bank = build_textual_memory_bank(
        lambda toks: np.ones((toks.shape[0], 4), np.float32),
        ["a", "b", "c"], ["a photo of a {}."], cache, batch_size=4,
    )
    assert bank.shape == (3, 4)  # rebuilt, not the poisoned 7-row bank


def test_visual_bank_reads_reference_layout_pt(tmp_path):
    torch = pytest.importorskip("torch")
    cache = FeatureCache(str(tmp_path), "RN50", 2)
    key_stem, value_stem = cache.visual_bank_stems(3)
    # reference stores keys transposed (d, N*K) as .pt (utils.py:320)
    d, nk = 4, 6
    keys_ref = np.random.default_rng(0).standard_normal((d, nk)).astype(np.float32)
    values_ref = np.eye(3, dtype=np.float32)[np.asarray([0, 0, 1, 1, 2, 2])]
    import os

    os.makedirs(os.path.join(cache.root, "aug"), exist_ok=True)
    torch.save(torch.from_numpy(keys_ref), os.path.join(cache.root, key_stem + ".pt"))
    torch.save(torch.from_numpy(values_ref), os.path.join(cache.root, value_stem + ".pt"))
    keys, values = build_visual_memory_bank(None, None, augment_epochs=3, cache=cache, progress=False)
    np.testing.assert_allclose(keys, keys_ref.T, atol=1e-6)
    np.testing.assert_array_equal(values, values_ref)


def test_textual_bank_math(tmp_path, monkeypatch):
    # fake text encoder: deterministic function of token sum
    def fake_text_encode(tokens):
        t = np.asarray(tokens, np.float32)
        return jnp.asarray(
            np.stack([t.sum(1), t[:, 1], t[:, 2], np.ones(t.shape[0])], axis=1)
        )

    import protoclip_tpu.memory.banks as banks

    def fake_tokenize(prompts, context_length=77):
        out = np.zeros((len(prompts), 8), np.int32)
        for i, p in enumerate(prompts):
            out[i, 1] = len(p)
            out[i, 2] = hash(p) % 97
        return out

    monkeypatch.setattr(banks, "tokenize", fake_tokenize)
    classnames = ["cat", "dog", "sea_lion"]
    template = ["a photo of a {}.", "art of the {}."]
    bank = build_textual_memory_bank(fake_text_encode, classnames, template, cache=None, batch_size=4)
    assert bank.shape == (3, 4)
    np.testing.assert_allclose(np.linalg.norm(bank, axis=-1), 1.0, atol=1e-5)

    # manual: per-prompt normalize -> mean -> normalize, underscores replaced
    prompts = [t.format(c.replace("_", " ")) for c in classnames for t in template]
    toks = fake_tokenize(prompts)
    emb = np.array(fake_text_encode(toks), np.float32).reshape(3, 2, 4)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    manual = emb.mean(1)
    manual /= np.linalg.norm(manual, axis=-1, keepdims=True)
    np.testing.assert_allclose(bank, manual, atol=1e-5)


def test_pre_load_features(tmp_path):
    images = np.stack([np.full((8, 8, 3), v, np.uint8) for v in (0, 50, 100, 150, 250)])
    labels = np.arange(5, dtype=np.int64)
    loader = ArrayLoader(images, labels, batch_size=2)
    cache = FeatureCache(str(tmp_path), "ViT-B/16", 1)
    feats, labs = pre_load_features(_fake_encode, loader, "val", cache, progress=False)
    assert feats.shape == (5, 4)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(labs, labels)
    feats2, labs2 = pre_load_features(None, None, "val", cache, progress=False)
    np.testing.assert_array_equal(feats, feats2)


def test_reference_layout_pt_when_nk_smaller_than_dim(tmp_path):
    """Regression: reference (d, N*K) caches must transpose even when
    N*K < d (small datasets x large backbones)."""
    torch = pytest.importorskip("torch")
    import os

    cache = FeatureCache(str(tmp_path), "RN50", 2)
    key_stem, value_stem = cache.visual_bank_stems(3)
    d, nk = 64, 6  # nk < d
    keys_ref = np.random.default_rng(0).standard_normal((d, nk)).astype(np.float32)
    values_ref = np.eye(3, dtype=np.float32)[np.asarray([0, 0, 1, 1, 2, 2])]
    os.makedirs(os.path.join(cache.root, "aug"), exist_ok=True)
    torch.save(torch.from_numpy(keys_ref), os.path.join(cache.root, key_stem + ".pt"))
    torch.save(torch.from_numpy(values_ref), os.path.join(cache.root, value_stem + ".pt"))
    keys, values = build_visual_memory_bank(None, None, augment_epochs=3, cache=cache, progress=False)
    assert keys.shape == (nk, d)
    np.testing.assert_allclose(keys, keys_ref.T, atol=1e-6)

    # text bank: (d, N) with N < d
    n = 3
    bank_ref = np.random.default_rng(1).standard_normal((d, n)).astype(np.float32)
    cache.save(cache.text_bank_stem(), bank=bank_ref)
    bank = build_textual_memory_bank(None, ["a", "b", "c"], ["{}"], cache=cache)
    assert bank.shape == (n, d)
    np.testing.assert_allclose(bank, bank_ref.T, atol=1e-6)


def test_textual_bank_reads_reference_pkl(tmp_path):
    """Reference textual banks are raw pickles of a (d, N) torch tensor
    (utils.py:36-69); they must load without recompute."""
    torch = pytest.importorskip("torch")
    import os
    import pickle

    cache = FeatureCache(str(tmp_path), "RN50", 2)
    classnames = ["a", "b", "c"]
    d = 8
    bank_ref = np.random.default_rng(0).standard_normal((len(classnames), d))
    bank_ref /= np.linalg.norm(bank_ref, axis=-1, keepdims=True)
    os.makedirs(cache.root, exist_ok=True)
    with open(os.path.join(cache.root, cache.text_bank_stem() + ".pkl"), "wb") as f:
        pickle.dump(torch.from_numpy(bank_ref.T.astype(np.float32)).half(), f)
    # encode_text_fn=None: must be served from the pickle, transposed back
    bank = build_textual_memory_bank(None, classnames, ["{}"], cache=cache)
    np.testing.assert_allclose(bank, bank_ref, atol=2e-3)


def test_hp_grid_reads_reference_pkl(tmp_path):
    """Reference HP sweeps are raw pickles of (341, 3) [alpha, beta, acc]
    rows (main.py:155-211); triples_to_sweep rebuilds the (A, B) grid."""
    import os
    import pickle

    from protoclip_tpu.eval.gridsearch import (
        default_alpha_beta_grid,
        sweep_to_triples,
        triples_to_sweep,
    )

    alphas, betas = default_alpha_beta_grid()
    acc = np.random.default_rng(0).random((len(alphas), len(betas))).astype(np.float32)
    triples = sweep_to_triples(acc, alphas, betas)

    # round-trip through the reference pickle format + FeatureCache
    cache = FeatureCache(str(tmp_path), "RN50", 16)
    stem = cache.hp_search_stem("val")
    os.makedirs(cache.root, exist_ok=True)
    with open(os.path.join(cache.root, stem + ".pkl"), "wb") as f:
        pickle.dump(triples, f)
    cached = cache.load(stem)
    assert cached is not None and "array" in cached
    np.testing.assert_allclose(triples_to_sweep(cached["array"], alphas, betas), acc)


def test_square_bank_orientation_by_row_norms(tmp_path):
    """Regression (round-1 advisor): when the cached bank is square the shape
    test is ambiguous; orientation must be resolved by which side is
    L2-normalized."""
    torch = pytest.importorskip("torch")
    import os

    d = 6
    nk = 6  # N*K == d: square
    rng = np.random.default_rng(1)
    keys = rng.standard_normal((nk, d)).astype(np.float32) * np.asarray(
        [1, 2, 3, 4, 5, 6], np.float32
    )[:, None]  # distinct row norms so transposing is detectably wrong
    keys /= np.linalg.norm(keys, axis=-1, keepdims=True)
    values = np.eye(3, dtype=np.float32)[np.asarray([0, 0, 1, 1, 2, 2])]

    for store_transposed in (False, True):
        cache = FeatureCache(str(tmp_path / f"t{store_transposed}"), "RN50", 2)
        key_stem, value_stem = cache.visual_bank_stems(3)
        os.makedirs(os.path.join(cache.root, "aug"), exist_ok=True)
        stored = keys.T if store_transposed else keys
        torch.save(torch.from_numpy(stored), os.path.join(cache.root, key_stem + ".pt"))
        torch.save(torch.from_numpy(values), os.path.join(cache.root, value_stem + ".pt"))
        got_keys, _ = build_visual_memory_bank(None, None, augment_epochs=3, cache=cache, progress=False)
        np.testing.assert_allclose(got_keys, keys, atol=1e-6)


def test_visual_bank_averages_over_augment_epochs(tmp_path):
    """The bank is mean-then-normalize over augment passes (utils.py:284-332).
    A pass-varying encoder makes the aggregation observable: the previous
    deterministic-encoder test passed even if only one pass were used."""
    images = np.stack([np.full((8, 8, 3), v, np.uint8) for v in (10, 200)])
    labels = np.asarray([0, 1], np.int32)
    loader = ArrayLoader(images, labels, batch_size=2)
    calls = {"n": 0}

    def varying_encode(images_u8):
        # per-pass direction: pass 0 -> e0, pass 1 -> e1, pass 2 -> e2
        i = calls["n"]
        calls["n"] += 1
        b = np.asarray(images_u8).shape[0]
        out = np.zeros((b, 4), np.float32)
        out[:, i % 4] = 1.0 + np.arange(b)  # distinct per row too
        return jnp.asarray(out)

    keys, values = build_visual_memory_bank(
        varying_encode, loader, augment_epochs=3, cache=None, progress=False
    )
    assert calls["n"] == 3  # one encode per augment pass
    # mean of (e0-ish, e1-ish, e2-ish) normalized: all three dims present
    expect0 = np.array([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)
    np.testing.assert_allclose(keys[0], expect0, atol=1e-6)
    expect1 = np.array([2.0, 2.0, 2.0, 0.0]) / np.linalg.norm([2.0, 2.0, 2.0, 0.0])
    np.testing.assert_allclose(keys[1], expect1, atol=1e-6)


def test_top_k_accuracy_tie_breaks_toward_lower_index():
    """Tie at the k boundary must resolve like torch.topk / lax.top_k
    (stable, lower index wins), not argpartition's arbitrary order."""
    # all three scores tied; only index 0 is "in the top-1"
    scores = np.asarray([[0.5, 0.5, 0.5]])
    assert top_k_accuracy(scores, np.asarray([0]), 1) == pytest.approx(100.0)
    assert top_k_accuracy(scores, np.asarray([1]), 1) == pytest.approx(0.0)
    assert top_k_accuracy(scores, np.asarray([1]), 2) == pytest.approx(100.0)


def test_sweep_cache_guards_class_count_variant(tmp_path):
    """Regression (round-2 advisor): fewsol (52-class) and fewsol_198 share
    the caches/fewsol tree (core/config.py::cache_dir) and the sweep stems
    carry only backbone+shots — a cached grid recorded for one class count
    must be recomputed, not adopted, by a run with another."""
    from types import SimpleNamespace

    from protoclip_tpu.core.config import Config
    from protoclip_tpu.obs.logging import MetricLogger
    from protoclip_tpu.train.runner import zero_shot_sweep_phase

    rng = np.random.default_rng(0)
    d, shots = 8, 2

    def make_setup(n_class):
        bank_t = rng.standard_normal((n_class, d)).astype(np.float32)
        bank_t /= np.linalg.norm(bank_t, axis=-1, keepdims=True)
        bank_v = rng.standard_normal((n_class * shots, d)).astype(np.float32)
        bank_v /= np.linalg.norm(bank_v, axis=-1, keepdims=True)
        values = np.eye(n_class, dtype=np.float32).repeat(shots, axis=0)
        feats = rng.standard_normal((6, d)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        labels = rng.integers(0, n_class, 6)
        return SimpleNamespace(
            cache=FeatureCache(str(tmp_path / "caches"), "RN50", shots),
            bank_v=bank_v, bank_values=values, bank_t=bank_t,
            val_feats=feats, val_labels=labels,
            test_feats=feats, test_labels=labels,
        )

    cfg = Config(dataset="fewsol", shots=shots)
    logger = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False)
    zero_shot_sweep_phase(cfg, make_setup(3), logger, progress=False)
    stem = FeatureCache(str(tmp_path / "caches"), "RN50", shots).hp_search_stem("val")
    cache = FeatureCache(str(tmp_path / "caches"), "RN50", shots)
    first = cache.load(stem)
    assert int(first["n_class"]) == 3

    # a 5-class run over the same tree must NOT adopt the 3-class grid
    zero_shot_sweep_phase(cfg, make_setup(5), logger, progress=False)
    second = cache.load(stem)
    assert int(second["n_class"]) == 5
    assert not np.array_equal(first["acc"], second["acc"])


def test_sweep_cache_without_n_class_is_stale(tmp_path):
    """An 'acc' npz lacking n_class was written by an older build of THIS
    framework — its class count is unknown, so it must be recomputed, not
    adopted (reference pickles go through the triples path instead)."""
    from types import SimpleNamespace

    from protoclip_tpu.core.config import Config
    from protoclip_tpu.eval.gridsearch import default_alpha_beta_grid
    from protoclip_tpu.obs.logging import MetricLogger
    from protoclip_tpu.train.runner import zero_shot_sweep_phase

    rng = np.random.default_rng(1)
    d, shots, n_class = 8, 2, 3
    cache = FeatureCache(str(tmp_path / "caches"), "RN50", shots)
    alphas, betas = default_alpha_beta_grid()
    poisoned = np.full((len(alphas), len(betas)), 0.123, np.float32)
    cache.save(cache.hp_search_stem("val"), acc=poisoned)  # NO n_class field
    cache.save(cache.hp_search_stem("test"), acc=poisoned)
    cache.save(cache.hp_search_stem("train"), acc=poisoned)

    bank_t = rng.standard_normal((n_class, d)).astype(np.float32)
    bank_t /= np.linalg.norm(bank_t, axis=-1, keepdims=True)
    bank_v = rng.standard_normal((n_class * shots, d)).astype(np.float32)
    feats = rng.standard_normal((6, d)).astype(np.float32)
    setup = SimpleNamespace(
        cache=cache, bank_v=bank_v,
        bank_values=np.eye(n_class, dtype=np.float32).repeat(shots, axis=0),
        bank_t=bank_t, val_feats=feats, val_labels=rng.integers(0, n_class, 6),
        test_feats=feats, test_labels=rng.integers(0, n_class, 6),
    )
    logger = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False)
    zero_shot_sweep_phase(Config(dataset="fewsol", shots=shots), setup, logger, False)
    refreshed = cache.load(cache.hp_search_stem("val"))
    assert int(refreshed["n_class"]) == n_class
    assert not np.array_equal(refreshed["acc"], poisoned)


@pytest.mark.parametrize(
    "make_rows",
    [
        lambda alphas, betas: np.zeros((7, 3), np.float32),  # truncated grid
        lambda alphas, betas: np.zeros((5, 4), np.float32),  # wrong row width
        # full grid but accuracies outside [0, 1] (stale/corrupt pickle)
        lambda alphas, betas: np.asarray(
            [[a, b, 7.5] for a in alphas for b in betas], np.float32
        ),
        # rows from a FOREIGN alpha grid (partial overlap with the defaults)
        lambda alphas, betas: np.asarray(
            [[a, b, 0.5] for a in np.arange(0.05, 1.05, 0.1) for b in betas],
            np.float32,
        ),
    ],
    ids=["truncated", "wrong-width", "out-of-range", "foreign-grid"],
)
def test_sweep_cache_invalid_reference_pickle_recomputed(tmp_path, make_rows):
    """Regression (VERDICT r3 weak #2): the reference-pickle sweep path used
    to adopt a triples row list as-is.  Any pickle that is not a complete,
    in-range default-grid row list must be recomputed, not adopted (and must
    not crash the run)."""
    import os
    import pickle

    from types import SimpleNamespace

    from protoclip_tpu.core.config import Config
    from protoclip_tpu.eval.gridsearch import default_alpha_beta_grid
    from protoclip_tpu.obs.logging import MetricLogger
    from protoclip_tpu.train.runner import zero_shot_sweep_phase

    rng = np.random.default_rng(2)
    d, shots, n_class = 8, 2, 3
    cache = FeatureCache(str(tmp_path / "caches"), "RN50", shots)
    alphas, betas = default_alpha_beta_grid()
    rows = make_rows(alphas, betas)
    os.makedirs(cache.root, exist_ok=True)
    for split in ("val", "test", "train"):
        with open(
            os.path.join(cache.root, f"{cache.hp_search_stem(split)}.pkl"), "wb"
        ) as fh:
            pickle.dump(rows, fh)

    bank_t = rng.standard_normal((n_class, d)).astype(np.float32)
    bank_t /= np.linalg.norm(bank_t, axis=-1, keepdims=True)
    bank_v = rng.standard_normal((n_class * shots, d)).astype(np.float32)
    feats = rng.standard_normal((6, d)).astype(np.float32)
    setup = SimpleNamespace(
        cache=cache, bank_v=bank_v,
        bank_values=np.eye(n_class, dtype=np.float32).repeat(shots, axis=0),
        bank_t=bank_t, val_feats=feats, val_labels=rng.integers(0, n_class, 6),
        test_feats=feats, test_labels=rng.integers(0, n_class, 6),
    )
    logger = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False)
    zs = zero_shot_sweep_phase(Config(dataset="fewsol", shots=shots), setup, logger, False)
    # recomputed, valid, and persisted with the class-count field
    refreshed = cache.load(cache.hp_search_stem("val"))
    assert int(refreshed["n_class"]) == n_class
    assert 0.0 <= zs["val_best_acc"] <= 1.0
    assert refreshed["acc"].max() <= 1.0


def test_sweep_cache_valid_reference_pickle_adopted(tmp_path):
    """The validation above must NOT break interop: a complete, in-range
    reference row list is adopted verbatim (no recompute, no overwrite)."""
    import os
    import pickle

    from types import SimpleNamespace

    from protoclip_tpu.core.config import Config
    from protoclip_tpu.eval.gridsearch import default_alpha_beta_grid
    from protoclip_tpu.obs.logging import MetricLogger
    from protoclip_tpu.train.runner import zero_shot_sweep_phase

    rng = np.random.default_rng(3)
    d, shots, n_class = 8, 2, 3
    cache = FeatureCache(str(tmp_path / "caches"), "RN50", shots)
    alphas, betas = default_alpha_beta_grid()
    acc = (rng.random((len(alphas), len(betas))) * 0.9).astype(np.float32)
    acc[4, 7] = 0.987  # a recognizable best cell
    rows = sweep_to_triples(acc, alphas, betas)
    os.makedirs(cache.root, exist_ok=True)
    for split in ("val", "test", "train"):
        with open(
            os.path.join(cache.root, f"{cache.hp_search_stem(split)}.pkl"), "wb"
        ) as fh:
            pickle.dump(rows, fh)

    bank_t = rng.standard_normal((n_class, d)).astype(np.float32)
    bank_t /= np.linalg.norm(bank_t, axis=-1, keepdims=True)
    bank_v = rng.standard_normal((n_class * shots, d)).astype(np.float32)
    feats = rng.standard_normal((6, d)).astype(np.float32)
    setup = SimpleNamespace(
        cache=cache, bank_v=bank_v,
        bank_values=np.eye(n_class, dtype=np.float32).repeat(shots, axis=0),
        bank_t=bank_t, val_feats=feats, val_labels=rng.integers(0, n_class, 6),
        test_feats=feats, test_labels=rng.integers(0, n_class, 6),
    )
    logger = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False)
    zs = zero_shot_sweep_phase(Config(dataset="fewsol", shots=shots), setup, logger, False)
    assert zs["val_best_acc"] == pytest.approx(0.987, abs=1e-6)
    assert zs["val_best_alpha"] == pytest.approx(float(alphas[4]))
    assert zs["val_best_beta"] == pytest.approx(float(betas[7]))
    # adopted, not recomputed: no npz written next to the pickle
    assert not os.path.exists(
        os.path.join(cache.root, f"{cache.hp_search_stem('val')}.npz")
    )
