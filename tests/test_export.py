"""AOT serving bundle roundtrip (io/export.py): export the compiled encoder
to disk, reload it WITHOUT the model-building code path, and get identical
features."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoclip_tpu.data.transforms import normalize_batch
from protoclip_tpu.io.export import load_serving_bundle, save_serving_bundle
from protoclip_tpu.models import encode_image
from protoclip_tpu.models.clip import CLIPConfig, init_clip_params

TINY_VIT = CLIPConfig(
    "tiny-vit", embed_dim=32, image_resolution=32, vision_layers=2,
    vision_width=64, vision_patch_size=16, context_length=16, vocab_size=128,
    transformer_width=64, transformer_layers=2,
)


@pytest.fixture(scope="module")
def tiny():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    return TINY_VIT, params


def _legacy_flat(params):
    """Path-keyed leaves like io/export._flatten but WITHOUT the bit-view
    (for writing legacy-format fixtures)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = leaf
    return flat


def test_bundle_roundtrip(tmp_path, tiny):
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=4)
    assert sorted(os.listdir(bundle)) == ["encoder.shlo", "manifest.json", "params.npz"]

    encode = load_serving_bundle(bundle)
    assert encode.manifest["image_resolution"] == 32
    assert encode.manifest["normalized"] is True
    # device-resident escape hatch for benchmarks/pipelines
    assert hasattr(encode, "artifact") and hasattr(encode, "params")

    imgs = np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3), np.uint8)
    got = encode(imgs.astype(np.uint8))
    assert got.shape == (4, 32) and got.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)

    # reference: the live (non-exported) encode path on the same inputs
    def live(params, images_u8):
        feats = encode_image(params, normalize_batch(images_u8, jnp.bfloat16), cfg)
        feats = feats.astype(jnp.float32)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    want = np.asarray(jax.jit(live)(params, jnp.asarray(imgs, jnp.uint8)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bundle_roundtrips_bf16_params(tmp_path, tiny):
    """bfloat16 leaves survive the npz round trip: numpy serializes
    ml_dtypes as opaque void (``|V2``) and destroys them, so the exporter
    stores them as uint16 BIT VIEWS (native size — the earlier fp32
    widening doubled every bundle) and records the true dtype in the
    manifest for the loader to view back."""
    from protoclip_tpu.models.clip import cast_params

    cfg, params = tiny
    bf16 = jax.jit(lambda p: cast_params(p, jnp.bfloat16))(params)
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, bf16, batch_size=2)

    with open(os.path.join(bundle, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["param_dtypes"], "bf16 leaves must be recorded"
    assert set(manifest["param_dtypes"].values()) == {"bfloat16"}
    # stored at native 2-byte width as bit views, no destroyed void leaves
    with np.load(os.path.join(bundle, "params.npz")) as npz:
        assert all(npz[k].dtype.kind != "V" for k in npz.files)
        assert any(npz[k].dtype == np.uint16 for k in npz.files)

    # the BIT-VIEW load path must match the live encoder exactly — this
    # must run BEFORE any legacy rewrite of params.npz, or a wrong-width /
    # wrong-byte-order view bug would hide behind the astype fallback
    encode = load_serving_bundle(bundle)
    imgs = np.random.default_rng(2).integers(0, 256, (2, 32, 32, 3), np.uint8)
    got = encode(imgs)
    assert got.shape == (2, 32) and np.isfinite(got).all()

    def live(p, images_u8):
        feats = encode_image(p, normalize_batch(images_u8, jnp.bfloat16), cfg)
        feats = feats.astype(jnp.float32)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    want = np.asarray(jax.jit(live)(bf16, jnp.asarray(imgs, jnp.uint8)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # legacy v1 bundles (fp32-widened storage) must still load: rewrite the
    # npz the old way + restore the v1 tag, and check the loader's astype
    # fallback produces THE SAME features (widening was value-exact)
    legacy = {
        k: (np.asarray(v).astype(np.float32) if np.asarray(v).dtype.kind == "V" else np.asarray(v))
        for k, v in _legacy_flat(bf16).items()
    }
    with open(os.path.join(bundle, "params.npz"), "wb") as fh:
        np.savez(fh, **legacy)
    manifest["format"] = "protoclip_tpu.serving_bundle.v1"
    manifest.pop("param_storage", None)
    with open(os.path.join(bundle, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    encode_legacy = load_serving_bundle(bundle)
    np.testing.assert_allclose(encode_legacy(imgs), want, atol=1e-6)


def test_bundle_rejects_wrong_shape_and_format(tmp_path, tiny):
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=4, normalize=False)
    encode = load_serving_bundle(bundle)
    assert encode.manifest["normalized"] is False
    # n <= max is accepted (padded to the compiled bucket); over/empty not
    with pytest.raises(ValueError, match="compiled for"):
        encode(np.zeros((5, 32, 32, 3), np.uint8))  # over the max batch
    with pytest.raises(ValueError, match="compiled for"):
        encode(np.zeros((0, 32, 32, 3), np.uint8))  # empty
    with pytest.raises(ValueError, match="compiled for"):
        encode(np.zeros((4, 64, 64, 3), np.uint8))  # wrong resolution
    with pytest.raises(ValueError, match="uint8"):
        # float [0,1] pixels must raise, not silently truncate to zeros
        encode(np.zeros((4, 32, 32, 3), np.float32))
    with pytest.raises(ValueError, match="compiled for"):
        # 0-d input must hit the descriptive ValueError (-> HTTP 400 in
        # cli/serve.py), not a raw len()-of-unsized-object TypeError
        encode(np.uint8(7))

    with open(os.path.join(bundle, "encoder.shlo"), "r+b") as fh:
        fh.write(b"\x00garbage\x00")  # corrupt the artifact header
    with pytest.raises(ValueError, match="corrupt serving-bundle artifact"):
        load_serving_bundle(bundle)

    with open(os.path.join(bundle, "manifest.json")) as fh:
        manifest = json.load(fh)
    manifest["format"] = "something-else"
    with open(os.path.join(bundle, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    with pytest.raises(ValueError, match="not a protoclip_tpu serving bundle"):
        load_serving_bundle(bundle)


def test_export_restores_int8_env_and_rejects_untraceable_int8(tmp_path, tiny, monkeypatch):
    """The exporter scopes $PROTOCLIP_INT8 to its own trace (a process that
    opted into int8 serving must not be silently flipped to bf16 by an
    export, and vice versa), and an int8=True export with the Pallas gate
    closed fails loudly instead of writing a bf16 bundle labeled int8."""
    from protoclip_tpu.ops.pallas_kernels import pallas_enabled

    cfg, params = tiny
    monkeypatch.setenv("PROTOCLIP_INT8", "1")
    save_serving_bundle(str(tmp_path / "a"), cfg, params, batch_size=2)
    assert os.environ["PROTOCLIP_INT8"] == "1"
    # the export itself (int8=False) must be labeled bf16 despite the env
    assert load_serving_bundle(str(tmp_path / "a")).manifest["int8"] is False

    monkeypatch.delenv("PROTOCLIP_INT8")
    save_serving_bundle(str(tmp_path / "b"), cfg, params, batch_size=2)
    assert "PROTOCLIP_INT8" not in os.environ
    assert load_serving_bundle(str(tmp_path / "b")).manifest["int8"] is False

    assert not pallas_enabled()  # CPU test backend
    with pytest.raises(ValueError, match="Pallas kernels are disabled"):
        save_serving_bundle(str(tmp_path / "c"), cfg, params, batch_size=2, int8=True)
    assert not os.path.exists(tmp_path / "c")  # no half-written bundle


def test_bucketed_bundle_routes_to_smallest_fitting_bucket(tmp_path, tiny):
    """batch_sizes exports one executable per bucket; calls route to the
    smallest bucket that fits and return rows identical to the max-bucket
    path (per-image math is row-local)."""
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=8, batch_sizes=(2, 4))
    files = sorted(os.listdir(bundle))
    assert "encoder.shlo" in files  # max bucket keeps the classic name
    assert "encoder_b2.shlo" in files and "encoder_b4.shlo" in files

    encode = load_serving_bundle(bundle)
    assert encode.manifest["batch_sizes"] == [2, 4, 8]
    assert sorted(encode.artifacts) == [2, 4, 8]

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    full = encode(imgs)  # max bucket
    for n in (1, 2, 3, 4, 5, 8):  # exact-fit, pad-within-bucket, next-bucket
        got = encode(imgs[:n])
        assert got.shape == (n, 32)
        np.testing.assert_array_equal(got, full[:n])
    with pytest.raises(ValueError, match="compiled for"):
        encode(np.zeros((9, 32, 32, 3), np.uint8))

    # bucket ordering invalid: batch_size must be the max
    with pytest.raises(ValueError, match="maximum bucket"):
        save_serving_bundle(
            str(tmp_path / "bad"), cfg, params, batch_size=4, batch_sizes=(8,)
        )


def test_bucketed_int8_bundle_bit_identical_in_interpret_mode(tmp_path, tiny, monkeypatch):
    """int8 W8A8 buckets share single-program semantics: with the Pallas
    kernels forced into interpret mode (one program, batch-independent
    math) every bucket's rows are BIT-identical to the max bucket's.  On
    real hardware each bucket is a distinct compiled program whose MXU
    tiling moves fp intermediates ~1 ULP, which int8 rounding amplifies to
    a quantization step at boundaries (measured 2.5e-3 at ViT-B/16, round
    5) — ``scripts/validate_bundle_tpu.py`` checks that with
    mode-appropriate tolerances; THIS test pins that the divergence is
    program-pair noise, not bucket semantics."""
    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    monkeypatch.setenv("PROTOCLIP_PALLAS_INTERPRET", "1")
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=8, batch_sizes=(2, 4),
                        int8=True)
    encode = load_serving_bundle(bundle)
    assert encode.manifest["int8"] is True
    imgs = np.random.default_rng(3).integers(0, 256, (8, 32, 32, 3), np.uint8)
    full = encode(imgs)
    for n in (1, 2, 3, 4, 5, 8):
        np.testing.assert_array_equal(encode(imgs[:n]), full[:n])


def test_single_bucket_bundle_accepts_underfull_batches(tmp_path, tiny):
    """Back-compat relaxation: a classic single-bucket bundle pads n < max
    to its compiled batch instead of rejecting (the padded rows are zero
    and the first n results are unchanged)."""
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=4)
    encode = load_serving_bundle(bundle)
    imgs = np.random.default_rng(2).integers(0, 256, (4, 32, 32, 3), np.uint8)
    np.testing.assert_array_equal(encode(imgs[:3]), encode(imgs)[:3])


def test_export_cli_writes_loadable_bundle(tmp_path, monkeypatch):
    """python -m protoclip_tpu.cli.export — the CLI half of the
    train -> export -> serve workflow — writes a bundle the serving loader
    accepts, with buckets applied."""
    import pickle

    from tests.test_models import _tiny_torch_style_state_dict

    from protoclip_tpu.cli.export import main as export_main

    sd = _tiny_torch_style_state_dict(np.random.default_rng(0))
    weights = str(tmp_path / "tiny.pt")
    with open(weights, "wb") as fh:
        pickle.dump({k: np.asarray(v) for k, v in sd.items()}, fh)
    out = str(tmp_path / "bundle")
    export_main([
        "--backbone", "tiny", "--weights", weights, "--out", out,
        "--batch", "4", "--buckets", "2",
    ])
    encode = load_serving_bundle(out)
    assert encode.manifest["batch_sizes"] == [2, 4]
    n_px = encode.manifest["image_resolution"]
    got = encode(np.zeros((3, n_px, n_px, 3), np.uint8))
    assert got.shape[0] == 3 and np.isfinite(got).all()


def test_manifest_records_backbone(tmp_path, tiny):
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=2)
    assert load_serving_bundle(bundle).manifest["backbone"] == "tiny-vit"


def test_flatten_roundtrips_exact_tree_structure(tmp_path):
    """Sequence nodes and digit-keyed dicts survive the REAL storage round
    trip (np.savez -> np.load for the leaves, json for the seq-node map)
    with their exact treedef — the artifact's call signature requires it; a
    guess-from-keys heuristic would turn {"0","1"} dicts into lists and
    could never rebuild tuples."""
    from protoclip_tpu.io.export import _flatten, _seq_nodes, _unflatten

    tree = {
        "w": np.ones((2, 2), np.float32),
        "blocks": [
            {"k": np.zeros(3, np.float32)},
            {"k": np.ones(3, np.float32)},
        ],
        "pair": (np.float32(1.0), np.float32(2.0)),
        "digit_keyed": {"0": np.zeros(1), "1": np.ones(1)},
    }
    flat, _ = _flatten(tree)
    np.savez(tmp_path / "p.npz", **flat)
    seq_nodes = json.loads(json.dumps(_seq_nodes(tree)))  # manifest trip
    with np.load(tmp_path / "p.npz") as npz:
        rebuilt = _unflatten({k: npz[k] for k in npz.files}, seq_nodes)
    assert jax.tree_util.tree_structure(rebuilt) == jax.tree_util.tree_structure(tree)
    for a, b in zip(jax.tree_util.tree_leaves(rebuilt), jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(a, b)


def test_bundle_weight_swap_takes_effect(tmp_path, tiny):
    """Weights are bundle DATA, not baked constants: editing params.npz
    changes the output without re-exporting the program."""
    cfg, params = tiny
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, cfg, params, batch_size=2)
    imgs = np.random.default_rng(1).integers(0, 256, (2, 32, 32, 3), np.uint8)
    before = load_serving_bundle(bundle)(imgs)

    with np.load(os.path.join(bundle, "params.npz")) as npz:
        flat = {k: npz[k].copy() for k in npz.files}
    key = next(
        k for k in flat
        if k.startswith("visual/") and k.endswith("/wo") and flat[k].ndim >= 2
    )  # a VISUAL weight (text-tower leaves don't feed the image path), and
    #    a RANDOM perturbation (a constant one lies in the null space of the
    #    zero-mean LayerNorm outputs feeding the matmul; attn/bk is likewise
    #    softmax-invariant)
    flat[key] = flat[key] + 0.05 * np.random.default_rng(0).standard_normal(
        flat[key].shape
    ).astype(flat[key].dtype)
    np.savez(os.path.join(bundle, "params.npz"), **flat)
    after = load_serving_bundle(bundle)(imgs)
    assert not np.allclose(before, after)
