"""Executed-reference differential for the CLIP model code itself.

`tests/test_reference_diff.py` runs the reference's feature/bank/classifier
code (`utils.py`, `main.py`) verbatim.  This module does the same for the
model layer: it imports ``/root/reference/clip/model.py`` VERBATIM (the file
is self-contained — stdlib + numpy + torch only), instantiates the
reference's own ``CLIP`` module at tiny geometry, round-trips the state dict
through the reference's real loader ``build_model`` (ref
``clip/model.py:397-434`` — shape inference, fp16 ``convert_weights``,
strict ``load_state_dict``), and diffs ``encode_image`` / ``encode_text`` /
the contrastive ``forward`` (ref ``clip/model.py:338-370``) against this
framework's converted towers.

Both sides consume the SAME fp16-rounded weights (OpenAI checkpoints are
fp16 on disk, and ``build_model`` casts through fp16 regardless), and both
compute in fp32, so the comparison isolates layout/arithmetic, not dtype.

Covers, with the reference executing its own code rather than a
re-transcription: the ViT tower (ref ``clip/model.py:204-238``), the
ModifiedResNet tower incl. attention pooling (``clip/model.py:10-152``),
the shared text transformer + causal mask + EOT-argmax pooling
(``clip/model.py:155-201,341-354``), the logit-scale contrastive forward
(``clip/model.py:356-370``), and the shape-inference rules of
``build_model`` vs ``infer_config_from_state_dict``.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

from tests.conftest import (
    REFERENCE_DIR,
    pinned_reference_path,
    requires_reference,
)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from protoclip_tpu.models.clip import (  # noqa: E402
    clip_forward,
    convert_clip_state_dict,
    encode_image,
    encode_text,
    infer_config_from_state_dict,
)

REF_MODEL_PATH = os.path.join(REFERENCE_DIR, "clip", "model.py")

pytestmark = [
    requires_reference,
    pytest.mark.skipif(
        not os.path.exists(REF_MODEL_PATH), reason="reference clip/model.py not mounted"
    ),
]


@pytest.fixture(scope="module")
def ref_clip():
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", pinned_reference_path(os.path.join("clip", "model.py"))
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Tiny geometries.  Constraint: the reference hard-codes 64-dims-per-head
# (text: ``transformer_width // 64`` at clip/model.py:420; ViT:
# ``vision_width // 64``; ResNet attnpool: ``vision_width * 32 // 64``) —
# widths of 128 give 2 heads so head splitting/merging is exercised, not
# just single-head attention (ResNet width 8 -> 4 attnpool heads).
TEXT_KW = dict(context_length=8, vocab_size=96, transformer_width=128, transformer_layers=2)
GEOMETRIES = {
    # (vision_layers, vision_width, vision_patch_size, image_resolution)
    "vit": (2, 128, 16, 32),
    "resnet": ((2, 2, 2, 2), 8, None, 64),
    # RN101-like uneven stages: multi-block trailing stacks per stage
    "resnet-uneven": ((2, 3, 2, 3), 8, None, 64),
}


def _reference_state_dict(ref_clip, geometry):
    """The reference CLIP module's OWN random-init state dict at tiny
    geometry, rounded through fp16 (what its checkpoints store on disk)."""
    layers, width, patch, resolution = GEOMETRIES[geometry]
    torch.manual_seed(7)
    heads = TEXT_KW["transformer_width"] // 64
    model = ref_clip.CLIP(
        32,  # embed_dim
        resolution,
        layers,
        width,
        patch,
        TEXT_KW["context_length"],
        TEXT_KW["vocab_size"],
        TEXT_KW["transformer_width"],
        heads,
        TEXT_KW["transformer_layers"],
    )
    sd = {
        k: v.half().float() if v.is_floating_point() else v.clone()
        for k, v in model.state_dict().items()
    }
    return sd


def _tokens_with_controlled_eot(rng, batch, ctx, vocab):
    """Token ids whose per-row argmax (the reference's EOT pooling index,
    clip/model.py:352) sits at a chosen, distinct position per row."""
    ids = rng.integers(0, vocab - 1, size=(batch, ctx))
    eot_pos = rng.integers(1, ctx, size=batch)
    ids[np.arange(batch), eot_pos] = vocab - 1
    return ids.astype(np.int64)


@pytest.mark.parametrize("geometry", sorted(GEOMETRIES), ids=sorted(GEOMETRIES))
def test_towers_match_reference_executed(ref_clip, geometry):
    sd = _reference_state_dict(ref_clip, geometry)

    # reference side: its own loader (infers arch, fp16-casts, strict-loads),
    # then fp32 for CPU compute
    ref_model = ref_clip.build_model({k: v.clone() for k, v in sd.items()}).float()

    # our side: the same tensors through the converter
    sd_np = {k: v.numpy() for k, v in sd.items()}
    cfg, params = convert_clip_state_dict(sd_np)
    params = {k: jnp.asarray(v) if not isinstance(v, dict) else v for k, v in params.items()}

    _, _, _, resolution = GEOMETRIES[geometry]
    rng = np.random.default_rng(3)
    images = rng.standard_normal((3, resolution, resolution, 3)).astype(np.float32)
    tokens = _tokens_with_controlled_eot(
        rng, 5, TEXT_KW["context_length"], TEXT_KW["vocab_size"]
    )

    with torch.no_grad():
        ref_img = ref_model.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
        ref_txt = ref_model.encode_text(torch.from_numpy(tokens)).numpy()

    our_img = np.asarray(encode_image(params, jnp.asarray(images), cfg))
    our_txt = np.asarray(encode_text(params, jnp.asarray(tokens), cfg))

    np.testing.assert_allclose(our_img, ref_img, atol=5e-4)
    np.testing.assert_allclose(our_txt, ref_txt, atol=5e-4)


def test_contrastive_forward_matches_reference_executed(ref_clip):
    sd = _reference_state_dict(ref_clip, "vit")
    ref_model = ref_clip.build_model({k: v.clone() for k, v in sd.items()}).float()
    cfg, params = convert_clip_state_dict({k: v.numpy() for k, v in sd.items()})

    rng = np.random.default_rng(4)
    images = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    tokens = _tokens_with_controlled_eot(
        rng, 4, TEXT_KW["context_length"], TEXT_KW["vocab_size"]
    )

    with torch.no_grad():
        ref_li, ref_lt = ref_model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), torch.from_numpy(tokens)
        )
    our_li, our_lt = clip_forward(params, jnp.asarray(images), jnp.asarray(tokens), cfg)

    # logit_scale (~14.3x) amplifies the feature-level tolerance
    np.testing.assert_allclose(np.asarray(our_li), ref_li.numpy(), atol=2e-2)
    np.testing.assert_allclose(np.asarray(our_lt), ref_lt.numpy(), atol=2e-2)


@pytest.mark.parametrize("geometry", sorted(GEOMETRIES), ids=sorted(GEOMETRIES))
def test_config_inference_agrees_with_reference_build_model(ref_clip, geometry):
    """Our shape-inference must reconstruct exactly the hyperparameters the
    reference's ``build_model`` does (ref ``clip/model.py:397-421``)."""
    layers, width, patch, resolution = GEOMETRIES[geometry]
    sd = _reference_state_dict(ref_clip, geometry)
    cfg = infer_config_from_state_dict({k: v.numpy() for k, v in sd.items()})

    assert cfg.vision_layers == layers
    assert cfg.vision_width == width
    assert cfg.vision_patch_size == patch
    assert cfg.image_resolution == resolution
    assert cfg.embed_dim == 32
    assert cfg.context_length == TEXT_KW["context_length"]
    assert cfg.vocab_size == TEXT_KW["vocab_size"]
    assert cfg.transformer_width == TEXT_KW["transformer_width"]
    assert cfg.transformer_layers == TEXT_KW["transformer_layers"]
    assert cfg.transformer_heads == TEXT_KW["transformer_width"] // 64

    # and the reference's own loader accepts the dict our inference described
    # (strict load inside build_model would raise on any mismatch)
    ref_model = ref_clip.build_model({k: v.clone() for k, v in sd.items()})
    assert ref_model.context_length == cfg.context_length
    assert ref_model.vocab_size == cfg.vocab_size


# ---------------------------------------------------------------------------
# executed-reference differential: the query adapters (ref model.py:12-95)
# run VERBATIM and diffed against models/adapters.py on identical weights.
# (test_adapters.py already pins parity against the real pretrained_ckpt/
# weights at their two shipped shapes; this covers the module's own code at
# arbitrary shapes, incl. the non-perfect-square pad path.)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_adapters():
    import sys

    from tests.test_reference_diff import _load_ref_utils

    path = pinned_reference_path("model.py")
    # model.py opens with `from utils import *`
    sys.modules["utils"] = _load_ref_utils()
    try:
        spec = importlib.util.spec_from_file_location("ref_model_adapters", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop("utils", None)
    return mod


from protoclip_tpu.models.adapters import (  # noqa: E402
    adapter_from_torch_state,
    apply_adapter,
)

# c_in: RN50's 1024 (perfect square), ViT-L/14's 768 (ceil-sqrt pad path,
# model.py:54-59), and a deliberately awkward 37 (7x7 grid, 12 pad zeros)
ADAPTER_CASES = [
    (kind, c_in)
    for kind in ("conv-2x", "conv-3x", "fc")
    for c_in in (1024, 768, 37)
]


@pytest.mark.parametrize(
    "kind,c_in", ADAPTER_CASES, ids=[f"{k}-{c}" for k, c in ADAPTER_CASES]
)
def test_adapter_matches_reference_executed(ref_adapters, kind, c_in):
    torch.manual_seed(11)
    if kind == "fc":
        ref = ref_adapters.Adapter_FC(c_in)
    else:
        ref = ref_adapters.Adapter(c_in, kind)
    ref = ref.eval()

    params = adapter_from_torch_state(
        {k: v.numpy() for k, v in ref.state_dict().items()}, kind
    )

    rng = np.random.default_rng(5)
    x = rng.standard_normal((6, c_in)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    ours = np.asarray(apply_adapter(params, jnp.asarray(x), kind))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


# ---------------------------------------------------------------------------
# The reference's standalone Embedder/MultiHeadAttention/Encoder
# (model.py:98-170 — shipped but instantiated nowhere in the reference)
# run VERBATIM and diffed against models/encoder.py on identical weights.
# ---------------------------------------------------------------------------


from protoclip_tpu.models.encoder import (  # noqa: E402
    encoder_apply,
    encoder_from_torch_state,
    init_encoder,
    multi_head_attention,
)


@pytest.mark.parametrize("masked", [False, True], ids=["no-mask", "mask"])
def test_encoder_matches_reference_executed(ref_adapters, masked):
    """Both the mask branch (softmax attention) and the reference's
    no-mask quirk (raw scaled scores as mixing weights, model.py:110-118)
    must agree with the reference executing its own module."""
    vocab, d_model, heads, B, L = 50, 16, 4, 3, 5
    torch.manual_seed(13)
    weights = torch.randn(vocab, d_model)
    ref = ref_adapters.Encoder(vocab, d_model, heads, weights).eval()

    params = encoder_from_torch_state(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    np.testing.assert_array_equal(params["embed"], weights.numpy())  # clone

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, vocab, (B, L))
    mask_np = rng.integers(0, 2, (B, L, L)) if masked else None

    # the reference's Encoder.forward has no mask plumbing (model.py:168-170
    # always calls attn(x1, x1, x1)); drive its MultiHeadAttention directly
    # for the masked case, exactly as its attention() contract documents
    x_ref = ref.embed(torch.from_numpy(tokens))
    with torch.no_grad():
        if masked:
            theirs = ref.attn(x_ref, x_ref, x_ref, torch.from_numpy(mask_np)).numpy()
        else:
            theirs = ref(torch.from_numpy(tokens)).numpy()

    if masked:
        x = jnp.asarray(params["embed"])[jnp.asarray(tokens)]
        ours = multi_head_attention(
            params, x, x, x, heads, mask=jnp.asarray(mask_np)
        )
    else:
        ours = encoder_apply(params, jnp.asarray(tokens), heads)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_encoder_cross_attention_matches_reference_executed(ref_adapters):
    """Distinct q/k/v inputs through MultiHeadAttention alone — the module
    is generic cross-attention even though Encoder ties q=k=v."""
    d_model, heads = 24, 2
    torch.manual_seed(29)
    ref = ref_adapters.MultiHeadAttention(heads, d_model).eval()
    params = encoder_from_torch_state(
        {f"attn.{k}": v.numpy() for k, v in ref.state_dict().items()}
        | {"embed.embed.weight": np.zeros((1, d_model), np.float32)}
    )
    rng = np.random.default_rng(8)
    q = rng.standard_normal((2, 3, d_model)).astype(np.float32)
    kv = rng.standard_normal((2, 7, d_model)).astype(np.float32)
    mask = rng.integers(0, 2, (2, 3, 7))
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
            torch.from_numpy(mask),
        ).numpy()
    ours = multi_head_attention(
        params, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), heads,
        mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_encoder_init_and_dropout_behavior():
    """Fresh init seeds the embedding from the given table (ref
    model.py:99-103) and score-dropout is identity-off by default,
    scaling-on with a key (ref model.py:119-121 applies Dropout(0.1) to
    the score matrix)."""
    import jax

    rng = np.random.default_rng(0)
    table = rng.standard_normal((10, 8)).astype(np.float32)
    params = init_encoder(rng, table, heads=2)
    np.testing.assert_array_equal(params["embed"], table)
    tokens = jnp.asarray([[1, 2, 3]])
    base = encoder_apply(params, tokens, heads=2)
    again = encoder_apply(params, tokens, heads=2)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(again))
    dropped = encoder_apply(
        params, tokens, heads=2, dropout_rng=jax.random.PRNGKey(5)
    )
    assert not np.allclose(np.asarray(dropped), np.asarray(base))
    with np.testing.assert_raises(ValueError):
        init_encoder(rng, table, heads=3)  # 8 % 3 != 0
