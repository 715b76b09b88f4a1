"""End-to-end numerical parity of the JAX CLIP towers against HuggingFace's
torch ``CLIPModel`` (an independent, widely-validated implementation of the
same OpenAI architecture) with identical weights.

This is the strongest parity evidence available without the OpenAI weight
files: if our towers match HF's on random weights at fp32, they match on the
real weights too (same computation graph).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from protoclip_tpu.models.clip import convert_clip_state_dict, encode_image, encode_text  # noqa: E402


HIDDEN, LAYERS, HEADS, PATCH, IMG, EMBED = 64, 2, 4, 16, 32, 32
VOCAB, CTX = 128, 16


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.CLIPConfig(
        projection_dim=EMBED,
        text_config={
            "hidden_size": HIDDEN,
            "intermediate_size": 4 * HIDDEN,
            "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS,
            "max_position_embeddings": CTX,
            "vocab_size": VOCAB,
            "hidden_act": "quick_gelu",
            # HF pools at eos_token_id; OpenAI (and we) pool at the argmax
            # token id.  Make both rules agree for the tiny vocab.
            "eos_token_id": VOCAB - 1,
        },
        vision_config={
            "hidden_size": HIDDEN,
            "intermediate_size": 4 * HIDDEN,
            "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS,
            "image_size": IMG,
            "patch_size": PATCH,
            "hidden_act": "quick_gelu",
        },
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)
    model.eval()
    return model


def _hf_to_openai_state_dict(model) -> dict:
    """Map HF CLIPModel params to the OpenAI state-dict naming our converter
    consumes (the inverse of HF's convert_clip_original_pytorch_to_hf)."""
    hf = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd = {}

    def blocks(src_prefix, dst_prefix, n_layers):
        for i in range(n_layers):
            s = f"{src_prefix}.encoder.layers.{i}"
            d = f"{dst_prefix}.resblocks.{i}"
            q, k, v = (
                hf[f"{s}.self_attn.q_proj.weight"],
                hf[f"{s}.self_attn.k_proj.weight"],
                hf[f"{s}.self_attn.v_proj.weight"],
            )
            qb, kb, vb = (
                hf[f"{s}.self_attn.q_proj.bias"],
                hf[f"{s}.self_attn.k_proj.bias"],
                hf[f"{s}.self_attn.v_proj.bias"],
            )
            sd[f"{d}.attn.in_proj_weight"] = np.concatenate([q, k, v], 0)
            sd[f"{d}.attn.in_proj_bias"] = np.concatenate([qb, kb, vb], 0)
            sd[f"{d}.attn.out_proj.weight"] = hf[f"{s}.self_attn.out_proj.weight"]
            sd[f"{d}.attn.out_proj.bias"] = hf[f"{s}.self_attn.out_proj.bias"]
            sd[f"{d}.ln_1.weight"] = hf[f"{s}.layer_norm1.weight"]
            sd[f"{d}.ln_1.bias"] = hf[f"{s}.layer_norm1.bias"]
            sd[f"{d}.ln_2.weight"] = hf[f"{s}.layer_norm2.weight"]
            sd[f"{d}.ln_2.bias"] = hf[f"{s}.layer_norm2.bias"]
            sd[f"{d}.mlp.c_fc.weight"] = hf[f"{s}.mlp.fc1.weight"]
            sd[f"{d}.mlp.c_fc.bias"] = hf[f"{s}.mlp.fc1.bias"]
            sd[f"{d}.mlp.c_proj.weight"] = hf[f"{s}.mlp.fc2.weight"]
            sd[f"{d}.mlp.c_proj.bias"] = hf[f"{s}.mlp.fc2.bias"]

    n_vision_layers = model.config.vision_config.num_hidden_layers
    n_text_layers = model.config.text_config.num_hidden_layers
    sd["visual.conv1.weight"] = hf["vision_model.embeddings.patch_embedding.weight"]
    sd["visual.class_embedding"] = hf["vision_model.embeddings.class_embedding"]
    sd["visual.positional_embedding"] = hf["vision_model.embeddings.position_embedding.weight"]
    sd["visual.ln_pre.weight"] = hf["vision_model.pre_layrnorm.weight"]
    sd["visual.ln_pre.bias"] = hf["vision_model.pre_layrnorm.bias"]
    blocks("vision_model", "visual.transformer", n_vision_layers)
    sd["visual.ln_post.weight"] = hf["vision_model.post_layernorm.weight"]
    sd["visual.ln_post.bias"] = hf["vision_model.post_layernorm.bias"]
    sd["visual.proj"] = hf["visual_projection.weight"].T

    sd["token_embedding.weight"] = hf["text_model.embeddings.token_embedding.weight"]
    sd["positional_embedding"] = hf["text_model.embeddings.position_embedding.weight"]
    blocks("text_model", "transformer", n_text_layers)
    sd["ln_final.weight"] = hf["text_model.final_layer_norm.weight"]
    sd["ln_final.bias"] = hf["text_model.final_layer_norm.bias"]
    sd["text_projection"] = hf["text_projection.weight"].T
    sd["logit_scale"] = hf["logit_scale"]
    return sd


@pytest.fixture(scope="module")
def converted(hf_model):
    from protoclip_tpu.models.clip import CLIPConfig

    # Explicit config: the tiny dims break the width//64 head-count rule.
    tiny_cfg = CLIPConfig(
        "hf-tiny", EMBED, IMG, LAYERS, HIDDEN, PATCH, CTX, VOCAB, HIDDEN, LAYERS,
        n_vision_heads=HEADS, n_text_heads=HEADS,
    )
    cfg, params = convert_clip_state_dict(_hf_to_openai_state_dict(hf_model), tiny_cfg)
    return cfg, jax.tree_util.tree_map(jnp.asarray, params)


def test_image_tower_parity(hf_model, converted):
    cfg, params = converted
    rng = np.random.default_rng(0)
    images = rng.standard_normal((3, IMG, IMG, 3)).astype(np.float32)

    ours = np.asarray(encode_image(params, jnp.asarray(images), cfg))
    with torch.no_grad():
        theirs = hf_model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_text_tower_parity(hf_model, converted):
    cfg, params = converted
    rng = np.random.default_rng(1)
    # random tokens; EOT (max id VOCAB-1) at varying positions, zero padding
    tokens = np.zeros((4, CTX), np.int32)
    for row in range(4):
        n = int(rng.integers(3, CTX))
        tokens[row, : n - 1] = rng.integers(1, VOCAB - 1, n - 1)
        tokens[row, n - 1] = VOCAB - 1

    ours = np.asarray(encode_text(params, jnp.asarray(tokens), cfg))
    with torch.no_grad():
        theirs = hf_model.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            attention_mask=torch.ones_like(torch.from_numpy(tokens.astype(np.int64))),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_contrastive_forward_parity(hf_model, converted):
    from protoclip_tpu.models.clip import clip_forward

    cfg, params = converted
    rng = np.random.default_rng(2)
    images = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    tokens = np.zeros((2, CTX), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = VOCAB - 1

    ours_i, ours_t = clip_forward(params, jnp.asarray(images), jnp.asarray(tokens), cfg)
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)),
            attention_mask=torch.ones((2, CTX), dtype=torch.int64),
        )
    np.testing.assert_allclose(
        np.asarray(ours_i), out.logits_per_image.numpy(), atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(ours_t), out.logits_per_text.numpy(), atol=5e-3)


# ---------------------------------------------------------------------------
# real geometry: ViT-B/16 dims (768/12/12 vision, 512/12/8 text, 224px, 77ctx)
# so layout/head-count/precision bugs can't hide at toy sizes (round-2 item).
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_vit_b16_geometry_parity():
    cfg_hf = transformers.CLIPConfig(
        projection_dim=512,
        text_config={
            "hidden_size": 512,
            "intermediate_size": 2048,
            "num_hidden_layers": 12,
            "num_attention_heads": 8,
            "max_position_embeddings": 77,
            "vocab_size": 49408,
            "hidden_act": "quick_gelu",
            "eos_token_id": 49407,
        },
        vision_config={
            "hidden_size": 768,
            "intermediate_size": 3072,
            "num_hidden_layers": 12,
            "num_attention_heads": 12,
            "image_size": 224,
            "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg_hf)
    model.eval()

    # the width//64 head rule must reproduce the real head counts (12 and 8)
    cfg, params = convert_clip_state_dict(_hf_to_openai_state_dict(model))
    assert cfg.name == "ViT-B/16"
    assert cfg.image_resolution == 224 and cfg.context_length == 77
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    images = (rng.standard_normal((2, 224, 224, 3)) * 0.5).astype(np.float32)
    ours_i = np.asarray(jax.jit(lambda p, x: encode_image(p, x, cfg))(params, jnp.asarray(images)))
    with torch.no_grad():
        theirs_i = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours_i, theirs_i, atol=2e-3)

    tokens = np.zeros((2, 77), np.int32)
    tokens[:, 0] = 49406  # SOT
    tokens[0, 1:9] = rng.integers(1, 49406, 8)
    tokens[0, 9] = 49407  # EOT
    tokens[1, 1:40] = rng.integers(1, 49406, 39)
    tokens[1, 40] = 49407
    ours_t = np.asarray(jax.jit(lambda p, t: encode_text(p, t, cfg))(params, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs_t = model.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            attention_mask=torch.ones((2, 77), dtype=torch.int64),
        ).numpy()
    np.testing.assert_allclose(ours_t, theirs_t, atol=2e-3)
