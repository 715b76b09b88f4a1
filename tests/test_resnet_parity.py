"""ModifiedResNet parity: our NHWC/folded-BN JAX tower vs a torch-functional
evaluation of the same OpenAI-format state dict.

The torch side is assembled from the documented architecture (anti-aliased
bottlenecks: all convs stride 1, avgpool after conv2 when stride > 1;
3-conv stem + avgpool; QKV attention pooling with a mean-token query —
SURVEY.md §2, ref ``clip/model.py:10-152``) using torch functional ops.

Parametrized over geometries the big registry ResNets exercise (VERDICT r3
missing #4): multi-block ``rest`` stacks (RN101's deep stages scan >1
trailing block per stage) and a width that is not a multiple of 64, driving
the default ``width * 32 // 64`` attention-pool head rule
(ref ``clip/model.py:92,416-420``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from protoclip_tpu.models.clip import (  # noqa: E402
    CLIPConfig,
    convert_clip_state_dict,
    encode_image,
    infer_config_from_state_dict,
)

EMBED, IMG = 32, 64

GEOMETRIES = {
    # RN50-like shape: one trailing ("rest") block per stage
    "rn50-like": (8, (2, 2, 2, 2)),
    # RN101-like shape: rest stacks of depth 2/3/1/2 — exercises the scanned
    # multi-block rest path (models/resnet.py layer scan)
    "multiblock-rest": (8, (3, 4, 2, 3)),
    # width 10 -> attnpool embed 320: heads come from the default
    # width*32//64 rule (=5), like RN50x4's width-80/40-head geometry
    "nonstd-width": (10, (2, 2, 2, 2)),
}


def _rand_rn_state_dict(rng, width, layers):
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = (rng.standard_normal((cout, cin, k, k)) * 0.1).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("visual.conv1", 3, width // 2, 3); bn("visual.bn1", width // 2)
    conv("visual.conv2", width // 2, width // 2, 3); bn("visual.bn2", width // 2)
    conv("visual.conv3", width // 2, width, 3); bn("visual.bn3", width)

    inplanes = width
    for li, (blocks, stride) in enumerate(zip(layers, (1, 2, 2, 2))):
        planes = width * (2 ** li)
        for b in range(blocks):
            p = f"visual.layer{li + 1}.{b}"
            cin = inplanes if b == 0 else planes * 4
            conv(f"{p}.conv1", cin, planes, 1); bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2", planes, planes, 3); bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3", planes, planes * 4, 1); bn(f"{p}.bn3", planes * 4)
            if b == 0 and (stride > 1 or cin != planes * 4):
                conv(f"{p}.downsample.0", cin, planes * 4, 1)
                bn(f"{p}.downsample.1", planes * 4)
        inplanes = planes * 4

    c = width * 32
    spacial = IMG // 32
    sd["visual.attnpool.positional_embedding"] = (
        rng.standard_normal((spacial ** 2 + 1, c)) * c ** -0.5
    ).astype(np.float32)
    for proj, cout in (("q_proj", c), ("k_proj", c), ("v_proj", c), ("c_proj", EMBED)):
        sd[f"visual.attnpool.{proj}.weight"] = (
            rng.standard_normal((cout, c)) * 0.05
        ).astype(np.float32)
        sd[f"visual.attnpool.{proj}.bias"] = (rng.standard_normal(cout) * 0.05).astype(np.float32)

    # minimal text side so the converter has all keys
    tw = 16
    sd["token_embedding.weight"] = rng.standard_normal((64, tw)).astype(np.float32)
    sd["positional_embedding"] = rng.standard_normal((8, tw)).astype(np.float32)
    for i in range(1):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = np.ones(tw, np.float32); sd[f"{p}.ln_1.bias"] = np.zeros(tw, np.float32)
        sd[f"{p}.attn.in_proj_weight"] = rng.standard_normal((3 * tw, tw)).astype(np.float32) * 0.1
        sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * tw, np.float32)
        sd[f"{p}.attn.out_proj.weight"] = rng.standard_normal((tw, tw)).astype(np.float32) * 0.1
        sd[f"{p}.attn.out_proj.bias"] = np.zeros(tw, np.float32)
        sd[f"{p}.ln_2.weight"] = np.ones(tw, np.float32); sd[f"{p}.ln_2.bias"] = np.zeros(tw, np.float32)
        sd[f"{p}.mlp.c_fc.weight"] = rng.standard_normal((4 * tw, tw)).astype(np.float32) * 0.1
        sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * tw, np.float32)
        sd[f"{p}.mlp.c_proj.weight"] = rng.standard_normal((tw, 4 * tw)).astype(np.float32) * 0.1
        sd[f"{p}.mlp.c_proj.bias"] = np.zeros(tw, np.float32)
    sd["ln_final.weight"] = np.ones(tw, np.float32); sd["ln_final.bias"] = np.zeros(tw, np.float32)
    sd["text_projection"] = rng.standard_normal((tw, EMBED)).astype(np.float32)
    sd["logit_scale"] = np.float32(0.0)
    return sd


def _torch_rn_forward(sd, images_nchw, layers, heads):
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(images_nchw)

    def bn(name, v):
        return F.batch_norm(
            v, t[f"{name}.running_mean"], t[f"{name}.running_var"],
            t[f"{name}.weight"], t[f"{name}.bias"], training=False,
        )

    # stem
    x = F.relu(bn("visual.bn1", F.conv2d(x, t["visual.conv1.weight"], stride=2, padding=1)))
    x = F.relu(bn("visual.bn2", F.conv2d(x, t["visual.conv2.weight"], padding=1)))
    x = F.relu(bn("visual.bn3", F.conv2d(x, t["visual.conv3.weight"], padding=1)))
    x = F.avg_pool2d(x, 2)

    for li, (blocks, stride0) in enumerate(zip(layers, (1, 2, 2, 2))):
        for b in range(blocks):
            p = f"visual.layer{li + 1}.{b}"
            stride = stride0 if b == 0 else 1
            identity = x
            out = F.relu(bn(f"{p}.bn1", F.conv2d(x, t[f"{p}.conv1.weight"])))
            out = F.relu(bn(f"{p}.bn2", F.conv2d(out, t[f"{p}.conv2.weight"], padding=1)))
            if stride > 1:
                out = F.avg_pool2d(out, stride)
            out = bn(f"{p}.bn3", F.conv2d(out, t[f"{p}.conv3.weight"]))
            if f"{p}.downsample.0.weight" in t:
                identity = x
                if stride > 1:
                    identity = F.avg_pool2d(identity, stride)
                identity = bn(f"{p}.downsample.1", F.conv2d(identity, t[f"{p}.downsample.0.weight"]))
            x = F.relu(out + identity)

    # attention pool (full self-attention, keep token 0 — the reference way)
    B, C, Hs, Ws = x.shape
    tok = x.reshape(B, C, Hs * Ws).permute(2, 0, 1)  # (HW, B, C)
    tok = torch.cat([tok.mean(dim=0, keepdim=True), tok], dim=0)
    tok = tok + t["visual.attnpool.positional_embedding"][:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=tok, key=tok, value=tok,
        embed_dim_to_check=C, num_heads=heads,
        q_proj_weight=t["visual.attnpool.q_proj.weight"],
        k_proj_weight=t["visual.attnpool.k_proj.weight"],
        v_proj_weight=t["visual.attnpool.v_proj.weight"],
        in_proj_weight=None,
        in_proj_bias=torch.cat([
            t["visual.attnpool.q_proj.bias"],
            t["visual.attnpool.k_proj.bias"],
            t["visual.attnpool.v_proj.bias"],
        ]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=t["visual.attnpool.c_proj.weight"],
        out_proj_bias=t["visual.attnpool.c_proj.bias"],
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    return out[0].detach().numpy()


@pytest.mark.parametrize("geometry", sorted(GEOMETRIES), ids=sorted(GEOMETRIES))
def test_modified_resnet_matches_torch(geometry):
    width, layers = GEOMETRIES[geometry]
    heads = width * 32 // 64  # the OpenAI rule the config defaults to
    rng = np.random.default_rng(0)
    sd = _rand_rn_state_dict(rng, width, layers)
    cfg = CLIPConfig(
        "tiny-rn", EMBED, IMG, layers, width, None,
        context_length=8, vocab_size=64, transformer_width=16, transformer_layers=1,
    )
    assert cfg.vision_heads_resnet == heads
    cfg2, params = convert_clip_state_dict(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    images = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ours = np.asarray(encode_image(params, jnp.asarray(images), cfg))
    theirs = _torch_rn_forward(sd, images.transpose(0, 3, 1, 2), layers, heads)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_infer_config_from_rn_state_dict():
    """Shape-based inference (ref ``clip/model.py:397-420``) on a ResNet
    state dict with uneven stages and a non-64-multiple width, end-to-end
    into conversion + forward (the path ``load_clip`` takes for a custom
    checkpoint with no registry entry)."""
    width, layers = 10, (3, 4, 2, 3)
    rng = np.random.default_rng(1)
    sd = _rand_rn_state_dict(rng, width, layers)
    cfg = infer_config_from_state_dict(sd)
    assert cfg.name == "custom"
    assert cfg.vision_layers == layers
    assert cfg.vision_width == width
    assert cfg.vision_patch_size is None
    assert cfg.image_resolution == IMG
    assert cfg.embed_dim == EMBED
    assert cfg.vision_heads_resnet == width * 32 // 64 == 5
    assert cfg.transformer_layers == 1 and cfg.transformer_width == 16

    # inferred config drives conversion + forward without a registry entry
    cfg2, params = convert_clip_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    images = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    ours = np.asarray(encode_image(params, jnp.asarray(images), cfg2))
    theirs = _torch_rn_forward(
        sd, images.transpose(0, 3, 1, 2), layers, width * 32 // 64
    )
    np.testing.assert_allclose(ours, theirs, atol=5e-4)
