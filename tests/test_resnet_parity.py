"""ModifiedResNet parity: our NHWC/folded-BN JAX tower vs a torch-functional
evaluation of the same OpenAI-format state dict.

The torch side is assembled from the documented architecture (anti-aliased
bottlenecks: all convs stride 1, avgpool after conv2 when stride > 1;
3-conv stem + avgpool; QKV attention pooling with a mean-token query —
SURVEY.md §2, ref ``clip/model.py:10-152``) using torch functional ops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from protoclip_tpu.models.clip import CLIPConfig, convert_clip_state_dict, encode_image  # noqa: E402

WIDTH, LAYERS, EMBED, IMG = 8, (2, 2, 2, 2), 32, 64
HEADS = 4  # attnpool heads for the tiny config


def _rand_rn_state_dict(rng):
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = (rng.standard_normal((cout, cin, k, k)) * 0.1).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("visual.conv1", 3, WIDTH // 2, 3); bn("visual.bn1", WIDTH // 2)
    conv("visual.conv2", WIDTH // 2, WIDTH // 2, 3); bn("visual.bn2", WIDTH // 2)
    conv("visual.conv3", WIDTH // 2, WIDTH, 3); bn("visual.bn3", WIDTH)

    inplanes = WIDTH
    for li, (blocks, stride) in enumerate(zip(LAYERS, (1, 2, 2, 2))):
        planes = WIDTH * (2 ** li)
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

    c = WIDTH * 32
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


def _torch_rn_forward(sd, images_nchw):
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

    for li, (blocks, stride0) in enumerate(zip(LAYERS, (1, 2, 2, 2))):
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
        embed_dim_to_check=C, num_heads=HEADS,
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


def test_modified_resnet_matches_torch():
    rng = np.random.default_rng(0)
    sd = _rand_rn_state_dict(rng)
    cfg = CLIPConfig(
        "tiny-rn", EMBED, IMG, LAYERS, WIDTH, None,
        context_length=8, vocab_size=64, transformer_width=16, transformer_layers=1,
        n_vision_heads=HEADS,
    )
    cfg2, params = convert_clip_state_dict(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    images = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ours = np.asarray(encode_image(params, jnp.asarray(images), cfg))
    theirs = _torch_rn_forward(sd, images.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs, atol=5e-4)
