"""CLIP container: backbone registry, init, apply, torch weight import.

Replaces the reference's loader stack (``clip/clip.py:92-191`` +
``clip/model.py:397-434``): the same 7 OpenAI backbones, with architecture
either taken from the registry or inferred from a checkpoint's tensor shapes.

Weights come from OpenAI ``.pt`` releases via the pure-Python reader in
``protoclip_tpu.io.torch_pt`` (state-dict format) or ``torch.jit`` (JIT
archives, requires torch).  Stored dtype on TPU is bfloat16 by default, with
LayerNorm/softmax in fp32 — mirroring the reference's fp16/fp32 split.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from protoclip_tpu.models import resnet as _resnet
from protoclip_tpu.models import text as _text
from protoclip_tpu.models import vit as _vit

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Architecture hyperparameters (ref ``clip/model.py:241-295``)."""

    name: str
    embed_dim: int
    image_resolution: int
    vision_layers: Union[int, Tuple[int, int, int, int]]
    vision_width: int
    vision_patch_size: Optional[int]  # None for ResNet towers
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_layers: int = 12
    # Head-count overrides for non-standard widths (None = OpenAI's
    # 64-dims-per-head rule, clip/model.py:261,270).
    n_vision_heads: Optional[int] = None
    n_text_heads: Optional[int] = None

    @property
    def is_vit(self) -> bool:
        return self.vision_patch_size is not None

    @property
    def vision_heads(self) -> int:
        return self.n_vision_heads or self.vision_width // 64

    @property
    def vision_heads_resnet(self) -> int:
        return self.n_vision_heads or self.vision_width * 32 // 64

    @property
    def transformer_heads(self) -> int:
        return self.n_text_heads or self.transformer_width // 64


BACKBONE_CONFIGS: Dict[str, CLIPConfig] = {
    "RN50": CLIPConfig("RN50", 1024, 224, (3, 4, 6, 3), 64, None),
    "RN101": CLIPConfig("RN101", 512, 224, (3, 4, 23, 3), 64, None),
    "RN50x4": CLIPConfig(
        "RN50x4", 640, 288, (4, 6, 10, 6), 80, None, transformer_width=640
    ),
    "RN50x16": CLIPConfig(
        "RN50x16", 768, 384, (6, 8, 18, 8), 96, None, transformer_width=768
    ),
    "ViT-B/32": CLIPConfig("ViT-B/32", 512, 224, 12, 768, 32),
    "ViT-B/16": CLIPConfig("ViT-B/16", 512, 224, 12, 768, 16),
    "ViT-L/14": CLIPConfig(
        "ViT-L/14", 768, 224, 24, 1024, 14, transformer_width=768
    ),
}


def available_backbones() -> list:
    return list(BACKBONE_CONFIGS)


# -- apply ------------------------------------------------------------------


def encode_image(params: Params, images: jax.Array, cfg: CLIPConfig) -> jax.Array:
    """(B, H, W, 3) preprocessed images -> (B, embed_dim) features."""
    if cfg.is_vit:
        return _vit.apply_vit(params["visual"], images, cfg)
    return _resnet.apply_resnet(params["visual"], images, cfg)


def encode_text(params: Params, tokens: jax.Array, cfg: CLIPConfig) -> jax.Array:
    """(B, 77) token ids -> (B, embed_dim) features."""
    return _text.apply_text(params["text"], tokens, cfg)


def clip_forward(
    params: Params, images: jax.Array, tokens: jax.Array, cfg: CLIPConfig
) -> Tuple[jax.Array, jax.Array]:
    """Contrastive logits as in ``clip/model.py:356-370``."""
    from protoclip_tpu.ops.proto import l2_normalize

    img = l2_normalize(encode_image(params, images, cfg).astype(jnp.float32))
    txt = l2_normalize(encode_text(params, tokens, cfg).astype(jnp.float32))
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


# -- init -------------------------------------------------------------------


def init_clip_params(rng: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    kv, kt = jax.random.split(rng)
    visual = (
        _vit.init_vit_params(kv, cfg, dtype)
        if cfg.is_vit
        else _resnet.init_resnet_params(kv, cfg, dtype)
    )
    return {
        "visual": visual,
        "text": _text.init_text_params(kt, cfg, dtype),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


# -- torch state-dict conversion -------------------------------------------


def infer_config_from_state_dict(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Shape-based architecture inference (ref ``clip/model.py:397-420``)."""
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        patch = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = patch * grid
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        patch = None
        image_resolution = out_width * 32

    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    name = next(
        (
            n
            for n, c in BACKBONE_CONFIGS.items()
            if c.vision_layers == vision_layers
            and c.vision_width == vision_width
            and c.vision_patch_size == patch
        ),
        "custom",
    )
    return CLIPConfig(
        name,
        int(embed_dim),
        int(image_resolution),
        vision_layers,
        int(vision_width),
        patch,
        int(context_length),
        int(vocab_size),
        int(transformer_width),
        int(transformer_layers),
    )


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _f32(sd[f"{prefix}.weight"]), "bias": _f32(sd[f"{prefix}.bias"])}


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Fold frozen BatchNorm stats into scale/bias: y = x*scale + bias."""
    gamma = _f32(sd[f"{prefix}.weight"])
    beta = _f32(sd[f"{prefix}.bias"])
    mean = _f32(sd[f"{prefix}.running_mean"])
    var = _f32(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> HWIO."""
    return _f32(w).transpose(2, 3, 1, 0)


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int) -> Dict:
    """Per-layer torch resblock tensors -> stacked scan-ready pytree."""
    layers = []
    for i in range(n_layers):
        p = f"{prefix}.resblocks.{i}"
        in_w = _f32(sd[f"{p}.attn.in_proj_weight"])
        in_b = _f32(sd[f"{p}.attn.in_proj_bias"])
        d = in_w.shape[1]
        wq, wk, wv = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        bq, bk, bv = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        layers.append(
            {
                "ln_1": _ln(sd, f"{p}.ln_1"),
                "attn": {
                    "wq": wq.T,
                    "wk": wk.T,
                    "wv": wv.T,
                    "wo": _f32(sd[f"{p}.attn.out_proj.weight"]).T,
                    "bq": bq,
                    "bk": bk,
                    "bv": bv,
                    "bo": _f32(sd[f"{p}.attn.out_proj.bias"]),
                },
                "ln_2": _ln(sd, f"{p}.ln_2"),
                "mlp": {
                    "w_fc": _f32(sd[f"{p}.mlp.c_fc.weight"]).T,
                    "b_fc": _f32(sd[f"{p}.mlp.c_fc.bias"]),
                    "w_proj": _f32(sd[f"{p}.mlp.c_proj.weight"]).T,
                    "b_proj": _f32(sd[f"{p}.mlp.c_proj.bias"]),
                },
            }
        )
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)


def _convert_bottleneck(sd: Dict[str, np.ndarray], p: str) -> Dict:
    out = {
        "conv1": _conv_hwio(sd[f"{p}.conv1.weight"]),
        "bn1": _fold_bn(sd, f"{p}.bn1"),
        "conv2": _conv_hwio(sd[f"{p}.conv2.weight"]),
        "bn2": _fold_bn(sd, f"{p}.bn2"),
        "conv3": _conv_hwio(sd[f"{p}.conv3.weight"]),
        "bn3": _fold_bn(sd, f"{p}.bn3"),
    }
    if f"{p}.downsample.0.weight" in sd:
        out["downsample"] = {
            "conv": _conv_hwio(sd[f"{p}.downsample.0.weight"]),
            "bn": _fold_bn(sd, f"{p}.downsample.1"),
        }
    return out


def convert_clip_state_dict(
    sd: Dict[str, np.ndarray], cfg: Optional[CLIPConfig] = None
) -> Tuple[CLIPConfig, Params]:
    """OpenAI CLIP torch state dict -> (config, fp32 numpy param pytree)."""
    sd = {k: v for k, v in sd.items() if k not in ("input_resolution", "context_length", "vocab_size")}
    cfg = cfg or infer_config_from_state_dict(sd)

    if cfg.is_vit:
        patch = cfg.vision_patch_size
        # OIHW (width, 3, P, P) -> (P, P, 3, width) flattened to (P*P*3, width),
        # matching vit.patchify's (py, px, c) patch ordering.
        pe = _f32(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)
        visual: Params = {
            "patch_embed": pe.reshape(patch * patch * 3, cfg.vision_width),
            "class_embedding": _f32(sd["visual.class_embedding"]),
            "positional_embedding": _f32(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": _stack_blocks(sd, "visual.transformer", cfg.vision_layers),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": _f32(sd["visual.proj"]),
        }
    else:
        visual = {
            "stem": {
                "conv1": _conv_hwio(sd["visual.conv1.weight"]),
                "bn1": _fold_bn(sd, "visual.bn1"),
                "conv2": _conv_hwio(sd["visual.conv2.weight"]),
                "bn2": _fold_bn(sd, "visual.bn2"),
                "conv3": _conv_hwio(sd["visual.conv3.weight"]),
                "bn3": _fold_bn(sd, "visual.bn3"),
            }
        }
        for li, blocks in enumerate(cfg.vision_layers):
            prefix = f"visual.layer{li + 1}"
            block0 = _convert_bottleneck(sd, f"{prefix}.0")
            rest = None
            if blocks > 1:
                rest_list = [
                    _convert_bottleneck(sd, f"{prefix}.{j}") for j in range(1, blocks)
                ]
                rest = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *rest_list)
            visual[f"layer{li + 1}"] = {"block0": block0, "rest": rest}
        visual["attnpool"] = {
            "positional_embedding": _f32(sd["visual.attnpool.positional_embedding"]),
            "wq": _f32(sd["visual.attnpool.q_proj.weight"]).T,
            "bq": _f32(sd["visual.attnpool.q_proj.bias"]),
            "wk": _f32(sd["visual.attnpool.k_proj.weight"]).T,
            "bk": _f32(sd["visual.attnpool.k_proj.bias"]),
            "wv": _f32(sd["visual.attnpool.v_proj.weight"]).T,
            "bv": _f32(sd["visual.attnpool.v_proj.bias"]),
            "wo": _f32(sd["visual.attnpool.c_proj.weight"]).T,
            "bo": _f32(sd["visual.attnpool.c_proj.bias"]),
        }

    params: Params = {
        "visual": visual,
        "text": {
            "token_embedding": _f32(sd["token_embedding.weight"]),
            "positional_embedding": _f32(sd["positional_embedding"]),
            "blocks": _stack_blocks(sd, "transformer", cfg.transformer_layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": _f32(sd["text_projection"]),
        },
        "logit_scale": _f32(sd["logit_scale"]),
    }
    return cfg, params


def cast_params(params: Params, dtype) -> Params:
    """Cast weight leaves to a compute dtype, keeping LayerNorm/BN affine and
    logit_scale in fp32 (they are consumed in fp32 anyway).  A pre-quantized
    ``blocks_q`` subtree (see :func:`quantize_for_serving`) passes through
    untouched — its int8 values / fp32 scales are dtype-exact by design."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if tree is None:
            return None
        if "blocks_q" in path:
            return jnp.asarray(tree)
        keep_f32 = any(p in ("ln_1", "ln_2", "ln_pre", "ln_post", "ln_final") for p in path)
        keep_f32 |= any(p.startswith("bn") or p == "bn" for p in path if isinstance(p, str))
        keep_f32 |= bool(path) and path[-1] == "logit_scale"
        arr = jnp.asarray(tree)
        return arr if keep_f32 else arr.astype(dtype)

    return walk(params)


def quantize_for_serving(params: Params) -> Params:
    """Pre-quantize the transformer stacks for the W8A8 serving mode.

    Returns ``params`` with a ``blocks_q`` subtree next to each tower's
    ``blocks`` (ViT vision tower and the text tower; ResNet towers have no
    stacked blocks and pass through).  The apply paths pick ``blocks_q`` up
    automatically when ``$PROTOCLIP_INT8`` is on, so quantization runs once
    at load time instead of inside every jitted forward.  ``load_clip``
    calls this when the serving mode is enabled; callers managing params
    manually can invoke it directly."""
    from protoclip_tpu.ops.pallas_kernels import quantize_stacked_blocks

    quant = jax.jit(quantize_stacked_blocks)
    out = dict(params)
    for tower in ("visual", "text"):
        sub = params.get(tower)
        if isinstance(sub, dict) and "blocks" in sub:
            sub = dict(sub)
            sub["blocks_q"] = quant(sub["blocks"])
            out[tower] = sub
    return out


# -- weight files -----------------------------------------------------------

_WEIGHT_ENV = "PROTOCLIP_WEIGHTS_DIR"
_WEIGHT_DIRS = (
    os.path.expanduser("~/.cache/clip"),
    "/root/weights/clip",
)
_WEIGHT_FILENAMES = {
    "RN50": "RN50.pt",
    "RN101": "RN101.pt",
    "RN50x4": "RN50x4.pt",
    "RN50x16": "RN50x16.pt",
    "ViT-B/32": "ViT-B-32.pt",
    "ViT-B/16": "ViT-B-16.pt",
    "ViT-L/14": "ViT-L-14.pt",
}


def find_weights(backbone: str) -> Optional[str]:
    fname = _WEIGHT_FILENAMES.get(backbone, backbone)
    dirs = []
    if os.environ.get(_WEIGHT_ENV):
        dirs.append(os.environ[_WEIGHT_ENV])
    dirs.extend(_WEIGHT_DIRS)
    for d in dirs:
        cand = os.path.join(d, fname)
        if os.path.exists(cand):
            return cand
    return None


def load_clip(
    backbone: str,
    weights_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    rng: Optional[jax.Array] = None,
) -> Tuple[CLIPConfig, Params]:
    """Load a CLIP backbone.

    Resolution order: explicit ``weights_path`` -> ``$PROTOCLIP_WEIGHTS_DIR``
    / ``~/.cache/clip`` lookup -> random init (useful for tests and benches;
    a warning is printed since classification then carries no semantics).
    """
    path = weights_path or find_weights(backbone)
    if path is None and os.environ.get("PROTOCLIP_AUTO_DOWNLOAD", "0").lower() in (
        "1", "true", "on",
    ):
        # opt-in: zero-egress deployments must not stall on network timeouts
        from protoclip_tpu.io.download import MODEL_URLS, download_weights

        if backbone in MODEL_URLS:
            from protoclip_tpu.io.download import ChecksumError

            try:
                path = download_weights(backbone)
            except ChecksumError:
                raise  # tampered/corrupt artifact: never serve random weights
            except Exception as exc:  # pragma: no cover - network-dependent
                import sys

                print(
                    f"[protoclip_tpu] weight download failed ({exc}); "
                    "falling back to local lookup/random init",
                    file=sys.stderr,
                )
    if path is not None:
        from protoclip_tpu.io.torch_pt import load_pt

        sd = load_pt(path)
        if not isinstance(sd, dict):
            raise ValueError(f"{path} did not contain a state dict")
        # JIT archives come back with a 'module.' (DataParallel) prefix
        # sometimes; strip it PER KEY — wrappers can register extra buffers
        # outside the wrapped module, and slicing those keys would corrupt
        # them (e.g. 'logit_scale' -> 'cale')
        if any(k.startswith("module.") for k in sd):
            sd = {
                (k[len("module.") :] if k.startswith("module.") else k): v
                for k, v in sd.items()
            }
        cfg, np_params = convert_clip_state_dict(sd)
        return cfg, _maybe_quantize(jax.jit(lambda p: cast_params(p, dtype))(np_params))

    import sys

    if os.environ.get("PROTOCLIP_STRICT_WEIGHTS", "0").lower() in ("1", "true", "on"):
        # production deployments opt into fail-loud: a typo'd weights dir or
        # a broken download must not boot a server that silently serves
        # random-weight predictions
        raise FileNotFoundError(
            f"no weights found for {backbone!r} and $PROTOCLIP_STRICT_WEIGHTS "
            f"forbids random initialization (set ${_WEIGHT_ENV} or pass "
            "weights_path)"
        )
    if backbone not in BACKBONE_CONFIGS:
        raise ValueError(
            f"unknown backbone {backbone!r} and no weights file to infer an "
            f"architecture from; known: {sorted(BACKBONE_CONFIGS)}"
        )
    cfg = BACKBONE_CONFIGS[backbone]
    print(
        f"[protoclip_tpu] WARNING: no weights found for {backbone!r} "
        f"(set ${_WEIGHT_ENV}); using random initialization.",
        file=sys.stderr,  # keep stdout clean (bench.py emits one JSON line)
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # One fused jit: eager init would dispatch hundreds of tiny RNG ops,
    # which is pathologically slow on remote-compile TPU backends.
    init = jax.jit(lambda r: cast_params(init_clip_params(r, cfg, jnp.float32), dtype))
    return cfg, _maybe_quantize(init(rng))


def _maybe_quantize(params: Params) -> Params:
    """Attach the serving-mode int8 weights at load time when enabled."""
    from protoclip_tpu.ops.pallas_kernels import int8_enabled, pallas_enabled

    if int8_enabled() and pallas_enabled():
        return quantize_for_serving(params)
    return params
