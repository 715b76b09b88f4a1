"""Record golden encode checksums (real weights + synthetic tiny models).

Real weights: run on a machine with real OpenAI CLIP weights
(``$PROTOCLIP_WEIGHTS_DIR``) to pin embedding checksums into
``tests/goldens.json``; the test suite then guards against layout/precision
regressions on the real-weight path (``tests/test_golden.py``).  Usage::

    python scripts/record_goldens.py [backbone ...]

Synthetic: deterministic tiny state dicts (``init_clip_params`` with a fixed
PRNG key) pin encode checksums that run in EVERY environment, so a
layout/precision regression fails CI today rather than only on
weight-bearing machines.  Recorded on CPU (the CI backend)::

    python scripts/record_goldens.py --synthetic
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDENS = os.path.join(REPO, "tests", "goldens.json")


def checksum_for(backbone: str):
    import jax
    import jax.numpy as jnp

    from protoclip_tpu.data.transforms import normalize_batch
    from protoclip_tpu.models.clip import encode_image, find_weights, load_clip

    if find_weights(backbone) is None:
        return None
    cfg, params = load_clip(backbone, dtype=jnp.float32)
    res = cfg.image_resolution
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, res, res, 3)).astype(np.uint8))

    # same fixed projection as tests/test_golden.py: permutation-sensitive
    proj = jnp.asarray(
        np.random.default_rng(1234).standard_normal(cfg.embed_dim).astype(np.float32)
    )

    @jax.jit
    def run(params, images):
        feats = encode_image(params, normalize_batch(images, jnp.float32), cfg)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        feats = feats.astype(jnp.float32)
        return jnp.sum(feats, axis=-1), feats @ proj

    sums_j, dots_j = run(params, images)
    return {
        "per_image_sums": [round(float(v), 4) for v in np.asarray(sums_j)],
        "per_image_proj": [round(float(v), 4) for v in np.asarray(dots_j)],
    }


def synthetic_specs():
    """Deterministic tiny model geometries for environment-independent
    goldens: one ViT tower, one multi-block ResNet tower with a width that
    is not a multiple of 64 heads-inference-wise (exercises the
    ``clip/model.py:397-434`` geometry rules at tiny scale)."""
    from protoclip_tpu.models.clip import CLIPConfig

    return {
        "synthetic:tiny-vit": CLIPConfig(
            "tiny-vit", embed_dim=32, image_resolution=32, vision_layers=2,
            vision_width=64, vision_patch_size=16, context_length=16,
            vocab_size=128, transformer_width=64, transformer_layers=2,
        ),
        "synthetic:tiny-rn": CLIPConfig(
            "tiny-rn", embed_dim=32, image_resolution=64,
            vision_layers=(2, 1, 1, 2), vision_width=8,
            vision_patch_size=None, context_length=16, vocab_size=128,
            transformer_width=64, transformer_layers=2,
        ),
    }


def synthetic_checksum(name: str):
    """Pinned encode checksums for a synthetic spec: per-image/-text
    normalized-embedding sums plus a fixed random projection (sensitive to
    feature-dimension permutations a plain sum would miss)."""
    import jax
    import jax.numpy as jnp

    from protoclip_tpu.models.clip import encode_image, encode_text, init_clip_params

    cfg = synthetic_specs()[name]
    params = init_clip_params(jax.random.PRNGKey(20240817), cfg)
    res = cfg.image_resolution
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (4, res, res, 3)).astype(np.float32) / 255.0
    )
    tokens = np.zeros((4, cfg.context_length), np.int32)
    for row in range(4):
        length = 3 + row * 3
        tokens[row, : length - 1] = rng.integers(1, cfg.vocab_size - 1, length - 1)
        tokens[row, length - 1] = cfg.vocab_size - 1  # EOT = max id
    proj = jnp.asarray(
        np.random.default_rng(1234).standard_normal(cfg.embed_dim).astype(np.float32)
    )

    @jax.jit
    def run(params, images, tokens):
        img = encode_image(params, images, cfg)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = encode_text(params, tokens, cfg)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return (
            jnp.sum(img, axis=-1), img @ proj,
            jnp.sum(txt, axis=-1), txt @ proj,
        )

    img_sums, img_proj, txt_sums, txt_proj = run(params, images, jnp.asarray(tokens))
    return {
        "per_image_sums": [round(float(v), 5) for v in np.asarray(img_sums)],
        "per_image_proj": [round(float(v), 5) for v in np.asarray(img_proj)],
        "per_text_sums": [round(float(v), 5) for v in np.asarray(txt_sums)],
        "per_text_proj": [round(float(v), 5) for v in np.asarray(txt_proj)],
    }


def main() -> None:
    args = sys.argv[1:]
    goldens = {}
    if os.path.exists(GOLDENS):
        with open(GOLDENS) as fh:
            goldens = json.load(fh)

    synthetic_only = "--synthetic" in args
    if synthetic_only:
        args.remove("--synthetic")
        # synthetic goldens are pinned on the CI backend (CPU); the config
        # API is required — the TPU plugin overrides $JAX_PLATFORMS
        import jax

        jax.config.update("jax_platforms", "cpu")
        for name in synthetic_specs():
            entry = synthetic_checksum(name)
            goldens[name] = entry
            print(f"[recorded] {name}: {entry}")

    backbones = args or (
        [] if synthetic_only else ["RN50", "ViT-B/16", "ViT-B/32", "ViT-L/14"]
    )
    for backbone in backbones:
        entry = checksum_for(backbone)
        if entry is None:
            print(f"[skip] no weights for {backbone}")
            continue
        goldens[backbone] = entry
        print(f"[recorded] {backbone}: {entry}")
    with open(GOLDENS, "w") as fh:
        json.dump(goldens, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"wrote {GOLDENS}")


if __name__ == "__main__":
    main()
