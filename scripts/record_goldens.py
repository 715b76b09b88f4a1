"""Record golden encode checksums for real CLIP weights.

Run on a machine with real OpenAI CLIP weights (``$PROTOCLIP_WEIGHTS_DIR``)
to pin embedding checksums into ``tests/goldens.json``; the test suite then
guards against layout/precision regressions on the real-weight path
(``tests/test_golden.py``).  Usage::

    python scripts/record_goldens.py [backbone ...]
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


def main() -> None:
    backbones = sys.argv[1:] or ["RN50", "ViT-B/16", "ViT-B/32", "ViT-L/14"]
    goldens = {}
    if os.path.exists(GOLDENS):
        with open(GOLDENS) as fh:
            goldens = json.load(fh)
    for backbone in backbones:
        entry = checksum_for(backbone)
        if entry is None:
            print(f"[skip] no weights for {backbone}")
            continue
        goldens[backbone] = entry
        print(f"[recorded] {backbone}: {entry}")
    with open(GOLDENS, "w") as fh:
        json.dump(goldens, fh, indent=2, sort_keys=True)
    print(f"wrote {GOLDENS}")


if __name__ == "__main__":
    main()
