"""Golden-checksum guard for the real-weight path.

Runs only when real CLIP weights are present (``$PROTOCLIP_WEIGHTS_DIR`` /
``~/.cache/clip``) AND a golden has been recorded with
``scripts/record_goldens.py``.  Pins the normalized-embedding row sums of a
fixed random batch so layout/head-count/precision regressions on real
weights can't slip through (zero-egress CI environments skip this; the HF
parity suite covers the computation graph there).
"""

import json
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens.json")


def _load_goldens():
    if not os.path.exists(GOLDENS):
        return {}
    with open(GOLDENS) as fh:
        return json.load(fh)


@pytest.mark.parametrize("backbone", ["RN50", "ViT-B/16", "ViT-B/32", "ViT-L/14"])
def test_golden_encode_checksum(backbone):
    from protoclip_tpu.models.clip import find_weights

    if find_weights(backbone) is None:
        pytest.skip(f"no real weights for {backbone} in this environment")
    goldens = _load_goldens()
    if backbone not in goldens:
        pytest.skip(
            f"no golden recorded for {backbone}; run scripts/record_goldens.py"
        )

    import jax
    import jax.numpy as jnp

    from protoclip_tpu.data.transforms import normalize_batch
    from protoclip_tpu.models.clip import encode_image, load_clip

    cfg, params = load_clip(backbone, dtype=jnp.float32)
    res = cfg.image_resolution
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, res, res, 3)).astype(np.uint8))

    # fixed random projection: sensitive to feature-dimension permutations
    # (a head-order/projection-column layout bug reorders the embedding but
    # leaves the plain component sum unchanged)
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
    per_image = np.asarray(sums_j, np.float64)
    want = np.asarray(goldens[backbone]["per_image_sums"], np.float64)
    np.testing.assert_allclose(per_image, want, atol=5e-3)
    if "per_image_proj" in goldens[backbone]:
        np.testing.assert_allclose(
            np.asarray(dots_j, np.float64),
            np.asarray(goldens[backbone]["per_image_proj"], np.float64),
            atol=5e-3,
        )
