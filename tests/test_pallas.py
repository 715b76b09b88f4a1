"""Pallas kernel parity (interpret mode on CPU) against the XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from protoclip_tpu.ops.attention import attention_core
from protoclip_tpu.ops.pallas_kernels import fused_attention


@pytest.mark.parametrize("L", [8, 50, 77, 197])
def test_fused_attention_matches_xla(rng, L):
    B, H, dh = 2, 3, 64
    q = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    ours = np.asarray(
        fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    )
    ref = np.asarray(attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("L", [5, 77])
def test_fused_attention_causal(rng, L):
    B, H, dh = 1, 2, 64
    q = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    ours = np.asarray(
        fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, interpret=True)
    )
    mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)
    ref = np.asarray(attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_fused_attention_bf16(rng):
    B, H, L, dh = 2, 2, 77, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, dh)), jnp.bfloat16)
    ours = np.asarray(fused_attention(q, k, v, interpret=True).astype(jnp.float32))
    ref = np.asarray(attention_core(q, k, v).astype(jnp.float32))
    np.testing.assert_allclose(ours, ref, atol=0.05)
