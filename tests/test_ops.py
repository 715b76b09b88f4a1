"""Op-level parity: LayerNorm / attention / P classifier / losses against
torch and hand-derived formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from protoclip_tpu.ops import (  # noqa: E402
    class_prototypes,
    info_nce,
    layer_norm,
    l2_normalize,
    multi_head_attention,
    nll_of_probs,
    proto_probs,
    protoclip_loss,
    quick_gelu,
    squared_euclidean,
)
from protoclip_tpu.ops.proto import proto_logits  # noqa: E402


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 9, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    theirs = F.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(scale), torch.from_numpy(bias)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_layer_norm_multiaxis(rng):
    # conv-adapter style LN over (C, H, W) with elementwise affine
    x = rng.standard_normal((2, 3, 5, 5)).astype(np.float32)
    scale = rng.standard_normal((3, 5, 5)).astype(np.float32)
    bias = rng.standard_normal((3, 5, 5)).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    theirs = F.layer_norm(
        torch.from_numpy(x), (3, 5, 5), torch.from_numpy(scale), torch.from_numpy(bias)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_layer_norm_bf16_uses_fp32_stats(rng):
    x = (rng.standard_normal((8, 64)) * 100).astype(np.float32)
    s = np.ones(64, np.float32)
    b = np.zeros(64, np.float32)
    out_bf16 = layer_norm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(s), jnp.asarray(b))
    out_f32 = layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b))
    assert out_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32), atol=0.05
    )


def test_quick_gelu():
    x = jnp.linspace(-3, 3, 31)
    expected = np.asarray(x) * (1.0 / (1.0 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(np.asarray(quick_gelu(x)), expected, atol=1e-6)


def test_mha_matches_torch(rng):
    B, L, D, H = 2, 7, 32, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    mha = torch.nn.MultiheadAttention(D, H, batch_first=False)
    mha.eval()
    sd = mha.state_dict()
    in_w = sd["in_proj_weight"].numpy()
    in_b = sd["in_proj_bias"].numpy()
    params = {
        "wq": jnp.asarray(in_w[:D].T),
        "wk": jnp.asarray(in_w[D : 2 * D].T),
        "wv": jnp.asarray(in_w[2 * D :].T),
        "wo": jnp.asarray(sd["out_proj.weight"].numpy().T),
        "bq": jnp.asarray(in_b[:D]),
        "bk": jnp.asarray(in_b[D : 2 * D]),
        "bv": jnp.asarray(in_b[2 * D :]),
        "bo": jnp.asarray(sd["out_proj.bias"].numpy()),
    }
    ours = multi_head_attention(jnp.asarray(x), params, H)

    xt = torch.from_numpy(x).permute(1, 0, 2)  # LND
    theirs, _ = mha(xt, xt, xt, need_weights=False)
    theirs = theirs.permute(1, 0, 2).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_mha_causal_mask_matches_torch(rng):
    B, L, D, H = 1, 5, 16, 2
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    mha = torch.nn.MultiheadAttention(D, H)
    mha.eval()
    sd = mha.state_dict()
    in_w, in_b = sd["in_proj_weight"].numpy(), sd["in_proj_bias"].numpy()
    params = {
        "wq": jnp.asarray(in_w[:D].T),
        "wk": jnp.asarray(in_w[D : 2 * D].T),
        "wv": jnp.asarray(in_w[2 * D :].T),
        "wo": jnp.asarray(sd["out_proj.weight"].numpy().T),
        "bq": jnp.asarray(in_b[:D]),
        "bk": jnp.asarray(in_b[D : 2 * D]),
        "bv": jnp.asarray(in_b[2 * D :]),
        "bo": jnp.asarray(sd["out_proj.bias"].numpy()),
    }
    from protoclip_tpu.models.layers import causal_mask

    ours = multi_head_attention(jnp.asarray(x), params, H, causal_mask(L))

    mask = torch.full((L, L), float("-inf")).triu(1)
    xt = torch.from_numpy(x).permute(1, 0, 2)
    theirs, _ = mha(xt, xt, xt, need_weights=False, attn_mask=mask)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(1, 0, 2).detach().numpy(), atol=1e-5
    )


# -- P classifier ----------------------------------------------------------


def _reference_P(q, img_p, text_p, alpha, beta):
    """Direct transcription of the published formula (utils.py:225-244)."""
    d_img = torch.cdist(torch.from_numpy(q), torch.from_numpy(img_p), p=2).pow(2)
    d_text = torch.cdist(torch.from_numpy(q), torch.from_numpy(text_p), p=2).pow(2)
    p_i = F.softmax(beta * (-d_img), dim=1)
    p_t = F.softmax(beta * (-d_text), dim=1)
    return (alpha * p_i + (1 - alpha) * p_t).numpy()


@pytest.mark.parametrize("alpha,beta", [(0.5, 1.0), (0.8, 9.0), (0.2, 12.0), (1.0, 0.7), (0.0, 5.0)])
def test_proto_probs_matches_reference_formula(rng, alpha, beta):
    Q, N, d = 37, 11, 24
    q = rng.standard_normal((Q, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    img_p = rng.standard_normal((N, d)).astype(np.float32)
    img_p /= np.linalg.norm(img_p, axis=-1, keepdims=True)
    text_p = rng.standard_normal((N, d)).astype(np.float32)
    text_p /= np.linalg.norm(text_p, axis=-1, keepdims=True)

    ours = np.asarray(proto_probs(jnp.asarray(q), jnp.asarray(img_p), jnp.asarray(text_p), alpha, beta))
    theirs = _reference_P(q, img_p, text_p, alpha, beta)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_proto_probs_unnormalized_queries(rng):
    # The reference applies P to unnormalized adapter outputs in its test-time
    # sweep (main.py:415-421); the row-constant cancellation must still hold.
    q = 3.7 * rng.standard_normal((10, 8)).astype(np.float32)
    protos = rng.standard_normal((4, 8)).astype(np.float32)
    ours = np.asarray(proto_probs(jnp.asarray(q), jnp.asarray(protos), jnp.asarray(protos), 0.6, 7.0))
    theirs = _reference_P(q, protos, protos, 0.6, 7.0)
    # fp32 matmul-expansion vs torch's direct-difference cdist: with
    # unnormalized (large-norm) queries the two accumulate differently, so
    # the tolerance is looser than the normalized-query test above.
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_squared_euclidean(rng):
    q = rng.standard_normal((6, 5)).astype(np.float32)
    p = rng.standard_normal((3, 5)).astype(np.float32)
    ours = np.asarray(squared_euclidean(jnp.asarray(q), jnp.asarray(p)))
    theirs = torch.cdist(torch.from_numpy(q), torch.from_numpy(p), p=2).pow(2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_class_prototypes(rng):
    N, K, d = 5, 4, 16
    bank = rng.standard_normal((N * K, d)).astype(np.float32)
    ours = np.asarray(class_prototypes(jnp.asarray(bank), N, K))
    b = torch.from_numpy(bank).view(N, K, d)
    b = b / b.norm(dim=-1, keepdim=True)
    proto = b.mean(dim=1)
    proto = proto / proto.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(ours, proto.numpy(), atol=1e-5)
    norms = np.linalg.norm(ours, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


# -- losses ----------------------------------------------------------------


def test_nll_matches_torch(rng):
    p = rng.uniform(0.05, 1.0, size=(12, 7)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    labels = rng.integers(0, 7, size=12)
    ours = float(nll_of_probs(jnp.asarray(p), jnp.asarray(labels)))
    theirs = float(
        torch.nn.NLLLoss()(torch.log(torch.from_numpy(p)), torch.from_numpy(labels))
    )
    assert abs(ours - theirs) < 1e-5


def test_nll_masked(rng):
    p = rng.uniform(0.05, 1.0, size=(8, 4)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    labels = rng.integers(0, 4, size=8)
    w = np.array([1, 1, 1, 0, 0, 0, 0, 0], np.float32)
    ours = float(nll_of_probs(jnp.asarray(p), jnp.asarray(labels), jnp.asarray(w)))
    expected = float(
        nll_of_probs(jnp.asarray(p[:3]), jnp.asarray(labels[:3]))
    )
    assert abs(ours - expected) < 1e-6


def test_info_nce_matches_manual(rng):
    A = rng.standard_normal((9, 16)).astype(np.float32)
    B = rng.standard_normal((9, 16)).astype(np.float32)
    ours = float(info_nce(jnp.asarray(A), jnp.asarray(B)))
    # manual: normalized logits / 0.1, CE against diagonal
    An = A / np.linalg.norm(A, axis=-1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=-1, keepdims=True)
    logits = torch.from_numpy(An @ Bn.T / 0.1)
    theirs = float(F.cross_entropy(logits, torch.arange(9)))
    assert abs(ours - theirs) < 1e-5


def test_protoclip_loss_terms(rng):
    Q, N, d = 20, 6, 12
    p = rng.uniform(0.01, 1.0, size=(Q, N)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    labels = rng.integers(0, N, size=Q)
    img_p = rng.standard_normal((N, d)).astype(np.float32)
    text_p = rng.standard_normal((N, d)).astype(np.float32)
    terms = protoclip_loss(
        jnp.asarray(p), jnp.asarray(labels), jnp.asarray(img_p), jnp.asarray(text_p),
        losses=("L1", "L2", "L3", "L4"),
    )
    total = terms["L1"] + terms["L2"] + terms["L3"] + terms["L4"] + terms["L5"]
    np.testing.assert_allclose(float(terms["total"]), float(total), rtol=1e-6)
    # each term against its independent formula (not the module's own sum):
    # L1 = NLL of the true class, L2/L3 the two InfoNCE directions, L4/L5
    # the intra-modality alignments (utils.py:80-109)
    np.testing.assert_allclose(
        float(terms["L1"]),
        float(-np.mean(np.log(p[np.arange(Q), labels] + 1e-12))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(terms["L2"]), float(info_nce(jnp.asarray(img_p), jnp.asarray(text_p))), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(terms["L3"]), float(info_nce(jnp.asarray(text_p), jnp.asarray(img_p))), rtol=1e-6
    )
    assert float(terms["L2"]) != float(terms["L3"])  # directions differ
    np.testing.assert_allclose(
        float(terms["L4"]), float(info_nce(jnp.asarray(img_p), jnp.asarray(img_p))), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(terms["L5"]), float(info_nce(jnp.asarray(text_p), jnp.asarray(text_p))), rtol=1e-6
    )
    # a disabled term is absent and excluded from the total
    sub = protoclip_loss(
        jnp.asarray(p), jnp.asarray(labels), jnp.asarray(img_p), jnp.asarray(text_p),
        losses=("L1",),
    )
    assert "L2" not in sub and "L4" not in sub
    np.testing.assert_allclose(float(sub["total"]), float(sub["L1"]), rtol=1e-6)


def test_l2_normalize(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)


def test_mha_explicit_mask_plus_causal(rng):
    """Regression: causal=True must still apply when an explicit additive
    mask is passed (it used to be silently dropped on that branch)."""
    from protoclip_tpu.models.layers import causal_mask
    from protoclip_tpu.ops.attention import multi_head_attention

    B, L, D, H = 2, 9, 64, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)  # noqa: E731
    params = {
        "wq": r(D, D), "wk": r(D, D), "wv": r(D, D), "wo": r(D, D),
        "bq": r(D), "bk": r(D), "bv": r(D), "bo": r(D),
    }
    # key-padding mask: last 3 keys masked out
    pad = np.zeros((L, L), np.float32)
    pad[:, -3:] = -np.inf
    combined = jnp.asarray(pad) + causal_mask(L)
    want = multi_head_attention(jnp.asarray(x), params, H, combined)
    got = multi_head_attention(jnp.asarray(x), params, H, jnp.asarray(pad), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_text_only_and_adapterless_operation(rng):
    """Partial pretrained_ckpt snapshots: no visual bank and/or no adapter.
    Regression: the zero placeholder bank used to produce NaN prototypes
    (0-norm division), poisoning predictions even at alpha=0."""
    from protoclip_tpu.core.protoclip import accuracy, from_arrays, predict

    N, K, d = 5, 2, 16
    bank_t = rng.standard_normal((N, d)).astype(np.float32)
    bank_t /= np.linalg.norm(bank_t, axis=-1, keepdims=True)
    model = from_arrays(None, bank_t, None, "fc", K)

    q = rng.standard_normal((8, d)).astype(np.float32)
    labels, conf = predict(model, q, alpha=0.0, beta=5.0)
    assert np.isfinite(np.asarray(conf)).all()
    # alpha=0 must be exact text-only: argmax over the text head alone
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    d2 = ((qn[:, None, :] - bank_t[None]) ** 2).sum(-1)
    expect = np.exp(-5.0 * d2)
    expect /= expect.sum(-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(labels), expect.argmax(-1))
    # and a mixed alpha stays finite (uniform visual head)
    acc = accuracy(model, q, np.zeros(8, np.int64), alpha=0.5, beta=5.0)
    assert 0.0 <= acc <= 1.0


def test_nll_nan_safe_with_padded_rows():
    """Regression: a zero-weight (padded) row whose picked probability
    underflowed to 0 must not poison the loss (inf * 0 = NaN)."""
    p = jnp.asarray([[1.0, 0.0], [0.5, 0.5]], jnp.float32)
    labels = jnp.asarray([1, 0])  # row 0 picks probability exactly 0
    w = jnp.asarray([0.0, 1.0], jnp.float32)  # ...but row 0 is padding
    out = float(nll_of_probs(p, labels, w))
    assert np.isfinite(out)
    np.testing.assert_allclose(out, -np.log(0.5), rtol=1e-6)

    # The BACKWARD pass must be finite too: masking only the output keeps
    # log(0)=inf inside the graph and its cotangent is 0*inf=NaN, which
    # would poison every parameter in one optimizer step (double-where
    # pattern required; verified broken before the fix).
    val, grad = jax.value_and_grad(lambda probs: nll_of_probs(probs, labels, w))(p)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all(), grad


def test_info_nce_zero_rows_finite():
    """Regression: zero prototype rows (text-only placeholder bank) must
    not produce NaN through the 0-norm division in info_nce."""
    img_p = jnp.zeros((4, 8), jnp.float32)
    txt_p = jnp.asarray(np.eye(4, 8), jnp.float32)
    assert np.isfinite(float(info_nce(img_p, txt_p)))
    assert np.isfinite(float(info_nce(txt_p, img_p)))


def test_packed_attention_rejects_nondivisor_heads(rng):
    """Regression: n_head that doesn't divide D used to silently return
    uninitialized VMEM in the trailing columns; it must raise."""
    from protoclip_tpu.ops.pallas_kernels import fused_attention_packed

    q = jnp.asarray(rng.standard_normal((1, 8, 96)).astype(np.float32))
    with pytest.raises(ValueError, match="must divide"):
        fused_attention_packed(q, q, q, n_head=5, interpret=True)


def test_vendored_info_nce_golden_vectors(rng):
    """Pin the VENDORED info-nce-pytorch v0.1.4 source
    (``tests/vendor/info_nce_pytorch.py`` — the third-party package the
    reference's L2-L5 losses call, ref ``utils.py:19,72-77``) with
    hard-coded golden values across all its modes, and diff our
    ``ops.losses.info_nce`` against it on the reference's operating point
    (in-batch negatives, temperature 0.1, mean CE).  Any edit to the
    vendored file breaks the goldens."""
    torch = pytest.importorskip("torch")
    from tests.vendor.info_nce_pytorch import InfoNCE, info_nce as vendored

    from protoclip_tpu.ops.losses import info_nce as ours

    r = np.random.default_rng(42)
    q = torch.from_numpy(r.standard_normal((4, 6)).astype(np.float32))
    k = torch.from_numpy(r.standard_normal((4, 6)).astype(np.float32))
    neg_u = torch.from_numpy(r.standard_normal((7, 6)).astype(np.float32))
    neg_p = torch.from_numpy(r.standard_normal((4, 3, 6)).astype(np.float32))

    # golden values generated from this vendored source (see file header)
    assert float(InfoNCE()(q, k)) == pytest.approx(3.5578298568725586, rel=1e-6)
    assert float(vendored(q, k, neg_u)) == pytest.approx(5.697558403015137, rel=1e-6)
    assert float(
        vendored(q, k, neg_p, negative_mode="paired")
    ) == pytest.approx(5.719359397888184, rel=1e-6)
    assert float(InfoNCE(temperature=0.3)(q, k)) == pytest.approx(
        1.7456941604614258, rel=1e-6
    )
    assert float(vendored(q, k, reduction="sum")) == pytest.approx(
        14.231319427490234, rel=1e-6
    )

    # our jax implementation vs the package on the reference's call shape
    # (InfoNCE() defaults, no explicit negatives): several sizes
    for n, d, seed in ((4, 6, 0), (9, 20, 1), (32, 48, 2)):
        rr = np.random.default_rng(seed)
        a = rr.standard_normal((n, d)).astype(np.float32)
        b = rr.standard_normal((n, d)).astype(np.float32)
        ref_val = float(InfoNCE()(torch.from_numpy(a), torch.from_numpy(b)))
        np.testing.assert_allclose(float(ours(a, b)), ref_val, rtol=1e-5)
