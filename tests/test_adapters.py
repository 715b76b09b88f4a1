"""Adapter parity against torch-functional equivalents and the reference's
pretrained adapter checkpoints."""

import math

import numpy as np
import pytest

import jax.numpy as jnp
import jax

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from protoclip_tpu.io.torch_pt import load_pt  # noqa: E402
from protoclip_tpu.models.adapters import (  # noqa: E402
    adapter_from_torch_state,
    adapter_to_torch_state,
    apply_adapter,
    init_adapter,
)
from tests.conftest import requires_reference  # noqa: E402


def _torch_conv_adapter(state, x, three_x):
    """Functional transcription of the documented conv adapter
    (model.py:49-78): pad to square, 1x1 conv -> LN[C,s,s] (-> 3x3 conv -> LN)
    -> 1x1 conv -> LN, +identity, crop."""
    d = x.shape[-1]
    s = int(math.ceil(math.sqrt(d)))
    pad = s * s - d
    t = torch.from_numpy(x)
    t = F.pad(t, (0, pad)).view(-1, 1, s, s)
    identity = t

    def ln(v, w, b):
        return F.layer_norm(v, tuple(w.shape), w, b)

    out = F.conv2d(t, state_t(state, "conv1.weight"))
    out = ln(out, state_t(state, "bn1.weight"), state_t(state, "bn1.bias"))
    if three_x:
        out = F.conv2d(out, state_t(state, "conv2.weight"), padding=1)
        out = ln(out, state_t(state, "bn2.weight"), state_t(state, "bn2.bias"))
    out = F.conv2d(out, state_t(state, "conv3.weight"))
    out = ln(out, state_t(state, "bn3.weight"), state_t(state, "bn3.bias"))
    out = out + identity
    return out.view(-1, s * s)[:, :d].numpy()


def _torch_fc_adapter(state, x):
    """Functional transcription of Adapter_FC (model.py:81-95)."""
    t = torch.from_numpy(x)
    h = t @ state_t(state, "fc.0.weight").t()
    h = F.layer_norm(h, (h.shape[-1],), state_t(state, "fc.1.weight"), state_t(state, "fc.1.bias"))
    h = h @ state_t(state, "fc.2.weight").t()
    h = F.layer_norm(h, (h.shape[-1],), state_t(state, "fc.3.weight"), state_t(state, "fc.3.bias"))
    return (0.2 * h + 0.8 * t).numpy()


def state_t(state, key):
    return torch.from_numpy(np.asarray(state[key], dtype=np.float32))


@pytest.mark.parametrize("kind,d", [("fc", 64), ("fc", 768), ("conv-2x", 1024), ("conv-3x", 1024), ("conv-3x", 768)])
def test_adapter_parity_random(rng, kind, d):
    params = init_adapter(jax.random.PRNGKey(3), d, kind)
    x = rng.standard_normal((6, d)).astype(np.float32)
    ours = np.asarray(apply_adapter(params, jnp.asarray(x), kind))

    state = adapter_to_torch_state(params, kind)
    if kind == "fc":
        theirs = _torch_fc_adapter(state, x)
    else:
        theirs = _torch_conv_adapter(state, x, three_x=(kind == "conv-3x"))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("kind,d", [("fc", 512), ("conv-3x", 1024)])
def test_torch_state_roundtrip(kind, d):
    params = init_adapter(jax.random.PRNGKey(1), d, kind)
    state = adapter_to_torch_state(params, kind)
    params2 = adapter_from_torch_state(state, kind)
    for leaf1, leaf2 in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf2), atol=0)


@requires_reference
def test_pretrained_fc_adapter_parity(rng):
    state = load_pt("/root/reference/pretrained_ckpt/fewsol-198-F/query_adapter.pt")
    params = adapter_from_torch_state(state, "fc")
    x = rng.standard_normal((4, 768)).astype(np.float32)
    ours = np.asarray(apply_adapter(params, jnp.asarray(x), "fc"))
    theirs = _torch_fc_adapter(state, x)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@requires_reference
def test_pretrained_conv_adapter_parity(rng):
    # imagenet-F uses conv-2x (configs/imagenet.yml) on RN50 features (d=1024)
    state = load_pt("/root/reference/pretrained_ckpt/imagenet-F/query_adapter.pt")
    params = adapter_from_torch_state(state, "conv-2x")
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    ours = np.asarray(apply_adapter(params, jnp.asarray(x), "conv-2x"))
    theirs = _torch_conv_adapter(state, x, three_x=False)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@requires_reference
def test_fewsol198_deploy_route_golden(rng):
    """End-to-end pin of the FewSOL-198 deploy route on the REAL
    ``pretrained_ckpt/fewsol-198-F`` artifacts: torch-free io -> fc adapter
    -> ``P`` at the config operating point (alpha=0.2, beta=12,
    configs/fewsol_198.yml), cross-checked against torch on the same inputs
    (ref ``toolkit/.../utils/model_utils.py:12-67``).

    The snapshot ships no visual bank (text-only deploy, like the ROS
    classifier); to exercise the alpha-mix with two distinct heads, the
    visual bank is a fixed derivation of the real textual bank (rolled
    rows). Pinned checksums catch any regression in the io -> adapter ->
    classifier chain."""
    from protoclip_tpu.core.protoclip import from_arrays
    from protoclip_tpu.io.checkpoint import load_checkpoint_triple

    ckpt = "/root/reference/pretrained_ckpt/fewsol-198-F"
    _, bank_t, ad_state = load_checkpoint_triple(
        None, f"{ckpt}/memory_bank_t.pt", f"{ckpt}/query_adapter.pt"
    )
    assert bank_t.shape == (198, 768)
    bank_v = np.roll(bank_t, 1, axis=0)  # deterministic distinct visual head

    q = np.random.default_rng(198).standard_normal((8, 768)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    model = from_arrays(bank_v, bank_t, adapter_from_torch_state(ad_state, "fc"), "fc", 1)
    p = np.asarray(jax.jit(lambda m, x: m.probs(x, 0.2, 12.0))(model, jnp.asarray(q)))

    # torch cross-check, loading the SAME artifacts with torch itself (so
    # the torch-free reader is validated against torch.load end to end)
    tb = torch.load(f"{ckpt}/memory_bank_t.pt", map_location="cpu").detach().float()
    tstate = {
        k: np.asarray(v.detach().float()) for k, v in
        torch.load(f"{ckpt}/query_adapter.pt", map_location="cpu").items()
    }
    qa = torch.from_numpy(_torch_fc_adapter(tstate, q))
    qa = qa / qa.norm(dim=-1, keepdim=True)
    tp = tb / tb.norm(dim=-1, keepdim=True)
    ip = torch.roll(tp, 1, dims=0)
    ip = ip / ip.norm(dim=-1, keepdim=True)
    d_i = torch.cdist(qa, ip) ** 2
    d_t = torch.cdist(qa, tp) ** 2
    p_torch = (
        0.2 * torch.softmax(-12.0 * d_i, dim=-1)
        + 0.8 * torch.softmax(-12.0 * d_t, dim=-1)
    ).numpy()
    np.testing.assert_allclose(p, p_torch, atol=2e-4)

    # hard pins (recorded 2026-08-17 from this route on CPU fp32):
    # regressions anywhere in the io -> adapter -> P chain must move these
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)
    assert p.argmax(-1).tolist() == [184, 50, 88, 156, 119, 141, 134, 179]
    np.testing.assert_allclose(
        p.max(-1),
        [0.095497, 0.047527, 0.036486, 0.061138, 0.067967, 0.058325, 0.042292, 0.085419],
        atol=5e-5,
    )
    np.testing.assert_allclose(float((p * np.arange(198)).sum()), 809.27216, atol=5e-3)


@requires_reference
def test_imagenet_deploy_route_golden():
    """End-to-end pin of the ImageNet deploy route on the REAL
    ``pretrained_ckpt/imagenet-F`` artifacts: torch-free io -> conv-2x
    adapter (RN50 features, d=1024) -> ``P`` at the config operating point
    (alpha=0.5, beta=12, configs/imagenet.yml), cross-checked against torch
    on the same inputs (ref ``toolkit/.../utils/model_utils.py:12-67``).

    Companion to ``test_fewsol198_deploy_route_golden`` — together the two
    pins cover both shipped snapshot families and both adapter kinds the
    reference deploys (fc and conv-2x)."""
    from protoclip_tpu.core.protoclip import from_arrays
    from protoclip_tpu.io.checkpoint import load_checkpoint_triple

    ckpt = "/root/reference/pretrained_ckpt/imagenet-F"
    _, bank_t, ad_state = load_checkpoint_triple(
        None, f"{ckpt}/memory_bank_t.pt", f"{ckpt}/query_adapter.pt"
    )
    assert bank_t.shape == (1000, 1024)
    bank_v = np.roll(bank_t, 1, axis=0)  # deterministic distinct visual head

    q = np.random.default_rng(1000).standard_normal((8, 1024)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    model = from_arrays(
        bank_v, bank_t, adapter_from_torch_state(ad_state, "conv-2x"), "conv-2x", 1
    )
    p = np.asarray(jax.jit(lambda m, x: m.probs(x, 0.5, 12.0))(model, jnp.asarray(q)))

    # torch cross-check, loading the SAME artifacts with torch itself
    tb = torch.load(f"{ckpt}/memory_bank_t.pt", map_location="cpu").detach().float()
    tstate = {
        k: np.asarray(v.detach().float()) for k, v in
        torch.load(f"{ckpt}/query_adapter.pt", map_location="cpu").items()
    }
    qa = torch.from_numpy(_torch_conv_adapter(tstate, q, three_x=False))
    qa = qa / qa.norm(dim=-1, keepdim=True)
    tp = tb / tb.norm(dim=-1, keepdim=True)
    ip = torch.roll(tp, 1, dims=0)
    ip = ip / ip.norm(dim=-1, keepdim=True)
    d_i = torch.cdist(qa, ip) ** 2
    d_t = torch.cdist(qa, tp) ** 2
    p_torch = (
        0.5 * torch.softmax(-12.0 * d_i, dim=-1)
        + 0.5 * torch.softmax(-12.0 * d_t, dim=-1)
    ).numpy()
    np.testing.assert_allclose(p, p_torch, atol=2e-4)

    # hard pins (recorded 2026-08-17 from this route on CPU fp32)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)
    assert p.argmax(-1).tolist() == [42, 326, 382, 68, 285, 937, 24, 931]
    np.testing.assert_allclose(
        p.max(-1),
        [0.004475, 0.002921, 0.003243, 0.003476, 0.003131, 0.004394, 0.002894, 0.003629],
        atol=5e-5,
    )
    np.testing.assert_allclose(float((p * np.arange(1000)).sum()), 4077.567, atol=5e-2)
