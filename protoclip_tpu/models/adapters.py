"""Proto-CLIP query adapters (ref ``model.py:12-95``).

Three variants, selected by config key ``adapter``:

- ``fc``      — bottleneck MLP d -> d/4 -> d with LayerNorms and a residual
  blend ``0.2 * f(x) + 0.8 * x`` (ref ``model.py:81-95``).
- ``conv-2x`` — pad the d-dim feature to the next square s^2 (s = ceil(sqrt d)),
  view as a 1-channel s x s image, 1x1 conv -> LN -> 1x1 conv -> LN, add the
  identity image, crop back to d (ref ``model.py:54-77``).
- ``conv-3x`` — same with an extra 3x3 conv -> LN in the middle.

The conv adapters' LayerNorms normalize over the full (C, H, W) volume with
elementwise affine, exactly like ``nn.LayerNorm([C, s, s])``.  Internally we
keep NCHW tensor semantics for these tiny ops (s <= 32) since parity with the
torch affine parameters matters more than conv layout here; XLA still fuses
the whole adapter into a handful of kernels.

State-dict mapping to/from torch (``pretrained_ckpt/*/query_adapter.pt``) is
provided so reference checkpoints load directly.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from protoclip_tpu.ops.layernorm import layer_norm

Params = Dict[str, jax.Array]

ADAPTER_WIDTH = 16  # conv adapter channel width (ref model.py:23)
FC_REDUCTION = 4  # fc bottleneck factor (ref model.py:82)
FC_RATIO = 0.2  # residual blend (ref model.py:93)


def adapter_square_size(c_in: int) -> int:
    return int(math.ceil(math.sqrt(c_in)))


# -- apply ------------------------------------------------------------------


def _apply_fc(params: Params, x: jax.Array) -> jax.Array:
    h = x @ params["w1"]
    h = layer_norm(h, params["ln1"]["scale"], params["ln1"]["bias"])
    h = h @ params["w2"]
    h = layer_norm(h, params["ln2"]["scale"], params["ln2"]["bias"])
    return FC_RATIO * h + (1.0 - FC_RATIO) * x


def _conv_nchw(x: jax.Array, kernel: jax.Array, padding: int = 0) -> jax.Array:
    """NCHW conv with OIHW kernel (tiny spatial dims; parity layout)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _apply_conv(params: Params, x: jax.Array, three_x: bool) -> jax.Array:
    b, d = x.shape
    s = adapter_square_size(d)
    pad = s * s - d
    img = jnp.pad(x, ((0, 0), (0, pad))).reshape(b, 1, s, s)

    out = _conv_nchw(img, params["conv1"])
    out = layer_norm(out, params["ln1"]["scale"], params["ln1"]["bias"])
    if three_x:
        out = _conv_nchw(out, params["conv2"], padding=1)
        out = layer_norm(out, params["ln2"]["scale"], params["ln2"]["bias"])
    out = _conv_nchw(out, params["conv3"])
    out = layer_norm(out, params["ln3"]["scale"], params["ln3"]["bias"])

    out = out + img
    return out.reshape(b, s * s)[:, :d]


def apply_adapter(params: Params, x: jax.Array, kind: str) -> jax.Array:
    """Apply the adapter of the given kind to features (B, d)."""
    if kind == "fc":
        return _apply_fc(params, x)
    if kind == "conv-2x":
        return _apply_conv(params, x, three_x=False)
    if kind == "conv-3x":
        return _apply_conv(params, x, three_x=True)
    raise ValueError(f"unknown adapter kind {kind!r}; use fc / conv-2x / conv-3x")


# -- init -------------------------------------------------------------------


def init_adapter(rng: jax.Array, c_in: int, kind: str, dtype=jnp.float32) -> Params:
    if kind == "fc":
        hidden = c_in // FC_REDUCTION
        k1, k2 = jax.random.split(rng)
        bound1 = 1.0 / math.sqrt(c_in)
        bound2 = 1.0 / math.sqrt(hidden)
        return {
            "w1": jax.random.uniform(k1, (c_in, hidden), jnp.float32, -bound1, bound1).astype(dtype),
            "ln1": {"scale": jnp.ones((hidden,), dtype), "bias": jnp.zeros((hidden,), dtype)},
            "w2": jax.random.uniform(k2, (hidden, c_in), jnp.float32, -bound2, bound2).astype(dtype),
            "ln2": {"scale": jnp.ones((c_in,), dtype), "bias": jnp.zeros((c_in,), dtype)},
        }

    if kind in ("conv-2x", "conv-3x"):
        s = adapter_square_size(c_in)
        w = ADAPTER_WIDTH
        k1, k2, k3 = jax.random.split(rng, 3)

        def kaiming(key, shape):
            fan_in = shape[1] * shape[2] * shape[3]
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)

        def ln(shape):
            return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

        return {
            "conv1": kaiming(k1, (w, 1, 1, 1)),
            "ln1": ln((w, s, s)),
            "conv2": kaiming(k2, (w, w, 3, 3)),
            "ln2": ln((w, s, s)),
            "conv3": kaiming(k3, (1, w, 1, 1)),
            "ln3": ln((1, s, s)),
        }
    raise ValueError(f"unknown adapter kind {kind!r}")


# -- torch interop ----------------------------------------------------------

_FC_TORCH_MAP = {
    "fc.0.weight": ("w1", "T"),
    "fc.1.weight": ("ln1", "scale"),
    "fc.1.bias": ("ln1", "bias"),
    "fc.2.weight": ("w2", "T"),
    "fc.3.weight": ("ln2", "scale"),
    "fc.3.bias": ("ln2", "bias"),
}
_CONV_TORCH_MAP = {
    "conv1.weight": ("conv1", None),
    "bn1.weight": ("ln1", "scale"),
    "bn1.bias": ("ln1", "bias"),
    "conv2.weight": ("conv2", None),
    "bn2.weight": ("ln2", "scale"),
    "bn2.bias": ("ln2", "bias"),
    "conv3.weight": ("conv3", None),
    "bn3.weight": ("ln3", "scale"),
    "bn3.bias": ("ln3", "bias"),
}


def adapter_from_torch_state(
    state: Dict[str, np.ndarray], kind: str, dtype=jnp.float32
) -> Params:
    """torch ``state_dict`` (e.g. ``query_adapter.pt``) -> adapter params."""
    out: Dict[str, Dict[str, jax.Array] | jax.Array] = {}

    def put(path, value):
        if len(path) == 2 and path[1] != "T":
            out.setdefault(path[0], {})[path[1]] = value
        else:
            out[path[0]] = value

    if kind == "fc":
        for tk, path in _FC_TORCH_MAP.items():
            arr = np.asarray(state[tk], dtype=np.float32)
            if path[-1] == "T":
                arr = arr.T
            put(path, jnp.asarray(arr, dtype))
    elif kind in ("conv-2x", "conv-3x"):
        for tk, path in _CONV_TORCH_MAP.items():
            if tk not in state:
                continue  # conv-2x checkpoints still carry unused conv2/bn2
            arr = jnp.asarray(np.asarray(state[tk], dtype=np.float32), dtype)
            put((path[0],) if path[1] is None else path, arr)
        # conv-2x references keep conv2/bn2 in the state dict even though the
        # forward pass skips them (model.py:66-68); preserve for round-trips.
    else:
        raise ValueError(f"unknown adapter kind {kind!r}")
    return out


def adapter_to_torch_state(params: Params, kind: str) -> Dict[str, np.ndarray]:
    """Adapter params -> reference-layout ``state_dict`` arrays."""
    state: Dict[str, np.ndarray] = {}
    if kind == "fc":
        for tk, path in _FC_TORCH_MAP.items():
            if path[-1] == "T":
                state[tk] = np.asarray(params[path[0]], np.float32).T
            else:
                state[tk] = np.asarray(params[path[0]][path[1]], np.float32)
    elif kind in ("conv-2x", "conv-3x"):
        for tk, path in _CONV_TORCH_MAP.items():
            node = params.get(path[0])
            if node is None:
                continue
            state[tk] = np.asarray(
                node if path[1] is None else node[path[1]], np.float32
            )
    else:
        raise ValueError(f"unknown adapter kind {kind!r}")
    return state
