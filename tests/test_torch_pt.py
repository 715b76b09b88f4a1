"""Pure-python .pt reader: round-trips against torch and the reference's
pretrained checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from protoclip_tpu.io.torch_pt import load_pt  # noqa: E402
from protoclip_tpu.io.checkpoint import load_checkpoint_triple  # noqa: E402
from tests.conftest import requires_reference  # noqa: E402


def _roundtrip(tmp_path, obj, name="x.pt"):
    path = tmp_path / name
    torch.save(obj, str(path))
    return load_pt(str(path))


def test_simple_tensor(tmp_path):
    t = torch.arange(24, dtype=torch.float32).reshape(2, 3, 4)
    out = _roundtrip(tmp_path, t)
    np.testing.assert_array_equal(out, t.numpy())


@pytest.mark.parametrize(
    "dtype", [torch.float16, torch.float32, torch.float64, torch.int64, torch.uint8, torch.bool]
)
def test_dtypes(tmp_path, dtype):
    t = (torch.rand(5, 7) * 4).to(dtype)
    out = _roundtrip(tmp_path, t, f"d_{str(dtype)}.pt")
    np.testing.assert_array_equal(out, t.numpy())


def test_bfloat16(tmp_path):
    t = torch.rand(4, 4, dtype=torch.float32).to(torch.bfloat16)
    out = _roundtrip(tmp_path, t, "bf16.pt")
    np.testing.assert_array_equal(
        np.asarray(out, dtype=np.float32), t.float().numpy()
    )


def test_noncontiguous_and_views(tmp_path):
    base = torch.arange(36, dtype=torch.float32).reshape(6, 6)
    sliced = base.t()  # stride-swapped view
    out = _roundtrip(tmp_path, sliced, "t.pt")
    np.testing.assert_array_equal(out, sliced.numpy())


def test_scalar_tensor(tmp_path):
    t = torch.tensor(3.5)
    out = _roundtrip(tmp_path, t, "s.pt")
    assert float(out) == 3.5


def test_state_dict(tmp_path):
    sd = {
        "layer.weight": torch.rand(8, 8, dtype=torch.float16),
        "layer.bias": torch.rand(8),
        "nested": {"a": torch.ones(3, dtype=torch.int32)},
        "meta": 7,
    }
    out = _roundtrip(tmp_path, sd, "sd.pt")
    np.testing.assert_array_equal(out["layer.weight"], sd["layer.weight"].numpy())
    np.testing.assert_array_equal(out["nested"]["a"], sd["nested"]["a"].numpy())
    assert out["meta"] == 7


def test_parameter(tmp_path):
    p = torch.nn.Parameter(torch.rand(4, 5))
    out = _roundtrip(tmp_path, p, "param.pt")
    np.testing.assert_array_equal(out, p.detach().numpy())


def test_legacy_format(tmp_path):
    t = torch.rand(3, 4)
    path = tmp_path / "legacy.pt"
    torch.save(t, str(path), _use_new_zipfile_serialization=False)
    out = load_pt(str(path))
    np.testing.assert_array_equal(out, t.numpy())


def test_shared_storage(tmp_path):
    base = torch.arange(10, dtype=torch.float32)
    obj = {"a": base, "b": base[2:8]}
    out = _roundtrip(tmp_path, obj, "shared.pt")
    np.testing.assert_array_equal(out["a"], base.numpy())
    np.testing.assert_array_equal(out["b"], base[2:8].numpy())


@requires_reference
@pytest.mark.parametrize(
    "rel",
    [
        "pretrained_ckpt/fewsol-198-F/memory_bank_t.pt",
        "pretrained_ckpt/fewsol-198-F/query_adapter.pt",
        "pretrained_ckpt/imagenet-F/memory_bank_t.pt",
        "pretrained_ckpt/imagenet-F/query_adapter.pt",
    ],
)
def test_reference_checkpoints(rel):
    path = f"/root/reference/{rel}"
    ours = load_pt(path)
    theirs = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(theirs, dict):
        assert set(ours) == set(theirs)
        for k, v in theirs.items():
            np.testing.assert_array_equal(
                np.asarray(ours[k], np.float32), v.detach().float().numpy()
            )
    else:
        np.testing.assert_array_equal(
            np.asarray(ours, np.float32), theirs.detach().float().numpy()
        )


@requires_reference
def test_checkpoint_triple_loader():
    bank_v, bank_t, adapter = load_checkpoint_triple(
        None,
        "/root/reference/pretrained_ckpt/fewsol-198-F/memory_bank_t.pt",
        "/root/reference/pretrained_ckpt/fewsol-198-F/query_adapter.pt",
    )
    assert bank_v is None
    assert bank_t.shape == (198, 768) and bank_t.dtype == np.float32
    assert adapter is not None and "fc.0.weight" in adapter
