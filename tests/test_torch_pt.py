"""Pure-python .pt reader: round-trips against torch and the reference's
pretrained checkpoints."""

import os

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


# ---------------------------------------------------------------------------
# raw pickle.dump artifacts (reference text_mb_*.pkl / zero_shot_hp_search_*.pkl)
# ---------------------------------------------------------------------------

def test_load_pkl_numpy_grid(tmp_path):
    """HP-search grids are pickle.dump'd numpy (M, 3) arrays (main.py:155-211)."""
    import pickle

    from protoclip_tpu.io.torch_pt import load_pkl

    grid = np.stack([np.linspace(0, 1, 11)] * 3, axis=1).astype(np.float32)
    path = tmp_path / "hp.pkl"
    with open(path, "wb") as f:
        pickle.dump(grid, f, protocol=pickle.HIGHEST_PROTOCOL)
    out = load_pkl(str(path))
    np.testing.assert_allclose(out, grid)


@pytest.mark.parametrize("dtype", [torch.float16, torch.float32])
def test_load_pkl_raw_tensor(tmp_path, dtype):
    """The textual bank is a raw-pickled torch tensor (utils.py:36-69):
    storages arrive as embedded legacy torch.save byte streams."""
    import pickle

    from protoclip_tpu.io.torch_pt import load_pkl

    t = torch.randn(64, 10).to(dtype)
    path = tmp_path / "tb.pkl"
    with open(path, "wb") as f:
        pickle.dump(t, f, protocol=pickle.HIGHEST_PROTOCOL)
    out = load_pkl(str(path))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), t.float().numpy(), rtol=0, atol=0
    )


def test_load_pkl_strided_view(tmp_path):
    import pickle

    from protoclip_tpu.io.torch_pt import load_pkl

    base = torch.randn(10, 8)
    view = base[2:6, 1:5]
    path = tmp_path / "v.pkl"
    with open(path, "wb") as f:
        pickle.dump(view, f)
    np.testing.assert_allclose(load_pkl(str(path)), view.numpy())


def test_load_pkl_rejects_untrusted_symbols(tmp_path):
    import pickle

    from protoclip_tpu.io.torch_pt import load_pkl

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    path = tmp_path / "evil.pkl"
    with open(path, "wb") as f:
        pickle.dump(Evil(), f)
    with pytest.raises(pickle.UnpicklingError):
        load_pkl(str(path))


def test_legacy_unreferenced_storage_fails_loudly(tmp_path):
    """A legacy-stream storage key no tensor references has unknowable byte
    length; guessing desynchronizes the stream, so the reader must raise."""
    import pickle
    import struct

    from protoclip_tpu.io.torch_pt import _LEGACY_MAGIC, _LEGACY_PROTOCOL, load_pt

    path = tmp_path / "bad_legacy.pt"
    with open(path, "wb") as f:
        pickle.dump(_LEGACY_MAGIC, f, protocol=2)
        pickle.dump(_LEGACY_PROTOCOL, f, protocol=2)
        pickle.dump({"little_endian": True}, f, protocol=2)
        pickle.dump({}, f, protocol=2)  # payload references no storage
        pickle.dump(["0"], f, protocol=2)  # ...but key_order lists one
        f.write(struct.pack("<q", 4))
        f.write(b"\x00" * 32)
    with pytest.raises(ValueError, match="no tensor references"):
        load_pt(str(path))


# ---------------------------------------------------------------------------
# TorchScript archives (OpenAI CLIP release format, clip/clip.py:92-136)
# ---------------------------------------------------------------------------

def _module_tree(sd):
    """Build a torch module hierarchy whose state_dict() equals ``sd``."""

    class Root(torch.nn.Module):
        def forward(self, x):
            return x

    root = Root()
    for key, arr in sd.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                mod.add_module(p, torch.nn.Module())
            mod = getattr(mod, p)
        t = torch.from_numpy(np.atleast_1d(np.asarray(arr))).squeeze() if np.ndim(arr) == 0 else torch.from_numpy(np.asarray(arr))
        mod.register_parameter(parts[-1], torch.nn.Parameter(t, requires_grad=False))
    return root


def _make_ts_clip(tmp_path):
    from tests.test_models import _tiny_torch_style_state_dict

    sd = _tiny_torch_style_state_dict(np.random.default_rng(0))
    root = _module_tree(sd)
    # extra non-state tensor attributes the OpenAI TS archives carry
    root.input_resolution = torch.tensor(32)
    root.register_buffer("attn_mask", torch.zeros(4, 4))
    traced = torch.jit.trace(root, torch.zeros(1))
    path = str(tmp_path / "ts_clip.pt")
    torch.jit.save(traced, path)
    return sd, path


def test_torchscript_state_dict_matches_jit_load(tmp_path):
    sd, path = _make_ts_clip(tmp_path)
    want = {k: v.numpy() for k, v in torch.jit.load(path).state_dict().items()}
    got = load_pt(path)
    assert set(want) <= set(got)  # extras (input_resolution) are fine
    for k, v in want.items():
        np.testing.assert_allclose(np.asarray(got[k], np.float32), v, atol=0)


def test_torchscript_loads_without_torch(tmp_path):
    """The reader must work on a torch-less machine: a meta-path hook blocks
    any torch import in a fresh subprocess."""
    import subprocess
    import sys as _sys

    _, path = _make_ts_clip(tmp_path)
    code = f"""
import sys
class _Block:
    def find_spec(self, name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked for this test")
sys.meta_path.insert(0, _Block())
import numpy as np
from protoclip_tpu.io.torch_pt import load_pt
sd = load_pt({path!r})
assert "visual.conv1.weight" in sd, sorted(sd)[:5]
assert np.asarray(sd["visual.conv1.weight"]).shape == (64, 3, 16, 16)
assert "torch" not in sys.modules
print("OK", len(sd))
"""
    proc = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.startswith("OK")


def test_load_clip_from_torchscript_archive(tmp_path):
    """load_clip must consume a TorchScript CLIP archive end-to-end."""
    import jax
    import jax.numpy as jnp

    from protoclip_tpu.models.clip import encode_image, load_clip

    sd, path = _make_ts_clip(tmp_path)
    cfg, params = load_clip("custom", weights_path=path, dtype=jnp.float32)
    assert cfg.vision_width == 64 and cfg.image_resolution == 32
    out = jax.jit(lambda p, x: encode_image(p, x, cfg))(
        params, jnp.zeros((2, 32, 32, 3), jnp.float32)
    )
    assert out.shape == (2, 32) and np.isfinite(np.asarray(out)).all()


def test_legacy_storage_view_metadata_rejected():
    """Legacy persistent ids may carry (view_key, offset, size) in element
    5 for storages that are VIEWS of another storage; decoding a view as
    its root would silently read the wrong bytes — must fail loudly."""
    import io as _io
    import pickle as _pickle

    from protoclip_tpu.io.torch_pt import _Unpickler

    u = _Unpickler(_io.BytesIO(b""), lambda key: b"")
    with pytest.raises(_pickle.UnpicklingError, match="view"):
        u.persistent_load(("storage", None, "0", "cpu", 10, ("1", 4, 5)))
    # a trailing None (what torch actually writes) stays accepted
    ref = u.persistent_load(("storage", None, "0", "cpu", 10, None))
    assert ref is not None


def test_load_clip_strips_module_prefix_per_key(tmp_path):
    """Regression: the DataParallel 'module.' strip sliced 7 chars off
    EVERY key once any one key was prefixed, corrupting un-prefixed keys
    in mixed state dicts (e.g. 'logit_scale' -> 'cale')."""
    import pickle

    import jax.numpy as jnp

    from protoclip_tpu.models.clip import load_clip

    sd, _ = _make_ts_clip(tmp_path)
    mixed = {f"module.{k}": v for k, v in sd.items() if k != "logit_scale"}
    mixed["logit_scale"] = sd["logit_scale"]  # wrapper-registered buffer
    path = str(tmp_path / "mixed.pt")
    with open(path, "wb") as fh:
        pickle.dump(mixed, fh)
    cfg, params = load_clip("custom", weights_path=path, dtype=jnp.float32)
    assert cfg.vision_width == 64
    assert "logit_scale" in params


def test_load_clip_strict_weights_and_unknown_backbone(monkeypatch, tmp_path):
    """$PROTOCLIP_STRICT_WEIGHTS forbids the silent random-init fallback;
    without weights an unknown backbone gets a named error, not a bare
    KeyError from the registry lookup."""
    from protoclip_tpu.models.clip import load_clip

    monkeypatch.setenv("PROTOCLIP_WEIGHTS_DIR", str(tmp_path))  # empty dir
    monkeypatch.setenv("PROTOCLIP_STRICT_WEIGHTS", "1")
    with pytest.raises(FileNotFoundError, match="STRICT_WEIGHTS"):
        load_clip("RN50")
    monkeypatch.delenv("PROTOCLIP_STRICT_WEIGHTS")
    with pytest.raises(ValueError, match="unknown backbone"):
        load_clip("RN50x64")


# ---------------------------------------------------------------------------
# checksum-verified downloader (ref clip/clip.py:30-70) — file:// URLs stand
# in for the network in this zero-egress environment
# ---------------------------------------------------------------------------

def test_download_url_verifies_and_caches(tmp_path):
    import hashlib

    from protoclip_tpu.io.download import download_url

    blob = b"fake clip weights " * 100
    sha = hashlib.sha256(blob).hexdigest()
    src_dir = tmp_path / "remote" / sha
    src_dir.mkdir(parents=True)
    (src_dir / "RN50.pt").write_bytes(blob)
    url = f"file://{src_dir}/RN50.pt"

    dest = tmp_path / "cache"
    target = download_url(url, str(dest), progress=False)
    assert open(target, "rb").read() == blob
    assert not (dest / "RN50.pt.part").exists()

    # cached reuse: corrupting the source must not matter
    (src_dir / "RN50.pt").write_bytes(b"changed")
    target2 = download_url(url, str(dest), progress=False)
    assert target2 == target and open(target2, "rb").read() == blob

    # corrupted cache entry is detected and re-fetched
    (dest / "RN50.pt").write_bytes(b"corrupt")
    (src_dir / "RN50.pt").write_bytes(blob)
    target3 = download_url(url, str(dest), progress=False)
    assert open(target3, "rb").read() == blob


def test_download_url_rejects_bad_checksum(tmp_path):
    from protoclip_tpu.io.download import download_url

    src_dir = tmp_path / "remote" / ("0" * 64)
    src_dir.mkdir(parents=True)
    (src_dir / "x.pt").write_bytes(b"whatever")
    with pytest.raises(RuntimeError, match="SHA-256"):
        download_url(f"file://{src_dir}/x.pt", str(tmp_path / "cache"), progress=False)
    assert not (tmp_path / "cache" / "x.pt").exists()


def test_model_urls_complete():
    from protoclip_tpu.io.download import MODEL_URLS
    from protoclip_tpu.models.clip import BACKBONE_CONFIGS

    # every reference release backbone has a pinned URL (clip/clip.py:30-39)
    assert set(MODEL_URLS) == set(BACKBONE_CONFIGS)
    for url in MODEL_URLS.values():
        assert len(url.split("/")[-2]) == 64  # sha256 path segment


def test_legacy_namespace_tensor(tmp_path):
    """Legacy checkpoints may carry tensors inside an argparse.Namespace;
    the fail-loudly unreferenced-storage check must still find them."""
    import argparse

    path = tmp_path / "ns_legacy.pt"
    obj = {"cfg": argparse.Namespace(mean=torch.arange(6, dtype=torch.float32))}
    torch.save(obj, str(path), _use_new_zipfile_serialization=False)
    out = load_pt(str(path))
    np.testing.assert_allclose(out["cfg"].mean, np.arange(6, dtype=np.float32))


def test_checkpoint_triple_npz_roundtrip(tmp_path, monkeypatch):
    """Torch-less hosts: save_checkpoint_triple writes .npz sidecars and
    load_checkpoint_triple reads them back (regression: the fallback used
    to be write-only)."""
    import builtins

    from protoclip_tpu.io.checkpoint import (
        load_checkpoint_triple,
        save_checkpoint_triple,
    )

    real_import = builtins.__import__

    def no_torch(name, *args, **kwargs):
        if name == "torch":
            raise ImportError("torch disabled for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    bank_v = np.random.default_rng(0).standard_normal((6, 4)).astype(np.float32)
    bank_t = np.random.default_rng(1).standard_normal((3, 4)).astype(np.float32)
    adapter = {"fc.weight": np.ones((4, 4), np.float32)}
    pv, pt, pa = (str(tmp_path / f"ck_{s}.pt") for s in "vta")
    save_checkpoint_triple(pv, pt, pa, bank_v, bank_t, adapter)
    assert not os.path.exists(pv) and os.path.exists(pv + ".npz")
    lv, lt, la = load_checkpoint_triple(pv, pt, pa)
    np.testing.assert_allclose(lv, bank_v, atol=2e-3)  # fp16 storage
    np.testing.assert_allclose(lt, bank_t, atol=2e-3)
    np.testing.assert_allclose(la["fc.weight"], adapter["fc.weight"])


def test_torchless_save_removes_stale_pt(tmp_path, monkeypatch):
    """Regression: _read_any prefers .pt over the .npz sidecar, so a
    torch-less retrain that only wrote .npz would be silently shadowed by
    a previous torch run's stale .pt — the npz save must drop it."""
    import builtins

    from protoclip_tpu.io.checkpoint import (
        load_checkpoint_triple,
        save_checkpoint_triple,
    )

    torch = pytest.importorskip("torch")
    pv, pt, pa = (str(tmp_path / f"sh_{s}.pt") for s in "vta")
    old_v = np.zeros((6, 4), np.float32)
    old_t = np.zeros((3, 4), np.float32)
    save_checkpoint_triple(pv, pt, pa, old_v, old_t, {"fc.weight": old_v[:4]})
    assert os.path.exists(pv)  # torch run wrote real .pt files

    real_import = builtins.__import__

    def no_torch(name, *args, **kwargs):
        if name == "torch":
            raise ImportError("torch disabled for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    new_t = np.full((3, 4), 7.0, np.float32)
    save_checkpoint_triple(pv, pt, pa, old_v + 1, new_t, {"fc.weight": old_v[:4]})
    assert not os.path.exists(pv) and os.path.exists(pv + ".npz")
    _, lt, _ = load_checkpoint_triple(pv, pt, pa)
    np.testing.assert_allclose(lt, new_t, atol=2e-3)  # the NEW bank, not stale


def test_legacy_preamble_rejects_globals(tmp_path):
    """The legacy preamble streams are primitives-only: a GLOBAL opcode in
    the very first pickle (the classic RCE vector) must be rejected."""
    import pickle as _pickle

    path = tmp_path / "evil.pt"
    with open(path, "wb") as fh:
        # a pickle whose payload is a global lookup (os.system ref)
        fh.write(b"\x80\x02cos\nsystem\nq\x00.")
    from protoclip_tpu.io.torch_pt import load_pt

    with pytest.raises((_pickle.UnpicklingError, ValueError)):
        load_pt(str(path))


def test_load_pt_malformed_files_raise_cleanly(tmp_path):
    """Corrupt/truncated/hostile checkpoint bytes must raise a clean error
    (never hang, crash the process, or return garbage silently) — load_pt
    reads untrusted files by design."""
    import pickle as _pickle
    import zipfile as _zipfile

    rng = np.random.default_rng(0)
    cases = {
        "empty.pt": b"",
        "random.pt": rng.integers(0, 256, 4096).astype(np.uint8).tobytes(),
        "truncated_zip.pt": b"PK\x03\x04" + b"\x00" * 64,
        "text.pt": b"definitely not a checkpoint\n" * 10,
    }
    # a real zip missing data.pkl
    bad_zip = tmp_path / "nodatapkl.pt"
    with _zipfile.ZipFile(bad_zip, "w") as zf:
        zf.writestr("archive/other.bin", b"xx")
    from protoclip_tpu.io.torch_pt import load_pt

    for name, payload in cases.items():
        path = tmp_path / name
        path.write_bytes(payload)
        with pytest.raises(Exception) as exc_info:
            load_pt(str(path))
        # clean, typed failures only — not SystemExit/KeyboardInterrupt
        import struct

        assert isinstance(
            exc_info.value,
            (ValueError, _pickle.UnpicklingError, EOFError, OSError,
             _zipfile.BadZipFile, KeyError, struct.error),
        ), (name, type(exc_info.value))
    with pytest.raises(ValueError):
        load_pt(str(bad_zip))

    # a valid plain pickle that is NOT a legacy stream is accepted via the
    # restricted plain-pickle fallback (not an error)
    plain = tmp_path / "plain.pt"
    plain.write_bytes(_pickle.dumps(12345))
    assert load_pt(str(plain)) == 12345


def test_load_pt_plain_pickle_state_dict(tmp_path):
    """A plain ``pickle.dump``'d numpy state dict loads through load_pt —
    the torch-free way to author checkpoints (examples/train_quickstart.py
    writes its tiny CLIP weights this way)."""
    import pickle as _pickle

    from protoclip_tpu.io.torch_pt import load_pt

    rng = np.random.default_rng(3)
    sd = {
        "visual.proj": rng.standard_normal((8, 4)).astype(np.float32),
        "logit_scale": np.float32(2.0),
    }
    path = tmp_path / "plain_sd.pt"
    with open(path, "wb") as fh:
        _pickle.dump(sd, fh)
    out = load_pt(str(path))
    assert set(out) == set(sd)
    np.testing.assert_array_equal(out["visual.proj"], sd["visual.proj"])


def test_download_and_extract_tar_and_zip(tmp_path):
    """Torch-free counterpart of the reference's gdown download_data
    (datasets/utils.py:193-213): fetch an archive (file:// here), verify the
    streamed SHA-256, extract tar or zip into the destination dir."""
    import hashlib
    import tarfile
    import zipfile

    from protoclip_tpu.io.download import ChecksumError, download_and_extract

    payload_dir = tmp_path / "payload" / "images"
    payload_dir.mkdir(parents=True)
    (payload_dir / "a.txt").write_text("hello")

    src = tmp_path / "src"
    src.mkdir()
    tar_path = src / "data.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(payload_dir, arcname="images")
    zip_path = src / "data.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.write(payload_dir / "a.txt", "images2/a.txt")

    tar_dest = tmp_path / "dst_tar"
    download_and_extract(f"file://{tar_path}", str(tar_dest), progress=False)
    assert (tar_dest / "images" / "a.txt").read_text() == "hello"
    assert (tar_dest / "data.tar.gz").exists()  # archive kept by default

    zip_dest = tmp_path / "dst_zip"
    sha = hashlib.sha256(zip_path.read_bytes()).hexdigest()
    download_and_extract(
        f"file://{zip_path}", str(zip_dest), expected_sha256=sha,
        progress=False, keep_archive=False,
    )
    assert (zip_dest / "images2" / "a.txt").read_text() == "hello"
    assert not (zip_dest / "data.zip").exists()

    # wrong checksum must abort before extraction
    with pytest.raises(ChecksumError):
        download_and_extract(
            f"file://{tar_path}", str(tmp_path / "dst_bad"),
            expected_sha256="0" * 64, progress=False,
        )


def test_extract_archive_blocks_path_traversal(tmp_path):
    """A tar member escaping the destination (../evil) must be rejected
    (the stdlib 'data' filter), not written outside the tree."""
    import io as _io
    import tarfile

    from protoclip_tpu.io.download import extract_archive

    evil = tmp_path / "evil.tar"
    with tarfile.open(evil, "w") as tar:
        info = tarfile.TarInfo("../escape.txt")
        data = b"pwned"
        info.size = len(data)
        tar.addfile(info, _io.BytesIO(data))
    dest = tmp_path / "dest"
    dest.mkdir()
    with pytest.raises(tarfile.OutsideDestinationError):
        extract_archive(str(evil), str(dest))
    assert not (tmp_path / "escape.txt").exists()

    with pytest.raises(ValueError, match="neither"):
        extract_archive(__file__, str(dest))
