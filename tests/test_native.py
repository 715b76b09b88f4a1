"""Native C++ preprocess parity: the fused bicubic resize + center crop
(protoclip_tpu/native/preprocess.cpp) must be PIXEL-EXACT with the PIL
pipeline it replaces (resize_shorter -> center_crop, the torchvision
arithmetic of the reference's CLIP preprocess, clip/clip.py:77-84) — the
feature caches it feeds are contractually byte-stable."""

import numpy as np
import pytest
from PIL import Image

from protoclip_tpu import native
from protoclip_tpu.data.transforms import center_crop, clip_preprocess, resize_shorter

def _native_available() -> bool:
    try:
        return native.load() is not None
    except RuntimeError:  # PROTOCLIP_NATIVE=1 with a broken toolchain:
        return False      # collection must SKIP, not error


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native preprocess unavailable (no g++)"
)


GEOMETRIES = [
    (375, 500), (500, 375), (768, 1024), (240, 320), (224, 224), (225, 225),
    (299, 299), (1000, 50), (50, 1000), (517, 333), (97, 211), (2000, 100),
]


@pytest.mark.parametrize("h,w", GEOMETRIES)
def test_fused_resize_crop_pixel_exact(h, w):
    src = np.random.default_rng(h * 1000 + w).integers(
        0, 256, (h, w, 3), np.uint8
    ).astype(np.uint8)
    ref = np.asarray(center_crop(resize_shorter(Image.fromarray(src), 224), 224))
    got = native.resize_shorter_center_crop(src, 224, 224)
    assert got is not None
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("oh,ow", [(224, 298), (298, 224), (224, 224), (112, 149), (448, 640)])
def test_resize_bicubic_pixel_exact(oh, ow):
    src = np.random.default_rng(oh * 7 + ow).integers(
        0, 256, (375, 500, 3), np.uint8
    ).astype(np.uint8)
    ref = np.asarray(Image.fromarray(src).resize((ow, oh), Image.BICUBIC))
    got = native.resize_bicubic(src, oh, ow)
    assert got is not None
    np.testing.assert_array_equal(got, ref)


def test_fuzz_geometries():
    rng = np.random.default_rng(0)
    for _ in range(25):
        h = int(rng.integers(30, 900))
        w = int(rng.integers(30, 900))
        n_px = int(rng.choice([96, 224, 288, 336]))
        src = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8)
        ref = np.asarray(center_crop(resize_shorter(Image.fromarray(src), n_px), n_px))
        got = native.resize_shorter_center_crop(src, n_px, n_px)
        assert got is not None, (h, w, n_px)
        np.testing.assert_array_equal(got, ref, err_msg=f"{h}x{w} n_px={n_px}")


@pytest.mark.parametrize("size,crop", [(256, 224), (288, 224), (300, 96), (97, 64)])
def test_size_not_equal_crop_pixel_exact(size, crop):
    """The binding's full (size, crop) surface — the torchvision-style
    resize-256/crop-224 eval recipe — not just size == crop."""
    src = np.random.default_rng(size * 31 + crop).integers(
        0, 256, (375, 500, 3), np.uint8
    ).astype(np.uint8)
    ref = np.asarray(center_crop(resize_shorter(Image.fromarray(src), size), crop))
    got = native.resize_shorter_center_crop(src, size, crop)
    assert got is not None
    np.testing.assert_array_equal(got, ref)


def test_fuzz_resize_box_vs_pil():
    """The RandomResizedCrop backend: native box resize (+fused flip) must
    be byte-identical to PIL ``resize(box=...)`` (+``FLIP_LEFT_RIGHT``)
    across random geometries, boxes, and output sizes."""
    rng = np.random.default_rng(1)
    for _ in range(40):
        h = int(rng.integers(20, 600))
        w = int(rng.integers(20, 600))
        src = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8)
        cw = int(rng.integers(4, w + 1))
        ch = int(rng.integers(4, h + 1))
        left = int(rng.integers(0, w - cw + 1))
        top = int(rng.integers(0, h - ch + 1))
        size = int(rng.integers(16, 300))
        flip = bool(rng.integers(0, 2))
        box = (left, top, left + cw, top + ch)
        ref = Image.fromarray(src).resize((size, size), Image.BICUBIC, box=box)
        if flip:
            ref = ref.transpose(Image.FLIP_LEFT_RIGHT)
        got = native.resize_box(src, size, size, box, flip)
        assert got is not None, (h, w, box, size)
        np.testing.assert_array_equal(
            got, np.asarray(ref), err_msg=f"{h}x{w} box={box} size={size} flip={flip}"
        )


def test_resize_box_rejects_degenerate_boxes():
    src = np.zeros((64, 64, 3), np.uint8)
    assert native.resize_box(src, 32, 32, (10, 10, 10, 20)) is None  # zero w
    assert native.resize_box(src, 32, 32, (-1, 0, 32, 32)) is None   # oob
    assert native.resize_box(src, 32, 32, (0, 0, 65, 32)) is None    # oob


def test_resize_box_matches_train_transform():
    """``native.resize_box`` fed the same sampled box/flip must reproduce
    ``random_train_transform``'s bytes exactly — the primitive is a drop-in
    for array-holding callers (the shipped transform stays on PIL by
    measurement; see its docstring)."""
    import random

    from protoclip_tpu.data.transforms import random_train_transform, sample_rrc_box

    src = np.random.default_rng(7).integers(0, 256, (375, 500, 3), np.uint8).astype(np.uint8)
    img = Image.fromarray(src)
    for seed in range(6):
        rng = random.Random(seed)
        ref = random_train_transform(img, rng, 224)
        rng = random.Random(seed)  # replay the identical draws
        box = sample_rrc_box(500, 375, rng)
        flip = rng.random() < 0.5
        got = native.resize_box(src, 224, 224, box, flip)
        assert got is not None
        np.testing.assert_array_equal(got, ref)


def test_clip_preprocess_native_matches_pil(monkeypatch):
    src = np.random.default_rng(5).integers(0, 256, (375, 500, 3), np.uint8).astype(np.uint8)
    img = Image.fromarray(src)
    # guard against a tautological PIL-vs-PIL pass: the native path must
    # actually accept this input, or the first call silently falls back
    assert native.resize_shorter_center_crop(src, 224, 224) is not None
    via_native = clip_preprocess(img, 224)
    monkeypatch.setenv("PROTOCLIP_NATIVE", "0")
    via_pil = clip_preprocess(img, 224)
    np.testing.assert_array_equal(via_native, via_pil)


def test_env_gate_forces_pil(monkeypatch):
    monkeypatch.setenv("PROTOCLIP_NATIVE", "0")
    assert native.load() is None
    src = np.zeros((64, 64, 3), np.uint8)
    assert native.resize_shorter_center_crop(src, 224, 224) is None


def test_stale_cached_so_is_evicted_and_rebuilt(monkeypatch, tmp_path):
    """A cached .so that fails to dlopen (stale glibc, foreign CPU object)
    must be evicted and rebuilt, not latch the native path off forever."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    path = native._build()  # fresh build into the tmp cache
    assert path is not None and str(tmp_path) in path
    with open(path, "wb") as fh:
        fh.write(b"not an elf object")  # corrupt the cache entry
    lib = native.load()
    assert lib is not None, "loader must rebuild past the corrupt cache"
    src = np.random.default_rng(3).integers(0, 256, (64, 80, 3), np.uint8)
    ref = np.asarray(
        center_crop(resize_shorter(Image.fromarray(src.astype(np.uint8)), 32), 32)
    )
    got = native.resize_shorter_center_crop(src.astype(np.uint8), 32, 32)
    np.testing.assert_array_equal(got, ref)


def test_non_rgb_and_bad_shapes():
    # grayscale input: clip_preprocess converts before the native call
    img = Image.new("L", (300, 260), 128)
    out = clip_preprocess(img, 224)
    assert out.shape == (224, 224, 3) and (out == 128).all()
    # the raw binding declines non-HWC3 arrays rather than crashing
    assert native.resize_shorter_center_crop(np.zeros((10, 10), np.uint8), 224, 224) is None
