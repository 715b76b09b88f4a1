"""CLIP image preprocessing: host-side decode/resize, device-side normalize.

Reference pipeline (``clip/clip.py:77-84`` eval; ``datasets/imagenet.py:8-23``
train): Resize(bicubic) -> CenterCrop -> RGB -> ToTensor -> Normalize for
eval, RandomResizedCrop(scale 0.5-1, bicubic) + HorizontalFlip(0.5) ->
Normalize for train.

TPU-first split: PIL produces uint8 HWC crops on the host (4x smaller
host->device transfers than fp32), and :func:`normalize_batch` runs the
/255 + mean/std affine on device where XLA fuses it into the first conv /
patch matmul.
"""

from __future__ import annotations

import math
import random as _random
from typing import Optional, Tuple

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def load_image(path: str, draft_px: Optional[int] = None) -> Image.Image:
    """Open an image as RGB; retries once on IOError (the reference retries
    forever, ``datasets/utils.py:46-54`` — one bounded retry is saner).

    ``draft_px`` opts into libjpeg's DCT-domain scaled decode (PIL
    ``draft``): the JPEG is decoded directly at 1/2, 1/4, or 1/8 scale —
    never smaller than ``draft_px`` on the shorter side, so the bicubic
    resize that follows still downscales.  ~2x faster per image and NOT
    pixel-exact with the torchvision reference pipeline (the DCT downscale
    replaces part of the bicubic filter), so it is OFF by default and meant
    for the serving/deployment path only; images at or below the draft size
    decode identically (draft is a no-op there).  Non-JPEG formats ignore
    ``draft``."""

    def _open() -> Image.Image:
        img = Image.open(path)
        if draft_px is not None:
            img.draft("RGB", (draft_px, draft_px))
        return img.convert("RGB")

    try:
        return _open()
    except OSError:
        return _open()


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    """Resize so the shorter side equals ``size`` (aspect preserved).

    Pixel-exact with torchvision ``Resize(size)`` as used by the reference's
    CLIP preprocess: the long side is ``int(size * long / short)``
    (truncation, not rounding)."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, int(size * h / w))
    else:
        new_w, new_h = max(1, int(size * w / h)), size
    return img.resize((new_w, new_h), Image.BICUBIC)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    """Pixel-exact with torchvision ``CenterCrop``: offsets are
    ``int(round((dim - size) / 2))``."""
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def clip_preprocess(img: Image.Image, n_px: int = 224) -> np.ndarray:
    """Eval-time transform -> uint8 (n_px, n_px, 3).

    Uses the native fused resize+crop (``protoclip_tpu.native``) when the
    C++ helper is buildable — pixel-exact with the PIL path (asserted by
    ``tests/test_native.py`` across geometries) and ~1.2-1.7x faster per
    core, because it computes only the pixels the crop keeps.  Falls back
    to PIL silently; ``$PROTOCLIP_NATIVE=0`` forces the PIL path."""
    if img.mode != "RGB":
        img = img.convert("RGB")
    from protoclip_tpu import native  # lazy: first call may compile the .so

    # probe availability BEFORE np.asarray: the full-frame copy (~9 MB at
    # 2048x1536) is only useful to the native path; on the PIL fallback it
    # would be pure waste on the host-preprocess hot loop
    if native.load() is not None:
        out = native.resize_shorter_center_crop(
            np.asarray(img, np.uint8), n_px, n_px
        )
        if out is not None:  # native may still decline the geometry
            return out
    img = center_crop(resize_shorter(img, n_px), n_px)
    return np.asarray(img, dtype=np.uint8)


def sample_rrc_box(
    w: int,
    h: int,
    rng: _random.Random,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling (10 attempts + clamped
    center fallback) -> (left, top, right, bottom).  Pure RNG logic, shared
    by the PIL and native execution paths so both consume identical draws
    (a seeded run reproduces byte-for-byte with or without the C++
    helper)."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return left, top, left + cw, top + ch
    # fallback: center crop at the clamped aspect ratio
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    left, top = (w - cw) // 2, (h - ch) // 2
    return left, top, left + cw, top + ch


def random_resized_crop(
    img: Image.Image,
    size: int,
    rng: _random.Random,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Image.Image:
    """torchvision-style RandomResizedCrop (10 attempts + center fallback)."""
    box = sample_rrc_box(*img.size, rng, scale, ratio)
    return img.resize((size, size), Image.BICUBIC, box=box)


def random_train_transform(
    img: Image.Image, rng: _random.Random, n_px: int = 224
) -> np.ndarray:
    """Train-time transform: RandomResizedCrop(scale 0.5-1) + HFlip(0.5)
    -> uint8 (n_px, n_px, 3) (ref ``datasets/imagenet.py:8-23``).

    Deliberately executes through PIL, not ``native.resize_box`` (which is
    pixel-exact with this path and available for array-holding callers):
    measured end-to-end from a PIL input the native route is parity at
    camera sizes and LOSES at 2048x1536 (0.87x) because the mandatory
    full-image ``np.asarray`` copy outweighs the resample win — a boxed
    resize keeps every output pixel, so there is no crop-fusion saving
    like the eval path's 1.47x.  See ``tests/test_native.py`` for the
    parity pin and BASELINE.md "Host preprocess" for the numbers."""
    box = sample_rrc_box(*img.size, rng)
    flip = rng.random() < 0.5
    img = img.resize((n_px, n_px), Image.BICUBIC, box=box)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return np.asarray(img, dtype=np.uint8)


def normalize_batch(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Device-side ``ToTensor + Normalize``: uint8 (B, H, W, 3) -> normalized.

    XLA fuses the affine into the consumer (first conv / patch matmul).
    """
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)
    out = (images_u8.astype(jnp.float32) - mean) * inv_std
    return out.astype(dtype)


class EvalTransform:
    """Picklable eval-transform callable."""

    def __init__(self, n_px: int = 224):
        self.n_px = n_px

    def __call__(self, img: Image.Image, rng: Optional[_random.Random] = None) -> np.ndarray:
        return clip_preprocess(img, self.n_px)


class TrainTransform:
    """Picklable train-transform callable (seeded per-loader)."""

    def __init__(self, n_px: int = 224):
        self.n_px = n_px

    def __call__(self, img: Image.Image, rng: Optional[_random.Random] = None) -> np.ndarray:
        return random_train_transform(img, rng or _random, self.n_px)
