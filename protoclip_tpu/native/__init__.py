"""Native (C++) host-side helpers, bound via ctypes.

The TPU does the model math; the host's hot loop is image preprocess
(JPEG decode -> bicubic resize -> center crop).  ``preprocess.cpp``
implements the resize+crop stage fused and pixel-exact with PIL (see the
.cpp header for the arithmetic contract); this module compiles it on first
use with ``g++ -O3 -shared`` into a user cache dir and binds it with
ctypes — no Python.h / pybind11 required.  Everything degrades gracefully:
if no toolchain or the build fails, callers fall back to PIL.

Gate: ``$PROTOCLIP_NATIVE`` — ``1`` force-on (raise if unavailable),
``0`` force-off, unset = auto (use when buildable).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "preprocess.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir() -> str:
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(root, "protoclip_tpu")


# -ffp-contract=off: the pixel-exact contract with PIL depends on the
# coefficient doubles rounding identically; FMA contraction could perturb a
# weight sitting within 1 ulp of a quantization boundary.
_BASE_FLAGS = ("-O3", "-shared", "-fPIC", "-std=c++17", "-ffp-contract=off")


def _machine_tag() -> str:
    """Host identity folded into the cache key: -march=native objects are
    not portable across CPUs (a shared $HOME would otherwise SIGILL)."""
    import platform

    ident = f"{platform.machine()}:{platform.processor()}"
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "Processor")):
                    ident += ":" + line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return ident


def _build() -> Optional[str]:
    """Compile preprocess.cpp into the cache dir (keyed by source hash +
    flags + host CPU); returns the .so path or None if no toolchain."""
    with open(_SRC, "rb") as fh:
        src_hash = fh.read()
    os.makedirs(_cache_dir(), exist_ok=True)
    for flags in ((*_BASE_FLAGS, "-march=native"), _BASE_FLAGS):
        tag = hashlib.sha256(
            src_hash + " ".join(flags).encode() + _machine_tag().encode()
        ).hexdigest()[:16]
        out = os.path.join(_cache_dir(), f"preprocess_{tag}.so")
        if os.path.exists(out):
            return out
        # mkstemp (not mktemp): the name is created, not just reserved, so
        # two concurrent builders can never share one temp path and
        # os.replace a torn object into the cache
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_cache_dir())
        os.close(fd)
        try:
            subprocess.run(
                ["g++", *flags, _SRC, "-o", tmp], check=True,
                capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            try:  # don't litter the cache with failed/timed-out objects
                os.unlink(tmp)
            except OSError:
                pass
            continue  # e.g. toolchains without -march=native
        os.replace(tmp, out)  # atomic: concurrent builders race benignly
        return out
    return None


def load() -> Optional[ctypes.CDLL]:
    """The bound library, or None (unavailable / disabled)."""
    global _lib, _tried
    if os.environ.get("PROTOCLIP_NATIVE", "") == "0":
        return None
    force_on = os.environ.get("PROTOCLIP_NATIVE") == "1"
    with _lock:
        if _tried:
            if _lib is None and force_on:
                # keep raising on EVERY call — latching the failure would
                # silently serve PIL pixels despite the force-on gate
                raise RuntimeError(
                    "PROTOCLIP_NATIVE=1 but the native preprocess is "
                    "unavailable (g++ missing or compile/load failed)"
                )
            return _lib
        _tried = True
        lib = None
        for _attempt in range(2):
            path = _build()
            if path is None:
                break
            try:
                lib = ctypes.CDLL(path)
                break
            except OSError:
                # stale/incompatible cached .so (e.g. built against another
                # glibc, or a foreign -march=native object): evict it so the
                # next _build() recompiles fresh instead of latching failure
                try:
                    os.unlink(path)
                except OSError:
                    pass
        if lib is None:
            if force_on:
                raise RuntimeError(
                    "PROTOCLIP_NATIVE=1 but the native preprocess could not "
                    "be built/loaded (g++ missing or compile failed)"
                )
            return None
        lib.resize_shorter_center_crop.restype = ctypes.c_int
        lib.resize_shorter_center_crop.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_bicubic.restype = ctypes.c_int
        lib.resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_box.restype = ctypes.c_int
        lib.resize_box.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_shorter_center_crop(src: np.ndarray, size: int, crop: int) -> Optional[np.ndarray]:
    """Fused shorter-side bicubic resize + center crop, pixel-exact with the
    PIL path in ``data.transforms``.  ``src`` is (H, W, 3) uint8.  Returns
    None when the native path is unavailable or declines the geometry
    (e.g. upscales where the resized image is smaller than the crop) —
    callers fall back to PIL."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim != 3 or src.shape[2] != 3:
        return None
    dst = np.empty((crop, crop, 3), np.uint8)
    rc = lib.resize_shorter_center_crop(
        _as_u8_ptr(src), src.shape[0], src.shape[1], _as_u8_ptr(dst), size, crop
    )
    return dst if rc == 0 else None


def resize_bicubic(src: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Bicubic resize to (out_h, out_w), pixel-exact with PIL BICUBIC."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim != 3 or src.shape[2] != 3:
        return None
    dst = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.resize_bicubic(
        _as_u8_ptr(src), src.shape[0], src.shape[1], _as_u8_ptr(dst), out_h, out_w
    )
    return dst if rc == 0 else None


def resize_box(
    src: np.ndarray,
    out_h: int,
    out_w: int,
    box: tuple,
    flip: bool = False,
) -> Optional[np.ndarray]:
    """Bicubic resize of a source ``box`` (left, top, right, bottom) to
    (out_h, out_w) with optional fused horizontal flip — pixel-exact with
    PIL ``img.resize((w, h), BICUBIC, box=box)`` (+ ``FLIP_LEFT_RIGHT``),
    the train-time RandomResizedCrop backend.  Returns None when the native
    path is unavailable or the box is degenerate (callers fall back to
    PIL)."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim != 3 or src.shape[2] != 3:
        return None
    left, top, right, bottom = (float(v) for v in box)
    dst = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.resize_box(
        _as_u8_ptr(src), src.shape[0], src.shape[1], _as_u8_ptr(dst),
        out_h, out_w, left, top, right, bottom, 1 if flip else 0,
    )
    return dst if rc == 0 else None
