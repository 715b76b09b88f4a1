"""Threaded prefetching batch loader.

Replaces the reference's ``DataLoader(num_workers=8, pin_memory=True)``
(``datasets/utils.py:365-394``) with a thread pool: PIL decode/resize release
the GIL, so threads parallelize IO+decode without process-fork overhead, and
batches arrive as fixed-shape uint8 numpy arrays ready for one host->device
transfer.

Fixed shapes matter on TPU: a ragged final batch would trigger a fresh XLA
compilation, so ``pad_last=True`` (default) pads it and reports ``n_valid``.
"""

from __future__ import annotations

import concurrent.futures as _futures
import random as _random
from typing import Iterator, Sequence, Tuple

import numpy as np

from protoclip_tpu.data.transforms import EvalTransform, load_image
from protoclip_tpu.data.types import Datum


class BatchLoader:
    """Iterate (images_u8 (B,H,W,3), labels (B,), n_valid) batches.

    Parameters
    ----------
    items: Datum sequence to iterate.
    batch_size: fixed batch size; the final batch is zero-padded.
    transform: callable (PIL.Image, rng) -> uint8 HWC array.
    shuffle: reshuffle order each epoch (seeded).
    seed: RNG seed for shuffling and random transforms.
    num_threads: decode worker threads.
    pad_last: pad the ragged final batch to ``batch_size`` (keeps jit shapes
        stable); ``n_valid`` marks real rows.
    fast_decode: opt into libjpeg DCT-scaled decode (~2x faster host
        preprocess; NOT pixel-exact with the torchvision pipeline — serving
        only, never for feature caches meant to match the reference).
    """

    def __init__(
        self,
        items: Sequence[Datum],
        batch_size: int = 256,
        transform=None,
        shuffle: bool = False,
        seed: int = 1,
        num_threads: int = 8,
        pad_last: bool = True,
        image_size: int = 224,
        fast_decode: bool = False,
    ):
        if len(items) == 0:
            raise ValueError("BatchLoader requires a non-empty item list")
        self.items = list(items)
        self.batch_size = batch_size
        self.transform = transform or EvalTransform(image_size)
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.pad_last = pad_last
        self.image_size = image_size
        self.fast_decode = fast_decode
        self._epoch = 0

    def __len__(self) -> int:
        return (len(self.items) + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch counter that seeds shuffling and per-image
        augmentation RNG.  Order and augmentations are pure functions of
        ``(seed, epoch)``, so a resumed run (train/resume.py) that calls
        this replays the exact batches an uninterrupted run would see."""
        self._epoch = int(epoch)

    @property
    def num_items(self) -> int:
        return len(self.items)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.items))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        order = self._order()
        rng_base = self.seed * 100003 + self._epoch
        self._epoch += 1

        draft_px = self.image_size if self.fast_decode else None

        def load_one(args):
            pos, global_pos, idx = args
            item = self.items[idx]
            rng = _random.Random(rng_base * 1_000_003 + global_pos)
            return pos, self.transform(load_image(item.impath, draft_px), rng), item.label

        bs = self.batch_size

        def build_batch(pool, start):
            chunk = order[start : start + bs]
            n_valid = len(chunk)
            images = np.zeros((bs if self.pad_last else n_valid, self.image_size, self.image_size, 3), np.uint8)
            labels = np.zeros((bs if self.pad_last else n_valid,), np.int32)
            work = [(pos, start + pos, idx) for pos, idx in enumerate(chunk)]
            for pos, img, label in pool.map(load_one, work):
                images[pos] = img
                labels[pos] = label
            return images, labels, n_valid

        # double buffering: while the consumer runs (device encode), the
        # NEXT batch decodes in the background — overlapping host decode
        # with device compute instead of serializing them.  The driver gets
        # its own single thread (an orchestrator task inside the decode
        # pool would deadlock it at num_threads=1).
        with _futures.ThreadPoolExecutor(max_workers=self.num_threads) as pool, \
                _futures.ThreadPoolExecutor(max_workers=1) as driver:
            starts = list(range(0, len(order), bs))
            pending = driver.submit(build_batch, pool, starts[0])
            for i, start in enumerate(starts):
                batch = pending.result()
                if i + 1 < len(starts):
                    pending = driver.submit(build_batch, pool, starts[i + 1])
                yield batch


class ArrayLoader:
    """Batch iterator over in-memory arrays (same interface as BatchLoader);
    used by tests and the toolkit's crop-classification path."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int = 256, pad_last: bool = True):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.pad_last = pad_last

    def __len__(self) -> int:
        return (len(self.images) + self.batch_size - 1) // self.batch_size

    @property
    def num_items(self) -> int:
        return len(self.images)

    def __iter__(self):
        bs = self.batch_size
        for start in range(0, len(self.images), bs):
            imgs = self.images[start : start + bs]
            labs = self.labels[start : start + bs]
            n_valid = len(imgs)
            if self.pad_last and n_valid < bs:
                imgs = np.concatenate(
                    [imgs, np.zeros((bs - n_valid, *imgs.shape[1:]), imgs.dtype)]
                )
                labs = np.concatenate([labs, np.zeros((bs - n_valid,), labs.dtype)])
            yield imgs, labs, n_valid
