"""Batched, double-buffered input pipeline.

Replaces the reference's torch DataLoader worker-process pipeline
(training/maskdino/train_original.py:154-162 builds a detectron2 loader with a
custom mapper) with a host pipeline designed for TPU feeding:

- fixed-shape padded batches (static shapes under jit; no recompilation),
- a background thread that decodes/augments the *next* batch while the device
  runs the current step, and ``jax.device_put`` prefetch so HBM transfers
  overlap compute (double buffering),
- deterministic per-step RNG derived from (seed, step) so any step is
  reproducible in isolation.

Batch layout (dict of arrays, NHWC):
  image      (B, H, W, 3) uint8 RGB 0-255 (cast to float on device —
             4x less host->device transfer)
  valid_hw   (B, 2) int32
  gt_classes (B, M) int32, -1 padded
  gt_boxes   (B, M, 4) float32 xyxy canvas coords
  gt_masks   (B, M, H, W) uint8
  num_instances (B,) int32
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from typing import Dict, Iterator, List, Optional

import numpy as np

from vision_instance_seg_tpu.data.transforms import EvalTransform, SampleRecord, TrainTransform


def _read_image(path: str) -> np.ndarray:
    """Read an image file to RGB uint8 (reference uses detectron2
    utils.read_image, train_original.py:74)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _load_record_image(record: dict) -> dict:
    r = dict(record)
    if "__image__" not in r:
        r["__image__"] = _read_image(r["file_name"])
    return r


def collate(samples: List[SampleRecord]) -> Dict[str, np.ndarray]:
    return {
        "image": np.stack([s.image for s in samples]),
        "valid_hw": np.stack(
            [np.array([s.valid_h, s.valid_w], np.int32) for s in samples]),
        "orig_hw": np.stack(
            [np.array([s.orig_h, s.orig_w], np.int32) for s in samples]),
        "image_id": np.array([s.image_id for s in samples], np.int64),
        "gt_classes": np.stack([s.gt_classes for s in samples]),
        "gt_boxes": np.stack([s.gt_boxes for s in samples]),
        "gt_masks": np.stack([s.gt_masks for s in samples]),
        "num_instances": np.array([s.num_instances for s in samples], np.int32),
    }


def _process_info(process_index: Optional[int],
                  process_count: Optional[int]) -> tuple:
    """Resolve (index, count) for multi-host striding; (0, 1) single-host."""
    if process_count is not None:
        return int(process_index or 0), int(process_count)
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class TrainLoader:
    """Infinite, seeded, background-threaded train-batch iterator.

    Multi-host SPMD: ``batch_size`` is the GLOBAL batch; every process draws
    the same global index sequence and materializes only its contiguous
    per-process slice (detectron2's per-GPU loader sharding, SURVEY §2.3).
    """

    def __init__(self, dataset_dicts: List[dict], cfg, batch_size: Optional[int] = None,
                 seed: Optional[int] = None, prefetch: Optional[int] = None,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        if len(dataset_dicts) == 0:
            raise ValueError("empty training dataset")
        self.process_index, self.process_count = _process_info(
            process_index, process_count)
        self.dicts = [d for d in dataset_dicts
                      if not cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
                      or len(d.get("annotations", []))]
        if len(self.dicts) == 0:
            raise ValueError("all training images were filtered (no annotations)")
        self.batch_size = int(batch_size or cfg.SOLVER.IMS_PER_BATCH)
        self.seed = int(cfg.SEED if seed is None else seed)
        self.max_instances = int(cfg.INPUT.MAX_INSTANCES)
        self.transform = TrainTransform(
            canvas_size=cfg.INPUT.IMAGE_SIZE,
            min_sizes=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size=cfg.INPUT.MAX_SIZE_TRAIN,
            flip_horizontal=cfg.INPUT.RANDOM_FLIP == "horizontal",
            lsj=cfg.INPUT.LSJ.ENABLED,
            lsj_min_scale=cfg.INPUT.LSJ.MIN_SCALE,
            lsj_max_scale=cfg.INPUT.LSJ.MAX_SCALE,
            crop_enabled=cfg.INPUT.CROP.ENABLED,
            crop_type=cfg.INPUT.CROP.TYPE,
            crop_size=cfg.INPUT.CROP.SIZE,
        )
        self.prefetch = int(prefetch or cfg.DATALOADER.PREFETCH_BATCHES)
        self.num_workers = int(cfg.DATALOADER.NUM_WORKERS)
        # LRU decoded-image cache, bounded by entry count: the defect sets
        # are 26-127 images (all hits), but an unbounded id()-keyed dict was
        # a footgun for larger datasets (VERDICT r1 weak #8)
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cache_capacity = int(cfg.DATALOADER.get("CACHE_IMAGES", 512))

    def _cached_image(self, rec: dict) -> np.ndarray:
        if "__image__" in rec:
            return rec["__image__"]
        img = self._cache.get(id(rec))
        if img is not None:
            self._cache.move_to_end(id(rec))
            return img
        img = _read_image(rec["file_name"])
        if self._cache_capacity > 0:
            self._cache[id(rec)] = img
            while len(self._cache) > self._cache_capacity:
                self._cache.popitem(last=False)
        return img

    def _sample_indices(self, step: int) -> np.ndarray:
        """Deterministic infinite shuffle: epoch-wise permutation."""
        n = len(self.dicts)
        per_epoch = max(1, n // self.batch_size) * self.batch_size
        epoch = (step * self.batch_size) // per_epoch
        offset = (step * self.batch_size) % per_epoch
        rng = np.random.default_rng([self.seed, epoch])
        perm = rng.permutation(n)
        idx = [(offset + i) % n for i in range(self.batch_size)]
        return perm[idx]

    def local_indices(self, step: int) -> np.ndarray:
        """This process's contiguous slice of the global batch."""
        idx = self._sample_indices(step)
        if self.process_count == 1:
            return idx
        local = self.batch_size // self.process_count
        s = self.process_index * local
        return idx[s:s + local]

    def make_batch(self, step: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            [self.seed, 77, step, self.process_index])
        samples = []
        for i in self.local_indices(step):
            rec = self.dicts[int(i)]
            r = dict(rec)
            r["__image__"] = self._cached_image(rec)
            samples.append(self.transform(r, rng, self.max_instances))
        return collate(samples)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Background-threaded iteration with bounded lookahead.

        DATALOADER.NUM_WORKERS follows the d2 convention: 0 = load
        synchronously in the consuming thread (deterministic step timing,
        no lookahead); >=1 = the background producer thread below (this
        host feeds from one decode thread — lookahead depth is
        DATALOADER.PREFETCH_BATCHES, decode reuse is the LRU cache).
        """
        if self.num_workers == 0:
            step = 0
            while True:
                yield self.make_batch(step)
                step += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            step = 0
            while not stop.is_set():
                try:
                    q.put(self.make_batch(step), timeout=0.5)
                    step += 1
                except queue.Full:
                    continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()


class EvalLoader:
    """Deterministic, fixed-shape eval iterator (batch of padded canvases).

    Multi-host: each process evaluates its ``process_index``-strided subset;
    the evaluator merges per-host result lists (parallel/comm)."""

    def __init__(self, dataset_dicts: List[dict], cfg, batch_size: int = 1,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        pi, pc = _process_info(process_index, process_count)
        self.dicts = list(dataset_dicts)[pi::pc]
        self.batch_size = int(batch_size)
        self.transform = EvalTransform(
            min_size=cfg.INPUT.MIN_SIZE_TEST, max_size=cfg.INPUT.MAX_SIZE_TEST,
            pad_h=cfg.INPUT.TEST_PAD_H, pad_w=cfg.INPUT.TEST_PAD_W)

    def __len__(self) -> int:
        return (len(self.dicts) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        for i in range(0, len(self.dicts), self.batch_size):
            chunk = self.dicts[i:i + self.batch_size]
            samples = [self.transform(_load_record_image(r)) for r in chunk]
            pad = self.batch_size - len(samples)  # pad last batch (static shape)
            samples = samples + [samples[-1]] * pad
            batch = collate(samples)
            batch["__pad__"] = pad
            yield batch


def prefetch_to_device(iterator, size: int = 2):
    """Wrap a host batch iterator with device_put lookahead (double buffering)."""
    import collections

    import jax

    buf = collections.deque()
    it = iter(iterator)

    def _put(b):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x, b)

    try:
        for _ in range(size):
            buf.append(_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
