"""Batched data loader with background prefetch.

The reference iterates a torch DataLoader with no workers (reference:
train.py:1471-1474), so host-side PIL decode + target building serialize
with device compute. Here a background thread prepares the next batch
(decode, letterbox, dense target assignment, stacking) while the TPU runs
the current step — a double-buffered host->device pipeline. Batches are
numpy; device placement (with sharding) happens in the training loop via
`jax.device_put`, so the loader stays backend-agnostic.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def shard_indices(idx: np.ndarray, process_index: int,
                  process_count: int) -> np.ndarray:
    """This process's strided slice of an epoch permutation, padded (by
    wrapping) so EVERY process gets exactly ceil(n / pc) items.

    Strided (not contiguous) so that with a shuffle seed shared across
    hosts every process permutes identically and the shards stay
    disjoint. The wrap-pad matters in multi-host SPMD: every process
    must issue the same number of identically-shaped steps or the
    gradient collectives deadlock — a bare [pi::pc] slice gives shards
    whose sizes differ by one when pc does not divide n."""
    n, pc = len(idx), process_count
    per = -(-n // pc)  # ceil
    if n % pc:
        idx = np.resize(idx, pc * per)  # cyclic tile
    return idx[process_index::pc]


class DataLoader:
    """Minimal shuffling/batching loader over a YoloDataset-like object.

    Yields (images (B, S, S, 3) float32, [t_p3, t_p4, t_p5]) per batch,
    each target stacked to (B, gs, gs, A, 5+nc). The final partial batch is
    kept (reference DataLoader default drop_last=False).
    """

    def __init__(self, dataset, batch_size=8, shuffle=False, seed=0,
                 prefetch=2, pack_images=False, process_shard=None,
                 compact=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        # compact > 0: yield (uint8 images, (labels (B, K, 5), counts))
        # with K=compact instead of dense target maps — the on-device
        # assignment path (data/assign_device.py). At nc=80 @640 this
        # cuts host->device traffic ~11x and skips the ~8.7 MB/img dense
        # assembly on the host entirely.
        self.compact = compact
        # space-to-depth-pack image batches on the host for the packed-stem
        # model (models/packed.py) — done on the prefetch thread, so it
        # overlaps device compute like the rest of batch preparation
        self.pack_images = pack_images
        # multi-host data sharding: (process_index, process_count) — this
        # loader yields only the strided slice [pi::pc] of each (identically
        # seeded, hence identically shuffled) global epoch permutation, so
        # `batch_size` here is the PER-PROCESS batch (parallel.distributed)
        self.process_shard = process_shard
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self._epoch_indices(shuffled=False))
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self, shuffled=True):
        idx = np.arange(len(self.dataset))
        if self.shuffle and shuffled:
            self._rng.shuffle(idx)
        if self.process_shard is not None:
            pi, pc = self.process_shard
            # equal shard sizes AND a full final batch on every process:
            # multi-host steps are collective, so all processes must
            # yield the same number of identically-sized batches
            idx = shard_indices(idx, pi, pc)
            if len(idx) % self.batch_size:
                # np.resize tiles cyclically — handles shards smaller
                # than a single batch too
                idx = np.resize(
                    idx, -(-len(idx) // self.batch_size) * self.batch_size)
        return idx

    def _batch_indices(self):
        idx = self._epoch_indices()
        for i in range(0, len(idx), self.batch_size):
            yield idx[i : i + self.batch_size]

    def _make_batch(self, indices):
        if self.compact:
            images, labels, counts = self.dataset.load_batch_compact(
                indices, capacity=self.compact
            )
            if self.pack_images:
                from yolo_from_scratch_tpu.models.packed import pack_s2d_host

                images = pack_s2d_host(images)
            return images, (labels, counts)
        # dataset-provided batch fast path (native C++ loader) when present
        load_batch = getattr(self.dataset, "load_batch", None)
        if load_batch is not None:
            images, targets = load_batch(indices)
        else:
            imgs, tgts = [], []
            for i in indices:
                img, t = self.dataset[int(i)]
                imgs.append(img)
                tgts.append(t)
            images = np.stack(imgs).astype(np.float32)
            targets = [
                np.stack([t[s] for t in tgts]).astype(np.float32)
                for s in range(3)
            ]
        if self.pack_images:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            images = pack_s2d_host(images)
        return images, targets

    def __iter__(self):
        if self.prefetch <= 0:
            for indices in self._batch_indices():
                yield self._make_batch(indices)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts if the consumer went away, so an
            abandoned iterator can't leave this thread blocked forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for indices in self._batch_indices():
                    if not _put(self._make_batch(indices)):
                        return
            except BaseException as e:  # surface decode errors to consumer
                _put(e)
            else:
                # the sentinel MUST eventually land (blocking put with
                # stop-check) or the consumer would hang at epoch end
                _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer's pending put can observe the stop flag
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
