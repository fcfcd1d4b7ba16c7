"""Out-of-HBM epoch streaming: disk cache -> double-buffered chunk ring ->
scanned trainer, with an optional HBM-resident shuffle pool for hosts
whose ingest link is slower than the chip.

The reference streams any dataset size from disk but pays decode +
letterbox + Python target assembly every epoch at host speed (reference:
train.py:60-207, 1471-1474). Here the one-time ImageCache (data/cache.py)
removes all per-epoch host compute except a fancy-index gather, and the
two streamers remove the per-step dispatch cost by feeding the scanned
multi-step trainers (train/steps.py):

ChunkStream — the plain out-of-HBM path. A background thread gathers
chunk k+1 (N steps x B images) from the memmap and issues its
`jax.device_put` while the device scans chunk k, so transfer hides behind
compute. Only ~3 chunks are ever resident in HBM: a dataset of ANY size
trains with O(chunk) device memory. On a direct-attached host this runs
at chip rate (ingest needed @640/b8 is ~1 GB/s, well under PCIe); through
a constrained link it degrades gracefully to link rate.

PoolStream — the same cache feeding a device-resident sample pool of P
images. Each scan step draws its batch from the pool by on-device gather
(host-side seeded PRNG chooses indices), while a background thread
refreshes pool slots with fresh images from disk at whatever rate the
host->device link sustains. This is a shuffle-buffer with data echoing
(Choi et al., 2019, arXiv:1907.05550): training proceeds at CHIP rate
regardless of ingest bandwidth, every cached image still cycles through
the pool, and when ingest >= consumption it degrades to plain streaming
(every sample fresh). Both the trained-sample rate and the fresh-ingest
rate are reported — they are different numbers and both are printed.
"""

from __future__ import annotations

import queue
import threading
import time

import jax
import numpy as np


def _epoch_chunks(n, chunk_images, shuffle, rng):
    """Epoch permutation split into equal chunks of `chunk_images`,
    wrap-padded (cyclic tile) so every chunk — hence every compiled scan —
    has the same static shape."""
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    total = -(-n // chunk_images) * chunk_images
    if total != n:
        idx = np.resize(idx, total)
    return [idx[i : i + chunk_images] for i in range(0, total, chunk_images)]


class ChunkStream:
    """Iterate device-resident (images (N,B,H,W,C), labels (N,B,K,5),
    counts (N,B)) chunks over an ImageCache, one chunk ahead of the
    consumer. `placement` is a Device or NamedSharding for device_put
    (DP meshes shard the B axis)."""

    def __init__(self, cache, batch_size=8, steps_per_chunk=16,
                 shuffle=True, seed=0, placement=None):
        self.cache = cache
        self.batch_size = batch_size
        self.steps_per_chunk = steps_per_chunk
        self.shuffle = shuffle
        self.placement = placement or jax.local_devices()[0]
        self._rng = np.random.default_rng(seed)

    @property
    def steps_per_epoch(self):
        per = self.batch_size * self.steps_per_chunk
        return -(-len(self.cache) // per) * self.steps_per_chunk

    @property
    def images_per_epoch(self):
        return self.steps_per_epoch * self.batch_size

    def _gather(self, idx):
        n, b = self.steps_per_chunk, self.batch_size
        c = self.cache
        images = np.ascontiguousarray(c.images[idx]).reshape(
            n, b, *c.images.shape[1:])
        labels = c.labels[idx].reshape(n, b, c.capacity, 5)
        counts = c.counts[idx].reshape(n, b)
        return images, labels, counts

    def _put(self, host_chunk):
        return tuple(jax.device_put(x, self.placement) for x in host_chunk)

    def __iter__(self):
        """One epoch of staged chunks (gather + transfer run one chunk
        ahead on a background thread)."""
        chunks = _epoch_chunks(
            len(self.cache), self.batch_size * self.steps_per_chunk,
            self.shuffle, self._rng)
        q: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()
        SENTINEL = object()

        def producer():
            try:
                for idx in chunks:
                    staged = self._put(self._gather(idx))
                    while not stop.is_set():
                        try:
                            q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    else:
                        return
            except BaseException as e:  # surface IO errors to the consumer
                q.put(e)
            else:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)

    def run_epoch(self, trainer, state):
        """One epoch through the scanned trainer. Returns
        (state, metrics_means: dict, n_images, seconds)."""
        metrics_acc = []
        t0 = time.perf_counter()
        for images, labels, counts in self:
            state, metrics = trainer(state, images, labels, counts)
            metrics_acc.append(metrics)
        metrics_acc = jax.device_get(metrics_acc)
        dt = time.perf_counter() - t0
        n = max(len(metrics_acc), 1)
        means = {k: float(sum(m[k] for m in metrics_acc)) / n
                 for k in metrics_acc[0]} if metrics_acc else {}
        return state, means, self.images_per_epoch, dt


class PoolStream:
    """Device-resident sample pool over an ImageCache with background
    refresh. `run_epoch` drives the pool-sampling scanned trainer
    (train/steps.make_train_step_multi_pool) for the same step count a
    plain epoch would take, while a refresh thread cycles the cache's
    images through pool slots at link rate."""

    def __init__(self, cache, pool_size=1024, batch_size=8,
                 steps_per_chunk=16, seed=0, refresh_slab=128,
                 placement=None, max_ingest_img_s=None):
        """`max_ingest_img_s`: optional ceiling on the refresher's ingest
        rate (images/second). The echo factor (trained rate / ingest
        rate) is otherwise set by whatever the link sustains that day;
        capping ingest FORCES a chosen echo regime — the knob the 8x-echo
        accuracy A/B needs on a host whose tunnel binds the trainer to
        ingest (VERDICT r4 #3; BASELINE.md echo caveat)."""
        if pool_size > len(cache):
            pool_size = len(cache)
        # slab must divide the pool so slot writes never wrap
        while pool_size % refresh_slab:
            refresh_slab //= 2
        self.cache = cache
        self.pool_size = pool_size
        self.batch_size = batch_size
        self.steps_per_chunk = steps_per_chunk
        self.refresh_slab = refresh_slab
        self.max_ingest_img_s = max_ingest_img_s
        self.placement = placement or jax.local_devices()[0]
        self._rng = np.random.default_rng(seed)
        self._cursor = pool_size  # next cache row to ingest
        self._slot = 0  # next pool slot to overwrite
        self._epoch_ingested = 0
        self.total_ingested = 0  # run-total (per-epoch medians misread
        # slow-ingest regimes where a slab interval spans whole epochs)
        self._writer = self._make_writer()
        self._init_pool()
        # PERSISTENT refresher: staging one slab through a slow link can
        # take longer than a whole (short) epoch — a per-epoch thread
        # would then discard its partial slab at every epoch boundary and
        # the pool would silently NEVER refresh (observed: 12 s epochs vs
        # 43 s slabs -> ingest 0). One daemon thread owns the cursor and
        # runs across epochs; run_epoch drains whatever completed.
        self._slab_q: queue.Queue = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- pool construction / refresh ------------------------------------

    def _make_writer(self):
        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1, 2),
                 static_argnames=("start",))
        def write(pool_i, pool_l, pool_c, fresh_i, fresh_l, fresh_c, start):
            upd = jax.lax.dynamic_update_slice_in_dim
            return (upd(pool_i, fresh_i, start, 0),
                    upd(pool_l, fresh_l, start, 0),
                    upd(pool_c, fresh_c, start, 0))

        return write

    def _init_pool(self):
        c = self.cache
        p = self.pool_size
        place = lambda x: jax.device_put(x, self.placement)
        self.pool = (place(np.ascontiguousarray(c.images[:p])),
                     place(c.labels[:p]), place(c.counts[:p]))

    def _stage_slab(self):
        """Read the next sequential slab from the cache and start its
        transfer; returns (staged_arrays, slot). Sequential reads keep the
        memmap access pattern page-cache friendly."""
        c, s = self.cache, self.refresh_slab
        rows = np.arange(self._cursor, self._cursor + s) % len(c)
        self._cursor = int((self._cursor + s) % len(c))
        slot = self._slot
        self._slot = (self._slot + s) % self.pool_size
        place = lambda x: jax.device_put(x, self.placement)
        staged = (place(np.ascontiguousarray(c.images[rows])),
                  place(c.labels[rows]), place(c.counts[rows]))
        return staged, slot

    def _apply_slab(self, staged, slot):
        self.pool = self._writer(*self.pool, *staged, start=slot)
        self._epoch_ingested += self.refresh_slab
        self.total_ingested += self.refresh_slab

    # -- training ---------------------------------------------------------

    @property
    def steps_per_epoch(self):
        per = self.batch_size * self.steps_per_chunk
        return -(-len(self.cache) // per) * self.steps_per_chunk

    @property
    def images_per_epoch(self):
        return self.steps_per_epoch * self.batch_size

    def _ensure_refresher(self):
        t = self._thread
        if t is not None:
            if not self._stop.is_set() and t.is_alive():
                return
            # a previous stop() may have timed out with the thread still
            # mid-slab (_stage_slab can take ~43 s through a slow link).
            # Wait for it to actually exit BEFORE clearing the stop event:
            # clearing first would let the orphan resume and race a new
            # refresher on the shared cursor/slot state.
            t.join()
            self._thread = None

        def refresher():
            t_start = time.perf_counter()
            staged_imgs = 0
            while not self._stop.is_set():
                if self.max_ingest_img_s:
                    # rate limit: don't stage slab k until the capped
                    # schedule says its images are due
                    due = staged_imgs / self.max_ingest_img_s
                    while (not self._stop.is_set()
                           and time.perf_counter() - t_start < due):
                        self._stop.wait(0.1)
                    if self._stop.is_set():
                        return
                staged = self._stage_slab()
                staged_imgs += self.refresh_slab
                # block until the consumer drains — bounded so shutdown
                # can't deadlock on a full queue
                while not self._stop.is_set():
                    try:
                        self._slab_q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._stop.clear()
        self._thread = threading.Thread(target=refresher, daemon=True)
        self._thread.start()

    def stop(self):
        """Stop the background refresher (call after the last epoch so it
        does not keep staging transfers during eval/checkpointing)."""
        self._stop.set()
        try:
            while True:
                self._slab_q.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            if not self._thread.is_alive():
                self._thread = None
            # else: keep the handle — _ensure_refresher joins it before
            # starting a replacement, so a slow in-flight slab can never
            # yield two refreshers racing on the cursor

    def run_epoch(self, trainer, state):
        """One epoch (same step count as a plain epoch over the cache):
        dispatch scan chunks sampling from the pool; between dispatches
        apply any refresh slabs the background thread staged (the thread
        persists ACROSS epochs — see __init__). Returns
        (state, metrics_means + ingest telemetry, n_images, seconds)."""
        n_chunks = self.steps_per_epoch // self.steps_per_chunk
        self._epoch_ingested = 0
        self._ensure_refresher()
        metrics_acc = []
        t0 = time.perf_counter()
        try:
            for _ in range(n_chunks):
                idx = self._rng.integers(
                    0, self.pool_size,
                    (self.steps_per_chunk, self.batch_size), np.int32)
                state, metrics = trainer(state, *self.pool, idx)
                metrics_acc.append(metrics)
                # fold in every slab that finished while the chunk ran
                try:
                    while True:
                        staged, slot = self._slab_q.get_nowait()
                        self._apply_slab(staged, slot)
                except queue.Empty:
                    pass
        except BaseException:
            # a trainer failure (OOM, non-finite guard) must not leave the
            # persistent refresher staging transfers for the rest of the
            # process — callers' normal-return path calls stop(), this is
            # the failure path's equivalent
            self.stop()
            raise
        metrics_acc = jax.device_get(metrics_acc)
        dt = time.perf_counter() - t0
        n = max(len(metrics_acc), 1)
        means = {k: float(sum(m[k] for m in metrics_acc)) / n
                 for k in metrics_acc[0]} if metrics_acc else {}
        means["ingest_img_s"] = self._epoch_ingested / max(dt, 1e-9)
        return state, means, self.images_per_epoch, dt
