"""Out-of-HBM streaming pipeline: on-disk cache + chunk ring + HBM pool.

Covers the capability the reference gets for free by re-decoding from
disk every epoch (reference: train.py:60-207, 1471-1474): datasets larger
than device staging capacity training through the scanned trainer, via
the one-time cache (data/cache.py) and the two streamers
(data/stream.py).
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from yolo_from_scratch_tpu.data.cache import (
    build_cache,
    dataset_fingerprint,
    ensure_cache,
    open_cache,
)
from yolo_from_scratch_tpu.data.dataset import YoloDataset
from yolo_from_scratch_tpu.data.stream import (
    ChunkStream,
    PoolStream,
    _epoch_chunks,
)

from conftest import TEST_IMG_SIZE


@pytest.fixture(scope="module")
def cached(temp_dataset_dir, tmp_path_factory):
    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=TEST_IMG_SIZE)
    d = tmp_path_factory.mktemp("cache")
    cache = build_cache(ds, str(d / "c"), capacity=8, log=None)
    return ds, cache


class TestCache:
    def test_contents_match_dataset(self, cached):
        """Cached pixels + labels are byte-identical to what
        load_batch_compact produces (same decode+letterbox path)."""
        ds, cache = cached
        idx = list(range(len(ds)))
        imgs, labels, counts = ds.load_batch_compact(
            idx, capacity=8, image_dtype="uint8")
        np.testing.assert_array_equal(np.asarray(cache.images), imgs)
        np.testing.assert_array_equal(cache.labels, labels)
        np.testing.assert_array_equal(cache.counts, counts)

    def test_open_validates_fingerprint(self, cached):
        ds, cache = cached
        fp = dataset_fingerprint(ds.imgs)
        assert open_cache(cache.dir, fingerprint=fp) is not None
        assert open_cache(cache.dir, fingerprint="deadbeef") is None

    def test_stale_rebuild(self, temp_dataset_dir, tmp_path):
        """Touching an image invalidates the cache; ensure_cache rebuilds."""
        ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                         img_size=TEST_IMG_SIZE)
        d = str(tmp_path / "c")
        c1 = ensure_cache(ds, capacity=8, cache_dir=d, log=None)
        # second open is a cache hit (meta timestamps preserved)
        meta1 = json.loads((Path(d) / "meta.json").read_text())
        c2 = ensure_cache(ds, capacity=8, cache_dir=d, log=None)
        assert c2.meta["fingerprint"] == meta1["fingerprint"]
        # mutate an image -> fingerprint changes -> rebuild
        import os
        import time

        os.utime(ds.imgs[0], (time.time() + 10, time.time() + 10))
        assert dataset_fingerprint(ds.imgs) != meta1["fingerprint"]
        c3 = ensure_cache(ds, capacity=8, cache_dir=d, log=None)
        assert c3.meta["fingerprint"] != meta1["fingerprint"]

    def test_packed_layout(self, temp_dataset_dir, tmp_path):
        from yolo_from_scratch_tpu.models.packed import pack_s2d_host

        ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                         img_size=TEST_IMG_SIZE)
        cache = build_cache(ds, str(tmp_path / "cp"), capacity=8,
                            packed=True, log=None)
        s = TEST_IMG_SIZE
        assert cache.images.shape[1:] == (s // 4, s // 4, 48)
        imgs, _, _ = ds.load_batch_compact(
            [0], capacity=8, image_dtype="uint8")
        np.testing.assert_array_equal(
            np.asarray(cache.images[:1]), pack_s2d_host(imgs))


class TestEpochChunks:
    def test_exact_cover(self):
        rng = np.random.default_rng(0)
        chunks = _epoch_chunks(12, 4, True, rng)
        assert len(chunks) == 3
        assert sorted(np.concatenate(chunks)) == list(range(12))

    def test_wrap_pad(self):
        """Non-divisible n wrap-pads: every image appears at least once,
        every chunk has the full static size."""
        rng = np.random.default_rng(0)
        chunks = _epoch_chunks(10, 4, False, rng)
        flat = np.concatenate(chunks)
        assert all(len(c) == 4 for c in chunks)
        assert set(flat) == set(range(10))
        assert len(flat) == 12


class TestChunkStream:
    def test_epoch_covers_every_image(self, cached):
        _, cache = cached
        stream = ChunkStream(cache, batch_size=1, steps_per_chunk=5,
                             shuffle=True, seed=0)
        imgs_seen = []
        for images, labels, counts in stream:
            assert images.shape == (5, 1, *cache.images.shape[1:])
            assert labels.shape == (5, 1, 8, 5)
            assert counts.shape == (5, 1)
            imgs_seen.append(np.asarray(images).reshape(5, -1))
        got = np.concatenate(imgs_seen)
        want = np.asarray(cache.images).reshape(len(cache), -1)
        # every cached image appears exactly once (5 images, chunk = 5x1)
        assert got.shape == want.shape
        got_sorted = got[np.lexsort(got.T[::-1])]
        want_sorted = want[np.lexsort(want.T[::-1])]
        np.testing.assert_array_equal(got_sorted, want_sorted)

    def test_trains_equal_to_compact_path(self, cached, cfg):
        """ChunkStream + scanned compact trainer == the per-step compact
        trainer on the same batches, bit-for-bit on CPU."""
        from yolo_from_scratch_tpu.train.steps import (
            create_train_state,
            make_train_step,
            make_train_step_multi_compact,
            set_learning_rate,
        )

        _, cache = cached
        model, tx, state0 = create_train_state(jax.random.PRNGKey(0), cfg,
                                               1e-3)
        state0 = set_learning_rate(state0, 1e-3)

        stream = ChunkStream(cache, batch_size=1, steps_per_chunk=5,
                             shuffle=False, seed=0)
        trainer = make_train_step_multi_compact(model, tx, cfg, donate=False)
        state_a, means, n_imgs, _ = stream.run_epoch(trainer, state0)
        assert n_imgs == 5

        step = make_train_step(model, tx, cfg, donate=False,
                               compact_targets=True)
        state_b = state0
        for i in range(len(cache)):
            imgs = cache.images[i : i + 1].astype(np.float32) / 255.0
            state_b, m = step(state_b, imgs,
                              (cache.labels[i : i + 1],
                               cache.counts[i : i + 1]))
        pa = jax.device_get(state_a.params)
        pb = jax.device_get(state_b.params)
        # exact equality across the two compilations is unattainable
        # (Adam is scale-invariant per-leaf; see test_multistep.py) —
        # bound by the max update magnitude: n steps x ~2x lr
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=5 * 2e-3),
            pa, pb)
        assert np.isfinite(means["loss"])

    def test_sharded_placement_matches_single_device(self, cached, cfg):
        """DP: a ChunkStream sharding B over the 8-virtual-device mesh
        trains to the same parameters as single-device."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from jax.sharding import Mesh

        from yolo_from_scratch_tpu.parallel.mesh import DATA_AXIS
        from yolo_from_scratch_tpu.train.steps import (
            create_train_state,
            make_train_step_multi_compact,
            set_learning_rate,
        )

        _, cache = cached
        # batch 4 shards 2-way (batch must divide the data axis)
        mesh = Mesh(np.asarray(jax.devices()[:4]), (DATA_AXIS,))
        model, tx, state0 = create_train_state(jax.random.PRNGKey(0), cfg,
                                               1e-3)
        state0 = set_learning_rate(state0, 1e-3)

        def run(placement):
            # batch 4: shards over a size-8 axis only if padded — use the
            # real constraint instead: batch divisible by mesh for DP
            stream = ChunkStream(cache, batch_size=4, steps_per_chunk=1,
                                 shuffle=False, seed=0,
                                 placement=placement)
            trainer = make_train_step_multi_compact(model, tx, cfg,
                                                    donate=False)
            state, _, _, _ = stream.run_epoch(trainer, state0)
            return jax.device_get(state.params)

        p_single = run(None)
        p_sharded = run(NamedSharding(mesh, P(None, DATA_AXIS)))
        # post-Adam params match loosely: sharded reduction order perturbs
        # gradients at ulp scale and Adam amplifies near-zero second
        # moments (same bound as tests/test_sharding.py:93)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=5e-3),
            p_single, p_sharded)


class TestPoolStream:
    def test_refresh_writer_round_trips(self, cached):
        _, cache = cached
        pool = PoolStream(cache, pool_size=4, batch_size=1,
                          steps_per_chunk=2, refresh_slab=2, seed=0)
        imgs0 = np.asarray(pool.pool[0])
        np.testing.assert_array_equal(imgs0, cache.images[:4])
        # ingest two slabs: rows 4, then 0-1 (cyclic), into slots 0-1, 2-3
        staged, slot = pool._stage_slab()
        pool._apply_slab(staged, slot)
        staged, slot = pool._stage_slab()
        pool._apply_slab(staged, slot)
        imgs = np.asarray(pool.pool[0])
        np.testing.assert_array_equal(
            imgs[0], cache.images[4])  # slab 1: rows 4,0 -> slots 0,1
        np.testing.assert_array_equal(imgs[1], cache.images[0])
        np.testing.assert_array_equal(
            imgs[2], cache.images[1])  # slab 2: rows 1,2 -> slots 2,3
        np.testing.assert_array_equal(imgs[3], cache.images[2])

    def test_ingest_cap_limits_refresher_rate(self, cached):
        """max_ingest_img_s paces the refresher thread: with a 2-image
        slab and a 4 img/s cap, the second slab must not be staged before
        ~0.5 s — the knob that forces a chosen echo regime for the 8x-
        echo accuracy A/B (the uncapped refresher on this host stages
        slabs back-to-back)."""
        import time

        _, cache = cached
        pool = PoolStream(cache, pool_size=4, batch_size=1,
                          steps_per_chunk=2, refresh_slab=2, seed=0,
                          max_ingest_img_s=4.0)
        t0 = time.perf_counter()
        pool._ensure_refresher()
        try:
            slabs, stamps = [], []
            while len(slabs) < 3 and time.perf_counter() - t0 < 10.0:
                try:
                    slabs.append(pool._slab_q.get(timeout=0.2))
                    stamps.append(time.perf_counter() - t0)
                except Exception:
                    continue
            assert len(slabs) == 3, f"refresher staged {len(slabs)} slabs"
            # slab k is due at k*slab/cap = k*0.5 s (first at 0)
            assert stamps[1] >= 0.45, stamps
            assert stamps[2] >= 0.95, stamps
        finally:
            pool.stop()

    def test_run_epoch_trains(self, cached, cfg):
        from yolo_from_scratch_tpu.train.steps import (
            create_train_state,
            make_train_step_multi_pool,
            set_learning_rate,
        )

        _, cache = cached
        model, tx, state0 = create_train_state(jax.random.PRNGKey(0), cfg,
                                               1e-3)
        state0 = set_learning_rate(state0, 1e-3)
        pool = PoolStream(cache, pool_size=4, batch_size=1,
                          steps_per_chunk=5, refresh_slab=2, seed=0)
        trainer = make_train_step_multi_pool(model, tx, cfg, donate=False)
        state, means, n_imgs, _ = pool.run_epoch(trainer, state0)
        assert n_imgs == 5
        assert np.isfinite(means["loss"])
        assert "ingest_img_s" in means
        assert int(jax.device_get(state.step)) == 5
        # parameters actually moved
        moved = jax.tree.map(
            lambda a, b: not np.allclose(a, b),
            jax.device_get(state0.params), jax.device_get(state.params))
        assert any(jax.tree.leaves(moved))
