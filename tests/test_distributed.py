"""Multi-host layer (parallel.distributed) — single-process degenerate
behavior, which is the testable contract in this container.

The reference has no distributed code at all (reference: train.py:1377,
SURVEY.md §2.3); the properties tested here are the framework's own:
with process_count == 1 every multi-host helper must reduce EXACTLY to
the single-host path, and the host-side sharding logic (strided slices,
disjoint coverage) must hold for any (pi, pc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.data.loader import DataLoader
from yolo_from_scratch_tpu.parallel.distributed import (
    global_batch_size,
    local_shard_indices,
    make_global_batch,
)
from yolo_from_scratch_tpu.parallel.mesh import make_mesh, shard_batch


def test_local_shard_indices_cover_equal_sizes():
    """Across all processes the strided shards cover the whole dataset
    and are wrap-padded to EQUAL sizes (multi-host steps are collective:
    unequal shard sizes would deadlock the gradient psum)."""
    n, pc = 103, 8
    shards = [local_shard_indices(n, pi, pc) for pi in range(pc)]
    allidx = np.concatenate(shards)
    assert set(allidx.tolist()) == set(range(n))
    sizes = {len(s) for s in shards}
    assert sizes == {-(-n // pc)}  # all exactly ceil(n/pc)
    # only the wrap-pad duplicates: total == pc * ceil(n/pc)
    assert len(allidx) == pc * -(-n // pc)


def test_local_shard_indices_single_process_identity():
    np.testing.assert_array_equal(
        local_shard_indices(17, 0, 1), np.arange(17))


def test_make_global_batch_matches_shard_batch():
    """process_count == 1: make_global_batch places the SAME global array
    with the SAME sharding as the plain shard_batch path."""
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    images = rng.random((8, 32, 32, 3)).astype(np.float32)
    targets = [rng.random((8, g, g, 3, 6)).astype(np.float32)
               for g in (4, 2, 1)]

    gi, gt = make_global_batch(mesh, images, targets)
    si, st = shard_batch(mesh, images, targets)
    assert gi.sharding.is_equivalent_to(si.sharding, gi.ndim)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(si))
    for a, b in zip(gt, st):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_global_batch_feeds_jit_like_device_put():
    """A jitted reduction over a make_global_batch array equals the same
    over the device_put array (the arrays are interchangeable inputs)."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    images = rng.random((16, 8, 8, 3)).astype(np.float32)
    t = [rng.random((16, 2, 2, 3, 6)).astype(np.float32)]
    gi, gt = make_global_batch(mesh, images, t)
    si, st = shard_batch(mesh, images, t)

    f = jax.jit(lambda x, y: jnp.sum(x) * jnp.mean(y))
    np.testing.assert_allclose(
        float(f(gi, gt[0])), float(f(si, st[0])), rtol=1e-6)


def test_global_batch_size_single():
    assert global_batch_size(8) == 8 * jax.process_count()


class _IdxDataset:
    """Dataset stub: item i is (image filled with i, per-scale targets
    filled with i) so batch contents identify which indices were drawn."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((8, 8, 3), i, np.float32)
        return img, [np.full((2, 2, 3, 6), i, np.float32) for _ in range(3)]


def test_loader_process_shard_disjoint():
    """Two process-sharded loaders with the same seed draw disjoint
    strided halves of the identical epoch permutation."""
    seen = []
    for pi in (0, 1):
        loader = DataLoader(_IdxDataset(12), batch_size=3, shuffle=True,
                            seed=7, prefetch=0, process_shard=(pi, 2))
        assert len(loader) == 2  # 6 local items / batch 3
        ids = []
        for images, _ in loader:
            ids.extend(int(images[b, 0, 0, 0]) for b in range(len(images)))
        assert len(ids) == 6
        seen.append(set(ids))
    assert seen[0] | seen[1] == set(range(12))
    assert not (seen[0] & seen[1])


def test_loader_process_shard_collective_safe():
    """Uneven datasets: every process yields the SAME number of batches,
    each of exactly batch_size (wrap-padded) — a process with one extra
    or short batch would deadlock the collective train step."""
    n, pc, bs = 13, 2, 3
    shapes = []
    for pi in range(pc):
        loader = DataLoader(_IdxDataset(n), batch_size=bs, shuffle=True,
                            seed=3, prefetch=0, process_shard=(pi, pc))
        batches = [images.shape[0] for images, _ in loader]
        assert all(b == bs for b in batches)
        shapes.append(len(batches))
        assert len(loader) == len(batches)
    assert len(set(shapes)) == 1
    # degenerate: shard smaller than one batch still yields a full batch
    tiny = DataLoader(_IdxDataset(2), batch_size=4, shuffle=False,
                      prefetch=0, process_shard=(1, 2))
    (images, _), = list(tiny)
    assert images.shape[0] == 4


def test_loader_process_shard_none_is_full():
    loader = DataLoader(_IdxDataset(5), batch_size=2, prefetch=0)
    n = sum(len(images) for images, _ in loader)
    assert n == 5


def test_init_distributed_rejects_partial_args():
    """init_distributed forwards only the provided args; calling it after
    the backend is initialized raises (jax refuses double init) — assert
    the error is the jax one, not ours. The explicit jax.devices() call
    matters: without an initialized backend, jax 0.9 initialize() would
    instead start a REAL coordinator and block for its 300 s timeout."""
    from yolo_from_scratch_tpu.parallel.distributed import init_distributed

    jax.devices()  # force backend init regardless of test ordering
    with pytest.raises(RuntimeError):
        init_distributed("127.0.0.1:9999", 2, 0)


def test_global_eval_reduce_single_process_identity():
    from yolo_from_scratch_tpu.parallel.distributed import global_eval_reduce

    assert global_eval_reduce(3, 4, 5, 1.25, 7) == (3, 4, 5, 1.25, 7)


def _write_dist_dataset(root, n=8, img_size=64):
    """Deterministic 2-split dataset sized so 2 processes x batch 4
    divide it exactly (no wrap-pad): the strided process shards of each
    epoch permutation then reassemble into the SAME global batches the
    single-process loader draws, making cross-run loss comparison
    meaningful."""
    from PIL import Image

    root = __import__("pathlib").Path(root)
    rng = np.random.default_rng(42)
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        for i in range(n):
            img = (rng.random((img_size, img_size, 3)) * 255).astype(np.uint8)
            y0, x0 = rng.integers(8, img_size // 2, 2)
            img[y0:y0 + 20, x0:x0 + 24] = [250, 30, 30]
            Image.fromarray(img).save(root / split / "images" / f"{i}.jpg")
            cx, cy = (x0 + 12) / img_size, (y0 + 10) / img_size
            (root / split / "labels" / f"{i}.txt").write_text(
                f"0 {cx:.4f} {cy:.4f} {24 / img_size:.4f} "
                f"{20 / img_size:.4f}\n")
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"nc: 1\nnames: [obj]\ntrain: {root / 'train' / 'images'}\n"
        f"val: {root / 'val' / 'images'}\n")
    return yaml_path


_EPOCH_RE = (r"Epoch (\d+): Loss: ([\d.]+) \(bbox: ([\d.]+), obj: "
             r"([\d.]+), cls: ([\d.]+)\) \| Val: Loss ([\d.]+), "
             r"P ([\d.]+)%, R ([\d.]+)%, F1 ([\d.]+)%")


def _parse_epochs(stdout):
    import re

    return [tuple(float(g) for g in m.groups())
            for m in re.finditer(_EPOCH_RE, stdout)]


def _cli_env(n_devices):
    env = dict(__import__("os").environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",  # disable the axon TPU plugin
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    return env


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    """THE process-boundary test: two REAL processes (4 virtual CPU
    devices each) connect through jax.distributed.initialize via the
    CLI's --distributed flags, train 2 epochs + run the psummed global
    eval, and must (a) print identical global metrics on every process
    (the SPMD replication contract) and (b) match the single-process
    8-device run of the same workload — same global batches, so train
    loss agrees to float-reduction tolerance, the integer eval counts
    exactly, and the saved checkpoints leaf-by-leaf within Adam-update
    drift. Exercises parallel/distributed.py's coordinator bootstrap,
    make_global_batch, and global_eval_reduce with process_count == 2
    (everything the single-process degenerate tests above cannot)."""
    import socket
    import subprocess
    import sys

    yaml_path = _write_dist_dataset(tmp_path / "ds")
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = __import__("pathlib").Path(__file__).resolve().parent.parent
    base = [sys.executable, str(repo / "train.py"), str(yaml_path),
            "--epochs", "2", "--size", "n", "--img-size", "64",
            "--lr", "1e-3", "--seed", "3"]

    def dist_cmd(pid, workdir):
        return subprocess.Popen(
            base + ["--batch-size", "4", "--distributed",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2", "--process-id", str(pid)],
            cwd=workdir, env=_cli_env(4), text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    d0 = tmp_path / "p0"
    d1 = tmp_path / "p1"
    d0.mkdir(), d1.mkdir()
    (tmp_path / "single").mkdir()
    procs = [dist_cmd(0, d0), dist_cmd(1, d1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "Distributed: process" in out
    e0, e1 = _parse_epochs(outs[0]), _parse_epochs(outs[1])
    assert len(e0) == 2 and len(e1) == 2, (outs[0][-2000:], outs[1][-2000:])
    # (a) every process prints the same GLOBAL metrics — the loss is the
    # replicated output of one SPMD program, the eval counts pass through
    # the same global_eval_reduce sum on both sides
    assert e0 == e1

    single = subprocess.run(
        base + ["--batch-size", "8", "--data-parallel"],
        cwd=tmp_path / "single", env=_cli_env(8), text=True, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert single.returncode == 0, single.stdout[-3000:]
    es = _parse_epochs(single.stdout)
    assert len(es) == 2
    for (dist, sing) in zip(e0, es):
        # train + val losses: same global batch sets, different reduction
        # grouping -> tight but not exact
        for a, b in zip(dist[1:6], sing[1:6]):
            assert a == pytest.approx(b, rel=2e-3, abs=2e-3)
        # grid-metric P/R/F1 percentages come from integer global counts
        assert dist[6:] == pytest.approx(sing[6:], abs=0.1)

    # (c) checkpoints: process 0's saved params equal the single-process
    # run's, leaf-by-leaf, within the theoretical Adam drift bound
    # (2 steps x ~2x lr, the test_multistep.py bound)
    from yolo_from_scratch_tpu.utils.checkpoint import load_checkpoint

    ck_d = next(d0.glob("yolo_*.ckpt"))
    ck_s = next((tmp_path / "single").glob("yolo_*.ckpt"))
    assert not list(d1.glob("yolo_*.ckpt")), \
        "only process 0 may write checkpoints"
    vd, _, _ = load_checkpoint(str(ck_d))
    vs, _, _ = load_checkpoint(str(ck_s))
    for a, b in zip(jax.tree.leaves(vd["params"]),
                    jax.tree.leaves(vs["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-3)


def test_sharded_eval_counts_sum_to_global(temp_dataset_multiclass):
    """The multi-host eval contract: each process counts its wrap-padded
    loader shard (_eval_counts), the five scalars are summed
    (global_eval_reduce math), and the result equals the unsharded
    single-process eval — here simulated with pc=2 shard loaders on one
    process, where the 4-image dataset divides evenly so equality is
    exact."""
    from yolo_from_scratch_tpu.config import YoloConfig
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.train.loop import _eval_counts, eval_epoch
    from yolo_from_scratch_tpu.train.metrics import prf1
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_eval_step,
    )

    cfg = YoloConfig(num_classes=3, img_size=64, width_mult=0.25,
                     depth_mult=0.33)
    model, _, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3,
                                         batch_size=1)
    eval_step = make_eval_step(model, cfg)
    # 4 images: pc=2 divides the dataset, so no wrap-pad duplicates and
    # the sharded-vs-global equality is exact
    ds = YoloDataset(str(temp_dataset_multiclass / "train" / "images"),
                     cfg.num_classes, cfg.anchors_array, cfg.img_size)

    # batch_size=1: per-batch loss is then per-image, so the mean over
    # batch losses is partition-invariant and the equality is exact (at
    # batch>1 the masked per-batch means depend on batch composition,
    # which sharding changes — same effect for the unsharded loader)
    mk = lambda shard: DataLoader(ds, batch_size=1, shuffle=False,
                                  prefetch=0, process_shard=shard)
    # unsharded reference
    loss_g, p_g, r_g, f1_g = eval_epoch(
        eval_step, state.params, state.batch_stats, mk(None))
    # two simulated process shards, summed like global_eval_reduce does
    tot = np.zeros(5)
    for pi in range(2):
        losses, tp, fp, fn = _eval_counts(
            eval_step, state.params, state.batch_stats, mk((pi, 2)))
        tot += [tp, fp, fn, float(np.sum(losses)), len(losses)]
    p, r, f1 = prf1(int(tot[0]), int(tot[1]), int(tot[2]))
    assert (p, r, f1) == (p_g, r_g, f1_g)
    assert abs(tot[3] / tot[4] - loss_g) < 1e-6
