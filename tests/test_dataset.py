"""Dataset + target-assignment tests (port of reference tests/test_dataset.py)."""

import numpy as np
import pytest

from yolo_from_scratch_tpu.config import DEFAULT_ANCHORS
from yolo_from_scratch_tpu.data.dataset import (
    YoloDataset,
    assign_targets,
    parse_label_file,
)
from yolo_from_scratch_tpu.data.letterbox import (
    letterbox_image,
    letterbox_params,
)
from yolo_from_scratch_tpu.data.loader import DataLoader

ANCHORS = np.asarray(DEFAULT_ANCHORS, np.float32)


@pytest.fixture(scope="module")
def dataset(temp_dataset_dir, img_size):
    return YoloDataset(
        str(temp_dataset_dir / "train" / "images"), num_classes=1,
        img_size=img_size,
    )


def test_dataset_length(dataset):
    assert len(dataset) == 5


def test_dataset_grid_sizes(dataset, img_size):
    assert dataset.grid_sizes == [img_size // 8, img_size // 16, img_size // 32]


def test_getitem_shapes(dataset, img_size):
    img, targets = dataset[0]
    assert img.shape == (img_size, img_size, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    for t, gs in zip(targets, dataset.grid_sizes):
        assert t.shape == (gs, gs, 3, 6)


def test_getitem_assigns_at_least_one_object(dataset):
    _, targets = dataset[0]
    total_obj = sum(t[..., 4].sum() for t in targets)
    assert total_obj >= 1


def test_label_path_derivation(temp_dataset_dir, dataset):
    assert "labels" in dataset.labels[0]
    assert dataset.labels[0].endswith(".txt")


def test_parse_label_skips_malformed(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("0 0.5 0.5 0.1 0.1\nnot a box\n1 0.2 0.2 0.05\n")
    rows = parse_label_file(p)
    assert rows.shape == (1, 5)


def test_parse_label_missing_file(tmp_path):
    assert parse_label_file(tmp_path / "nope.txt").shape == (0, 5)


@pytest.mark.parametrize("img_size", [416, 512, 640])
def test_target_shapes_at_sizes(img_size):
    boxes = np.array([[0.5, 0.5, 0.1, 0.1]], np.float32)
    targets = assign_targets(boxes, np.array([0]), ANCHORS, img_size, 1)
    for t, s in zip(targets, (8, 16, 32)):
        assert t.shape == (img_size // s, img_size // s, 3, 6)


def test_assignment_best_anchor_exact_match():
    # a box exactly matching anchor P4[0] = (30, 61) at 640 -> scale 1, anchor 0
    boxes = np.array([[0.5, 0.5, 30 / 640, 61 / 640]], np.float32)
    targets = assign_targets(boxes, np.array([0]), ANCHORS, 640, 1)
    assert targets[1][20, 20, 0, 4] == 1.0
    assert targets[0][..., 4].sum() == 0
    assert targets[2][..., 4].sum() == 0


def test_assignment_small_vs_large_objects_split_scales():
    boxes = np.array(
        [[0.25, 0.25, 12 / 640, 14 / 640],  # tiny -> P3
         [0.75, 0.75, 350 / 640, 320 / 640]],  # huge -> P5
        np.float32,
    )
    targets = assign_targets(boxes, np.array([0, 0]), ANCHORS, 640, 1)
    assert targets[0][..., 4].sum() == 1.0
    assert targets[2][..., 4].sum() == 1.0


def test_assignment_first_gt_wins_slot():
    # two identical boxes land in the same (cell, anchor); only first kept
    boxes = np.array(
        [[0.5, 0.5, 0.1, 0.1], [0.505, 0.505, 0.1, 0.1]], np.float32
    )
    targets = assign_targets(boxes, np.array([0, 0]), ANCHORS, 640, 1)
    total = sum(t[..., 4].sum() for t in targets)
    assert total == 1.0
    # and the stored coords are the FIRST box's
    s = next(i for i, t in enumerate(targets) if t[..., 4].sum() > 0)
    t = targets[s]
    iy, ix, ia = np.argwhere(t[..., 4] == 1.0)[0]
    np.testing.assert_allclose(t[iy, ix, ia, 0:4], boxes[0], atol=1e-6)


def test_assignment_grid_cell_clamped():
    boxes = np.array([[0.999, 0.999, 0.05, 0.05]], np.float32)
    targets = assign_targets(boxes, np.array([0]), ANCHORS, 640, 1)
    assert sum(t[..., 4].sum() for t in targets) == 1.0  # no index error


def test_assignment_multiclass_one_hot():
    boxes = np.array([[0.5, 0.5, 0.1, 0.1]], np.float32)
    targets = assign_targets(boxes, np.array([2]), ANCHORS, 640, 4)
    s = next(i for i, t in enumerate(targets) if t[..., 4].sum() > 0)
    t = targets[s]
    iy, ix, ia = np.argwhere(t[..., 4] == 1.0)[0]
    cls_vec = t[iy, ix, ia, 5:]
    assert cls_vec[2] == 1.0 and cls_vec.sum() == 1.0


def test_assignment_nc1_class_channel():
    boxes = np.array([[0.5, 0.5, 0.1, 0.1]], np.float32)
    targets = assign_targets(boxes, np.array([0]), ANCHORS, 640, 1)
    s = next(i for i, t in enumerate(targets) if t[..., 4].sum() > 0)
    t = targets[s]
    iy, ix, ia = np.argwhere(t[..., 4] == 1.0)[0]
    assert t[iy, ix, ia, 5] == 1.0


# ---------------- letterbox ----------------


def test_letterbox_params_landscape():
    scale, pad_top, pad_left, new_w, new_h = letterbox_params(200, 100, 128)
    assert scale == pytest.approx(0.64)
    assert new_w == 128 and new_h == 64
    assert pad_left == 0 and pad_top == 32


def test_letterbox_image_square_output(temp_dataset_dir):
    from PIL import Image

    p = next((temp_dataset_dir / "train" / "images").glob("*.jpg"))
    img, scale, pad_top, pad_left = letterbox_image(Image.open(p), 96)
    assert img.shape == (96, 96, 3)


def test_letterbox_pad_color():
    from PIL import Image

    pil = Image.new("RGB", (100, 50), (0, 0, 0))
    img, _, pad_top, _ = letterbox_image(pil, 128)
    assert pad_top > 0
    np.testing.assert_array_equal(img[0, 0], [114, 114, 114])


def test_letterbox_device_matches_host_geometry():
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.data.letterbox import letterbox_device

    rng = np.random.default_rng(0)
    arr = (rng.random((50, 100, 3)) * 255).astype(np.uint8)
    out = np.asarray(letterbox_device(jnp.asarray(arr), 100, 50, 128))
    assert out.shape == (128, 128, 3)
    # pad rows are the gray color
    np.testing.assert_allclose(out[0, 0], np.array([114, 114, 114]) / 255.0,
                               atol=1e-6)
    # content area is inside the same pad offsets as the host path
    _, pad_top, pad_left, new_w, new_h = letterbox_params(100, 50, 128)
    assert not np.allclose(out[pad_top + new_h // 2, 64],
                           np.array([114, 114, 114]) / 255.0)


# ---------------- loader ----------------


def test_loader_batch_shapes(dataset, img_size):
    loader = DataLoader(dataset, batch_size=2, prefetch=0)
    images, targets = next(iter(loader))
    assert images.shape == (2, img_size, img_size, 3)
    for t, gs in zip(targets, dataset.grid_sizes):
        assert t.shape == (2, gs, gs, 3, 6)


def test_loader_covers_dataset_with_partial_batch(dataset):
    loader = DataLoader(dataset, batch_size=2, prefetch=0)
    sizes = [img.shape[0] for img, _ in loader]
    assert sum(sizes) == len(dataset)
    assert sizes[-1] == 1  # 5 = 2+2+1


def test_loader_prefetch_equals_sync(dataset):
    sync = list(DataLoader(dataset, batch_size=2, prefetch=0))
    pre = list(DataLoader(dataset, batch_size=2, prefetch=2))
    assert len(sync) == len(pre)
    np.testing.assert_allclose(sync[0][0], pre[0][0])


def test_loader_shuffle_deterministic_by_seed(dataset):
    a = [img.sum() for img, _ in DataLoader(dataset, 2, shuffle=True, seed=1,
                                            prefetch=0)]
    b = [img.sum() for img, _ in DataLoader(dataset, 2, shuffle=True, seed=1,
                                            prefetch=0)]
    np.testing.assert_allclose(a, b)


def test_loader_early_abandon_no_thread_leak(dataset):
    import threading

    before = threading.active_count()
    for _ in range(3):
        it = iter(DataLoader(dataset, batch_size=1, prefetch=2))
        next(it)
        del it  # abandon mid-iteration
    import gc, time

    gc.collect()
    time.sleep(0.5)
    # producer threads must have exited (allow slack for unrelated threads)
    assert threading.active_count() <= before + 1


def test_letterbox_device_staging_buffer():
    """Content smaller than the staging buffer letterboxes by its REAL dims."""
    import jax.numpy as jnp

    from yolo_from_scratch_tpu.data.letterbox import letterbox_device

    rng = np.random.default_rng(1)
    buf = np.zeros((256, 256, 3), np.uint8)
    content = (rng.random((50, 100, 3)) * 255).astype(np.uint8)
    buf[:50, :100] = content
    out = np.asarray(letterbox_device(jnp.asarray(buf), 100, 50, 128))
    direct = np.asarray(letterbox_device(jnp.asarray(content), 100, 50, 128))
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_loader_slow_consumer_terminates(dataset):
    """End-of-epoch sentinel must arrive even when the queue is full
    (regression: sentinel was dropped with put_nowait, hanging the epoch)."""
    import time

    loader = DataLoader(dataset, batch_size=1, prefetch=1)
    count = 0
    for _ in loader:
        time.sleep(0.15)  # consumer slower than producer -> queue stays full
        count += 1
    assert count == len(dataset)


def test_loader_producer_exception_propagates(dataset, tmp_path):
    """A corrupt image must raise in the consumer, not silently truncate
    the epoch."""
    import shutil

    broken_dir = tmp_path / "images"
    broken_dir.mkdir()
    (tmp_path / "labels").mkdir()
    shutil.copy(dataset.imgs[0], broken_dir / "ok.jpg")
    (broken_dir / "zz_corrupt.jpg").write_bytes(b"\xff\xd8not a real jpeg")
    ds = YoloDataset(str(broken_dir), 1, img_size=dataset.img_size,
                     backend="pil")
    with pytest.raises(Exception):
        list(DataLoader(ds, batch_size=1, prefetch=2))


# ---------------- augmentation ----------------


def test_augment_flip_mirrors_boxes():
    from yolo_from_scratch_tpu.data.dataset import augment_image_and_boxes

    img = np.zeros((8, 8, 3), np.float32)
    img[:, 0] = 1.0  # bright left column
    boxes = np.array([[0.2, 0.5, 0.1, 0.1]], np.float32)

    class FlipRng:  # force the flip branch, no jitter
        def random(self):
            return 0.0

        def uniform(self, a, b):
            return 1.0 if a < 1.0 < b else 0.0

    out_img, out_boxes = augment_image_and_boxes(img, boxes, FlipRng())
    assert out_img[:, -1].sum() > 0  # bright column moved to the right
    assert out_boxes[0, 0] == pytest.approx(0.8)
    assert out_boxes[0, 1] == pytest.approx(0.5)  # y untouched


def test_augment_dataset_targets_consistent(temp_dataset_dir, img_size):
    """Augmented samples still produce valid dense targets (boxes stay in
    range, objects stay assigned)."""
    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=img_size, augment=True, seed=3)
    for idx in range(len(ds)):
        img, targets = ds[idx]
        assert 0.0 <= img.min() and img.max() <= 1.0
        total = sum(t[..., 4].sum() for t in targets)
        assert total >= 1
        for t in targets:
            assigned = t[t[..., 4] == 1.0]
            if len(assigned):
                assert (assigned[:, 0] >= 0).all() and (assigned[:, 0] <= 1).all()


def test_augment_off_is_deterministic(temp_dataset_dir, img_size):
    a = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                    img_size=img_size)[0][0]
    b = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                    img_size=img_size)[0][0]
    np.testing.assert_array_equal(a, b)


def test_mosaic_box_mapping():
    from yolo_from_scratch_tpu.data.dataset import mosaic_4

    s = 64
    samples = []
    for v in range(4):
        img = np.full((s, s, 3), v / 4.0, np.float32)
        boxes = np.array([[0.5, 0.5, 0.5, 0.5]], np.float32)
        samples.append((img, boxes, np.array([v])))

    class FixedRng:
        def uniform(self, a, b):
            return 0.5  # center exactly in the middle

    img, boxes, classes = mosaic_4(samples, FixedRng())
    assert img.shape == (s, s, 3)
    assert len(boxes) == 4
    # quadrant 0 (top-left): box (0.5, 0.5, 0.5, 0.5) maps to
    # (0.25, 0.25, 0.25, 0.25)
    np.testing.assert_allclose(boxes[0], [0.25, 0.25, 0.25, 0.25], atol=1e-6)
    # quadrant 3 (bottom-right): (0.75, 0.75, 0.25, 0.25)
    np.testing.assert_allclose(boxes[3], [0.75, 0.75, 0.25, 0.25], atol=1e-6)
    assert classes.tolist() == [0, 1, 2, 3]
    # quadrant pixel content placed correctly
    assert img[:32, :32].mean() == pytest.approx(0.0, abs=1e-6)
    assert img[32:, 32:].mean() == pytest.approx(0.75, abs=1e-6)


def test_mosaic_drops_degenerate_boxes():
    from yolo_from_scratch_tpu.data.dataset import mosaic_4

    s = 64
    tiny = np.array([[0.5, 0.5, 0.001, 0.001]], np.float32)
    samples = [
        (np.zeros((s, s, 3), np.float32), tiny, np.array([0]))
        for _ in range(4)
    ]

    class FixedRng:
        def uniform(self, a, b):
            return 0.5

    _, boxes, classes = mosaic_4(samples, FixedRng())
    assert len(boxes) == 0 and len(classes) == 0


def test_mosaic_through_dataset(temp_dataset_dir, img_size):
    """Augmented dataset with mosaic produces valid images and targets."""
    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=img_size, augment=True, seed=123)
    saw_obj = 0
    for idx in range(len(ds)):
        img, targets = ds[idx]
        assert img.shape == (img_size, img_size, 3)
        assert np.isfinite(img).all()
        saw_obj += sum(t[..., 4].sum() for t in targets)
        for t in targets:
            assigned = t[t[..., 4] == 1.0]
            if len(assigned):
                assert (assigned[:, 0:4] >= 0).all()
                assert (assigned[:, 0:2] <= 1).all()
    assert saw_obj >= len(ds)  # objects survive mosaic on average
