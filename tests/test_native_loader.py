"""Native C++ loader (libyolodata.so) vs the PIL reference path."""

import numpy as np
import pytest

from yolo_from_scratch_tpu import native
from yolo_from_scratch_tpu.data.dataset import YoloDataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


def test_batch_decode_shapes(temp_dataset_dir, img_size):
    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=img_size, backend="native")
    imgs, targets = ds.load_batch([0, 1, 2])
    assert imgs.shape == (3, img_size, img_size, 3)
    assert imgs.dtype == np.float32
    assert 0.0 <= imgs.min() and imgs.max() <= 1.0
    for t, gs in zip(targets, ds.grid_sizes):
        assert t.shape == (3, gs, gs, 3, 6)


def test_native_matches_pil_geometry(temp_dataset_dir, img_size):
    """Same-size images (no resample): native must be bit-identical to PIL;
    targets identical in all cases (geometry is shared integer math)."""
    pil = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                      img_size=img_size, backend="pil")
    nat = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                      img_size=img_size, backend="native")
    imgs_p, tgts_p = pil.load_batch([0, 1])
    imgs_n, tgts_n = nat.load_batch([0, 1])
    # conftest images are exactly img_size x img_size -> scale 1, no resample
    np.testing.assert_allclose(imgs_n, imgs_p, atol=1e-6)
    for a, b in zip(tgts_n, tgts_p):
        np.testing.assert_array_equal(a, b)


def test_native_resize_close_to_pil(tmp_path, img_size):
    """With resampling, the native bilinear and PIL's filter differ but
    must stay visually identical (small mean abs diff)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    arr = (rng.random((97, 211, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "images" / "a.png")  # png: lossless
    (tmp_path / "labels" / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")

    pil = YoloDataset(str(tmp_path / "images"), 1, img_size=img_size,
                      backend="pil")
    nat = YoloDataset(str(tmp_path / "images"), 1, img_size=img_size,
                      backend="native")
    img_p, _ = pil.load_batch([0])
    img_n, _ = nat.load_batch([0])
    assert np.abs(img_n - img_p).mean() < 0.02


def test_missing_file_failure_isolated(temp_dataset_dir, img_size):
    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=img_size, backend="native")
    imgs, scales, pts, pls, fails = native.decode_letterbox_batch(
        [ds.imgs[0], "/nonexistent/file.jpg"], img_size
    )
    assert fails == 1
    assert scales[1] == 0.0
    assert scales[0] > 0.0
    # good slot decoded fine
    assert imgs[0].max() > 0.2
