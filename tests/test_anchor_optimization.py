"""K-means anchor optimization tests (port of reference
tests/test_anchor_optimization.py invariants)."""

import numpy as np
import pytest
import yaml
from PIL import Image

from yolo_from_scratch_tpu.utils.anchors import (
    collect_dataset_wh,
    compute_optimal_anchors,
    kmeans,
)


@pytest.fixture(scope="module")
def clustered_dataset(tmp_path_factory):
    """10 images whose boxes form 3 clear size clusters."""
    root = tmp_path_factory.mktemp("anchor_ds")
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    sizes = [(0.05, 0.06), (0.2, 0.22), (0.5, 0.55)]  # small/med/large
    for i in range(10):
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(root / "train" / "images" / f"{i}.jpg")
        lines = []
        for w0, h0 in sizes:
            w = w0 * rng.uniform(0.9, 1.1)
            h = h0 * rng.uniform(0.9, 1.1)
            lines.append(f"0 0.5 0.5 {w:.6f} {h:.6f}")
        (root / "train" / "labels" / f"{i}.txt").write_text("\n".join(lines))
    cfg = {"nc": 1, "names": ["x"], "train": str(root / "train" / "images"),
           "val": str(root / "train" / "images")}
    p = root / "data.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    return p


def test_collect_dataset_wh(clustered_dataset):
    wh, files = collect_dataset_wh(clustered_dataset, img_size=640)
    assert wh.shape == (30, 2)
    assert len(files) == 10
    assert (wh > 0).all()


def test_kmeans_three_clusters():
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.normal((10, 10), 0.5, (50, 2)),
        rng.normal((50, 50), 0.5, (50, 2)),
        rng.normal((200, 100), 0.5, (50, 2)),
    ]).astype(np.float32)
    centers = kmeans(pts, 3)
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0], [10, 10], atol=1.0)
    np.testing.assert_allclose(centers[1], [50, 50], atol=1.0)
    np.testing.assert_allclose(centers[2], [200, 100], atol=1.0)


def test_anchor_structure_and_ordering(clustered_dataset, capsys):
    result = compute_optimal_anchors(clustered_dataset, img_size=640)
    assert result is not None
    p3, p4, p5 = result
    assert len(p3) == len(p4) == len(p5) == 3
    # integer rounding
    for s in result:
        for w, h in s:
            assert isinstance(w, int) and isinstance(h, int)
    # area-sorted split: every P3 anchor smaller than every P5 anchor
    area = lambda s: [w * h for w, h in s]
    assert max(area(p3)) <= min(area(p5))
    out = capsys.readouterr().out
    assert "Recommended anchor configuration" in out


def test_anchor_scaling_with_img_size(clustered_dataset):
    a640 = compute_optimal_anchors(clustered_dataset, img_size=640)
    a1280 = compute_optimal_anchors(clustered_dataset, img_size=1280)
    # anchors scale ~2x with resolution (reference allows 1.4-2.6x band)
    m640 = np.mean([w * h for s in a640 for w, h in s])
    m1280 = np.mean([w * h for s in a1280 for w, h in s])
    ratio = np.sqrt(m1280 / m640)
    assert 1.4 <= ratio <= 2.6


def test_no_boxes_returns_none(tmp_path, capsys):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    p = tmp_path / "empty.yaml"
    yaml.safe_dump({"nc": 1, "train": str(tmp_path / "images"),
                    "val": str(tmp_path / "images")}, open(p, "w"))
    assert compute_optimal_anchors(p) is None
    assert "ERROR: No boxes found" in capsys.readouterr().out
