"""Headless tests for the interactive viewer's frame composition
(reference eval.py:176-212: info panel + legend)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cv2 = pytest.importorskip("cv2")

from eval import (  # noqa: E402
    GT_COLOR,
    LEGEND_HEIGHT,
    PANEL_HEIGHT,
    PRED_COLOR,
    compose_frame,
    load_ground_truth,
)


def _frame():
    img = np.zeros((240, 320, 3), np.uint8)
    gt = [(0, 50.0, 50.0, 120.0, 120.0)]
    dets = [(60.0, 60.0, 130.0, 130.0, 0.87, 0)]
    return compose_frame(img, gt, dets, ["cone"], idx=2, total=10,
                         split="val", filename="x.jpg")


def test_frame_has_panel_and_legend():
    frame = _frame()
    assert frame.shape == (240 + PANEL_HEIGHT + LEGEND_HEIGHT, 320, 3)
    # panel and legend are the dark-gray background where not drawn on
    assert (frame[0, 0] == 40).all()
    assert (frame[-1, -1] == 40).all()


def test_legend_has_both_colors():
    frame = _frame()
    legend = frame[-LEGEND_HEIGHT:]
    assert (legend == np.array(GT_COLOR, np.uint8)).all(axis=-1).any()
    assert (legend == np.array(PRED_COLOR, np.uint8)).all(axis=-1).any()


def test_panel_contains_text_pixels():
    frame = _frame()
    panel = frame[:PANEL_HEIGHT]
    assert (panel == 255).all(axis=-1).any()  # white info text


def test_boxes_drawn_in_image_region():
    frame = _frame()
    body = frame[PANEL_HEIGHT:-LEGEND_HEIGHT]
    assert (body == np.array(GT_COLOR, np.uint8)).all(axis=-1).any()
    assert (body == np.array(PRED_COLOR, np.uint8)).all(axis=-1).any()


def test_load_ground_truth_scaling(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("1 0.5 0.5 0.5 0.5\n")
    boxes = load_ground_truth(p, 200, 100)
    assert boxes == [(1, 50.0, 25.0, 150.0, 75.0)]
