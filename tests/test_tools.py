"""Tooling tests: roofline analyzer + synthetic dataset generator."""

import numpy as np

from yolo_from_scratch_tpu.config import YoloConfig


def test_roofline_extracts_convs():
    from yolo_from_scratch_tpu.utils.roofline import (
        forward_conv_costs,
        summarize,
    )

    cfg = YoloConfig(num_classes=1, img_size=128, width_mult=0.25,
                     compute_dtype="bfloat16")
    convs, other_bytes = forward_conv_costs(cfg, batch=2)
    # the nano graph has dozens of convs; every cost positive
    assert len(convs) > 30
    assert all(c.flops > 0 and c.bytes_io > 0 for c in convs)
    assert other_bytes > 0  # SPPF maxpools + FPN upsamples at least

    s = summarize(cfg, batch=2, measured_img_s=100.0)
    assert s["fwd_t_min_ms"] >= s["fwd_flops"] / 197e12 * 1e3 - 1e-9
    assert s["train_flops"] == 3.0 * s["fwd_flops"]
    assert 0 < s["mfu"] < 1
    assert s["roofline_img_s"] > 0


def test_roofline_flops_match_analytic_stem():
    """The first extracted conv must be the stem: 3x3 stride-2 on RGB."""
    from yolo_from_scratch_tpu.utils.roofline import forward_conv_costs

    cfg = YoloConfig(num_classes=1, img_size=128, width_mult=0.25)
    convs, _ = forward_conv_costs(cfg, batch=1)
    stem = convs[0]
    assert stem.kernel_shape[:3] == (3, 3, 3)
    out_elems = int(np.prod(stem.out_shape))
    assert stem.flops == 2.0 * out_elems * 9 * 3


def test_synth_dataset_trains_and_loads(tmp_path):
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.utils.synth import make_dataset

    yaml_path = make_dataset(tmp_path / "ds", n_train=3, n_val=2,
                             img_size=128, num_classes=3, n_min=2, n_max=2)
    assert yaml_path.exists()
    ds = YoloDataset(str(tmp_path / "ds" / "train" / "images"), 3,
                     img_size=128)
    assert len(ds) == 3
    img, targets = ds[0]
    assert img.shape == (128, 128, 3)
    assert sum(float(t[..., 4].sum()) for t in targets) == 2.0


def test_synth_small_object_range(tmp_path):
    from yolo_from_scratch_tpu.utils.synth import make_dataset

    make_dataset(tmp_path / "small", n_train=2, n_val=1, img_size=256,
                 box_range=(0.015, 0.06), n_min=3, n_max=3)
    rows = (tmp_path / "small" / "train" / "labels" / "0000.txt").read_text()
    for line in rows.strip().split("\n"):
        _, _, _, w, h = (float(v) for v in line.split())
        assert 0.015 <= w <= 0.06 and 0.015 <= h <= 0.06


def test_synth_distractors_unlabeled_and_guarded(tmp_path):
    import numpy as np

    from yolo_from_scratch_tpu.utils.synth import (
        N_SHAPES,
        N_TEXTURES,
        make_image,
    )

    rng = np.random.default_rng(0)
    # distractors draw pixels but never label rows
    for _ in range(10):
        _, rows = make_image(rng, 192, 2, 2, num_classes=5,
                             box_range=(0.1, 0.25), class_mode="shape",
                             n_distract=3)
        assert len(rows) <= 2
        assert all(0 <= c < 5 for c, *_ in rows)
    import pytest

    with pytest.raises(ValueError, match="shape"):
        make_image(rng, 128, 1, 1, num_classes=1, class_mode="color",
                   n_distract=1)
    with pytest.raises(ValueError, match="free"):
        make_image(rng, 128, 1, 1, num_classes=N_SHAPES * N_TEXTURES,
                   class_mode="shape", n_distract=1)


def test_ici_dp_projection_model():
    """The DP scaling projection: ring all-reduce wire volume, monotone
    efficiency, and consistency with hand math at N=8."""
    from yolo_from_scratch_tpu.utils.roofline import (
        V5E_ICI_ONEWAY_BW,
        ici_dp_projection,
        param_bytes,
    )

    cfg = YoloConfig(num_classes=1, img_size=128, width_mult=0.25,
                     compute_dtype="bfloat16")
    pb = param_bytes(cfg)
    assert pb > 1e6  # nano is ~1.9M params fp32

    rows = ici_dp_projection(cfg, batch_per_chip=4, n_chips=(2, 8, 256),
                             measured_step_ms=10.0)
    by_n = {r["n_chips"]: r for r in rows}
    # ring all-reduce: each chip moves 2*(N-1)/N * G bytes
    r8 = by_n[8]
    expect_wire = 2.0 * 7 / 8 * pb
    assert abs(r8["wire_mb_per_chip"] - expect_wire / 1e6) < 1e-6
    expect_comm = expect_wire / (2 * V5E_ICI_ONEWAY_BW)
    assert abs(r8["t_comm_ms"] - expect_comm * 1e3) < 1e-9
    # wire volume (hence comm time) grows with N; efficiency shrinks
    assert by_n[2]["t_comm_ms"] < by_n[8]["t_comm_ms"] < by_n[256]["t_comm_ms"]
    assert by_n[2]["eff_no_overlap"] > by_n[256]["eff_no_overlap"]
    # overlapped efficiency is an upper bound on no-overlap
    for r in rows:
        assert r["eff_full_overlap"] >= r["eff_no_overlap"]
        assert 0 < r["eff_no_overlap"] <= 1
    # bf16 grads halve the wire bytes
    half = ici_dp_projection(cfg, 4, (8,), measured_step_ms=10.0,
                             grad_dtype_bytes=2)[0]
    assert abs(half["wire_mb_per_chip"] - r8["wire_mb_per_chip"] / 2) < 1e-9
    # a second torus axis halves comm time
    two_ax = ici_dp_projection(cfg, 4, (8,), measured_step_ms=10.0,
                               ici_axes=2)[0]
    assert abs(two_ax["t_comm_ms"] - r8["t_comm_ms"] / 2) < 1e-9


def test_shape_mode_classes_are_color_invariant():
    """Shape/texture-coded classes (VERDICT r2 #5): the class signal must
    be structural — same class under different colors has an identical
    two-tone pattern; different classes differ structurally."""
    from yolo_from_scratch_tpu.utils.synth import (
        N_SHAPES,
        N_TEXTURES,
        render_class_patch,
    )

    h = w = 48

    def structure(c, color):
        patch, mask = render_class_patch(c, h, w, color)
        g = patch.mean(axis=-1)
        g = (g - g.min()) / max(g.max() - g.min(), 1e-9)  # tone-normalize
        return np.where(mask, np.round(g, 3), -1.0)

    # color invariance: identical normalized structure under any color
    for c in (0, 7, 33, 79):
        np.testing.assert_array_equal(
            structure(c, (255, 40, 40)), structure(c, (60, 220, 130)))

    # distinguishability: all 80 class structures pairwise distinct
    sigs = {}
    for c in range(N_SHAPES * N_TEXTURES):
        sigs[c] = structure(c, (200, 200, 200)).tobytes()
    assert len(set(sigs.values())) == 80


def test_shape_mode_dataset_roundtrip(tmp_path):
    from yolo_from_scratch_tpu.utils.synth import make_dataset

    import pytest

    yml = make_dataset(tmp_path / "d", n_train=4, n_val=2, img_size=96,
                       seed=0, num_classes=80, class_mode="shape")
    assert yml.exists()
    labels = sorted((tmp_path / "d" / "train" / "labels").glob("*.txt"))
    assert len(labels) == 4
    rows = [ln.split() for p in labels for ln in p.read_text().splitlines()]
    assert rows and all(0 <= int(r[0]) < 80 for r in rows)
    with pytest.raises(ValueError):
        make_dataset(tmp_path / "d2", 1, 1, 96, num_classes=81,
                     class_mode="shape")
