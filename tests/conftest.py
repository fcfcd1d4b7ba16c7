"""Shared fixtures.

Test discipline mirrors the reference suite (reference: tests/conftest.py):
tmpdir synthetic datasets, small deterministic fixtures — plus the TPU-
framework equivalents: a virtual 8-device CPU mesh for sharding tests and
jit-vs-reference numerical parity.

Everything runs on the CPU backend (forced before first jax use; the axon
TPU plugin in this image would otherwise grab the backend) with 8 virtual
devices for mesh tests.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
# NOTE: --xla_backend_optimization_level=0 was tried here to cut compile
# time; it halves compile-bound tests but slows execution-bound ones (the
# scanned-multi-step convergence test regressed 4x), so it is applied only
# to the compile-dominated CLI subprocess tests (test_cli.run_cli).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest
import yaml
from PIL import Image

from yolo_from_scratch_tpu.config import YoloConfig

# small, fast defaults for the single-core CI box
TEST_IMG_SIZE = 128
TEST_BATCH = 2

# ---------------------------------------------------------------------------
# Quick tier: tests measured >=15s call time on the 1-core host (compile-
# dominated) carry the `slow` marker; `pytest -m "not slow"` runs the rest
# in ~10 min instead of ~44. Regenerate after big suite changes with
#   python -m pytest tests/ -q --durations=0 2>&1 \
#     | awk '$1+0>=15 && $2=="call" {print $3}' | sed 's/\[.*\]//' | sort -u
# (parametrized cases inherit the base id's marker).
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    # round-5 re-measure (quick tier had crept 10 -> 16+ min; VERDICT r4
    # #7): every case >=15s call time moves to the slow tier
    "tests/test_multistep.py::test_multi_step_uint8_staging_matches_f32",
    "tests/test_size_variants.py::test_tp_train_step_matches_single_device_at_l_width",
    "tests/test_size_variants.py::test_tp_sharded_fraction_rises_with_width",
    "tests/test_packed_p3.py::test_gradients_match",
    "tests/test_resume.py::test_resume_restores_params_opt_state_epoch",
    "tests/test_training.py::test_loss_decreases_over_steps",
    "tests/test_sparse_loss.py::test_sparse_gradients_match_dense",
    "tests/test_sparse_loss.py::test_sparse_matches_dense",
    "tests/test_quantize.py::test_quant_packed_p3_matches_unpacked_int8",
    "tests/test_quantize.py::test_quant_anchor_free_head",
    "tests/test_quantize.py::test_quant_forward_close_at_probability_level",
    "tests/test_model.py::test_param_count_s_variant_band",
    "tests/test_model.py::test_forward_other_resolutions",
    "tests/test_map.py::test_evaluate_map_batched_matches_single",
    "tests/test_inference.py::test_uint8_ingress_matches_f32",
    "tests/test_inference.py::test_predict_conf_threshold_monotone",
    "tests/test_configs.py::test_config3_coco80_head_and_predict",
    "tests/test_configs.py::test_config2_416_multiclass_shapes",
    "tests/test_anchor_free.py::test_af_compact_train_step_runs",
    "tests/test_anchor_free.py::test_loss_finite_and_grads",
    "tests/test_anchor_free.py::test_train_step_anchor_free",
    "tests/test_assign_device.py::test_compact_trainer_matches_dense",
    "tests/test_assign_device.py::test_streaming_compact_path_on_2d_mesh",
    "tests/test_augment_device.py::test_train_step_with_device_augment",
    "tests/test_cli.py::test_compact_mosaic_flag_guards",
    "tests/test_cli.py::test_compact_targets_train_with_mosaic",
    "tests/test_cli.py::test_packed_stem_train_eval_roundtrip",
    "tests/test_cli.py::test_val_det_epoch_metric",
    "tests/test_configs.py::test_jit_vs_eager_loss_parity",
    "tests/test_convergence.py::test_model_learns_to_detect",
    "tests/test_ema.py::test_ema_inside_jit_with_train_step",
    "tests/test_ema.py::test_fit_with_ema_saves_averaged_params",
    "tests/test_export.py::test_artifact_matches_live_predictor",
    "tests/test_export.py::test_int8_artifact_roundtrip",
    "tests/test_grad_accum.py::test_accum_grads_match_big_batch",
    "tests/test_grad_accum.py::test_accum_step_counts_once",
    "tests/test_loss.py::test_loss_gradients_flow_through_all_channels",
    "tests/test_model.py::test_bfloat16_compute_path",
    "tests/test_mosaic_device.py::test_mosaic_train_step_runs",
    "tests/test_multiscale.py::test_multi_scale_fit_covers_buckets",
    "tests/test_multistep.py::test_multi_step_matches_sequential",
    "tests/test_packed_interior.py::test_gradients_match",
    "tests/test_packed_stem.py::test_packed_predictor_matches",
    "tests/test_quantize.py::test_percentile_calibration_smaller_scales",
    "tests/test_quantize.py::test_quant_apply_per_conv_error_bounded",
    "tests/test_resume.py::test_resumed_step_matches_uninterrupted",
    "tests/test_sharding.py::test_gradients_2d_spatial_sharding_match",
    "tests/test_sharding.py::test_train_step_2d_spatial_packed_matches_single_device",
    "tests/test_distributed.py::test_two_process_train_matches_single_process",
    "tests/test_sparse_loss.py::test_compact_trainer_sparse_matches_dense",
    "tests/test_sharding.py::test_gradients_sharded_match_single_device",
    "tests/test_sharding.py::test_train_step_sharded_matches_single_device",
    "tests/test_stream.py::TestChunkStream::test_sharded_placement_matches_single_device",
    "tests/test_stream.py::TestChunkStream::test_trains_equal_to_compact_path",
    "tests/test_stream.py::TestPoolStream::test_run_epoch_trains",
    "tests/test_tensor_parallel.py::test_tp_train_step_matches_single_device",
    "tests/test_training.py::test_gradient_clipping_keeps_updates_finite",
    "tests/test_training.py::test_multiclass_training_step",
    "tests/test_training.py::test_train_epoch_losses_finite_nonneg",
    "tests/test_training.py::test_train_step_changes_params",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base_id = item.nodeid.split("[")[0]
        if base_id in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def img_size():
    return TEST_IMG_SIZE


@pytest.fixture(scope="session")
def num_classes():
    return 1


@pytest.fixture(scope="session")
def cfg():
    return YoloConfig(num_classes=1, img_size=TEST_IMG_SIZE, width_mult=0.25,
                      depth_mult=0.33)


@pytest.fixture(scope="session")
def cfg_multiclass():
    return YoloConfig(num_classes=3, img_size=TEST_IMG_SIZE, width_mult=0.25,
                      depth_mult=0.33)


@pytest.fixture(scope="session")
def model_and_vars(cfg):
    from yolo_from_scratch_tpu.models.yolo import init_model

    return init_model(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="session")
def shared_train_setup(cfg):
    """One compiled nano@TEST_IMG_SIZE train step (batch 2) shared by the
    resume/multistep/grad-accum modules — jit compiles dominate suite time
    on this 1-core host, so modules standardize on batch 2 and reuse this."""
    from yolo_from_scratch_tpu.train.steps import (
        create_train_state,
        make_train_step,
    )

    model, tx, state0 = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    step = make_train_step(model, tx, cfg, donate=False)
    return model, tx, state0, step


@pytest.fixture(scope="session")
def default_anchors():
    from yolo_from_scratch_tpu.config import DEFAULT_ANCHORS

    return np.asarray(DEFAULT_ANCHORS, np.float32)


def _write_synthetic_split(split_dir, n_images, img_size, num_classes, seed):
    """n random JPEGs with 1-3 random YOLO boxes each (reference:
    tests/conftest.py:56-87 fixture style)."""
    rng = np.random.default_rng(seed)
    (split_dir / "images").mkdir(parents=True, exist_ok=True)
    (split_dir / "labels").mkdir(parents=True, exist_ok=True)
    for i in range(n_images):
        arr = (rng.random((img_size, img_size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(split_dir / "images" / f"img_{i}.jpg")
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, num_classes))
            w, h = rng.uniform(0.1, 0.4, 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        (split_dir / "labels" / f"img_{i}.txt").write_text("\n".join(lines) + "\n")


@pytest.fixture(scope="session")
def temp_dataset_dir(tmp_path_factory):
    """Synthetic dataset: train + val splits of 5 images, nc=1, plus a
    dataset.yaml. Returns the root path."""
    root = tmp_path_factory.mktemp("yolo_ds")
    _write_synthetic_split(root / "train", 5, TEST_IMG_SIZE, 1, seed=0)
    _write_synthetic_split(root / "val", 5, TEST_IMG_SIZE, 1, seed=1)
    cfg = {
        "nc": 1,
        "names": ["obj"],
        "train": str(root / "train" / "images"),
        "val": str(root / "val" / "images"),
    }
    with open(root / "dataset.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return root


@pytest.fixture(scope="session")
def temp_dataset_multiclass(tmp_path_factory):
    root = tmp_path_factory.mktemp("yolo_ds_mc")
    _write_synthetic_split(root / "train", 4, TEST_IMG_SIZE, 3, seed=2)
    _write_synthetic_split(root / "val", 4, TEST_IMG_SIZE, 3, seed=3)
    cfg = {
        "nc": 3,
        "names": ["a", "b", "c"],
        "train": str(root / "train" / "images"),
        "val": str(root / "val" / "images"),
    }
    with open(root / "dataset.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return root
