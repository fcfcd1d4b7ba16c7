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
