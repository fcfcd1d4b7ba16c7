"""End-to-end CLI tests via subprocess (port of reference tests/test_cli.py:
the polymorphic dispatch contract exercised through `python train.py …`)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


def run_cli(args, cwd=None, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin
    env["XLA_FLAGS"] = "--xla_backend_optimization_level=0"  # compile speed
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return subprocess.run(
        [sys.executable, str(REPO_ROOT / "train.py")] + args,
        capture_output=True, text=True, timeout=timeout, cwd=cwd or REPO_ROOT,
        env=env,
    )


def test_usage_text_no_args():
    result = run_cli([])
    assert result.returncode == 0
    assert "Usage:" in result.stdout
    assert "Training:" in result.stdout
    assert "Compute Anchors:" in result.stdout


def test_compute_anchors_requires_yaml():
    result = run_cli(["--compute-anchors"])
    assert result.returncode == 1
    assert "ERROR: --compute-anchors requires a dataset YAML file" in result.stdout


def test_compute_anchors_happy_path(temp_dataset_dir):
    result = run_cli(
        [str(temp_dataset_dir / "dataset.yaml"), "--compute-anchors",
         "--img-size", "128"]
    )
    assert result.returncode == 0
    assert "Recommended anchor configuration" in result.stdout
    assert "P3 (small objects):" in result.stdout


@pytest.fixture(scope="module")
def trained_ckpt(temp_dataset_dir, tmp_path_factory):
    """One real 1-epoch CLI training run; reused by eval/infer/inspect."""
    workdir = tmp_path_factory.mktemp("cli_train")
    result = run_cli(
        [str(temp_dataset_dir / "dataset.yaml"), "--epochs", "1", "--size",
         "n", "--img-size", "128", "--batch-size", "5", "--lr", "1e-3"],
        cwd=workdir,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Training YOLO model" in result.stdout
    assert "Creating YOLOv5N" in result.stdout
    assert "Model saved to" in result.stdout
    ckpts = list(workdir.glob("yolo_*.ckpt"))
    assert len(ckpts) == 1
    return ckpts[0], result.stdout


def test_train_mode_output(trained_ckpt):
    _, stdout = trained_ckpt
    assert "Epoch 1:" in stdout
    assert "Val: Loss" in stdout
    assert "LR:" in stdout


def test_eval_mode(temp_dataset_dir, trained_ckpt):
    ckpt, _ = trained_ckpt
    result = run_cli([str(temp_dataset_dir / "dataset.yaml"), str(ckpt)])
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Evaluating model from" in result.stdout
    assert "Training Set:" in result.stdout
    assert "Validation Set:" in result.stdout
    assert "F1 Score:" in result.stdout


def test_infer_mode(temp_dataset_dir, trained_ckpt):
    ckpt, _ = trained_ckpt
    img = next((temp_dataset_dir / "val" / "images").glob("*.jpg"))
    result = run_cli([str(img), str(ckpt)])
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Running inference on" in result.stdout
    assert ("No objects detected." in result.stdout
            or "Detected" in result.stdout)


def test_inspect_mode(trained_ckpt):
    ckpt, _ = trained_ckpt
    result = run_cli([str(ckpt)])
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Model loaded from" in result.stdout
    assert "Number of classes: 1" in result.stdout
    assert "Image size: 128" in result.stdout
    assert "Total parameters:" in result.stdout


def test_custom_lr_flags_echoed(temp_dataset_dir, trained_ckpt):
    # reuses the cached-compile path: 1 epoch with custom flags
    _, stdout = trained_ckpt
    assert "Initial LR: 0.001" in stdout


def test_packed_stem_train_eval_roundtrip(temp_dataset_dir, trained_ckpt,
                                          tmp_path_factory):
    """--packed-stem training produces a checkpoint interchangeable with
    the unpacked graph: evaluating it WITHOUT the flag must work and
    print the standard eval contract (models/packed.py equivalence)."""
    workdir = tmp_path_factory.mktemp("cli_packed")
    result = run_cli(
        [str(temp_dataset_dir / "dataset.yaml"), "--epochs", "1", "--size",
         "n", "--img-size", "128", "--batch-size", "5", "--packed-stem"],
        cwd=workdir,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Model saved to" in result.stdout
    ckpt = next(workdir.glob("yolo_*.ckpt"))
    ev = run_cli([str(temp_dataset_dir / "dataset.yaml"), str(ckpt)])
    assert ev.returncode == 0, ev.stderr[-2000:]
    assert "Validation Set:" in ev.stdout
    # and the reverse: the UNPACKED module-level checkpoint evaluates
    # through the packed path
    ckpt_u, _ = trained_ckpt
    ev2 = run_cli([str(temp_dataset_dir / "dataset.yaml"), str(ckpt_u),
                   "--packed-stem"])
    assert ev2.returncode == 0, ev2.stderr[-2000:]
    assert "F1 Score:" in ev2.stdout


def test_val_det_epoch_metric(temp_dataset_dir, tmp_path_factory):
    """--val-det appends detection-level P/R/F1 (NMS output vs GT) to
    every epoch line — the honest per-epoch metric for the anchor-free
    TAL head (train/map_eval.py::evaluate_det_prf1); the grid P/R/F1
    keeps the reference stdout contract alongside it."""
    workdir = tmp_path_factory.mktemp("cli_valdet")
    result = run_cli(
        [str(temp_dataset_dir / "dataset.yaml"), "--epochs", "1", "--size",
         "n", "--img-size", "128", "--batch-size", "5", "--val-det",
         "--head", "anchor_free", "--compact-targets"],
        cwd=workdir,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    epoch_line = next(l for l in result.stdout.splitlines()
                      if l.startswith("Epoch 1:"))
    assert "Val: Loss" in epoch_line        # reference contract intact
    assert "Det: P" in epoch_line and "F1" in epoch_line


def test_compact_mosaic_flag_guards(temp_dataset_dir):
    """--device-mosaic needs --compact-targets; --compact-targets rejects
    host-side --augment (both fail fast, before any compile)."""
    yaml = str(temp_dataset_dir / "dataset.yaml")
    r = run_cli([yaml, "--device-mosaic"])
    assert r.returncode == 1
    assert "requires --compact-targets" in r.stdout
    r = run_cli([yaml, "--compact-targets", "--augment"])
    assert r.returncode == 1
    assert "host-side --augment" in r.stdout


def test_compact_targets_train_with_mosaic(temp_dataset_dir,
                                           tmp_path_factory):
    """The compact streaming product path end to end through the CLI:
    uint8 images + padded labels, on-device assignment, device mosaic +
    flip augmentation — same train/eval stdout contract, checkpoint
    saved."""
    workdir = tmp_path_factory.mktemp("cli_compact")
    result = run_cli(
        [str(temp_dataset_dir / "dataset.yaml"), "--epochs", "1", "--size",
         "n", "--img-size", "128", "--batch-size", "5", "--lr", "1e-3",
         "--compact-targets", "8", "--device-mosaic", "--device-augment",
         "flip"],
        cwd=workdir,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Epoch 1:" in result.stdout
    assert "Model saved to" in result.stdout
    assert len(list(workdir.glob("yolo_*.ckpt"))) == 1


def test_mesh_axis_flag_guards(temp_dataset_dir):
    """--spatial/--model-parallel are secondary mesh axes: without
    --data-parallel they fail fast instead of silently doing nothing;
    together they are mutually exclusive."""
    yaml = str(temp_dataset_dir / "dataset.yaml")
    r = run_cli([yaml, "--model-parallel", "2"])
    assert r.returncode == 1
    assert "require --data-parallel" in r.stdout
    r = run_cli([yaml, "--data-parallel", "--spatial", "2",
                 "--model-parallel", "2"])
    assert r.returncode == 1
    assert "mutually exclusive" in r.stdout
