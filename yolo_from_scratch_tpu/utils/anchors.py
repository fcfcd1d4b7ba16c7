"""K-means anchor optimization (reference: train.py:1252-1343).

The reference shells out to sklearn's C KMeans. Lloyd's algorithm is pure
matmul + argmin, so here it is a jittable JAX implementation (k-means++
seeding, fixed PRNG key, `n_init` restarts picked by inertia) — no sklearn
dependency, runs on any backend. The output contract matches the
reference: 9 centers sorted by area, split 3/3/3 into P3/P4/P5, rounded to
ints.
"""

from __future__ import annotations

import glob
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from yolo_from_scratch_tpu.utils.yaml_cfg import load_dataset_yaml


def _kmeans_plus_plus_init(key, points, k):
    """k-means++ seeding."""
    n = points.shape[0]
    keys = jax.random.split(key, k)
    centers = jnp.zeros((k, points.shape[1]), points.dtype)
    first = jax.random.randint(keys[0], (), 0, n)
    centers = centers.at[0].set(points[first])

    def body(i, centers):
        d2 = jnp.min(
            jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
            + jnp.where(jnp.arange(centers.shape[0]) >= i, jnp.inf, 0.0)[None, :],
            axis=1,
        )
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(keys[i], n, p=probs)
        return centers.at[i].set(points[idx])

    return jax.lax.fori_loop(1, k, body, centers)


def _lloyd(points, centers, iters=50):
    def body(_, centers):
        d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, centers.shape[0], dtype=points.dtype)
        counts = jnp.maximum(onehot.sum(0), 1.0)
        new_centers = (onehot.T @ points) / counts[:, None]
        # keep empty clusters where they were
        return jnp.where((onehot.sum(0) > 0)[:, None], new_centers, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return centers, inertia


def kmeans(points: np.ndarray, k: int, n_init: int = 10, iters: int = 50,
           seed: int = 0) -> np.ndarray:
    """Best-of-n_init k-means. Returns (k, dim) centers."""
    pts = jnp.asarray(points, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_init)

    def run(key):
        return _lloyd(pts, _kmeans_plus_plus_init(key, pts, k), iters)

    centers, inertias = jax.vmap(run)(keys)
    best = int(jnp.argmin(inertias))
    return np.asarray(centers[best])


def collect_dataset_wh(dataset_yaml, img_size=640):
    """All GT (w, h) in pixels at img_size from the train split's labels
    (reference: train.py:1277-1299, incl. the images->labels dir mapping)."""
    config = load_dataset_yaml(dataset_yaml)
    img_dir = config["train"]
    label_dir = img_dir.replace("/images/", "/labels/").replace("/images", "/labels")
    label_files = sorted(glob.glob(f"{label_dir}/*.txt"))

    boxes = []
    for label_file in label_files:
        if Path(label_file).exists():
            with open(label_file, encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) == 5:
                        boxes.append(
                            [float(parts[3]) * img_size, float(parts[4]) * img_size]
                        )
    return np.asarray(boxes, np.float32), label_files


def compute_optimal_anchors(dataset_yaml, img_size=640, num_anchors=9):
    """K-means anchors; prints the reference-format recommendation and
    returns [anchors_p3, anchors_p4, anchors_p5] (or None if no boxes)."""
    all_boxes, label_files = collect_dataset_wh(dataset_yaml, img_size)
    if len(all_boxes) == 0:
        config = load_dataset_yaml(dataset_yaml)
        img_dir = config["train"]
        label_dir = img_dir.replace("/images/", "/labels/").replace(
            "/images", "/labels"
        )
        print(f"ERROR: No boxes found in {label_dir}")
        return None

    print(f"Loaded {len(all_boxes)} boxes from {len(label_files)} images")
    print(
        f"Box size range: width [{all_boxes[:, 0].min():.1f}, "
        f"{all_boxes[:, 0].max():.1f}], height [{all_boxes[:, 1].min():.1f}, "
        f"{all_boxes[:, 1].max():.1f}]"
    )

    print(f"\nRunning k-means clustering with k={num_anchors}...")
    centers = kmeans(all_boxes, num_anchors)
    centers = centers[np.argsort(centers[:, 0] * centers[:, 1])]  # sort by area

    print("\nOptimal anchors (sorted by area):")
    for i, (w, h) in enumerate(centers):
        print(f"  Anchor {i+1}: [{w:.1f}, {h:.1f}] (area: {w * h:.0f})")

    anchors_p3 = centers[0:3].round().astype(int).tolist()
    anchors_p4 = centers[3:6].round().astype(int).tolist()
    anchors_p5 = centers[6:9].round().astype(int).tolist()

    print("\n" + "=" * 60)
    print("Recommended anchor configuration:")
    print("=" * 60)
    print(f"P3 (small objects):  {anchors_p3}")
    print(f"P4 (medium objects): {anchors_p4}")
    print(f"P5 (large objects):  {anchors_p5}")
    print("\nTo use these anchors, pass them to the model and dataset:")
    print(f"  anchors = [{anchors_p3}, {anchors_p4}, {anchors_p5}]")
    print("=" * 60)

    return [anchors_p3, anchors_p4, anchors_p5]
