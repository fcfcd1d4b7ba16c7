"""Tensor (model) parallelism: channel-sharded parameters on a
`data x model` mesh.

The reference is single-device (reference: train.py:1377, no
torch.distributed — SURVEY.md §2.3), so this axis is framework-native
capability, not parity. The TPU-idiomatic construction mirrors the DP
layer (parallel/mesh.py): pick a mesh, annotate *parameter* shardings,
and let XLA's SPMD partitioner derive the activation layouts and insert
the collectives over ICI — no collective calls appear in the step.

What gets sharded: every parameter-like leaf whose LAST axis is a large
channel dimension — conv kernels `(kh, kw, cin, cout)`, their BN
`scale/bias/mean/var (cout,)`, and the Adam moments mirroring them (the
rule is a pure function of the leaf's shape, so one tree_map covers
params, batch_stats, and opt_state alike). Each chip then holds a
`1/n_model` channel slice of the big convs: the MXU contraction runs on
the local slice and GSPMD emits the all-gather/reduce-scatter pattern
where consecutive layers' shardings meet. Small leaves (cout below
`min_size` or not divisible by `n_model` — e.g. the 18-channel detect
heads) stay replicated: at those widths a collective costs more than the
FLOPs it saves.

When to use: the 's' model (7M params) fits any chip and is
bandwidth-bound — TP does not pay (mesh.py's own note). The l/x variants
at 1280² are where per-chip HBM runs out: parameters + Adam moments +
channel-sliced activations shrink by ~n_model while the batch still
shards on `data`. `--model-parallel N` composes with `--data-parallel`
as a (devices/N) x N mesh.

Numerical note: sharded convolutions change the reduction ORDER of the
cin contraction, so losses match the single-device program to float
tolerance, not bit-exactly (pinned in tests/test_tensor_parallel.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolo_from_scratch_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"
# channel widths below this stay replicated: the all-gather for a small
# conv costs more than its compute (the 's' stem / detect heads)
MIN_SHARD_SIZE = 64


def make_mesh_dm(n_model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh: DP over groups of `n_model` chips, with
    large channel dimensions split `n_model` ways inside each group.
    `model` is the fast (ICI-adjacent) axis for the same reason `space`
    is in make_mesh_2d: its collectives are per-layer."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} devices do not divide into model={n_model}")
    arr = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def tp_leaf_sharding(mesh: Mesh, leaf,
                     min_size: int = MIN_SHARD_SIZE) -> NamedSharding:
    """Sharding for one parameter-like leaf: last axis on `model` when it
    is a shardable channel dimension, else replicated."""
    shape = getattr(leaf, "shape", ())
    n_model = mesh.shape[MODEL_AXIS]
    if (len(shape) >= 1 and shape[-1] >= min_size
            and shape[-1] % n_model == 0):
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 1) + [MODEL_AXIS])))
    return NamedSharding(mesh, P())


def shard_state_tp(mesh: Mesh, state, min_size: int = MIN_SHARD_SIZE):
    """Place a TrainState (or any pytree of arrays) onto the mesh with
    channel-sharded parameters. Scalars and small leaves replicate; the
    Adam moments pick up their parameter's sharding automatically because
    the rule depends only on leaf shape."""
    return jax.tree.map(
        lambda x: jax.device_put(x, tp_leaf_sharding(mesh, x, min_size)),
        state,
    )


def sharded_fraction(tree) -> float:
    """Diagnostic: fraction of parameters (by element count) whose leaves
    are actually sharded over `model` (addressable shard < global size).
    Used by tests and the CLI banner."""
    total = 0
    sharded = 0
    for leaf in jax.tree.leaves(tree):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            sharded += n
    return sharded / max(total, 1)
