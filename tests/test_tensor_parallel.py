"""Tensor (model) parallelism on the virtual 8-device CPU backend.

No reference analogue (single-device, SURVEY.md §2.3). Validates the
channel-sharding layer (parallel/tensor.py): the sharding rule, actual
shard placement, and numerical equivalence of a full TP-sharded train
step against the single-device program — the all-gather/reduce-scatter
pattern GSPMD inserts between channel-sharded convs must reproduce the
unsharded math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.parallel.mesh import DATA_AXIS, batch_sharding
from yolo_from_scratch_tpu.parallel.tensor import (
    MODEL_AXIS,
    make_mesh_dm,
    shard_state_tp,
    sharded_fraction,
    tp_leaf_sharding,
)
from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_train_step,
    set_learning_rate,
)


@pytest.fixture(scope="module")
def mesh_dm():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh_dm(2)  # 4 data x 2 model


def test_mesh_dm_shape(mesh_dm):
    assert mesh_dm.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh_dm.shape["data"] == 4 and mesh_dm.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh_dm(3)  # 8 devices don't divide by 3


def test_leaf_sharding_rule(mesh_dm):
    # big conv kernel: cout sharded on model
    k = np.zeros((3, 3, 32, 128), np.float32)
    spec = tp_leaf_sharding(mesh_dm, k).spec
    assert spec == jax.sharding.PartitionSpec(None, None, None, MODEL_AXIS)
    # its BN scale picks up the matching sharding from shape alone
    assert tp_leaf_sharding(mesh_dm, np.zeros((128,), np.float32)).spec == \
        jax.sharding.PartitionSpec(MODEL_AXIS)
    # detect-head conv (cout=18): below min size -> replicated
    assert tp_leaf_sharding(
        mesh_dm, np.zeros((1, 1, 64, 18), np.float32)
    ).is_fully_replicated
    # odd width (not divisible by n_model) -> replicated
    assert tp_leaf_sharding(
        mesh_dm, np.zeros((65,), np.float32)
    ).is_fully_replicated
    # scalars (optimizer counts/hyperparams) -> replicated
    assert tp_leaf_sharding(
        mesh_dm, jnp.asarray(0.5)
    ).is_fully_replicated


def test_state_actually_sharded(cfg, mesh_dm):
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    state_tp = shard_state_tp(mesh_dm, state)
    frac = sharded_fraction(state_tp.params)
    # at width_mult 0.25 the 64/128/256-wide convs dominate the count
    assert frac > 0.5, f"only {frac:.0%} of params sharded"
    # a sharded kernel holds half its channels per model-shard
    leaves = [
        leaf for leaf in jax.tree.leaves(state_tp.params)
        if leaf.ndim == 4 and not leaf.sharding.is_fully_replicated
    ]
    assert leaves, "no conv kernel was sharded"
    k = leaves[0]
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 2
    # Adam moments mirror the param shardings (same shapes, same rule)
    assert sharded_fraction(state_tp.opt_state) > 0.0


def test_tp_train_step_matches_single_device(cfg, mesh_dm):
    """One full train step with channel-sharded params on the data x
    model mesh lands on the single-device loss/params: GSPMD's
    inter-layer collectives must be numerically faithful."""
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    train_step = make_train_step(model, tx, cfg, donate=False)
    state = set_learning_rate(state, 1e-3)

    rng = np.random.default_rng(0)
    images = rng.random((8, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    targets = [np.zeros((8, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    targets[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    s1, m1 = train_step(state, jnp.asarray(images),
                        [jnp.asarray(t) for t in targets])

    state_tp = shard_state_tp(mesh_dm, state)
    sh = batch_sharding(mesh_dm)
    s2, m2 = train_step(state_tp, jax.device_put(images, sh),
                        [jax.device_put(t, sh) for t in targets])

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    # updated params keep their channel sharding (no silent re-gather)
    assert sharded_fraction(s2.params) > 0.5
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        # same tolerance rationale as the DP equivalence test: Adam
        # amplifies reduction-order noise on near-zero second moments
        np.testing.assert_allclose(a, b, atol=5e-3)
