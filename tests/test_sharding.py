"""Data-parallel mesh tests on the virtual 8-device CPU backend.

No analogue exists in the reference (it has no distributed code —
SURVEY.md §2.3); these validate the TPU-native DP layer: sharded batches,
replicated state, and single-device/multi-device numerical equivalence
(the gradient all-reduce XLA inserts must reproduce the unsharded math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    make_mesh,
    make_mesh_2d,
    pad_batch_to_multiple,
    replicated_sharding,
    target_sharding,
)
from yolo_from_scratch_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.size == 8
    assert mesh.axis_names == ("data",)


def test_pad_batch_to_multiple():
    arr = np.arange(15).reshape(5, 3).astype(np.float32)
    padded, valid = pad_batch_to_multiple(arr, 8)
    assert padded.shape == (8, 3)
    assert valid == 5
    # padding repeats real rows (wrap-around), not zeros
    np.testing.assert_array_equal(padded[5:], arr[:3])
    same, valid2 = pad_batch_to_multiple(np.ones((8, 3)), 8)
    assert same.shape == (8, 3) and valid2 == 8


def test_sharded_batch_placement(mesh):
    x = np.ones((8, 4, 4, 3), np.float32)
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (1, 4, 4, 3)


def test_train_step_sharded_matches_single_device(cfg):
    """DP-sharded train step == unsharded train step (same batch)."""
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    train_step = make_train_step(model, tx, cfg, donate=False)
    state = set_learning_rate(state, 1e-3)

    rng = np.random.default_rng(0)
    images = rng.random((8, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    targets = [
        np.zeros((8, g, g, 3, 6), np.float32) for g in cfg.grid_sizes
    ]
    targets[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    # unsharded
    s1, m1 = train_step(state, jnp.asarray(images),
                        [jnp.asarray(t) for t in targets])

    # sharded over the 8-device mesh
    mesh = make_mesh()
    sh, rep = batch_sharding(mesh), replicated_sharding(mesh)
    state_r = jax.device_put(state, rep)
    imgs_s = jax.device_put(images, sh)
    tgts_s = [jax.device_put(t, sh) for t in targets]
    s2, m2 = train_step(state_r, imgs_s, tgts_s)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    p1 = jax.tree.leaves(jax.device_get(s1.params))
    p2 = jax.tree.leaves(jax.device_get(s2.params))
    for a, b in zip(p1, p2):
        # sharded reductions reorder float adds; Adam's normalization
        # amplifies tiny grad diffs on near-zero second moments, so params
        # after one step only match loosely — gradients are compared
        # tightly in test_gradients_sharded_match below
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_gradients_sharded_match_single_device(cfg):
    """The XLA-inserted gradient all-reduce reproduces unsharded grads."""
    from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale

    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    anchors = cfg.anchors_array

    @jax.jit
    def grad_fn(params, batch_stats, images, targets):
        def loss_fn(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            total, *_ = yolo_loss_multiscale(preds, targets, anchors, 1,
                                             cfg.img_size)
            return total

        return jax.grad(loss_fn)(params)

    rng = np.random.default_rng(2)
    images = rng.random((8, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    targets = [np.zeros((8, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    targets[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    g1 = jax.device_get(
        grad_fn(state.params, state.batch_stats, jnp.asarray(images),
                [jnp.asarray(t) for t in targets])
    )
    mesh = make_mesh()
    sh, rep = batch_sharding(mesh), replicated_sharding(mesh)
    g2 = jax.device_get(
        grad_fn(
            jax.device_put(state.params, rep),
            jax.device_put(state.batch_stats, rep),
            jax.device_put(images, sh),
            [jax.device_put(t, sh) for t in targets],
        )
    )
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # reduction order differs across shards: absolute tolerance, since
        # relative error is meaningless on near-zero gradient entries
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_mesh_2d_shape():
    mesh = make_mesh_2d(2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.shape["data"] == 4 and mesh.shape["space"] == 2
    with pytest.raises(ValueError):
        make_mesh_2d(3)  # 8 devices don't divide by 3


def test_mesh_2d_image_placement():
    """image_sharding on a 2-D mesh shards batch on data AND height on
    space; target_sharding shards grid rows the same way."""
    mesh = make_mesh_2d(2)
    x = np.ones((4, 16, 16, 3), np.float32)
    xs = jax.device_put(x, image_sharding(mesh))
    assert xs.addressable_shards[0].data.shape == (1, 8, 16, 3)
    t = np.ones((4, 4, 4, 3, 6), np.float32)
    ts = jax.device_put(t, target_sharding(mesh))
    assert ts.addressable_shards[0].data.shape == (1, 2, 4, 3, 6)


def test_gradients_2d_spatial_sharding_match(cfg):
    """Spatially-partitioned (data x space) forward/backward reproduces
    the unsharded gradients: GSPMD's halo exchanges for the 3x3 convs and
    the cross-shard BatchNorm statistics psums must be numerically
    faithful. This is the CNN analogue of sequence parallelism
    (SURVEY.md §5.7)."""
    from yolo_from_scratch_tpu.ops.losses import yolo_loss_multiscale

    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    anchors = cfg.anchors_array

    @jax.jit
    def loss_and_grad(params, batch_stats, images, targets):
        def loss_fn(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            total, *_ = yolo_loss_multiscale(preds, targets, anchors, 1,
                                             cfg.img_size)
            return total

        return jax.value_and_grad(loss_fn)(params)

    rng = np.random.default_rng(3)
    images = rng.random((4, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    targets = [np.zeros((4, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    targets[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    l1, g1 = jax.device_get(
        loss_and_grad(state.params, state.batch_stats, jnp.asarray(images),
                      [jnp.asarray(t) for t in targets])
    )

    mesh = make_mesh_2d(2)  # 4 data x 2 space
    rep = replicated_sharding(mesh)
    l2, g2 = jax.device_get(
        loss_and_grad(
            jax.device_put(state.params, rep),
            jax.device_put(state.batch_stats, rep),
            jax.device_put(images, image_sharding(mesh)),
            [jax.device_put(t, target_sharding(mesh)) for t in targets],
        )
    )
    assert float(l1) == pytest.approx(float(l2), rel=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_eval_step_sharded_counts_match(cfg):
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg, 1e-3)
    eval_step = make_eval_step(model, cfg)
    rng = np.random.default_rng(1)
    images = rng.random((8, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    targets = [np.zeros((8, g, g, 3, 6), np.float32) for g in cfg.grid_sizes]
    targets[1][:, 2, 2, 1] = [0.3, 0.3, 0.2, 0.3, 1.0, 1.0]

    l1, tp1, fp1, fn1 = jax.device_get(
        eval_step(state.params, state.batch_stats, jnp.asarray(images),
                  [jnp.asarray(t) for t in targets])
    )

    mesh = make_mesh()
    sh, rep = batch_sharding(mesh), replicated_sharding(mesh)
    params_r = jax.device_put(state.params, rep)
    bs_r = jax.device_put(state.batch_stats, rep)
    l2, tp2, fp2, fn2 = jax.device_get(
        eval_step(params_r, bs_r, jax.device_put(images, sh),
                  [jax.device_put(t, sh) for t in targets])
    )
    assert float(l1) == pytest.approx(float(l2), rel=2e-5)
    np.testing.assert_array_equal(tp1, tp2)
    np.testing.assert_array_equal(fp1, fp2)
    np.testing.assert_array_equal(fn1, fn2)


def test_train_step_2d_spatial_packed_matches_single_device(cfg):
    """The round-4 TPU DEFAULT layout (packed-p3) under spatial
    partitioning: a (S/4, S/4, 48) packed input shards its height dim on
    `space` like any NHWC map, and GSPMD's halo exchanges for the
    packed-domain convs must reproduce the unsharded step — the zero-
    flags CLI combines these two features on TPU (--data-parallel
    --spatial N), so the combination needs its own equivalence pin."""
    from yolo_from_scratch_tpu.models.packed import pack_s2d_host

    cfg_p = cfg.with_(packed_stem=True, packed_interior=True,
                      packed_p3=True)
    model, tx, state = create_train_state(jax.random.PRNGKey(0), cfg_p,
                                          1e-3, batch_size=1)
    step = make_train_step(model, tx, cfg_p, donate=False)
    state = set_learning_rate(state, 1e-3)

    rng = np.random.default_rng(5)
    images = pack_s2d_host(
        rng.random((4, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    targets = [np.zeros((4, g, g, 3, 6), np.float32)
               for g in cfg_p.grid_sizes]
    targets[0][:, 4, 4, 0] = [0.28, 0.28, 0.1, 0.1, 1.0, 1.0]

    _, m1 = step(state, jnp.asarray(images),
                 [jnp.asarray(t) for t in targets])
    l1 = float(m1["loss"])

    mesh = make_mesh_2d(2)  # 4 data x 2 space
    rep = replicated_sharding(mesh)
    _, m2 = step(
        jax.device_put(state, rep),
        jax.device_put(images, image_sharding(mesh)),
        [jax.device_put(t, target_sharding(mesh)) for t in targets],
    )
    l2 = float(m2["loss"])
    assert l1 == pytest.approx(l2, rel=2e-5), (l1, l2)
