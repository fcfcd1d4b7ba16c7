"""packed_p3 equivalence: extending the space-to-depth evaluation through
the whole 80x80 (stride-8) P3 level — bb_p3_c3b, lateral_p3, merge_p3
(with the channel-tile packed upsample), downsample_p3_to_p4 and
bb_p4_down consuming packed maps — must stay numerically interchangeable
with the canonical graph: same parameter tree, same forward, same
gradients, interchangeable checkpoints.

Decision data for WHY this level is packed: stagebench --packexp
(dense 80x80 C3 fwd+vjp 508 us vs 186 us packed — 32-channel 3x3s
underfill the MXU lanes 4x). No reference analogue (TPU layout move);
the contract is equivalence with OUR unpacked model, which is
parity-tested against the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.packed import PACK_FACTOR, pack_s2d_host
from yolo_from_scratch_tpu.models.yolo import YOLO


@pytest.fixture(scope="module")
def cfgs():
    base = dict(num_classes=3, img_size=64, width_mult=0.25, depth_mult=0.33)
    return (YoloConfig(**base),
            YoloConfig(**base, packed_stem=True, packed_interior=True,
                       packed_p3=True))


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return rng.random((2, 64, 64, 3)).astype(np.float32)


def test_requires_packed_interior():
    with pytest.raises(ValueError):
        YoloConfig(num_classes=1, img_size=64, packed_stem=True,
                   packed_p3=True)


def test_identical_parameter_trees(cfgs, image):
    cfg_u, cfg_p = cfgs
    vu = YOLO(cfg_u).init(jax.random.PRNGKey(7), jnp.asarray(image),
                          train=False)
    vp = YOLO(cfg_p).init(jax.random.PRNGKey(7), jnp.asarray(image),
                          train=False)
    lu = jax.tree_util.tree_flatten_with_path(vu)[0]
    lp = jax.tree_util.tree_flatten_with_path(vp)[0]
    assert [jax.tree_util.keystr(k) for k, _ in lu] == \
        [jax.tree_util.keystr(k) for k, _ in lp]
    for (_, a), (_, b) in zip(lu, lp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_matches_unpacked(cfgs, image):
    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    out_u = YOLO(cfg_u).apply(variables, jnp.asarray(image), train=False)
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))
    out_p = YOLO(cfg_p).apply(variables, packed, train=False)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_train_mode_matches(cfgs, image):
    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    out_u, mut_u = YOLO(cfg_u).apply(
        variables, jnp.asarray(image), train=True, mutable=["batch_stats"])
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))
    out_p, mut_p = YOLO(cfg_p).apply(
        variables, packed, train=True, mutable=["batch_stats"])
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree.leaves(mut_u), jax.tree.leaves(mut_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradients_match(cfgs, image):
    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))

    def make_loss(cfg, x):
        def loss(params):
            outs, _ = YOLO(cfg).apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return sum(jnp.mean(jnp.square(o)) for o in outs)
        return loss

    g_u = jax.grad(make_loss(cfg_u, jnp.asarray(image)))(variables["params"])
    g_p = jax.grad(make_loss(cfg_p, packed))(variables["params"])
    # same tolerance rationale as test_packed_stem/interior: f32 noise
    # through train-mode BN; wiring errors would show as O(1) diffs
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_anchor_free_head_matches(cfgs, image):
    """The anchor-free decoupled head consumes the unpacked P3 map —
    equivalence must hold for that head family too."""
    base = dict(num_classes=3, img_size=64, width_mult=0.25,
                depth_mult=0.33, head_type="anchor_free")
    cfg_u = YoloConfig(**base)
    cfg_p = YoloConfig(**base, packed_stem=True, packed_interior=True,
                       packed_p3=True)
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(2), jnp.asarray(image),
                                 train=False)
    out_u = YOLO(cfg_u).apply(variables, jnp.asarray(image), train=False)
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))
    out_p = YOLO(cfg_p).apply(variables, packed, train=False)
    for a, b in zip(jax.tree.leaves(out_u), jax.tree.leaves(out_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_checkpoint_interchangeable(cfgs, image, tmp_path):
    from yolo_from_scratch_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_p).init(jax.random.PRNGKey(1), jnp.asarray(
        pack_s2d_host(image, PACK_FACTOR)), train=False)
    path = tmp_path / "packed_p3.ckpt"
    save_checkpoint(str(path), variables, cfg_p)
    loaded, cfg_l, _ = load_checkpoint(str(path))
    out_u = YOLO(cfg_u).apply(loaded, jnp.asarray(image), train=False)
    out_p = YOLO(cfg_p).apply(
        variables, jnp.asarray(pack_s2d_host(image, PACK_FACTOR)),
        train=False)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
