"""Packed-interior equivalence: extending the space-to-depth evaluation
through the first C3 stage (models/packed.py::repack_conv_kernel,
GPackedConvBNSiLU, PackedC3) must be numerically interchangeable with the
canonical graph — same parameter tree, same forward, same gradients.

No reference analogue (TPU layout optimization); the contract is
equivalence with OUR unpacked model, which is parity-tested against the
reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.packed import (
    PACK_FACTOR,
    pack_s2d_host,
    repack_conv_kernel,
)
from yolo_from_scratch_tpu.models.yolo import YOLO


def _conv(x, w, stride, pad):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=dn)


@pytest.mark.parametrize("k,stride,fi,fo,cin,cout", [
    (3, 1, 2, 2, 8, 8),    # packed bottleneck conv
    (1, 1, 2, 2, 16, 8),   # packed c3 conv1/conv2
    (3, 2, 2, 2, 8, 16),   # stem1 emitting a packed map
    (3, 2, 2, 1, 16, 24),  # bb_p3_down consuming the packed map
    (3, 2, 4, 2, 3, 8),    # stem0 (must reproduce pack_conv_kernel)
    (1, 1, 4, 4, 6, 10),   # 4x-packed pointwise
])
def test_repack_kernel_equivalence(k, stride, fi, fo, cin, cout):
    """conv(packed input, repacked kernel) == fo-packing of the canonical
    SAME conv, for every (kernel, stride, fi, fo) the model uses."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 32, 32, cin)), jnp.float32)
    w = jnp.asarray(rng.random((k, k, cin, cout)) - 0.5, jnp.float32)
    p = k // 2
    y = _conv(x, w, stride, ((p, p), (p, p)))
    y_ref = pack_s2d_host(np.asarray(y), fo) if fo > 1 else np.asarray(y)

    xp = jnp.asarray(pack_s2d_host(np.asarray(x), fi))
    wp, sp, pad = repack_conv_kernel(w, stride, fi, fo)
    yp = _conv(xp, wp, sp, (pad, pad))
    assert yp.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(yp), y_ref, atol=1e-5)


def test_repack_kernel_concat_segments():
    """A conv consuming concat(a, b) equals the packed conv consuming
    concat(pack(a), pack(b)) with the two-segment input layout."""
    rng = np.random.default_rng(4)
    a = rng.random((2, 16, 16, 8)).astype(np.float32)
    b = rng.random((2, 16, 16, 4)).astype(np.float32)
    w = jnp.asarray(rng.random((1, 1, 12, 10)) - 0.5, jnp.float32)
    y = _conv(jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], -1), w,
              1, ((0, 0), (0, 0)))
    y_ref = pack_s2d_host(np.asarray(y), 2)

    xp = jnp.concatenate(
        [jnp.asarray(pack_s2d_host(a, 2)), jnp.asarray(pack_s2d_host(b, 2))],
        axis=-1)
    wp, sp, pad = repack_conv_kernel(w, 1, 2, 2,
                                     in_segments=[(2, 8), (2, 4)])
    yp = _conv(xp, wp, sp, (pad, pad))
    np.testing.assert_allclose(np.asarray(yp), y_ref, atol=1e-5)


@pytest.fixture(scope="module")
def cfgs():
    base = dict(num_classes=1, img_size=64, width_mult=0.25, depth_mult=0.33)
    return (YoloConfig(**base),
            YoloConfig(**base, packed_stem=True, packed_interior=True))


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return rng.random((2, 64, 64, 3)).astype(np.float32)


def test_requires_packed_stem():
    with pytest.raises(ValueError):
        YoloConfig(num_classes=1, img_size=64, packed_interior=True)


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
    # same tolerance rationale as test_packed_stem: f32 noise through
    # train-mode BN; gross wiring errors would show as O(1) diffs
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_checkpoint_interchangeable(cfgs, image, tmp_path):
    """A checkpoint saved from the packed-interior model loads into the
    canonical model (and vice versa) byte-for-byte."""
    from yolo_from_scratch_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_p).init(jax.random.PRNGKey(1), jnp.asarray(
        pack_s2d_host(image, PACK_FACTOR)), train=False)
    path = tmp_path / "packed.ckpt"
    save_checkpoint(str(path), variables, cfg_p)
    loaded, cfg_l, _ = load_checkpoint(str(path))
    out_u = YOLO(cfg_u).apply(loaded, jnp.asarray(image), train=False)
    out_p = YOLO(cfg_p).apply(
        variables, jnp.asarray(pack_s2d_host(image, PACK_FACTOR)),
        train=False)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
