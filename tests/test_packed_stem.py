"""Packed-stem equivalence: the space-to-depth stem (models/packed.py)
must be numerically interchangeable with the unpacked stem — same
parameter tree, same forward, same gradients, same BatchNorm statistics.

No reference analogue (this is a TPU layout optimization); the contract
being tested is equivalence with OUR unpacked model, which is itself
parity-tested against the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.packed import (
    PACK_FACTOR,
    pack_conv_kernel,
    pack_s2d,
    pack_s2d_host,
)
from yolo_from_scratch_tpu.models.yolo import YOLO


@pytest.fixture(scope="module")
def cfgs():
    base = dict(num_classes=1, img_size=64, width_mult=0.25, depth_mult=0.33)
    return (YoloConfig(**base), YoloConfig(**base, packed_stem=True))


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return rng.random((2, 64, 64, 3)).astype(np.float32)


def test_pack_host_matches_device(image):
    a = pack_s2d_host(image, 4)
    b = np.asarray(pack_s2d(jnp.asarray(image), 4))
    assert a.shape == (2, 16, 16, 48)
    np.testing.assert_array_equal(a, b)


def test_pack_conv_kernel_equivalence():
    """Packed 2x2 conv on packed input == stride-2 3x3 conv, both factors."""
    rng = np.random.default_rng(1)
    for fi, cin, cout in ((4, 3, 8), (2, 8, 16)):
        x = jnp.asarray(rng.random((2, 32, 32, cin)), jnp.float32)
        w = jnp.asarray(rng.random((3, 3, cin, cout)) - 0.5, jnp.float32)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
        fo = fi // 2
        y_ref = pack_s2d_host(np.asarray(y), fo) if fo > 1 else np.asarray(y)

        xp = jnp.asarray(pack_s2d_host(np.asarray(x), fi))
        w2 = pack_conv_kernel(w, fi)
        dn2 = jax.lax.conv_dimension_numbers(
            xp.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        yp = jax.lax.conv_general_dilated(
            xp, w2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=dn2)
        np.testing.assert_allclose(np.asarray(yp), y_ref, atol=1e-5)


def test_identical_parameter_trees(cfgs, image):
    """Packed and unpacked models initialize to IDENTICAL variables (same
    param paths -> same RNG folds), so checkpoints are interchangeable."""
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


def test_packed_forward_matches_unpacked(cfgs, image):
    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    out_u = YOLO(cfg_u).apply(variables, jnp.asarray(image), train=False)
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))
    out_p = YOLO(cfg_p).apply(variables, packed, train=False)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # 3-channel input takes the on-device pack fallback, same result
    out_f = YOLO(cfg_p).apply(variables, jnp.asarray(image), train=False)
    for a, b in zip(out_p, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_train_mode_matches(cfgs, image):
    """Train mode: outputs AND mutated BatchNorm statistics agree."""
    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    out_u, mut_u = YOLO(cfg_u).apply(
        variables, jnp.asarray(image), train=True, mutable=["batch_stats"])
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))
    out_p, mut_p = YOLO(cfg_p).apply(
        variables, packed, train=True, mutable=["batch_stats"])
    # train-mode BN normalizes by batch statistics computed in a different
    # reduction order (phase-folded), so accumulation noise is amplified
    # vs eval mode: observed max ~2.6e-5 abs / 0.2% rel at f32
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree.leaves(mut_u), jax.tree.leaves(mut_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_gradients_match(cfgs, image):
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
    # f32 accumulation noise is amplified by backprop through train-mode
    # BN (observed up to ~2.5e-4 abs); the rewrite itself is bit-exact —
    # test_packed_gradients_exact_f64 pins it to ~1e-12 in f64. This
    # whole-model check guards against gross errors (stop-gradients,
    # wrong tap wiring), which would show as O(1) diffs.
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_packed_anchor_free_forward_matches(image):
    """The packed stem is head-agnostic: the anchor-free (TAL/DFL) model
    produces the same outputs from packed input."""
    base = dict(num_classes=1, img_size=64, width_mult=0.25,
                depth_mult=0.33, head_type="anchor_free")
    cfg_u = YoloConfig(**base)
    cfg_p = YoloConfig(**base, packed_stem=True)
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    out_u = YOLO(cfg_u).apply(variables, jnp.asarray(image), train=False)
    packed = jnp.asarray(pack_s2d_host(image, PACK_FACTOR))
    out_p = YOLO(cfg_p).apply(variables, packed, train=False)
    for a, b in zip(out_u, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_packed_predictor_matches(cfgs, image):
    """Predictor/BatchPredictor with packed_stem pack on host and return
    the same detections as the unpacked serving path."""
    from PIL import Image

    from yolo_from_scratch_tpu.infer.predict import BatchPredictor, Predictor

    cfg_u, cfg_p = cfgs
    variables = YOLO(cfg_u).init(jax.random.PRNGKey(0), jnp.asarray(image),
                                 train=False)
    pil = Image.fromarray((image[0] * 255).astype(np.uint8))
    # conf low enough that the untrained model yields candidates
    det_u = Predictor(variables, cfg_u, conf_threshold=0.01)(pil)
    det_p = Predictor(variables, cfg_p, conf_threshold=0.01)(pil)
    assert len(det_u) == len(det_p) > 0
    np.testing.assert_allclose(np.asarray(det_u), np.asarray(det_p),
                               rtol=1e-4, atol=1e-3)

    bdet_u = BatchPredictor(variables, cfg_u, conf_threshold=0.01,
                            max_outputs=64)([pil, pil])
    bdet_p = BatchPredictor(variables, cfg_p, conf_threshold=0.01,
                            max_outputs=64)([pil, pil])
    for a, b in zip(bdet_u, bdet_p):
        assert len(a) == len(b) > 0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


_F64_CHECK = """
import jax, jax.numpy as jnp, numpy as np
from yolo_from_scratch_tpu.models.packed import pack_conv_kernel, pack_s2d

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float64)
w0 = jnp.asarray(rng.random((3, 3, 3, 8)) - 0.5, jnp.float64)
b0 = jnp.asarray(rng.random((8,)) - 0.5, jnp.float64)
eps = 1e-3

def bn_train(y, c):
    ph = y.shape[-1] // c
    yf = y.reshape(-1, ph, c)
    mu = jnp.mean(yf, axis=(0, 1))
    var = jnp.maximum(0.0, jnp.mean(jnp.square(yf), axis=(0, 1)) - mu**2)
    return (y - jnp.tile(mu, ph)) * jnp.tile(jax.lax.rsqrt(var + eps), ph)

def loss_unpacked(w):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
    return jnp.sum(jnp.square(jax.nn.silu(bn_train(y + b0, 8))))

def loss_packed(w):
    xp = pack_s2d(x, 4)
    w2 = pack_conv_kernel(w, 4)
    dn = jax.lax.conv_dimension_numbers(
        xp.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xp, w2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=dn)
    return jnp.sum(jnp.square(jax.nn.silu(bn_train(y + jnp.tile(b0, 4), 8))))

assert abs(float(loss_unpacked(w0)) - float(loss_packed(w0))) < 1e-9
g_u = jax.grad(loss_unpacked)(w0)
g_p = jax.grad(loss_packed)(w0)
np.testing.assert_allclose(np.asarray(g_u), np.asarray(g_p), atol=1e-10)
print("f64-exact ok")
"""


def test_packed_gradients_exact_f64():
    """The packed stem rewrite (pack + kernel rearrangement + phase BN) is
    EXACT math: in f64, loss and gradient through conv+bias+BN+SiLU agree
    with the stride-2 original to ~1e-12. Runs in a subprocess because
    x64 is a process-global jax config."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    out = subprocess.run([sys.executable, "-c", _F64_CHECK], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "f64-exact ok" in out.stdout


def test_loader_packs_images(temp_dataset_dir):
    from yolo_from_scratch_tpu.data.dataset import YoloDataset
    from yolo_from_scratch_tpu.data.loader import DataLoader

    ds = YoloDataset(str(temp_dataset_dir / "train" / "images"), 1,
                     img_size=128)
    plain = DataLoader(ds, batch_size=2, prefetch=0)
    packed = DataLoader(ds, batch_size=2, prefetch=0, pack_images=True)
    (im_a, tg_a), (im_b, tg_b) = next(iter(plain)), next(iter(packed))
    assert im_b.shape == (2, 32, 32, 48)
    np.testing.assert_array_equal(pack_s2d_host(im_a), im_b)
    for a, b in zip(tg_a, tg_b):
        np.testing.assert_array_equal(a, b)
