"""Fused Pallas conv backward (ops/conv_bwd.py): the custom-vjp conv
must be forward-IDENTICAL to the stock lax convolution and
backward-equal up to float reduction order — on CPU via the Pallas
interpreter (the real kernel runs the same program on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_from_scratch_tpu.ops.conv_bwd import (
    _conv,
    conv3x3_same,
    use_fused_bwd,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("YOLO_FUSED_CONV_BWD", "interpret")


def test_gate_shapes(monkeypatch):
    assert use_fused_bwd(3, 1, 64, 64, 80, 80)
    assert use_fused_bwd(3, 1, 64, 64, 40, 40)
    assert not use_fused_bwd(1, 1, 64, 64, 40, 40)      # 1x1
    assert not use_fused_bwd(3, 2, 64, 64, 40, 40)      # strided
    assert not use_fused_bwd(3, 1, 64, 128, 40, 40)     # cin != cout
    assert not use_fused_bwd(3, 1, 128, 128, 40, 40)    # lanes full
    assert not use_fused_bwd(3, 1, 64, 64, 160, 160)    # VMEM bound
    monkeypatch.setenv("YOLO_FUSED_CONV_BWD", "0")
    assert not use_fused_bwd(3, 1, 64, 64, 80, 80)      # opt-out
    monkeypatch.setenv("YOLO_FUSED_CONV_BWD", "1")
    # default: only on a real TPU backend
    assert use_fused_bwd(3, 1, 64, 64, 80, 80) == (
        jax.default_backend() == "tpu")


def test_forward_identical_backward_equal():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 16, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    y_fused = jax.jit(conv3x3_same)(x, w)
    y_ref = jax.jit(_conv)(x, w)
    np.testing.assert_array_equal(np.asarray(y_fused), np.asarray(y_ref))

    _, vjp_f = jax.vjp(conv3x3_same, x, w)
    _, vjp_r = jax.vjp(_conv, x, w)
    (dx_f, dw_f), (dx_r, dw_r) = vjp_f(dy), vjp_r(dy)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_r),
                               rtol=2e-5, atol=2e-4)


def test_grad_through_loss_matches():
    """End-to-end gradient through a scalar loss: the custom vjp composes
    with jax.grad exactly like the stock conv."""
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 8, 8, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)

    loss_f = lambda w: jnp.sum(jnp.tanh(conv3x3_same(x, w)) ** 2)
    loss_r = lambda w: jnp.sum(jnp.tanh(_conv(x, w)) ** 2)
    gf = jax.grad(loss_f)(w)
    gr = jax.grad(loss_r)(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-5, atol=2e-4)


def test_bottleneck_block_grads_match(monkeypatch):
    """Model-level: a Bottleneck (two 3x3 64-ch ConvBNSiLU) with the
    fused backward produces the same parameter gradients as with the
    stock path — same params, same forward, grads to reduction order."""
    from yolo_from_scratch_tpu.models.blocks import Bottleneck

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    block = Bottleneck(64)
    variables = block.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params, bs):
        y, _ = block.apply({"params": params, "batch_stats": bs}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g_fused = jax.grad(loss)(variables["params"], variables["batch_stats"])
    monkeypatch.setenv("YOLO_FUSED_CONV_BWD", "0")
    g_ref = jax.grad(loss)(variables["params"], variables["batch_stats"])
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-4)
