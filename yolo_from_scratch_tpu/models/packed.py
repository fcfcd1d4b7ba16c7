"""Space-to-depth packed stem: the same stem math, in a TPU-friendly layout.

Why: the first two stride-2 convs run on (B, 640, 640, 3) and
(B, 320, 320, 16) activations whose huge spatial extent / tiny channel
count XLA executes pathologically on TPU — measured 1939 us + 921 us at
batch 8 against 56 us + 48 us roofline floors, i.e. ~40% of the whole
forward pass (benchmarks/stagebench.py). Any on-device rearrangement of
the 3-channel input pays the same bad layout (a bare space-to-depth
transpose alone measures 3.4 ms), so the fix is to let the HOST deliver
images already space-to-depth packed 4x: (B, S/4, S/4, 48) — a free
permutation of the writes the loader performs anyway — and evaluate the
stem in packed domain:

    stem0: stride-2 3x3 on the unpacked image
         == stride-1 2x2 conv on the 4x-packed input, producing the
            2x-packed stem0 output                       (~169 us)
    stem1: stride-1 2x2 conv on that 2x-packed tensor, producing the
            natural-layout (B, S/4, S/4, c_stem) map      (~156 us)

The packed kernels are pure rearrangements (with zero taps) of the
canonical (3, 3, cin, cout) parameters, built at trace time — the
parameter tree, initialization, and checkpoints are IDENTICAL to the
unpacked model, so a checkpoint trained packed loads into an unpacked
model and vice versa. BatchNorm statistics fold the phase channels back
onto the canonical feature axis, reproducing flax BatchNorm numerics
(fp32 fast-variance stats, running-average momentum).

Reference stem being reproduced: train.py:401-404 (two stride-2 raw
convs with bias + BN + SiLU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_from_scratch_tpu.models.blocks import (
    BN_EPS,
    BN_MOMENTUM,
    torch_bias_init_for,
    torch_kernel_init,
)
from yolo_from_scratch_tpu.models.fused_bn import BNSiLU

PACK_FACTOR = 4  # the model input's space-to-depth factor when packed


def pack_s2d_host(x: np.ndarray, f: int = PACK_FACTOR) -> np.ndarray:
    """Space-to-depth on host: (..., H, W, C) -> (..., H/f, W/f, f*f*C),
    channel layout (a*f + b)*C + c for pixel phase (a, b)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // f, f, w // f, f, c)
    x = np.moveaxis(x, -4, -3)  # (..., h/f, w/f, f, f, c)
    return np.ascontiguousarray(x.reshape(*lead, h // f, w // f, f * f * c))


def pack_s2d(x: jnp.ndarray, f: int = PACK_FACTOR) -> jnp.ndarray:
    """Device-side space-to-depth (slow on TPU for 3-channel inputs —
    prefer pack_s2d_host in pipelines; this is the correctness fallback)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // f, f, w // f, f, c)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*lead, h // f, w // f, f * f * c)


def unpack_s2d(x: jnp.ndarray, f: int = PACK_FACTOR) -> jnp.ndarray:
    """Inverse of pack_s2d: (..., H/f, W/f, f*f*C) -> (..., H, W, C).
    Used by device-side geometric augmentation (ops/mosaic_device.py)
    that is simpler to express in pixel domain; pure reshapes/transposes
    that XLA fuses into the surrounding program."""
    *lead, hp, wp, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(*lead, hp, wp, f, f, c)
    x = jnp.moveaxis(x, -3, -4)  # (..., hp, f, wp, f, c)
    return x.reshape(*lead, hp * f, wp * f, c)


def pack_conv_kernel(w: jnp.ndarray, fi: int) -> jnp.ndarray:
    """Rearrange a (3, 3, cin, cout) stride-2 SAME conv kernel into the
    equivalent (2, 2, fi*fi*cin, fo*fo*cout) stride-1 kernel (fo = fi//2)
    operating on fi-packed input with pad ((1, 0), (1, 0)), producing the
    fo-packed output. Derivation: output row r = fo*i + p reads input rows
    2r + di - 1 = fi*i + (2p + di - 1); expressing 2p + di - 1 as
    fi*(u - 1) + a maps each original tap (p, di) to exactly one packed
    tap (u, a), zero elsewhere. Verified exact vs the direct conv."""
    k, _, cin, cout = w.shape
    assert k == 3, "packed rewrite is derived for 3x3 stride-2 convs"
    fo = fi // 2
    pad = 2 * fi
    wp = jnp.pad(w, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    outs = []
    for p in range(fo):
        r0 = pad - fi + 1 - 2 * p  # di index of packed tap t=0 (t=fi*u+a)
        for q in range(fo):
            c0 = pad - fi + 1 - 2 * q
            blk = wp[r0:r0 + 2 * fi, c0:c0 + 2 * fi]  # (2fi, 2fi, cin, cout)
            blk = blk.reshape(2, fi, 2, fi, cin, cout)  # (u, a, v, b, ...)
            blk = blk.transpose(0, 2, 1, 3, 4, 5)       # (u, v, a, b, ...)
            outs.append(blk.reshape(2, 2, fi * fi * cin, cout))
    # out-channel layout (p*fo + q)*cout + o == fo-packing of the output
    return jnp.concatenate(outs, axis=-1)


def repack_conv_kernel(w: jnp.ndarray, stride: int, fi: int, fo: int,
                       in_segments=None):
    """General packed-domain rewrite of a SAME conv kernel.

    Input:  `w` of shape (k, k, cin, cout), k in {1, 3}, evaluated with
    `stride` and SAME padding on the UNPACKED map. Returns
    (w_packed, s_packed, pad) such that a conv of the fi-packed input
    with `w_packed`, stride `s_packed`, padding `pad` produces the
    fo-packed output exactly.

    Derivation (rows; columns identical): output original row
    R = fo*i + p (i = packed output row, p = output phase) reads input
    original rows stride*R + d - k//2, d in [0, k). With stride*fo ==
    s_packed*fi, the input packed row is s_packed*i + u_rel where
    u_rel = floor((stride*p + d - k//2) / fi) and the input phase is
    a = (stride*p + d - k//2) mod fi — each original tap (p, d) maps to
    exactly one packed tap (u_rel, a), zero elsewhere.

    `in_segments`: packed-input channel layout as [(phases_f, channels)]
    segments in canonical channel order — e.g. [(2, 16), (2, 16)] for a
    channel-concat of two 2-packed tensors. Default: one phase-major
    segment [(fi, cin)]. Output layout is always phase-major.
    """
    k, k2, cin, cout = w.shape
    assert k == k2 and k in (1, 3)
    assert (stride * fo) % fi == 0, (stride, fi, fo)
    s_packed = stride * fo // fi
    if in_segments is None:
        in_segments = [(fi, cin)]
    assert sum(c for _, c in in_segments) == cin
    assert all(f == fi for f, _ in in_segments), \
        "mixed input pack factors are not supported"

    offs = [0]
    for f, c in in_segments:
        offs.append(offs[-1] + f * f * c)

    taps = {}  # (p, d) -> (u_rel, a)
    u_min = u_max = 0
    for p in range(fo):
        for d in range(k):
            c = stride * p + d - k // 2
            u, a = c // fi, c % fi
            taps[(p, d)] = (u, a)
            u_min, u_max = min(u_min, u), max(u_max, u)
    kp = u_max - u_min + 1
    pad = (-u_min, kp - 1 + u_min) if s_packed == 1 else (-u_min, u_max)
    # (for stride>1 SAME-consistency the high pad just needs to cover the
    #  last window; (-u_min, u_max) does for the shapes used here — the
    #  exactness tests pin it.)

    cin_packed = offs[-1]
    wp = jnp.zeros((kp, kp, cin_packed, fo * fo * cout), w.dtype)
    for p in range(fo):
        for q in range(fo):
            for di in range(k):
                u, a = taps[(p, di)]
                for dj in range(k):
                    v, b = taps[(q, dj)]
                    col = (p * fo + q) * cout
                    can0 = 0
                    for si, (f, cs) in enumerate(in_segments):
                        row = offs[si] + (a * f + b) * cs
                        wp = wp.at[
                            u - u_min, v - u_min,
                            row:row + cs, col:col + cout,
                        ].set(w[di, dj, can0:can0 + cs, :])
                        can0 += cs
    return wp, s_packed, pad


class GPackedConvBNSiLU(nn.Module):
    """ConvBNSiLU evaluated in packed domain for arbitrary (kernel,
    stride, fi, fo). Parameter tree is IDENTICAL to `ConvBNSiLU` (conv/
    {kernel, bias}, bn/{scale, bias} + batch_stats over the canonical
    feature axis), so checkpoints are interchangeable with the unpacked
    model. `in_segments` describes a channel-concat packed input layout
    (see repack_conv_kernel); output is phase-major fo-packed (natural
    when fo == 1)."""

    features: int
    kernel: int = 3
    stride: int = 1
    packed_in: int = 2
    packed_out: int = 2
    use_bias: bool = False
    in_segments: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fi, fo = self.packed_in, self.packed_out
        segs = (self.in_segments if self.in_segments is not None
                else ((fi, x.shape[-1] // (fi * fi)),))
        cin = sum(c for _, c in segs)
        cout = self.features
        fan_in = cin * self.kernel * self.kernel

        conv = _ConvParams(cout, cin, self.use_bias, fan_in,
                           kernel_size=self.kernel, name="conv")
        kernel, bias = conv()
        wp, s_packed, pad = repack_conv_kernel(
            kernel, self.stride, fi, fo, in_segments=list(segs))
        wp = wp.astype(self.dtype)
        from yolo_from_scratch_tpu.ops.conv_bwd import (
            conv3x3_same,
            use_fused_bwd,
        )

        if (wp.shape[:2] == (3, 3) and s_packed == 1 and pad == (1, 1)
                and use_fused_bwd(3, 1, wp.shape[2], wp.shape[3],
                                  x.shape[1], x.shape[2], self.dtype)):
            # the packed C3a bottleneck 3x3s (64ch @80x80): identical
            # forward conv, fused Pallas backward (ops/conv_bwd.py) —
            # gradients flow through repack_conv_kernel's gather as usual
            y = conv3x3_same(x.astype(self.dtype), wp)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wp, (s_packed, s_packed), (pad, pad),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, wp.shape, ("NHWC", "HWIO", "NHWC")))
        if bias is not None:
            y = y + jnp.tile(bias, fo * fo).astype(self.dtype)
        return BNSiLU(features=cout, phases=fo * fo, dtype=self.dtype,
                      name="bn")(y, train)


class PackedBottleneck(nn.Module):
    """`Bottleneck` in fo-packed domain: residual add is exact under the
    phase permutation. Param tree matches `Bottleneck` (conv1/conv2)."""

    features: int
    shortcut: bool = True
    packed: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.packed
        cin = x.shape[-1] // (f * f)
        y = GPackedConvBNSiLU(self.features, 3, 1, f, f, dtype=self.dtype,
                              name="conv1")(x, train)
        y = GPackedConvBNSiLU(self.features, 3, 1, f, f, dtype=self.dtype,
                              name="conv2")(y, train)
        return x + y if (self.shortcut and cin == self.features) else y


class PackedC3(nn.Module):
    """`C3` in packed domain. conv1/conv2 read the (possibly concat-
    layout) input; their outputs are phase-major packed, concatenated
    along channels, and conv3 consumes that two-segment layout directly —
    no unpack/repack transposes anywhere. Param tree matches `C3`."""

    features: int
    n: int = 1
    shortcut: bool = True
    packed: int = 2
    in_segments: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.packed
        hidden = self.features // 2
        segs = self.in_segments
        x1 = GPackedConvBNSiLU(hidden, 1, 1, f, f, in_segments=segs,
                               dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.n):
            x1 = PackedBottleneck(hidden, self.shortcut, f, self.dtype,
                                  name=f"bottleneck{i}")(x1, train)
        x2 = GPackedConvBNSiLU(hidden, 1, 1, f, f, in_segments=segs,
                               dtype=self.dtype, name="conv2")(x, train)
        y = jnp.concatenate([x1, x2], axis=-1)
        return GPackedConvBNSiLU(
            self.features, 1, 1, f, f,
            in_segments=((f, hidden), (f, hidden)),
            dtype=self.dtype, name="conv3")(y, train)


class PackedConvBNSiLU(nn.Module):
    """Drop-in ConvBNSiLU for a stride-2 3x3 conv, evaluated in packed
    domain. Input: fi-packed (B, H, W, fi*fi*cin); output: fo-packed
    (B, H, W, fo*fo*features), natural layout when fi == 2.

    Parameter tree matches `ConvBNSiLU` exactly: conv/{kernel, bias} in
    canonical (3, 3, cin, features) shape, bn/{scale, bias} and
    batch_stats bn/{mean, var} over the canonical feature axis.
    """

    features: int
    packed_in: int  # fi: space-to-depth factor of the input layout
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fi = self.packed_in
        fo = fi // 2
        cin = x.shape[-1] // (fi * fi)
        cout = self.features
        fan_in = cin * 9  # matches ConvBNSiLU's fan_in on the unpacked input

        conv = _ConvParams(cout, cin, self.use_bias, fan_in, name="conv")
        kernel, bias = conv()
        w2 = pack_conv_kernel(kernel, fi).astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=dn)
        if bias is not None:
            y = y + jnp.tile(bias, fo * fo).astype(self.dtype)
        return BNSiLU(features=cout, phases=fo * fo, dtype=self.dtype,
                      name="bn")(y, train)


class _ConvParams(nn.Module):
    """Declares conv params under this module's scope with the same names,
    shapes, and initializers as nn.Conv inside ConvBNSiLU."""

    features: int
    cin: int
    use_bias: bool
    fan_in: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, self.cin, self.features),
            jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init_for(self.fan_in), (self.features,),
                jnp.float32)
        return kernel, bias


class _PackedBN(nn.Module):
    """BatchNorm over the canonical feature axis of a phase-packed tensor:
    the (..., phases*features) input's statistics are reduced over batch,
    space, AND phases, reproducing what flax BatchNorm computes on the
    unpacked tensor (fp32 fast-variance stats, momentum running update,
    same parameter/batch_stats names)."""

    features: int
    phases: int
    dtype: jnp.dtype = jnp.float32
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, train: bool):
        c, ph = self.features, self.phases
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (ph, c))
            # reduce over batch, space, and phases == unpacked (B, H, W)
            red = tuple(range(xf.ndim - 1))
            mu = jnp.mean(xf, axis=red)
            mu2 = jnp.mean(jnp.square(xf), axis=red)
            var = jnp.maximum(0.0, mu2 - jnp.square(mu))
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mu)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mu, var = ra_mean.value, ra_var.value

        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - jnp.tile(mu, ph)) * jnp.tile(mul, ph) \
            + jnp.tile(bias, ph)
        return y.astype(self.dtype)
