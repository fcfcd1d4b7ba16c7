"""Post-training int8 quantization for the serving path.

Why: the v5e MXU runs int8 at 2x the bf16 rate (394 TOPS vs 197
TFLOP/s), and `benchmarks/quantbench.py` measures that XLA-lowered int8
convolutions actually realize ~1.9x aggregate (4.4x on the hot 3x3s) at
the 's' model's shapes. The reference has no quantization story at all;
this module gives the TPU framework one without touching the model
definition:

- **BN folding**: each ConvBNSiLU collapses to conv(W', b') with
  W' = W * gamma/sqrt(var+eps) per out-channel, b' = (b0-mean)*s + beta
  — inference-only algebra, exact.
- **Weights**: symmetric per-out-channel int8 (scale = max|W'_c|/127).
- **Activations**: symmetric per-tensor int8, scales calibrated by
  running representative images through the float model and recording
  each conv input's abs-max.
- **Execution**: `flax.linen.intercept_methods` swaps every ConvBNSiLU
  call — including the packed-layout blocks (GPackedConvBNSiLU /
  PackedConvBNSiLU, whose canonical int8 kernels repack exactly) — for
  round/clip -> int8 conv (int32 accumulate on the MXU) -> per-channel
  dequant + folded bias -> SiLU, at trace time. The model graph
  (models/yolo.py) is never duplicated or modified; the first conv
  ("stem0") and the per-head 1x1 `pred` convs stay float (standard
  first/last-layer practice, and both are a tiny FLOP share).

The quantized state is a flat pytree {path: {w_int8, w_scale, bias,
a_scale}} that jits, shards, and exports like any other pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_from_scratch_tpu.models.blocks import BN_EPS, ConvBNSiLU
from yolo_from_scratch_tpu.models.packed import (
    GPackedConvBNSiLU,
    PackedConvBNSiLU,
    pack_conv_kernel,
    repack_conv_kernel,
)

# The packed-layout conv blocks (models/packed.py) hold the SAME canonical
# (k, k, cin, cout) parameters as ConvBNSiLU and repack them at trace
# time. Repacking is a pure rearrangement (with zero taps), so an int8
# canonical kernel repacks into an exact int8 packed kernel, and the
# int32 MXU accumulation makes the packed int8 graph bit-identical to
# the unpacked int8 graph (tests/test_quantize.py).
_QUANT_MODULE_TYPES = (ConvBNSiLU, GPackedConvBNSiLU, PackedConvBNSiLU)


def _is_conv_call(context):
    return (isinstance(context.module, _QUANT_MODULE_TYPES)
            and context.method_name == "__call__")


def make_calibration_fn(model, percentile=None):
    """Jitted (variables, imgs) -> {path: activation statistic of the
    conv input} — abs-max by default, or the given percentile of |x|
    (e.g. 99.9: clips rare outliers so the int8 range covers the bulk of
    the distribution at finer granularity; standard PTQ practice).

    Interception happens at trace time, so the recorded statistics are
    traced values returned as ordinary outputs of one compiled program."""

    def stat(x):
        ax = jnp.abs(x.astype(jnp.float32))
        if percentile is None:
            return jnp.max(ax)
        return jnp.percentile(ax.reshape(-1), percentile)

    def calib(variables, imgs):
        rec = {}

        def icpt(next_fun, args, kwargs, context):
            if _is_conv_call(context):
                key = "/".join(context.module.path)
                m = stat(args[0])
                rec[key] = jnp.maximum(rec[key], m) if key in rec else m
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(icpt):
            model.apply(variables, imgs, train=False)
        return rec

    return jax.jit(calib)


def calibrate(model, variables, batches, percentile=None):
    """Run calibration batches (list of (B,S,S,C) float arrays in [0,1])
    through the float model; returns {path: a_scale} activation scales.
    `percentile`: clip outliers at this percentile of |x| instead of the
    abs-max (per batch; the max across batches is kept)."""
    fn = make_calibration_fn(model, percentile)
    maxes = {}
    for imgs in batches:
        rec = jax.device_get(fn(variables, jnp.asarray(imgs)))
        for key, val in rec.items():
            maxes[key] = max(maxes.get(key, 0.0), float(val))
    return {key: max(val, 1e-8) / 127.0 for key, val in maxes.items()}


def _tree_get(tree, path_key):
    node = tree
    for part in path_key.split("/"):
        if part:  # "" = root module (bare ConvBNSiLU under test)
            node = node[part]
    return node


def mxu_bound_select(key, kernel_shape):
    """Quantization predicate: only the 3x3 convs with >=64 input
    channels — the MXU-bound layers where the int8 rate doubles
    throughput. The HBM-bound 1x1s and narrow early convs gain nothing
    from int8 compute but still pay the requant elementwise traffic, so
    leaving them bf16 is strictly faster (measured in BASELINE.md)."""
    kh, kw, cin, cout = kernel_shape
    return kh >= 3 and cin >= 64


def quantize_params(variables, a_scales, skip=(), select=None):
    """Fold BN and quantize weights for every calibrated ConvBNSiLU.

    Returns the quantized pytree {path: {w_int8 (H,W,I,O) int8,
    w_scale (O,) f32, bias (O,) f32, a_scale () f32}}. Paths listed in
    `skip` — or rejected by `select(key, kernel_shape)` (e.g.
    `mxu_bound_select`) — stay float (they fall through to the normal
    module call at zero added cost)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    qtree = {}
    for key, a_scale in a_scales.items():
        if key in skip:
            continue
        p = _tree_get(params, key)
        kernel = np.asarray(p["conv"]["kernel"], np.float32)
        if select is not None and not select(key, kernel.shape):
            continue
        b0 = np.asarray(p["conv"].get("bias", np.zeros(kernel.shape[-1])),
                        np.float32)
        gamma = np.asarray(p["bn"]["scale"], np.float32)
        beta = np.asarray(p["bn"]["bias"], np.float32)
        s = _tree_get(stats, key)
        mean = np.asarray(s["bn"]["mean"], np.float32)
        var = np.asarray(s["bn"]["var"], np.float32)

        fold = gamma / np.sqrt(var + BN_EPS)  # (O,)
        w = kernel * fold  # fold BN scale into the conv weights
        bias = (b0 - mean) * fold + beta

        w_scale = np.maximum(
            np.max(np.abs(w), axis=(0, 1, 2)), 1e-12
        ) / 127.0
        w_int8 = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        qtree[key] = {
            "w_int8": jnp.asarray(w_int8),
            "w_scale": jnp.asarray(w_scale, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32),
            "a_scale": jnp.asarray(a_scale, jnp.float32),
        }
    return qtree


def _quant_input(x, q, dt):
    """Per-tensor symmetric int8 activation quantization in the compute
    dtype (quantized integers ≤127 are exact in bf16)."""
    inv = (1.0 / q["a_scale"]).astype(dt)
    return jnp.clip(jnp.round(x.astype(dt) * inv), -127, 127).astype(jnp.int8)


def _int8_conv(xq, wq, strides, padding):
    dn = jax.lax.conv_dimension_numbers(
        xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def _dequant_silu(y, q, dt, phases=1):
    """Per-out-channel dequant + folded bias + SiLU. The packed blocks'
    output channels are phase-major tiles of the canonical couts, so the
    per-channel vectors tile by `phases`."""
    scale = (q["a_scale"] * q["w_scale"]).astype(dt)
    bias = q["bias"].astype(dt)
    if phases > 1:
        scale, bias = jnp.tile(scale, phases), jnp.tile(bias, phases)
    return nn.silu(y.astype(dt) * scale + bias).astype(dt)


def _quant_conv_silu(x, q, mod):
    """int8 ConvBNSiLU body: quantize input, int8 conv (int32 MXU
    accumulate), per-channel dequant + folded bias, SiLU.

    The requant elementwise chains run in the module's compute dtype
    (bf16 on the serving path): the 's' model is HBM-bound, so the
    quant/dequant passes must not double the activation byte traffic by
    widening to f32. Quantized integers ≤ 127 are exact in bf16 (8
    mantissa bits cover ±256), so rounding in bf16 costs at most the
    same ±0.5-unit noise the quantization itself already has."""
    dt = jnp.dtype(mod.dtype)
    xq = _quant_input(x, q, dt)
    pad = mod.kernel // 2
    y = _int8_conv(xq, q["w_int8"], (mod.stride, mod.stride),
                   ((pad, pad), (pad, pad)))
    return _dequant_silu(y, q, dt)


def _quant_gpacked_conv_silu(x, q, mod):
    """int8 GPackedConvBNSiLU body: the canonical int8 kernel repacks
    exactly (rearrangement with zero taps preserves int8 values);
    everything else mirrors models/packed.py's float body."""
    dt = jnp.dtype(mod.dtype)
    fi, fo = mod.packed_in, mod.packed_out
    segs = (mod.in_segments if mod.in_segments is not None
            else ((fi, x.shape[-1] // (fi * fi)),))
    wq, s_packed, pad = repack_conv_kernel(
        q["w_int8"], mod.stride, fi, fo, in_segments=list(segs))
    xq = _quant_input(x, q, dt)
    y = _int8_conv(xq, wq, (s_packed, s_packed), (pad, pad))
    return _dequant_silu(y, q, dt, phases=fo * fo)


def _quant_packed_stem_conv_silu(x, q, mod):
    """int8 PackedConvBNSiLU body (stride-2 3x3 in packed domain)."""
    dt = jnp.dtype(mod.dtype)
    fi = mod.packed_in
    fo = fi // 2
    wq = pack_conv_kernel(q["w_int8"], fi)
    xq = _quant_input(x, q, dt)
    y = _int8_conv(xq, wq, (1, 1), ((1, 0), (1, 0)))
    return _dequant_silu(y, q, dt, phases=fo * fo)


def _quant_body_for(module):
    if isinstance(module, GPackedConvBNSiLU):
        return _quant_gpacked_conv_silu
    if isinstance(module, PackedConvBNSiLU):
        return _quant_packed_stem_conv_silu
    return _quant_conv_silu


def make_quant_apply(model):
    """Returns apply_fn((variables, qtree), imgs) -> model outputs, with
    every quantized ConvBNSiLU swapped for the int8 body at trace time.
    Drop-in for the `apply_fn` hook of make_(batch_)postprocess."""

    def apply_fn(bundle, imgs):
        variables, qtree = bundle

        def icpt(next_fun, args, kwargs, context):
            if _is_conv_call(context):
                key = "/".join(context.module.path)
                if key in qtree:
                    body = _quant_body_for(context.module)
                    return body(args[0], qtree[key], context.module)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(icpt):
            return model.apply(variables, imgs, train=False)

    return apply_fn


def quantize_model(model, variables, calib_batches, skip=("stem0",),
                   percentile=None, select=None):
    """One-call PTQ: calibrate + quantize. Returns (bundle, apply_fn)
    where bundle = (variables, qtree) is the serving state pytree.

    Default skip: the first conv ("stem0", packed or not) stays float —
    standard first-layer PTQ practice; the per-head 1x1 `pred` convs are
    raw nn.Conv (never intercepted) so the last layer is float always."""
    a_scales = calibrate(model, variables, calib_batches,
                         percentile=percentile)
    qtree = quantize_params(variables, a_scales, skip=skip, select=select)
    return (variables, qtree), make_quant_apply(model)


def calib_batches_from_images(images, img_size, batch_size=8,
                              packed_stem=False):
    """Letterbox image files/PIL images into calibration batches matching
    the serving input layout."""
    from PIL import Image

    from yolo_from_scratch_tpu.data.letterbox import letterbox_image

    arrs = []
    for im in images:
        pil = (Image.open(im).convert("RGB")
               if not hasattr(im, "size") else im.convert("RGB"))
        arr, _, _, _ = letterbox_image(pil, img_size)
        arrs.append(arr.astype(np.float32) / 255.0)
    batches = []
    for i in range(0, len(arrs), batch_size):
        batch = np.stack(arrs[i : i + batch_size])
        if packed_stem:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            batch = pack_s2d_host(batch)
        batches.append(batch)
    return batches
