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
  call for round/clip -> int8 conv (int32 accumulate on the MXU) ->
  per-channel dequant + folded bias -> SiLU, at trace time. The model
  graph (models/yolo.py) is never duplicated or modified; the final
  per-head 1x1 `pred` conv and the packed stem stay float (standard
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


def _is_conv_call(context):
    return (isinstance(context.module, ConvBNSiLU)
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
    xf = x.astype(dt)
    inv = (1.0 / q["a_scale"]).astype(dt)
    xq = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    pad = mod.kernel // 2
    dn = jax.lax.conv_dimension_numbers(
        xq.shape, q["w_int8"].shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        xq, q["w_int8"], (mod.stride, mod.stride),
        ((pad, pad), (pad, pad)), dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    scale = (q["a_scale"] * q["w_scale"]).astype(dt)
    yf = y.astype(dt) * scale + q["bias"].astype(dt)
    return nn.silu(yf).astype(mod.dtype)


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
                    return _quant_conv_silu(args[0], qtree[key],
                                            context.module)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(icpt):
            return model.apply(variables, imgs, train=False)

    return apply_fn


def quantize_model(model, variables, calib_batches, skip=(),
                   percentile=None, select=None):
    """One-call PTQ: calibrate + quantize. Returns (bundle, apply_fn)
    where bundle = (variables, qtree) is the serving state pytree."""
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
