"""Fused Pallas decode kernel for the inference postprocess.

Fuses the per-scale chain the reference runs as separate torch ops
(reference: train.py:1152-1216): grid-cell decode, anchor scaling,
sigmoid(obj)/sigmoid(cls), class argmax, confidence gating, pixel-space
corner conversion, and un-letterboxing — one VMEM pass per scale, emitting
NMS-ready candidates.

Layout: candidates live along LANES. The raw head output (B=1, H, W, A,
5+nc) is reshaped host-side to (5+nc, N=H*W*A) so each channel is one
sublane row; grid coordinates are reconstructed from the lane index
(idx = (y*W + x)*A + a). Output is an (8, N) block:
rows 0-3 = x1,y1,x2,y2 (original-image pixels), row 4 = score
(obj*cls_max, NEG_INF where obj <= conf_threshold), row 5 = class id.

The pure-XLA path in infer/predict.py computes exactly the same values
(XLA fuses it well); this kernel exists for the postprocess-fusion story
and is validated against that path bit-for-bit in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_from_scratch_tpu.ops.nms import NEG_INF

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(h, w, a, nc, img_size, conf_threshold):
    inv_w, inv_h = 1.0 / w, 1.0 / h

    def kernel(anchors_ref, geom_ref, raw_ref, out_ref):
        # raw_ref: (5+nc, N) f32; anchors_ref: (2, A_pad) SMEM-ish VMEM rows;
        # geom_ref: (1, 4) SMEM [scale, pad_top, pad_left, valid_n]
        n = raw_ref.shape[1]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        anchor_i = idx % a
        cell = idx // a
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)

        sig = jax.nn.sigmoid
        tx = raw_ref[0:1, :]
        ty = raw_ref[1:2, :]
        tw = raw_ref[2:3, :]
        th = raw_ref[3:4, :]
        obj = sig(raw_ref[4:5, :])

        bx = ((sig(tx) * 2.0 - 0.5) + gx) * inv_w
        by = ((sig(ty) * 2.0 - 0.5) + gy) * inv_h

        # per-candidate anchor w/h via one-hot over the A anchors (gather of
        # vector values is not lowerable; A is 3)
        aw = jnp.zeros_like(bx)
        ah = jnp.zeros_like(bx)
        for k in range(a):
            sel = (anchor_i == k).astype(jnp.float32)
            aw = aw + sel * anchors_ref[0, k]
            ah = ah + sel * anchors_ref[1, k]
        bw = (aw / img_size) * jnp.square(2.0 * sig(tw))
        bh = (ah / img_size) * jnp.square(2.0 * sig(th))

        # class max/argmax over the nc class rows
        cls_max = sig(raw_ref[5:6, :])
        cls_id = jnp.zeros_like(bx)
        for c in range(1, nc):
            p = sig(raw_ref[5 + c : 6 + c, :])
            better = (p > cls_max).astype(jnp.float32)
            cls_max = jnp.maximum(cls_max, p)
            cls_id = cls_id * (1.0 - better) + better * c
        if nc == 1:
            cls_id = jnp.zeros_like(bx)

        scale = geom_ref[0, 0]
        pad_top = geom_ref[0, 1]
        pad_left = geom_ref[0, 2]
        valid_n = geom_ref[0, 3]

        cx_px, cy_px = bx * img_size, by * img_size
        w_px, h_px = bw * img_size, bh * img_size
        inv_scale = 1.0 / scale
        x1 = (cx_px - w_px * 0.5 - pad_left) * inv_scale
        y1 = (cy_px - h_px * 0.5 - pad_top) * inv_scale
        x2 = (cx_px + w_px * 0.5 - pad_left) * inv_scale
        y2 = (cy_px + h_px * 0.5 - pad_top) * inv_scale

        conf = obj * cls_max
        live = (obj > conf_threshold) & (idx.astype(jnp.float32) < valid_n)
        score = jnp.where(live, conf, NEG_INF)

        out_ref[0:1, :] = x1
        out_ref[1:2, :] = y1
        out_ref[2:3, :] = x2
        out_ref[3:4, :] = y2
        out_ref[4:5, :] = score
        out_ref[5:6, :] = cls_id
        out_ref[6:8, :] = jnp.zeros((2, n), jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "conf_threshold", "interpret"),
)
def fused_decode_scale(raw, anchors, img_size, scale, pad_top, pad_left,
                       conf_threshold=0.5, interpret=False):
    """Fused decode for ONE scale.

    Args:
        raw: (1, H, W, A, 5+nc) raw head output (fp32).
        anchors: (A, 2) pixel anchors.
        scale/pad_top/pad_left: letterbox geometry (traced scalars).

    Returns:
        (boxes (N, 4) px original-image corners, score (N,), cls (N,) int32)
        with score = NEG_INF where the objectness gate fails; N = H*W*A.
    """
    _, h, w, a, d = raw.shape
    nc = d - 5
    n = h * w * a
    n_pad = _round_up(n, LANE)

    flat = raw.reshape(n, d).T.astype(jnp.float32)  # (5+nc, N)
    flat = jnp.pad(flat, ((0, 0), (0, n_pad - n)))
    anchors_t = jnp.asarray(anchors, jnp.float32).T  # (2, A)
    anchors_t = jnp.pad(anchors_t, ((0, 0), (0, LANE - a)))
    geom = jnp.stack(
        [jnp.asarray(scale, jnp.float32),
         jnp.asarray(pad_top, jnp.float32),
         jnp.asarray(pad_left, jnp.float32),
         jnp.asarray(n, jnp.float32)]
    ).reshape(1, 4)

    out = pl.pallas_call(
        _make_kernel(h, w, a, nc, img_size, conf_threshold),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(anchors_t, geom, flat)

    boxes = out[0:4, :n].T
    score = out[4, :n]
    cls = out[5, :n].astype(jnp.int32)
    return boxes, score, cls
