"""YOLOv5-style FPN detector as a single jitted XLA graph.

Graph parity with the reference model (reference: train.py:308-632):
stem (2 stride-2 convs) -> backbone P3/P4/P5 -> SPPF -> FPN top-down with
laterals -> PANet bottom-up -> three heads (2 ConvBlocks + 1x1 conv with
bias). Head outputs are reshaped to (B, H, W, A, 5+nc).

TPU-first differences from the reference:
- NHWC activations end to end (TPU conv layout), channels are multiples
  of 8 by construction (reference make_divisible), padding to MXU tiles is
  left to XLA;
- no registered grid/anchor buffers — anchors are config constants baked
  into the traced decode (reference keeps them as state_dict buffers,
  train.py:367, 386-388);
- the whole forward is one pure function of (variables, images), so jit /
  grad / pjit compose directly.

Head bias init: objectness prior p=0.01 -> bias = -log((1-p)/p) ~= -4.595
(reference: train.py:519-566); class biases 0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_from_scratch_tpu.config import YoloConfig
from yolo_from_scratch_tpu.models.blocks import (
    C3,
    SPPF,
    ConvBNSiLU,
    torch_kernel_init,
    upsample_nearest_2x,
)


def _head_bias_init(num_anchors: int, num_classes: int, prior: float = 0.01):
    """Final-conv bias: objectness channel -log((1-p)/p), everything else 0."""
    obj_bias = -math.log((1.0 - prior) / prior)

    def init(key, shape, dtype=jnp.float32):
        bias = np.zeros(shape, np.float32).reshape(num_anchors, 5 + num_classes)
        bias[:, 4] = obj_bias
        return jnp.asarray(bias.reshape(shape), dtype)

    return init


class DetectHead(nn.Module):
    """2x ConvBNSiLU(3x3) + 1x1 conv(bias) -> (B, H, W, A, 5+nc)
    (reference: train.py:452-466, 602-629)."""

    channels: int
    num_anchors: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNSiLU(self.channels, 3, dtype=self.dtype, name="conv2")(x, train)
        out_ch = self.num_anchors * (5 + self.num_classes)
        x = nn.Conv(
            out_ch,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_kernel_init,
            bias_init=_head_bias_init(self.num_anchors, self.num_classes),
            name="pred",
        )(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.num_anchors, 5 + self.num_classes)


class YOLO(nn.Module):
    """Full detector. `__call__(images NHWC in [0,1]) -> [p3, p4, p5]`."""

    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dt)

        # ===== Backbone =====
        # Stem: two stride-2 convs (reference: train.py:401-404; raw convs
        # with bias before BN, kept for parity). With cfg.packed_stem the
        # same math runs in space-to-depth packed layout (models/packed.py)
        # on host-packed input — identical parameters and numerics, ~6x
        # faster stem on TPU (the unpacked 640x640x3 layout is measured
        # 34x off its roofline floor).
        if cfg.packed_stem:
            from yolo_from_scratch_tpu.models.packed import (
                PACK_FACTOR,
                GPackedConvBNSiLU,
                PackedC3,
                PackedConvBNSiLU,
                pack_s2d,
                unpack_s2d,
            )

            if x.shape[-1] == 3:  # correctness fallback: pack on device
                x = pack_s2d(x, PACK_FACTOR)
            x = PackedConvBNSiLU(cfg.c_stem // 2, packed_in=4, use_bias=True,
                                 dtype=dt, name="stem0")(x, train)
            if cfg.packed_interior:
                # stay 2x2-packed through the 160x160 stage: stem1 emits
                # the packed map, C3a runs packed, bb_p3_down consumes it
                x = GPackedConvBNSiLU(cfg.c_stem, 3, 2, packed_in=2,
                                      packed_out=2, use_bias=True, dtype=dt,
                                      name="stem1")(x, train)
            else:
                x = PackedConvBNSiLU(cfg.c_stem, packed_in=2, use_bias=True,
                                     dtype=dt, name="stem1")(x, train)
        else:
            x = ConvBNSiLU(cfg.c_stem // 2, 3, 2, use_bias=True, dtype=dt,
                           name="stem0")(x, train)
            x = ConvBNSiLU(cfg.c_stem, 3, 2, use_bias=True, dtype=dt,
                           name="stem1")(x, train)

        # P3: stride 4 -> 8 (reference: train.py:406-410). With
        # cfg.packed_p3 the whole 80x80 (stride-8) level stays 2x2-packed
        # — its 32-channel 3x3 convs underfill the 128 MXU lanes 4x
        # unpacked (decision data in the packed_p3 config docstring).
        p3_packed = cfg.packed_stem and cfg.packed_interior and cfg.packed_p3
        if cfg.packed_stem and cfg.packed_interior:
            x = PackedC3(cfg.c_stem, cfg.repeats(1), dtype=dt,
                         name="bb_p3_c3a")(x, train)
            x = GPackedConvBNSiLU(cfg.c_p3, 3, 2, packed_in=2,
                                  packed_out=2 if p3_packed else 1,
                                  use_bias=True, dtype=dt,
                                  name="bb_p3_down")(x, train)
        else:
            x = C3(cfg.c_stem, cfg.repeats(1), dtype=dt, name="bb_p3_c3a")(
                x, train)
            x = ConvBNSiLU(cfg.c_p3, 3, 2, use_bias=True, dtype=dt,
                           name="bb_p3_down")(x, train)
        if p3_packed:
            p3_backbone = PackedC3(cfg.c_p3, cfg.repeats(2), dtype=dt,
                                   name="bb_p3_c3b")(x, train)
            x = GPackedConvBNSiLU(cfg.c_p4, 3, 2, packed_in=2, packed_out=1,
                                  use_bias=True, dtype=dt,
                                  name="bb_p4_down")(p3_backbone, train)
        else:
            p3_backbone = C3(cfg.c_p3, cfg.repeats(2), dtype=dt,
                             name="bb_p3_c3b")(x, train)
            # P4: stride 8 -> 16 (reference: train.py:412-415)
            x = ConvBNSiLU(cfg.c_p4, 3, 2, use_bias=True, dtype=dt,
                           name="bb_p4_down")(p3_backbone, train)
        p4_backbone = C3(cfg.c_p4, cfg.repeats(2), dtype=dt, name="bb_p4_c3")(x, train)

        # P5: stride 16 -> 32 + SPPF (reference: train.py:417-422)
        x = ConvBNSiLU(cfg.c_p5, 3, 2, use_bias=True, dtype=dt, name="bb_p5_down")(
            p4_backbone, train
        )
        p5_backbone = C3(cfg.c_p5, cfg.repeats(1), dtype=dt, name="bb_p5_c3")(x, train)
        p5_backbone = SPPF(cfg.c_p5, dtype=dt, name="sppf")(p5_backbone, train)

        # ===== FPN top-down (reference: train.py:426-438, 578-589) =====
        p4_lateral = ConvBNSiLU(cfg.c_p4, 1, dtype=dt, name="lateral_p4")(
            p4_backbone, train
        )
        if p3_packed:
            p3_lateral = GPackedConvBNSiLU(cfg.c_p3, 1, 1, packed_in=2,
                                           packed_out=2, dtype=dt,
                                           name="lateral_p3")(
                p3_backbone, train)
        else:
            p3_lateral = ConvBNSiLU(cfg.c_p3, 1, dtype=dt, name="lateral_p3")(
                p3_backbone, train
            )

        p5_red = ConvBNSiLU(cfg.c_p4, 1, dtype=dt, name="reduce_p5_for_p4")(
            p5_backbone, train
        )
        p4_fpn = C3(cfg.c_p4, cfg.repeats(1), dtype=dt, name="merge_p4")(
            jnp.concatenate([upsample_nearest_2x(p5_red), p4_lateral], axis=-1), train
        )

        p4_red = ConvBNSiLU(cfg.c_p3, 1, dtype=dt, name="reduce_p4_for_p3")(
            p4_fpn, train
        )
        if p3_packed:
            # 2x nearest upsample in 2x2-packed layout: every output
            # phase (a, b) of packed cell (i, j) reads source (i, j) —
            # the packed upsample is a pure channel tile (phase-major),
            # exactly pack_s2d(upsample_nearest_2x(y))
            up = jnp.concatenate([p4_red] * 4, axis=-1)
            p3_fpn = PackedC3(
                cfg.c_p3, cfg.repeats(1),
                in_segments=((2, cfg.c_p3), (2, cfg.c_p3)), dtype=dt,
                name="merge_p3")(
                jnp.concatenate([up, p3_lateral], axis=-1), train)
            p3_head_in = unpack_s2d(p3_fpn, 2)
        else:
            p3_fpn = C3(cfg.c_p3, cfg.repeats(1), dtype=dt, name="merge_p3")(
                jnp.concatenate([upsample_nearest_2x(p4_red), p3_lateral], axis=-1), train
            )
            p3_head_in = p3_fpn

        # ===== PANet bottom-up (reference: train.py:442-447, 591-598) =====
        if p3_packed:
            p3_down = GPackedConvBNSiLU(cfg.c_p3, 3, 2, packed_in=2,
                                        packed_out=1, dtype=dt,
                                        name="downsample_p3_to_p4")(
                p3_fpn, train)
        else:
            p3_down = ConvBNSiLU(cfg.c_p3, 3, 2, dtype=dt,
                                 name="downsample_p3_to_p4")(p3_fpn, train)
        p4_panet = C3(cfg.c_p4, cfg.repeats(1), dtype=dt, name="panet_merge_p4")(
            jnp.concatenate([p3_down, p4_fpn], axis=-1), train
        )

        p4_down = ConvBNSiLU(cfg.c_p4, 3, 2, dtype=dt, name="downsample_p4_to_p5")(
            p4_panet, train
        )
        # Note: the P5 PANet merge concatenates with the post-SPPF backbone
        # P5, not an FPN P5 (reference: train.py:598).
        p5_panet = C3(cfg.c_p5, cfg.repeats(1), dtype=dt, name="panet_merge_p5")(
            jnp.concatenate([p4_down, p5_backbone], axis=-1), train
        )

        # ===== Heads (reference: train.py:452-466, 600-632) =====
        na, nc = cfg.num_anchors, cfg.num_classes
        if cfg.head_type == "anchor_free":
            from yolo_from_scratch_tpu.models.anchor_free import (
                DecoupledHead,
                v8_cls_prior,
            )

            # per-scale v8 bias prior (see DecoupledHead.cls_prior)
            pr = lambda s: v8_cls_prior(nc, cfg.img_size, s)
            out_p3 = DecoupledHead(cfg.c_p3, nc, dtype=dt,
                                   cls_prior=pr(8), name="head_p3")(
                p3_head_in, train
            )
            out_p4 = DecoupledHead(cfg.c_p4, nc, dtype=dt,
                                   cls_prior=pr(16), name="head_p4")(
                p4_panet, train
            )
            out_p5 = DecoupledHead(cfg.c_p5, nc, dtype=dt,
                                   cls_prior=pr(32), name="head_p5")(
                p5_panet, train
            )
        else:
            out_p3 = DetectHead(cfg.c_p3, na, nc, dtype=dt, name="head_p3")(
                p3_head_in, train
            )
            out_p4 = DetectHead(cfg.c_p4, na, nc, dtype=dt, name="head_p4")(
                p4_panet, train
            )
            out_p5 = DetectHead(cfg.c_p5, na, nc, dtype=dt, name="head_p5")(
                p5_panet, train
            )

        gs3, gs4, gs5 = cfg.grid_sizes
        assert out_p3.shape[1:3] == (gs3, gs3), (out_p3.shape, gs3)
        assert out_p4.shape[1:3] == (gs4, gs4), (out_p4.shape, gs4)
        assert out_p5.shape[1:3] == (gs5, gs5), (out_p5.shape, gs5)

        # Heads return fp32 so loss/decode run in full precision even when
        # the conv path computes in bf16.
        return [out_p3.astype(jnp.float32), out_p4.astype(jnp.float32),
                out_p5.astype(jnp.float32)]


def init_model(rng, cfg: YoloConfig, batch_size: int = 1):
    """Initialize model variables. Returns flax variables dict with
    'params' and 'batch_stats' collections."""
    model = YOLO(cfg)
    dummy = jnp.zeros((batch_size, cfg.img_size, cfg.img_size, 3), jnp.float32)
    return model, model.init(rng, dummy, train=False)


def count_params(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def ensure_detection_biases(params, cfg: YoloConfig, log=print):
    """Repair a params tree whose detection-head final-conv bias is missing
    or None (e.g. a hand-edited/degenerate checkpoint), re-creating it with
    the objectness-prior init — the reference repairs and warns the same
    way in `initialize_detection_biases` (reference: train.py:543-549).
    Anchor heads only; returns the (possibly repaired) params."""
    if cfg.head_type != "anchor":
        return params
    from yolo_from_scratch_tpu.config import NUM_ANCHORS_PER_SCALE as NA

    init = _head_bias_init(NA, cfg.num_classes)
    out_ch = NA * (5 + cfg.num_classes)
    for head in ("head_p3", "head_p4", "head_p5"):
        pred = params.get(head, {}).get("pred")
        if pred is None:
            continue
        if pred.get("bias") is None:
            pred["bias"] = init(None, (out_ch,), jnp.float32)
            log("Warning: Detection head bias was None, created new bias "
                "parameter")
    return params
