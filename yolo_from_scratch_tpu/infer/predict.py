"""Single-image inference with cross-scale global NMS.

Pipeline parity with the reference `predict` (reference: train.py:1114-1250):
letterbox -> forward -> per-scale decode (with the CORRECT img_size, as the
reference does here, train.py:1154) -> sigmoid obj/cls -> objectness
confidence filter -> pixel coords -> un-letterbox -> conf = obj * cls ->
class-aware global NMS (IoU 0.4 default) -> (x1, y1, x2, y2, conf, cls)
tuples in original image coordinates.

TPU-first re-design: everything after the PIL letterbox happens inside ONE
jitted program with static shapes — decode + sigmoid fuse into the head
epilogue, the dynamic boolean filter becomes a score mask + top-k, and NMS
is the fixed-shape greedy kernel (`ops.nms`). Only the final (K, 6) block
crosses back to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolo_from_scratch_tpu.config import INV255, YoloConfig
from yolo_from_scratch_tpu.data.letterbox import letterbox_image
from yolo_from_scratch_tpu.models.yolo import YOLO
from yolo_from_scratch_tpu.ops.decode import decode_predictions
from yolo_from_scratch_tpu.ops.nms import NEG_INF, batched_nms_fixed


def default_topk(img_size: int, preds_per_cell: int = 3) -> int:
    """Static NMS candidate capacity per resolution. Total raw predictions
    are A * sum((S/8)^2 + (S/16)^2 + (S/32)^2) — 25,200 @640 / 100,800
    @1280 for the 3-anchor head; after the confidence prefilter a few
    thousand survive."""
    total = preds_per_cell * sum((img_size // s) ** 2 for s in (8, 16, 32))
    return min(total, 4096)


def _topk_fn(approx_topk):
    """Candidate selection for the NMS prefilter. Exact `lax.top_k` is the
    default (bit-parity with the reference's 'every above-threshold box'
    semantics under the capacity plan). `approx_topk=True` swaps in the
    TPU-native binned `lax.approx_max_k` (recall_target 0.95 over the true
    top-k) — a serving throughput knob: the conf gate means candidates
    beyond the real detections are NEG_INF padding, so the approximation
    only matters in scenes with more above-threshold boxes than k."""
    if approx_topk:
        return lambda score, k: jax.lax.approx_max_k(
            score, k, recall_target=0.95
        )
    return jax.lax.top_k


def make_postprocess(model: YOLO, cfg: YoloConfig, conf_threshold=0.5,
                     iou_threshold=0.4, topk=None, max_outputs=None,
                     use_pallas_nms=None, apply_fn=None, approx_topk=False):
    """Build the jitted forward+postprocess:
    (variables, img (1,S,S,3), scale, pad_top, pad_left)
      -> (boxes (K,4) px orig-image, scores (K,), classes (K,), valid (K,)).

    `use_pallas_nms`: None = auto (Pallas kernel on TPU, lax elsewhere).
    `apply_fn`: forward override, (variables, imgs) -> [p3, p4, p5] —
    the int8 path (infer/quantize.py) hooks in here; `variables` is then
    whatever pytree the override expects.
    """
    anchors = cfg.anchors_array
    img_size = cfg.img_size
    nc = cfg.num_classes
    per_cell = 1 if cfg.head_type == "anchor_free" else 3
    k = topk or default_topk(img_size, per_cell)
    max_out = max_outputs or k
    if use_pallas_nms is None:
        # the Pallas kernel uses the Mosaic TPU lowering — TPU only
        use_pallas_nms = jax.devices()[0].platform == "tpu"
    if use_pallas_nms:
        import functools

        from yolo_from_scratch_tpu.ops.nms_pallas import (
            batched_nms_fixed_pallas,
        )

        # candidates arrive straight out of lax.top_k (descending), so the
        # kernel can skip its sort + unsort scatter — exact, see
        # nms_keep_mask_pallas_batched(presorted=...)
        nms_fn = functools.partial(batched_nms_fixed_pallas, presorted=True)
    else:
        nms_fn = batched_nms_fixed

    forward = apply_fn or (lambda v, im: model.apply(v, im, train=False))

    @jax.jit
    def postprocess(variables, img, scale, pad_top, pad_left):
        if img.dtype == jnp.uint8:
            # uint8 ingress: 4x fewer host->device bytes per request (the
            # dominant cost through a constrained link — measured
            # benchmarks/rttbench.py); normalize matches the host loader
            # bit-for-bit (config.INV255)
            img = img.astype(jnp.float32) * INV255
        preds = forward(variables, img)

        if cfg.head_type == "anchor_free":
            from yolo_from_scratch_tpu.config import STRIDES
            from yolo_from_scratch_tpu.models.anchor_free import (
                decode_anchor_free,
            )

            boxes_all, cls_all = [], []
            for pred, stride in zip(preds, STRIDES):
                decoded = decode_anchor_free(pred, stride, img_size)
                flat = decoded.reshape(-1, 4 + nc)
                boxes_all.append(flat[:, 0:4])
                cls_all.append(jax.nn.sigmoid(flat[:, 4:]))
            boxes = jnp.concatenate(boxes_all)
            cls = jnp.concatenate(cls_all)
            cls_prob = jnp.max(cls, axis=1)
            cls_id = jnp.argmax(cls, axis=1).astype(jnp.int32)
            conf = cls_prob  # objectness folded into cls
            score = jnp.where(conf > conf_threshold, conf, NEG_INF)
        else:
            boxes_all, obj_all, cls_all = [], [], []
            for pred, anc in zip(preds, anchors):
                decoded = decode_predictions(pred, anc, img_size)
                flat = decoded.reshape(-1, 5 + nc)
                boxes_all.append(flat[:, 0:4])
                obj_all.append(jax.nn.sigmoid(flat[:, 4]))
                cls_all.append(jax.nn.sigmoid(flat[:, 5:]))

            boxes = jnp.concatenate(boxes_all)  # (M, 4) normalized cx cy w h
            obj = jnp.concatenate(obj_all)  # (M,)
            cls = jnp.concatenate(cls_all)  # (M, nc)

            if nc == 1:
                cls_prob = cls[:, 0]
                cls_id = jnp.zeros(cls.shape[0], jnp.int32)
            else:
                cls_prob = jnp.max(cls, axis=1)
                cls_id = jnp.argmax(cls, axis=1).astype(jnp.int32)

            # objectness confidence filter (reference: train.py:1167), then
            # combined confidence obj*cls (train.py:1216)
            conf = obj * cls_prob
            score = jnp.where(obj > conf_threshold, conf, NEG_INF)

        # normalized -> letterboxed pixels -> corners -> original image
        # coords (reference: train.py:1192-1213)
        cx, cy = boxes[:, 0] * img_size, boxes[:, 1] * img_size
        w, h = boxes[:, 2] * img_size, boxes[:, 3] * img_size
        x1 = (cx - w / 2 - pad_left) / scale
        y1 = (cy - h / 2 - pad_top) / scale
        x2 = (cx + w / 2 - pad_left) / scale
        y2 = (cy + h / 2 - pad_top) / scale
        corners = jnp.stack([x1, y1, x2, y2], axis=1)

        # static top-k prefilter feeding the fixed-shape NMS kernel
        top_scores, idx = _topk_fn(approx_topk)(score, k)
        return nms_fn(
            corners[idx], top_scores, cls_id[idx], iou_threshold, max_out
        )

    return postprocess


def make_batch_postprocess(model: YOLO, cfg: YoloConfig, conf_threshold=0.5,
                           iou_threshold=0.4, topk=None, max_outputs=300,
                           use_pallas_nms=None, apply_fn=None,
                           approx_topk=False):
    """Batched serving path: (variables, imgs (B, S, S, 3), scales (B,),
    pad_tops (B,), pad_lefts (B,)) -> per-image fixed-shape detections
    (boxes (B, K, 4), scores (B, K), classes (B, K), valid (B, K)).

    One forward over the whole batch, then the per-image decode/top-k
    vmapped across the batch, feeding a SINGLE NMS over (B, K): on TPU the
    Pallas kernel runs the batch as a grid dimension (one pivot walk per
    grid step, all in VMEM); elsewhere the lax oracle vmaps. This is the
    high-throughput serving entry the reference lacks (its `predict` is
    strictly single-image, train.py:1114).

    `use_pallas_nms`: None = auto (Pallas kernel on TPU, lax elsewhere).
    """
    anchors = cfg.anchors_array
    img_size = cfg.img_size
    nc = cfg.num_classes
    per_cell = 1 if cfg.head_type == "anchor_free" else 3
    k = topk or default_topk(img_size, per_cell)
    if use_pallas_nms is None:
        use_pallas_nms = jax.devices()[0].platform == "tpu"
    if use_pallas_nms:
        import functools

        from yolo_from_scratch_tpu.ops.nms_pallas import (
            batched_nms_fixed_pallas_images,
        )

        # per-image candidates arrive sorted from lax.top_k — skip the
        # kernel-side sort (exact; stable argsort of sorted == identity)
        batch_nms_fn = functools.partial(
            batched_nms_fixed_pallas_images, presorted=True
        )
    else:
        batch_nms_fn = jax.vmap(
            batched_nms_fixed, in_axes=(0, 0, 0, None, None)
        )

    def per_image(flat_boxes, flat_obj, flat_cls, scale, pad_top, pad_left):
        if nc == 1 and cfg.head_type != "anchor_free":
            cls_prob = flat_cls[:, 0]
            cls_id = jnp.zeros(flat_cls.shape[0], jnp.int32)
        else:
            cls_prob = jnp.max(flat_cls, axis=1)
            cls_id = jnp.argmax(flat_cls, axis=1).astype(jnp.int32)
        if cfg.head_type == "anchor_free":
            conf = cls_prob
            gate = cls_prob
        else:
            conf = flat_obj * cls_prob
            gate = flat_obj
        score = jnp.where(gate > conf_threshold, conf, NEG_INF)

        cx, cy = flat_boxes[:, 0] * img_size, flat_boxes[:, 1] * img_size
        w, h = flat_boxes[:, 2] * img_size, flat_boxes[:, 3] * img_size
        x1 = (cx - w / 2 - pad_left) / scale
        y1 = (cy - h / 2 - pad_top) / scale
        x2 = (cx + w / 2 - pad_left) / scale
        y2 = (cy + h / 2 - pad_top) / scale
        corners = jnp.stack([x1, y1, x2, y2], axis=1)

        top_scores, idx = _topk_fn(approx_topk)(score, k)
        return corners[idx], top_scores, cls_id[idx]

    forward = apply_fn or (lambda v, im: model.apply(v, im, train=False))

    @jax.jit
    def postprocess(variables, imgs, scales, pad_tops, pad_lefts):
        if imgs.dtype == jnp.uint8:
            # uint8 ingress (see make_postprocess): 4x fewer link bytes
            imgs = imgs.astype(jnp.float32) * INV255
        preds = forward(variables, imgs)
        b = imgs.shape[0]
        boxes_all, obj_all, cls_all = [], [], []
        if cfg.head_type == "anchor_free":
            from yolo_from_scratch_tpu.config import STRIDES
            from yolo_from_scratch_tpu.models.anchor_free import (
                decode_anchor_free,
            )

            for pred, stride in zip(preds, STRIDES):
                decoded = decode_anchor_free(pred, stride, img_size)
                flat = decoded.reshape(b, -1, 4 + nc)
                boxes_all.append(flat[..., 0:4])
                obj_all.append(jnp.ones(flat.shape[:2], flat.dtype))
                cls_all.append(jax.nn.sigmoid(flat[..., 4:]))
        else:
            for pred, anc in zip(preds, anchors):
                decoded = decode_predictions(pred, anc, img_size)
                flat = decoded.reshape(b, -1, 5 + nc)
                boxes_all.append(flat[..., 0:4])
                obj_all.append(jax.nn.sigmoid(flat[..., 4]))
                cls_all.append(jax.nn.sigmoid(flat[..., 5:]))
        boxes = jnp.concatenate(boxes_all, axis=1)
        obj = jnp.concatenate(obj_all, axis=1)
        cls = jnp.concatenate(cls_all, axis=1)
        cand_boxes, cand_scores, cand_cls = jax.vmap(per_image)(
            boxes, obj, cls, scales, pad_tops, pad_lefts
        )
        return batch_nms_fn(
            cand_boxes, cand_scores, cand_cls, iou_threshold, max_outputs
        )

    return postprocess


def _stage_batch(arrs, img_size):
    """Host staging for the device-letterbox path: raw decoded HWC uint8
    arrays -> (bufs (B, Hb, Wb, 3), geoms (B, 6), scales (B,)) with one
    shared bucket (component-wise max) so the whole batch is one program."""
    from yolo_from_scratch_tpu.data.letterbox import (
        bucket_shape,
        letterbox_geometry,
        stage_to_bucket,
    )

    buckets = [bucket_shape(a.shape[0], a.shape[1]) for a in arrs]
    bucket = (max(b[0] for b in buckets), max(b[1] for b in buckets))
    bufs = np.stack([stage_to_bucket(a, bucket) for a in arrs])
    geoms, scales = [], []
    for a in arrs:
        geom, scale, _, _ = letterbox_geometry(a.shape[1], a.shape[0],
                                               img_size)
        geoms.append(geom)
        scales.append(scale)
    return bufs, np.stack(geoms), np.asarray(scales, np.float32)


def _wrap_device_letterbox(inner_post, img_size):
    """Fuse on-device letterbox + forward + postprocess into one jitted
    program (one trace per staging-bucket shape)."""
    from yolo_from_scratch_tpu.data.letterbox import letterbox_device_bucketed

    @jax.jit
    def post_lb(variables, bufs, geoms, scales):
        imgs = letterbox_device_bucketed(bufs, geoms, img_size)
        return inner_post(variables, imgs, scales, geoms[:, 4], geoms[:, 5])

    return post_lb


def _quantize(model, variables, cfg, calib_images):
    """Shared PTQ setup for the predictors: calibrate on the given images
    and return ((variables, qtree) bundle, int8 apply_fn)."""
    from yolo_from_scratch_tpu.infer.quantize import (
        calib_batches_from_images,
        quantize_model,
    )

    batches = calib_batches_from_images(
        calib_images, cfg.img_size, packed_stem=cfg.packed_stem
    )
    return quantize_model(model, variables, batches)


class Predictor:
    """Reusable single-image predictor (compiles once per config).

    `device_letterbox=True` moves the resize/pad onto the TPU
    (`letterbox_device_bucketed`): the host only decodes, and letterbox +
    forward + NMS run as one program (one trace per 256-px size bucket).
    """

    def __init__(self, variables, cfg: YoloConfig, conf_threshold=0.5,
                 iou_threshold=0.4, topk=None, max_outputs=None,
                 device_letterbox=False, quantize_calib=None):
        self.cfg = cfg
        self.variables = variables
        self.model = YOLO(cfg)
        self.device_letterbox = device_letterbox
        apply_fn = None
        if quantize_calib is not None:
            if device_letterbox:
                raise ValueError(
                    "quantize_calib + device_letterbox unsupported: the "
                    "calibrated layout must match the serving layout"
                )
            self.variables, apply_fn = _quantize(
                self.model, variables, cfg, quantize_calib
            )
        self._post = make_postprocess(
            self.model, cfg, conf_threshold, iou_threshold, topk,
            max_outputs, apply_fn=apply_fn,
        )
        if device_letterbox:
            # the single-image path reuses the batched program at B=1.
            # Device letterbox emits an on-device (B, S, S, 3) image, where
            # packing costs more than the packed stem saves — run the
            # unpacked graph there (parameters are interchangeable).
            lb_model = YOLO(cfg.with_(packed_stem=False))
            self._batch_post = make_batch_postprocess(
                lb_model, cfg.with_(packed_stem=False), conf_threshold,
                iou_threshold, topk,
                max_outputs or topk or default_topk(
                    cfg.img_size, 1 if cfg.head_type == "anchor_free" else 3
                ),
            )
            self._post_lb = _wrap_device_letterbox(self._batch_post,
                                                   cfg.img_size)

    def __call__(self, image):
        """image: path or PIL.Image. Returns [(x1, y1, x2, y2, conf, cls), ...]
        floats in original image coordinates."""
        from PIL import Image

        pil = Image.open(image).convert("RGB") if not hasattr(image, "size") else (
            image.convert("RGB")
        )
        if self.device_letterbox:
            bufs, geoms, scales = _stage_batch(
                [np.asarray(pil, np.uint8)], self.cfg.img_size
            )
            boxes, scores, classes, valid = (
                np.asarray(r)[0] for r in jax.device_get(
                    self._post_lb(self.variables, jnp.asarray(bufs),
                                  jnp.asarray(geoms), jnp.asarray(scales))
                )
            )
            return [
                (float(b[0]), float(b[1]), float(b[2]), float(b[3]),
                 float(s), int(c))
                for b, s, c, v in zip(boxes, scores, classes, valid) if v
            ]
        img_u8, scale, pad_top, pad_left = letterbox_image(pil, self.cfg.img_size)
        # uint8 staging: 4x fewer host->device bytes per request (the
        # per-call upload dominates single-image latency through a
        # constrained link — benchmarks/rttbench.py); normalized on-device
        img_np = img_u8[None]
        if self.cfg.packed_stem:
            # host-side space-to-depth so the packed stem (models/packed.py)
            # never pays the slow on-device layout change
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            img_np = pack_s2d_host(img_np)
        img = jnp.asarray(img_np)

        boxes, scores, classes, valid = jax.device_get(
            self._post(self.variables, img, float(scale), float(pad_top),
                       float(pad_left))
        )
        out = []
        for b, s, c, v in zip(boxes, scores, classes, valid):
            if v:
                out.append(
                    (float(b[0]), float(b[1]), float(b[2]), float(b[3]),
                     float(s), int(c))
                )
        return out


class PipelinedPredictor:
    """Single-image serving client that hides the host<->device
    round-trip by keeping up to `depth` requests in flight.

    The reference's predict is strictly synchronous (reference:
    train.py:1114-1250): letterbox -> forward -> NMS -> readback, one
    image at a time, so end-to-end latency = RTT + device time per
    image. Here dispatches are asynchronous (JAX queues the program and
    returns device futures); with `depth` images in flight the device
    starts request k+1 while the host is still reading back request k,
    so SUSTAINED single-image throughput approaches the device rate even
    through a high-RTT link (the axon tunnel's ~25-30 ms p50 vs 0.87 ms
    device time — benchmarks/rttbench.py measures the decomposition).
    Per-request LATENCY is unchanged; this is a throughput client.

    Usage: `list(pp(paths))` or incrementally `pp.submit(img)` /
    `pp.drain()`. Results preserve submission order.
    """

    def __init__(self, variables, cfg: YoloConfig, depth=4,
                 conf_threshold=0.5, iou_threshold=0.4, topk=None,
                 max_outputs=None, quantize_calib=None):
        import collections

        self._p = Predictor(variables, cfg, conf_threshold, iou_threshold,
                            topk, max_outputs,
                            quantize_calib=quantize_calib)
        self.depth = max(1, int(depth))
        self._inflight = collections.deque()

    def _dispatch(self, image):
        from PIL import Image

        p = self._p
        pil = (Image.open(image).convert("RGB")
               if not hasattr(image, "size") else image.convert("RGB"))
        img_u8, scale, pad_top, pad_left = letterbox_image(
            pil, p.cfg.img_size)
        img_np = img_u8[None]  # uint8 staging (see Predictor.__call__)
        if p.cfg.packed_stem:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            img_np = pack_s2d_host(img_np)
        # async dispatch: returns device futures without blocking
        return p._post(p.variables, jnp.asarray(img_np), float(scale),
                       float(pad_top), float(pad_left))

    @staticmethod
    def _finalize(out):
        boxes, scores, classes, valid = jax.device_get(out)
        return [
            (float(b[0]), float(b[1]), float(b[2]), float(b[3]),
             float(s), int(c))
            for b, s, c, v in zip(boxes, scores, classes, valid) if v
        ]

    def submit(self, image):
        """Enqueue one image; returns any results whose window slot was
        needed (possibly empty list of per-image detection lists)."""
        self._inflight.append(self._dispatch(image))
        done = []
        while len(self._inflight) > self.depth:
            done.append(self._finalize(self._inflight.popleft()))
        return done

    def drain(self):
        """Collect every remaining in-flight result, in order."""
        done = [self._finalize(o) for o in self._inflight]
        self._inflight.clear()
        return done

    def __call__(self, images):
        """Run a stream of images; returns one detection list per image,
        in order, with up to `depth` requests overlapped."""
        results = []
        for image in images:
            results.extend(self.submit(image))
        results.extend(self.drain())
        return results


def predict(variables, cfg, image_path, conf_threshold=0.5, iou_threshold=0.4):
    """One-shot convenience mirroring the reference signature.

    NOTE: builds (and jit-compiles) a fresh Predictor per call. For
    repeated inference construct one `Predictor` (or `BatchPredictor`) and
    reuse it — compilation is seconds on TPU.
    """
    return Predictor(variables, cfg, conf_threshold, iou_threshold)(image_path)


class BatchPredictor:
    """Batched serving predictor over image files / PIL images.

    `device_letterbox=True`: the host only decodes; resize/pad/normalize +
    forward + NMS run as ONE device program per batch (staging buffers
    bucketed to 256-px multiples bound the trace count)."""

    def __init__(self, variables, cfg: YoloConfig, conf_threshold=0.5,
                 iou_threshold=0.4, max_outputs=300, device_letterbox=False,
                 topk=None, quantize_calib=None, approx_topk=False):
        # topk: NMS candidate capacity per image (default: the
        # capacity-planned `default_topk`, 4096 @640). 1024 measures +28%
        # serving throughput at conf 0.5 with no realistic-scene loss
        # (BASELINE.md serving stage split).
        # approx_topk: TPU-native binned approx_max_k prefilter (recall
        # 0.95) instead of the exact sort — a throughput knob, see
        # `_topk_fn`.
        # quantize_calib: list of images -> serve the int8 PTQ path
        # (infer/quantize.py) calibrated on them.
        self.cfg = cfg
        self.variables = variables
        self.model = YOLO(cfg)
        self.device_letterbox = device_letterbox
        apply_fn = None
        if quantize_calib is not None:
            if device_letterbox:
                raise ValueError(
                    "quantize_calib + device_letterbox unsupported: the "
                    "calibrated layout must match the serving layout"
                )
            self.variables, apply_fn = _quantize(
                self.model, variables, cfg, quantize_calib
            )
        self._post = make_batch_postprocess(
            self.model, cfg, conf_threshold, iou_threshold, topk=topk,
            max_outputs=max_outputs, apply_fn=apply_fn,
            approx_topk=approx_topk,
        )
        if device_letterbox:
            # see Predictor: unpacked graph behind the device letterbox
            lb_cfg = cfg.with_(packed_stem=False)
            self._post_lb = _wrap_device_letterbox(
                make_batch_postprocess(YOLO(lb_cfg), lb_cfg, conf_threshold,
                                       iou_threshold, topk=topk,
                                       max_outputs=max_outputs,
                                       approx_topk=approx_topk),
                cfg.img_size)

    def __call__(self, images):
        """images: list of paths or PIL images. Returns a list (per image)
        of [(x1, y1, x2, y2, conf, cls), ...] in original coordinates."""
        from PIL import Image

        pils = [
            (Image.open(image).convert("RGB")
             if not hasattr(image, "size") else image.convert("RGB"))
            for image in images
        ]
        if self.device_letterbox:
            bufs, geoms, sc = _stage_batch(
                [np.asarray(p, np.uint8) for p in pils], self.cfg.img_size
            )
            boxes, scores, classes, valid = jax.device_get(
                self._post_lb(self.variables, jnp.asarray(bufs),
                              jnp.asarray(geoms), jnp.asarray(sc))
            )
            return _detections_per_image(boxes, scores, classes, valid,
                                         len(images))

        imgs, scales, pts, pls = [], [], [], []
        for pil in pils:
            arr, scale, pad_top, pad_left = letterbox_image(
                pil, self.cfg.img_size
            )
            imgs.append(arr)  # uint8 staging: 4x fewer link bytes;
            scales.append(scale)  # normalized on-device (INV255)
            pts.append(pad_top)
            pls.append(pad_left)

        batch = np.stack(imgs)
        if self.cfg.packed_stem:
            from yolo_from_scratch_tpu.models.packed import pack_s2d_host

            batch = pack_s2d_host(batch)
        boxes, scores, classes, valid = jax.device_get(
            self._post(
                self.variables,
                jnp.asarray(batch),
                jnp.asarray(scales, jnp.float32),
                jnp.asarray(pts, jnp.float32),
                jnp.asarray(pls, jnp.float32),
            )
        )
        return _detections_per_image(boxes, scores, classes, valid,
                                     len(images))


def _detections_per_image(boxes, scores, classes, valid, n):
    out = []
    for b in range(n):
        out.append([
            (float(bx[0]), float(bx[1]), float(bx[2]), float(bx[3]),
             float(s), int(c))
            for bx, s, c, v in zip(boxes[b], scores[b], classes[b], valid[b])
            if v
        ])
    return out
