"""Per-layer roofline analysis of the model's conv graph.

Answers "how far from speed-of-light is the measured throughput?" by
extracting every convolution from the traced forward jaxpr (exact shapes,
no hand-kept layer list), computing each one's MXU-bound and HBM-bound
times on the target chip, and summing to a forward (and estimated
training-step) floor. Elementwise BN/SiLU ops fuse into conv epilogues
under XLA and are folded into the conv byte traffic; non-conv bandwidth
(maxpools, upsampling, concats) is reported as one aggregate row.

Run as a module for the markdown table:
    python -m yolo_from_scratch_tpu.utils.roofline [--batch 8] [--size s]

Chip model defaults to TPU v5e (v5 lite): 197 TFLOP/s bf16, 819 GB/s HBM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_FLOPS = 197e12
V5E_HBM_BW = 819e9
# v5e inter-chip interconnect: each chip has 4 ICI links arranged as a
# 2-D torus, ~45 GB/s one-way per link ("How to Scale Your Model" chip
# table). A bidirectional ring all-reduce on ONE mesh axis uses both
# directions of that axis's links simultaneously.
V5E_ICI_ONEWAY_BW = 4.5e10


@dataclasses.dataclass
class ConvCost:
    out_shape: tuple
    kernel_shape: tuple
    flops: float       # fwd multiply-adds * 2
    bytes_io: float    # lhs + rhs + out at the op dtype
    # enough of the op signature to re-run the conv standalone (used by
    # benchmarks/stagebench.py to measure each conv's actual device time)
    lhs_shape: tuple = ()
    strides: tuple = (1, 1)
    padding: tuple = ()
    dtype: str = "float32"

    @property
    def t_mxu(self):
        return self.flops / V5E_BF16_FLOPS

    def t_hbm(self, bw=V5E_HBM_BW):
        return self.bytes_io / bw

    @property
    def t_min(self):
        return max(self.t_mxu, self.t_hbm())


def _dtype_bytes(aval):
    return np.dtype(aval.dtype).itemsize


def _walk(jaxpr, convs, others):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs, rhs = (v.aval for v in eqn.invars)
            out = eqn.outvars[0].aval
            # dim numbers give feature/spatial split; FLOPs are
            # 2 * out_elems * (kernel spatial * in_features)
            dnums = eqn.params["dimension_numbers"]
            k_spatial = [
                rhs.shape[i] for i in dnums.rhs_spec[2:]
            ]
            cin = rhs.shape[dnums.rhs_spec[1]]
            groups = eqn.params.get("feature_group_count", 1)
            flops = 2.0 * out.size * int(np.prod(k_spatial)) * cin / groups
            nbytes = (
                lhs.size * _dtype_bytes(lhs)
                + rhs.size * _dtype_bytes(rhs)
                + out.size * _dtype_bytes(out)
            )
            convs.append(ConvCost(
                tuple(out.shape), tuple(rhs.shape), flops, float(nbytes),
                lhs_shape=tuple(lhs.shape),
                strides=tuple(eqn.params["window_strides"]),
                padding=tuple(tuple(p) for p in eqn.params["padding"]),
                dtype=str(lhs.dtype),
            ))
        elif eqn.primitive.name in ("reduce_window_max", "reduce_window",
                                    "gather", "dynamic_slice", "concatenate",
                                    "resize"):
            out = eqn.outvars[0].aval
            others.append(2.0 * out.size * _dtype_bytes(out))  # r + w
        for sub in jax.core.jaxprs_in_params(eqn.params):
            _walk(sub, convs, others)


def forward_conv_costs(cfg, batch=8):
    """Trace the forward pass and return ([ConvCost...], other_bytes)."""
    from yolo_from_scratch_tpu.models.yolo import YOLO

    model = YOLO(cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.img_size, cfg.img_size, 3)), train=False,
            )
        )
        closed = jax.make_jaxpr(
            lambda v, x: model.apply(v, x, train=False)
        )(variables,
          jax.ShapeDtypeStruct((batch, cfg.img_size, cfg.img_size, 3),
                               jnp.float32))
    convs, others = [], []
    _walk(closed.jaxpr, convs, others)
    return convs, float(np.sum(others)) if others else 0.0


def summarize(cfg, batch=8, measured_img_s=None):
    """Build the roofline summary dict (and markdown rows)."""
    convs, other_bytes = forward_conv_costs(cfg, batch)
    fwd_flops = sum(c.flops for c in convs)
    fwd_t_mxu = sum(c.t_mxu for c in convs)
    fwd_t_min = sum(c.t_min for c in convs) + other_bytes / V5E_HBM_BW
    # training step: fwd + bwd-data + bwd-weights ~= 3x conv FLOPs; byte
    # traffic roughly 2x fwd (activations re-read + grads written)
    train_flops = 3.0 * fwd_flops
    train_t_min = 3.0 * fwd_t_min
    out = {
        "convs": convs,
        "other_bytes": other_bytes,
        "fwd_flops": fwd_flops,
        "fwd_t_mxu_ms": fwd_t_mxu * 1e3,
        "fwd_t_min_ms": fwd_t_min * 1e3,
        "train_flops": train_flops,
        "train_t_min_ms": train_t_min * 1e3,
        "roofline_img_s": batch / train_t_min,
    }
    if measured_img_s:
        t_meas = batch / measured_img_s
        out["measured_img_s"] = measured_img_s
        out["mfu"] = train_flops / t_meas / V5E_BF16_FLOPS
        out["roofline_frac"] = train_t_min / t_meas
    return out


def markdown_table(cfg, batch=8, measured_img_s=None):
    s = summarize(cfg, batch, measured_img_s)
    lines = [
        f"Roofline @ batch {batch}, img {cfg.img_size}, "
        f"dtype {cfg.compute_dtype} (TPU v5e: 197 TFLOP/s bf16, 819 GB/s)",
        "",
        "| conv (out shape) | kernel | GFLOP | t_mxu us | t_hbm us | bound |",
        "|---|---|---|---|---|---|",
    ]
    for c in s["convs"]:
        bound = "MXU" if c.t_mxu >= c.t_hbm() else "HBM"
        lines.append(
            f"| {c.out_shape} | {c.kernel_shape} | {c.flops / 1e9:.2f} "
            f"| {c.t_mxu * 1e6:.1f} | {c.t_hbm() * 1e6:.1f} | {bound} |"
        )
    lines += [
        "",
        f"- forward conv FLOPs: {s['fwd_flops'] / 1e9:.1f} GFLOP "
        f"({s['fwd_flops'] / batch / 1e9:.2f} GFLOP/img)",
        f"- forward floor: {s['fwd_t_min_ms']:.2f} ms "
        f"(pure-MXU {s['fwd_t_mxu_ms']:.2f} ms; non-conv bandwidth "
        f"{s['other_bytes'] / 1e6:.0f} MB)",
        f"- training-step floor (3x conv work): {s['train_t_min_ms']:.2f} ms "
        f"= {s['roofline_img_s']:.0f} img/s speed-of-light",
    ]
    if measured_img_s:
        lines += [
            f"- measured: {measured_img_s:.0f} img/s -> "
            f"{100 * s['roofline_frac']:.0f}% of roofline, "
            f"MFU {100 * s['mfu']:.1f}%",
        ]
    return "\n".join(lines)


def param_bytes(cfg) -> float:
    """Trainable-parameter bytes (fp32 master params), via eval_shape —
    no arrays are materialized."""
    from yolo_from_scratch_tpu.models.yolo import YOLO

    model = YOLO(cfg)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3)), train=False,
        )
    )
    leaves = jax.tree_util.tree_leaves(variables["params"])
    return float(sum(l.size * np.dtype(l.dtype).itemsize for l in leaves))


def ici_dp_projection(cfg, batch_per_chip=8, n_chips=(2, 4, 8, 16, 256),
                      measured_step_ms=None, grad_dtype_bytes=4,
                      ici_axes=1):
    """Project data-parallel scaling efficiency over a v5e ICI mesh.

    Model (scaling-book recipe, applied to this framework's DP design in
    parallel/mesh.py — batch sharded over one mesh axis, XLA inserts one
    gradient psum per step):

      - psum(grads) lowers to a reduce-scatter + all-gather ring; each
        chip sends and receives 2*(N-1)/N * G bytes per step, where G is
        the gradient bytes (= param bytes at the grad dtype).
      - a bidirectional ring on `ici_axes` torus axes sustains
        2 * ici_axes * V5E_ICI_ONEWAY_BW bytes/s per chip, so
        t_comm = 2*(N-1)/N * G / (2 * ici_axes * V5E_ICI_ONEWAY_BW).
      - t_comp is the measured single-chip step time if given, else the
        roofline training-step floor (optimistic).
      - XLA overlaps the psum with the tail of the backward pass; the
        projection reports both no-overlap (lower bound) and full-overlap
        (upper bound) efficiency: eff = t_comp / (t_comp + t_comm) and
        t_comp / max(t_comp, t_comm).

    Beyond one host (v5e: 8 chips) the same math holds across ICI within
    a pod slice; DCN hops (multi-slice) are NOT modeled here.

    Returns a list of row dicts, one per N in `n_chips`.
    """
    pbytes = param_bytes(cfg)
    grad_bytes = pbytes / 4 * grad_dtype_bytes
    if measured_step_ms is not None:
        t_comp = measured_step_ms / 1e3
    else:
        s = summarize(cfg, batch_per_chip)
        t_comp = s["train_t_min_ms"] / 1e3
    rows = []
    for n in n_chips:
        wire = 2.0 * (n - 1) / n * grad_bytes            # bytes per chip
        t_comm = wire / (2.0 * ici_axes * V5E_ICI_ONEWAY_BW)
        rows.append({
            "n_chips": n,
            "grad_mb": grad_bytes / 1e6,
            "wire_mb_per_chip": wire / 1e6,
            "t_comm_ms": t_comm * 1e3,
            "t_comp_ms": t_comp * 1e3,
            "eff_no_overlap": t_comp / (t_comp + t_comm),
            "eff_full_overlap": t_comp / max(t_comp, t_comm),
            "img_s_no_overlap": n * batch_per_chip / (t_comp + t_comm),
            "img_s_full_overlap": n * batch_per_chip / max(t_comp, t_comm),
        })
    return rows


def ici_markdown_table(cfg, batch_per_chip=8, measured_step_ms=None,
                       grad_dtype_bytes=4, ici_axes=1):
    rows = ici_dp_projection(cfg, batch_per_chip,
                             measured_step_ms=measured_step_ms,
                             grad_dtype_bytes=grad_dtype_bytes,
                             ici_axes=ici_axes)
    hdr = ("fp32" if grad_dtype_bytes == 4 else
           f"{8 * grad_dtype_bytes}-bit") + " grad psum"
    base = ("measured single-chip step" if measured_step_ms
            else "roofline step floor")
    lines = [
        f"DP scaling projection @ b{batch_per_chip}/chip, {hdr}, "
        f"{ici_axes} ICI torus axis(es), t_comp from {base} "
        f"({rows[0]['t_comp_ms']:.2f} ms)",
        "",
        "| chips | psum wire MB/chip | t_comm ms | eff (no overlap) "
        "| eff (overlapped) | img/s (overlapped) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['n_chips']} | {r['wire_mb_per_chip']:.1f} "
            f"| {r['t_comm_ms']:.2f} | {100 * r['eff_no_overlap']:.1f}% "
            f"| {100 * r['eff_full_overlap']:.1f}% "
            f"| {r['img_s_full_overlap']:.0f} |"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    import argparse

    from yolo_from_scratch_tpu.config import YoloConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="s")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--measured", type=float, default=None,
                    help="measured img/s to compare against")
    ap.add_argument("--ici", action="store_true",
                    help="print the DP ICI scaling projection")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured single-chip step ms for the projection")
    ap.add_argument("--grad-bytes", type=int, default=4,
                    help="bytes/element of the gradient psum (4=fp32)")
    ap.add_argument("--ici-axes", type=int, default=1)
    a = ap.parse_args()
    cfg = YoloConfig.from_size(a.size, img_size=a.img_size,
                               compute_dtype="bfloat16")
    if a.ici:
        print(ici_markdown_table(cfg, a.batch, measured_step_ms=a.step_ms,
                                 grad_dtype_bytes=a.grad_bytes,
                                 ici_axes=a.ici_axes))
    else:
        print(markdown_table(cfg, a.batch, a.measured))
