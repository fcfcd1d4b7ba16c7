"""int8 PTQ serving path (infer/quantize.py): BN-fold exactness,
per-conv quantization error bounds, calibration coverage, and the
end-to-end quantized predictor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from yolo_from_scratch_tpu.infer import quantize as Q
from yolo_from_scratch_tpu.models.blocks import BN_EPS, ConvBNSiLU


def _rand_conv_module(key, cin=8, cout=16, kernel=3, use_bias=False):
    mod = ConvBNSiLU(cout, kernel, use_bias=use_bias)
    x = jax.random.uniform(key, (1, 16, 16, cin), minval=-1.0, maxval=1.0)
    variables = mod.init(key, x)
    # non-trivial BN stats/affine so folding is actually exercised
    rngs = jax.random.split(key, 4)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    p = dict(variables["params"])
    bn = dict(p["bn"])
    bn["scale"] = jax.random.uniform(rngs[0], (cout,), minval=0.5, maxval=2.0)
    bn["bias"] = jax.random.normal(rngs[1], (cout,)) * 0.3
    p["bn"] = bn
    s = {"bn": {
        "mean": jax.random.normal(rngs[2], (cout,)) * 0.2,
        "var": jax.random.uniform(rngs[3], (cout,), minval=0.25, maxval=4.0),
    }}
    return mod, {"params": p, "batch_stats": s}, x


def test_bn_fold_exact():
    """Folded conv(W', b') must equal conv+BN exactly (pre-quantization):
    verify by dequantizing with float weights (rounding disabled via a
    huge weight bit-width surrogate: compare int8 path error against the
    pure-fold float path computed here)."""
    for use_bias in (False, True):
        mod, variables, x = _rand_conv_module(
            jax.random.PRNGKey(3 + use_bias), use_bias=use_bias
        )
        y_ref = mod.apply(variables, x, train=False)

        p, s = variables["params"], variables["batch_stats"]
        kernel = np.asarray(p["conv"]["kernel"], np.float32)
        b0 = np.asarray(p["conv"]["bias"], np.float32) if use_bias else 0.0
        fold = np.asarray(p["bn"]["scale"]) / np.sqrt(
            np.asarray(s["bn"]["var"]) + BN_EPS
        )
        w = kernel * fold
        bias = (b0 - np.asarray(s["bn"]["mean"])) * fold + np.asarray(
            p["bn"]["bias"]
        )
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        pad = mod.kernel // 2
        y_fold = nn.silu(jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=dn,
        ) + bias)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fold),
                                   rtol=1e-4, atol=1e-5)


def test_single_conv_quant_error_small():
    """Per-channel int8 weights + per-tensor int8 activations keep a
    single ConvBNSiLU within ~2% relative error."""
    mod, variables, x = _rand_conv_module(jax.random.PRNGKey(0))
    y_ref = mod.apply(variables, x, train=False)
    a_scale = float(jnp.max(jnp.abs(x))) / 127.0
    qtree = Q.quantize_params(variables, {"": a_scale})
    # quantize_params walks path keys; "" is the root module here
    y_q = Q._quant_conv_silu(x, qtree[""], mod)
    rel = float(jnp.linalg.norm(y_ref - y_q) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_calibration_covers_all_convs(cfg, model_and_vars):
    model, variables = model_and_vars
    imgs = np.random.default_rng(0).random(
        (2, cfg.img_size, cfg.img_size, 3), np.float32
    )
    scales = Q.calibrate(model, variables, [imgs])
    assert len(scales) == 59  # every ConvBNSiLU in the nano graph
    assert all(v > 0 for v in scales.values())
    qtree = Q.quantize_params(variables, scales)
    assert set(qtree) == set(scales)
    for q in qtree.values():
        assert q["w_int8"].dtype == jnp.int8
        assert q["w_scale"].shape == (q["w_int8"].shape[-1],)
        assert q["bias"].shape == (q["w_int8"].shape[-1],)


def test_quant_apply_per_conv_error_bounded(cfg, model_and_vars):
    """Every intercepted conv's int8 output stays within 5% of its float
    output GIVEN THE SAME (float-path) input — the per-layer error that
    compounds through the net."""
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.default_rng(1).random(
        (2, cfg.img_size, cfg.img_size, 3), np.float32
    ))
    scales = Q.calibrate(model, variables, [imgs])
    qtree = Q.quantize_params(variables, scales)

    rels = {}

    def icpt(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if Q._is_conv_call(context):
            key = "/".join(context.module.path)
            y_q = Q._quant_conv_silu(args[0], qtree[key], context.module)
            rels[key] = jnp.linalg.norm(out - y_q) / (
                jnp.linalg.norm(out) + 1e-9
            )
        return out  # keep the float path flowing: per-layer error only

    with nn.intercept_methods(icpt):
        model.apply(variables, imgs, train=False)
    rels = {k: float(v) for k, v in rels.items()}
    worst = max(rels.values())
    assert worst < 0.05, sorted(rels.items(), key=lambda kv: -kv[1])[:5]


def test_quant_skip_list(cfg, model_and_vars):
    model, variables = model_and_vars
    imgs = np.random.default_rng(0).random(
        (1, cfg.img_size, cfg.img_size, 3), np.float32
    )
    scales = Q.calibrate(model, variables, [imgs])
    qtree = Q.quantize_params(variables, scales, skip=("stem0", "stem1"))
    assert "stem0" not in qtree and "stem1" not in qtree
    assert len(qtree) == 57


def test_quant_forward_close_at_probability_level(cfg, model_and_vars):
    """Full quantized forward vs float forward, compared where it matters
    for detection: sigmoid(obj) and sigmoid(cls) probabilities, and the
    decoded box fields. (Post-NMS detection sets are not comparable at
    random init: every score ties at the bias prior, so suppression
    order is arbitrary — mAP impact is measured on-chip on a trained
    checkpoint instead, see BASELINE.md.)"""
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.default_rng(7).random(
        (2, cfg.img_size, cfg.img_size, 3), np.float32
    ))
    bundle, qapply = Q.quantize_model(model, variables, [imgs])
    preds_f = model.apply(variables, imgs, train=False)
    preds_q = qapply(bundle, imgs)
    for pf, pq in zip(preds_f, preds_q):
        prob_f = jax.nn.sigmoid(pf[..., 4:])
        prob_q = jax.nn.sigmoid(pq[..., 4:])
        assert float(jnp.max(jnp.abs(prob_f - prob_q))) < 2e-3
        # raw box logits feed 2*sigmoid(x)-0.5 style decode; bound them too
        assert float(jnp.max(jnp.abs(pf[..., :4] - pq[..., :4]))) < 0.05


def test_quantized_batch_predictor_smoke(cfg, model_and_vars,
                                         temp_dataset_dir):
    """The quantized serving path runs end to end through BatchPredictor
    and returns the standard per-image detection structure."""
    from yolo_from_scratch_tpu.infer.predict import BatchPredictor

    _, variables = model_and_vars
    imgs = [str(p) for p in
            sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:2]]
    qnt = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                         max_outputs=512, quantize_calib=imgs)
    out = qnt(imgs)
    assert len(out) == 2
    for dets in out:
        for d in dets:
            assert len(d) == 6
            assert d[2] >= d[0] and d[3] >= d[1]
            assert 0.0 <= d[4] <= 1.0


def test_quantize_rejects_device_letterbox(cfg, model_and_vars):
    from yolo_from_scratch_tpu.infer.predict import BatchPredictor

    _, variables = model_and_vars
    with pytest.raises(ValueError, match="device_letterbox"):
        BatchPredictor(variables, cfg, device_letterbox=True,
                       quantize_calib=["x.jpg"])


def test_quant_with_packed_stem(cfg, model_and_vars):
    """--packed-stem + --int8 compose: the packed stem modules calibrate
    and quantize too (canonical int8 kernels repack exactly); stem0 stays
    float by the default skip (first-layer practice); probabilities match
    the float packed forward."""
    from yolo_from_scratch_tpu.models.packed import pack_s2d_host
    from yolo_from_scratch_tpu.models.yolo import YOLO

    _, variables = model_and_vars
    pcfg = cfg.with_(packed_stem=True)
    pmodel = YOLO(pcfg)
    imgs = np.random.default_rng(11).random(
        (2, cfg.img_size, cfg.img_size, 3), np.float32
    )
    packed = jnp.asarray(pack_s2d_host(imgs))
    scales = Q.calibrate(pmodel, variables, [packed])
    assert "stem0" in scales and "stem1" in scales
    assert len(scales) == 59
    bundle, qapply = Q.quantize_model(pmodel, variables, [packed])
    assert "stem0" not in bundle[1] and "stem1" in bundle[1]
    preds_f = pmodel.apply(variables, packed, train=False)
    preds_q = qapply(bundle, packed)
    for pf, pq in zip(preds_f, preds_q):
        prob_f = jax.nn.sigmoid(pf[..., 4:])
        prob_q = jax.nn.sigmoid(pq[..., 4:])
        assert float(jnp.max(jnp.abs(prob_f - prob_q))) < 2e-3


def test_quant_packed_p3_matches_unpacked_int8(cfg, model_and_vars):
    """The packed-p3 int8 graph must reproduce the unpacked int8 graph:
    identical canonical int8 kernels + exact kernel repacking + exact
    int32 accumulation. (Float stem0 accumulates in a different order
    under packing, so the match is at probability level, not bitwise.)"""
    from yolo_from_scratch_tpu.models.packed import pack_s2d_host
    from yolo_from_scratch_tpu.models.yolo import YOLO

    model, variables = model_and_vars
    pcfg = cfg.with_(packed_stem=True, packed_interior=True, packed_p3=True)
    pmodel = YOLO(pcfg)
    imgs = np.random.default_rng(13).random(
        (2, cfg.img_size, cfg.img_size, 3), np.float32
    )
    packed = jnp.asarray(pack_s2d_host(imgs))
    flat = jnp.asarray(imgs)

    bundle_u, qapply_u = Q.quantize_model(model, variables, [flat])
    bundle_p, qapply_p = Q.quantize_model(pmodel, variables, [packed])
    # same canonical quantization regardless of layout
    assert set(bundle_u[1]) == set(bundle_p[1])
    for key in bundle_u[1]:
        np.testing.assert_array_equal(bundle_u[1][key]["w_int8"],
                                      bundle_p[1][key]["w_int8"])
        np.testing.assert_allclose(float(bundle_u[1][key]["a_scale"]),
                                   float(bundle_p[1][key]["a_scale"]),
                                   rtol=1e-6)

    preds_u = qapply_u(bundle_u, flat)
    preds_p = qapply_p(bundle_p, packed)
    for pu, pp in zip(preds_u, preds_p):
        prob_u = jax.nn.sigmoid(pu[..., 4:])
        prob_p = jax.nn.sigmoid(pp[..., 4:])
        assert float(jnp.max(jnp.abs(prob_u - prob_p))) < 2e-3


def test_quant_anchor_free_head(cfg, model_and_vars):
    """The decoupled (anchor-free) head quantizes too — its box/cls
    branches are ConvBNSiLU stacks, so interception covers both head
    families with zero head-specific code."""
    from yolo_from_scratch_tpu.config import YoloConfig
    from yolo_from_scratch_tpu.models.yolo import YOLO, init_model

    af_cfg = YoloConfig(num_classes=3, img_size=cfg.img_size,
                        width_mult=0.25, head_type="anchor_free")
    model, variables = init_model(jax.random.PRNGKey(0), af_cfg)
    imgs = np.random.default_rng(5).random(
        (2, af_cfg.img_size, af_cfg.img_size, 3), np.float32
    )
    scales = Q.calibrate(model, variables, [imgs])
    # 59 trunk convs minus 6 DetectHead convs, plus 4 per DecoupledHead
    assert len(scales) == 59 - 6 + 12
    bundle, qapply = Q.quantize_model(model, variables, [imgs])
    preds_f = model.apply(variables, jnp.asarray(imgs), train=False)
    preds_q = qapply(bundle, jnp.asarray(imgs))
    for pf, pq in zip(preds_f, preds_q):
        cls_f = jax.nn.sigmoid(pf[..., -af_cfg.num_classes:])
        cls_q = jax.nn.sigmoid(pq[..., -af_cfg.num_classes:])
        assert float(jnp.max(jnp.abs(cls_f - cls_q))) < 2e-3


def test_percentile_calibration_smaller_scales(cfg, model_and_vars):
    """99th-percentile calibration yields strictly tighter (<=) activation
    scales than abs-max, and the quantized forward still tracks float at
    the probability level."""
    model, variables = model_and_vars
    imgs = np.random.default_rng(3).random(
        (2, cfg.img_size, cfg.img_size, 3), np.float32
    )
    s_max = Q.calibrate(model, variables, [imgs])
    s_pct = Q.calibrate(model, variables, [imgs], percentile=99.0)
    assert set(s_max) == set(s_pct)
    assert all(s_pct[k] <= s_max[k] + 1e-12 for k in s_max)
    assert any(s_pct[k] < s_max[k] * 0.999 for k in s_max)
    bundle, qapply = Q.quantize_model(model, variables, [imgs],
                                      percentile=99.0)
    preds_f = model.apply(variables, jnp.asarray(imgs), train=False)
    preds_q = qapply(bundle, jnp.asarray(imgs))
    for pf, pq in zip(preds_f, preds_q):
        prob_f = jax.nn.sigmoid(pf[..., 4:])
        prob_q = jax.nn.sigmoid(pq[..., 4:])
        assert float(jnp.max(jnp.abs(prob_f - prob_q))) < 5e-3


def test_mxu_bound_select(cfg, model_and_vars):
    """The MXU-bound predicate keeps only 3x3 convs with >=64 input
    channels int8; everything else falls through to float."""
    model, variables = model_and_vars
    imgs = np.random.default_rng(0).random(
        (1, cfg.img_size, cfg.img_size, 3), np.float32
    )
    scales = Q.calibrate(model, variables, [imgs])
    qtree = Q.quantize_params(variables, scales,
                              select=Q.mxu_bound_select)
    assert 0 < len(qtree) < len(scales)
    for key, q in qtree.items():
        kh, kw, cin, cout = q["w_int8"].shape
        assert kh >= 3 and cin >= 64, (key, q["w_int8"].shape)
