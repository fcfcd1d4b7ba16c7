"""On-device bucketed letterbox vs the host PIL path (SURVEY.md §2.2's
PIL-replacement kernel, now wired into the predictors)."""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from yolo_from_scratch_tpu.data.letterbox import (
    bucket_shape,
    letterbox_device_bucketed,
    letterbox_geometry,
    letterbox_image,
    letterbox_params,
    stage_to_bucket,
)


def test_bucket_shape_rounds_up():
    assert bucket_shape(100, 100) == (256, 256)
    assert bucket_shape(257, 512) == (512, 512)
    assert bucket_shape(1080, 1920) == (1280, 2048)
    assert bucket_shape(1024, 768) == (1024, 768)


def test_stage_to_bucket_places_content_topleft():
    arr = np.full((10, 20, 3), 7, np.uint8)
    buf = stage_to_bucket(arr, (256, 256))
    assert buf.shape == (256, 256, 3)
    assert (buf[:10, :20] == 7).all()
    assert (buf[10:] == 0).all() and (buf[:, 20:] == 0).all()
    with pytest.raises(ValueError):
        stage_to_bucket(np.zeros((300, 10, 3), np.uint8), (256, 256))


@pytest.mark.parametrize("hw", [(480, 517), (37, 53), (256, 256), (700, 250)])
def test_device_letterbox_matches_host(hw):
    h, w = hw
    target = 128
    rng = np.random.default_rng(h + w)
    orig = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    host, scale, pad_top, pad_left = letterbox_image(
        Image.fromarray(orig), target
    )
    hostf = np.asarray(host, np.float32) / 255.0

    bucket = bucket_shape(h, w)
    bufs = stage_to_bucket(orig, bucket)[None]
    geom, g_scale, g_pt, g_pl = letterbox_geometry(w, h, target)
    assert (g_scale, g_pt, g_pl) == (scale, pad_top, pad_left)
    out = np.asarray(
        letterbox_device_bucketed(jnp.asarray(bufs), jnp.asarray(geom[None]),
                                  target)
    )[0]
    _, _, _, new_w, new_h = letterbox_params(w, h, target)
    # pad region: exact gray
    mask = np.ones((target, target), bool)
    mask[pad_top:pad_top + new_h, pad_left:pad_left + new_w] = False
    np.testing.assert_allclose(out[mask], hostf[mask], atol=1e-6)
    # content: within ~1.5 uint8 LSB of PIL's antialiased bilinear
    content = np.abs(out[~mask] - hostf[~mask])
    assert content.max() < 1.5 / 255.0, content.max()


def test_mixed_geometries_one_program():
    """Different source sizes staged into one bucket run in a single vmapped
    call with per-image traced geometry."""
    target = 96
    sizes = [(200, 300), (150, 150), (256, 100)]
    arrs = [
        (np.random.default_rng(i).random(s + (3,)) * 255).astype(np.uint8)
        for i, s in enumerate(sizes)
    ]
    bucket = (256, 512)
    bufs = np.stack([stage_to_bucket(a, bucket) for a in arrs])
    geoms = np.stack(
        [letterbox_geometry(a.shape[1], a.shape[0], target)[0] for a in arrs]
    )
    out = np.asarray(
        letterbox_device_bucketed(jnp.asarray(bufs), jnp.asarray(geoms),
                                  target)
    )
    for i, a in enumerate(arrs):
        host, *_ = letterbox_image(Image.fromarray(a), target)
        diff = np.abs(out[i] - np.asarray(host, np.float32) / 255.0)
        assert diff.max() < 1.5 / 255.0, (i, diff.max())


def test_predictor_device_letterbox_matches_host_path(cfg, model_and_vars,
                                                      temp_dataset_dir):
    from yolo_from_scratch_tpu.infer.predict import Predictor

    _, variables = model_and_vars
    img = sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[0]
    host_p = Predictor(variables, cfg, conf_threshold=1e-3, max_outputs=32)
    dev_p = Predictor(variables, cfg, conf_threshold=1e-3, max_outputs=32,
                      device_letterbox=True)
    a = host_p(str(img))
    b = dev_p(str(img))
    assert len(a) == len(b)
    for da, db in zip(a, b):
        np.testing.assert_allclose(da[:5], db[:5], rtol=0.05, atol=1.0)
        assert da[5] == db[5]


def test_batch_predictor_device_letterbox(cfg, model_and_vars,
                                          temp_dataset_dir):
    from yolo_from_scratch_tpu.infer.predict import BatchPredictor

    _, variables = model_and_vars
    imgs = [str(p) for p in
            sorted((temp_dataset_dir / "val" / "images").glob("*.jpg"))[:2]]
    host_p = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                            max_outputs=32)
    dev_p = BatchPredictor(variables, cfg, conf_threshold=1e-3,
                           max_outputs=32, device_letterbox=True)
    a = host_p(imgs)
    b = dev_p(imgs)
    for dets_a, dets_b in zip(a, b):
        assert len(dets_a) == len(dets_b)
        for da, db in zip(dets_a, dets_b):
            np.testing.assert_allclose(da[:5], db[:5], rtol=0.05, atol=1.0)
