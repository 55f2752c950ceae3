"""Head+decode fused Pallas kernel vs the XLA head-conv + packed decode.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by scripts/bench_int8.py (int8_headdec variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models import quantized as Q
from yolov3_tpu.ops.decode import decode_detections
from yolov3_tpu.ops.pallas.head_decode_kernel import head_decode

ANCHORS = ((13.0, 29.0), (31.0, 11.0))


def _oracle_one_scale(x, w, b, anchors, ncls, stride, cast_bf16):
    """The XLA path: 1x1 conv + bias in the compute dtype, then the
    packed decode (models/quantized.py::_apply_head + ops/decode.py)."""
    dt = jnp.bfloat16 if cast_bf16 else jnp.float32
    fm = jax.lax.conv_general_dilated(
        x.astype(dt), w.reshape(1, 1, *w.shape).astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dt)
    return decode_detections([fm], anchors, ncls, [stride])


@pytest.mark.parametrize("cast_bf16", [True, False])
@pytest.mark.parametrize("h,cin,ncls", [(4, 32, 2), (6, 24, 3)])
def test_kernel_matches_oracle(h, cin, ncls, cast_bf16):
    rng = np.random.RandomState(h + cin)
    d = 5 + ncls
    ad = len(ANCHORS) * d
    x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32),
                    jnp.bfloat16 if cast_bf16 else jnp.float32)
    w = jnp.asarray(rng.randn(cin, ad).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(ad).astype(np.float32) * 0.1)

    ref = _oracle_one_scale(x, w, b, ANCHORS, ncls, 8, cast_bf16)
    got = head_decode(x, w, b, anchors=ANCHORS, number_classes=ncls,
                      stride=8, cast_bf16=cast_bf16, interpret=True)
    assert got.shape == ref.shape
    if cast_bf16:
        # the kernel's dot and XLA's conv round their f32 accumulations
        # to bf16 in different orders: 1-ulp bf16 logit flips amplified
        # by exp()*anchor / stride on the box lanes
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=0.15)
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=5e-3)


def test_row_ordering_multiband():
    """Cell offsets must survive row-banding and batch tiling: a grid tall
    enough to split into several bands, checked against the oracle."""
    rng = np.random.RandomState(0)
    cin, ncls = 16, 1
    ad = len(ANCHORS) * (5 + ncls)
    x = jnp.asarray(rng.randn(4, 16, 8, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(cin, ad).astype(np.float32) * 0.1)
    b = jnp.zeros((ad,), jnp.float32)
    ref = _oracle_one_scale(x, w, b, ANCHORS, ncls, 16, False)
    got = head_decode(x, w, b, anchors=ANCHORS, number_classes=ncls,
                      stride=16, cast_bf16=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-3)


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=ANCHORS, compute_dtype="float32")
    from yolov3_tpu.models.yolo import YoloV3

    m = YoloV3(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    return cfg, v["params"], v["batch_stats"], x


def test_forward_detections_bf16_mode(small_model):
    """forward_detections(head_decode_pallas) == decode(feature_maps) in
    the unquantized mode, full (small) model."""
    cfg, p, bs, x = small_model
    ref = decode_detections(Q.forward_feature_maps(p, bs, cfg, x),
                            cfg.anchors, cfg.number_classes, cfg.strides)
    got = Q.forward_detections(p, bs, cfg, x, head_decode_pallas=True,
                               fused_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-3)


def test_forward_detections_int8_mode(small_model):
    """Same comparison through the int8 path (both share the quantized
    necks, so the only difference is the head+decode implementation)."""
    cfg, p, bs, x = small_model
    scales = Q.calibrate(p, bs, cfg, x)
    fms = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales)
    ref = decode_detections(fms, cfg.anchors, cfg.number_classes,
                            cfg.strides)
    got = Q.forward_detections(p, bs, cfg, x, act_scales=scales,
                               head_decode_pallas=True,
                               fused_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-3)


def test_forward_detections_fallback_matches():
    """Shapes the kernel's VMEM plan rejects fall back to the XLA path."""
    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=ANCHORS, compute_dtype="float32")
    from yolov3_tpu.models.yolo import YoloV3

    m = YoloV3(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(2, 64, 64, 3).astype(np.float32))
    ref = Q.forward_detections(v["params"], v["batch_stats"], cfg, x,
                               head_decode_pallas=False)
    got = Q.forward_detections(v["params"], v["batch_stats"], cfg, x,
                               head_decode_pallas=True,
                               fused_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-3)
