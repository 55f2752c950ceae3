"""Stride-1 3x3 Pallas kernel + fully-kernelized feature blocks vs the
quantized XLA mirror.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by scripts/bench_int8.py (int8_c3 variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models import quantized as Q
from yolov3_tpu.ops.pallas.conv3x3_kernel import conv3x3_block_q

from tests.test_down_conv import assert_quant_close, make_down

CFG = ModelConfig(img_size=(64, 64, 3), number_classes=2)


def make_3x3(rng, cin, cout):
    p, bs = make_down(rng, cin, cout)
    return p, bs


@pytest.mark.parametrize("cin,cout,h", [(16, 32, 8), (32, 16, 10)])
def test_conv3_matches_mirror(cin, cout, h):
    """s8-in, s8-out, no residual: _conv_block -> _quantize_act parity."""
    rng = np.random.RandomState(cin + h)
    p, bs = make_3x3(rng, cin, cout)
    scales = {"C3": 0.02, "NXT": 0.03}
    x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    xq = Q._quantize_act(x, jnp.float32(scales["C3"]))

    ref_ctx = Q._Ctx(CFG, act_scales=scales)
    ref = Q._quantize_act(Q._conv_block(ref_ctx, "C3", p, bs, xq),
                          jnp.float32(scales["NXT"]))

    c3_ctx = Q._Ctx(CFG, act_scales=scales, fused_interpret=True)
    got = Q._conv3_block(c3_ctx, "C3", p, bs, xq, "NXT")
    assert got.dtype == jnp.int8
    assert_quant_close(got, ref)


def test_conv3_residual_and_bf16_emit():
    """Output-side residual add (the feature block's `inputs + y`) plus
    the bf16 block-output emit, vs the mirror op sequence."""
    rng = np.random.RandomState(5)
    cin, cout, h = 16, 32, 8
    p, bs = make_3x3(rng, cin, cout)
    scales = {"C3": 0.02, "NXT": 0.03}
    s_res = 0.04
    x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    xq = Q._quantize_act(x, jnp.float32(scales["C3"]))
    rq = Q._quantize_act(
        jnp.asarray(rng.randn(2, h, h, cout).astype(np.float32) * 0.5),
        jnp.float32(s_res))

    ref_ctx = Q._Ctx(CFG, act_scales=scales)
    y = Q._conv_block(ref_ctx, "C3", p, bs, xq)
    res = (rq.astype(jnp.float32) * jnp.float32(s_res)).astype(jnp.bfloat16)
    ref_bf16 = res + y
    ref_q = Q._quantize_act(ref_bf16, jnp.float32(scales["NXT"]))

    c3_ctx = Q._Ctx(CFG, act_scales=scales, fused_interpret=True)
    got_q, got_bf16 = Q._conv3_block(c3_ctx, "C3", p, bs, xq, "NXT",
                                     residual_q=rq, res_scale=s_res,
                                     emit_s8=True, emit_bf16=True)
    assert_quant_close(got_q, ref_q)
    d = np.abs(np.asarray(got_bf16, np.float32)
               - np.asarray(ref_bf16, np.float32))
    assert d.max() <= 0.1 * np.asarray(ref_bf16, np.float32).std() + 1e-5


def test_feature_block_c3_chain_matches_mirror():
    """_feature_block with pointwise+conv3 == plain int8 mirror: the
    whole block runs as chained Pallas passes (s8-only HBM traffic)."""
    from tests.pallas_helpers import make_block

    rng = np.random.RandomState(9)
    c, reps, h = 32, 2, 8
    p, bs = make_block(rng, c, reps)
    x = jnp.asarray(rng.randn(2, h, h, c).astype(np.float32), jnp.bfloat16)
    collect = {}
    Q._feature_block(Q._Ctx(CFG, collect=collect), "FB", p, bs, x, reps)
    scales = {k: max(float(v), 1e-12) / 127.0 for k, v in collect.items()}

    ref = Q._feature_block(Q._Ctx(CFG, act_scales=scales), "FB", p, bs,
                           x, reps)
    got = Q._feature_block(
        Q._Ctx(CFG, act_scales=scales, pointwise_pallas=True,
               conv3_pallas=True, fused_interpret=True), "FB", p, bs,
        x, reps)
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    d = np.abs(got - ref)
    assert d.max() <= 0.15 * ref.std() + 1e-6, (d.max(), ref.std())
    assert d.mean() <= 0.02 * ref.std() + 1e-7


def test_full_model_c3():
    """End-to-end forward_feature_maps(pointwise+conv3) tracks the plain
    int8 path (decode-level fidelity, same gate as the pointwise test)."""
    from yolov3_tpu.models.yolo import YoloV3
    from yolov3_tpu.ops.decode import decode_detections

    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=((16, 48), (48, 16)), block_count=2,
                      filter_count=32)
    model = YoloV3(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    p, bs = variables["params"], variables["batch_stats"]
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(p, bs, cfg, x)

    ref = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales)
    got = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales,
                                 pointwise_pallas=True, conv3_pallas=True,
                                 fused_interpret=True)

    def boxes(fms):
        return np.asarray(decode_detections(
            fms, cfg.anchors, cfg.number_classes, cfg.strides), np.float32)

    fid = Q.decode_iou_fidelity(boxes(ref), boxes(got), top_k=10)
    assert fid > 0.95, fid


def test_all_kernels_engage_full_model():
    """With every serving kernel flag on, the forward routes through the
    expected number of Pallas passes (stem2+CB3/4/5 downsamples, FB0 tail,
    exit, per-FB pw+conv3 chains) — a regression net for eligibility
    guards silently falling back to XLA."""
    from yolov3_tpu.models.yolo import YoloV3

    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=((8, 16), (16, 8)), compute_dtype="float32")
    m = YoloV3(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    scales = Q.calibrate(v["params"], v["batch_stats"], cfg, x)
    jx = str(jax.make_jaxpr(lambda im: Q.forward_feature_maps(
        v["params"], v["batch_stats"], cfg, im, act_scales=scales,
        pointwise_pallas=True, conv3_pallas=True, down_pallas=True,
        exit_pallas=True, fused_interpret=True))(x))
    assert jx.count("pallas_call") >= 20, jx.count("pallas_call")
