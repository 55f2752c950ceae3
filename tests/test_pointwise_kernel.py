"""Transposed-view pointwise (1x1) Pallas kernel vs the quantized mirror.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by scripts/bench_int8.py (int8_pointwise variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models import quantized as Q

from tests.pallas_helpers import assert_quant_faithful, make_block

CFG = ModelConfig(img_size=(64, 64, 3), number_classes=2)


def assert_quant_close(got, ref):
    """Quantization-noise bound for residual-bearing comparisons.

    This environment compiles with --xla_allow_excess_precision, so XLA
    may elide intermediate bf16 roundings differently in the kernel and
    the mirror; inputs quantized from such chains flip by 1 LSB on .5
    boundaries and the flips smear through the conv — MANY elements then
    differ by a tiny amount (measured: ~70% differ, max 8% of std, mean
    0.7% of std). A wiring bug mismatches at output scale instead."""
    got = np.array(got, np.float32)
    ref = np.array(ref, np.float32)
    d = np.abs(got - ref)
    assert d.max() <= 0.15 * ref.std() + 1e-6, (d.max(), ref.std())
    assert d.mean() <= 0.02 * ref.std() + 1e-7, (d.mean(), ref.std())


def calibrated_block(p, bs, x, reps):
    collect = {}
    Q._feature_block(Q._Ctx(CFG, collect=collect), "FB", p, bs, x, reps)
    return {k: max(float(v), 1e-12) / 127.0 for k, v in collect.items()}


@pytest.mark.parametrize("c,reps,h", [(32, 2, 8), (64, 1, 10)])
def test_feature_block_pw_matches_mirror(c, reps, h):
    """_feature_block with pointwise_pallas == plain int8 mirror (up to
    .5-quantization-boundary noise)."""
    rng = np.random.RandomState(c + reps)
    p, bs = make_block(rng, c, reps)
    x = jnp.asarray(rng.randn(2, h, h, c).astype(np.float32), jnp.bfloat16)
    scales = calibrated_block(p, bs, x, reps)

    ref = Q._feature_block(Q._Ctx(CFG, act_scales=scales), "FB", p, bs,
                           x, reps)
    got = Q._feature_block(
        Q._Ctx(CFG, act_scales=scales, pointwise_pallas=True,
               fused_interpret=True), "FB", p, bs, x, reps)
    assert_quant_close(got, ref)


def test_pw_block_emit_bf16_matches_conv_block():
    """The emit_bf16 output equals the plain _conv_block epilogue output;
    the s8 output equals its quantization for the next conv."""
    rng = np.random.RandomState(5)
    c = 32
    p, bs = make_block(rng, c, 1)
    p1, bs1 = p["ConvBlock_0"], bs["ConvBlock_0"]  # 1x1 c -> c//2
    x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32), jnp.bfloat16)
    sx, snext = 0.11, 0.07
    scales = {"a": sx, "b": snext}

    ctx = Q._Ctx(CFG, act_scales=scales, fused_interpret=True,
                 pointwise_pallas=True)
    q, y_bf16 = Q._pw_block(ctx, "a", p1, bs1, x, "b", emit_bf16=True)

    ref_y = Q._conv_block(Q._Ctx(CFG, act_scales=scales), "a", p1, bs1, x)
    ref_q = Q._quantize_act(ref_y, jnp.float32(snext))
    assert_quant_faithful(np.asarray(y_bf16, np.float32),
                          np.asarray(ref_y, np.float32))
    dq = (np.asarray(q, np.int32) != np.asarray(ref_q, np.int32))
    assert dq.mean() <= 0.02, dq.mean()


def test_pw_block_residual_matches_mirror():
    """Residual variant: kernel(y, rq) == quantize(dq(rq) + y) -> conv."""
    rng = np.random.RandomState(9)
    c = 32
    p, bs = make_block(rng, c, 1)
    p1, bs1 = p["ConvBlock_0"], bs["ConvBlock_0"]
    y = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32), jnp.bfloat16)
    rq = jnp.asarray(rng.randint(-127, 128, (2, 8, 8, c)), jnp.int8)
    s_in, sx, snext = 0.21, 0.13, 0.06
    scales = {"a": sx, "b": snext}

    ctx = Q._Ctx(CFG, act_scales=scales, fused_interpret=True,
                 pointwise_pallas=True)
    q = Q._pw_block(ctx, "a", p1, bs1, y, "b", residual_q=rq,
                    res_scale=s_in)

    t = (rq.astype(jnp.float32) * s_in).astype(jnp.bfloat16) + y
    ref_y = Q._conv_block(Q._Ctx(CFG, act_scales=scales), "a", p1, bs1, t)
    ref_q = Q._quantize_act(ref_y, jnp.float32(snext))
    d = np.abs(np.asarray(q, np.int32) - np.asarray(ref_q, np.int32))
    # excess-precision elision flips .5-boundary input quantizations by
    # 1 LSB; composed through the conv the output flips by up to 2
    assert d.max() <= 2, d.max()
    assert (d > 0).mean() <= 0.15, (d > 0).mean()


def test_forward_feature_maps_pointwise_interpret():
    """End-to-end: forward_feature_maps(pointwise_pallas=True) tracks the
    plain int8 path through the whole model (yolo blocks included)."""
    from yolov3_tpu.models.yolo import YoloV3

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
                                 pointwise_pallas=True,
                                 fused_interpret=True)
    from yolov3_tpu.ops.decode import decode_detections

    def boxes(fms):
        return np.asarray(decode_detections(
            fms, cfg.anchors, cfg.number_classes, cfg.strides), np.float32)

    # near-zero feature maps make per-map std ratios meaningless at random
    # init; the decode-level fidelity is the metric that matters
    fid = Q.decode_iou_fidelity(boxes(ref), boxes(got), top_k=10)
    assert fid > 0.95, fid
    for a, b in zip(got, ref):
        d = np.abs(np.array(a, np.float32) - np.array(b, np.float32))
        assert d.max() <= 0.2 * (np.array(b, np.float32).std() + 0.05)
