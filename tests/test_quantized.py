"""int8 serving-path tests.

The pure-function mirror's bf16 mode must reproduce the Flax model exactly
(wiring oracle); the int8 mode must be exact when weights/activations sit on
the quantization grid, and close (decode IoU) on random weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models import quantized as Q
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.ops.decode import decode_detections

ANCHORS = ((16, 16), (64, 64))


def make_model(s2d, fc=64, dtype="float32"):
    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=ANCHORS, block_count=1, filter_count=fc,
                      compute_dtype=dtype, stem_space_to_depth=s2d)
    model = YoloV3(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return cfg, model, variables, x


class TestWiringParity:
    @pytest.mark.parametrize("s2d", [False, True])
    def test_bf16_mode_matches_flax(self, s2d):
        cfg, model, variables, x = make_model(s2d)
        want = model.apply(variables, x, train=False)
        got = Q.forward_feature_maps(variables["params"],
                                     variables["batch_stats"], cfg, x)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-4, atol=2e-4)


class TestHeadPad:
    def test_head_pad_matches_unpadded(self):
        """Co-padded head convs + dp-strided decode reproduce the plain
        forward_detections output to last-ulp tolerance (the pad lanes are
        zero-weight and never touch the real lanes; the only residue is
        the conv's different reduction tiling at Co=128 vs Co=14)."""
        cfg, model, variables, x = make_model(True)
        assert Q.head_pad_width(cfg) == 64  # A=2, d=7 -> dp=64
        p, bs = variables["params"], variables["batch_stats"]
        want = np.asarray(Q.forward_detections(p, bs, cfg, x))
        got = np.asarray(Q.forward_detections(p, bs, cfg, x, head_pad=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_head_matmul_matches_conv(self):
        """The flattened-view matmul head reproduces the 1x1-conv head
        (same contraction, different tiling -> last-ulp tolerance)."""
        cfg, model, variables, x = make_model(True)
        p, bs = variables["params"], variables["batch_stats"]
        want = np.asarray(Q.forward_detections(p, bs, cfg, x))
        got = np.asarray(Q.forward_detections(p, bs, cfg, x,
                                              head_matmul=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_rep_requant_bit_identical(self):
        """Rep-boundary requantization only MOVES the next 1x1's input
        quantize into the residual-add fusion (same scale, same values) —
        the feature maps must be bit-identical, not merely close."""
        cfg, model, variables, x = make_model(True)
        p, bs = variables["params"], variables["batch_stats"]
        scales = Q.calibrate(p, bs, cfg, x)
        ref = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales)
        got = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales,
                                     rep_requant=True)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rep_requant_final_bit_identical(self):
        """The final-rep extension stores FB1/FB4's exit boundary
        pre-quantized at the single consumer's scale (ConvBlock_3 /
        YoloBlock_0's entry 1x1) — that consumer quantizes with exactly
        this scale anyway, so the maps must stay bit-identical."""
        cfg, model, variables, x = make_model(True)
        p, bs = variables["params"], variables["batch_stats"]
        scales = Q.calibrate(p, bs, cfg, x)
        ref = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales)
        got = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales,
                                     rep_requant=True,
                                     rep_requant_final=True)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_head_pad_width_fallbacks(self):
        # A=3 does not divide 128 -> no padding
        cfg3 = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                           anchors=((16, 16), (32, 32), (64, 64)))
        assert Q.head_pad_width(cfg3) == 0
        # huge class count: A*(5+C) >= 128 already -> no padding
        cfg_wide = ModelConfig(img_size=(64, 64, 3), number_classes=123,
                               anchors=ANCHORS)
        assert Q.head_pad_width(cfg_wide) == 0


class TestCalibration:
    def test_scales_cover_every_conv(self):
        cfg, model, variables, x = make_model(True)
        scales = Q.calibrate(variables["params"], variables["batch_stats"],
                             cfg, x)
        # stem region 5 (CB0, CB1, FB0 x2, CB2) + deep stride convs 3
        # (CB3..5) + feature blocks with block_count=1: FB1 (2 reps) 4 +
        # FB2 2 + FB3 2 + FB4 (0 reps) 0 + yolo blocks 3x6 + FPN 1x1 x2
        assert len(scales) == 5 + 3 + 4 + 2 + 2 + 0 + 18 + 2
        assert all(s > 0 for s in scales.values())
        # int8 forward runs with these scales and stays finite
        fms = Q.forward_feature_maps(variables["params"],
                                     variables["batch_stats"], cfg, x,
                                     act_scales=scales)
        for fm in fms:
            assert np.isfinite(np.asarray(fm, np.float32)).all()

    def test_percentile_calibration(self):
        """Percentile scales clip the range: every scale <= its absmax
        twin, the same conv set is covered, and the int8 path still runs."""
        cfg, model, variables, x = make_model(True)
        p, bs = variables["params"], variables["batch_stats"]
        full = Q.calibrate(p, bs, cfg, x)
        clipped = Q.calibrate(p, bs, cfg, x, percentile=99.0)
        assert set(clipped) == set(full)
        assert all(clipped[k] <= full[k] * (1 + 1e-6) for k in full)
        # activations are continuous -> p99 strictly clips somewhere
        assert any(clipped[k] < full[k] * 0.999 for k in full)
        fms = Q.forward_feature_maps(p, bs, cfg, x, act_scales=clipped)
        for fm in fms:
            assert np.isfinite(np.asarray(fm, np.float32)).all()

    def test_histogram_percentile_dense_matches_exact(self):
        """On dense data (real activation sizes) the O(bins) histogram
        percentile tracks jnp.percentile within a bin or two."""
        rng = np.random.RandomState(3)
        pct = 99.5
        for sample in (np.abs(rng.randn(200_000)),
                       rng.lognormal(0.0, 1.0, 200_000)):  # heavy tail
            a = jnp.asarray(sample.astype(np.float32))
            m = jnp.maximum(jnp.max(a), 1e-30)
            idx = jnp.minimum((a * (Q._HIST_BINS / m)).astype(jnp.int32),
                              Q._HIST_BINS - 1)
            counts = jnp.zeros((Q._HIST_BINS,), jnp.int32).at[idx].add(1)
            got = float(Q._hist_percentile(counts, m, pct))
            want = float(jnp.percentile(a, pct))
            binw = float(m) / Q._HIST_BINS
            assert abs(got - want) <= 2 * binw, (got, want, binw)

    def test_histogram_percentile_bracketed_on_model(self):
        """Model-level guard: each layer's histogram percentile must land
        between the exact bracketing order statistics (± one bin), however
        tiny the layer's activation tensor."""
        cfg, model, variables, x = make_model(True)
        p, bs = variables["params"], variables["batch_stats"]
        # exact oracle: collect the raw |activations| (toy sizes only!)
        collect = {}
        Q.forward_feature_maps(p, bs, cfg, x, collect=collect,
                               collect_reduce="abs")
        pct = 99.0
        hist = Q.calibrate(p, bs, cfg, x, percentile=pct)
        for k, s in hist.items():
            got = s * 127.0  # calibrate divides by 127
            v = np.sort(np.asarray(collect[k], np.float32))
            n = v.size
            h = (n - 1) * pct / 100.0
            lo = v[int(np.floor(h))]
            hi = v[min(int(np.ceil(h)) + 1, n - 1)]
            binw = float(v[-1]) / Q._HIST_BINS
            assert lo - binw <= got <= hi + binw, (
                f"{k}: hist {got} outside [{lo}, {hi}] ± {binw}")

    def test_missing_scale_raises(self):
        cfg, model, variables, x = make_model(False)
        with pytest.raises(KeyError):
            Q.forward_feature_maps(variables["params"],
                                   variables["batch_stats"], cfg, x,
                                   act_scales={"bogus": 1.0})


class TestInt8Exactness:
    def test_grid_aligned_conv_block_is_exact(self):
        """Weights and activations on the quantization grid -> int8 conv
        reproduces the f32 conv bit-close."""
        rng = np.random.RandomState(1)
        c_in, c_out = 8, 16
        w = (rng.randint(-127, 128, (1, 1, c_in, c_out)) / 127.0 * 0.05
             ).astype(np.float32)
        w[0, 0, 0, :] = 0.05  # pin per-channel absmax so scales are exact
        x = rng.randint(-127, 128, (1, 4, 4, c_in)).astype(np.float32)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=1,
                          anchors=(ANCHORS[0],), compute_dtype="float32")
        p = {"Conv_0": {"kernel": jnp.asarray(w),
                        "bias": jnp.zeros((c_out,), jnp.float32)},
             "BatchNorm_0": {"scale": jnp.ones((c_out,), jnp.float32),
                             "bias": jnp.zeros((c_out,), jnp.float32)}}
        bs = {"BatchNorm_0": {"mean": jnp.zeros((c_out,), jnp.float32),
                              "var": jnp.ones((c_out,), jnp.float32)}}
        ctx_f = Q._Ctx(cfg)
        want = Q._conv_block(ctx_f, "c", p, bs, jnp.asarray(x))
        ctx_q = Q._Ctx(cfg, act_scales={"c": 1.0})
        got = Q._conv_block(ctx_q, "c", p, bs, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_zero_weight_channel_keeps_bias_precision(self):
        """An all-zero weight output channel must still contribute its
        bias/BN term exactly: the dq epilogue fold (b/dq then *dq) would
        destroy float32 precision if dq were floored at ~1e-14 for that
        channel (advisor round-2 finding)."""
        rng = np.random.RandomState(2)
        c_in, c_out = 8, 8
        w = rng.randn(1, 1, c_in, c_out).astype(np.float32) * 0.05
        w[..., 3] = 0.0  # dead output channel
        x = rng.randn(1, 4, 4, c_in).astype(np.float32)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=1,
                          anchors=(ANCHORS[0],), compute_dtype="float32")
        p = {"Conv_0": {"kernel": jnp.asarray(w),
                        "bias": jnp.asarray(
                            rng.randn(c_out).astype(np.float32))},
             "BatchNorm_0": {"scale": jnp.ones((c_out,), jnp.float32),
                             "bias": jnp.zeros((c_out,), jnp.float32)}}
        bs = {"BatchNorm_0": {"mean": jnp.zeros((c_out,), jnp.float32),
                              "var": jnp.ones((c_out,), jnp.float32)}}
        want = Q._conv_block(Q._Ctx(cfg), "c", p, bs, jnp.asarray(x))
        got = Q._conv_block(Q._Ctx(cfg, act_scales={"c": 0.1}), "c", p, bs,
                            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got)[..., 3],
                                   np.asarray(want)[..., 3],
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("s2d", [False, True])
    def test_decode_fidelity_random_weights(self, s2d):
        """Quality guard: int8 boxes track bf16 boxes on random weights."""
        cfg, model, variables, x = make_model(s2d)
        p, bs = variables["params"], variables["batch_stats"]
        scales = Q.calibrate(p, bs, cfg, x)

        def boxes(fms):
            return np.asarray(decode_detections(
                fms, cfg.anchors, cfg.number_classes, cfg.strides),
                np.float32)

        det_f = boxes(Q.forward_feature_maps(p, bs, cfg, x))
        det_q = boxes(Q.forward_feature_maps(p, bs, cfg, x,
                                             act_scales=scales))
        fid = Q.decode_iou_fidelity(det_f, det_q, top_k=10)
        assert fid > 0.9, f"decode IoU fidelity {fid}"
