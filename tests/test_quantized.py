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
