"""Exit-conv Pallas kernel vs the quantized XLA mirror.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by scripts/bench_int8.py (int8_exit_pallas variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models import quantized as Q
from yolov3_tpu.models import yolo as Y
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.ops.pallas.exit_conv_kernel import (exit_conv_block_q,
                                                    vmem_fits)

ANCHORS = ((16, 16), (64, 64))


def make_model():
    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=ANCHORS, block_count=1, filter_count=64,
                      compute_dtype="float32", stem_space_to_depth=True)
    model = YoloV3(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return cfg, variables, x


class TestKernelOracle:
    def test_matches_conv_block_mirror(self):
        """Kernel == _conv_block(lifted exit kernel) -> _quantize_act,
        element-exact up to 1-LSB .5-boundary rounding flips."""
        rng = np.random.RandomState(7)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=ANCHORS)
        ci, co, h = 16, 32, 16
        w3 = rng.randn(3, 3, ci, co).astype(np.float32)
        p = {"Conv_0": {"kernel": jnp.asarray(w3),
                        "bias": jnp.asarray(rng.randn(co), jnp.float32)}}
        bsd = {"BatchNorm_0": {
            "mean": jnp.asarray(rng.randn(co), jnp.float32) * 0.1,
            "var": jnp.asarray(1.0 + rng.rand(co), jnp.float32)}}
        p["BatchNorm_0"] = {
            "scale": jnp.asarray(1.0 + 0.1 * rng.randn(co), jnp.float32),
            "bias": jnp.asarray(rng.randn(co), jnp.float32) * 0.1}
        x = jnp.asarray(rng.randn(2, h, h, 4 * ci).astype(np.float32))
        k3 = Y._s2d_kernel_stride2_exit(jnp.asarray(w3))
        sx, snext = 0.09, 0.05
        scales = {"cb2": sx}

        ref_y = Q._conv_block(Q._Ctx(cfg, act_scales=scales), "cb2", p, bsd,
                              x, kernel_override=k3,
                              padding=((0, 1), (0, 1)))
        ref_q = Q._quantize_act(ref_y, jnp.float32(snext))

        wq, sw = Q._quantize_weight(k3)
        dq = jnp.float32(sx) * sw
        mul, add = Q._bn_affine(cfg, p, bsd)
        epi = jnp.stack([p["Conv_0"]["bias"].astype(jnp.float32) / dq,
                         mul * dq, add,
                         jnp.full_like(add, 1.0 / snext)])
        got = exit_conv_block_q(Q._quantize_act(x, jnp.float32(sx)),
                                wq.reshape(4, 4 * ci, co), epi,
                                alpha=cfg.leaky_relu_alpha, interpret=True)

        diff = (np.asarray(got, np.int32) != np.asarray(ref_q, np.int32))
        maxd = np.abs(np.asarray(got, np.int32)
                      - np.asarray(ref_q, np.int32)).max()
        assert maxd <= 1, maxd  # .5-boundary rounding only
        assert diff.mean() <= 0.02, diff.mean()

    def test_vmem_fits_flagship(self):
        assert vmem_fits(128, 128, 64, 256, 128)  # 512px b64 shape
        assert vmem_fits(256, 256, 8, 256, 128)   # 1024px tiles


class TestModelIntegration:
    def test_forward_matches_mirror(self):
        """forward_feature_maps with exit_pallas on == off (up to
        quantization .5-boundary noise smeared through the deep net)."""
        cfg, variables, x = make_model()
        p, bs = variables["params"], variables["batch_stats"]
        scales = Q.calibrate(p, bs, cfg, x)
        ref = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales)
        got = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales,
                                     exit_pallas=True, fused_interpret=True)
        for a, b in zip(got, ref):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            d = np.abs(a - b)
            assert d.max() <= 0.15 * b.std() + 1e-6, (d.max(), b.std())
            assert d.mean() <= 0.02 * b.std() + 1e-7, (d.mean(), b.std())

    def test_falls_back_when_next_block_skipped(self):
        """quant_skip on FeatureBlock_1/ConvBlock_0 must bypass the kernel
        (it cannot emit a pre-quantized input for a bf16 conv)."""
        cfg, variables, x = make_model()
        p, bs = variables["params"], variables["batch_stats"]
        scales = Q.calibrate(p, bs, cfg, x)
        skip = ("Darknet53_0/ConvBlock_0",
                "Darknet53_0/FeatureBlock_1/ConvBlock_0")
        ref = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales,
                                     quant_skip=skip)
        got = Q.forward_feature_maps(p, bs, cfg, x, act_scales=scales,
                                     quant_skip=skip, exit_pallas=True,
                                     fused_interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
