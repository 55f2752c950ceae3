"""Fused Pallas pointwise conv block vs the standard Flax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models.yolo import ConvBlock, YoloV3
from yolov3_tpu.ops.pallas.conv_block_kernel import fused_pointwise_conv_block


def randomize(variables, seed=0):
    r = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda a: a + 0.1 * r.rand(*a.shape).astype(np.float32), variables)


class TestKernelDirect:
    def test_matches_reference_math(self, rng):
        ci, co = 8, 16
        x = rng.randn(1, 4, 4, ci).astype(np.float32)
        k = rng.randn(1, 1, ci, co).astype(np.float32) * 0.1
        b = rng.randn(co).astype(np.float32) * 0.1
        scale = 1.0 + 0.1 * rng.rand(co).astype(np.float32)
        offset = 0.1 * rng.randn(co).astype(np.float32)
        mean = 0.1 * rng.randn(co).astype(np.float32)
        var = 1.0 + 0.1 * rng.rand(co).astype(np.float32)

        got = np.asarray(fused_pointwise_conv_block(
            x, k, b, scale, offset, mean, var, alpha=0.2, eps=1e-3,
            out_dtype=jnp.float32, interpret=True))

        y = x.reshape(-1, ci) @ k.reshape(ci, co) + b
        y = np.where(y >= 0, y, 0.2 * y)
        y = (y - mean) / np.sqrt(var + 1e-3) * scale + offset
        want = y.reshape(1, 4, 4, co)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 matmul


class TestConvBlockIntegration:
    def test_eval_matches_standard_path(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
        std = ConvBlock(features=64, kernel=1, dtype=jnp.float32)
        fused = ConvBlock(features=64, kernel=1, dtype=jnp.float32,
                          use_pallas_pointwise=True)
        variables = randomize(std.init(jax.random.PRNGKey(0), x, train=False))
        a = np.asarray(std.apply(variables, x, train=False))
        b = np.asarray(fused.apply(variables, x, train=False))
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)

    def test_train_path_unaffected(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
        fused = ConvBlock(features=64, kernel=1, dtype=jnp.float32,
                          use_pallas_pointwise=True)
        variables = fused.init(jax.random.PRNGKey(0), x, train=False)
        out, mut = fused.apply(variables, x, train=True,
                               mutable=["batch_stats"])
        assert np.isfinite(np.asarray(out)).all()

    def test_full_model_flag(self, rng):
        base = dict(img_size=(64, 64, 3), number_classes=1,
                    anchors=((16, 16),), block_count=1, filter_count=64,
                    compute_dtype="float32", stem_space_to_depth=False)
        std = YoloV3(ModelConfig(use_pallas_pointwise=False, **base))
        fused = YoloV3(ModelConfig(use_pallas_pointwise=True, **base))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        variables = std.init(jax.random.PRNGKey(0), x, train=False)
        a = std.apply(variables, x, train=False)
        b = fused.apply(variables, x, train=False)
        # kernel computes in bf16 like the TPU default path; allow bf16
        # drift compounded across layers
        for fa, fb in zip(a, b):
            fa, fb = np.asarray(fa), np.asarray(fb)
            denom = np.maximum(np.abs(fa), 1.0)
            assert np.max(np.abs(fa - fb) / denom) < 0.05
