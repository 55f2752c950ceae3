"""Space-to-depth stem: exact equivalence with the standard conv stem.

The S2D stem must produce the same outputs, the same variable tree, and the
same BN statistics as the standard path, from the SAME parameters — it is a
pure execution-layout rewrite for TPU lane utilization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models.yolo import YoloV3, space_to_depth


def make_models(img=(64, 64, 3)):
    base = dict(img_size=img, number_classes=2, anchors=((16, 16), (32, 32)),
                block_count=1, filter_count=64, compute_dtype="float32")
    std = YoloV3(ModelConfig(stem_space_to_depth=False, **base))
    s2d = YoloV3(ModelConfig(stem_space_to_depth=True, **base))
    return std, s2d


class TestSpaceToDepth:
    def test_layout(self, rng):
        x = jnp.asarray(rng.rand(1, 4, 6, 3).astype(np.float32))
        y = np.asarray(space_to_depth(x))
        assert y.shape == (1, 2, 3, 12)
        # channel order (dy, dx, c)
        x = np.asarray(x)
        np.testing.assert_array_equal(y[0, 0, 0, 0:3], x[0, 0, 0])
        np.testing.assert_array_equal(y[0, 0, 0, 3:6], x[0, 0, 1])
        np.testing.assert_array_equal(y[0, 0, 0, 6:9], x[0, 1, 0])
        np.testing.assert_array_equal(y[0, 0, 0, 9:12], x[0, 1, 1])
        np.testing.assert_array_equal(y[0, 1, 2, 0:3], x[0, 2, 4])


class TestStemEquivalence:
    def test_same_variable_tree(self):
        std, s2d = make_models()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v_std = std.init(jax.random.PRNGKey(0), x, train=False)
        v_s2d = s2d.init(jax.random.PRNGKey(0), x, train=False)
        paths_std = {jax.tree_util.keystr(p): l.shape for p, l in
                     jax.tree_util.tree_leaves_with_path(v_std)}
        paths_s2d = {jax.tree_util.keystr(p): l.shape for p, l in
                     jax.tree_util.tree_leaves_with_path(v_s2d)}
        assert paths_std == paths_s2d

    def test_inference_outputs_match(self, rng):
        std, s2d = make_models()
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = std.init(jax.random.PRNGKey(1), x, train=False)
        # randomize BN running stats so eval normalization is non-trivial
        variables = jax.tree_util.tree_map(
            lambda a: a + 0.05 * np.random.RandomState(0).rand(*a.shape
                                                               ).astype(a.dtype),
            variables)
        out_std = std.apply(variables, x, train=False)
        out_s2d = s2d.apply(variables, x, train=False)
        # the stem itself matches to ~1e-5; differences amplify through the
        # deep net, so the end-to-end tolerance is looser
        for a, b in zip(out_std, out_s2d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)

    def test_train_outputs_and_stats_match(self, rng):
        std, s2d = make_models()
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = std.init(jax.random.PRNGKey(1), x, train=False)
        out_std, mut_std = std.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        out_s2d, mut_s2d = s2d.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        for a, b in zip(out_std, out_s2d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)
        # BN running stats across the whole S2D region updated identically
        dk_std = mut_std["batch_stats"]["Darknet53_0"]
        dk_s2d = mut_s2d["batch_stats"]["Darknet53_0"]
        region = [dk_std["ConvBlock_0"]["BatchNorm_0"],
                  dk_std["ConvBlock_1"]["BatchNorm_0"],
                  dk_std["FeatureBlock_0"]["ConvBlock_0"]["BatchNorm_0"],
                  dk_std["FeatureBlock_0"]["ConvBlock_1"]["BatchNorm_0"],
                  dk_std["ConvBlock_2"]["BatchNorm_0"]]
        region_s2d = [dk_s2d["ConvBlock_0"]["BatchNorm_0"],
                      dk_s2d["ConvBlock_1"]["BatchNorm_0"],
                      dk_s2d["FeatureBlock_0"]["ConvBlock_0"]["BatchNorm_0"],
                      dk_s2d["FeatureBlock_0"]["ConvBlock_1"]["BatchNorm_0"],
                      dk_s2d["ConvBlock_2"]["BatchNorm_0"]]
        for bs_std, bs_s2d in zip(region, region_s2d):
            np.testing.assert_allclose(np.asarray(bs_std["mean"]),
                                       np.asarray(bs_s2d["mean"]),
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(bs_std["var"]),
                                       np.asarray(bs_s2d["var"]),
                                       rtol=1e-3, atol=1e-4)

    def test_gradients_match(self, rng):
        std, s2d = make_models()
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        variables = std.init(jax.random.PRNGKey(1), x, train=False)

        def loss(model, params):
            fms = model.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              x, train=False)
            return sum(jnp.sum(jnp.square(fm)) for fm in fms)

        g_std = jax.grad(lambda p: loss(std, p))(variables["params"])
        g_s2d = jax.grad(lambda p: loss(s2d, p))(variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g_std),
                        jax.tree_util.tree_leaves(g_s2d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3)

    def test_base_grad_vjp_matches_autodiff(self, rng):
        """`s2d_base_grads` (custom VJP, weight-grads in base-kernel space)
        must reproduce plain autodiff through the lifted kernels to fp32
        reassociation noise — params AND input cotangents, train mode."""
        base = dict(img_size=(64, 64, 3), number_classes=2,
                    anchors=((16, 16), (32, 32)), block_count=1,
                    filter_count=64, compute_dtype="float32",
                    stem_space_to_depth=True)
        on = YoloV3(ModelConfig(s2d_base_grads=True, **base))
        off = YoloV3(ModelConfig(s2d_base_grads=False, **base))
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = on.init(jax.random.PRNGKey(1), x, train=False)

        def loss(model, params, xx):
            fms, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(fm)) for fm in fms)

        g_on = jax.grad(lambda p, xx: loss(on, p, xx),
                        argnums=(0, 1))(variables["params"], x)
        g_off = jax.grad(lambda p, xx: loss(off, p, xx),
                         argnums=(0, 1))(variables["params"], x)
        for a, b in zip(jax.tree_util.tree_leaves(g_on),
                        jax.tree_util.tree_leaves(g_off)):
            # atol covers cancellation noise on near-zero elements of
            # large-magnitude grad leaves (values here reach ~2e3)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-2)

    def test_stem1_im2row_grads_match_autodiff(self, rng):
        """`stem1_im2row_grads` (weight grad via im2row patches matmul)
        must reproduce plain autodiff through the lifted stem1 kernel —
        params AND input cotangents, train mode, f32."""
        base = dict(img_size=(64, 64, 3), number_classes=2,
                    anchors=((16, 16), (32, 32)), block_count=1,
                    filter_count=64, compute_dtype="float32",
                    stem_space_to_depth=True)
        on = YoloV3(ModelConfig(stem1_im2row_grads=True, **base))
        off = YoloV3(ModelConfig(stem1_im2row_grads=False, **base))
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = on.init(jax.random.PRNGKey(1), x, train=False)

        def loss(model, params, xx):
            fms, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(fm)) for fm in fms)

        g_on = jax.grad(lambda p, xx: loss(on, p, xx),
                        argnums=(0, 1))(variables["params"], x)
        g_off = jax.grad(lambda p, xx: loss(off, p, xx),
                         argnums=(0, 1))(variables["params"], x)
        for a, b in zip(jax.tree_util.tree_leaves(g_on),
                        jax.tree_util.tree_leaves(g_off)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-2)

    def test_odd_input_channels(self, rng):
        """Grayscale (C=1) images work through the S2D stem."""
        base = dict(img_size=(64, 64, 1), number_classes=1,
                    anchors=((16, 16),), block_count=1, filter_count=64,
                    compute_dtype="float32")
        s2d = YoloV3(ModelConfig(stem_space_to_depth=True, **base))
        x = jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32))
        v = s2d.init(jax.random.PRNGKey(0), x, train=False)
        fms = s2d.apply(v, x, train=False)
        assert fms[0].shape[1:3] == (2, 2)
