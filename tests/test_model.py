"""Model structure tests on a shrunken network (full-size on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models.yolo import YoloV3, YoloV3Detector, nchw_to_nhwc, upsample_2x

TINY = dict(block_count=1, filter_count=64, compute_dtype="float32")


def tiny_config(img=(64, 64, 3), classes=2, anchors=((32, 32), (128, 128))):
    return ModelConfig(img_size=img, number_classes=classes, anchors=anchors, **TINY)


class TestUpsample:
    def test_nearest_2x(self, rng):
        x = jnp.asarray(rng.rand(1, 2, 3, 4).astype(np.float32))
        y = np.asarray(upsample_2x(x))
        assert y.shape == (1, 4, 6, 4)
        # ones-kernel transposed-conv equivalence: each pixel replicates 2x2
        for i in range(2):
            for j in range(3):
                block = y[0, 2 * i:2 * i + 2, 2 * j:2 * j + 2, :]
                np.testing.assert_array_equal(block, np.broadcast_to(
                    np.asarray(x)[0, i, j], (2, 2, 4)))


    def test_channel_sum_matches_ones_transposed_conv_oracle(self, rng):
        """Bug-compatible mode == reference/model.py:93-105 exactly.

        Numpy oracle: Conv2DTranspose, kernel (2,2,C,C) all ones, stride 2
        => out[n, 2i+di, 2j+dj, co] = sum_ci x[n, i, j, ci] for all co, di, dj.
        """
        x = rng.rand(2, 3, 4, 5).astype(np.float32)
        y = np.asarray(upsample_2x(jnp.asarray(x), channel_sum=True))
        assert y.shape == (2, 6, 8, 5)
        csum = x.sum(axis=-1)  # [n, h, w]
        oracle = np.repeat(np.repeat(csum, 2, axis=1), 2, axis=2)
        for co in range(5):
            np.testing.assert_allclose(y[..., co], oracle, rtol=1e-6)

    def test_model_flag_switches_upsample_mode(self, rng):
        """upsample_channel_sum changes outputs but not the variable tree."""
        base = dict(img_size=(64, 64, 3), number_classes=2,
                    anchors=((16, 16),), block_count=1, filter_count=32,
                    compute_dtype="float32")
        fixed = YoloV3(ModelConfig(**base))
        bugcompat = YoloV3(ModelConfig(upsample_channel_sum=True, **base))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = fixed.init(jax.random.PRNGKey(0), x, train=False)
        a = fixed.apply(v, x, train=False)
        b = bugcompat.apply(v, x, train=False)  # same tree loads
        assert not np.allclose(np.asarray(a[1]), np.asarray(b[1]))
        # stride-32 map is produced before any upsample: identical
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestYoloV3:
    def test_feature_map_shapes(self, rng):
        cfg = tiny_config()
        model = YoloV3(cfg)
        x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        fms = model.apply(variables, x, train=False)
        a, c = cfg.number_anchors, cfg.number_classes
        assert fms[0].shape == (2, 2, 2, a * (5 + c))    # stride 32
        assert fms[1].shape == (2, 4, 4, a * (5 + c))    # stride 16
        assert fms[2].shape == (2, 8, 8, a * (5 + c))    # stride 8

    def test_train_mode_updates_batch_stats(self, rng):
        cfg = tiny_config()
        model = YoloV3(cfg)
        x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(o, n) for o, n in zip(old, new))

    def test_detector_output_shape(self, rng):
        cfg = tiny_config()
        det_model = YoloV3Detector(cfg)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = det_model.init(jax.random.PRNGKey(0), x, train=False)
        det = det_model.apply(variables, x, train=False)
        assert det.shape == (1, cfg.number_output_boxes,
                             4 + 1 + cfg.number_classes)
        det = np.asarray(det)
        # objectness / probs are sigmoids
        assert np.all(det[..., 4] >= 0) and np.all(det[..., 4] <= 1)
        assert np.all(det[..., 5:] >= 0) and np.all(det[..., 5:] <= 1)

    def test_nchw_edge_adapter(self, rng):
        x_nchw = rng.rand(1, 3, 64, 64).astype(np.float32)
        x = nchw_to_nhwc(jnp.asarray(x_nchw))
        assert x.shape == (1, 64, 64, 3)
        np.testing.assert_array_equal(np.asarray(x)[0, :, :, 0], x_nchw[0, 0])

    def test_bfloat16_compute_f32_params(self, rng):
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=1,
                          anchors=((32, 32),), block_count=1, filter_count=64,
                          compute_dtype="bfloat16")
        model = YoloV3(cfg)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        fms = model.apply(variables, x, train=False)
        assert fms[0].dtype == jnp.bfloat16

    def test_full_size_param_count_plausible(self):
        """Full Darknet-53+heads should land in the ~60M parameter range."""
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=1,
                          anchors=((32, 32), (128, 128), (256, 256)))
        model = YoloV3(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        n_params = sum(np.prod(l.shape) for l in
                       jax.tree_util.tree_leaves(variables["params"]))
        assert 55e6 < n_params < 75e6

    def test_config_rejects_bad_size(self):
        with pytest.raises(ValueError):
            ModelConfig(img_size=(60, 64, 3), number_classes=1)


class TestRemat:
    def test_remat_same_outputs_and_grads(self, rng):
        import jax.numpy as jnp
        base = dict(img_size=(64, 64, 3), number_classes=2,
                    anchors=((16, 16),), block_count=1, filter_count=32,
                    compute_dtype="float32", stem_space_to_depth=False)
        std = YoloV3(ModelConfig(remat_blocks=False, **base))
        rm = YoloV3(ModelConfig(remat_blocks=True, **base))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = std.init(jax.random.PRNGKey(0), x, train=False)
        # identical variable trees
        a = {jax.tree_util.keystr(p): l.shape for p, l in
             jax.tree_util.tree_leaves_with_path(v)}
        v2 = rm.init(jax.random.PRNGKey(0), x, train=False)
        b = {jax.tree_util.keystr(p): l.shape for p, l in
             jax.tree_util.tree_leaves_with_path(v2)}
        assert a == b

        def loss(model, params):
            fms = model.apply({"params": params,
                               "batch_stats": v["batch_stats"]},
                              x, train=False)
            return sum(jnp.sum(jnp.square(fm)) for fm in fms)

        la, ga = jax.value_and_grad(lambda p: loss(std, p))(v["params"])
        lb, gb = jax.value_and_grad(lambda p: loss(rm, p))(v["params"])
        assert float(la) == pytest.approx(float(lb), rel=1e-5)
        for xa, xb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=1e-4, atol=1e-5)
