"""int8-forward training (straight-through estimator).

The QAT path must (a) keep the variable tree identical to the standard
path, (b) produce a forward close to the bf16 forward up to quantization
noise, (c) give EXACT straight-through gradients (the backward is the
plain conv VJP at the saved operands), and (d) run end-to-end through the
multi-device train step with finite, decreasing loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig, TrainConfig
from yolov3_tpu.models.yolo import (YoloV3, int8_ste_conv,
                                    int8_ste_conv_static)
from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                 make_train_step, replicate_to_mesh,
                                 shard_batch)


def make_models(**kw):
    base = dict(img_size=(64, 64, 3), number_classes=2,
                anchors=((16, 16), (32, 32)), block_count=1,
                filter_count=64, compute_dtype="float32")
    base.update(kw)
    plain = YoloV3(ModelConfig(int8_train=False, **base))
    qat = YoloV3(ModelConfig(int8_train=True, **base))
    return plain, qat


class TestSteConv:
    def test_forward_matches_quantized_math(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32))
        y = int8_ste_conv(x, w, (1, 1), "SAME", jnp.float32, None)
        # oracle: quantize by absmax, integer conv, dequantize
        sx = np.abs(np.asarray(x)).max() / 127.0
        sw = np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0
        qx = np.clip(np.round(np.asarray(x) / sx), -127, 127)
        qw = np.clip(np.round(np.asarray(w) / sw), -127, 127)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(qx), jnp.asarray(qw), (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
        ref = np.asarray(ref) * (sx * sw)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    def test_straight_through_gradients_exact(self, rng):
        """With an output-sum loss the cotangent is ones, so STE grads must
        EQUAL the plain conv's grads (backward ignores quantization)."""
        x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def loss_q(x, w):
            return jnp.sum(int8_ste_conv(x, w, (1, 1), "SAME",
                                         jnp.float32, None))

        def loss_p(x, w):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn))

        gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_p),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_p),
                                   rtol=1e-6, atol=1e-6)


class TestQatModel:
    def test_same_variable_tree(self):
        plain, qat = make_models()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v_p = plain.init(jax.random.PRNGKey(0), x, train=True)
        v_q = qat.init(jax.random.PRNGKey(0), x, train=True)
        paths = lambda t: {jax.tree_util.keystr(p): l.shape for p, l in
                           jax.tree_util.tree_leaves_with_path(t)}
        assert paths(v_p) == paths(v_q)

    def test_train_forward_close_to_bf16(self, rng):
        plain, qat = make_models()
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        v = plain.init(jax.random.PRNGKey(1), x, train=False)
        out_p, _ = plain.apply(v, x, train=True, mutable=["batch_stats"])
        out_q, _ = qat.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(out_p, out_q):
            a, b = np.asarray(a), np.asarray(b)
            # quantization noise accumulates through the deep net, and the
            # toy channel counts (filter_count=64 -> stems of width 2) make
            # the per-layer noise floor much worse than at flagship width;
            # demand correlation + bounded error, not allclose. The real
            # quality gate is TestQatTrainStep + the slow overfit gate.
            # ~1.3% per-layer quantization noise accumulating near-linearly
            # over ~25 layers (measured; standard for QAT forwards — the
            # training loop adapts the weights to it). This test guards
            # against gross numeric bugs (wrong scales, wrong channel
            # tiling), not noise: those produce rel_rms >~ 1 / corr ~ 0.
            rel_rms = (np.linalg.norm((a - b).ravel())
                       / np.linalg.norm(a.ravel()))
            assert rel_rms < 0.5, rel_rms
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.85, corr

    def test_eval_path_unaffected(self, rng):
        plain, qat = make_models()
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = plain.init(jax.random.PRNGKey(1), x, train=False)
        out_p = plain.apply(v, x, train=False)
        out_q = qat.apply(v, x, train=False)
        for a, b in zip(out_p, out_q):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStaticQat:
    """Static-scale QAT (ModelConfig.int8_train_static): frozen calibration
    scales in a `quant_scales` collection replace the per-batch absmax."""

    def test_static_conv_matches_dynamic_at_true_scale(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32))
        sx = jnp.float32(np.abs(np.asarray(x)).max() / 127.0)
        y_dyn = int8_ste_conv(x, w, (1, 1), "SAME", jnp.float32, None)
        y_st = int8_ste_conv_static(x, w, sx, (1, 1), "SAME",
                                    jnp.float32, None)
        np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_st))

        def loss(x, w, s):
            return jnp.sum(int8_ste_conv_static(x, w, s, (1, 1), "SAME",
                                                jnp.float32, None))

        gx, gw, gs = jax.grad(loss, argnums=(0, 1, 2))(x, w, sx)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        gx_p, gw_p = jax.grad(lambda a, b: jnp.sum(
            jax.lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                         dimension_numbers=dn)),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_p),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_p),
                                   rtol=1e-6, atol=1e-6)
        assert float(gs) == 0.0  # scale is frozen, no gradient flows

    def test_static_saturates_out_of_range(self, rng):
        """A too-small frozen scale clips at +-127 (standard static QAT)."""
        x = jnp.full((1, 4, 4, 8), 10.0, jnp.float32)
        w = jnp.asarray(np.eye(8, dtype=np.float32).reshape(1, 1, 8, 8))
        y = int8_ste_conv_static(x, w, jnp.float32(0.01), (1, 1), "SAME",
                                 jnp.float32, None)
        np.testing.assert_allclose(np.asarray(y), 127 * 0.01, rtol=1e-5)

    @pytest.mark.parametrize("s2d", [False, True])
    def test_collection_matches_calibration_keys(self, rng, s2d):
        """Every declared act_scale maps onto a `calibrate` key — the
        naming contract between the train model and the PTQ mirror (stem1
        declares none in s2d mode, mirroring the serving skip)."""
        from yolov3_tpu.models import quantized as Q
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=((16, 16), (32, 32)), block_count=1,
                          filter_count=64, compute_dtype="float32",
                          int8_train=True, int8_train_static=True,
                          stem_space_to_depth=s2d)
        model = YoloV3(cfg)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        assert "quant_scales" in v
        scales = Q.calibrate(v["params"], v["batch_stats"], cfg, x)
        qs = Q.scales_to_collection(scales, v["quant_scales"])
        leaves = jax.tree_util.tree_leaves(qs)
        assert len(leaves) > 10
        assert all(float(l) > 0 for l in leaves)
        if s2d:
            assert "ConvBlock_0" not in v["quant_scales"]["Darknet53_0"]

    def test_static_train_step_runs_and_decreases(self, rng):
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=((16, 16), (32, 32)), block_count=1,
                          filter_count=64, compute_dtype="float32",
                          int8_train=True, int8_train_static=True)
        tcfg = TrainConfig(batch_size=4, learning_rate=1e-3)
        from yolov3_tpu.models import quantized as Q
        model = YoloV3(cfg)
        mesh = make_mesh(n_devices=2)
        state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3))
        assert state.quant_scales is not None
        imgs = rng.randn(4, 64, 64, 3).astype(np.float32)
        scales = Q.calibrate(state.params, state.batch_stats, cfg,
                             jnp.asarray(imgs))
        state = state.replace(quant_scales=Q.scales_to_collection(
            scales, state.quant_scales))
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(model, cfg, tcfg, mesh, 4)
        from yolov3_tpu.data.encoder import encode_boxes
        labels = encode_boxes(np.array([[16, 16, 32, 32, 0]], np.float32),
                              cfg.img_size, cfg.anchors, cfg.number_classes)
        batch = shard_batch(
            (imgs, np.stack([labels[0]] * 4), np.stack([labels[1]] * 4),
             np.stack([labels[2]] * 4)), mesh)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch, jnp.float32(1e-3))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestQatTrainStep:
    def test_loss_decreases(self, rng):
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=((16, 16), (32, 32)), block_count=1,
                          filter_count=64, compute_dtype="float32",
                          int8_train=True)
        tcfg = TrainConfig(batch_size=4, learning_rate=1e-3)
        model = YoloV3(cfg)
        mesh = make_mesh(n_devices=2)
        state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3))
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(model, cfg, tcfg, mesh, 4)
        from yolov3_tpu.data.encoder import encode_boxes
        labels = encode_boxes(np.array([[16, 16, 32, 32, 0]], np.float32),
                              cfg.img_size, cfg.anchors, cfg.number_classes)
        batch = shard_batch(
            (rng.randn(4, 64, 64, 3).astype(np.float32),
             np.stack([labels[0]] * 4), np.stack([labels[1]] * 4),
             np.stack([labels[2]] * 4)), mesh)
        lr = jnp.float32(1e-3)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch, lr)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
