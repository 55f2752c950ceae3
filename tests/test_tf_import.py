"""TF-weight importer tests.

`reference_keras_shapes` transcribes the reference's Keras construction walk
(reference/model.py:356-421) independently of models/yolo.py; importing a
fixture built from it must land every variable on a Flax param of exactly
matching shape — a cross-check between two separate descriptions of the
network. Channel widths differ at nearly every creation index, so an
off-by-one in the conv2d_N numbering map fails loudly on shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.utils import tf_import as T


def make_fixture(number_classes=2, num_anchors=2, block_count=2,
                 filter_count=256, seed=0):
    shapes = T.reference_keras_shapes(number_classes, num_anchors,
                                      block_count=block_count,
                                      filter_count=filter_count)
    rng = np.random.RandomState(seed)
    out = {}
    for k, shp in shapes.items():
        v = (rng.randn(*shp) * 0.05).astype(np.float32)
        if k.endswith("moving_variance"):
            v = np.abs(v) + 0.5  # variances are positive
        out[k] = v
    return out, shapes


class TestReferenceShapes:
    def test_counts_full_size(self):
        shapes = T.reference_keras_shapes(2, 2)
        convs = {k for k in shapes if k.startswith("conv2d")
                 and "transpose" not in k and k.endswith("kernel")}
        bns = {k for k in shapes if k.startswith("batch_normalization")
               and k.endswith("gamma")}
        heads = {k for k in shapes if k.startswith("feature_map")
                 and k.endswith("kernel")}
        ups = {k for k in shapes if "transpose" in k and k.endswith("kernel")}
        # darknet53: 52 convs; 3 yolo blocks x 6; 2 FPN 1x1 (reference
        # model.py:356-421); each conv_layer pairs with one BN
        assert len(convs) == 52 + 18 + 2 == len(bns)
        assert len(heads) == 3 and len(ups) == 2


class TestImport:
    @pytest.mark.parametrize("block_count", [1, 2])
    def test_imported_tree_matches_flax_init(self, block_count):
        weights, _ = make_fixture(block_count=block_count, filter_count=128)
        params, stats = T.import_keras_weights(weights,
                                               block_count=block_count)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=((16, 16), (64, 64)),
                          block_count=block_count, filter_count=128,
                          compute_dtype="float32",
                          upsample_channel_sum=True)
        model = YoloV3(cfg)
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

        def shape_map(tree):
            return {jax.tree_util.keystr(p): tuple(l.shape) for p, l in
                    jax.tree_util.tree_leaves_with_path(tree)}

        assert shape_map(params) == shape_map(ref["params"])
        assert shape_map(stats) == shape_map(ref["batch_stats"])

    def test_imported_model_applies(self, rng):
        weights, _ = make_fixture(block_count=1, filter_count=64)
        params, stats = T.import_keras_weights(weights, block_count=1)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=((16, 16), (64, 64)), block_count=1,
                          filter_count=64, compute_dtype="float32",
                          upsample_channel_sum=True)
        fms = YoloV3(cfg).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
            train=False)
        for fm in fms:
            assert np.isfinite(np.asarray(fm)).all()

    @pytest.mark.parametrize("s2d", [False, True])
    def test_golden_output_parity(self, s2d):
        """Numbers-match gate for the importer: the committed fixture
        (scripts/make_tf_golden_fixture.py) carries keras-layout weights
        plus feature maps computed by an INDEPENDENT numpy transcription
        of the reference's inference walk (reference/model.py:28-39,
        :93-105, :356-421). The imported model must reproduce them — this
        validates kernel layout, BN variable mapping, conv/leaky/BN order,
        FPN concat order, and channel-sum upsample numerically, not just
        by shape."""
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "tf_golden_bc1.npz")
        z = np.load(path)
        weights = {k: z[k] for k in z.files if not k.startswith("__")}
        params, stats = T.import_keras_weights(weights, block_count=1)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                          anchors=((16, 16), (32, 32)), block_count=1,
                          filter_count=64, compute_dtype="float32",
                          upsample_channel_sum=True,
                          stem_space_to_depth=s2d)
        fms = YoloV3(cfg).apply({"params": params, "batch_stats": stats},
                                jnp.asarray(z["__input__"]), train=False)
        for fm, key in zip(fms, ("__fm1__", "__fm2__", "__fm3__")):
            np.testing.assert_allclose(np.asarray(fm), z[key],
                                       rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("s2d", [False, True])
    def test_golden_output_parity_full(self, s2d):
        """Full-architecture numbers-match gate: the fixture covers the
        SHIPPING topology — block counts (1,2,8,8,4), filter_count=1024,
        all 72 convs + 2 channel-sum upsamples + 3 heads of
        reference/model.py:382-421 — not the bc=1 shrink. Weights are
        regenerated deterministically from the stored seed
        (utils/tf_golden.py::make_weights); the outputs were computed by
        the independent float64 numpy transcription."""
        import os

        from yolov3_tpu.utils import tf_golden as G
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "tf_golden_full.npz")
        z = np.load(path)
        seed, ncls, bc, fc = (int(v) for v in z["__meta__"])
        anchors = ((16, 16), (32, 32))
        weights = G.make_weights(seed, ncls, anchors, block_count=bc,
                                 filter_count=fc)
        params, stats = T.import_keras_weights(weights, block_count=bc)
        cfg = ModelConfig(img_size=(64, 64, 3), number_classes=ncls,
                          anchors=anchors, block_count=bc, filter_count=fc,
                          compute_dtype="float32",
                          upsample_channel_sum=True,
                          stem_space_to_depth=s2d)
        fms = YoloV3(cfg).apply({"params": params, "batch_stats": stats},
                                jnp.asarray(z["__input__"]), train=False)
        for fm, key in zip(fms, ("__fm1__", "__fm2__", "__fm3__")):
            # 72 f32 convs vs the f64 oracle accumulate more rounding than
            # the bc=1 gate; tolerances scaled accordingly
            np.testing.assert_allclose(np.asarray(fm), z[key],
                                       rtol=1e-2, atol=1e-2)

    def test_colon_zero_suffix_stripped(self):
        weights, _ = make_fixture(block_count=1, filter_count=64)
        with_suffix = {f"{k}:0": v for k, v in weights.items()}
        a, _ = T.import_keras_weights(weights, block_count=1)
        b, _ = T.import_keras_weights(with_suffix, block_count=1)
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert all(np.array_equal(x, y) for x, y in zip(la, lb))

    def test_npz_roundtrip(self, tmp_path):
        weights, _ = make_fixture(block_count=1, filter_count=64)
        path = str(tmp_path / "w.npz")
        np.savez(path, **weights)
        params, stats = T.load_npz(path, block_count=1)
        direct, _ = T.import_keras_weights(weights, block_count=1)
        for x, y in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(direct)):
            np.testing.assert_array_equal(x, y)
