"""Non-square image coverage: grids, encoder, model, decode.

The reference's per-scale stride collapses to the scalar downsample factor
even for non-square inputs (SURVEY.md §2 decode notes); these tests pin the
rectangular behavior end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.data.encoder import encode_boxes
from yolov3_tpu.models.yolo import YoloV3, YoloV3Detector
from yolov3_tpu.ops.loss import compute_loss

ANCHORS = ((16, 16), (32, 32))
IMG = (64, 128, 3)  # H != W


def cfg(**kw):
    return ModelConfig(img_size=IMG, number_classes=2, anchors=ANCHORS,
                       block_count=1, filter_count=32,
                       compute_dtype="float32", **kw)


class TestNonSquare:
    def test_encoder_grids(self):
        labels = encode_boxes(np.array([[100, 30, 20, 20, 1]]), IMG, ANCHORS, 2)
        assert labels[0].shape[:2] == (2, 4)
        assert labels[2].shape[:2] == (8, 16)
        # x=center col from width axis: floor(109/128*4) = 3; row floor(39/64*2)=1
        ii, jj, _ = np.nonzero(labels[0][..., 4])
        assert (ii[0], jj[0]) == (1, 3)

    @pytest.mark.parametrize("s2d", [False, True])
    def test_model_shapes(self, rng, s2d):
        model = YoloV3(cfg(stem_space_to_depth=s2d))
        x = jnp.asarray(rng.randn(1, *IMG).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        fms = model.apply(v, x, train=False)
        a, c = len(ANCHORS), 2
        assert fms[0].shape == (1, 2, 4, a * (5 + c))
        assert fms[1].shape == (1, 4, 8, a * (5 + c))
        assert fms[2].shape == (1, 8, 16, a * (5 + c))

    def test_s2d_matches_standard_nonsquare(self, rng):
        std = YoloV3(cfg(stem_space_to_depth=False))
        s2d = YoloV3(cfg(stem_space_to_depth=True))
        x = jnp.asarray(rng.randn(1, *IMG).astype(np.float32))
        v = std.init(jax.random.PRNGKey(0), x, train=False)
        a = std.apply(v, x, train=False)
        b = s2d.apply(v, x, train=False)
        for fa, fb in zip(a, b):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=5e-3, atol=5e-3)

    def test_detector_and_loss(self, rng):
        c = cfg()
        det = YoloV3Detector(c)
        x = jnp.asarray(rng.randn(1, *IMG).astype(np.float32))
        v = det.init(jax.random.PRNGKey(0), x, train=False)
        out = det.apply(v, x, train=False)
        assert out.shape == (1, c.number_output_boxes, 7)

        model = YoloV3(c)
        vm = model.init(jax.random.PRNGKey(0), x, train=False)
        fms = model.apply(vm, x, train=False)
        labels = encode_boxes(np.array([[100, 30, 20, 20, 1]]), IMG, ANCHORS, 2)
        loss = compute_loss(fms, [l[None] for l in labels], ANCHORS, 2)
        assert np.isfinite(float(loss.total))
