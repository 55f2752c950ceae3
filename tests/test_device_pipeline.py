"""Device (jit) preprocessing pipeline tests.

Geometry (box affine, culls, label encoding, z-score) is exactly testable
against the host implementations; image warps are bilinear and only
statistically equivalent to the host's scipy/cv2 kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import AugmentConfig
from yolov3_tpu.data import augment as host_aug
from yolov3_tpu.data.device_pipeline import (
    MAX_BOXES,
    _affine_boxes,
    _gaussian_blur,
    _warp_image,
    encode_labels_device,
    pad_boxes,
    preprocess_batch,
    zscore_image,
)
from yolov3_tpu.data.encoder import encode_boxes
from yolov3_tpu.data.imaging import zscore_normalize

ANCHORS = ((16, 16), (32, 32))


class TestZscore:
    def test_matches_host(self, rng):
        img = rng.rand(16, 16, 3).astype(np.float32) * 100
        np.testing.assert_allclose(np.asarray(zscore_image(img)),
                                   zscore_normalize(img), rtol=1e-5, atol=1e-5)

    def test_low_std_guard(self):
        img = np.full((8, 8, 1), 5.0, np.float32)
        out = np.asarray(zscore_image(img))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_batched_matches_vmap(self, rng):
        """zscore_images is the batched-reduction lowering of
        vmap(zscore_image) and accepts raw integer pixels (converts on
        device). Bit-identical on TPU (scripts/bench_zscore.py measured
        max|d|=0); the CPU backend reduces in a different order, so the
        test allows float32-ulp slack."""
        from yolov3_tpu.data.device_pipeline import zscore_images
        u8 = rng.randint(0, 255, (4, 16, 16, 3)).astype(np.uint8)
        want = np.asarray(jax.vmap(zscore_image)(u8.astype(np.float32)))
        got = np.asarray(zscore_images(jnp.asarray(u8)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
        # f32 input too (train pipeline call site)
        f32 = rng.rand(4, 16, 16, 3).astype(np.float32) * 200
        np.testing.assert_allclose(
            np.asarray(zscore_images(jnp.asarray(f32))),
            np.asarray(jax.vmap(zscore_image)(jnp.asarray(f32))),
            rtol=0, atol=1e-6)


class TestAffineBoxes:
    @pytest.mark.parametrize("reflect_x,reflect_y", [(False, False),
                                                     (True, False),
                                                     (True, True)])
    def test_matches_host_affine(self, reflect_x, reflect_y):
        boxes = np.array([[10, 20, 30, 40, 1], [100, 90, 20, 20, 0]],
                         dtype=np.int32)
        crop = (128, 128)
        host = host_aug.apply_affine_transformation_boxes(
            boxes, crop, reflect_x, reflect_y, 1.0, 1.0, 0, 0)
        dev, valid = _affine_boxes(boxes.astype(np.float32),
                                   np.ones(2, bool), crop,
                                   jnp.float32(1.0), jnp.float32(1.0),
                                   jnp.float32(0.0), jnp.float32(0.0),
                                   jnp.asarray(reflect_x),
                                   jnp.asarray(reflect_y))
        dev = np.asarray(dev)[np.asarray(valid)]
        np.testing.assert_array_equal(dev.astype(np.int32), host)

    def test_scale_and_crop_match_host(self):
        boxes = np.array([[10, 20, 30, 40, 1]], dtype=np.int32)
        crop = (256, 256)
        host = host_aug.apply_affine_transformation_boxes(
            boxes, crop, False, False, 1.5, 1.25, 7, 3)
        dev, valid = _affine_boxes(boxes.astype(np.float32),
                                   np.ones(1, bool), crop,
                                   jnp.float32(1.5), jnp.float32(1.25),
                                   jnp.float32(7.0), jnp.float32(3.0),
                                   jnp.asarray(False), jnp.asarray(False))
        np.testing.assert_array_equal(
            np.asarray(dev)[np.asarray(valid)].astype(np.int32), host)

    def test_cull_matches_host(self):
        boxes = np.array([[120, 50, 30, 30, 0]], dtype=np.int32)  # thin sliver
        host = host_aug.apply_affine_transformation_boxes(
            boxes, (128, 128), False, False, 1.0, 1.0, 0, 0)
        assert host is None
        _, valid = _affine_boxes(boxes.astype(np.float32), np.ones(1, bool),
                                 (128, 128), jnp.float32(1.0),
                                 jnp.float32(1.0), jnp.float32(0.0),
                                 jnp.float32(0.0), jnp.asarray(False),
                                 jnp.asarray(False))
        assert not bool(np.asarray(valid)[0])


class TestWarp:
    def test_identity(self, rng):
        img = rng.rand(32, 32, 3).astype(np.float32)
        out = np.asarray(_warp_image(img, jnp.float32(1.0), jnp.float32(1.0),
                                     jnp.float32(0.0), jnp.float32(0.0),
                                     jnp.asarray(False), jnp.asarray(False)))
        np.testing.assert_allclose(out, img, rtol=1e-6)

    def test_flips(self, rng):
        img = rng.rand(16, 16, 1).astype(np.float32)
        out = np.asarray(_warp_image(img, jnp.float32(1.0), jnp.float32(1.0),
                                     jnp.float32(0.0), jnp.float32(0.0),
                                     jnp.asarray(True), jnp.asarray(True)))
        np.testing.assert_allclose(out, np.flipud(np.fliplr(img)), rtol=1e-6)

    def test_crop_offset(self, rng):
        img = rng.rand(16, 16, 1).astype(np.float32)
        out = np.asarray(_warp_image(img, jnp.float32(1.0), jnp.float32(1.0),
                                     jnp.float32(3.0), jnp.float32(2.0),
                                     jnp.asarray(False), jnp.asarray(False)))
        # shifted sample, edge-clamped; interior matches the crop exactly
        np.testing.assert_allclose(out[:13, :14], img[3:, 2:], rtol=1e-6)


class TestBlur:
    def test_zero_sigma_identity(self, rng):
        img = rng.rand(16, 16, 3).astype(np.float32)
        out = np.asarray(_gaussian_blur(img, jnp.float32(-1.0), 2.0))
        np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)

    def test_blur_statistics(self, rng):
        img = rng.rand(32, 32, 1).astype(np.float32)
        out = np.asarray(_gaussian_blur(img, jnp.float32(2.0), 2.0))
        assert out.std() < img.std()  # smoothing reduces variance
        assert abs(out.mean() - img.mean()) < 0.02  # kernel normalized


class TestEncodeLabels:
    def test_matches_host_encoder(self, rng):
        boxes = np.array([[4, 8, 24, 28, 0], [30, 28, 30, 30, 1]],
                         dtype=np.float32)
        img_size = (64, 64, 1)
        host = encode_boxes(boxes, img_size, ANCHORS, 2)
        padded, valid = pad_boxes(boxes)
        dev = encode_labels_device(jnp.asarray(padded), jnp.asarray(valid),
                                   img_size, ANCHORS, 2)
        for h, d in zip(host, dev):
            np.testing.assert_allclose(h, np.asarray(d), atol=1e-5)

    def test_empty(self):
        padded, valid = pad_boxes(np.zeros((0, 5)))
        dev = encode_labels_device(jnp.asarray(padded), jnp.asarray(valid),
                                   (64, 64, 1), ANCHORS, 2)
        for d in dev:
            assert float(jnp.sum(d)) == 0.0

    def test_class_bits_accumulate(self):
        boxes = np.array([[0, 0, 30, 30, 0], [2, 2, 30, 30, 1]],
                         dtype=np.float32)
        padded, valid = pad_boxes(boxes)
        dev = encode_labels_device(jnp.asarray(padded), jnp.asarray(valid),
                                   (64, 64, 1), ANCHORS, 2)
        host = encode_boxes(boxes, (64, 64, 1), ANCHORS, 2)
        np.testing.assert_allclose(host[0], np.asarray(dev[0]), atol=1e-5)

    def test_later_box_overwrites_coordinates(self):
        """Two valid boxes landing in the same (cell, anchor) slot: the
        LATER box's coordinate row must win (the matmul encoder's priority
        argmax must reproduce the sequential write order), while obj stays
        set and both class bits accumulate."""
        boxes = np.array([[0, 0, 30, 30, 0], [2, 2, 30, 30, 1]],
                         dtype=np.float32)
        padded, valid = pad_boxes(boxes)
        dev = encode_labels_device(jnp.asarray(padded), jnp.asarray(valid),
                                   (64, 64, 1), ANCHORS, 2)
        host = encode_boxes(boxes, (64, 64, 1), ANCHORS, 2)
        for h, d in zip(host, dev):
            np.testing.assert_allclose(h, np.asarray(d), atol=1e-5)
        # sanity: the shared slot's coords really are the second box's
        g = np.asarray(dev[2])  # stride-8 grid: both centers in cell (2,2)?
        cy2 = np.floor(2 + (30 - 1) / 2.0)
        i2 = int(cy2 // 8)
        slot = g[i2, i2]
        hit = slot[slot[..., 4] > 0]
        assert hit.shape[0] >= 1
        np.testing.assert_allclose(hit[0, 0], cy2)  # later box's center


class TestPreprocessBatch:
    def test_shapes_and_finiteness(self, rng):
        b, hw = 2, 64
        images = rng.rand(b, hw, hw, 3).astype(np.float32) * 255
        raw = np.array([[8, 8, 24, 24, 0]], dtype=np.float32)
        padded, valid = pad_boxes(raw)
        boxes = np.stack([padded] * b)
        valids = np.stack([valid] * b)
        out = preprocess_batch(images, boxes, valids, jax.random.PRNGKey(0),
                               AugmentConfig(), (hw, hw, 3), ANCHORS, 2,
                               use_augmentation=True)
        imgs, l32, l16, l8 = out
        assert imgs.shape == (b, hw, hw, 3)
        assert l32.shape == (b, 2, 2, len(ANCHORS), 7)
        assert l8.shape == (b, 8, 8, len(ANCHORS), 7)
        assert np.isfinite(np.asarray(imgs)).all()
        # at least one of the images should still contain its (jittered) box
        assert float(jnp.sum(l32[..., 4])) + float(jnp.sum(l8[..., 4])) > 0

    def test_no_augmentation_deterministic(self, rng):
        b, hw = 2, 64
        images = rng.rand(b, hw, hw, 1).astype(np.float32) * 255
        padded, valid = pad_boxes(np.array([[8, 8, 24, 24, 0]], np.float32))
        boxes = np.stack([padded] * b)
        valids = np.stack([valid] * b)
        out1 = preprocess_batch(images, boxes, valids, jax.random.PRNGKey(0),
                                AugmentConfig(), (hw, hw, 1), ANCHORS, 2,
                                use_augmentation=False)
        out2 = preprocess_batch(images, boxes, valids, jax.random.PRNGKey(9),
                                AugmentConfig(), (hw, hw, 1), ANCHORS, 2,
                                use_augmentation=False)
        np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
        # matches the host no-augment path: zscore + encode
        host_img = zscore_normalize(images[0])
        np.testing.assert_allclose(np.asarray(out1[0][0]), host_img,
                                   rtol=1e-4, atol=1e-5)
        host_labels = encode_boxes(np.array([[8, 8, 24, 24, 0]]),
                                   (hw, hw, 1), ANCHORS, 2)
        np.testing.assert_allclose(np.asarray(out1[1][0]), host_labels[0],
                                   atol=1e-5)

    def test_pad_boxes_overflow(self):
        many = np.tile(np.array([[1, 1, 5, 5, 0]], np.float32),
                       (MAX_BOXES + 10, 1))
        padded, valid = pad_boxes(many)
        assert padded.shape == (MAX_BOXES, 5)
        assert valid.sum() == MAX_BOXES
