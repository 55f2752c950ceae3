"""Augmentation chain tests (reference/augment.py semantics)."""

import numpy as np
import pytest

from yolov3_tpu.data import augment


class TestAffineBoxes:
    def test_identity(self):
        boxes = np.array([[10, 20, 30, 40, 1]])
        out = augment.apply_affine_transformation_boxes(
            boxes, (128, 128), False, False, 1.0, 1.0, 0, 0)
        np.testing.assert_array_equal(out, boxes)

    def test_scale(self):
        boxes = np.array([[10, 20, 30, 40, 1]])
        out = augment.apply_affine_transformation_boxes(
            boxes, (256, 256), False, False, 2.0, 2.0, 0, 0)
        # x_end = (10+30-1)*2 = 78 -> w = 78-20+1 = 59
        np.testing.assert_array_equal(out, [[20, 40, 59, 79, 1]])

    def test_crop_shift(self):
        boxes = np.array([[50, 60, 20, 20, 0]])
        out = augment.apply_affine_transformation_boxes(
            boxes, (128, 128), False, False, 1.0, 1.0, 30, 40)
        np.testing.assert_array_equal(out, [[20, 20, 20, 20, 0]])

    def test_reflect_x(self):
        # reference reflect: x_st' = W - x_end (note: W, not W-1)
        boxes = np.array([[10, 20, 30, 40, 1]])
        out = augment.apply_affine_transformation_boxes(
            boxes, (128, 128), True, False, 1.0, 1.0, 0, 0)
        # x_end = 39; x_st' = 128-39 = 89, x_end' = 128-10 = 118, w = 30
        np.testing.assert_array_equal(out, [[89, 20, 30, 40, 1]])

    def test_cull_off_image(self):
        boxes = np.array([[200, 200, 30, 30, 0]])
        out = augment.apply_affine_transformation_boxes(
            boxes, (128, 128), False, False, 1.0, 1.0, 0, 0)
        assert out is None

    def test_cull_thin_sliver(self):
        # box with < 12 px remaining extent inside the crop is culled
        boxes = np.array([[120, 50, 30, 30, 0]])  # x_st=120 >= 128-12=116
        out = augment.apply_affine_transformation_boxes(
            boxes, (128, 128), False, False, 1.0, 1.0, 0, 0)
        assert out is None

    def test_clamp_to_crop(self):
        boxes = np.array([[-5, -5, 40, 40, 0]])
        out = augment.apply_affine_transformation_boxes(
            boxes, (128, 128), False, False, 1.0, 1.0, 0, 0)
        # x_end = -5+40-1 = 34 clamps to 34, x_st clamps to 0 -> w = 35
        np.testing.assert_array_equal(out, [[0, 0, 35, 35, 0]])


class TestAffineImage:
    def test_crop_only(self, rng):
        img = rng.rand(100, 100, 3).astype(np.float32)
        out, dx, dy = augment.apply_affine_transformation(
            img, False, False, 1.0, 1.0, (64, 64), rng=np.random.RandomState(0))
        assert out.shape == (64, 64, 3)
        np.testing.assert_array_equal(out, img[dy:dy + 64, dx:dx + 64])

    def test_flips(self, rng):
        img = rng.rand(64, 64, 1).astype(np.float32)
        out, _, _ = augment.apply_affine_transformation(
            img, True, True, 1.0, 1.0, (64, 64))
        np.testing.assert_array_equal(out, np.flipud(np.fliplr(img)))

    def test_rescale_output_size(self, rng):
        img = rng.rand(100, 100, 3).astype(np.float32)
        out, _, _ = augment.apply_affine_transformation(
            img, False, False, 1.5, 1.5, (64, 64), rng=np.random.RandomState(0))
        assert out.shape == (64, 64, 3)


class TestFullChain:
    def test_shapes_and_types(self, rng):
        img = rng.rand(100, 120, 3).astype(np.float32) * 255
        boxes = np.array([[20, 20, 40, 40, 0], [60, 50, 30, 30, 1]])
        out_img, out_boxes = augment.augment_image_box_pair(
            img, boxes, reflection_flag=True, crop_to=(96, 96),
            noise_augmentation_severity=0.03, scale_augmentation_severity=0.1,
            blur_augmentation_max_sigma=2, box_size_augmentation_severity=0.03,
            box_location_jitter_severity=0.03, rng=np.random.RandomState(7))
        assert out_img.shape == (96, 96, 3)
        assert out_img.dtype == np.float32
        if out_boxes is not None:
            assert out_boxes.dtype == np.int32
            assert np.all(out_boxes[:, 2] > 0) and np.all(out_boxes[:, 3] > 0)
            assert np.all(out_boxes[:, 0] >= 0) and np.all(out_boxes[:, 1] >= 0)

    def test_no_augmentation_severities(self, rng):
        img = rng.rand(96, 96, 1).astype(np.float32)
        boxes = np.array([[20, 20, 40, 40, 0]])
        out_img, out_boxes = augment.augment_image_box_pair(
            img, boxes, crop_to=(96, 96), rng=np.random.RandomState(0))
        np.testing.assert_array_equal(out_img, img)
        np.testing.assert_array_equal(out_boxes, boxes)

    def test_rotation_asserts(self, rng):
        with pytest.raises(AssertionError):
            augment.augment_image_box_pair(
                np.zeros((32, 32, 1)), np.zeros((0, 5)), rotation_flag=True,
                crop_to=(32, 32))

    def test_crop_to_size(self, rng):
        img = rng.rand(100, 100, 3).astype(np.float32)
        boxes = np.array([[20, 20, 40, 40, 0]])
        out_img, out_boxes = augment.crop_to_size(img, boxes, (64, 64),
                                                  rng=np.random.RandomState(1))
        assert out_img.shape == (64, 64, 3)


class TestAugmentBoxes:
    def test_zero_severity_identity(self):
        boxes = np.array([[10, 10, 20, 20, 1]])
        out = augment.augment_boxes(boxes, 0.0, 0.0, (64, 64),
                                    rng=np.random.RandomState(0))
        np.testing.assert_array_equal(out, boxes)

    def test_clamped_inside_image(self):
        boxes = np.array([[0, 0, 64, 64, 0]])
        out = augment.augment_boxes(boxes, 0.2, 0.2, (64, 64),
                                    rng=np.random.RandomState(3))
        assert out[0, 0] >= 0 and out[0, 1] >= 0
        assert out[0, 0] + out[0, 2] <= 64
        assert out[0, 1] + out[0, 3] <= 64
