"""Tile-geometry tests (reference/inference_tiled.py:29-100,236-301)."""

import numpy as np
import pytest

from yolov3_tpu.utils.tiling import (
    convert_image_to_tiles,
    ghost_zone_keep_mask,
    stitch_tile_detections,
)


class TestConvertImageToTiles:
    def test_image_smaller_than_tile(self, rng):
        img = rng.rand(100, 100, 3).astype(np.float32)
        tiles, xs, ys = convert_image_to_tiles(img, (128, 128))
        # radius collapses to 0; one tile padded up to 128
        assert len(tiles) == 1
        assert tiles[0].shape == (128, 128, 3)
        assert xs == [0] and ys == [0]
        # reflect padding reuses image content
        np.testing.assert_array_equal(tiles[0][:100, :100], img)

    def test_large_image_tile_grid(self, rng):
        img = rng.rand(1000, 700, 1).astype(np.float32)
        tiles, xs, ys = convert_image_to_tiles(img, (512, 512))
        # zone = 512 - 2*96 = 320; rows = ceil(1000/320) = 4; cols = ceil(700/320) = 3
        assert len(tiles) == 12
        assert all(t.shape == (512, 512, 1) for t in tiles)
        assert min(xs) == 0 and min(ys) == 0

    def test_divisibility_asserts(self, rng):
        img = rng.rand(600, 600, 1).astype(np.float32)
        with pytest.raises(AssertionError):
            convert_image_to_tiles(img, (500, 512))

    def test_interior_tile_content(self, rng):
        img = rng.rand(1000, 1000, 1).astype(np.float32)
        tiles, xs, ys = convert_image_to_tiles(img, (512, 512))
        # find a fully-interior tile and confirm exact crop
        for t, x, y in zip(tiles, xs, ys):
            if x > 0 and y > 0 and x + 512 <= 1000 and y + 512 <= 1000:
                np.testing.assert_array_equal(t, img[y:y + 512, x:x + 512])
                break
        else:
            pytest.fail("no interior tile found")


class TestGhostZoneCull:
    TILE = (512, 512)
    IMG = (1000, 1000, 1)

    def test_center_in_interior_kept(self):
        boxes = np.array([[200.0, 200.0, 240.0, 240.0]])
        keep = ghost_zone_keep_mask(boxes, 320, 320, self.TILE, self.IMG)
        assert keep[0]

    def test_center_in_ghost_margin_culled(self):
        # center at local x=50 < 96, tile at x=320 (interior) -> culled
        boxes = np.array([[30.0, 200.0, 70.0, 240.0]])
        keep = ghost_zone_keep_mask(boxes, 320, 320, self.TILE, self.IMG)
        assert not keep[0]

    def test_image_border_margin_kept(self):
        # same local position but the tile starts at the true image border
        boxes = np.array([[30.0, 200.0, 70.0, 240.0]])
        keep = ghost_zone_keep_mask(boxes, 0, 320, self.TILE, self.IMG)
        assert keep[0]

    def test_far_edge_margin(self):
        # center at local x = 470 >= 512-96 = 416, interior tile -> culled
        boxes = np.array([[450.0, 200.0, 490.0, 240.0]])
        keep = ghost_zone_keep_mask(boxes, 320, 320, self.TILE, self.IMG)
        assert not keep[0]
        # but kept when the tile's right edge is the image's right edge:
        # cx_global = 470 + 488 = 958 > 1000 - 96 = 904 -> not culled
        keep = ghost_zone_keep_mask(boxes, 488, 320, self.TILE, self.IMG)
        assert keep[0]

    def test_empty(self):
        keep = ghost_zone_keep_mask(np.zeros((0, 4)), 0, 0, self.TILE, self.IMG)
        assert keep.shape == (0,)


class TestStitch:
    def test_merges_and_clamps(self):
        boxes = [np.array([[10.2, 10.8, 50.4, 50.6]]),
                 np.array([[-5.0, 940.0, 20.0, 1020.0]])]  # center inside
        scores = [np.array([0.9]), np.array([0.8])]
        labels = [np.array([0]), np.array([1])]
        out = stitch_tile_detections(boxes, scores, labels, (1000, 1000))
        assert out.shape == (2, 6)
        # rounding
        np.testing.assert_array_equal(out[0, :4], [10, 11, 50, 51])
        # clamping into image bounds
        assert out[1, 0] == 0 and out[1, 3] == 999

    def test_center_outside_dropped(self):
        boxes = [np.array([[990.0, 990.0, 1100.0, 1100.0]])]  # center >= 1000
        out = stitch_tile_detections(boxes, [np.array([0.9])],
                                     [np.array([0])], (1000, 1000))
        assert out.shape == (0, 6)

    def test_empty(self):
        out = stitch_tile_detections([], [], [], (100, 100))
        assert out.shape == (0, 6)
