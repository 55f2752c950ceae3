"""Anchor-selection (k-means) tool tests."""

import os

import numpy as np
import pytest

from yolov3_tpu.find_anchors import collect_box_sizes, find_anchors
from yolov3_tpu.ops import boxes as bbox


@pytest.fixture
def csv_dir(tmp_path, rng):
    d = tmp_path / "csvs"
    d.mkdir()
    # two well-separated size clusters: ~20x20 and ~100x100
    for i in range(10):
        rows = []
        for _ in range(3):
            w, h = 20 + rng.randint(-2, 3), 20 + rng.randint(-2, 3)
            rows.append([5, 5, w, h, 0])
        for _ in range(3):
            w, h = 100 + rng.randint(-5, 6), 100 + rng.randint(-5, 6)
            rows.append([5, 5, w, h, 1])
        bbox.write_boxes_from_xywhc(np.array(rows), str(d / f"im{i}.csv"))
    return str(d)


class TestCollect:
    def test_collect_sizes(self, csv_dir):
        sizes = collect_box_sizes(csv_dir)
        assert sizes.shape == (60, 2)

    def test_empty_dir(self, tmp_path):
        assert collect_box_sizes(str(tmp_path)).shape == (0, 2)


class TestFindAnchors:
    def test_clusters_recovered(self, csv_dir, tmp_path):
        plot = str(tmp_path / "plot.png")
        results = find_anchors(csv_dir, k_range=(2, 3), plot_path=plot)
        assert set(results) == {2, 3}
        _, centers = results[2]
        centers = centers[np.argsort(centers[:, 0])]
        assert abs(centers[0][0] - 20) < 5 and abs(centers[0][1] - 20) < 5
        assert abs(centers[1][0] - 100) < 8 and abs(centers[1][1] - 100) < 8
        assert os.path.exists(plot)

    def test_too_few_boxes(self, tmp_path):
        d = tmp_path / "csvs"
        d.mkdir()
        bbox.write_boxes_from_xywhc(np.array([[0, 0, 5, 5, 0]]),
                                    str(d / "a.csv"))
        with pytest.raises(ValueError):
            find_anchors(str(d), plot_path=None)
