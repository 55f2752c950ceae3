"""Anchor-selection tool: k-means over ground-truth box sizes.

Equivalent of reference/find_anchor_sizes.py:19-66: gather (w, h) of every
annotated box, run k-means for k = 2..7, print silhouette-style inertia
scores and the cluster centers, and save a scatterplot. A human picks the
anchor set and passes it to training via `--anchors` (the reference
hardcodes the choice in source, reference/train.py:33).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

import numpy as np

from yolov3_tpu.ops import boxes as bbox


def collect_box_sizes(csv_dirpath: str) -> np.ndarray:
    """Stack [N, 2] (w, h) from every annotation CSV in a folder."""
    sizes: List[np.ndarray] = []
    for fn in sorted(os.listdir(csv_dirpath)):
        if not fn.endswith(".csv"):
            continue
        rows = bbox.load_boxes_to_xywhc(os.path.join(csv_dirpath, fn))
        if rows.shape[0]:
            sizes.append(rows[:, 2:4])
    if not sizes:
        return np.zeros((0, 2))
    return np.concatenate(sizes, axis=0)


def find_anchors(csv_dirpath: str, k_range: Tuple[int, int] = (2, 7),
                 plot_path: str = "scatterplot_k_clusters.png",
                 ) -> dict:
    """Run k-means for each k; returns {k: (score, centers [k,2])}."""
    from sklearn.cluster import KMeans

    sizes = collect_box_sizes(csv_dirpath)
    print(f"Collected {sizes.shape[0]} boxes")
    if sizes.shape[0] < k_range[1]:
        raise ValueError("Not enough boxes for clustering")

    results = {}
    for k in range(k_range[0], k_range[1] + 1):
        km = KMeans(n_clusters=k, n_init=10, random_state=0).fit(sizes)
        score = km.score(sizes)
        centers = km.cluster_centers_
        results[k] = (score, centers)
        print(f"k={k} score={score}")
        print("  cluster centers (w, h):")
        for c in centers:
            print(f"    ({c[0]:.1f}, {c[1]:.1f})")

    if plot_path:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 3, figsize=(15, 9))
        for ax, k in zip(axes.flat, results):
            _, centers = results[k]
            km_labels = KMeans(n_clusters=k, n_init=10,
                               random_state=0).fit_predict(sizes)
            ax.scatter(sizes[:, 0], sizes[:, 1], c=km_labels, s=4, alpha=0.4)
            ax.scatter(centers[:, 0], centers[:, 1], marker="x", c="red")
            ax.set_title(f"k={k}")
            ax.set_xlabel("box width (px)")
            ax.set_ylabel("box height (px)")
        fig.tight_layout()
        fig.savefig(plot_path)
        print(f"Saved {plot_path}")
    return results


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="find_anchors",
        description="Cluster ground-truth box sizes to pick YOLO anchors")
    parser.add_argument("--csv_dirpath", type=str, required=True,
                        help="folder of annotation csv files")
    parser.add_argument("--plot_path", type=str,
                        default="scatterplot_k_clusters.png")
    args = parser.parse_args(argv)
    find_anchors(args.csv_dirpath, plot_path=args.plot_path)


if __name__ == "__main__":
    main()
