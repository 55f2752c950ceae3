#!/usr/bin/env python
"""Generate a synthetic detection dataset for smoke tests and demos.

Draws bright rectangles of two classes on noisy backgrounds and writes
(images + X,Y,W,H,C annotation CSVs) ready for `yolov3_tpu.data.builder`.
The reference README references bundled example data its repo doesn't ship;
this provides an actual runnable example.

  python scripts/make_toy_dataset.py --output data_toy --num_images 64 \
      --image_size 256 && \
  python -m yolov3_tpu.data.builder --image_folder data_toy/images \
      --csv_folder data_toy/csvs --output_folder data_toy/db \
      --dataset_name toy --image_format png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov3_tpu.data.imaging import imwrite  # noqa: E402
from yolov3_tpu.ops import boxes as bbox  # noqa: E402


def make_image(rng, size, max_boxes=4):
    img = (rng.rand(size, size, 3) * 40).astype(np.float32)
    rows = []
    box_max = max(size // 3, 26)
    for _ in range(rng.randint(1, max_boxes + 1)):
        w = rng.randint(24, box_max)
        h = rng.randint(24, box_max)
        x = rng.randint(0, size - w)
        y = rng.randint(0, size - h)
        cls = rng.randint(0, 2)
        if cls == 0:  # bright solid block
            img[y:y + h, x:x + w] += 150 + rng.rand() * 60
        else:  # bright hollow frame
            t = max(3, min(w, h) // 8)
            img[y:y + t, x:x + w] += 180
            img[y + h - t:y + h, x:x + w] += 180
            img[y:y + h, x:x + t] += 180
            img[y:y + h, x + w - t:x + w] += 180
        rows.append([x, y, w, h, cls])
    img = np.clip(img + rng.randn(size, size, 3) * 8, 0, 255).astype(np.uint8)
    return img, np.asarray(rows, dtype=np.int32)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--num_images", type=int, default=64)
    parser.add_argument("--image_size", type=int, default=256,
                        help="square image side, multiple of 32")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    img_dir = os.path.join(args.output, "images")
    csv_dir = os.path.join(args.output, "csvs")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(csv_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(args.num_images):
        img, rows = make_image(rng, args.image_size)
        imwrite(img, os.path.join(img_dir, f"img{i:04d}.png"))
        bbox.write_boxes_from_xywhc(rows, os.path.join(csv_dir,
                                                       f"img{i:04d}.csv"))
    print(f"wrote {args.num_images} images to {args.output}")


if __name__ == "__main__":
    main()
