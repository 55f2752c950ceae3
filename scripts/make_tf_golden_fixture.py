#!/usr/bin/env python
"""Generate TF-reference golden-output fixtures (pure numpy, no TF).

Fixed-seed keras-layout weights + feature maps computed with the
independent numpy transcription of the reference's inference walk in
`yolov3_tpu/utils/tf_golden.py` (reference/model.py:28-39, :93-105,
:356-421). Consumed by tests/test_tf_import.py: `utils/tf_import.py` +
`YoloV3(upsample_channel_sum=True)` must reproduce these numbers —
importer parity as "numbers match", not just "shapes match".

Two committed fixtures:

  tf_golden_bc1.npz   (default)  shrunk net (block_count=1,
      filter_count=64, 64px, batch 2); weights stored inline (~3 MB).
  tf_golden_full.npz  (--full)   the SHIPPING topology — block counts
      (1,2,8,8,4) via block_count=8, filter_count=1024, all 72 convs +
      2 upsamples + 3 heads — at 64px, batch 1. The ~250 MB of
      deterministic random weights are NOT stored; the fixture carries
      the seed + topology and the test regenerates them with
      `tf_golden.make_weights`.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov3_tpu.utils import tf_golden as G  # noqa: E402

ANCHORS = ((16.0, 16.0), (32.0, 32.0))
CLASSES = 2
SEED = 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="shipping topology (bc=8, fc=1024); seed-only "
                        "weights")
    args = p.parse_args(argv)

    if args.full:
        bc, fc, img, batch = 8, 1024, 64, 1
        name = "tf_golden_full.npz"
    else:
        bc, fc, img, batch = 1, 64, 64, 2
        name = "tf_golden_bc1.npz"

    t0 = time.time()
    w = G.make_weights(SEED, CLASSES, ANCHORS, block_count=bc,
                       filter_count=fc)
    n_vars = len(w)
    rng = np.random.RandomState(42)
    x = rng.randn(batch, img, img, 3).astype(np.float32)
    fm1, fm2, fm3 = G.forward(
        {k: v.astype(np.float64) for k, v in w.items()},
        x.astype(np.float64), block_count=bc)

    out = {} if args.full else dict(w)
    out["__input__"] = x
    out["__fm1__"] = fm1.astype(np.float32)
    out["__fm2__"] = fm2.astype(np.float32)
    out["__fm3__"] = fm3.astype(np.float32)
    out["__meta__"] = np.array([SEED, CLASSES, bc, fc], np.int64)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, "
          f"{n_vars} vars, {time.time() - t0:.1f}s)")
    print("fm shapes:", fm1.shape, fm2.shape, fm3.shape)
    print("fm1 mean/std:", fm1.mean(), fm1.std())


if __name__ == "__main__":
    main()
