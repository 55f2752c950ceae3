#!/usr/bin/env python
"""Measure the 512px train step fed by the REAL data pipeline.

Three modes over the same database (VERDICT round-2 task 8: prove the
reader + preprocess actually sustain the step rate, not just the
synthetic-batch number):

- synthetic: one pre-staged batch reused every step (upper bound; the
  bench_train_ab operating point)
- host:      DatasetReader workers decode+augment+encode on the host,
             DevicePrefetcher overlaps device_put (train.py default)
- device:    raw-mode workers only decode; augmentation + z-score +
             label encoding run jitted on-chip (train.py
             --device_augment 1), dispatch overlapped by DevicePrefetcher
- device_shm: like device, but workers assemble whole uint8 batches in a
             shared-memory ring (ShmBatchReader) — no per-image pickling
             through mp.Queue

  python scripts/make_toy_dataset.py --output /tmp/feed512 \
      --num_images 128 --image_size 512
  python -m yolov3_tpu.data.builder --image_folder /tmp/feed512/images \
      --csv_folder /tmp/feed512/csvs --output_folder /tmp/feed512/db \
      --dataset_name toy --image_format png
  python scripts/bench_train_feed.py --db /tmp/feed512/db/train-toy.ydb

Timing per CLAUDE.md gotcha: device_get of one updated-param buffer
produced at the end of the timed window.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(mode, args, jax, jnp, np):
    from yolov3_tpu.config import AugmentConfig, ModelConfig, TrainConfig
    from yolov3_tpu.data.reader import DatasetReader, ShmBatchReader
    from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                     make_train_step, replicate_to_mesh,
                                     shard_batch)
    from yolov3_tpu.utils.prefetch import DevicePrefetcher

    anchors = ((64, 384), (384, 64))
    mesh = make_mesh(n_devices=1)
    tb = args.batch
    tcfg = TrainConfig(batch_size=tb)

    if mode == "device_shm":
        reader = ShmBatchReader(args.db, anchors, batch_size=args.batch,
                                use_augmentation=True,
                                num_workers=args.workers)
    else:
        reader = DatasetReader(args.db, anchors, use_augmentation=True,
                               num_workers=args.workers,
                               raw_mode=(mode == "device"))
    img_size = reader.get_image_size()
    ncls = reader.get_number_classes()
    cfg = ModelConfig(img_size=tuple(img_size), number_classes=ncls,
                      anchors=anchors, compute_dtype="bfloat16")
    from yolov3_tpu.models.yolo import YoloV3
    model = YoloV3(cfg)
    state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                               (1, *img_size))
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, cfg, tcfg, mesh, tb)
    lr = jnp.float32(1e-4)

    try:
        if mode == "synthetic":
            from yolov3_tpu.data.encoder import encode_boxes
            rng = np.random.RandomState(0)
            labels = encode_boxes(
                np.array([[64, 64, 128, 128, 0]], np.float32),
                cfg.img_size, anchors, ncls)
            batch = shard_batch(
                (rng.randn(tb, *img_size).astype(np.float32),
                 np.stack([labels[0]] * tb), np.stack([labels[1]] * tb),
                 np.stack([labels[2]] * tb)), mesh)
            batches = iter(lambda: batch, None)
        else:
            reader.startup()
            raw = reader.batches(tb)
            if mode in ("device", "device_shm"):
                from yolov3_tpu.data.device_pipeline import preprocess_batch
                base_key = jax.random.PRNGKey(1)
                acfg = AugmentConfig()
                counter = [0]

                def feed():
                    for r in raw:
                        images, boxes, valid = shard_batch(r, mesh)
                        counter[0] += 1
                        key = jax.random.fold_in(base_key, counter[0])
                        out = preprocess_batch(
                            images, boxes, valid, key, acfg,
                            tuple(img_size), anchors, ncls,
                            use_augmentation=True)
                        if mode == "device_shm":
                            # ring slots recycle on the next next(raw);
                            # settle so device_put has consumed the pixels
                            out = jax.block_until_ready(out)
                        yield out

                batches = DevicePrefetcher(feed(), lambda b: b)
            else:
                batches = DevicePrefetcher(raw, lambda b: shard_batch(b, mesh))

        print(f"[{mode}] compiling...", flush=True)
        state, _ = step(state, next(batches), lr)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0][..., :1])
        for _ in range(3):  # let the prefetch queue reach steady state
            state, _ = step(state, next(batches), lr)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0][..., :1])

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, _ = step(state, next(batches), lr)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0][..., :1])
        dt = (time.perf_counter() - t0) / args.steps
        print(f"[{mode}] {dt * 1e3:.2f} ms/step  {tb / dt:.1f} img/s",
              flush=True)
    finally:
        if mode != "synthetic":
            reader.shutdown()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--db", type=str, required=True)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--modes", type=str,
                        default="synthetic,host,device,device_shm")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for mode in args.modes.split(","):
        run_mode(mode, args, jax, jnp, np)


if __name__ == "__main__":
    main()
