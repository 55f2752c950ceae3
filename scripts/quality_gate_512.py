#!/usr/bin/env python
"""Overfit-mAP quality gate at the SHIPPING shape (512px, full
block_count) on the real TPU (VERDICT r4 task 8).

The CPU quality gate (tests/test_quality_e2e.py) runs at 64px with a
1-block model for host tractability; this job runs the same closed loop
— train on planted rectangles, export, run the REAL inference CLI (bf16
AND the int8 champion path), score mAP@0.5 — at the exact operating
point bench.py advertises. Record the result in DESIGN.md/PARITY.md.

  python scripts/quality_gate_512.py [--steps 600] [--out /tmp/qg512]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--images", type=int, default=8)
    # the 64px toy gate overfits at 5e-3, but the full-depth 512px model
    # in bf16 diverges there (measured: loss 1090 -> NaN by step 50 at
    # 5e-3; an lr/10 step-warmup into a 1e-3 peak also NaNs within 50
    # steps of the jump while the loss is still ~740). A LINEAR ramp
    # from lr/10 to a cooler peak over [warmup, 2*warmup] converges.
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=300)
    # constant-lr training at the 3e-4 peak is unstable late (measured:
    # loss 0.28 at step 4150 -> spike 20.6 -> NaN at 4250); decay the lr
    # once the initial descent is done, like any real training schedule
    p.add_argument("--decay_start", type=int, default=2500)
    p.add_argument("--decay_end", type=int, default=6000)
    p.add_argument("--out", default="/tmp/qg512")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.config import ModelConfig, TrainConfig
    from yolov3_tpu.data.encoder import encode_boxes
    from yolov3_tpu.data.imaging import imwrite, zscore_normalize
    from yolov3_tpu.inference import inference
    from yolov3_tpu.models.yolo import YoloV3
    from yolov3_tpu.ops import boxes as bbox
    from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                     make_train_step, replicate_to_mesh,
                                     shard_batch)
    from yolov3_tpu.utils import checkpoint as ckpt
    from yolov3_tpu.utils.evaluation import evaluate_folders

    SIZE, BOX, N = 512, 96, args.images
    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    img_dir = os.path.join(args.out, "images")
    gt_dir = os.path.join(args.out, "gt")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)

    rng = np.random.RandomState(42)
    images, gts = [], []
    for i in range(N):
        img = (rng.rand(SIZE, SIZE, 3) * 40).astype(np.float32)
        x = rng.randint(0, SIZE - BOX)
        y = rng.randint(0, SIZE - BOX)
        img[y:y + BOX, x:x + BOX] += 180 + rng.rand() * 40
        img = np.clip(img, 0, 255).astype(np.uint8)
        rows = np.array([[x, y, BOX, BOX, 0]], np.int32)
        imwrite(img, os.path.join(img_dir, f"im{i}.png"))
        bbox.write_boxes_from_xywhc(rows, os.path.join(gt_dir, f"im{i}.csv"))
        images.append(img)
        gts.append(rows)

    # full-depth model at the shipping shape; bf16 compute like the bench
    cfg = ModelConfig(img_size=(SIZE, SIZE, 3), number_classes=1,
                      anchors=((96, 96), (48, 48)),
                      compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=N)
    model = YoloV3(cfg)
    mesh = make_mesh(n_devices=1)
    state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 3))
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, cfg, tcfg, mesh, N)

    batch_imgs = np.stack([zscore_normalize(im.astype(np.float32))
                           for im in images]).astype(np.float32)
    labels = [encode_boxes(g.astype(np.float32), cfg.img_size, cfg.anchors,
                           cfg.number_classes) for g in gts]
    tbatch = shard_batch(
        (batch_imgs,
         np.stack([lab[0] for lab in labels]),
         np.stack([lab[1] for lab in labels]),
         np.stack([lab[2] for lab in labels])), mesh)

    t0 = time.time()
    metrics = None
    for i in range(args.steps):
        if i < args.warmup:
            frac = 0.1
        elif i < 2 * args.warmup:
            frac = 0.1 + 0.9 * (i - args.warmup) / args.warmup
        elif i < args.decay_start:
            frac = 1.0
        elif i < args.decay_end:
            t = (i - args.decay_start) / (args.decay_end - args.decay_start)
            frac = 1.0 - 0.95 * t
        else:
            frac = 0.05
        lr = jnp.float32(args.lr * frac)
        state, metrics = step(state, tbatch, lr)
        if i % 50 == 0:
            loss = float(metrics["loss"])
            print(f"step {i:5d} loss {loss:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if not np.isfinite(loss):
                raise SystemExit(f"non-finite loss at step {i}")
    final_loss = float(metrics["loss"])
    print(f"final loss {final_loss:.4f} after {args.steps} steps "
          f"({time.time() - t0:.0f}s)", flush=True)

    path = ckpt.export_model(os.path.join(args.out, "model"),
                             jax.device_get(state.params),
                             jax.device_get(state.batch_stats), cfg)

    results = {"steps": args.steps, "final_loss": final_loss}
    for tag, int8 in (("bf16", False), ("int8", True)):
        pred = os.path.join(args.out, f"pred_{tag}")
        # scored CSV layout: AP must rank low-score spurious boxes below
        # the high-score true positives (the unscored reference layout
        # makes AP row-order-dependent — measured: a model with accurate
        # boxes plus one low-score corner ghost per image scores the
        # SAME 0.6264 mAP at loss 0.68 and at loss 0.15)
        inference(img_dir, "png", path, pred, min_box_size=32,
                  batch_size=N, use_int8=int8, save_scores=True)
        r = evaluate_folders(pred, gt_dir, iou_threshold=0.5)
        results[f"mAP_{tag}"] = r["mAP"]
        print(f"{tag}: mAP@0.5 = {r['mAP']:.4f} "
              f"(per-class {r['per_class_ap']})", flush=True)

    print(json.dumps(results), flush=True)
    ok = results["mAP_bf16"] >= 0.9 and results["mAP_int8"] >= 0.9
    print("GATE " + ("PASSED" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
