#!/usr/bin/env python
"""A/B: raw-pixels serving variants at the b64 champion operating point.

The champion profile charges ~0.66 ms to the serving input boundary
(f32->bf16 convert 0.268 emitting {2,1,3,0} + a 0.391 relayout copy to
the stem conv's {0,3,2,1}); pinning the jit-entry layout was a net
negative (DESIGN.md round-4). In the raw-pixels program the producer is
the INTERNAL zscore fusion, not a jit input, so XLA has layout freedom —
and emitting bf16 straight out of the zscore (the model casts images to
bf16 for the stem anyway: f32-zscore-then-round is IDENTICAL either
way) removes the separate convert op entirely.

  f32_in          — control: serve(pre-zscored f32 images)
  u8_zscore_f32   — serve(zscore_images(u8))  [bench.py raw metric]
  u8_zscore_bf16  — serve(zscore_images(u8).astype(bf16))
  bf16_in         — serve(host-cast bf16 images) [b16in + NMS]

  python scripts/bench_raw_serving.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.config import ModelConfig
    from yolov3_tpu.data.device_pipeline import zscore_images
    from yolov3_tpu.models import quantized as Q
    from yolov3_tpu.models.yolo import YoloV3
    from yolov3_tpu.ops.decode import decode_detections
    from yolov3_tpu.ops.nms import batched_nms_device

    cfg = ModelConfig(img_size=(512, 512, 3), number_classes=2,
                      anchors=((64, 384), (384, 64)),
                      compute_dtype="bfloat16")
    model = YoloV3(cfg)
    variables = jax.jit(lambda key: model.init(
        key, jnp.zeros((1, 512, 512, 3), jnp.float32), train=False))(
            jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randn(8, 512, 512, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x8)

    def detect_int8(images):
        fms = Q.forward_feature_maps(params, batch_stats, cfg, images,
                                     act_scales=scales, exit_pallas=True,
                                     region_full=True, region_fast=True,
                                     rep_requant=True)
        return decode_detections(fms, cfg.anchors, cfg.number_classes,
                                 cfg.strides)

    def serve(images):
        det = detect_int8(images)
        clipped = jnp.concatenate([
            jnp.clip(det[..., 0:1], 0, 512),
            jnp.clip(det[..., 1:2], 0, 512),
            jnp.clip(det[..., 2:3], 0, 512),
            jnp.clip(det[..., 3:4], 0, 512),
            det[..., 4:],
        ], axis=-1)
        return batched_nms_device(clipped, cfg.number_classes,
                                  iou_threshold=0.3, score_threshold=0.1,
                                  max_boxes=512, min_box_size=32.0)

    u8 = jnp.asarray(rng.randint(0, 255, (64, 512, 512, 3)).astype(np.uint8))
    xf = zscore_images(u8)  # same images pre-zscored on device, f32
    jax.device_get(xf[0, 0, 0, :1])
    xb = xf.astype(jnp.bfloat16)
    jax.device_get(xb[0, 0, 0, :1].astype(jnp.float32))

    variants = {
        "f32_in": (jax.jit(serve), xf),
        "u8_zscore_f32": (jax.jit(lambda r: serve(zscore_images(r))), u8),
        "u8_zscore_bf16": (jax.jit(
            lambda r: serve(zscore_images(r).astype(jnp.bfloat16))), u8),
        "bf16_in": (jax.jit(serve), xb),
    }

    ref = None
    for name, (fn, x) in variants.items():
        out = jax.device_get(fn(x))
        if ref is None:
            ref = out
            eq = "ref"
        else:
            same = all(np.array_equal(np.asarray(a), np.asarray(b))
                       for a, b in zip(out, ref))
            mx = max(float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max())
                     for a, b in zip(out, ref))
            eq = "BIT-EQ" if same else f"max|d|={mx:.2e}"
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = fn(x)
            jax.device_get(o[0][0, 0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{name:16s} {best * 1e3:7.3f} ms  {64 / best:7.1f} img/s  "
              f"[{eq}]", flush=True)


if __name__ == "__main__":
    main()
