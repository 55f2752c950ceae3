#!/usr/bin/env python
"""Measure the serving input boundary: the champion int8 forward pays
0.27 ms converting the f32 image batch to bf16 PLUS a 0.39 ms relayout
copy to the stem conv's preferred {0,3,2,1} layout (round-4 profile,
DESIGN.md). Feeding bf16 killed only the convert (27.75 -> 27.67) — the
copy survives because the jit entry keeps the default layout.

This script pins the image argument's device layout to {0,3,2,1}
(major-to-minor (1,2,3,0) = H,W,C,B) with jax.experimental.layout and
A/Bs:

  fwd_f32      — today's contract (f32 image, default layout)
  fwd_b16      — bf16 image, default layout
  fwd_b16_pin  — bf16 image, layout pinned at the jit boundary
  zscore pair  — the producing preprocess jit emitting f32-default vs
                 bf16-pinned (the pinned layout must be ~free to WRITE,
                 or the copy just moves upstream)

  python scripts/bench_input_layout.py [--batch 64] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--img", type=int, default=512)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.layout import Format, Layout

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.config import ModelConfig
    from yolov3_tpu.models import quantized as Q
    from yolov3_tpu.models.yolo import YoloV3
    from yolov3_tpu.ops.decode import decode_detections
    from yolov3_tpu.data.device_pipeline import zscore_image

    cfg = ModelConfig(img_size=(args.img, args.img, 3), number_classes=2,
                      anchors=((64, 384), (384, 64)),
                      compute_dtype="bfloat16")
    model = YoloV3(cfg)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, args.img, args.img, 3), jnp.float32),
        train=False))(jax.random.PRNGKey(0))
    params, bs = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(args.batch, args.img, args.img, 3)
                      .astype(np.float32))
    scales = Q.calibrate(params, bs, cfg, x32[:8])

    kw = dict(act_scales=scales, quant_skip=("Darknet53_0/ConvBlock_0",),
              region_full=True, region_fast=True, rep_requant=True)

    def f(images):
        fms = Q.forward_feature_maps(params, bs, cfg, images, **kw)
        return decode_detections(fms, cfg.anchors, cfg.number_classes,
                                 cfg.strides)

    # {0,3,2,1} minor-to-major == (1,2,3,0) major-to-minor: H, W, C, B
    from jax.sharding import SingleDeviceSharding
    pin = Format(Layout((1, 2, 3, 0)),
                 SingleDeviceSharding(jax.devices()[0]))
    fwd_f32 = jax.jit(f)
    fwd_b16 = jax.jit(f)
    fwd_pin = jax.jit(f, in_shardings=pin)

    xb16 = x32.astype(jnp.bfloat16)
    xpin = jax.device_put(xb16, pin)

    # numerics: pinned layout must be bit-identical
    a = jax.device_get(fwd_b16(xb16))
    b = jax.device_get(fwd_pin(xpin))
    assert (a == b).all(), float(np.abs(a - b).max())
    print("pinned == default-layout output: bit-identical", flush=True)

    def bench(name, fn, inp):
        jax.device_get(fn(inp)[0, 0, :2])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(inp)
            jax.device_get(out[0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{name:22s} {best * 1e3:8.2f} ms  "
              f"{args.batch / best:7.0f} img/s", flush=True)
        return best

    bench("fwd_f32 (today)", fwd_f32, x32)
    bench("fwd_b16", fwd_b16, xb16)
    bench("fwd_b16_pin", fwd_pin, xpin)

    # the producer side: per-image zscore from raw u8 pixels, emitting
    # (a) f32 default layout — today's boundary; (b) bf16 pinned layout.
    # If (b) ~= (a), the relayout is genuinely free at the producer and
    # the serving pipeline can hand the forward its pinned layout.
    raw = jnp.asarray(rng.randint(0, 255, (args.batch, args.img, args.img,
                                           3)).astype(np.uint8))

    def zs(images):
        return jax.vmap(zscore_image)(images.astype(jnp.float32))

    zs_f32 = jax.jit(zs)
    zs_pin = jax.jit(lambda im: zs(im).astype(jnp.bfloat16),
                     out_shardings=pin)
    bench("zscore_f32 (today)", zs_f32, raw)
    bench("zscore_b16_pin", zs_pin, raw)


if __name__ == "__main__":
    main()
