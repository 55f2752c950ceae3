#!/usr/bin/env python
"""Dispatch-amortization A/B: the champion int8 serving step measures
~0.9 ms/step of e2e-minus-device overhead (program dispatch through the
axon tunnel; real local chips pay a smaller but nonzero launch cost).
A jitted lax.map over K sub-batches runs K forwards in ONE program —
same per-image math, 1/K the dispatches — at the cost of K x the
result latency (throughput serving only).

  python scripts/bench_multistep.py [--batch 64] [--k 4] [--iters 20]
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--k", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.config import ModelConfig
    from yolov3_tpu.models import quantized as Q
    from yolov3_tpu.models.yolo import YoloV3
    from yolov3_tpu.ops.decode import decode_detections

    cfg = ModelConfig(img_size=(args.img, args.img, 3), number_classes=2,
                      anchors=((64, 384), (384, 64)),
                      compute_dtype="bfloat16")
    model = YoloV3(cfg)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, args.img, args.img, 3), jnp.float32),
        train=False))(jax.random.PRNGKey(0))
    params, bs = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.img, args.img, 3)
                    .astype(np.float32))
    scales = Q.calibrate(params, bs, cfg, x[:8])

    kw = dict(act_scales=scales, quant_skip=("Darknet53_0/ConvBlock_0",),
              region_full=True, region_fast=True, rep_requant=True)

    def f(images):
        fms = Q.forward_feature_maps(params, bs, cfg, images, **kw)
        return decode_detections(fms, cfg.anchors, cfg.number_classes,
                                 cfg.strides)

    one = jax.jit(f)
    multi = jax.jit(lambda xs: jax.lax.map(f, xs))
    xs = jnp.stack([x] * args.k)

    jax.device_get(one(x)[0, 0, :2])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = one(x)
    jax.device_get(out[0, 0, :2])
    dt1 = (time.perf_counter() - t0) / args.iters
    print(f"single dispatch      {dt1 * 1e3:8.2f} ms/batch  "
          f"{args.batch / dt1:7.0f} img/s", flush=True)

    jax.device_get(multi(xs)[0, 0, 0, :2])
    t0 = time.perf_counter()
    for _ in range(max(1, args.iters // args.k)):
        out = multi(xs)
    jax.device_get(out[0, 0, 0, :2])
    dtk = (time.perf_counter() - t0) / max(1, args.iters // args.k) / args.k
    print(f"lax.map k={args.k}          {dtk * 1e3:8.2f} ms/batch  "
          f"{args.batch / dtk:7.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
