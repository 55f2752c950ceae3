#!/usr/bin/env python
"""Device zscore preprocess A/B: today's vmap(zscore_image) over an f32
cast measures 1.38 ms at b64 512^2 u8 against a ~0.45 ms fused floor
(bench_input_layout.py, round-4). Variants:

  two_pass   — today's form (mean, then std, then normalize)
  sum_sumsq  — one reduction pass producing sum and sum-of-squares
               (var = E[x^2] - mean^2; fine on pixel data, numerically
               weaker on already-centered f32 — NOT a zscore_image
               replacement, an inference-path candidate)
  welford2   — mean pass, then a FUSED (x-m)^2-reduce + normalize pass?
               (not expressible as one pass: normalize needs std; kept
               as the two-pass form with the sub shared)

  python scripts/bench_zscore.py [--batch 64]
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
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.data.device_pipeline import zscore_image

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (args.batch, args.img, args.img,
                                           3)).astype(np.uint8))

    @jax.jit
    def two_pass(images):
        return jax.vmap(zscore_image)(images.astype(jnp.float32))

    @jax.jit
    def sum_sumsq(images):
        x = images.astype(jnp.float32)
        n = float(np.prod(images.shape[1:]))
        s = jnp.sum(x, axis=(1, 2, 3), keepdims=True)
        s2 = jnp.sum(x * x, axis=(1, 2, 3), keepdims=True)
        mean = s / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        std = jnp.sqrt(var)
        return jnp.where(std <= 1.0, x - mean, (x - mean) / std)

    @jax.jit
    def two_pass_flat(images):
        # same math as zscore_image but batched reductions (no vmap)
        x = images.astype(jnp.float32)
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=(1, 2, 3),
                                keepdims=True))
        return jnp.where(std <= 1.0, x - mean, (x - mean) / std)

    ref = jax.device_get(two_pass(raw))
    for name, fn in (("two_pass (today)", two_pass),
                     ("two_pass_flat", two_pass_flat),
                     ("sum_sumsq", sum_sumsq)):
        out = jax.device_get(fn(raw))
        err = float(np.abs(out - ref).max())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(raw)
            jax.device_get(o[0, 0, 0, :1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{name:18s} {best * 1e3:7.3f} ms   max|d|={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
