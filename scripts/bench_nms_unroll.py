#!/usr/bin/env python
"""A/B the suppression kernel's sequential-loop unroll factor on the real
TPU at the serving shape ([B*C=128, K=512], all candidates valid — the
saturated worst case the serving bench charges).

  python scripts/bench_nms_unroll.py [--rows 128] [--k 512] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=128)  # batch 64 x 2 classes
    p.add_argument("--k", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.ops.pallas.nms_kernel import suppress_boxes_pallas

    rng = np.random.RandomState(0)
    rows, k = args.rows, args.k
    xy = rng.uniform(0, 480, (rows, k, 2)).astype(np.float32)
    wh = rng.uniform(33, 120, (rows, k, 2)).astype(np.float32)
    cand = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    valid = jnp.ones((rows, k), jnp.float32)

    ref = None
    for unroll in (1, 2, 4, 8):
        fn = jax.jit(lambda c, v, u=unroll: suppress_boxes_pallas(
            c, v, 0.3, unroll=u))
        out = jax.device_get(fn(cand, valid))
        if ref is None:
            ref = out
        else:
            assert (out == ref).all(), f"unroll={unroll} diverges"
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(cand, valid)
            jax.device_get(o[0, :1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"unroll={unroll}  {best * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
