#!/usr/bin/env python
"""Row-layout vs transposed ("planes") suppression kernel, NMS program
level, real TPU.

The suppression loop is VPU-issue-bound: the row-layout kernel spends
~5 one-hot lane-select+reduce `pick`s per sequential step extracting box
i's scalars (~160 vector ops each at [128,512]); the transposed kernel
([K sublanes, C lanes] planes) replaces them with dynamic sublane slices
and turns the suppression reduction into a sublane tree. This measures
the whole `batched_nms_device`-shaped program (top-k + flat gather +
kernel) with each kernel at dense and 1% score sparsity, plus unroll
factors for the transposed kernel.

  python scripts/bench_nms_kernel_t.py [--iters 50]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--boxes", type=int, default=10752)
    p.add_argument("--classes", type=int, default=2)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.ops.pallas.nms_kernel import (suppress_boxes_pallas,
                                                  suppress_boxes_pallas_t)

    b, n, c = args.batch, args.boxes, args.classes
    k = 512
    rng = np.random.RandomState(0)

    def make_dets(frac_above):
        xy = rng.uniform(0, 480, (b, n, 2)).astype(np.float32)
        wh = rng.uniform(33, 120, (b, n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], -1)
        hot = rng.rand(b, n) < frac_above
        obj = np.where(hot, rng.uniform(0.3, 1.0, (b, n)),
                       rng.uniform(0.0, 0.005, (b, n)))
        cls = rng.uniform(0.3, 1.0, (b, n, c))
        return jnp.asarray(np.concatenate(
            [boxes, obj[..., None].astype(np.float32),
             cls.astype(np.float32)], -1))

    def nms(detections, kernel, unroll):
        boxes = detections[..., 0:4]
        objectness = detections[..., 4:5]
        class_probs = detections[..., 5:5 + c]
        scores_all = jnp.sqrt(jnp.transpose(class_probs, (0, 2, 1))
                              * objectness[..., 0][:, None, :])
        flat = scores_all.reshape(b * c, -1)
        masked = jnp.where(flat >= 0.1, flat, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        top_scores = top_scores.reshape(b, c, k)
        top_idx = top_idx.reshape(b, c, k)
        gidx = (top_idx
                + (jnp.arange(b, dtype=top_idx.dtype) * n)[:, None, None])
        cand = boxes.reshape(b * n, 4)[gidx.reshape(-1)].reshape(b, c, k, 4)
        valid = top_scores >= 0.1
        keep = kernel(cand.reshape(b * c, k, 4), valid.reshape(b * c, k),
                      0.3, unroll=unroll)
        return cand, top_scores, keep.reshape(b, c, k)

    cases = [("rows_u4", suppress_boxes_pallas, 4),
             ("planes_u1", suppress_boxes_pallas_t, 1),
             ("planes_u2", suppress_boxes_pallas_t, 2),
             ("planes_u4", suppress_boxes_pallas_t, 4),
             ("planes_u8", suppress_boxes_pallas_t, 8)]

    for label, frac in (("dense", 1.0), ("1pct", 0.01)):
        dets = make_dets(frac)
        ref = None
        for name, kernel, unroll in cases:
            fn = jax.jit(functools.partial(nms, kernel=kernel,
                                           unroll=unroll))
            out = jax.device_get(fn(dets))
            if ref is None:
                ref, eq = out, "ref"
            else:
                eq = ("BIT-EQ" if np.array_equal(np.asarray(out[2]),
                                                 np.asarray(ref[2]))
                      else "DIFFERS")
            dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                o = None
                for _ in range(args.iters):
                    o = fn(dets)
                jax.device_get(o[2][0, 0, :2])
                dt = min(dt, (time.perf_counter() - t0) / args.iters)
            print(f"{label:>6s} {name:>10s}  {dt * 1e3:7.3f} ms  [{eq}]",
                  flush=True)


if __name__ == "__main__":
    main()
