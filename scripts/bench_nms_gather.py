#!/usr/bin/env python
"""Candidate-box gather forms inside the NMS-only program (real TPU).

The serving attribution charges ~0.45 ms to the candidate box gather
(`ops/nms.py` — boxes[b][top_idx[b, c]] via nested vmap, the form pinned
in commit fb8a82a after the transposed take_along_axis variant lowered
to a 3.1 ms scalarized gather). The queued one-hot-matmul alternative is
closed by arithmetic: the output has 4 columns, so the MXU pays >=32x
lane padding (128/4) on [K,N]@[N,4] — ~90G padded MAC-slots at b64
(~0.46 ms at bf16 peak) plus ~0.4 ms of VPU one-hot formation, strictly
worse than the 0.45 ms it replaces. This script screens the remaining
XLA-level reformulations at the NMS operating point:

  control    — the shipped nested-vmap row gather
  flat       — ONE row gather over boxes.reshape(B*N, 4) with
               globalized indices (fewer gather dispatches)
  per_coord  — 4 lane gathers via take_along_axis on [B, N] coord
               planes with [B, C*K] indices

  python scripts/bench_nms_gather.py [--iters 50]
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

    from yolov3_tpu.ops.pallas.nms_kernel import suppress_boxes_pallas

    b, n, c = args.batch, args.boxes, args.classes
    k = 512
    iou_threshold, score_threshold = 0.3, 0.1
    rng = np.random.RandomState(0)

    xy = rng.uniform(0, 480, (b, n, 2)).astype(np.float32)
    wh = rng.uniform(33, 120, (b, n, 2)).astype(np.float32)
    np_boxes = np.concatenate([xy, xy + wh], -1)
    obj = rng.uniform(0.3, 1.0, (b, n)).astype(np.float32)  # dense case
    cls = rng.uniform(0.3, 1.0, (b, n, c)).astype(np.float32)
    dets = jnp.asarray(np.concatenate(
        [np_boxes, obj[..., None], cls], -1))

    def nms(detections, gather_form):
        boxes = detections[..., 0:4]
        objectness = detections[..., 4:5]
        class_probs = detections[..., 5:5 + c]
        scores_all = jnp.sqrt(jnp.transpose(class_probs, (0, 2, 1))
                              * objectness[..., 0][:, None, :])
        flat = scores_all.reshape(b * c, -1)
        masked = jnp.where(flat >= score_threshold, flat, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        top_scores = top_scores.reshape(b, c, k)
        top_idx = top_idx.reshape(b, c, k)

        if gather_form == "control":
            cand = jax.vmap(jax.vmap(
                lambda bx, i: bx[i], in_axes=(None, 0)))(boxes, top_idx)
        elif gather_form == "flat":
            gidx = (top_idx
                    + (jnp.arange(b, dtype=top_idx.dtype) * n)[:, None, None])
            cand = boxes.reshape(b * n, 4)[gidx.reshape(-1)].reshape(
                b, c, k, 4)
        elif gather_form == "per_coord":
            idx2 = top_idx.reshape(b, c * k)
            planes = [jnp.take_along_axis(boxes[..., j], idx2, axis=1)
                      for j in range(4)]
            cand = jnp.stack(planes, -1).reshape(b, c, k, 4)
        else:
            raise ValueError(gather_form)

        valid = top_scores >= score_threshold
        keep = suppress_boxes_pallas(
            cand.reshape(b * c, k, 4), valid.reshape(b * c, k),
            iou_threshold)
        return cand, top_scores, keep.reshape(b, c, k)

    ref = None
    for form in ("control", "flat", "per_coord"):
        fn = jax.jit(functools.partial(nms, gather_form=form))
        out = jax.device_get(fn(dets))
        if ref is None:
            ref, eq = out, "ref"
        else:
            eq = ("BIT-EQ" if all(np.array_equal(np.asarray(a), np.asarray(x))
                                  for a, x in zip(out, ref)) else "DIFFERS")
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = fn(dets)
            jax.device_get(o[2][0, 0, :2])
            dt = min(dt, (time.perf_counter() - t0) / args.iters)
        print(f"{form:>10s}  {dt * 1e3:7.3f} ms  [{eq}]", flush=True)


if __name__ == "__main__":
    main()
