#!/usr/bin/env python
"""A/B the 512px train step: S2D base-kernel-space weight-grads vs autodiff.

Times `make_train_step` (fwd+bwd+psum+adam, batch 16 by default) with
`s2d_base_grads` on and off. Timing per CLAUDE.md gotcha: device_get of one
updated-param buffer produced at the end of the step program; best of two
passes.

  python scripts/bench_train_ab.py [--batch 16] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--img", type=int, default=512)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--only", type=str, default="",
                        help="comma-separated variant labels to run")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.config import ModelConfig, TrainConfig
    from yolov3_tpu.data.encoder import encode_boxes
    from yolov3_tpu.models.yolo import YoloV3
    from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                     make_train_step, replicate_to_mesh,
                                     shard_batch)

    rng = np.random.RandomState(0)
    tb = args.batch
    tcfg = TrainConfig(batch_size=tb)
    mesh = make_mesh(n_devices=1)

    variants = (("bf16", {}),
                ("packed_loss", {"_tcfg": {"packed_loss": True}}),
                ("stem1_im2row", {"stem1_im2row_grads": True}),
                ("int8_ste", {"int8_train": True}),
                ("int8_static", {"int8_train": True,
                                 "int8_train_static": True}),
                ("base_grads", {"s2d_base_grads": True}),
                ("bg_stem1", {"s2d_base_grads": ("stem1_direct",)}),
                ("bg_stem2", {"s2d_base_grads": ("stride2_stay",)}),
                ("bg_pointwise", {"s2d_base_grads": ("pointwise",)}),
                ("bg_stride1", {"s2d_base_grads": ("stride1",)}),
                ("bg_exit", {"s2d_base_grads": ("stride2_exit",)}))
    if args.only:
        keep = set(args.only.split(","))
        variants = tuple(v for v in variants if v[0] in keep)
    for label, kw in variants:
        kw = dict(kw)
        tcfg = TrainConfig(batch_size=tb, **kw.pop("_tcfg", {}))
        cfg = ModelConfig(img_size=(args.img, args.img, 3), number_classes=2,
                          anchors=((64, 384), (384, 64)),
                          compute_dtype="bfloat16", **kw)
        fm_model = YoloV3(cfg)
        state = create_train_state(fm_model, tcfg, jax.random.PRNGKey(0),
                                   (1, args.img, args.img, 3))
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(fm_model, cfg, tcfg, mesh, tb)
        labels = encode_boxes(np.array([[64, 64, 128, 128, 0]], np.float32),
                              cfg.img_size, cfg.anchors, cfg.number_classes)
        tbatch = shard_batch(
            (rng.randn(tb, args.img, args.img, 3).astype(np.float32),
             np.stack([labels[0]] * tb), np.stack([labels[1]] * tb),
             np.stack([labels[2]] * tb)), mesh)
        lr = jnp.float32(1e-4)

        if state.quant_scales is not None:
            # static QAT: freeze calibration scales before stepping
            from yolov3_tpu.models import quantized as Q
            scales = Q.calibrate(state.params, state.batch_stats, cfg,
                                 tbatch[0])
            state = state.replace(quant_scales=Q.scales_to_collection(
                scales, state.quant_scales))

        print(f"[{label}] compiling...", flush=True)
        state, _ = step(state, tbatch, lr)
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0][..., :1])
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = step(state, tbatch, lr)
            jax.device_get(
                jax.tree_util.tree_leaves(state.params)[0][..., :1])
            dt = min(dt, (time.perf_counter() - t0) / args.iters)
        print(f"[{label}] {dt * 1e3:.2f} ms/step  {tb / dt:.1f} img/s",
              flush=True)

        if os.environ.get("PROFILE_TRAIN"):
            # per-fusion device-time attribution of this variant's step
            # (same methodology as bench_int8.py's PROFILE_INT8)
            from _profile_util import (collect_device_durations,
                                       dump_slow_fusions, print_attribution)

            hlo = step.lower(state, tbatch, lr).compile().as_text()
            holder = {"s": state}

            def run_once():
                s, _ = step(holder["s"], tbatch, lr)
                holder["s"] = s
                return s

            def settle(s):
                jax.device_get(
                    jax.tree_util.tree_leaves(s.params)[0][..., :1])

            durs = collect_device_durations(jax, run_once, settle)
            print_attribution(durs, hlo, tail_parts=5)
            ndump = int(os.environ.get("DUMP_FUSIONS", "0"))
            if ndump:
                dump_slow_fusions(durs, hlo, ndump)
            state = holder["s"]
        del state, step, tbatch


if __name__ == "__main__":
    main()
