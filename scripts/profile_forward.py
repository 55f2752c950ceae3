#!/usr/bin/env python
"""Profile the flagship forward pass and print a per-op time breakdown.

Captures a jax.profiler trace of the 512px detector (or a custom size),
aggregates device-op durations from the trace, and maps the hottest fusions
back to model layers via the compiled HLO metadata — the workflow used for
the space-to-depth optimization (see DESIGN.md).

  python scripts/profile_forward.py --batch 32 --img 512 [--steps 3]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--img", type=int, default=512)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--trace_dir", type=str, default=None)
    parser.add_argument("--train", action="store_true",
                        help="profile the training step (fwd+bwd+adam) "
                             "instead of the inference forward")
    parser.add_argument("--int8_train", action="store_true",
                        help="profile the QAT (int8-forward STE) train step")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.config import ModelConfig
    from yolov3_tpu.models.yolo import YoloV3Detector

    cfg = ModelConfig(img_size=(args.img, args.img, 3), number_classes=2,
                      anchors=((64, 384), (384, 64)),
                      compute_dtype="bfloat16",
                      int8_train=args.int8_train)
    if args.int8_train:
        args.train = True
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(
        args.batch, args.img, args.img, 3).astype(np.float32))

    if args.train:
        from yolov3_tpu.config import TrainConfig
        from yolov3_tpu.data.encoder import encode_boxes
        from yolov3_tpu.models.yolo import YoloV3
        from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                         make_train_step, replicate_to_mesh,
                                         shard_batch)

        tcfg = TrainConfig(batch_size=args.batch)
        fm_model = YoloV3(cfg)
        mesh = make_mesh(n_devices=1)
        state = create_train_state(fm_model, tcfg, jax.random.PRNGKey(0),
                                   (1, args.img, args.img, 3))
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(fm_model, cfg, tcfg, mesh, args.batch)
        labels = encode_boxes(np.array([[64, 64, 128, 128, 0]], np.float32),
                              cfg.img_size, cfg.anchors, cfg.number_classes)
        tbatch = shard_batch(
            (np.asarray(x),
             np.stack([labels[0]] * args.batch),
             np.stack([labels[1]] * args.batch),
             np.stack([labels[2]] * args.batch)), mesh)
        lr = jnp.float32(1e-4)

        def fn(_):
            nonlocal state
            state, m = step(state, tbatch, lr)
            return m["loss"]

        lower_fn = lambda: step.lower(state, tbatch, lr)
    else:
        model = YoloV3Detector(cfg)
        variables = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, args.img, args.img, 3), jnp.float32),
            train=False))(jax.random.PRNGKey(0))
        fn = jax.jit(lambda im: model.apply(variables, im, train=False))
        lower_fn = lambda: fn.lower(x)

    print("compiling...", flush=True)
    jax.block_until_ready(fn(x))
    jax.block_until_ready(fn(x))

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="yolo_prof_")
    jax.profiler.start_trace(trace_dir)
    out = None
    for _ in range(args.steps):
        out = fn(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        raise SystemExit(f"no trace produced under {trace_dir}")
    with gzip.open(traces[-1]) as fh:
        trace = json.load(fh)

    durs = collections.Counter()
    host_markers = ("np.", "PjitFunction", "DevicePut", "jit(", "jit_",
                    "block_until", "$", "Thunk", "TransferTo",
                    "copy_to_host")
    for e in trace.get("traceEvents", []):
        name = e.get("name", "")
        if (e.get("ph") == "X" and "dur" in e
                and not any(m in name for m in host_markers)):
            durs[name] += e["dur"]

    hlo = lower_fn().compile().as_text()

    info = {}
    head = re.compile(r"%(\S+) = (\S+) (?:[a-z\-]*fusion|copy|"
                      r"convolution)\(")
    op_re = re.compile(r"op_name=\"([^\"]*)\"")
    for line in hlo.splitlines():
        m = head.search(line)
        if m:
            op = op_re.search(line)
            info[m.group(1)] = (m.group(2), op.group(1) if op else "?")

    def layer_of(fusion_name):
        shape, op = info.get(fusion_name, ("?", "?"))
        return shape[:30] + " " + "/".join(op.split("/")[-3:])

    total = sum(durs.values()) / args.steps / 1e3
    print(f"\ndevice total: {total:.2f} ms/step "
          f"({args.batch / total * 1000:.0f} img/s)")
    for name, d in durs.most_common(args.top):
        print(f"{d / args.steps / 1e3:8.2f} ms/step  {name[:44]:44s} "
              f"{layer_of(name)[:80]}")

    if args.trace_dir is None:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
