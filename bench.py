"""Benchmark: flagship throughput at 512x512 on one chip.

Prints one JSON line per metric (headline LAST):
- bf16 inference images/sec (forward + decode), batch 32
- train step images/sec (fwd+bwd+psum+adam), batch 16
- int8 quantized inference images/sec, batch 32
- int8 quantized inference images/sec, batch 64  <- headline (the serving
  operating point: larger batch amortizes per-op overheads on the deep
  low-spatial layers)

Baseline target: 4000 images/sec/chip at 512x512 (BASELINE.md). The
reference publishes no numbers; vs_baseline is value / 4000. The bf16
roofline for this network is ~2040 img/s (96.5 GFLOPs/img at ~197 TFLOPs
bf16 on v5e); int8 (394 TOPS) is the route toward the target.

Timing per CLAUDE.md gotcha: device_get of ONE end-of-program buffer.
"""

import json
import os
import time

import numpy as np

TARGET_IMG_PER_SEC = 4000.0


def _enable_compilation_cache(jax) -> None:
    """Persist XLA compilations across processes — first compile of the full
    512px program costs minutes over a remote-compile tunnel."""
    cache_dir = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache(jax)

    from yolov3_tpu.config import ModelConfig, TrainConfig
    from yolov3_tpu.data.encoder import encode_boxes
    from yolov3_tpu.models import quantized as Q
    from yolov3_tpu.models.yolo import YoloV3, YoloV3Detector
    from yolov3_tpu.ops.decode import decode_detections
    from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                     make_train_step, replicate_to_mesh,
                                     shard_batch)

    cfg = ModelConfig(img_size=(512, 512, 3), number_classes=2,
                      anchors=((64, 384), (384, 64)),
                      compute_dtype="bfloat16")
    fm_model = YoloV3(cfg)
    variables = jax.jit(lambda key: fm_model.init(
        key, jnp.zeros((1, 512, 512, 3), jnp.float32), train=False))(
            jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(0)

    def emit(metric, value, unit):
        print(json.dumps({
            "metric": metric,
            "value": round(value, 2),
            "unit": unit,
            "vs_baseline": round(value / TARGET_IMG_PER_SEC, 4),
        }), flush=True)

    def time_fn(fn, x, iters, final_buf):
        """iters dispatches; clock stops on device_get of final_buf(out).
        Best of two passes: the axon tunnel occasionally degrades for a
        window (measured: a 450 ms/call blip on an otherwise-25 ms
        program), which must not end up as the recorded number."""
        jax.device_get(final_buf(fn(x)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(x)
            jax.device_get(final_buf(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # ---- bf16 inference, batch 32 ----
    batch = 32
    det_model = YoloV3Detector(cfg)
    det_vars = {"params": {"backbone": params},
                "batch_stats": {"backbone": batch_stats}}

    @jax.jit
    def detect(images):
        return det_model.apply(det_vars, images, train=False)

    x32 = jnp.asarray(rng.randn(batch, 512, 512, 3).astype(np.float32))
    dt = time_fn(detect, x32, 30, lambda o: o[0, 0, :2])
    emit(f"inference_bf16_images_per_sec_512x512_b{batch}",
         batch / dt, "images/sec/chip")

    # ---- train step, batch 16 (best measured train operating point) ----
    tb = 16
    tcfg = TrainConfig(batch_size=tb)
    mesh = make_mesh(n_devices=1)
    state = create_train_state(fm_model, tcfg, jax.random.PRNGKey(0),
                               (1, 512, 512, 3))
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(fm_model, cfg, tcfg, mesh, tb)
    labels = encode_boxes(np.array([[64, 64, 128, 128, 0]]), cfg.img_size,
                          cfg.anchors, cfg.number_classes)
    tbatch = shard_batch(
        (rng.randn(tb, 512, 512, 3).astype(np.float32),
         np.stack([labels[0]] * tb), np.stack([labels[1]] * tb),
         np.stack([labels[2]] * tb)), mesh)
    lr = jnp.float32(1e-4)

    state, _ = step(state, tbatch, lr)  # compile + warm
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    jax.device_get(leaf[..., :1])
    iters = 20
    dt = float("inf")
    for _ in range(2):  # best of two passes (see time_fn)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = step(state, tbatch, lr)
        # block on an updated param: produced at the END of the step program
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0][..., :1])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    emit(f"train_images_per_sec_512x512_b{tb}", tb / dt, "images/sec/chip")
    del state, tbatch, step

    # ---- int8 inference, batch 32 and 64 (b64 headline, printed LAST) ----
    scales = Q.calibrate(params, batch_stats, cfg, x32[:8])

    # the PINNED serving kernel set (measured winners — round-5: the
    # S2D-region kernel with folded fast epilogue + rep-boundary
    # requantization + stem2 software pipelining; DESIGN.md ledgers).
    # bench.py times exactly what `make_quantized_detector_fn` ships.
    serving_kernels = Q.default_serving_kernels()

    @jax.jit
    def detect_int8(images):
        fms = Q.forward_feature_maps(params, batch_stats, cfg, images,
                                     act_scales=scales, **serving_kernels)
        return decode_detections(fms, cfg.anchors, cfg.number_classes,
                                 cfg.strides)

    dt = time_fn(detect_int8, x32, 30, lambda o: o[0, 0, :2])
    emit(f"inference_int8_images_per_sec_512x512_b{batch}",
         batch / dt, "images/sec/chip")

    # time the b64 headline HERE — before the serving programs below
    # allocate their NMS buffers and push HBM pressure up (measured:
    # the same program times ~1.5% slower at the end of this script
    # than in a standalone run) — but emit it LAST (driver contract:
    # headline is the final JSON line)
    x64 = jnp.asarray(rng.randn(64, 512, 512, 3).astype(np.float32))
    dt = time_fn(detect_int8, x64, 30, lambda o: o[0, 0, :2])
    headline = 64 / dt

    # on-TPU decode-fidelity gate at the bench shape: the int8 champion
    # graph must track the bf16 path's boxes BEFORE any number is
    # reported — a kernel regression cannot silently ship a fast wrong
    # answer (VERDICT r4 task 5b). Same guard as
    # tests/test_quantized.py::test_decode_fidelity_random_weights, but
    # on the real 512px champion program.
    det_f = np.asarray(jax.device_get(detect(x32)), np.float32)
    det_q = np.asarray(jax.device_get(detect_int8(x32)), np.float32)
    fid = Q.decode_iou_fidelity(det_f, det_q, top_k=20)
    assert fid > 0.9, f"int8 champion decode fidelity {fid:.4f} <= 0.9"

    # full serving program (forward + decode + clip + device NMS), int8
    from yolov3_tpu.ops.nms import batched_nms_device

    @jax.jit
    def serve_int8(images):
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

    dt = time_fn(serve_int8, x64, 20, lambda o: o[0][0, 0, 0, :2])
    emit("serving_int8_images_per_sec_512x512_b64_incl_nms",
         64 / dt, "images/sec/chip")

    # serving at REALISTIC score sparsity: random weights saturate every
    # class's candidate list (worst case for the NMS tail — the row above
    # is the upper bound); trained detectors put <=1% of raw boxes above
    # the score threshold (DESIGN.md round-4 sparsity study: tail 1.7-2.0
    # vs 2.9 ms). Reproduced here by shifting the heads' objectness
    # biases — exactly what training does (trained obj biases are
    # strongly negative) — so the timed program is IDENTICAL, only the
    # score distribution changes.
    det_h = np.asarray(det_q, np.float32)  # b32 decode fetched above
    obj = np.clip(det_h[..., 4], 1e-7, 1 - 1e-7)
    logit = np.log(obj) - np.log1p(-obj)
    clsp = det_h[..., 5:]

    def frac_above(d):
        o = 1.0 / (1.0 + np.exp(-(logit + d)))
        return float((np.sqrt(clsp * o[..., None]) >= 0.1).mean())

    lo, hi = -30.0, 5.0
    for _ in range(40):  # monotonic in d: bisect to ~1% above threshold
        mid = 0.5 * (lo + hi)
        lo, hi = (mid, hi) if frac_above(mid) < 0.01 else (lo, mid)
    dshift = 0.5 * (lo + hi)

    params_sp = jax.device_get(params)  # fresh host tree, safe to edit
    stride_d = 5 + cfg.number_classes
    for hname in ("DetectionHead_0", "DetectionHead_1", "DetectionHead_2"):
        b_ = np.array(params_sp[hname]["Conv_0"]["bias"], np.float32)
        b_[4::stride_d] += dshift
        params_sp[hname]["Conv_0"]["bias"] = jnp.asarray(b_)

    @jax.jit
    def serve_int8_realistic(images):
        fms = Q.forward_feature_maps(params_sp, batch_stats, cfg, images,
                                     act_scales=scales, **serving_kernels)
        det = decode_detections(fms, cfg.anchors, cfg.number_classes,
                                cfg.strides)
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

    dt = time_fn(serve_int8_realistic, x64, 20, lambda o: o[0][0, 0, 0, :2])
    emit("serving_int8_realistic_sparsity_images_per_sec_512x512_b64",
         64 / dt, "images/sec/chip")

    # raw-pixels serving: the WHOLE reference pipeline (per-image z-score
    # + forward + decode + clip + small-box filter + NMS,
    # reference/inference.py:44-79 — which the reference runs on the HOST
    # around a SavedModel call) as ONE device program fed uint8 pixels
    from yolov3_tpu.data.device_pipeline import zscore_images

    @jax.jit
    def serve_int8_u8(raw):
        # bf16 straight out of the z-score fusion (identical math — the
        # model casts to bf16 for the stem anyway) skips the separate
        # f32->bf16 convert at the stem boundary: +0.11 ms b64 measured
        # (scripts/bench_raw_serving.py)
        return serve_int8(zscore_images(raw).astype(jnp.bfloat16))

    u8 = jnp.asarray(rng.randint(0, 255, (64, 512, 512, 3)).astype(np.uint8))
    dt = time_fn(serve_int8_u8, u8, 20, lambda o: o[0][0, 0, 0, :2])
    emit("serving_int8_from_uint8_images_per_sec_512x512_b64",
         64 / dt, "images/sec/chip")

    emit("inference_int8_images_per_sec_512x512_b64",
         headline, "images/sec/chip")


if __name__ == "__main__":
    main()
