"""Benchmark: flagship inference throughput at 512x512 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 4000 images/sec/chip at 512x512 (BASELINE.md).

Measures the full on-device inference path — YOLOv3 (Darknet-53 + FPN
heads, bf16) forward + box decode — end to end with the batch size swept
for best throughput. The reference publishes no numbers (BASELINE.md);
vs_baseline is value / 4000.
"""

import json
import os
import time

import numpy as np

TARGET_IMG_PER_SEC = 4000.0
BATCH_SIZES = (32,)  # best measured operating point on v5e


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

    from yolov3_tpu.config import ModelConfig
    from yolov3_tpu.models.yolo import YoloV3Detector

    cfg = ModelConfig(img_size=(512, 512, 3), number_classes=2,
                      anchors=((64, 384), (384, 64)),
                      compute_dtype="bfloat16")
    model = YoloV3Detector(cfg)
    variables = jax.jit(lambda key: model.init(
        key, jnp.zeros((1, 512, 512, 3), jnp.float32), train=False))(
            jax.random.PRNGKey(0))

    @jax.jit
    def detect(images):
        return model.apply(variables, images, train=False)

    best = 0.0
    best_batch = 0
    rng = np.random.RandomState(0)
    for batch in BATCH_SIZES:
        try:
            images = jnp.asarray(
                rng.randn(batch, 512, 512, 3).astype(np.float32))
            # warmup / compile
            jax.block_until_ready(detect(images))
            jax.block_until_ready(detect(images))
            iters = 30  # amortize per-dispatch latency
            t0 = time.perf_counter()
            for _ in range(iters):
                out = detect(images)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            ips = batch * iters / dt
            if ips > best:
                best, best_batch = ips, batch
        except Exception:
            break  # OOM at this batch; keep the best so far

    print(json.dumps({
        "metric": f"inference_images_per_sec_512x512_b{best_batch}",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / TARGET_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
