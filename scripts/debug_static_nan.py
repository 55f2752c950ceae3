"""Reproduce the int8_static_train overfit NaN (VERDICT r4 weak #1b).

Mirrors tests/test_quality_e2e.py exactly but logs loss every 25 steps,
scale stats at each recalibration, and stops at the first non-finite loss.
"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov3_tpu.config import ModelConfig, TrainConfig
from yolov3_tpu.data.encoder import encode_boxes
from yolov3_tpu.data.imaging import zscore_normalize
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                 make_train_step, replicate_to_mesh,
                                 shard_batch)

SIZE, BOX, N_IMAGES, STEPS, LR = 64, 24, 8, 1000, 5e-3

rng = np.random.RandomState(42)
images, gts = [], []
for i in range(N_IMAGES):
    img = (rng.rand(SIZE, SIZE, 3) * 40).astype(np.float32)
    x = rng.randint(0, SIZE - BOX)
    y = rng.randint(0, SIZE - BOX)
    img[y:y + BOX, x:x + BOX] += 180 + rng.rand() * 40
    img = np.clip(img, 0, 255).astype(np.uint8)
    images.append(img)
    gts.append(np.array([[x, y, BOX, BOX, 0]], np.int32))

cfg = ModelConfig(img_size=(SIZE, SIZE, 3), number_classes=1,
                  anchors=((24, 24), (12, 12)), block_count=1,
                  filter_count=32, compute_dtype="float32",
                  int8_train=True, int8_train_static=True)
tcfg = TrainConfig(batch_size=N_IMAGES)
model = YoloV3(cfg)
mesh = make_mesh(n_devices=1)
state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                           (1, SIZE, SIZE, 3))
state = replicate_to_mesh(state, mesh)
step = make_train_step(model, cfg, tcfg, mesh, N_IMAGES)

batch_imgs = np.stack([zscore_normalize(im.astype(np.float32))
                       for im in images]).astype(np.float32)
labels = [encode_boxes(g.astype(np.float32), cfg.img_size, cfg.anchors,
                       cfg.number_classes) for g in gts]
tbatch = shard_batch(
    (batch_imgs,
     np.stack([lab[0] for lab in labels]),
     np.stack([lab[1] for lab in labels]),
     np.stack([lab[2] for lab in labels])), mesh)


def recalibrate(st):
    from yolov3_tpu.models import quantized as Q
    scales = Q.calibrate(jax.device_get(st.params),
                         jax.device_get(st.batch_stats), cfg, tbatch[0],
                         train_mode=True)
    flat = jax.tree_util.tree_leaves(scales)
    arr = np.array([float(np.asarray(v)) for v in flat])
    print(f"  recal: n={arr.size} min={arr.min():.3e} max={arr.max():.3e} "
          f"nan={np.isnan(arr).sum()}", flush=True)
    return st.replace(quant_scales=Q.scales_to_collection(
        scales, st.quant_scales))


lr = jnp.float32(LR)
for i in range(STEPS):
    if i % 250 == 0:
        state = recalibrate(state)
    state, metrics = step(state, tbatch, lr)
    loss = float(metrics["loss"])
    if i % 25 == 0 or not np.isfinite(loss):
        sub = {k: float(v) for k, v in metrics.items()}
        print(f"step {i:4d} {sub}", flush=True)
    if not np.isfinite(loss):
        print("NON-FINITE at step", i, flush=True)
        # dump param/batch_stats finiteness
        p = jax.device_get(state.params)
        bad = [k for k, v in
               jax.tree_util.tree_flatten_with_path(p)[0].__iter__()] # noqa
        def chk(tree, name):
            leaves = jax.tree_util.tree_leaves_with_path(tree)
            for path, v in leaves:
                v = np.asarray(v)
                if not np.all(np.isfinite(v)):
                    print(f"  NONFINITE {name}: {jax.tree_util.keystr(path)}",
                          flush=True)
        chk(p, "params")
        chk(jax.device_get(state.batch_stats), "batch_stats")
        sys.exit(1)
print("final loss", loss)
