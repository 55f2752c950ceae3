"""Training CLI: multi-chip data-parallel YOLOv3 training.

The TPU-native equivalent of reference/train.py:28-267. Loop semantics are
preserved exactly:

- global batch = per-chip batch x chip count (reference/train.py:41); data
  readers scale 3x per chip (reference/train.py:16,43)
- test reader without augmentation/shuffle, train reader with augmentation,
  shuffle, and class balancing (reference/train.py:46-50)
- an "epoch" is `test_every_n_steps` train steps (reference/train.py:75);
  epoch 0 is an Adam warmup of min(1000, epoch_size) steps at lr/10
  (reference/train.py:107-113)
- the reference's step loop runs `epoch_size + 1` steps (its break fires at
  step > epoch_size, reference/train.py:117-119) — bug-compatible here
- NaN losses abort training (reference/train.py:124-125,150-151)
- per-step train scalars + per-epoch test scalars to TensorBoard
  (reference/train.py:128-133,158-163), `test_loss.csv` rewritten per epoch
  (reference/train.py:170-173)
- checkpoint ONLY on a new best test loss, single overwritten path
  (reference/train.py:178-182); early stopping against the first epoch
  within 1e-4 of the best (reference/train.py:185-197)
- after training: restore the best checkpoint and export the inference
  artifact (reference/train.py:208-221)

TPU-native differences: the train step is one jitted shard_map program over
a `jax.sharding.Mesh` (gradients psum over ICI), the host pipeline feeds
sharded NHWC batches, checkpoints are Orbax, and `--profile_dir` captures a
jax.profiler trace (the reference has no profiling hooks; SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import datetime
import os
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.config import (
    TRAIN_DEFAULT_ANCHORS,
    AugmentConfig,
    ModelConfig,
    TrainConfig,
)
from yolov3_tpu.data.reader import DatasetReader, ShmBatchReader
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    place_train_state,
    shard_batch,
)
from yolov3_tpu.utils import checkpoint as ckpt
from yolov3_tpu.utils.metrics import MetricSet, SummaryLogger, write_loss_csv


def train_model(batch_size: int, test_every_n_steps: int,
                train_database_filepath: str, test_database_filepath: str,
                output_folder: str, early_stopping_count: int,
                learning_rate: float, use_augmentation: bool,
                anchors: Sequence[Tuple[float, float]] = TRAIN_DEFAULT_ANCHORS,
                num_devices: Optional[int] = None,
                seed: int = 0,
                max_epochs: Optional[int] = None,
                compute_dtype: str = "bfloat16",
                profile_dir: Optional[str] = None,
                tcfg: Optional[TrainConfig] = None,
                augment_config: Optional[AugmentConfig] = None,
                model_overrides: Optional[dict] = None,
                device_augment: bool = False,
                shm_feed: bool = False,
                resume: bool = False,
                shard_optimizer: bool = False) -> Optional[str]:
    """Run the full training loop; returns the export path (or None)."""
    os.makedirs(output_folder, exist_ok=True)

    mesh = make_mesh(n_devices=num_devices)
    n_chips = mesh.devices.size
    global_batch_size = batch_size * n_chips
    reader_count = (tcfg.reader_count_per_device if tcfg
                    else TrainConfig().reader_count_per_device) * n_chips
    tcfg = tcfg or TrainConfig(batch_size=batch_size,
                               learning_rate=learning_rate,
                               test_every_n_steps=test_every_n_steps,
                               early_stopping_count=early_stopping_count,
                               use_augmentation=bool(use_augmentation),
                               shard_optimizer=shard_optimizer)

    # multi-host: each process reads a disjoint equal 1/world slice of the
    # databases (DP over hosts; shard is a no-op at world=1)
    shard = (jax.process_index(), jax.process_count())

    print(f"Devices: {n_chips} ({mesh.devices.flat[0].platform}), "
          f"global batch {global_batch_size}, readers {reader_count}, "
          f"host shard {shard[0]}/{shard[1]}")

    # optional shared-memory ring transport for device_augment's raw
    # batches (data/shm_ring.py): whole uint8 batches assembled in place
    # by the workers, zero per-image pickling through mp.Queue (~3x the
    # reader-side throughput; opt-in, see DESIGN.md round-3 feed ledger)
    use_shm = bool(device_augment and shm_feed)

    print("Setting up test image reader")
    if use_shm:
        test_reader = ShmBatchReader(test_database_filepath, anchors,
                                     batch_size=global_batch_size,
                                     use_augmentation=False, shuffle=False,
                                     num_workers=reader_count, shard=shard)
    else:
        test_reader = DatasetReader(test_database_filepath, anchors,
                                    use_augmentation=False, shuffle=False,
                                    num_workers=reader_count,
                                    raw_mode=device_augment, shard=shard)
    print(f"Test Reader has {test_reader.get_image_count()} images")

    print("Setting up training image reader")
    if use_shm:
        train_reader = ShmBatchReader(train_database_filepath, anchors,
                                      batch_size=global_batch_size,
                                      use_augmentation=bool(use_augmentation),
                                      shuffle=True, balance_classes=True,
                                      num_workers=reader_count,
                                      augment_config=augment_config,
                                      shard=shard)
    else:
        train_reader = DatasetReader(train_database_filepath, anchors,
                                     use_augmentation=bool(use_augmentation),
                                     shuffle=True, balance_classes=True,
                                     num_workers=reader_count,
                                     augment_config=augment_config,
                                     raw_mode=device_augment, shard=shard)
    print(f"Train Reader has {train_reader.get_image_count()} images")

    export_path = None
    best_checkpoint_saved = False
    try:
        print("Starting Readers")
        train_reader.startup()
        test_reader.startup()

        number_classes = train_reader.get_number_classes()
        img_size = train_reader.get_image_size()
        cfg = ModelConfig(img_size=tuple(img_size),
                          number_classes=number_classes,
                          anchors=tuple(tuple(a) for a in anchors),
                          compute_dtype=compute_dtype,
                          **(model_overrides or {}))
        print(f"Creating model: img_size={img_size} classes={number_classes} "
              f"anchors={list(cfg.anchors)}")
        model = YoloV3(cfg)
        state = create_train_state(model, tcfg, jax.random.PRNGKey(seed),
                                   (batch_size, *img_size), mesh=mesh)

        # mid-run resume (the reference always restarts from scratch,
        # reference/train.py has no resume path; SURVEY.md §5): restore the
        # best checkpoint + the test-loss history and continue the epoch
        # loop from where it stopped.
        test_loss = []
        if resume and os.path.exists(os.path.join(output_folder,
                                                  ckpt.CHECKPOINT_DIR)):
            print("Resuming from checkpoint")
            state = ckpt.restore_checkpoint(output_folder, state)
            best_checkpoint_saved = True
            loss_csv = os.path.join(output_folder, "test_loss.csv")
            if os.path.exists(loss_csv):
                with open(loss_csv) as fh:
                    test_loss = [float(line) for line in fh if line.strip()]
            print(f"Resumed at step {int(state.step)}, "
                  f"{len(test_loss)} completed epochs")
        state = place_train_state(state, mesh)

        train_step = make_train_step(model, cfg, tcfg, mesh, global_batch_size)
        eval_step = make_eval_step(model, cfg, tcfg, mesh, global_batch_size)

        # static-QAT (int8_train_static): refresh the frozen activation
        # scales from a current batch at every epoch start. The calibration
        # forward is jitted ONCE with params as arguments (the PTQ
        # `calibrate` closes over them and would recompile per refresh).
        recalibrate = None
        if state.quant_scales is not None:
            from yolov3_tpu.models import quantized as Qz

            @jax.jit
            def _calib(params, batch_stats, x):
                collect = {}
                # bn_batch_stats: the frozen scales feed the TRAIN-mode
                # forward, so calibration must normalize with the batch's
                # own statistics — running averages are stale mid-training
                # and the mis-normalization compounds through the backbone
                # (round-4 int8_static NaN post-mortem, DESIGN.md round 5)
                Qz.forward_feature_maps(params, batch_stats, cfg, x,
                                        collect=collect,
                                        collect_reduce="absmax",
                                        bn_batch_stats=True)
                return collect

            def recalibrate(st, images):
                vals = jax.device_get(
                    _calib(st.params, st.batch_stats, images))
                scales = {k: max(float(v), 1e-12) / 127.0
                          for k, v in vals.items()}
                qs = Qz.scales_to_collection(scales, st.quant_scales)
                return st.replace(quant_scales=qs)

        raw_train_batches = train_reader.batches(global_batch_size)
        raw_test_batches = test_reader.batches(global_batch_size)

        if device_augment:
            # host workers only decode; augmentation + z-score + YOLO label
            # encoding run jitted on the chips (TPU-native; the reference
            # burns host CPUs on this, reference/imagereader.py:326-411)
            from yolov3_tpu.data.device_pipeline import preprocess_batch
            base_key = jax.random.PRNGKey(seed + 1)
            acfg = augment_config or AugmentConfig()
            counter = [0]

            def feed(raw_iter, augment_flag):
                for raw in raw_iter:
                    images, boxes, valid = shard_batch(raw, mesh)
                    counter[0] += 1
                    key = jax.random.fold_in(base_key, counter[0])
                    out = preprocess_batch(
                        images, boxes, valid, key, acfg,
                        tuple(img_size), tuple(cfg.anchors), number_classes,
                        use_augmentation=augment_flag)
                    if use_shm:
                        # the raw views alias ring slots that recycle on
                        # the next next(raw_iter); settle the preprocess
                        # (which implies the device_put consumed the
                        # pixels) before advancing. Runs in the prefetch
                        # thread, overlapped with the train step.
                        out = jax.block_until_ready(out)
                    yield out

            # run the shard_batch device_put + preprocess dispatch in a
            # background thread too, so the host->device RTT overlaps the
            # train step just like host mode below
            from yolov3_tpu.utils.prefetch import DevicePrefetcher
            train_batches = DevicePrefetcher(
                feed(raw_train_batches, bool(use_augmentation)), lambda b: b)
            test_batches = DevicePrefetcher(
                feed(raw_test_batches, False), lambda b: b)
        else:
            # stage host batches onto the mesh from a background thread so
            # device_put overlaps with the train step (tf.data .prefetch
            # analog, reference/train.py:61,65)
            from yolov3_tpu.utils.prefetch import DevicePrefetcher
            train_batches = DevicePrefetcher(
                raw_train_batches, lambda b: shard_batch(b, mesh))
            test_batches = DevicePrefetcher(
                raw_test_batches, lambda b: shard_batch(b, mesh))

        train_epoch_size = test_every_n_steps
        test_epoch_size = test_reader.get_image_count() / batch_size

        train_metrics = MetricSet("train")
        test_metrics = MetricSet("test")
        stamp = datetime.datetime.now().strftime("%Y%m%dT%H%M%S")
        tb_root = os.path.join(output_folder, f"tensorboard-{stamp}")
        train_logger = SummaryLogger(os.path.join(tb_root, "train"))
        test_logger = SummaryLogger(os.path.join(tb_root, "test"))

        epoch = len(test_loss)  # > 0 when resuming
        print("Running Network")
        while True:
            print(f"---- Epoch: {epoch} ----")
            if recalibrate is not None:
                state = recalibrate(state, next(train_batches)[0])
            if epoch == 0:
                cur_train_epoch_size = min(tcfg.warmup_steps, train_epoch_size)
                print(f"Performing Adam Optimizer learning rate warmup for "
                      f"{cur_train_epoch_size} steps")
                lr = jnp.float32(learning_rate / tcfg.warmup_lr_divisor)
            else:
                cur_train_epoch_size = train_epoch_size
                lr = jnp.float32(learning_rate)

            start_time = time.time()
            if profile_dir and epoch == 1:
                jax.profiler.start_trace(profile_dir)
            # reference's `if step > size: break` runs size+1 steps
            for step in range(cur_train_epoch_size + 1):
                # batches arrive already staged/sharded by the prefetcher
                state, metrics = train_step(state, next(train_batches), lr)
                metrics = {k: float(v) for k, v in metrics.items()}
                # NaN tripwire checks the cross-replica SUM, the quantity the
                # reference's dist_train_step returns (reference/train.py:124)
                if np.isnan(metrics.pop("loss_sum")):
                    raise RuntimeError(
                        "Training Loss went to NaN, try a lower learning rate")
                train_metrics.update(metrics)
                global_step = int(epoch * train_epoch_size + step)
                print(f"Train Epoch {epoch}: Batch {step}/{train_epoch_size}: "
                      f"Loss {train_metrics.metrics['loss'].result()}")
                train_logger.scalars(train_metrics.results(), global_step)
                train_metrics.reset()
            if profile_dir and epoch == 1:
                jax.profiler.stop_trace()

            epoch_test_loss = []
            for step in range(int(test_epoch_size) + 1):
                metrics = {k: float(v) for k, v
                           in eval_step(state, next(test_batches)).items()}
                # test_loss.csv / early stopping track the summed loss, the
                # value the reference appends (reference/train.py:150-155)
                loss_sum = metrics.pop("loss_sum")
                if np.isnan(loss_sum):
                    raise RuntimeError("Test Loss went to NaN")
                epoch_test_loss.append(loss_sum)
                test_metrics.update(metrics)
            test_loss.append(float(np.mean(epoch_test_loss)))

            print(f"Test Epoch: {epoch}: Loss = "
                  f"{test_metrics.metrics['loss'].result()}")
            test_logger.scalars(test_metrics.results(),
                                int((epoch + 1) * train_epoch_size))
            test_metrics.reset()

            write_loss_csv(os.path.join(output_folder, "test_loss.csv"),
                           test_loss)
            print(f"Epoch took: {time.time() - start_time} s")

            # best-only checkpoint (reference/train.py:178-182)
            if (len(test_loss) - 1) == int(np.argmin(test_loss)):
                print(f"Test loss improved: {np.min(test_loss)}, "
                      f"saving checkpoint")
                ckpt.save_checkpoint(output_folder, state)
                best_checkpoint_saved = True

            # early stopping (reference/train.py:185-197)
            print("Best Current Epoch Selection:")
            print("Test Loss:")
            print(test_loss)
            error_from_best = np.abs(np.asarray(test_loss) - np.min(test_loss))
            error_from_best[error_from_best < tcfg.convergence_tolerance] = 0
            best_epoch = int(np.where(error_from_best == 0)[0][0])
            print(f"Best epoch: {best_epoch}")
            if len(test_loss) - best_epoch > early_stopping_count:
                break
            epoch += 1
            if max_epochs is not None and epoch >= max_epochs:
                break

        train_logger.close()
        test_logger.close()
    finally:
        for it in (locals().get("train_batches"), locals().get("test_batches")):
            if hasattr(it, "stop"):
                it.stop()
        print("Shutting down train_reader")
        train_reader.shutdown()
        print("Shutting down test_reader")
        test_reader.shutdown()

    if best_checkpoint_saved:
        print("Converting best checkpoint into inference artifact")
        # template structure must match the saved state (ZeRO-1 runs save
        # a ZeroAdamState, tied to the training mesh size)
        template = create_train_state(model, tcfg, jax.random.PRNGKey(seed),
                                      (batch_size, *img_size), mesh=mesh)
        restored = ckpt.restore_checkpoint(output_folder, template)
        export_path = ckpt.export_model(output_folder, restored.params,
                                        restored.batch_stats, cfg)
        print(f"Exported: {export_path}")
    return export_path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="train_yolo", description="Train a YOLOv3 model on TPU")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="per-chip training batch size")
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--test_every_n_steps", type=int, default=1000,
                        help="number of gradient update steps between test runs")
    parser.add_argument("--train_database", dest="train_database_filepath",
                        type=str, required=True,
                        help="database to use for training (Required)")
    parser.add_argument("--test_database", dest="test_database_filepath",
                        type=str, required=True,
                        help="database to use for testing (Required)")
    parser.add_argument("--output_dir", dest="output_folder", type=str,
                        required=True,
                        help="Folder where outputs will be saved (Required)")
    parser.add_argument("--early_stopping", type=int, default=10,
                        help="stop when test loss has not improved for N epochs")
    parser.add_argument("--max_epochs", type=int, default=None,
                        help="hard cap on training epochs (the reference runs "
                             "until early stopping alone; a bound is useful "
                             "for smoke runs and scheduled jobs)")
    parser.add_argument("--use_augmentation", type=int, default=1,
                        help="whether to use data augmentation [0=false, 1=true]")
    parser.add_argument("--anchors", type=str,
                        default=",".join(f"{w}x{h}" for w, h in
                                         TRAIN_DEFAULT_ANCHORS),
                        help="comma-separated WxH anchor list (the reference "
                             "hardcodes 64x384,384x64 in source)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="restrict to the first N chips (default: all)")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=("bfloat16", "float32"))
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of epoch 1 here")
    parser.add_argument("--device_augment", type=int, default=0,
                        help="run augmentation + label encoding on the TPU "
                             "(jit) instead of in host worker processes "
                             "[0=false, 1=true]")
    parser.add_argument("--shm_feed", type=int, default=0,
                        help="with --device_augment: move raw batches "
                             "through a shared-memory ring instead of "
                             "pickling per-image through queues — ~3x "
                             "less host CPU per image, but adds a "
                             "per-batch device sync (slot-recycle "
                             "safety) that loses on a host with very "
                             "few cores; see DESIGN.md [0=false, 1=true]")
    parser.add_argument("--resume", action="store_true",
                        help="resume from an existing checkpoint in "
                             "--output_dir (the reference cannot resume)")
    parser.add_argument("--shard_optimizer", type=int, default=0,
                        help="ZeRO-1: shard Adam moments + the param update "
                             "across chips, all_gather updated params over "
                             "ICI; numerically identical to the replicated "
                             "optimizer [0=false, 1=true]")
    parser.add_argument("--int8_train", type=int, default=0,
                        help="quantization-aware training: run conv forwards "
                             "on the int8 MXU path (straight-through bf16 "
                             "backward) [0=false, 1=true]")
    parser.add_argument("--int8_static", type=int, default=0,
                        help="with --int8_train: quantize activations with "
                             "FROZEN calibration scales refreshed once per "
                             "epoch instead of per-batch absmax — removes "
                             "the per-layer absmax reductions from the "
                             "forward [0=false, 1=true]")
    args = parser.parse_args(argv)

    anchors = tuple(tuple(float(v) for v in a.split("x"))
                    for a in args.anchors.split(","))

    print("Arguments:")
    for k, v in sorted(vars(args).items()):
        print(f"{k} = {v}")

    train_model(args.batch_size, args.test_every_n_steps,
                args.train_database_filepath, args.test_database_filepath,
                args.output_folder, args.early_stopping, args.learning_rate,
                bool(args.use_augmentation), anchors=anchors,
                num_devices=args.num_devices,
                compute_dtype=args.compute_dtype,
                profile_dir=args.profile_dir,
                device_augment=bool(args.device_augment),
                shm_feed=bool(args.shm_feed),
                resume=args.resume,
                shard_optimizer=bool(args.shard_optimizer),
                max_epochs=args.max_epochs,
                model_overrides=(dict(
                    int8_train=True,
                    **({"int8_train_static": True} if args.int8_static
                       else {})) if args.int8_train else None))


if __name__ == "__main__":
    main()
