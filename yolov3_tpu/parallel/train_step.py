"""Data-parallel train/eval steps over a device mesh (shard_map + psum).

Replaces the reference's MirroredStrategy step wrappers
(reference/model.py:481-540). Written per-replica with `shard_map` rather
than a global-view pjit so that BatchNorm statistics are computed from each
chip's LOCAL batch — matching the reference, where Keras BN under
MirroredStrategy never syncs batch statistics (SURVEY.md §7 "hard parts").

Scaling parity:
- per-scale loss sums are divided by the LOCAL batch (inside compute_loss,
  reference/model.py:236-287),
- the per-replica total is divided by the GLOBAL batch size
  (reference/model.py:492),
- gradients are SUMMED across replicas (MirroredStrategy's all-reduce in
  apply_gradients, reference/model.py:500) -> `lax.psum` over ICI,
- the returned loss is the cross-replica SUM (reference/model.py:513),
- loss-component metrics are per-replica values averaged across replicas
  (Keras Mean metrics updated per replica, reference/model.py:502-506).

The learning rate is a traced argument so warmup (lr/10 on epoch 0,
reference/train.py:107-113) needs no recompilation. Adam matches Keras
defaults (b1=0.9, b2=0.999, eps=1e-7); optax applies bias correction to the
update rather than folding sqrt(1-b2^t) into eps — a sub-1e-7 deviation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from yolov3_tpu.config import ModelConfig, TrainConfig
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.ops.loss import compute_loss, l2_regularization
from yolov3_tpu.parallel.mesh import DATA_AXIS

Array = jnp.ndarray
Batch = Tuple[Array, Array, Array, Array]  # images NHWC + 3 label grids


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Adam without a baked-in learning rate; lr is applied in the step."""
    return optax.scale_by_adam(b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                               eps=tcfg.adam_eps)


def create_train_state(model: YoloV3, tcfg: TrainConfig, rng: jax.Array,
                       sample_batch_shape: Sequence[int]) -> TrainState:
    variables = model.init(rng, jnp.zeros(sample_batch_shape, jnp.float32),
                           train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = make_optimizer(tcfg).init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)


def _loss_and_metrics(model: YoloV3, cfg: ModelConfig, tcfg: TrainConfig,
                      global_batch_size: int, params, batch_stats,
                      images: Array, labels: Sequence[Array], train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        fms, mutated = model.apply(variables, images, train=True,
                                   mutable=["batch_stats"])
        new_batch_stats = mutated["batch_stats"]
    else:
        fms = model.apply(variables, images, train=False)
        new_batch_stats = batch_stats

    yolo_loss = compute_loss(fms, labels, cfg.anchors, cfg.number_classes,
                             cfg.strides, packed=tcfg.packed_loss)
    loss = yolo_loss.total / float(global_batch_size)
    if tcfg.apply_weight_decay:
        loss = loss + l2_regularization(params, tcfg.weight_decay)
    return loss, (yolo_loss, new_batch_stats)


def make_train_step(model: YoloV3, cfg: ModelConfig, tcfg: TrainConfig,
                    mesh: Mesh, global_batch_size: int,
                    ) -> Callable[[TrainState, Batch, Array],
                                  Tuple[TrainState, Dict[str, Array]]]:
    """Build the jitted multi-chip train step.

    Returns step(state, batch, lr) -> (new_state, metrics) where `batch` is
    globally sharded along the mesh's data axis and `state` is replicated.
    """
    optimizer = make_optimizer(tcfg)

    def per_replica_step(state: TrainState, batch: Batch, lr: Array):
        images, l32, l16, l8 = batch
        grad_fn = jax.value_and_grad(
            functools.partial(_loss_and_metrics, model, cfg, tcfg,
                              global_batch_size),
            has_aux=True)
        (loss, (yolo_loss, new_batch_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, (l32, l16, l8),
            train=True)

        # cross-replica reductions over ICI
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss_sum = jax.lax.psum(loss, DATA_AXIS)
        # BN moving statistics: replicas average their local updates so the
        # state stays replicated (MirroredStrategy's mean aggregation)
        new_batch_stats = jax.lax.pmean(new_batch_stats, DATA_AXIS)

        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {
            # "loss" matches the reference's logged TensorBoard scalar: the
            # Keras Mean over per-replica losses (= sum / n_replicas,
            # reference/train.py:127-133). "loss_sum" is the value
            # strategy.reduce(SUM) returns (reference/model.py:513), used
            # for the NaN tripwire and test_loss.csv.
            "loss": jax.lax.pmean(loss, DATA_AXIS),
            "loss_sum": loss_sum,
            "loss_xy": jax.lax.pmean(yolo_loss.xy, DATA_AXIS),
            "loss_wh": jax.lax.pmean(yolo_loss.wh, DATA_AXIS),
            "loss_obj": jax.lax.pmean(yolo_loss.objectness, DATA_AXIS),
            "loss_class": jax.lax.pmean(yolo_loss.class_, DATA_AXIS),
        }
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_batch_stats,
                               opt_state=new_opt_state)
        return new_state, metrics

    state_spec = P()          # replicated
    batch_spec = (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
    sharded = shard_map(per_replica_step, mesh=mesh,
                        in_specs=(state_spec, batch_spec, P()),
                        out_specs=(state_spec, P()),
                        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model: YoloV3, cfg: ModelConfig, tcfg: TrainConfig,
                   mesh: Mesh, global_batch_size: int,
                   ) -> Callable[[TrainState, Batch], Dict[str, Array]]:
    """Jitted multi-chip test step (reference/model.py:517-540)."""

    def per_replica_step(state: TrainState, batch: Batch):
        images, l32, l16, l8 = batch
        loss, (yolo_loss, _) = _loss_and_metrics(
            model, cfg, tcfg, global_batch_size, state.params,
            state.batch_stats, images, (l32, l16, l8), train=False)
        return {
            "loss": jax.lax.pmean(loss, DATA_AXIS),
            "loss_sum": jax.lax.psum(loss, DATA_AXIS),
            "loss_xy": jax.lax.pmean(yolo_loss.xy, DATA_AXIS),
            "loss_wh": jax.lax.pmean(yolo_loss.wh, DATA_AXIS),
            "loss_obj": jax.lax.pmean(yolo_loss.objectness, DATA_AXIS),
            "loss_class": jax.lax.pmean(yolo_loss.class_, DATA_AXIS),
        }

    batch_spec = (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
    sharded = shard_map(per_replica_step, mesh=mesh,
                        in_specs=(P(), batch_spec), out_specs=P(),
                        check_vma=False)
    return jax.jit(sharded)
