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
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

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
    # static-QAT frozen activation scales (the model's `quant_scales` flax
    # collection; None unless ModelConfig.int8_train_static). Not touched
    # by the step — refreshed by the trainer's periodic recalibration
    # (train.py::_recalibrate_quant_scales).
    quant_scales: Any = None


@flax.struct.dataclass
class ZeroAdamState:
    """ZeRO-1 sharded Adam state: `mu`/`nu` mirror the params tree, each
    leaf stored FLAT at [n_dev * ceil(size / n_dev)] and sharded along
    axis 0 of the data mesh — every chip holds and updates only its 1/n
    slice of the optimizer moments and parameters, then `all_gather`s the
    updated params over ICI. The reference replicates Adam state on every
    GPU (Keras optimizer under MirroredStrategy, reference/model.py:451 +
    reference/train.py:38); the round-3 train profile attributed ~4 ms of
    the 47 ms b16 step to replicated Adam m/v/p HBM traffic."""
    count: Array
    mu: Any
    nu: Any


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Adam without a baked-in learning rate; lr is applied in the step."""
    return optax.scale_by_adam(b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                               eps=tcfg.adam_eps)


def _zero_pad_len(size: int, n_dev: int) -> int:
    return n_dev * (-(-size // n_dev))


def create_train_state(model: YoloV3, tcfg: TrainConfig, rng: jax.Array,
                       sample_batch_shape: Sequence[int],
                       mesh: Optional[Mesh] = None) -> TrainState:
    """Fresh train state. With `mesh` given and `tcfg.shard_optimizer`,
    the Adam moments are ZeRO-1 sharded over the mesh's data axis (the
    state is then tied to that chip count — resume on the same topology);
    otherwise the optax state is replicated like the reference's."""
    variables = model.init(rng, jnp.zeros(sample_batch_shape, jnp.float32),
                           train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    # static-QAT scale collection (ModelConfig.int8_train_static); seeded
    # to ones — the trainer calibrates real values before the first step
    quant_scales = variables.get("quant_scales")
    if mesh is not None and tcfg.shard_optimizer:
        n_dev = mesh.size

        def flat_zeros(p):
            return jnp.zeros((_zero_pad_len(p.size, n_dev),), jnp.float32)

        opt_state = ZeroAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(flat_zeros, params),
            nu=jax.tree_util.tree_map(flat_zeros, params))
    else:
        opt_state = make_optimizer(tcfg).init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      quant_scales=quant_scales)


def _loss_and_metrics(model: YoloV3, cfg: ModelConfig, tcfg: TrainConfig,
                      global_batch_size: int, params, batch_stats,
                      images: Array, labels: Sequence[Array], train: bool,
                      quant_scales=None):
    variables = {"params": params, "batch_stats": batch_stats}
    if quant_scales is not None:
        variables["quant_scales"] = quant_scales
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
    globally sharded along the mesh's data axis and `state` is replicated —
    except the ZeRO-1 Adam moments (`tcfg.shard_optimizer`), which stay
    sharded along the data axis (see `ZeroAdamState`).
    """
    optimizer = make_optimizer(tcfg)
    zero = tcfg.shard_optimizer
    n_dev = mesh.size

    def per_replica_step(state: TrainState, batch: Batch, lr: Array):
        images, l32, l16, l8 = batch
        grad_fn = jax.value_and_grad(
            functools.partial(_loss_and_metrics, model, cfg, tcfg,
                              global_batch_size),
            has_aux=True)
        (loss, (yolo_loss, new_batch_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, (l32, l16, l8),
            train=True, quant_scales=state.quant_scales)

        # cross-replica reductions over ICI
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss_sum = jax.lax.psum(loss, DATA_AXIS)
        # BN moving statistics: replicas average their local updates so the
        # state stays replicated (MirroredStrategy's mean aggregation)
        new_batch_stats = jax.lax.pmean(new_batch_stats, DATA_AXIS)

        if zero:
            # ZeRO-1: each replica updates its 1/n flat slice of Adam
            # m/v and the params (exact optax.scale_by_adam arithmetic on
            # the slice), then the updated params all_gather over ICI.
            # psum'd grads are replica-identical, so the reassembled
            # params match the replicated optimizer bit-for-bit.
            rank = jax.lax.axis_index(DATA_AXIS)
            t = (state.opt_state.count + 1).astype(jnp.float32)
            c1 = 1.0 - tcfg.adam_b1 ** t
            c2 = 1.0 - tcfg.adam_b2 ** t

            def upd(p, g, m, v):
                k = m.shape[0]  # local shard length (padded_size / n_dev)
                pad = k * n_dev - p.size
                gf = jnp.pad(g.reshape(-1).astype(jnp.float32), (0, pad))
                pf = jnp.pad(p.reshape(-1).astype(jnp.float32), (0, pad))
                gs = jax.lax.dynamic_slice(gf, (rank * k,), (k,))
                ps = jax.lax.dynamic_slice(pf, (rank * k,), (k,))
                m2 = tcfg.adam_b1 * m + (1.0 - tcfg.adam_b1) * gs
                v2 = tcfg.adam_b2 * v + (1.0 - tcfg.adam_b2) * (gs * gs)
                u = (m2 / c1) / (jnp.sqrt(v2 / c2) + tcfg.adam_eps)
                ps = ps - lr * u
                pn = jax.lax.all_gather(ps, DATA_AXIS, tiled=True)
                return (pn[:p.size].reshape(p.shape).astype(p.dtype),
                        m2, v2)

            out = jax.tree_util.tree_map(upd, state.params, grads,
                                         state.opt_state.mu,
                                         state.opt_state.nu)
            pick = lambda i: jax.tree_util.tree_map(
                lambda o: o[i], out,
                is_leaf=lambda x: isinstance(x, tuple))
            new_params = pick(0)
            new_opt_state = ZeroAdamState(
                count=state.opt_state.count + 1, mu=pick(1), nu=pick(2))
        else:
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params)
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
                               opt_state=new_opt_state,
                               quant_scales=state.quant_scales)
        return new_state, metrics

    state_spec = _state_spec(zero)
    batch_spec = (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
    sharded = shard_map(per_replica_step, mesh=mesh,
                        in_specs=(state_spec, batch_spec, P()),
                        out_specs=(state_spec, P()),
                        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def _state_spec(zero: bool):
    """shard_map partition-spec prefix tree for a TrainState: everything
    replicated except the ZeRO-1 Adam moments (data-axis sharded)."""
    if not zero:
        return P()
    return TrainState(
        step=P(), params=P(), batch_stats=P(),
        opt_state=ZeroAdamState(count=P(), mu=P(DATA_AXIS),
                                nu=P(DATA_AXIS)),
        quant_scales=P())


def place_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host-built TrainState onto the mesh: replicated everywhere
    except ZeRO-1 `mu`/`nu`, which shard along the data axis (the global
    flat leaves are padded to a multiple of mesh.size by construction)."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    if not isinstance(state.opt_state, ZeroAdamState):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state)
    shd = NamedSharding(mesh, P(DATA_AXIS))
    put = lambda s: (lambda x: jax.device_put(x, s))
    opt = ZeroAdamState(
        count=jax.device_put(state.opt_state.count, rep),
        mu=jax.tree_util.tree_map(put(shd), state.opt_state.mu),
        nu=jax.tree_util.tree_map(put(shd), state.opt_state.nu))
    return TrainState(
        step=jax.device_put(state.step, rep),
        params=jax.tree_util.tree_map(put(rep), state.params),
        batch_stats=jax.tree_util.tree_map(put(rep), state.batch_stats),
        opt_state=opt,
        quant_scales=jax.tree_util.tree_map(put(rep), state.quant_scales))


def make_eval_step(model: YoloV3, cfg: ModelConfig, tcfg: TrainConfig,
                   mesh: Mesh, global_batch_size: int,
                   ) -> Callable[[TrainState, Batch], Dict[str, Array]]:
    """Jitted multi-chip test step (reference/model.py:517-540)."""

    def per_replica_step(state: TrainState, batch: Batch):
        images, l32, l16, l8 = batch
        loss, (yolo_loss, _) = _loss_and_metrics(
            model, cfg, tcfg, global_batch_size, state.params,
            state.batch_stats, images, (l32, l16, l8), train=False,
            quant_scales=state.quant_scales)
        return {
            "loss": jax.lax.pmean(loss, DATA_AXIS),
            "loss_sum": jax.lax.psum(loss, DATA_AXIS),
            "loss_xy": jax.lax.pmean(yolo_loss.xy, DATA_AXIS),
            "loss_wh": jax.lax.pmean(yolo_loss.wh, DATA_AXIS),
            "loss_obj": jax.lax.pmean(yolo_loss.objectness, DATA_AXIS),
            "loss_class": jax.lax.pmean(yolo_loss.class_, DATA_AXIS),
        }

    batch_spec = (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
    # zero-aware state spec so a ZeRO-1 opt_state is NOT all-gathered onto
    # every chip just to be ignored by the eval step
    sharded = shard_map(per_replica_step, mesh=mesh,
                        in_specs=(_state_spec(tcfg.shard_optimizer),
                                  batch_spec),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)
