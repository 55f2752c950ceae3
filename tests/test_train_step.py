"""Multi-chip train-step tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig, TrainConfig
from yolov3_tpu.data.encoder import encode_boxes
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.parallel import (
    ZeroAdamState,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    place_train_state,
    shard_batch,
    replicate_to_mesh,
)

ANCHORS = ((16, 16), (32, 32))
IMG = (64, 64, 3)
NCLS = 2


def make_cfg():
    return ModelConfig(img_size=IMG, number_classes=NCLS, anchors=ANCHORS,
                       block_count=1, filter_count=32,
                       compute_dtype="float32")


def make_batch(rng, n):
    imgs = rng.randn(n, *IMG).astype(np.float32)
    labels = encode_boxes(np.array([[8, 8, 24, 24, 0]]), IMG, ANCHORS, NCLS)
    return (imgs,
            np.stack([labels[0]] * n),
            np.stack([labels[1]] * n),
            np.stack([labels[2]] * n))


@pytest.fixture(scope="module")
def setup():
    cfg = make_cfg()
    tcfg = TrainConfig(batch_size=1)
    model = YoloV3(cfg)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    global_batch = n_dev  # 1 per device
    state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                               (1, *IMG))
    # keep the template on host so per-test replication + buffer donation
    # can't invalidate the shared fixture
    state = jax.tree_util.tree_map(np.asarray, state)
    return cfg, tcfg, model, mesh, global_batch, state


class TestTrainStep:
    def test_step_runs_and_loss_decreases(self, setup, rng):
        cfg, tcfg, model, mesh, gbs, state = setup
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(model, cfg, tcfg, mesh, gbs)
        batch = shard_batch(make_batch(rng, gbs), mesh)
        lr = jnp.float32(1e-3)

        losses = []
        for _ in range(5):
            state, metrics = step(state, batch, lr)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_metrics_keys(self, setup, rng):
        cfg, tcfg, model, mesh, gbs, state = setup
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(model, cfg, tcfg, mesh, gbs)
        batch = shard_batch(make_batch(rng, gbs), mesh)
        _, metrics = step(state, batch, jnp.float32(1e-4))
        assert set(metrics) == {"loss", "loss_sum", "loss_xy", "loss_wh",
                                "loss_obj", "loss_class"}
        total_parts = (metrics["loss_xy"] + metrics["loss_wh"]
                       + metrics["loss_obj"] + metrics["loss_class"])
        # loss_sum = psum over replicas of (per-replica total / global
        # batch); with identical per-replica batches this equals the
        # component sum. The logged "loss" is the Keras-Mean analog:
        # sum / n_replicas (ADVICE round 1).
        assert float(metrics["loss_sum"]) == pytest.approx(
            float(total_parts), rel=1e-4)
        n = len(jax.devices())
        assert float(metrics["loss"]) == pytest.approx(
            float(metrics["loss_sum"]) / n, rel=1e-5)

    def test_multichip_matches_singlechip(self, setup, rng):
        """The same global batch gives the same loss on 1 vs 8 chips
        (identical per-replica data so BN stats match too)."""
        cfg, tcfg, model, mesh8, gbs, state0 = setup
        mesh1 = make_mesh(n_devices=1)

        one = make_batch(rng, 1)
        batch8 = tuple(np.concatenate([b] * 8) for b in one)

        step8 = make_train_step(model, cfg, tcfg, mesh8, 8)
        # single chip: per-replica batch 8, global 8 -> but the reference's
        # local-batch divisor differs; emulate 8 replicas of batch 1 with
        # global 8 on one chip is not identical, so compare the eval loss
        eval8 = make_eval_step(model, cfg, tcfg, mesh8, 8)
        eval1 = make_eval_step(model, cfg, tcfg, mesh1, 8)

        s8 = replicate_to_mesh(state0, mesh8)
        s1 = replicate_to_mesh(state0, mesh1)
        m8 = eval8(s8, shard_batch(batch8, mesh8))
        m1 = eval1(s1, shard_batch(batch8, mesh1))
        # loss_sum8 = sum_r (S_r/1)/8 = S_total/8 ; loss_sum1 = (S_total/8)/8
        # -> divisors differ by the local batch (8); account for it explicitly
        assert float(m8["loss_sum"]) == pytest.approx(
            8 * float(m1["loss_sum"]), rel=1e-3)
        # the LOGGED loss (mean over replicas) is chip-count invariant:
        # training curves read the same at any scale (ADVICE round 1)
        assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-3)

    def test_eval_step_does_not_mutate(self, setup, rng):
        cfg, tcfg, model, mesh, gbs, state = setup
        state = replicate_to_mesh(state, mesh)
        evl = make_eval_step(model, cfg, tcfg, mesh, gbs)
        batch = shard_batch(make_batch(rng, gbs), mesh)
        m1 = evl(state, batch)
        m2 = evl(state, batch)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]))

    def test_zero1_matches_replicated(self, setup, rng):
        """ZeRO-1 sharded Adam (shard_optimizer=True) reproduces the
        replicated optimizer's trajectory: psum'd grads are replica-
        identical, so slicing the update across chips and all_gathering
        the params is the same arithmetic (parallel/train_step.py)."""
        cfg, tcfg, model, mesh, gbs, state0 = setup
        tcfg_z = TrainConfig(batch_size=1, shard_optimizer=True)
        batch = shard_batch(make_batch(rng, gbs), mesh)
        lr = jnp.float32(1e-3)

        step_r = make_train_step(model, cfg, tcfg, mesh, gbs)
        state_r = replicate_to_mesh(state0, mesh)

        # same seed -> identical init params; only the opt_state differs
        state_z = create_train_state(model, tcfg_z, jax.random.PRNGKey(0),
                                     (1, *IMG), mesh=mesh)
        assert isinstance(state_z.opt_state, ZeroAdamState)
        # head biases have size A*(5+C)=14, not a multiple of 8 devices:
        # the flat-pad + slice path is genuinely exercised
        sizes = {p.size for p in jax.tree_util.tree_leaves(state0.params)}
        assert any(s % len(jax.devices()) for s in sizes)
        state_z = place_train_state(state_z, mesh)
        step_z = make_train_step(model, cfg, tcfg_z, mesh, gbs)

        for _ in range(3):
            state_r, mr = step_r(state_r, batch, lr)
            state_z, mz = step_z(state_z, batch, lr)

        assert float(mr["loss"]) == pytest.approx(float(mz["loss"]),
                                                  rel=1e-5)
        pr = jax.device_get(state_r.params)
        pz = jax.device_get(state_z.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                    atol=1e-7), pr, pz)

    def test_zero1_eval_step_accepts_sharded_state(self, setup, rng):
        cfg, _, model, mesh, gbs, _ = setup
        tcfg_z = TrainConfig(batch_size=1, shard_optimizer=True)
        state = place_train_state(
            create_train_state(model, tcfg_z, jax.random.PRNGKey(0),
                               (1, *IMG), mesh=mesh), mesh)
        evl = make_eval_step(model, cfg, tcfg_z, mesh, gbs)
        m = evl(state, shard_batch(make_batch(rng, gbs), mesh))
        assert np.isfinite(float(m["loss"]))

    def test_lr_is_traced_not_compiled(self, setup, rng):
        """Changing lr must not retrigger compilation (warmup parity)."""
        cfg, tcfg, model, mesh, gbs, state = setup
        state = replicate_to_mesh(state, mesh)
        step = make_train_step(model, cfg, tcfg, mesh, gbs)
        batch = shard_batch(make_batch(rng, gbs), mesh)
        state, _ = step(state, batch, jnp.float32(1e-4))
        with jax.checking_leaks():
            state, _ = step(state, batch, jnp.float32(1e-5))
        assert int(state.step) == 2
