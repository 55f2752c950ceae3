"""Tests for metrics, logging, and checkpoint utilities."""

import os

import jax
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig, TrainConfig
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.parallel import TrainState, create_train_state
from yolov3_tpu.utils import checkpoint as ckpt
from yolov3_tpu.utils.metrics import (
    MeanMetric,
    MetricSet,
    SummaryLogger,
    write_loss_csv,
)


class TestMeanMetric:
    def test_mean_and_reset(self):
        m = MeanMetric("x")
        m.update(1.0)
        m.update(3.0)
        assert m.result() == pytest.approx(2.0)
        m.reset()
        assert m.result() == 0.0

    def test_metric_set(self):
        s = MetricSet("train")
        s.update({"loss": 2.0, "loss_xy": 0.5, "loss_wh": 0.5,
                  "loss_obj": 0.5, "loss_class": 0.5})
        s.update({"loss": 4.0, "loss_xy": 1.5, "loss_wh": 0.5,
                  "loss_obj": 0.5, "loss_class": 0.5})
        r = s.results()
        assert r["loss"] == pytest.approx(3.0)
        assert r["loss_xy"] == pytest.approx(1.0)


class TestSummaryLogger:
    def test_writes_events_and_csv(self, tmp_path):
        d = str(tmp_path / "tb")
        logger = SummaryLogger(d)
        logger.scalar("loss", 1.5, step=0)
        logger.scalars({"loss": 1.2, "loss_xy": 0.1}, step=1)
        logger.close()
        files = os.listdir(d)
        assert "scalars.csv" in files
        # tensorboardX event file present
        assert any(f.startswith("events.out.tfevents") for f in files)
        with open(os.path.join(d, "scalars.csv")) as fh:
            lines = fh.read().strip().splitlines()
        assert len(lines) == 3

    def test_loss_csv(self, tmp_path):
        p = str(tmp_path / "test_loss.csv")
        write_loss_csv(p, [1.5, 1.2, 1.0])
        with open(p) as fh:
            assert [float(x) for x in fh] == [1.5, 1.2, 1.0]
        # rewritten, not appended
        write_loss_csv(p, [0.9])
        with open(p) as fh:
            assert [float(x) for x in fh] == [0.9]


class TestCheckpoint:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = ModelConfig(img_size=(64, 64, 1), number_classes=1,
                          anchors=((16, 16),), block_count=1, filter_count=32,
                          compute_dtype="float32")
        model = YoloV3(cfg)
        state = create_train_state(model, TrainConfig(), jax.random.PRNGKey(0),
                                   (1, 64, 64, 1))
        return cfg, model, state

    def test_checkpoint_roundtrip(self, tiny, tmp_path):
        cfg, model, state = tiny
        out = str(tmp_path / "out")
        os.makedirs(out)
        ckpt.save_checkpoint(out, state)
        restored = ckpt.restore_checkpoint(out, state)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_checkpoint_overwrites(self, tiny, tmp_path):
        cfg, model, state = tiny
        out = str(tmp_path / "out")
        os.makedirs(out)
        ckpt.save_checkpoint(out, state)
        state2 = TrainState(step=state.step + 5, params=state.params,
                            batch_stats=state.batch_stats,
                            opt_state=state.opt_state)
        ckpt.save_checkpoint(out, state2)
        restored = ckpt.restore_checkpoint(out, state)
        assert int(restored.step) == 5

    def test_export_excludes_optimizer(self, tiny, tmp_path):
        cfg, model, state = tiny
        out = str(tmp_path / "out")
        os.makedirs(out)
        path = ckpt.export_model(out, state.params, state.batch_stats, cfg)
        params, batch_stats, cfg2 = ckpt.load_model(path)
        assert cfg2 == cfg
        assert set(os.listdir(path)) == {"model_config.json", "state"}
