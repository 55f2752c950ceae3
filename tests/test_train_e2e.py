"""End-to-end training slice: toy DB -> train loop -> checkpoint -> export.

Proves schema -> data -> model -> loss -> checkpoint -> inference artifact
with all the moving parts together (SURVEY.md §7 step 5/7).
"""

import os

import numpy as np
import pytest

from yolov3_tpu.train import train_model
from yolov3_tpu.utils import checkpoint as ckpt

from tests.test_reader import build_toy_db

ANCHORS = ((16, 16), (32, 32))


@pytest.mark.slow
def test_train_end_to_end(tmp_path, rng):
    build_toy_db(tmp_path / "train.ydb", rng, n=8)
    build_toy_db(tmp_path / "test.ydb", rng, n=4)
    out = str(tmp_path / "out")

    export_path = train_model(
        batch_size=1,
        test_every_n_steps=3,
        train_database_filepath=str(tmp_path / "train.ydb"),
        test_database_filepath=str(tmp_path / "test.ydb"),
        output_folder=out,
        early_stopping_count=1,
        learning_rate=1e-4,
        use_augmentation=True,
        anchors=ANCHORS,
        num_devices=2,
        max_epochs=2,
        compute_dtype="float32",
        model_overrides=dict(block_count=1, filter_count=32),
    )

    # artifacts of the loop
    assert os.path.exists(os.path.join(out, "test_loss.csv"))
    with open(os.path.join(out, "test_loss.csv")) as fh:
        losses = [float(line) for line in fh if line.strip()]
    assert 1 <= len(losses) <= 2
    assert all(np.isfinite(losses))
    tb_dirs = [d for d in os.listdir(out) if d.startswith("tensorboard-")]
    assert len(tb_dirs) == 1
    assert os.path.exists(os.path.join(out, "checkpoint"))

    # exported inference artifact loads and matches config
    assert export_path is not None
    params, batch_stats, cfg = ckpt.load_model(export_path)
    assert cfg.number_classes == 2
    assert tuple(cfg.img_size) == (64, 64, 1)
    assert cfg.anchors == ANCHORS
    assert params is not None and batch_stats is not None


@pytest.mark.slow
def test_train_end_to_end_device_augment(tmp_path, rng):
    """Same e2e slice with the jit (on-device) preprocessing pipeline."""
    build_toy_db(tmp_path / "train.ydb", rng, n=6)
    build_toy_db(tmp_path / "test.ydb", rng, n=3)
    out = str(tmp_path / "out_dev")

    export_path = train_model(
        batch_size=1,
        test_every_n_steps=2,
        train_database_filepath=str(tmp_path / "train.ydb"),
        test_database_filepath=str(tmp_path / "test.ydb"),
        output_folder=out,
        early_stopping_count=1,
        learning_rate=1e-4,
        use_augmentation=True,
        anchors=ANCHORS,
        num_devices=2,
        max_epochs=1,
        compute_dtype="float32",
        model_overrides=dict(block_count=1, filter_count=32),
        device_augment=True,
    )
    with open(os.path.join(out, "test_loss.csv")) as fh:
        losses = [float(line) for line in fh if line.strip()]
    assert losses and all(np.isfinite(losses))
    assert export_path is not None


@pytest.mark.slow
def test_train_resume(tmp_path, rng):
    """Resume restores the checkpointed step and loss history."""
    build_toy_db(tmp_path / "train.ydb", rng, n=4)
    build_toy_db(tmp_path / "test.ydb", rng, n=2)
    out = str(tmp_path / "out_resume")
    common = dict(
        batch_size=1, test_every_n_steps=2,
        train_database_filepath=str(tmp_path / "train.ydb"),
        test_database_filepath=str(tmp_path / "test.ydb"),
        output_folder=out, early_stopping_count=5, learning_rate=1e-4,
        use_augmentation=False, anchors=ANCHORS, num_devices=2,
        compute_dtype="float32",
        model_overrides=dict(block_count=1, filter_count=32))

    train_model(max_epochs=1, **common)
    with open(os.path.join(out, "test_loss.csv")) as fh:
        first = [float(x) for x in fh if x.strip()]
    assert len(first) == 1

    train_model(max_epochs=2, resume=True, **common)
    with open(os.path.join(out, "test_loss.csv")) as fh:
        second = [float(x) for x in fh if x.strip()]
    # resumed run keeps the first epoch's loss and appends new epochs
    assert len(second) == 2
    assert second[0] == pytest.approx(first[0])
