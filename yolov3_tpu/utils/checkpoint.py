"""Checkpointing and inference-artifact export (Orbax).

Plays the role of `tf.train.Checkpoint` + SavedModel in the reference
(reference/train.py:72,178-182,208-221):

- `save_checkpoint` / `restore_checkpoint`: the full TrainState
  (params + BN stats + optimizer state + step), overwritten in place at
  `<output>/checkpoint` — the reference's best-only single-path policy.
- `export_model` / `load_model`: the deployment artifact consumed by the
  inference CLIs — params + BN stats + the ModelConfig JSON, written to
  `<output>/saved_model`. No optimizer state, mirroring SavedModel's role
  as the interchange format (reference/inference.py:35).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from yolov3_tpu.config import ModelConfig

CHECKPOINT_DIR = "checkpoint"
EXPORT_DIR = "saved_model"
CONFIG_FILE = "model_config.json"
STATE_DIR = "state"


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(output_folder: str, state) -> str:
    """Overwrite `<output>/checkpoint` with the TrainState (best-only policy:
    the caller decides WHEN; reference/train.py:178-182)."""
    path = os.path.abspath(os.path.join(output_folder, CHECKPOINT_DIR))
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_host(state))
    return path


def restore_checkpoint(output_folder: str, template) -> Any:
    """Restore a TrainState saved by `save_checkpoint` into `template`'s
    structure (reference/train.py:220 expect_partial analog)."""
    path = os.path.abspath(os.path.join(output_folder, CHECKPOINT_DIR))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=_to_host(template))


def export_model(output_folder: str, params, batch_stats,
                 config: ModelConfig) -> str:
    """Write the inference artifact (reference/train.py:208-221).

    Training-only QAT flags are stripped from the saved config: they
    select the TRAINING forward (and `int8_train_static` additionally
    declares a `quant_scales` flax collection the inference artifact
    does not carry — applying such a config at inference raises
    ScopeCollectionNotFound). Serving quantization is post-training
    (`models/quantized.py` recalibrates its own scales), so the
    deployment artifact is always a plain bf16/f32 model."""
    import dataclasses
    config = dataclasses.replace(config, int8_train=False,
                                 int8_train_static=False)
    path = os.path.abspath(os.path.join(output_folder, EXPORT_DIR))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)
    with open(os.path.join(path, CONFIG_FILE), "w") as fh:
        fh.write(config.to_json())
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, STATE_DIR),
                   {"params": _to_host(params),
                    "batch_stats": _to_host(batch_stats)})
    return path


def load_model(saved_model_path: str) -> Tuple[Any, Any, ModelConfig]:
    """Load (params, batch_stats, config) from an exported artifact."""
    saved_model_path = os.path.abspath(saved_model_path)
    cfg_path = os.path.join(saved_model_path, CONFIG_FILE)
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(f"Not an exported model: {saved_model_path}")
    with open(cfg_path) as fh:
        config = ModelConfig.from_json(fh.read())
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(saved_model_path, STATE_DIR))
    return state["params"], state["batch_stats"], config
