"""Device mesh construction and host->device batch sharding.

This is the TPU-native replacement for the reference's
`tf.distribute.MirroredStrategy` plumbing (reference/train.py:38-66): a 1-D
`jax.sharding.Mesh` over the chips of a slice, with the global batch laid
out along the `data` axis. Gradient reduction rides ICI via `lax.psum`
inside the shard_map'd train step (see `train_step.py`), replacing NCCL
all-reduce.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Tuple[np.ndarray, ...], mesh: Mesh):
    """Place a host global batch onto the mesh, split along the data axis.

    The host->device handoff replacing the reference's
    `experimental_distribute_dataset` (reference/train.py:62,66).
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) onto every mesh device."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
