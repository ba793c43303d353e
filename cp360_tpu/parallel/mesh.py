"""Device mesh + sharding helpers (jit/GSPMD-first scale-out).

The reference is strictly single-GPU (SURVEY.md §2: no torch.distributed /
NCCL / MPI anywhere).  Scale-out here is native JAX: a 2-D
``Mesh(data, model)`` over which

- frame windows / videos shard along ``data`` (they are embarrassingly
  parallel: the eval protocol normalizes each window independently,
  temporal_model/test_temporal.py:66-71),
- the ConvLSTM's 4000-channel gate convolutions shard along ``model``
  (tensor parallelism over output channels; XLA inserts the collectives).

Everything rides jit + NamedSharding (GSPMD) — no hand-written collectives
needed at this model scale; ICI transport is XLA's problem.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"only {len(devices)} available"
        )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Mesh from the ``mesh_data``/``mesh_model`` config keys.

    Returns None for the 1x1 (single-device) default so callers keep the
    unsharded fast path.
    """
    if cfg.mesh_data * cfg.mesh_model <= 1:
        return None
    return make_mesh(n_data=cfg.mesh_data, n_model=cfg.mesh_model)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs: [B, ...] split along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def clstm_param_sharding(mesh: Mesh, params: dict) -> dict:
    """Tensor-parallel layout for ConvLSTM params.

    Output channels of every conv shard along ``model``; conv2/gates input
    channels (which equal conv1's output channels) shard likewise, so the
    intermediate activations stay sharded on their channel dim and XLA
    only all-reduces where the math requires.
    """
    out = {}
    for name in params:
        out[name] = {
            # HWIO: shard the output-channel dim.
            "w": NamedSharding(mesh, P(None, None, None, MODEL_AXIS)),
            "b": NamedSharding(mesh, P(MODEL_AXIS)),
        }
    return out


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the leading dim split along data."""
    n_data = mesh.shape.get(DATA_AXIS, 1)
    for leaf in jax.tree.leaves(tree):
        if leaf.shape[0] % n_data:
            raise ValueError(
                f"batch dim {leaf.shape[0]} not divisible by the mesh data "
                f"axis ({n_data} devices); pick batch_size as a multiple of "
                f"mesh_data"
            )
    return jax.device_put(tree, data_sharding(mesh))
