"""Training-state checkpoint backends: portable .npz and orbax.

The reference only ever saves model weights with torch.save
(temporal_model/train_temporal.py:182-185); resume support is dead code
there (:244-249).  Here the FULL train state (params + Adam moments +
counters) checkpoints through one of two backends, selected by the
``checkpoint_backend`` config key:

- ``npz`` (default): flat .npz tree — portable, greppable, convertible
  to/from the released .pth weights (cp360_tpu.compat).  Synchronous.
- ``orbax``: the TPU-native story for large/sharded state —
  *async* save (the device keeps training while the previous state
  serializes) and *sharded* restore: each leaf is restored directly onto
  its target NamedSharding, so a multi-chip resume never materializes the
  full state on one host/device.

Both backends restore EXACTLY (bitwise params + optimizer moments); there
is a cross-backend resume-exactness test (tests/test_train_state.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from cp360_tpu.train.loop import load_train_state, save_train_state


class NpzCheckpointer:
    """save_train_state/load_train_state with latest-state bookkeeping."""

    name = "npz"

    def __init__(self, directory: str):
        self.directory = directory
        self.path = os.path.join(directory, "train_state_latest.npz")

    def save(self, params, opt_state, step: int, epoch: int) -> None:
        save_train_state(self.path, params, opt_state, step, epoch)

    def restore(self, params_template, opt_state_template) -> Optional[Tuple]:
        if not self.has_state():
            return None
        return load_train_state(self.path, params_template, opt_state_template)

    def has_state(self) -> bool:
        return os.path.exists(self.path)

    def wait(self) -> None:  # synchronous backend
        pass

    def close(self) -> None:
        pass


class OrbaxCheckpointer:
    """Async orbax CheckpointManager over the full train-state tree.

    Restore is *sharded*: the abstract target is built from the (possibly
    device_put) templates, so orbax loads each shard straight to its device.
    """

    name = "orbax"

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(os.path.join(directory, "orbax"))
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, params, opt_state, step: int, epoch: int) -> None:
        tree = {
            "params": params,
            "opt_state": opt_state,
            "step": np.asarray(step),
            "epoch": np.asarray(epoch),
        }
        if step in self.manager.all_steps():  # e.g. epoch end on a save_freq
            self.manager.wait_until_finished()  # boundary re-saves the step
            self.manager.delete(step)
        self.manager.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, params_template, opt_state_template) -> Optional[Tuple]:
        latest = self.manager.latest_step()
        if latest is None:
            return None

        def as_abstract(x):
            x = jax.numpy.asarray(x) if not hasattr(x, "sharding") else x
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))

        abstract = {
            "params": jax.tree.map(as_abstract, params_template),
            "opt_state": jax.tree.map(as_abstract, opt_state_template),
            "step": jax.ShapeDtypeStruct((), np.int64),
            "epoch": jax.ShapeDtypeStruct((), np.int64),
        }
        tree = self.manager.restore(latest, args=self._ocp.args.StandardRestore(abstract))
        return tree["params"], tree["opt_state"], int(tree["step"]), int(tree["epoch"])

    def has_state(self) -> bool:
        return self.manager.latest_step() is not None

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()


def make_checkpointer(backend: str, directory: str):
    if backend == "orbax":
        return OrbaxCheckpointer(directory)
    if backend == "npz":
        return NpzCheckpointer(directory)
    raise ValueError(f"unknown checkpoint_backend {backend!r} (npz | orbax)")
