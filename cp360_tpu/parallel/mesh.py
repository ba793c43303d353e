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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed(log_fn=print) -> bool:
    """Env-gated multi-host (multi-process) initialization.

    Set ``CP360_DIST=1`` plus coordination env vars
    (``CP360_COORDINATOR`` host:port, ``CP360_NUM_PROCESSES``,
    ``CP360_PROCESS_ID`` — or run under a launcher whose cluster JAX
    auto-detects: SLURM, GKE, Cloud TPU pods) and every CLI joins the
    global runtime before building its mesh: ``jax.devices()`` then spans
    all hosts, so the same ``mesh_data``/``mesh_model`` config drives
    DCN-spanning meshes with no further code.  Unset (the default), this is
    a no-op and everything stays single-process.

    Called once per process; subsequent calls are no-ops.
    """
    if os.environ.get("CP360_DIST", "").lower() not in ("1", "true"):
        return False
    if getattr(maybe_init_distributed, "_done", False):
        return True
    try:
        # Cross-process collectives on the CPU backend need gloo (TPU/GPU
        # transports are XLA's own); this config is CPU-only so it is a
        # no-op for real-chip runs.
        if "cpu" in str(jax.config.jax_platforms or ""):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    coord = os.environ.get("CP360_COORDINATOR")
    nproc = os.environ.get("CP360_NUM_PROCESSES")
    pid = os.environ.get("CP360_PROCESS_ID")
    if coord or nproc or pid:  # explicit rendezvous; else launcher auto-detect
        if not (coord and nproc and pid is not None):
            raise SystemExit(
                "CP360_DIST explicit rendezvous needs ALL of CP360_COORDINATOR, "
                "CP360_NUM_PROCESSES and CP360_PROCESS_ID (or none, to use a "
                "launcher JAX auto-detects)")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    else:
        jax.distributed.initialize()
    maybe_init_distributed._done = True
    log_fn(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.devices())} global devices"
    )
    return True


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


def stripe_jobs(jobs):
    """Round-robin a list of independent jobs (videos) across processes.

    Single-process: the list unchanged.  Multi-process: each host takes
    every ``process_count``-th job starting at its own index — the
    embarrassingly-parallel scale-out for per-video pipelines, where a
    process-spanning mesh would be the wrong shape (every host decoding
    every frame and fetching shards it cannot address).
    """
    if jax.process_count() <= 1:
        return list(jobs)
    return list(jobs)[jax.process_index()::jax.process_count()]


def local_data_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Shrink a (possibly process-spanning) mesh to THIS host's devices,
    data-axis only — the mesh striped per-video jobs compute on.

    Returns None when a single local device is left (callers keep the
    unsharded fast path).  Single-process input meshes pass through.
    """
    if mesh is None or jax.process_count() <= 1:
        return mesh
    local = jax.local_devices()
    n_data = min(mesh.shape.get(DATA_AXIS, 1), len(local))
    if n_data <= 1:
        return None
    return make_mesh(n_data=n_data, n_model=1, devices=local)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs: [B, ...] split along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def clstm_param_sharding(mesh: Mesh, params: dict) -> dict:
    """Tensor-parallel layout for ConvLSTM params.

    Output channels (and biases) of every conv shard along ``model``;
    input dims stay REPLICATED, so GSPMD all-gathers the channel-sharded
    activations in front of each consuming conv.  Simple and exact; at
    the production 7×7 face geometry the gathered activations are tiny
    next to the conv FLOPs, which is where the sharding earns its memory
    and compute split.
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
    """Device-put a host batch with the leading dim split along data.

    ``tree`` is always the FULL GLOBAL batch — same contract single- or
    multi-process, so production callers (train loop, pipelines) need no
    process awareness.  Multi-process (after
    :func:`maybe_init_distributed`): every process passes the identical
    global batch; each keeps only the rows that land on its own devices
    (derived from the sharding's addressable indices — correct for any
    mesh layout, including a replicated batch axis) and the processes
    jointly assemble the global array.  Loaders that CAN feed per-host
    should slice per process and call :func:`shard_batch_per_host`
    directly instead.
    """
    n_data = mesh.shape.get(DATA_AXIS, 1)
    for leaf in jax.tree.leaves(tree):
        if leaf.shape[0] % n_data:
            raise ValueError(
                f"batch dim {leaf.shape[0]} not divisible by the mesh data "
                f"axis ({n_data} devices); pick batch_size as a multiple of "
                f"mesh_data"
            )
    if jax.process_count() > 1:
        def local_rows(leaf):
            leaf = np.asarray(leaf)
            return leaf[local_rows_slice(mesh, leaf.shape[0])]

        return shard_batch_per_host(mesh, jax.tree.map(local_rows, tree))
    return jax.device_put(tree, data_sharding(mesh))


def local_rows_slice(mesh: Mesh, n_rows: int) -> slice:
    """The contiguous [lo, hi) span of a global batch of ``n_rows`` that
    lands on THIS process's devices (derived from the sharding's
    addressable indices — correct for any mesh layout, including a
    replicated batch axis).

    This is what lets a loader read only its own rows from disk
    (``PrefetchLoader(rows=...)``) and feed :func:`shard_batch_per_host`.
    """
    sh = data_sharding(mesh)
    idx_map = sh.addressable_devices_indices_map((n_rows,))
    spans = sorted(
        {(sl[0].start or 0, n_rows if sl[0].stop is None else sl[0].stop)
         for sl in idx_map.values()}
    )
    lo, hi = spans[0][0], spans[-1][1]
    covered = all(a <= b_ for (_, b_), (a, _) in zip(spans, spans[1:]))
    if not covered:
        raise ValueError(
            f"this host's batch rows are not contiguous ({spans}); "
            f"feed per-host via shard_batch_per_host"
        )
    return slice(lo, hi)


def shard_batch_per_host(mesh: Mesh, tree):
    """Assemble a global data-sharded batch from per-process local rows.

    Every process contributes the contiguous slice of the global batch that
    lands on its own devices (mesh rows are laid out in device-id order, so
    process p's slice is rows ``[p * local, (p + 1) * local)``).

    CONTRACT WARNING: do not pass per-host rows to :func:`shard_batch` —
    it expects the FULL global batch on every process and would silently
    slice your local rows again whenever their count happens to divide the
    mesh data axis.  Per-host loaders call THIS function.
    """
    sh = data_sharding(mesh)

    def put(leaf):
        return jax.make_array_from_process_local_data(sh, np.asarray(leaf))

    return jax.tree.map(put, tree)


def device_put_global(tree, shardings):
    """``jax.device_put`` that also works when shardings span processes.

    Multi-process: every process must pass identical host values (e.g. the
    same-seed init or a checkpoint read by all hosts); each process creates
    only its addressable shards via ``make_array_from_callback``.
    Single-process it is exactly ``jax.device_put``.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)
