"""GPipe-style temporal pipelining of the ConvLSTM over a mesh axis.

The reference has no parallelism at all (SURVEY §2 checklist); window-based
inference/training parallelize trivially over the data axis because windows
are independent.  The one genuinely *sequential* workload is the streaming
path (pipelines/stream.py, serving sessions): a single recurrence carrying
(h, c) across a whole video.  A recurrence cannot be split over time without
changing semantics — but P devices CAN pipeline microbatches of streams:
device p holds time chunk p of the rollout and microbatch m enters the pipe
one tick after m-1, states flowing p -> p+1 via ``lax.ppermute`` over ICI.
Steady-state throughput approaches P× one device; the fill/drain bubble is
(P-1)/(n_micro + P - 1) of the ticks.

This is the honest pp/sp story for a ConvLSTM (there is no attention in
this model family, so ring-attention/Ulysses have no referent — SURVEY §2):
pipeline parallelism over the time axis, sequence-sharded input, exact-equal
to the serial scan (same op order per chunk, same state chain).

Exercised by tests/test_pipeline_parallel.py on the virtual CPU mesh and by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cp360_tpu.models.clstm import clstm_step

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_pipe: Optional[int] = None) -> Mesh:
    """A 1-D pipeline mesh over the available devices."""
    devs = jax.devices()
    n_pipe = n_pipe or len(devs)
    if n_pipe > len(devs):
        # fail here, not downstream: silently truncating would run serial
        # (1 device) while the user believes the job is pipelined, or die
        # later with a misleading T-divisibility error
        raise ValueError(
            f"pipeline_stages={n_pipe} but only {len(devs)} device(s) are "
            f"available on this host/runtime"
        )
    return Mesh(devs[:n_pipe], (PIPE_AXIS,))


def pipelined_rollout(
    params: dict,
    seq: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    mesh: Mesh,
    n_micro: int,
    use_cube_pad: bool = True,
    compute_dtype=jnp.float32,
    conv_impl: str = "xla",
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Roll the ConvLSTM over ``seq``, time axis pipelined over the mesh's
    ``pipe`` axis, batch split into ``n_micro`` microbatches.

    Args:
      seq: [T, B, h, w, C] face-flattened batch (B = windows*6), axis 0 time.
        T must divide by the pipe-axis size, B by n_micro.
      h0, c0: [B, h, w, Ch] initial state (the window protocol seeds these
        with the first normalized frame).

    Returns (hiddens_last_chunk [T/P, B, ...], h_final, c_final), all
    replicated.  ``hiddens_last_chunk`` matches
    ``clstm_rollout(...)[0][-T/P:]`` exactly — the training losses consume
    the trailing K+1 = 4 steps, so any T/P >= 4 serves them.
    """
    n_pipe = mesh.shape[PIPE_AXIS]
    t, b = seq.shape[0], seq.shape[1]
    if t % n_pipe:
        raise ValueError(f"T={t} must divide over {n_pipe} pipe devices")
    if b % n_micro:
        raise ValueError(f"B={b} must divide into {n_micro} microbatches")
    if (b // n_micro) % 6:
        raise ValueError(
            f"microbatch size {b // n_micro} must be a multiple of 6 "
            f"(face-flattened batch; cube padding regroups faces)")
    fn = _pipelined_fn(mesh, n_micro, use_cube_pad, compute_dtype, conv_impl,
                       remat)
    return fn(params, seq, h0, c0)


@lru_cache(maxsize=16)
def _pipelined_fn(mesh: Mesh, n_micro: int, use_cube_pad: bool,
                  compute_dtype, conv_impl: str, remat: bool = False):
    """Cached jitted shard_map for :func:`pipelined_rollout`.

    Building a fresh jit per call would retrace + recompile on EVERY batch
    (a product surface like streaming with pipeline_stages pays 0.5-4 min
    per compile on this toolchain); all shape-dependent constants are
    derived at trace time from the operand shapes, so one cache entry per
    (mesh, n_micro, flags) serves every geometry, and jit's own cache
    handles shape changes.
    """
    n_pipe = mesh.shape[PIPE_AXIS]
    perm = [(i, i + 1) for i in range(n_pipe - 1)]

    def local(prm, seq_local, h0_, c0_):
        t_local, b = seq_local.shape[0], seq_local.shape[1]
        tc = t_local  # shard_map splits the time axis: T/n_pipe per device
        bm = b // n_micro
        ch = prm["gates"]["b"].shape[0] // 4
        n_ticks = n_micro + n_pipe - 1
        p = jax.lax.axis_index(PIPE_AXIS)

        def run_chunk(x_chunk, state):
            def step(carry, x):
                h, c = clstm_step(prm, x, carry, use_cube_pad,
                                  compute_dtype, conv_impl)
                return (h, c), h

            if remat:  # same per-step checkpoint as clstm_rollout's remat
                step = jax.checkpoint(step)
            (h, c), hs = jax.lax.scan(step, state, x_chunk)
            return hs, h, c

        state_shape = (bm,) + h0_.shape[1:-1] + (ch,)
        out_h = jnp.zeros((tc, b) + state_shape[1:], seq_local.dtype)
        out_hf = jnp.zeros((b,) + state_shape[1:], seq_local.dtype)
        out_cf = jnp.zeros_like(out_hf)

        def tick(k, carry):
            (h_pipe, c_pipe), bufs = carry
            out_h, out_hf, out_cf = bufs
            m = k - p  # microbatch entering this device at this tick
            m_c = jnp.clip(m, 0, n_micro - 1)
            x_m = jax.lax.dynamic_slice_in_dim(seq_local, m_c * bm, bm, axis=1)
            h_seed = jax.lax.dynamic_slice_in_dim(h0_, m_c * bm, bm, axis=0)
            c_seed = jax.lax.dynamic_slice_in_dim(c0_, m_c * bm, bm, axis=0)
            h_in = jnp.where(p == 0, h_seed, h_pipe)
            c_in = jnp.where(p == 0, c_seed, c_pipe)

            hs, h_out, c_out = run_chunk(x_m, (h_in, c_in))

            vf = ((m >= 0) & (m < n_micro)).astype(hs.dtype)

            def put(buf, val, axis):
                old = jax.lax.dynamic_slice_in_dim(buf, m_c * bm, bm, axis=axis)
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, (val * vf + old * (1 - vf)).astype(buf.dtype),
                    m_c * bm, axis=axis)

            out_h = put(out_h, hs, axis=1)
            out_hf = put(out_hf, h_out, axis=0)
            out_cf = put(out_cf, c_out, axis=0)

            # hand the produced state down the pipe (p -> p+1); stale edge
            # content is masked at consumption time
            h_nxt = jax.lax.ppermute(h_out, PIPE_AXIS, perm)
            c_nxt = jax.lax.ppermute(c_out, PIPE_AXIS, perm)
            return (h_nxt, c_nxt), (out_h, out_hf, out_cf)

        z = jnp.zeros(state_shape, seq_local.dtype)
        # the tick body mixes in axis_index, so every carry leaf is
        # pipe-varying; mark the (replicated) zero initializers to match
        init = jax.lax.pcast(((z, z), (out_h, out_hf, out_cf)), (PIPE_AXIS,),
                             to="varying")
        _, (out_h, out_hf, out_cf) = jax.lax.fori_loop(0, n_ticks, tick, init)

        # only the LAST pipe device holds the real trailing chunk/state
        is_last = (p == n_pipe - 1).astype(out_h.dtype)
        hiddens = jax.lax.psum(out_h * is_last, PIPE_AXIS)
        h_f = jax.lax.psum(out_hf * is_last, PIPE_AXIS)
        c_f = jax.lax.psum(out_cf * is_last, PIPE_AXIS)
        return hiddens, h_f, c_f

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(PIPE_AXIS), P(), P()),
            out_specs=(P(), P(), P()),
        )
    )
