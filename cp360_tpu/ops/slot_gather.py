"""Slot-gather resampler executors (JAX + Pallas TPU).

See ops/gather_plan.py for the 3-phase design and the measured Mosaic
gather envelope that shapes it.  This module holds:

- :func:`apply_plan_jax` — the XLA-level executor (any backend; the
  correctness oracle and CPU path),
- :func:`apply_plan_pallas` — the TPU kernel pipeline built strictly from
  envelope-legal gathers (lane gathers at width 128, sublane gathers at
  height 8), masked selects, and static planning tables.

Both are exact (same f32 tap math) vs ops/resample.py::equi_to_cube.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from cp360_tpu.ops.gather_plan import GatherPlan, build_plan  # noqa: F401 (re-export)


def apply_plan_jax(plan: GatherPlan, src: jax.Array) -> jax.Array:
    """Execute the plan with vanilla XLA gathers.

    Args:
      src: [B, src_h, src_w] channel planes (f32).

    Returns [B, out_rows, out_cols] f32.
    """
    b = src.shape[0]
    a1 = jnp.asarray(plan.a1, jnp.int32)
    g = jnp.take_along_axis(
        src, jnp.broadcast_to(a1[None], (b, plan.src_h, plan.k_slots)), axis=2
    )  # [B, H, K]

    s3 = jnp.asarray(plan.s3, jnp.int32)
    l3 = jnp.asarray(plan.l3.astype(np.int32))
    w3 = jnp.asarray(plan.w3, jnp.float32)
    taps = jnp.zeros((b, plan.out_rows, plan.s3.shape[1]), src.dtype)
    for lyr in range(plan.n_layers):
        y2 = jnp.asarray(plan.y2[lyr], jnp.int32)
        t = jnp.take_along_axis(
            g, jnp.broadcast_to(y2[None], (b, plan.out_rows, plan.k_slots)), axis=1
        )  # [B, R, K]
        vals = jnp.take_along_axis(
            t, jnp.broadcast_to(s3[None], (b,) + s3.shape), axis=2
        )
        taps = jnp.where(l3[None] == lyr, vals, taps)
    c_pad = plan.s3.shape[1] // 4
    out = (taps * w3[None]).reshape(b, plan.out_rows, 4, c_pad).sum(2)
    return out[:, :, : plan.out_cols]


@lru_cache(maxsize=4)
def equi_cube_plan(face_w: int, in_h: int, in_w: int) -> GatherPlan:
    """Cached plan for the stacked-faces equi->cube geometry."""
    from cp360_tpu.geometry import build_equi2cube_maps

    in_x, in_y = build_equi2cube_maps(face_w, in_h, in_w)
    mx = in_x.reshape(6 * face_w, face_w)
    my = in_y.reshape(6 * face_w, face_w)
    for n_layers in (3, 4, 6, 8, 12):
        try:
            return build_plan(mx, my, in_h, in_w, n_layers=n_layers)
        except ValueError:
            continue
    raise ValueError("slot packing needs more than 12 layers")


def equi_to_cube_slot(equi: jax.Array, face_w: int,
                      impl: str = "pallas") -> jax.Array:
    """equi [N, H, 2H, C] (or [H, 2H, C]) -> [N, 6, fw, fw, C] faces.

    Drop-in for ops/resample.py::equi_to_cube built on the slot-gather
    plan; ``impl``: 'pallas' (TPU kernel) | 'jax' (XLA executor).
    """
    squeeze = equi.ndim == 3
    if squeeze:
        equi = equi[None]
    n, h, w, c = equi.shape
    plan = equi_cube_plan(face_w, h, w)
    planes = jnp.moveaxis(equi, -1, 1).reshape(n * c, h, w).astype(jnp.float32)
    fn = apply_plan_pallas if impl == "pallas" else apply_plan_jax
    out = fn(plan, planes)[:, : 6 * face_w]
    out = out.reshape(n, c, 6, face_w, face_w)
    out = jnp.moveaxis(out, 1, -1)
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Pallas TPU pipeline
# ---------------------------------------------------------------------------

try:  # pallas imports kept optional so CPU-only use never needs Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _phase1_kernel(src_ref, a1_ref, g_ref):
    """g[y, k] = src[y, a1[y, k]] for one 128-wide slot group.

    Lane gathers are legal only within one 128-lane group (measured
    envelope), so the source row sweeps 128-column windows along the
    innermost grid dim, accumulating into the same g block (full-width
    source blocks would blow scoped VMEM: 3x[960,1920] f32 = 25 MB).
    Blocks: src [1, h, 128] (window wg), a1 [h, 128], g [1, h, 128].
    """
    wg = pl.program_id(2)

    @pl.when(wg == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    idx = a1_ref[:]
    local = idx - wg * 128
    sel = (local >= 0) & (local < 128)
    vals = jnp.take_along_axis(src_ref[0], jnp.clip(local, 0, 127), axis=1)
    g_ref[0] = jnp.where(sel, vals, g_ref[0])


def _make_phase23_kernel(k_slots, n_layers, active):
    def _phase23_kernel(band_lo_ref, band_n_ref, y2_ref, s3_ref, l3_ref,
                        w3_ref, g_ref, o_ref):
        """Fused row-distribution + tap blend for one 8-row output chunk.

        Phase 2: per layer, t[r, k] = g[y2[r, k], k].  Sublane gathers are
        legal only at height 8, so the chunk's source-row band (scalar-
        prefetched bounds) sweeps in 8-row sub-bands via an in-kernel
        dynamic-trip-count loop over pl.load'ed bands — a grid dim here
        costs ~1-2 us/step of launch overhead, which dominated the first
        version (94k steps, 141 ms vs XLA's 50).

        Phase 3: out[r, j] = t[l3, r, s3] * w3, lane-hierarchical static
        gather with host-pruned (tap group, slot group, layer) passes,
        4-tap reduction as 128-aligned lane slices.

        Blocks: y2 [L, 8, K], s3/l3/w3 [8, 4*c_pad], g [1, H_pad, K],
        o [1, 8, C].
        """
        ch = pl.program_id(1)

        t_layers = []
        for lyr in range(n_layers):
            idx = y2_ref[lyr]
            lo8 = band_lo_ref[lyr, ch] // 8  # block units: (lo8 + s) * 8 is
            # provably 8-aligned for Mosaic's vector load

            def body(s, acc, idx=idx, lo8=lo8):
                base = (lo8 + s) * 8
                band = g_ref[0, pl.ds(base, 8), :]  # [8, K]
                local = idx - base
                sel = (local >= 0) & (local < 8)
                vals = jnp.take_along_axis(band, jnp.clip(local, 0, 7), axis=0)
                return jnp.where(sel, vals, acc)

            acc = jnp.zeros((8, k_slots), o_ref.dtype)
            t_layers.append(
                jax.lax.fori_loop(0, band_n_ref[lyr, ch], body, acc))

        jdim = s3_ref.shape[1]
        cols = []
        for tg in range(jdim // 128):
            sl = slice(tg * 128, (tg + 1) * 128)
            idx = s3_ref[:, sl]
            lyr_idx = l3_ref[:, sl]
            part = jnp.zeros((8, 128), o_ref.dtype)
            for lyr in range(n_layers):
                for kg in range(k_slots // 128):
                    if (tg, kg, lyr) not in active:
                        continue
                    sub = t_layers[lyr][:, kg * 128:(kg + 1) * 128]
                    local = idx - kg * 128
                    sel = (local >= 0) & (local < 128) & (lyr_idx == lyr)
                    vals = jnp.take_along_axis(
                        sub, jnp.clip(local, 0, 127), axis=1)
                    part = jnp.where(sel, vals, part)
            cols.append(part)
        weighted = jnp.concatenate(cols, axis=1) * w3_ref[:]
        c_pad = jdim // 4
        summed = (weighted[:, 0:c_pad] + weighted[:, c_pad:2 * c_pad]
                  + weighted[:, 2 * c_pad:3 * c_pad]
                  + weighted[:, 3 * c_pad:4 * c_pad])
        o_ref[0] = summed[:, : o_ref.shape[2]]

    return _phase23_kernel


def _phase3_active(plan: GatherPlan):
    """(tap_group, slot_group, layer) combos that carry any tap — prunes
    the static gather passes at trace time."""
    active = set()
    jdim = plan.s3.shape[1]
    for tg in range(-(-jdim // 128)):
        s3 = plan.s3[:, tg * 128:(tg + 1) * 128]
        l3 = plan.l3[:, tg * 128:(tg + 1) * 128]
        for lyr in range(plan.n_layers):
            kgs = np.unique(s3[l3 == lyr] // 128)
            for kg in kgs:
                active.add((tg, int(kg), int(lyr)))
    return frozenset(active)




def apply_plan_pallas(plan: GatherPlan, src: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Pallas pipeline: 3 kernels with HBM intermediates.

    Args:
      src: [B, src_h, src_w] f32 channel planes.

    Returns [B, out_rows, out_cols] f32.
    """
    if pl is None:
        raise RuntimeError("pallas unavailable")
    b = src.shape[0]
    h, w, k = plan.src_h, plan.src_w, plan.k_slots
    if w % 128:
        # phase 1 sweeps 128-column windows; a partial tail window would
        # silently read zeros (apply_plan_jax has no such restriction)
        raise ValueError(f"pallas executor needs src_w % 128 == 0, got {w}")
    r, c4 = plan.out_rows, plan.s3.shape[1]
    a1 = jnp.asarray(plan.a1, jnp.int32)

    # phase 1: [B, H, W] -> g [B, H, K]
    g = pl.pallas_call(
        _phase1_kernel,
        grid=(b, k // 128, w // 128),
        in_specs=[
            pl.BlockSpec((1, h, 128), lambda bi, kg, wg: (bi, 0, wg)),
            pl.BlockSpec((h, 128), lambda bi, kg, wg: (0, kg)),
        ],
        out_specs=pl.BlockSpec((1, h, 128), lambda bi, kg, wg: (bi, 0, kg)),
        out_shape=jax.ShapeDtypeStruct((b, h, k), src.dtype),
        interpret=interpret,
    )(src, a1)

    # fused phases 2+3: g [B, H_pad, K] -> out [B, R, C]
    n_chunks = r // 8
    g_pad = _pad_rows8(g, h)
    h_pad = g_pad.shape[1]
    y2 = jnp.asarray(plan.y2, jnp.int32)  # [L, R, K]
    band_lo = jnp.asarray(plan.band_lo, jnp.int32)  # [L, n_chunks]
    band_n = jnp.asarray(plan.band_n, jnp.int32)
    s3 = jnp.asarray(plan.s3, jnp.int32)
    l3 = jnp.asarray(plan.l3.astype(np.int32))
    w3 = jnp.asarray(plan.w3, jnp.float32)
    kern = _make_phase23_kernel(k, plan.n_layers, _phase3_active(plan))

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_chunks),
            in_specs=[
                pl.BlockSpec((plan.n_layers, 8, k),
                             lambda bi, ch, lo, bn: (0, ch, 0)),
                pl.BlockSpec((8, c4), lambda bi, ch, lo, bn: (ch, 0)),
                pl.BlockSpec((8, c4), lambda bi, ch, lo, bn: (ch, 0)),
                pl.BlockSpec((8, c4), lambda bi, ch, lo, bn: (ch, 0)),
                pl.BlockSpec((1, h_pad, k), lambda bi, ch, lo, bn: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, plan.out_cols), lambda bi, ch, lo, bn: (bi, ch, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, r, plan.out_cols), src.dtype),
        interpret=interpret,
    )(band_lo, band_n, y2, s3, l3, w3, g_pad)
    return out


def _pad_rows8(g: jax.Array, h: int) -> jax.Array:
    """Pad the row dim so any (band_lo + 8 * step) block stays in range."""
    pad = (-h) % 8 + 8  # slack for the last sub-band step
    return jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
