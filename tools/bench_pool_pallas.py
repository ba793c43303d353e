"""Pallas interior maxpool vs XLA reduce_window — the last pool attack.

`POOL_FORMS_r05.json` pinned the stem pool phase at 5.21 ms/16-frame batch
(fused2d_dus) with every XLA-level decomposition measured WORSE (separable
5.9, pairmax 7.44, 9-slice tree 31.7, unfused 9.63) — yet the phase's HBM
speed-of-light is ~0.3 ms.  The overlapping-window lowering itself is the
wall, so this tries the one uncharted level: a Pallas kernel that pools the
top/left -inf-padded interior per face ([112,112,64] -> [56,56,64]) with
plain VPU maxes:

  H pass (untiled major dim): pair-reshape max of rows (2i, 2i+1), then a
  max with row 2i-1 (odd rows shifted by one, -inf at i=0).
  W pass (sublane dim), two schedule variants:
    'stride'   direct stride-2 sublane slices hq[:, 0::2] / hq[:, 1::2]
    'reshape'  one [56,112,64]->[56,56,2,64] sublane-split reshape, max
               over the pair dim, shifted-odd max as above

Exactness is asserted in interpret mode against the production
`cube_pad_max_pool_3x3s2` interior before any chip time is spent; the chip
A/B then times the FULL fused op (interior + halo-row corrections) in both
forms, scan-chained in one process (standalone timings lie through this
relay — CLAUDE.md).

Usage: python tools/bench_pool_pallas.py [batch=16] [n_iters=10]
Prints one JSON line per form + a summary.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_pool_interior(variant, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[0]                      # [H, W, C]
        h, w, c = x.shape
        neg = jnp.asarray(-jnp.inf, x.dtype)
        # --- H pass (major dim, untiled) ---
        r = x.reshape(h // 2, 2, w, c)
        a = jnp.maximum(r[:, 0], r[:, 1])             # rows 2i, 2i+1
        xo = r[:, 1]                                  # odd rows
        prev = jnp.concatenate(
            [jnp.full((1, w, c), neg, x.dtype), xo[:-1]], axis=0)
        hq = jnp.maximum(a, prev)                     # [H/2, W, C]
        # --- W pass (sublane dim) ---
        if variant == "stride":
            we = hq[:, 0::2]
            wo = hq[:, 1::2]
        elif variant == "reshape":
            rw = hq.reshape(h // 2, w // 2, 2, c)
            we = rw[:, :, 0]
            wo = rw[:, :, 1]
        else:  # lanefold_roll / lanefold_concat: W-pair merged into LANES
            q = hq.reshape(h // 2, w // 2, 2 * c)   # lane = (w%2)*c + ch
            we = q[:, :, :c]
            wo = q[:, :, c:]
        b = jnp.maximum(we, wo)
        if variant == "lanefold_roll":
            rolled = pltpu.roll(wo, shift=1, axis=1)      # wo[:, j-1]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (h // 2, w // 2, c), 1)
            prevw = jnp.where(col == 0, neg, rolled)
        else:
            prevw = jnp.concatenate(
                [jnp.full((h // 2, 1, c), neg, x.dtype), wo[:, :-1]], axis=1)
        o_ref[0] = jnp.maximum(b, prevw)

    def pool(x):  # [B, H, W, C] -> [B, H/2, W/2, C]
        bsz, h, w, c = x.shape
        return pl.pallas_call(
            kernel,
            grid=(bsz,),
            in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, h // 2, w // 2, c),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, h // 2, w // 2, c), x.dtype),
            interpret=interpret,
        )(x)

    return pool


def make_pool_interior_rowgrid(shift, interpret=False):
    """Interior pool with NO in-kernel reshapes or strided slices.

    XLA pre-work: merge W-pairs into lanes ([B,112,112,64] ->
    [B,112,56,128], a contiguous minor-dim merge) and -inf-pad one top
    row.  The kernel runs one grid step per OUTPUT ROW with three width-1
    input views at padded rows 2j, 2j+1, 2j+2 (BlockSpec offsets of
    multiples of a size-1 block express the overlapping windows); the W
    pass is two 64-aligned lane slices + one sublane shift (``shift`` =
    'concat' or 'roll').
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(r0_ref, r1_ref, r2_ref, o_ref):
        a = jnp.maximum(jnp.maximum(r0_ref[:, 0], r1_ref[:, 0]), r2_ref[:, 0])
        bsz, wh, c2 = a.shape                     # [B, 56, 128]
        c = c2 // 2
        neg = jnp.asarray(-jnp.inf, a.dtype)
        we = a[:, :, :c]
        wo = a[:, :, c:]
        b = jnp.maximum(we, wo)
        if shift == "roll":
            rolled = pltpu.roll(wo, shift=1, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, (bsz, wh, c), 1)
            prevw = jnp.where(col == 0, neg, rolled)
        else:
            prevw = jnp.concatenate(
                [jnp.full((bsz, 1, c), neg, a.dtype), wo[:, :-1]], axis=1)
        o_ref[:, 0] = jnp.maximum(b, prevw)

    def pool(x):  # [B, H, W, C] -> [B, H/2, W/2, C]
        bsz, h, w, c = x.shape
        neg = jnp.asarray(-jnp.inf, x.dtype)
        xm = x.reshape(bsz, h, w // 2, 2 * c)           # W-pair -> lanes
        xm = jnp.pad(xm, [(0, 0), (1, 0), (0, 0), (0, 0)],
                     constant_values=neg)               # top -inf row
        view = lambda k: pl.BlockSpec(
            (bsz, 1, w // 2, 2 * c), lambda j, k=k: (0, 2 * j + k, 0, 0),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(h // 2,),
            in_specs=[view(0), view(1), view(2)],
            out_specs=pl.BlockSpec((bsz, 1, w // 2, c),
                                   lambda j: (0, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, h // 2, w // 2, c), x.dtype),
            interpret=interpret,
        )(xm, xm, xm)

    return pool


def make_full_op(variant):
    """cube_pad_max_pool_3x3s2 with the Pallas interior (same halo path)."""
    import jax.numpy as jnp
    from cp360_tpu.ops.cube_pad import _pool_halo_strips_slice

    if variant.startswith("rowgrid"):
        interior = make_pool_interior_rowgrid(variant.split("_", 1)[1])
    else:
        interior = make_pool_interior(variant)

    def op(x):  # [N, 6, H, W, C] -> [N, 6, H/2, W/2, C]
        n, six, h, w, c = x.shape
        halo_t, halo_l = _pool_halo_strips_slice(x)
        pooled = interior(x.reshape(n * six, h, w, c)).reshape(
            n, six, h // 2, w // 2, c)

        def win3(s):
            return jnp.maximum(
                jnp.maximum(s[:, :, 0:-2:2], s[:, :, 1:-1:2]), s[:, :, 2::2])

        row0 = jnp.maximum(pooled[:, :, 0], win3(halo_t))
        pooled = pooled.at[:, :, 0].set(row0)
        col0 = jnp.maximum(pooled[:, :, :, 0], win3(halo_l))
        return pooled.at[:, :, :, 0].set(col0)

    return op


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    exact_only = "--exact-only" in sys.argv[1:]
    batch = int(argv[0]) if argv else 16
    n_iters = int(argv[1]) if len(argv) > 1 else 10

    import jax
    if exact_only:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cp360_tpu.ops.cube_pad import cube_pad_max_pool_3x3s2
    from cp360_tpu.utils.transfer import warm_link

    # --- interpret-mode exactness (CPU only: interpret mode dispatches
    # each tiny op through the transfer tunnel on the chip backend and
    # wedges for minutes; run `--exact-only` first, it is asserted there) ---
    if exact_only:
        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.randn(2, 6, 16, 16, 8).astype(np.float32))
        want = np.asarray(cube_pad_max_pool_3x3s2(xs, form="fused2d_dus"))
    for variant in (("stride", "reshape", "lanefold_concat",
                     "lanefold_roll", "rowgrid_concat", "rowgrid_roll")
                    if exact_only else ()):
        import jax.numpy as jnp
        from cp360_tpu.ops.cube_pad import _pool_halo_strips_slice
        if variant.startswith("rowgrid"):
            interior = make_pool_interior_rowgrid(
                variant.split("_", 1)[1], interpret=True)
        else:
            interior = make_pool_interior(variant, interpret=True)
        n, six, h, w, c = xs.shape
        halo_t, halo_l = _pool_halo_strips_slice(xs)
        pooled = interior(xs.reshape(n * six, h, w, c)).reshape(
            n, six, h // 2, w // 2, c)

        def win3(s):
            return jnp.maximum(
                jnp.maximum(s[:, :, 0:-2:2], s[:, :, 1:-1:2]), s[:, :, 2::2])

        row0 = jnp.maximum(pooled[:, :, 0], win3(halo_t))
        pooled = pooled.at[:, :, 0].set(row0)
        col0 = jnp.maximum(pooled[:, :, :, 0], win3(halo_l))
        got = np.asarray(pooled.at[:, :, :, 0].set(col0))
        np.testing.assert_array_equal(got, want)
        print(json.dumps({"metric": "pool_pallas_exactness",
                          "variant": variant, "ok": True}), flush=True)

    if exact_only:
        return
    warm_link()
    h, c = 112, 64
    keys = [jax.random.fold_in(jax.random.PRNGKey(3), i)
            for i in range(n_iters)]
    xs = jnp.stack([jax.random.normal(k, (batch, 6, h, h, c), jnp.bfloat16)
                    for k in keys])

    forms = {"fused2d_dus": functools.partial(
        cube_pad_max_pool_3x3s2, form="fused2d_dus")}
    # stride / reshape measured as Mosaic walls 2026-08-20 (strided sublane
    # slice lowers to an unsupported gather; sublane-split reshape fails the
    # remote compile helper); the lanefold variants merge the W-pair into
    # LANES ([56,112,64]->[56,56,128], a minor-dim merge + 64-aligned lane
    # slices, all natively supported).
    # lanefold_* also failed the remote Mosaic compile (in-kernel minor-dim
    # reshape); rowgrid_* moves the lane merge to XLA and expresses the
    # overlapping H windows as three width-1 grid views.
    for variant in ("rowgrid_concat", "rowgrid_roll"):
        forms[f"pallas_{variant}"] = make_full_op(variant)

    want_chip = None
    results = []
    for name, fn in forms.items():
        if name != "fused2d_dus" and want_chip is not None:
            try:  # value check on chip before spending timing reps
                got = np.asarray(jax.jit(fn)(xs[0]), np.float32)
                np.testing.assert_array_equal(got, want_chip)
                print(json.dumps({"metric": "pool_pallas_chip_exactness",
                                  "form": name, "ok": True}), flush=True)
            except AssertionError as e:
                print(json.dumps({"metric": "pool_pallas_chip_exactness",
                                  "form": name, "ok": False,
                                  "error": str(e)[:200]}), flush=True)
                continue
            except Exception as e:
                line = {"metric": "pool_pallas_ms", "form": name,
                        "error": f"{type(e).__name__}: {str(e)[:300]}"}
                results.append(line)
                print(json.dumps(line), flush=True)
                continue
        @jax.jit
        def scanned(xs, fn=fn):
            def body(a, x):
                out = fn(x)
                return a + jnp.sum(out.reshape(-1)[:2].astype(jnp.float32)), None
            a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return a

        try:
            t0 = time.time()
            assert np.isfinite(float(scanned(xs)))
            compile_s = time.time() - t0
            if name == "fused2d_dus":
                want_chip = np.asarray(jax.jit(fn)(xs[0]), np.float32)
        except Exception as e:  # Mosaic walls are results, not crashes
            line = {"metric": "pool_pallas_ms", "form": name,
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
            results.append(line)
            print(json.dumps(line), flush=True)
            continue
        reps = []
        for _ in range(5):
            t0 = time.time()
            assert np.isfinite(float(scanned(xs)))
            reps.append(time.time() - t0)
        ms = sorted(r / n_iters * 1e3 for r in reps)
        line = {"metric": "pool_pallas_ms", "form": name, "batch": batch,
                "ms_per_batch": round(float(np.median(ms)), 2),
                "ms_iqr": [round(float(np.percentile(ms, 25)), 2),
                           round(float(np.percentile(ms, 75)), 2)],
                "compile_s": round(compile_s, 1)}
        results.append(line)
        print(json.dumps(line), flush=True)

    timed = [r for r in results if "ms_per_batch" in r]
    if timed:
        best = min(timed, key=lambda r: r["ms_per_batch"])
        print(json.dumps({"metric": "pool_pallas_best", "form": best["form"],
                          "ms_per_batch": best["ms_per_batch"]}), flush=True)


if __name__ == "__main__":
    main()
