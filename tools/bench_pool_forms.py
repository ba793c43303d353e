"""On-chip A/B of the stem-pool execution forms (ops/cube_pad.py).

The r5 profile showed the cube-pad+maxpool phase at 7.67 ms of the 22 ms
stage-1 backbone batch; the fused op (one 2-D overlapping reduce_window on
a -inf-padded interior + index-map halo corrections) measured 10.1 ->
6.2 ms isolated.  6.2 ms is still ~20x the phase's HBM speed-of-light
(~0.3 ms for 230 MB of bf16 traffic at this chip's bandwidth), so the 2-D
overlapping window lowering itself is suspect.  This times, in ONE process
(scan-chained — standalone op timings lie through this relay, CLAUDE.md):

  unfused    cube_pad(x, 1) + max_pool(3, 2)       (pre-r5 baseline)
  fused2d    cube_pad_max_pool_3x3s2 form='fused2d' (r5 default)
  separable  form='separable' (3x1 rows then 1x3 cols; exact)

Replaces the reference's CubePadding(1)+MaxPool2d(3,2)
(model/resnet_cubic.py:118-119,166-167) hot path.

Usage: python tools/bench_pool_forms.py [batch=16] [n_iters=10]
Prints one JSON line per form + a summary.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else 16
    n_iters = int(argv[1]) if len(argv) > 1 else 10

    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.layers import max_pool
    from cp360_tpu.ops.cube_pad import cube_pad, cube_pad_max_pool_3x3s2
    from cp360_tpu.utils.transfer import warm_link

    warm_link()  # absorb a degraded-phase cold first-fetch (CLAUDE.md)

    h, c = 112, 64  # production stem output (stage-1 resnet50 @ 224)

    def unfused(x):
        return max_pool(
            cube_pad(x, 1).reshape(batch * 6, h + 2, h + 2, c), 3, 2)

    forms = {
        "unfused": unfused,
        "fused2d": lambda x: cube_pad_max_pool_3x3s2(x, form="fused2d"),
        "fused2d_dus": lambda x: cube_pad_max_pool_3x3s2(x, form="fused2d_dus"),
        "pairmax": lambda x: cube_pad_max_pool_3x3s2(x, form="pairmax"),
        "separable": lambda x: cube_pad_max_pool_3x3s2(x, form="separable"),
    }

    keys = [jax.random.fold_in(jax.random.PRNGKey(3), i)
            for i in range(n_iters)]
    xs = jnp.stack([jax.random.normal(k, (batch, 6, h, h, c), jnp.bfloat16)
                    for k in keys])

    results = []
    for name, fn in forms.items():
        @jax.jit
        def scanned(xs, fn=fn):
            def body(a, x):
                out = fn(x)
                return a + jnp.sum(out.reshape(-1)[:2].astype(jnp.float32)), None
            a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return a

        t0 = time.time()
        assert np.isfinite(float(scanned(xs)))  # compile + warm
        compile_s = time.time() - t0
        reps = []
        for _ in range(5):
            t0 = time.time()
            assert np.isfinite(float(scanned(xs)))
            reps.append(time.time() - t0)
        ms = sorted(r / n_iters * 1e3 for r in reps)
        line = {"metric": "pool_form_ms", "form": name, "batch": batch,
                "ms_per_batch": round(float(np.median(ms)), 2),
                "ms_iqr": [round(float(np.percentile(ms, 25)), 2),
                           round(float(np.percentile(ms, 75)), 2)],
                "compile_s": round(compile_s, 1)}
        results.append(line)
        print(json.dumps(line), flush=True)

    best = min(results, key=lambda r: r["ms_per_batch"])
    print(json.dumps({"metric": "pool_form_best", "form": best["form"],
                      "ms_per_batch": best["ms_per_batch"]}), flush=True)


if __name__ == "__main__":
    main()
