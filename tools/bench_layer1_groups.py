"""On-chip A/B: face-pair grouped conv for layer1 (C=64 lane waste, attempt 2).

`L1_FOLD_r05.json` measured the W-pair channel fold at 0.961x: the 2x lane
utilization is exactly cancelled by the 2x MXU FLOPs of the dense folded
weights.  This measures the variant that does NOT double FLOPs: fold two
*faces* (batch entries) into channels — [B,56,56,64] -> [B/2,56,56,128] —
and run the conv with `feature_group_count=2`.  Both faces share the same
weights, so the grouped filter is just the original [3,3,64,64] tiled to
[3,3,64,128] along O: same FLOPs, full (8,128) lane tile on every operand
and every BN/ReLU elementwise op.  Risk being measured: XLA's TPU lowering
of grouped convs (it may rewrite groups back into batch, undoing the win).

Same scan-chained methodology as L1_FOLD_r05.json / POOL_FORMS_r05.json;
exactness asserted in-process first.

Usage: python tools/bench_layer1_groups.py [batch_faces=96] [reps=30]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf = int(argv[0]) if argv else 96
    reps = int(argv[1]) if len(argv) > 1 else 30

    import jax
    import jax.numpy as jnp

    from cp360_tpu.utils.transfer import warm_link

    def conv(x, w, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32).astype(x.dtype)

    def pair_fold(x):
        """[B,H,W,C] -> [B/2,H,W,2C]: face pairs (2i, 2i+1) along channels."""
        b, h, w, c = x.shape
        return x.reshape(b // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4) \
                .reshape(b // 2, h, w, 2 * c)

    def pair_unfold(xp):
        b2, h, w, c2 = xp.shape
        return xp.reshape(b2, h, w, 2, c2 // 2).transpose(0, 3, 1, 2, 4) \
                 .reshape(b2 * 2, h, w, c2 // 2)

    def group_weights(w):
        # groups=2 with HWIO expects [H,W,C_in/groups, C_out_total]; both
        # groups apply the same original filter.
        return jnp.concatenate([w, w], axis=3)

    # --- exactness (runs on whatever backend) ---
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(4, 8, 10, 4).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    want = conv(xs, ws)
    got = pair_unfold(conv(pair_fold(xs), group_weights(ws), groups=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    print(json.dumps({"metric": "layer1_groups_exactness", "ok": True,
                      "max_err": float(jnp.max(jnp.abs(got - want)))}),
          flush=True)

    warm_link()
    h = w = 56
    c = 64
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bf, h, w, c), dt)
    wc = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c), dt) * .1
    gamma = jax.random.normal(jax.random.fold_in(key, 2), (c,), dt)
    beta = jax.random.normal(jax.random.fold_in(key, 3), (c,), dt)
    wg = group_weights(wc)
    g2 = jnp.concatenate([gamma, gamma])
    b2 = jnp.concatenate([beta, beta])

    flops = bf * h * w * 9 * c * c * 2 * 3  # 3 chained convs, original basis

    def chain_plain(x):
        for _ in range(3):
            x = conv(x, wc)
            x = jnp.maximum(x * gamma + beta, 0).astype(dt)
        return x

    def chain_grouped(xp):
        for _ in range(3):
            xp = conv(xp, wg, groups=2)
            xp = jnp.maximum(xp * g2 + b2, 0).astype(dt)
        return xp

    results = []
    for name, fn, inp in (("plain_c64", chain_plain, x),
                          ("grouped_pairs_c128", chain_grouped, pair_fold(x))):
        @jax.jit
        def scanned(x0):
            def body(carry, _):
                return fn(carry), None
            out, _ = jax.lax.scan(body, x0, None, length=reps)
            return jnp.sum(out[:1, :1].astype(jnp.float32))

        t0 = time.time()
        float(scanned(inp))
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            float(scanned(inp))
            times.append(time.time() - t0)
        ms = float(np.median(times)) / reps * 1e3
        tfs = flops / (ms / 1e3) / 1e12
        r = {"metric": "layer1_groups_form", "form": name,
             "batch_faces": bf, "reps": reps,
             "ms_per_chain3": round(ms, 3),
             "tf_s_effective": round(tfs, 1),
             "ms_iqr": [round(float(np.percentile(times, q)) / reps * 1e3, 3)
                        for q in (25, 75)],
             "compile_s": round(compile_s, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    if len(results) == 2:
        speed = results[0]["ms_per_chain3"] / results[1]["ms_per_chain3"]
        print(json.dumps({"metric": "layer1_groups_summary",
                          "grouped_over_plain_speedup": round(speed, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
