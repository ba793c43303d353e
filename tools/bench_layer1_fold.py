"""On-chip A/B of the layer1 blocked-channel relayout (VERDICT r4 avenue iii).

ResNet-50 layer1 runs at ~23-26 TF/s effective (tools/profile_backbone.py:
4.8-4.9 ms of the 16.7 ms zero-padded backbone) because C=64 occupies half
of the (8,128) vreg lane tile in every conv operand AND every elementwise
op.  The relayout folds W-column pairs into channels — [B,56,56,64] ->
[B,56,28,128] — so everything runs at full lane width; the 3x3 conv
becomes a 3x3 conv over folded columns with BLOCK-STRUCTURED weights
[3,3,128,128] (6 of 12 64x64 blocks nonzero: out_lo reads {j-1.hi, j.lo,
j.hi}, out_hi reads {j.lo, j.hi, j+1.lo}) — 2x the MXU FLOPs at 2x the
lane utilization (a wash in theory), while the BN/ReLU/residual
elementwise traffic halves its vreg count.

This measures scan-chained timings of the conv3x3 + BN-ReLU chain in both
layouts at layer1 geometry (the same methodology as POOL_FORMS_r05.json);
exactness of the folded conv is asserted in-process on small shapes first.

Usage: python tools/bench_layer1_fold.py [batch_faces=96] [reps=30]
Prints one JSON line per form + a summary.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fold_w(x):
    """[B,H,W,C] -> [B,H,W/2,2C] (col pairs into channels)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unfold_w(xf):
    b, h, wf, c2 = xf.shape
    return xf.reshape(b, h, wf * 2, c2 // 2)


def fold_weights(w):
    """[3,3,C,Co] SAME conv weights -> folded [3,3,2C,2Co].

    Folded tap t in {0,1,2} covers folded columns j-1, j, j+1.  With x
    zero-padded SAME in both layouts the extra taps read zeros where the
    folded weight blocks are zero, so the fold is exact.
    """
    import jax.numpy as jnp

    c, co = w.shape[2], w.shape[3]
    wf = jnp.zeros((3, 3, 2 * c, 2 * co), w.dtype)
    # out_lo (orig even cols 2j): taps at orig cols 2j-1, 2j, 2j+1
    wf = wf.at[:, 0, c:, :co].set(w[:, 0])   # col 2j-1 = folded j-1 hi
    wf = wf.at[:, 1, :c, :co].set(w[:, 1])   # col 2j   = folded j   lo
    wf = wf.at[:, 1, c:, :co].set(w[:, 2])   # col 2j+1 = folded j   hi
    # out_hi (orig odd cols 2j+1): taps at orig cols 2j, 2j+1, 2j+2
    wf = wf.at[:, 1, :c, co:].set(w[:, 0])   # col 2j   = folded j   lo
    wf = wf.at[:, 1, c:, co:].set(w[:, 1])   # col 2j+1 = folded j   hi
    wf = wf.at[:, 2, :c, co:].set(w[:, 2])   # col 2j+2 = folded j+1 lo
    return wf


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf = int(argv[0]) if argv else 96
    reps = int(argv[1]) if len(argv) > 1 else 30

    import jax
    import jax.numpy as jnp

    from cp360_tpu.utils.transfer import warm_link

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    # --- exactness on CPU-sized shapes (runs wherever we are) ---
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 8, 10, 4).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    want = conv(xs, ws)
    got = unfold_w(conv(fold_w(xs), fold_weights(ws)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    print(json.dumps({"metric": "layer1_fold_exactness", "ok": True,
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
    wcf = fold_weights(wc)
    gf = jnp.concatenate([gamma, gamma])
    bfold = jnp.concatenate([beta, beta])

    flops = bf * h * w * 9 * c * c * 2 * 3  # 3 chained convs, ORIGINAL basis

    def chain_plain(x):
        for _ in range(3):
            x = conv(x, wc)
            x = jnp.maximum(x * gamma + beta, 0).astype(dt)
        return x

    def chain_folded(xf):
        for _ in range(3):
            xf = conv(xf, wcf)
            xf = jnp.maximum(xf * gf + bfold, 0).astype(dt)
        return xf

    results = []
    for name, fn, inp in (("plain_c64", chain_plain, x),
                          ("folded_c128", chain_folded, fold_w(x))):
        @jax.jit
        def scanned(x0, n_arr):
            def body(carry, _):
                return fn(carry), None
            out, _ = jax.lax.scan(body, x0, None, length=reps)
            return jnp.sum(out[:1, :1].astype(jnp.float32))

        t0 = time.time()
        float(scanned(inp, None))
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            float(scanned(inp, None))
            times.append(time.time() - t0)
        ms = float(np.median(times)) / reps * 1e3
        tfs = flops / (ms / 1e3) / 1e12
        r = {"metric": "layer1_fold_form", "form": name,
             "batch_faces": bf, "reps": reps,
             "ms_per_chain3": round(ms, 3),
             "tf_s_effective_orig_basis": round(tfs, 1),
             "ms_iqr": [round(float(np.percentile(times, q)) / reps * 1e3, 3)
                        for q in (25, 75)],
             "compile_s": round(compile_s, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    if len(results) == 2:
        speed = results[0]["ms_per_chain3"] / results[1]["ms_per_chain3"]
        print(json.dumps({"metric": "layer1_fold_summary",
                          "folded_over_plain_speedup": round(speed, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
