"""Per-stage device time of the stage-1 backbone + compute-wall experiments.

VERDICT r4 weak #5: the stage-1 device path runs ~17 TF/s effective where
the same toolchain reaches ~105 TF/s inside the train scan, and the r4
component profile blames stem+pool+layer1 (~11 of ~17 ms zero-padded,
C<=64 lane waste).  This tool sharpens that to PER-STAGE numbers via
progressive-prefix scan timings (prefix_k - prefix_{k-1} = stage k), then
measures the r5 attack variants the verdict names:

  prefixes:  cast / stem / bn+relu+pool / layer1 / layer2 / layer3 /
             layer4 / cam-head           (cube-padded and zero-padded)
  im2col:    the 7x7/s2 stem as 49 strided slices + ONE [M,147]x[147,64]
             dot (K padded to MXU tiling) — attacks the C_in=3 lane waste
             without the measured-slow space-to-depth reshape
  int8:      conv compute in int8 (weights per-cout-channel symmetric,
             activations per-tensor) with int32 MXU accumulation — v5e
             doubles int8 MXU throughput; inference-only (frozen backbone)

Timing discipline: everything chained through one lax.scan dispatch (the
relay's per-call latency and content-dedup make standalone op timings lies
here — CLAUDE.md); distinct data per scan iteration.

Usage: python tools/profile_backbone.py [batch=16] [n_iters=10] [mode]
  mode: 'prefix' (default) | 'im2col' | 'int8' | 'all'
Prints one JSON line per mode.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _scan_time(jax, jnp, fn, xs, n_iters, reps=3):
    """Median ms/iter of fn over stacked xs, one scanned dispatch per rep."""

    @jax.jit
    def scanned(xs):
        def body(a, x):
            outs = fn(x)
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            return a + sum(jnp.sum(o.reshape(-1)[:2].astype(jnp.float32))
                           for o in outs), None
        a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return a

    float(scanned(xs))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        assert np.isfinite(float(scanned(xs)))
        times.append((time.time() - t0) / n_iters * 1e3)
    return float(np.median(times))


def _inputs(jax, jnp, batch, n_iters):
    key = jax.random.PRNGKey(42)

    @jax.jit
    def make(k):
        # distinct normalized cube batches (the relay dedups repeats)
        return jax.random.normal(k, (batch * 6, 224, 224, 3),
                                 jnp.bfloat16)

    return jnp.stack([make(jax.random.fold_in(key, i))
                      for i in range(n_iters)])


def _stage_fns(jax, jnp, params, use_cp):
    """Progressive prefixes of resnet_apply (models/resnet.py:146-190)."""
    from cp360_tpu.models import layers
    from cp360_tpu.models.resnet import ARCHS, _bottleneck, _pad

    depths = ARCHS["resnet50"][1]
    dt = jnp.bfloat16

    def upto(x, n_stages):
        # mirrors the SHIPPED resnet_apply structure (r5: fused stem
        # pad+pool, halo bottleneck cube convs under bf16)
        out = x.astype(dt)
        out = _pad(out, 3, use_cp)
        out = layers.conv2d(out, params["conv1"]["w"], stride=2,
                            compute_dtype=dt)
        if n_stages == 0:
            return out
        out = layers.batch_norm(out, params["bn1"])
        out = jax.nn.relu(out)
        if use_cp:
            from cp360_tpu.ops.cube_pad import cube_pad_max_pool_3x3s2

            out = cube_pad_max_pool_3x3s2(out.reshape(-1, 6, *out.shape[1:]))
            out = out.reshape(-1, *out.shape[2:])
        else:
            out = _pad(out, 1, use_cp)
            out = layers.max_pool(out, 3, 2)
        if n_stages == 1:
            return out
        conv_form = "halo" if use_cp else "pad"
        for li, depth in enumerate(depths):
            if n_stages - 2 < li:
                return out
            stage = params[f"layer{li + 1}"]
            for bi in range(depth):
                stride = 2 if (li > 0 and bi == 0) else 1
                out = _bottleneck(stage[bi], out, stride, use_cp, dt,
                                  conv_form=conv_form)
        return out

    names = ["stem_conv", "bn_relu_pool", "layer1", "layer2", "layer3",
             "layer4"]
    return names, upto


def profile_prefixes(batch, n_iters):
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.utils.transfer import warm_link

    warm_link()
    params = jax.device_put(init_resnet_params(jax.random.PRNGKey(0),
                                               "resnet50"))
    xs = _inputs(jax, jnp, batch, n_iters)

    out = {}
    for use_cp, tag in ((True, "cubepad"), (False, "zeropad")):
        names, upto = _stage_fns(jax, jnp, params, use_cp)
        prev = 0.0
        stages = {}
        for k, name in enumerate(names):
            t = _scan_time(jax, jnp, lambda x, k=k: upto(x, k), xs, n_iters)
            stages[name] = round(t - prev, 2)
            stages[f"cum_{name}"] = round(t, 2)
            prev = t
        out[tag] = stages
    print(json.dumps({"metric": "backbone_stage_ms", "batch": batch,
                      "n_iters": n_iters, **out}), flush=True)
    return out


def _stem_im2col(jax, jnp, x, w7):
    """7x7/s2 VALID conv as 49 strided slices + one K=147 matmul.

    x: [N, 230, 230, 3] (already padded by 3), w7: [7, 7, 3, 64].
    Tap concat order (ky, kx, cin) matches w7.reshape(147, 64), so the
    result equals layers.conv2d(x, w7, stride=2) up to f32-accumulation
    order.
    """
    n = x.shape[0]
    taps = []
    for ky in range(7):
        for kx in range(7):
            taps.append(jax.lax.slice(
                x, (0, ky, kx, 0), (n, ky + 223, kx + 223, 3), (1, 2, 2, 1)))
    cols = jnp.concatenate(taps, axis=-1)  # [N, 112, 112, 147]
    w = w7.reshape(147, 64).astype(cols.dtype)
    out = jax.lax.dot_general(
        cols, w, dimension_numbers=(((3,), (0,)), ((), ())))
    return out


def profile_im2col(batch, n_iters):
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models import layers
    from cp360_tpu.models.resnet import init_resnet_params, _pad
    from cp360_tpu.utils.transfer import warm_link

    warm_link()
    params = jax.device_put(init_resnet_params(jax.random.PRNGKey(0),
                                               "resnet50"))
    w7 = params["conv1"]["w"]
    xs = _inputs(jax, jnp, batch, n_iters)

    def stem_plain(x, use_cp):
        return layers.conv2d(_pad(x, 3, use_cp), w7, stride=2,
                             compute_dtype=jnp.bfloat16)

    def stem_cols(x, use_cp):
        return _stem_im2col(jax, jnp, _pad(x, 3, use_cp), w7)

    # numeric check on one batch
    a = np.asarray(stem_plain(xs[0], False), np.float32)
    b = np.asarray(stem_cols(xs[0], False), np.float32)
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))

    res = {"rel_err_vs_conv": round(err, 6)}
    for use_cp, tag in ((False, "zeropad"), (True, "cubepad")):
        res[f"stem_conv_ms_{tag}"] = round(_scan_time(
            jax, jnp, lambda x: stem_plain(x, use_cp), xs, n_iters), 2)
        res[f"stem_im2col_ms_{tag}"] = round(_scan_time(
            jax, jnp, lambda x: stem_cols(x, use_cp), xs, n_iters), 2)
    print(json.dumps({"metric": "stem_im2col_ms", "batch": batch, **res}),
          flush=True)
    return res


def profile_int8(batch, n_iters):
    """Does an int8 conv (int32 accumulation) beat bf16 on this libtpu?
    Probes a layer1-shaped and a layer3-shaped 3x3 conv."""
    import jax
    import jax.numpy as jnp

    from cp360_tpu.utils.transfer import warm_link

    warm_link()
    rng = jax.random.PRNGKey(7)
    shapes = {
        "layer1_3x3": ((batch * 6, 56, 56, 64), (3, 3, 64, 64)),
        "layer2_3x3": ((batch * 6, 28, 28, 128), (3, 3, 128, 128)),
        "layer3_3x3": ((batch * 6, 14, 14, 256), (3, 3, 256, 256)),
        "layer1_1x1_256": ((batch * 6, 56, 56, 64), (1, 1, 64, 256)),
    }
    out = {}
    for name, (xs_shape, w_shape) in shapes.items():
        kx, kw, rng = jax.random.split(rng, 3)
        w = jax.random.normal(kw, w_shape, jnp.bfloat16)
        w8 = (jax.random.randint(kw, w_shape, -127, 128, jnp.int32)
              .astype(jnp.int8))

        @jax.jit
        def mk(k, s=xs_shape):
            return (jax.random.normal(k, s, jnp.bfloat16),
                    jax.random.randint(k, s, -127, 128, jnp.int32
                                       ).astype(jnp.int8))
        pairs = [mk(jax.random.fold_in(kx, i)) for i in range(n_iters)]
        xb = jnp.stack([p[0] for p in pairs])
        x8 = jnp.stack([p[1] for p in pairs])

        dn = jax.lax.conv_dimension_numbers(xs_shape, w_shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def conv_bf16(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn)

        def conv_int8(x):
            return jax.lax.conv_general_dilated(
                x, w8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        t_b = _scan_time(jax, jnp, conv_bf16, xb, n_iters)
        try:
            t_8 = _scan_time(jax, jnp, conv_int8, x8, n_iters)
        except Exception as e:  # int8 conv may not lower on this libtpu
            t_8 = None
            out[f"{name}_int8_error"] = str(e)[:200]
        out[name] = {"bf16_ms": round(t_b, 2),
                     "int8_ms": round(t_8, 2) if t_8 else None,
                     "speedup": round(t_b / t_8, 2) if t_8 else None}
    print(json.dumps({"metric": "conv_int8_vs_bf16_ms", "batch": batch,
                      **out}), flush=True)
    return out


def profile_pool(batch, n_iters):
    """Stem-pool forms at [batch*6, 112, 112, 64] bf16: materialized
    cube_pad+pool vs the fused op (reduce_window interior) vs the fused op
    with a 9-strided-slice max tree."""
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.layers import max_pool
    from cp360_tpu.ops.cube_pad import (
        build_cube_pad_index_map,
        cube_pad,
        cube_pad_max_pool_3x3s2,
    )
    from cp360_tpu.utils.transfer import warm_link

    warm_link()
    h, c = 112, 64
    key = jax.random.PRNGKey(3)

    @jax.jit
    def mk(k):
        return jax.random.normal(k, (batch, 6, h, h, c), jnp.bfloat16)

    xs = jnp.stack([mk(jax.random.fold_in(key, i)) for i in range(n_iters)])

    def unfused(x):
        return max_pool(cube_pad(x, 1).reshape(-1, h + 2, h + 2, c), 3, 2)

    def fused(x):
        return cube_pad_max_pool_3x3s2(x)

    def fused9(x):
        n = x.shape[0]
        m = build_cube_pad_index_map(h, h, 1)
        ring_t = jnp.asarray(m[:, 0, : h + 1].reshape(-1))
        ring_l = jnp.asarray(m[:, : h + 1, 0].reshape(-1))
        flat = x.reshape(n, 6 * h * h, c)
        halo_t = jnp.take(flat, ring_t, axis=1).reshape(n, 6, h + 1, c)
        halo_l = jnp.take(flat, ring_l, axis=1).reshape(n, 6, h + 1, c)
        neg = jnp.asarray(-jnp.inf, x.dtype)
        xp = jnp.pad(x.reshape(n * 6, h, h, c),
                     [(0, 0), (1, 0), (1, 0), (0, 0)], constant_values=neg)
        oh = h // 2
        pooled = None
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(xp, (0, dy, dx, 0),
                                  (n * 6, dy + 2 * oh - 1, dx + 2 * oh - 1, c),
                                  (1, 2, 2, 1))
                pooled = s if pooled is None else jnp.maximum(pooled, s)
        pooled = pooled.reshape(n, 6, oh, oh, c)

        def win3(s):
            return jnp.maximum(jnp.maximum(s[:, :, 0:-2:2], s[:, :, 1:-1:2]),
                               s[:, :, 2::2])

        row0 = jnp.maximum(pooled[:, :, 0], win3(halo_t))
        pooled = jnp.concatenate([row0[:, :, None], pooled[:, :, 1:]], axis=2)
        col0 = jnp.maximum(pooled[:, :, :, 0], win3(halo_l))
        return jnp.concatenate([col0[:, :, :, None], pooled[:, :, :, 1:]],
                               axis=3)

    a = np.asarray(fused9(xs[0]), np.float32)
    b = np.asarray(fused(xs[0]), np.float32)
    assert np.array_equal(a, b), np.max(np.abs(a - b))

    out = {}
    for name, fn in (("unfused_ms", unfused), ("fused_rw_ms", fused),
                     ("fused_9slice_ms", fused9)):
        out[name] = round(_scan_time(jax, jnp, fn, xs, n_iters), 2)
    print(json.dumps({"metric": "stem_pool_forms_ms", "batch": batch, **out}),
          flush=True)
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mode = sys.argv[3] if len(sys.argv) > 3 else "prefix"
    if mode in ("prefix", "all"):
        profile_prefixes(batch, n_iters)
    if mode in ("im2col", "all"):
        profile_im2col(batch, n_iters)
    if mode in ("int8", "all"):
        profile_int8(batch, n_iters)
    if mode in ("pool", "all"):
        profile_pool(batch, n_iters)


if __name__ == "__main__":
    main()
