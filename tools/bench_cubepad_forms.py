"""A/B the cube_pad execution forms inside the stage-1 backbone, on chip.

Round-4 profiling (`tools/profile_stage1.py`) showed the cube-padded
ResNet-50 forward costs 29.8 ms per 16-frame batch vs 18.4 ms zero-padded —
the padding permutation eats 38% of the backbone.  Candidate forms (all
exact-equal, tests/test_cube_pad.py):

  explicit  slice/flip/concat (round-1 default; the final width-axis concat
            rewrites the whole tensor across the (8,128) tiling)
  dus       zero-pad + dynamic_update_slice strip writes (touches only the
            halo bytes after one aligned pad copy)
  gather    one jnp.take over the precomputed index map (known-pathological
            lowering for large C — kept for reference)

The form is baked into traces at import (CP360_CUBE_PAD_FORM), so each form
runs in its own subprocess.  Per form: every distinct pad shape of the
resnet50 forward, scanned (one dispatch, accumulator-chained — per-call
dispatch through this relay costs tens of ms), plus the full backbone.

Usage: python tools/bench_cubepad_forms.py [--forms explicit,dus] [batch=16]
Prints one JSON line: ms per pad call by shape, and backbone ms/batch.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPES = [
    ("stem_224x3", (6, 224, 224, 3), 3, 1),
    ("l1_56x64", (6, 56, 56, 64), 1, 3),
    ("l2_28x128", (6, 28, 28, 128), 1, 4),
    ("l3_14x256", (6, 14, 14, 256), 1, 6),
    ("l4_7x512", (6, 7, 7, 512), 1, 3),
]


def _worker(form, batch, n_iters):
    os.environ["CP360_CUBE_PAD_FORM"] = form
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.ops import cube_pad as cp
    from cp360_tpu.pipelines.extract import _backbone_cam
    from cp360_tpu.utils.transfer import warm_link

    assert cp.CUBE_PAD_FORM == form
    warm_link()
    key = jax.random.PRNGKey(7)
    out = {"form": form, "batch": batch, "pad_ms": {}}

    def scan_ms(fn, xs):
        @jax.jit
        def scanned(xs):
            def body(a, x):
                o = fn(x)
                return a + jnp.sum(o.reshape(-1)[:2].astype(jnp.float32)), None
            a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return a
        float(scanned(xs))
        t0 = time.time()
        assert np.isfinite(float(scanned(xs)))
        return (time.time() - t0) / xs.shape[0] * 1e3

    total_est = 0.0
    for name, shape, pad, count in SHAPES:
        xs = jax.random.normal(
            key, (n_iters, batch) + shape, jnp.bfloat16)
        ms = scan_ms(lambda x: cp.cube_pad(x, pad), xs)
        out["pad_ms"][name] = round(ms, 3)
        total_est += ms * count
        del xs
    out["pad_total_est_ms"] = round(total_est, 2)

    params = jax.device_put(init_resnet_params(jax.random.PRNGKey(0),
                                               "resnet50"))
    cubes = jax.random.normal(
        key, (n_iters, batch, 6, 224, 224, 3), jnp.bfloat16)
    out["backbone_ms"] = round(scan_ms(
        lambda c: _backbone_cam(params, c.astype(jnp.float32), "resnet50",
                                True, jnp.bfloat16)[0], cubes), 2)
    print(json.dumps(out), flush=True)


def main():
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        form = sys.argv[i + 1]
        batch = int(sys.argv[i + 2])
        n_iters = int(sys.argv[i + 3])
        _worker(form, batch, n_iters)
        return
    forms = "explicit,dus"
    argv = sys.argv[1:]
    if argv and argv[0].startswith("--forms"):
        forms = argv[0].split("=", 1)[1] if "=" in argv[0] else argv[1]
        argv = argv[2 if "=" not in sys.argv[1] else 1:]
    batch = int(argv[0]) if argv else 16
    n_iters = int(argv[1]) if len(argv) > 1 else 20
    results = {}
    for form in forms.split(","):
        env = dict(os.environ, CP360_CUBE_PAD_FORM=form)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", form,
             str(batch), str(n_iters)],
            capture_output=True, text=True, timeout=560, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [ln for ln in (p.stdout or "").splitlines()
                if ln.startswith("{")]
        results[form] = json.loads(line[-1]) if line else {
            "error": (p.stderr or "")[-300:]}
        print(f"{form}: {results[form]}", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "cube_pad_forms", "batch": batch,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
