"""On-chip A/B of the chroma-upsample forms (pipelines/extract.py).

'take' is the original jnp.take bilinear 2x upsample; 'slice' rebuilds the
static tap pattern from shifted slices + a stack/reshape interleave (no
gather; bit-identical on CPU — tests/test_extract.py).  jnp.take of short
rows is this libtpu's measured gather pathology (CLAUDE.md), and the r4
profile put the whole yuv+norm phase at ~2.7 ms/batch — the upsample
gathers are the only non-elementwise work in it.

Each form runs in its own SUBPROCESS (the form is a module-level env
resolve) and times the IDENTICAL full fused stage-1 graph bench.py's
device_fps reports (pipelines/extract.py::stage1_batch_faces_yuv, int8
codec), scanned in one dispatch per rep (standalone timings lie through
this relay — CLAUDE.md).

Usage: python tools/bench_yuv_up.py [batch=16] [n_frames=192]
Prints one JSON line per form + a summary.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _worker(form, batch, n_frames):
    os.environ["CP360_YUV_UP"] = form
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.pipelines import extract as ex
    from cp360_tpu.utils.transfer import warm_link

    assert ex._YUV_UP_FORM == form
    warm_link()
    n_iters = max(2, n_frames // batch)
    params = jax.device_put(init_resnet_params(jax.random.PRNGKey(0),
                                               "resnet50"))

    @jax.jit
    def make(k):
        ky, kuv = jax.random.split(k)
        y = jax.random.randint(ky, (batch, 6, 224, 224), 0, 256, jnp.uint8)
        uv = jax.random.randint(kuv, (batch, 6, 112, 112, 2), 0, 256,
                                jnp.uint8)
        return y, uv

    key = jax.random.PRNGKey(7)
    planes = [make(jax.random.fold_in(key, i)) for i in range(n_iters)]
    ys = jnp.stack([p[0] for p in planes])
    uvs = jnp.stack([p[1] for p in planes])

    @jax.jit
    def scanned(ys, uvs):
        def body(a, yuv):
            outs = ex.stage1_batch_faces_yuv(
                params, *yuv, arch="resnet50", use_cube_pad=True,
                compute_dtype=jnp.bfloat16, out_dtype=jnp.float16,
                codec="int8")
            return a + sum(jnp.sum(o[:1, :1].astype(jnp.float32))
                           for o in outs), None
        a, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (ys, uvs))
        return a

    t0 = time.time()
    assert np.isfinite(float(scanned(ys, uvs)))  # compile + warm
    compile_s = time.time() - t0
    reps = []
    for _ in range(5):
        t0 = time.time()
        assert np.isfinite(float(scanned(ys, uvs)))
        reps.append(time.time() - t0)
    fps = [batch / (r / n_iters) for r in reps]
    print(json.dumps({
        "metric": "yuv_up_form",
        "form": form,
        "batch": batch,
        "n_iters": n_iters,
        "ms_per_batch": round(float(np.median(reps)) / n_iters * 1e3, 2),
        "fps": round(float(np.median(fps)), 1),
        "fps_iqr": [round(float(np.percentile(fps, 25)), 1),
                    round(float(np.percentile(fps, 75)), 1)],
        "compile_s": round(compile_s, 1),
    }), flush=True)


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    if argv and argv[0] == "worker":
        _worker(argv[1], int(argv[2]), int(argv[3]))
        return
    batch = int(argv[0]) if argv else 16
    n_frames = int(argv[1]) if len(argv) > 1 else 192

    worker_timeout = int(os.environ.get("BENCH_YUV_UP_TIMEOUT_S", "560"))
    results = []
    for form in ("take", "slice"):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", form,
                 str(batch), str(n_frames)],
                capture_output=True, text=True, timeout=worker_timeout)
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": "yuv_up_form", "form": form,
                              "error": f"timeout {worker_timeout}s"}),
                  flush=True)
            continue
        for ln in p.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                results.append(json.loads(ln))
                print(ln, flush=True)
        if p.returncode != 0:
            print(json.dumps({"metric": "yuv_up_form", "form": form,
                              "error": (p.stderr or "")[-400:]}), flush=True)
    ok = [r for r in results if "fps" in r]
    if ok:
        best = max(ok, key=lambda r: r["fps"])
        print(json.dumps({"metric": "yuv_up_form_best",
                          "form": best["form"], "fps": best["fps"]}),
              flush=True)


if __name__ == "__main__":
    main()
