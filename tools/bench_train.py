"""Stage-2 TRAINING throughput on the real chip.

Measures the full jitted optimization step (normalize -> ConvLSTM rollout
-> equi projection -> 3 weak-supervision losses -> grads -> Adam) at the
production operating point ([6,1000,7,7] CAM windows, [480,960,2] flows,
seq_len 5).  Batches are generated ON DEVICE with per-step keys: training
data normally arrives over PCIe from the host loader, but this host's TPU
tunnel runs ~40 MB/s with content dedup (CLAUDE.md), so feeding distinct
73 MB flow batches through it would measure the tunnel, not the step.  The
loss chains through a lazy device accumulator exactly like train/loop.py —
nothing syncs per step.

Writes BENCH_TRAIN.json and prints one JSON line:
  {"metric": "train_windows_per_s", "value": ..., "vs_baseline": ...}
vs_baseline = speedup over the reference driver's measured torch-CPU
steps/s x its batch of 1 (BENCH_TRAIN_BASELINE.json).

Usage: python tools/bench_train.py [batch=4] [n_steps=8] [conv_impl=xla]
                                   [mode=device] [segment_windows=1]
(conv_impl "pallas" swaps the ConvLSTM convs to the fused Pallas kernel —
config ``clstm_conv_impl`` — for an end-to-end comparison; the JSON is only
written for the default xla path so the bench of record stays stable.
mode "host" feeds distinct host batches through the link, exact vs int8
codec; segment_windows > 1 additionally ships contiguous frame runs once
and re-windows in-graph — config ``segment_windows``.)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from cp360_tpu.config import Config
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.train.loop import make_optimizer, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    conv_impl = sys.argv[3] if len(sys.argv) > 3 else "xla"
    # mode 'device' (bench of record): batches generated on device.
    # mode 'host': distinct host batches cross the link every step, codec
    # none vs int8 — measures what the training transfer codec buys when
    # the loader (not the chip) feeds the step.  The f32 flow planes are
    # ~18.4 MB/window, so host mode on this tunnel measures the link.
    mode = sys.argv[4] if len(sys.argv) > 4 else "device"
    # host mode only: group windows into segments of G consecutive windows
    # (config segment_windows) — each frame crosses the link once and the
    # step re-windows in-graph (train/loop.py::expand_segments)
    group = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    cfg = Config(clstm_conv_impl=conv_impl, segment_windows=group)
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    if mode == "host":
        _host_mode(cfg, opt, step, batch, n_steps, group)
        return
    if group > 1:
        raise SystemExit("segment_windows only applies to mode=host")

    @partial(jax.jit, static_argnames=("b",))
    def make_batch(key, b):
        k1, k2 = jax.random.split(key)
        seq = jax.random.uniform(k1, (b, cfg.seq_len, 6, 7, 7, 1000), jnp.float32)
        flows = jax.random.normal(k2, (b, cfg.seq_len, cfg.flow_h, cfg.flow_h * 2, 2), jnp.float32)
        return seq, flows

    params = init_clstm_params(jax.random.PRNGKey(0), cfg.input_size, cfg.hidden_size)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    # warmup/compile (both graphs)
    seq, flows = make_batch(jax.random.fold_in(key, 999), batch)
    params, opt_state, m = step(params, opt_state, seq, flows)
    running = m["loss"]
    float(running)

    t0 = time.time()
    running = jnp.zeros((), jnp.float32)
    for i in range(n_steps):
        seq, flows = make_batch(jax.random.fold_in(key, i), batch)
        params, opt_state, m = step(params, opt_state, seq, flows)
        running = running + m["loss"]
    assert np.isfinite(float(running))  # one sync, after all steps
    dt = time.time() - t0

    windows_per_s = batch * n_steps / dt
    base_path = os.path.join(REPO, "BENCH_TRAIN_BASELINE.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs = windows_per_s / base["torch_cpu_steps_per_s"]  # reference batch=1

    out = {
        "metric": "train_windows_per_s",
        "value": round(windows_per_s, 3),
        "unit": "windows/s",
        "batch": batch,
        "steps": n_steps,
        "s_per_step": round(dt / n_steps, 5),
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if conv_impl != "xla":
        out["conv_impl"] = conv_impl
    else:
        with open(os.path.join(REPO, "BENCH_TRAIN.json"), "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


def _host_mode(cfg, opt, step, batch, n_steps, group=1):
    """Host-fed training throughput, exact vs int8-coded batches.

    group > 1: feed [S, F, ...] segment runs (S = batch/group windows'
    worth of segments, F = group + seq_len - 1 frames each) instead of
    [batch, seq_len, ...] windows — same optimizer math, ~group*T/(G+T-1)x
    fewer bytes on the link.
    """
    import jax
    import jax.numpy as jnp

    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.ops.quantize import Quantized, quantize_cam_np

    if batch % group:
        raise SystemExit(f"batch ({batch}) must be divisible by group ({group})")
    lead = batch // group
    frames = cfg.seq_len + group - 1
    rng = np.random.RandomState(0)
    # distinct batches per step (the tunnel content-dedups repeats);
    # f16 seq / f32 flows = what the loader reads from disk artifacts
    host = [
        (rng.rand(lead, frames, 6, 7, 7, 1000).astype(np.float16),
         (rng.randn(lead, frames, cfg.flow_h, cfg.flow_h * 2, 2) * 3)
         .astype(np.float32))
        for _ in range(n_steps + 1)
    ]
    results = {}
    for codec in ("none", "int8"):
        if codec == "int8":
            feed = [(Quantized(*quantize_cam_np(s)), Quantized(*quantize_cam_np(f)))
                    for s, f in host]
        else:
            feed = host
        params = init_clstm_params(jax.random.PRNGKey(0), cfg.input_size, cfg.hidden_size)
        opt_state = opt.init(params)
        params, opt_state, m = step(params, opt_state, *feed[-1])  # compile
        float(m["loss"])
        t0 = time.time()
        running = jnp.zeros((), jnp.float32)
        for i in range(n_steps):
            params, opt_state, m = step(params, opt_state, *feed[i])
            running = running + m["loss"]
        assert np.isfinite(float(running))
        dt = time.time() - t0
        results[codec] = batch * n_steps / dt
    mb_exact = (host[0][0].nbytes + host[0][1].nbytes) / 1e6 / batch
    out = {
        "metric": "train_windows_per_s_hostfed",
        "exact": round(results["none"], 3),
        "int8": round(results["int8"], 3),
        "unit": f"windows/s (host-fed, {mb_exact:.2f} MB/window exact)",
        "batch": batch, "steps": n_steps,
    }
    if group > 1:
        out["segment_windows"] = group
    print(json.dumps(out))


if __name__ == "__main__":
    main()
