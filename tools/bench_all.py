"""Run the whole bench set on the real chip, safely, in one command.

Encodes this host's measurement rules (CLAUDE.md / RUNBOOK.md) so a
validation pass after a tunnel outage is one invocation:

  - probe tunnel health first (bounded jax.devices() + a timed 1k matmul
    sync in a SUBPROCESS — a wedged probe must not wedge the runner);
  - ONE TPU process at a time (concurrent axon clients wedge each other);
  - every bench bounded by its own timeout and run in a subprocess;
  - results are only comparable same-phase: the report records wall-clock
    start/end per bench so phases can be judged.

Usage: python tools/bench_all.py [--quick] [--out report.json]

Benches (each optional-skipped on failure, the runner always finishes):
  stage1    bench.py (the driver headline: frames/s, int8 codec default;
            carries the compute-only device_fps field since round 4)
  stage1_exact  bench.py BENCH_CODEC=none (same-phase exact-path pair)
  stage2    tools/bench_stage2.py (device-resident windows/s)
  stream    tools/bench_stream.py (fused stage1+2 streaming fps)
  train     tools/bench_train.py (device-resident windows/s)
  link      tools/measure_link.py (H2D/D2H/duplex MB/s + budget table)
  flow      tools/flow_backend_report.py --throughput (pairs/s, batched)
  serve     tools/bench_serve.py --sweep (1/4/16-client mixed load)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = """
import os, time, sys
import jax, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
t_dev = time.time() - t0
import numpy as np
# distinct payload per invocation: the tunnel content-dedups repeated
# buffers, so a fixed-seed probe would stop exercising the link after the
# first run and could pass on a degraded tunnel
rs = np.random.RandomState(os.getpid() & 0x7FFFFFFF)
x = jnp.asarray(rs.rand(1024, 1024), jnp.bfloat16)
# first fetch separately: in degraded-tunnel phases the FIRST D2H of a
# process wedges 100-420 s and then everything is normal (measured
# 2026-08-19; utils/transfer.py::warm_link) — health is judged on the
# SECOND, warm fetch, and the cold time is reported so the runner can
# extend per-bench budgets (every bench subprocess pays it once)
t0 = time.time()
y = (x @ x).block_until_ready()
np.asarray(y[:8, :8])
t_cold = time.time() - t0
x2 = jnp.asarray(rs.rand(1024, 1024), jnp.bfloat16)
t0 = time.time()
y2 = (x2 @ x2).block_until_ready()
np.asarray(y2[:8, :8])  # force a real fetch through the tunnel
t_mm = time.time() - t0
print(f"PROBE_OK devices={len(d)} dev_s={t_dev:.1f} cold_s={t_cold:.1f} mm_s={t_mm:.1f}")
sys.exit(0 if t_mm < 30 else 4)
"""


def run(cmd, timeout, env=None):
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env, cwd=REPO)
        out, rc = (p.stdout or "") + (p.stderr or ""), p.returncode
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
        rc = "timeout"
    return out, rc, time.time() - t0, t0


def probe(timeout=600):
    """Bounded health probe. Returns (healthy, cold_fetch_s).

    cold_fetch_s is the per-process first-fetch wedge (0-ish when the
    tunnel is fully healthy, 100-420 s in the degraded phase); callers add
    it to every subprocess budget since each bench pays it once."""
    env = dict(os.environ)
    if env.get("CP360_ALLOW_COMPILE_CACHE") != "1":
        # measure the tunnel, not the compile-cache wedge (deserialized
        # executables hang this plugin — cli/doctor.py::_compile_cache);
        # keep in sync with doctor's _device_probe env handling
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    out, rc, dur, _ = run([sys.executable, "-c", PROBE], timeout, env=env)
    healthy = rc == 0 and "PROBE_OK" in out
    line = next((ln for ln in out.splitlines() if "PROBE_OK" in ln), out[-200:])
    cold_s = 0.0
    if "cold_s=" in line:
        cold_s = float(line.split("cold_s=")[1].split()[0])
    print(f"probe: {'HEALTHY' if healthy else 'UNHEALTHY'} ({dur:.0f}s) {line}",
          file=sys.stderr)
    return healthy, cold_s


def last_json_line(out):
    for ln in reversed(out.splitlines()):
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except ValueError:
                continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer attempts / shorter budgets")
    ap.add_argument("--out", default="/tmp/bench_all.json")
    ap.add_argument("--skip", default="",
                    help="comma-separated bench names to skip")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    healthy, cold_s = probe()
    if not healthy:
        print("tunnel unhealthy — refusing to burn bench budgets; re-run "
              "when the probe passes", file=sys.stderr)
        json.dump({"healthy": False, "ts": time.time()},
                  open(args.out, "w"))
        return 4

    # degraded (cold-first-fetch) phase: every bench subprocess pays one
    # cold fetch before its warmup, so extend every budget by a cold
    # allowance and push bench.py's in-worker watchdog out by the same
    cold_allow = 0
    if cold_s > 30:
        cold_allow = max(540, int(2 * cold_s))
        print(f"probe: degraded phase (cold first-fetch {cold_s:.0f}s) — "
              f"adding {cold_allow}s to every bench budget", file=sys.stderr)

    py = sys.executable
    attempts = "1" if args.quick else "2"
    benches = [
        ("stage1", [py, "bench.py"],
         dict(BENCH_ATTEMPTS=attempts), 620),
        ("stage1_exact", [py, "bench.py"],
         dict(BENCH_ATTEMPTS=attempts, BENCH_CODEC="none"), 620),
        ("stage2", [py, "tools/bench_stage2.py"], {}, 480),
        ("stream", [py, "tools/bench_stream.py"], {}, 480),
        # batch 16 is the measured saturation point (PARITY.md)
        ("train", [py, "tools/bench_train.py", "16", "8"], {}, 540),
        ("link", [py, "tools/measure_link.py"], {}, 480),
        ("flow", [py, "tools/flow_backend_report.py", "--throughput", "480"],
         {}, 580),
        # max_batch 4 bounds warmup: each power-of-two bucket is a separate
        # remote compile for BOTH the saliency and the temporal batcher
        ("serve", [py, "tools/bench_serve.py", "--sweep", "6", "4"], {}, 900),
    ]
    report = {"healthy": True, "ts": time.time(), "results": {},
              "cold_fetch_s": round(cold_s, 1)}
    for name, cmd, extra_env, budget in benches:
        if name in skip:
            continue
        env = dict(os.environ, **extra_env)
        budget += cold_allow
        if cold_allow and cmd[1] == "bench.py":
            # keep the in-worker wall-clock watchdog beyond the cold fetch
            env.setdefault("BENCH_HARD_S", str(540 + cold_allow))
        print(f"=== {name}: {' '.join(cmd)} (budget {budget}s)",
              file=sys.stderr)
        out, rc, dur, t0 = run(cmd, budget, env)
        parsed = last_json_line(out)
        report["results"][name] = {
            "rc": rc, "wall_s": round(dur, 1), "t_start": t0,
            "json": parsed,
            "tail": out.strip().splitlines()[-3:],
        }
        print(f"=== {name}: rc={rc} {dur:.0f}s -> {parsed}", file=sys.stderr)
        # re-probe between benches: a wedged phase poisons what follows
        # (each re-probe is a fresh process, so it re-pays the cold fetch —
        # that is the point: it measures what the NEXT bench will see)
        healthy, cold_s = probe()
        cold_allow = max(540, int(2 * cold_s)) if cold_s > 30 else 0
        if not healthy:
            report["degraded_after"] = name
            print("tunnel degraded mid-run — stopping; the remaining "
                  "benches would measure the outage, not the code",
                  file=sys.stderr)
            break
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        k: ((v.get("json") or {}).get("value")
            or (v["tail"][-1] if v["tail"] else None))
        for k, v in report["results"].items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
