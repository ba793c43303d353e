"""Environment diagnostics: ``cp360-doctor`` (or ``python -m
cp360_tpu.cli.doctor``).

The production failure modes on TPU hosts are environmental — a wedged
transfer tunnel, a backend that hangs at init, a missing video codec, an
unbuilt native loader — and several of them hang rather than raise, so
every accelerator-touching check here runs in a BOUNDED SUBPROCESS (a
wedged probe must never wedge the doctor).  No reference analogue; this is
the framework's §5.3 failure-detection story applied to the environment
itself.

Prints one human line per check plus a final JSON summary line; exit code
0 when everything required for CPU work passes (the accelerator check is
reported but only fails the doctor with --require-device).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_DEVICE_PROBE = """
import os, time, sys
import jax
if os.environ.get("CP360_PLATFORM"):  # same override every CLI honors
    jax.config.update("jax_platforms", os.environ["CP360_PLATFORM"])
import jax.numpy as jnp
import numpy as np
t0 = time.time(); d = jax.devices(); t_dev = time.time() - t0
# per-invocation payload: the transfer tunnel content-dedups repeated
# buffers, so a fixed seed would stop measuring the link after one run
x = jnp.asarray(np.random.RandomState(os.getpid() & 0x7FFFFFFF).rand(512, 512), jnp.bfloat16)
t0 = time.time()
y = x @ x
y.copy_to_host_async()
np.asarray(y[:8, :8])
t_mm = time.time() - t0
print(f"DOCTOR_PROBE platform={d[0].platform} n={len(d)} "
      f"init_s={t_dev:.1f} matmul_sync_s={t_mm:.1f}")
sys.exit(0 if t_mm < 30 else 4)
"""


def _check(name, fn):
    t0 = time.time()
    try:
        ok, detail = fn()
    except Exception as e:  # a check must never take the doctor down
        ok, detail = False, f"{type(e).__name__}: {e}"
    print(f"{'ok  ' if ok else 'FAIL'} {name:<22} {detail}")
    return {"name": name, "ok": bool(ok), "detail": str(detail),
            "seconds": round(time.time() - t0, 1)}


def _versions():
    import jax

    import cv2
    import numpy

    return True, (f"python {sys.version.split()[0]}, jax {jax.__version__}, "
                  f"numpy {numpy.__version__}, cv2 {cv2.__version__}")


def _config_loads():
    from cp360_tpu.config import Config, load_config

    path = os.environ.get("CP360_CONFIG", "config.yaml")
    if os.path.exists(path):
        cfg = load_config(path)
        return True, f"{path}: seq_len={cfg.seq_len} cube_dim={cfg.cube_dim}"
    Config()
    return True, f"no {path} here — built-in defaults OK"


def _splits():
    from cp360_tpu.data.dataset import builtin_split

    n = {s: len(builtin_split(s)) for s in ("test_25", "train_60")}
    ok = n == {"test_25": 25, "train_60": 60}
    return ok, f"{n} (reference-verbatim lists)"


def _native_loader():
    from cp360_tpu import native

    if native.available():
        return True, "libnpy_loader.so loaded (GIL-free batch reads)"
    return True, "unavailable — python fallback active (functional, slower)"


def _video_codecs():
    import cv2
    import numpy as np

    path = "/tmp/cp360_doctor_probe.mp4"
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 32))
    ok_w = w.isOpened()
    if ok_w:
        w.write(np.zeros((32, 64, 3), np.uint8))
        w.release()
        cap = cv2.VideoCapture(path)
        ok_r, _ = cap.read()
        cap.release()
        os.unlink(path)
        if ok_r:
            return True, "mp4 write+decode OK"
        return False, "mp4 writes but does not decode"
    return False, "no mp4v encoder in this cv2 build"


def _flow_backend():
    import cv2

    backends = []
    if hasattr(cv2, "optflow") and hasattr(cv2.optflow, "createOptFlow_DeepFlow"):
        backends.append("deepflow")  # the reference's backend when present
    if hasattr(cv2, "calcOpticalFlowFarneback"):
        backends.append("farneback")
    # the two pure-JAX solvers need no host library — always available
    backends.append("horn_schunck (device)")
    backends.append("variational (device)")
    # at least one HOST backend must exist beside the always-present device
    # solvers (the reference protocol's default flow path runs on host)
    ok = any(not b.endswith("(device)") for b in backends)
    return ok, f"flow backends: {', '.join(backends)}"


def _compile_cache():
    """Persistent compilation cache sanity (CLAUDE.md: executing a
    cache-DESERIALIZED executable wedges this TPU plugin forever)."""
    configured = bool(os.environ.get("JAX_COMPILATION_CACHE_DIR"))
    allow = os.environ.get("CP360_ALLOW_COMPILE_CACHE") == "1"
    if configured and allow:
        return False, ("JAX_COMPILATION_CACHE_DIR set AND "
                       "CP360_ALLOW_COMPILE_CACHE=1 — warm starts will "
                       "execute cache-deserialized executables, which "
                       "WEDGES this TPU plugin")
    if configured:
        return True, ("JAX_COMPILATION_CACHE_DIR set — CLIs auto-disable "
                      "it before TPU work (deserialized executables wedge "
                      "this plugin)")
    return True, "persistent compile cache not configured (good)"


def _device_probe(timeout_s: float):
    env = dict(os.environ)
    if env.get("CP360_ALLOW_COMPILE_CACHE") != "1":
        # the probe must measure the tunnel, not the compile-cache wedge
        # (deserialized executables hang this plugin — see _compile_cache);
        # the product CLIs strip this the same way via guard_compile_cache
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", _DEVICE_PROBE],
                           capture_output=True, text=True, timeout=timeout_s,
                           env=env)
    except subprocess.TimeoutExpired:
        return False, (f"backend init/probe HUNG >{timeout_s:.0f}s — tunnel "
                       "outage? (CP360_PLATFORM=cpu for host-only work)")
    line = next((ln for ln in (p.stdout or "").splitlines()
                 if ln.startswith("DOCTOR_PROBE")), None)
    if p.returncode == 0 and line:
        return True, f"{line.removeprefix('DOCTOR_PROBE ')} ({time.time()-t0:.0f}s)"
    if p.returncode == 4 and line:
        return False, f"DEGRADED: {line.removeprefix('DOCTOR_PROBE ')}"
    tail = ((p.stderr or "").strip().splitlines() or ["no output"])[-1]
    return False, f"probe failed rc={p.returncode}: {tail[:160]}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="cp360-doctor", description="environment diagnostics")
    ap.add_argument("--require-device", action="store_true",
                    help="exit nonzero unless the accelerator probe passes")
    ap.add_argument("--probe-timeout", type=float, default=90.0,
                    help="seconds before declaring the device probe hung")
    ap.add_argument("--skip-device", action="store_true",
                    help="host-only checks (never touches a backend)")
    args = ap.parse_args(argv)
    if args.require_device and args.skip_device:
        ap.error("--require-device and --skip-device are contradictory: "
                 "the device gate would pass without ever probing")

    checks = [
        _check("versions", _versions),
        _check("config", _config_loads),
        _check("data splits", _splits),
        _check("native loader", _native_loader),
        _check("video codecs", _video_codecs),
        _check("flow backends", _flow_backend),
        _check("compile cache", _compile_cache),
    ]
    if not args.skip_device:
        checks.append(_check("device", lambda: _device_probe(args.probe_timeout)))

    host_ok = all(c["ok"] for c in checks if c["name"] != "device")
    dev = next((c for c in checks if c["name"] == "device"), None)
    ok = host_ok and (dev["ok"] if (args.require_device and dev) else True)
    print(json.dumps({"ok": ok, "host_ok": host_ok,
                      "device_ok": dev["ok"] if dev else None,
                      "checks": checks}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
