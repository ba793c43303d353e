"""cp360-doctor: bounded environment diagnostics (cli/doctor.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, env_extra=None, timeout=180):
    env = dict(os.environ, **(env_extra or {}))
    return subprocess.run(
        [sys.executable, "-m", "cp360_tpu.cli.doctor", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)


def _summary(p):
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert len(line) == 1, p.stdout + p.stderr
    return json.loads(line[0])


def test_doctor_host_checks_pass():
    p = _run(["--skip-device"])
    s = _summary(p)
    assert p.returncode == 0 and s["ok"] and s["host_ok"]
    assert s["device_ok"] is None
    names = [c["name"] for c in s["checks"]]
    assert names == ["versions", "config", "data splits", "native loader",
                     "video codecs", "flow backends", "compile cache"]
    assert all(c["ok"] for c in s["checks"])


def test_doctor_flags_dangerous_compile_cache_combo():
    # a configured cache is survivable (CLIs auto-disable it) but fails the
    # doctor when CP360_ALLOW_COMPILE_CACHE=1 keeps it: warm starts would
    # execute cache-deserialized executables, which wedge this TPU plugin
    p = _run(["--skip-device"],
             env_extra={"JAX_COMPILATION_CACHE_DIR": "/tmp/jc"})
    s = _summary(p)
    assert p.returncode == 0 and s["ok"]
    cc = [c for c in s["checks"] if c["name"] == "compile cache"][0]
    assert cc["ok"] and "auto-disable" in cc["detail"]

    p2 = _run(["--skip-device"],
              env_extra={"JAX_COMPILATION_CACHE_DIR": "/tmp/jc",
                         "CP360_ALLOW_COMPILE_CACHE": "1"})
    s2 = _summary(p2)
    assert p2.returncode == 1 and not s2["host_ok"]
    cc2 = [c for c in s2["checks"] if c["name"] == "compile cache"][0]
    assert not cc2["ok"] and "WEDGES" in cc2["detail"]


def test_doctor_device_probe_cpu():
    # the probe honors CP360_PLATFORM like every CLI — on the cpu backend
    # it must pass fast and --require-device must exit 0
    p = _run(["--require-device", "--probe-timeout", "60"],
             env_extra={"CP360_PLATFORM": "cpu"})
    s = _summary(p)
    assert p.returncode == 0, p.stdout + p.stderr
    assert s["device_ok"] is True
    dev = [c for c in s["checks"] if c["name"] == "device"][0]
    assert "platform=cpu" in dev["detail"]


def test_doctor_require_device_fails_on_dead_probe():
    # an unloadable platform makes the bounded probe fail (not hang);
    # without --require-device the doctor still exits 0 but reports it
    env = {"CP360_PLATFORM": "definitely_not_a_platform"}
    p = _run(["--require-device", "--probe-timeout", "60"], env_extra=env)
    assert p.returncode == 1 and _summary(p)["device_ok"] is False
    p2 = _run(["--probe-timeout", "60"], env_extra=env)
    assert p2.returncode == 0
    s2 = _summary(p2)
    assert s2["ok"] and s2["host_ok"] and s2["device_ok"] is False


def test_doctor_rejects_contradictory_flags():
    # --require-device would "pass" without ever probing under --skip-device
    p = _run(["--require-device", "--skip-device"])
    assert p.returncode == 2 and "contradictory" in p.stderr
