"""The multi-process launcher CLI (cli/launch.py) with real workers."""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_launcher(extra, cmd, timeout=360):
    argv = [sys.executable, "-m", "cp360_tpu.cli.launch"] + extra + ["--"] + cmd
    return subprocess.run(argv, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)


def test_launch_runs_two_distributed_workers():
    """The launcher wires the rendezvous env: the real 2-process worker
    (same one test_distributed uses) joins an 8-device runtime under it."""
    worker = os.path.join(REPO, "tests", "distributed_worker.py")
    res = _run_launcher(
        ["--nprocs", "2", "--devices-per-proc", "4"],
        [sys.executable, worker],
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "[p0] DIST_OK pid=0" in res.stdout, res.stdout
    assert "[p1] DIST_OK pid=1" in res.stdout, res.stdout


def test_launch_failure_takes_down_survivors():
    """One worker failing must terminate the rest promptly (not hang until
    they finish) and exit nonzero."""
    # process id 0 sleeps forever, process id 1 exits 2 immediately
    code = ("import os, sys, time\n"
            "if os.environ['CP360_PROCESS_ID'] == '1':\n"
            "    sys.exit(2)\n"
            "time.sleep(600)\n")
    t0 = time.time()
    res = _run_launcher(["--nprocs", "2"], [sys.executable, "-c", code],
                        timeout=120)
    assert res.returncode == 1, res.stdout + res.stderr
    assert time.time() - t0 < 60, "survivors were not terminated"
    assert "worker failure" in res.stderr


def test_launch_requires_command():
    res = _run_launcher(["--nprocs", "2"], [])
    assert res.returncode == 2
    assert "no worker command" in res.stderr
