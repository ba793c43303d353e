"""Multi-process launcher: the ``torchrun`` equivalent for this framework.

The reference is strictly single-GPU (SURVEY.md §2); this framework's CLIs
all join a ``jax.distributed`` runtime when the rendezvous env is set
(``parallel/mesh.py::maybe_init_distributed``).  This launcher wires that
env and babysits N worker processes on one host:

    python -m cp360_tpu.cli.launch --nprocs 2 -- \
        python -m cp360_tpu.cli.train_temporal --input arts --set mesh_data=8

Each worker gets CP360_DIST/CP360_COORDINATOR/CP360_NUM_PROCESSES/
CP360_PROCESS_ID; output is streamed live with a ``[pN]`` prefix.  The
first worker to fail takes the whole job down (SIGTERM to the rest — the
training CLI checkpoints on it).  On a real multi-host pod, run one worker
per host and point --coordinator at host 0 instead (or use the cloud
launcher's auto-detection; maybe_init_distributed defers to it).

``--devices-per-proc K`` adds ``--xla_force_host_platform_device_count=K``
for CPU-backend rehearsal of a multi-chip topology (pair with
``CP360_PLATFORM=cpu``).
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, cmd = argv[:split], argv[split + 1:]
    else:
        own, cmd = argv, []
    parser = argparse.ArgumentParser(
        description=__doc__, prog="python -m cp360_tpu.cli.launch")
    parser.add_argument("--nprocs", type=int, required=True,
                        help="number of worker processes on this host")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 (default: a free local "
                             "port — single-host mode)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="global process count (default: --nprocs; set "
                             "when launching across several hosts)")
    parser.add_argument("--proc-id-offset", type=int, default=0,
                        help="first global process id owned by this host")
    parser.add_argument("--devices-per-proc", type=int, default=None,
                        help="force K virtual CPU devices per worker "
                             "(topology rehearsal without chips)")
    args = parser.parse_args(own)
    if not cmd:
        parser.error("no worker command given (separate it with `--`)")

    coordinator = args.coordinator or f"127.0.0.1:{_free_port()}"
    num_processes = args.num_processes or args.nprocs

    procs: list = []
    failed: list = []
    lock = threading.Lock()

    def pump(p, pid):
        for line in iter(p.stdout.readline, b""):
            sys.stdout.buffer.write(f"[p{pid}] ".encode() + line)
            sys.stdout.flush()

    for i in range(args.nprocs):
        pid = args.proc_id_offset + i
        env = dict(
            os.environ,
            CP360_DIST="1",
            CP360_COORDINATOR=coordinator,
            CP360_NUM_PROCESSES=str(num_processes),
            CP360_PROCESS_ID=str(pid),
        )
        if args.devices_per_proc:
            # replace (not append) any inherited device-count forcing
            kept = [f for f in env.get("XLA_FLAGS", "").split()
                    if not f.startswith("--xla_force_host_platform_device_count")]
            env["XLA_FLAGS"] = " ".join(
                kept + [f"--xla_force_host_platform_device_count="
                        f"{args.devices_per_proc}"])
        p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, start_new_session=True)
        procs.append(p)
        threading.Thread(target=pump, args=(p, pid), daemon=True).start()

    def reap(p, pid):
        rc = p.wait()
        with lock:
            if rc != 0:
                failed.append((pid, rc))

    reapers = [threading.Thread(target=reap, args=(p, args.proc_id_offset + i))
               for i, p in enumerate(procs)]
    for t in reapers:
        t.start()

    try:
        while any(t.is_alive() for t in reapers):
            for t in reapers:
                t.join(timeout=0.5)
            if failed:
                break
    except KeyboardInterrupt:
        failed.append(("launcher", "interrupted"))

    if failed:
        # take the survivors down; SIGTERM first (training checkpoints on it)
        print(f"launch: worker failure {failed[:1][0]} — terminating the rest",
              file=sys.stderr)
        for p in procs:
            if p.poll() is None:
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGTERM)
                except ProcessLookupError:
                    pass
        for p in procs:
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                try:
                    # the child can die (and be reaped by its reaper
                    # thread) between the timeout and this kill
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
                p.wait()
        return 1
    for t in reapers:
        t.join()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
