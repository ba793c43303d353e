"""Stage-2 CLI: weakly-supervised ConvLSTM training over stage-1 artifacts.

Reference driver: temporal_model/train_temporal.py (flags --input/--motion +
loss-weight overrides --sml/--tmpl/--mml/--lr — which in the reference would
throw on an immutable namedtuple; here they work).  Usage:

    python -m cp360_tpu.cli.train_temporal --input output/static_resnet50 \
        [--motion PATH] [--resume] [--data-parallel N]
"""

from __future__ import annotations

import argparse


import jax

from cp360_tpu.compat.torch_weights import load_npz
from cp360_tpu.config import add_config_overrides, config_from_args
from cp360_tpu.data.dataset import PrefetchLoader, WindowDataset, builtin_split
from cp360_tpu.models.clstm import init_clstm_params
from cp360_tpu.train.loop import checkpoint_dir, latest_checkpoint, train


def main(argv=None):
    from cp360_tpu.utils.platform import apply_platform, apply_platform_env

    apply_platform_env()
    # allow_abbrev=False: an abbreviated --supervise would survive
    # strip_supervise_flag and nest supervisors recursively in the child
    parser = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    parser.add_argument("--input", type=str, required=True, help="stage-1 artifact root")
    parser.add_argument("--motion", type=str, default=None, help="motion root (default: --input)")
    parser.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    parser.add_argument("--data-parallel", type=int, default=None,
                        help="shard batches over N devices")
    parser.add_argument("--metrics-jsonl", type=str, default=None,
                        help="write structured train metrics to this JSONL file")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of the run")
    parser.add_argument("--supervise", nargs="?", type=float, const=420.0,
                        default=None, metavar="STALL_S",
                        help="run under a restart-on-stall supervisor "
                             "(utils/supervise.py); restarts resume the full "
                             "train state (--resume is implied for the child)")
    add_config_overrides(parser)
    args, _unknown = parser.parse_known_args(argv)
    from cp360_tpu.config import warn_ignored_args

    warn_ignored_args(_unknown)
    cfg = config_from_args(args)
    apply_platform(cfg)
    if args.supervise is not None:
        import os
        import sys

        from cp360_tpu.utils.supervise import strip_supervise_flag, supervise

        if (os.environ.get("CP360_DIST") == "1"
                and int(os.environ.get("CP360_NUM_PROCESSES", "1") or 1) > 1):
            raise SystemExit(
                "--supervise cannot wrap ONE worker of a multi-process job: "
                "a relaunched worker cannot rejoin the running "
                "jax.distributed incarnation and every peer would hang in "
                "its next collective. Supervise the whole launch instead "
                "(wrap `python -m cp360_tpu.cli.launch ...`).")

        child_argv = strip_supervise_flag(
            list(argv) if argv is not None else sys.argv[1:])
        if "--resume" not in child_argv:
            child_argv.append("--resume")  # a restart must continue, not redo
        watch = [checkpoint_dir(cfg)]
        if args.metrics_jsonl:
            watch.append(args.metrics_jsonl)
        raise SystemExit(supervise(
            [sys.executable, "-m", "cp360_tpu.cli.train_temporal"] + child_argv,
            watch_paths=watch,
            stall_timeout_s=args.supervise,
            # SIGTERM triggers GracefulShutdown (full-state checkpoint) —
            # give a healthy-but-slow step time to finish saving before
            # the SIGKILL escalation
            grace_s=60.0,
        ))
    if args.profile_dir:
        cfg = cfg.replace(profile_dir=args.profile_dir)

    ds = WindowDataset(
        args.input, args.motion, builtin_split("train_60"), cfg.seq_len
    )
    if len(ds) == 0:
        raise SystemExit(f"no training windows found under {args.input}")
    print(f"{len(ds)} training windows")
    batch_size = cfg.batch_size
    if cfg.segment_windows > 1:
        # segment ingestion: each batch element is a contiguous run of
        # segment_windows stride-1 windows, shipped as ONE frame run and
        # re-windowed in-graph (train/loop.py::expand_segments)
        if cfg.batch_size % cfg.segment_windows:
            raise SystemExit(
                f"batch_size ({cfg.batch_size}) must be divisible by "
                f"segment_windows ({cfg.segment_windows})"
            )
        from cp360_tpu.data.dataset import SegmentWindowDataset

        ds = SegmentWindowDataset(ds, cfg.segment_windows)
        batch_size = cfg.batch_size // cfg.segment_windows
        print(f"{len(ds)} segments of {cfg.segment_windows} windows "
              f"({ds.n_windows} windows reachable)")
    loader = PrefetchLoader(
        ds, batch_size=batch_size, shuffle=True, num_threads=cfg.processes,
        transfer_codec=cfg.transfer_codec,
    )

    # --data-parallel overrides the config's mesh_data; mesh_model comes
    # from config (tensor-parallel ConvLSTM channels).
    if args.data_parallel:
        cfg = cfg.replace(mesh_data=args.data_parallel)
    from cp360_tpu.parallel.mesh import maybe_init_distributed, mesh_from_config

    maybe_init_distributed()
    mesh = mesh_from_config(cfg)
    from cp360_tpu.utils.transfer import warm_link

    # absorb the degraded-tunnel cold first-fetch BEFORE any supervised
    # silence window; heartbeats keep a --supervise parent's clock alive
    warm_link()


    per_host = False
    if mesh is not None:
        import jax as _jax

        if _jax.process_count() > 1:
            # multi-host IO scale-out: each host reads only its own span of
            # every (identically-shuffled) global batch from disk
            from cp360_tpu.parallel.mesh import local_rows_slice

            loader.rows = local_rows_slice(mesh, batch_size)
            per_host = True
            print(f"per-host feeding: process {_jax.process_index()} loads "
                  f"batch rows [{loader.rows.start}:{loader.rows.stop}) "
                  f"of {batch_size}")

    params = None
    resume_state = None
    if args.resume:
        from cp360_tpu.train.checkpoint import make_checkpointer

        probe = make_checkpointer(cfg.checkpoint_backend, checkpoint_dir(cfg))
        if probe.has_state():
            resume_state = "latest"  # exact resume: params + optimizer + step
        else:
            ck = latest_checkpoint(checkpoint_dir(cfg))
            if ck:
                print(f"resuming weights from {ck} (no full train state found)")
                params = load_npz(ck)
        probe.close()
    if params is None:
        params = init_clstm_params(jax.random.PRNGKey(0), cfg.input_size, cfg.hidden_size)

    train(cfg, loader, params=params, mesh=mesh,
          metrics_jsonl=args.metrics_jsonl, resume_state=resume_state,
          per_host_batches=per_host)


if __name__ == "__main__":
    main()
