"""Stage-1 CLI: extract CAM cubes / flow / images from Wild-360 videos.

Reference driver: static_model/dataset_feat_extractor.py (flags -oi/-of/-om,
--out, --mode; video selection from config test_mode/train_mode + the split
lists).  Usage:

    python -m cp360_tpu.cli.extract_features --config config.yaml \
        --out static -oi -of -om [--weights resnet50.npz] [--max-frames N]
"""

from __future__ import annotations

import argparse
import os

import jax

from cp360_tpu.config import add_config_overrides, config_from_args
from cp360_tpu.data.dataset import builtin_split
from cp360_tpu.pipelines.extract import extract_video


def load_params(weights: str | None, arch: str):
    if weights:
        if weights.endswith(".pth"):
            from cp360_tpu.compat.torch_weights import (
                convert_resnet_state_dict,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(weights)
            if arch == "mobilenet_v2":
                from cp360_tpu.models.mobilenet import convert_mobilenet_v2

                return convert_mobilenet_v2(sd)
            if arch == "vgg16":
                from cp360_tpu.models.vgg import (
                    convert_vgg16_bn_features,
                    init_vgg16_params,
                )

                init = jax.device_get(init_vgg16_params(jax.random.PRNGKey(0)))
                return convert_vgg16_bn_features(sd, init)
            return convert_resnet_state_dict(sd, arch)
        from cp360_tpu.compat.torch_weights import load_npz

        return load_npz(weights)
    print("WARNING: no --weights given; using random init (demo only)")
    if arch == "vgg16":
        from cp360_tpu.models.vgg import init_vgg16_params

        return init_vgg16_params(jax.random.PRNGKey(0))
    if arch == "mobilenet_v2":
        from cp360_tpu.models.mobilenet import init_mobilenet_v2_params

        return init_mobilenet_v2_params(jax.random.PRNGKey(0))
    from cp360_tpu.models.resnet import init_resnet_params

    return init_resnet_params(jax.random.PRNGKey(0), arch)


def main(argv=None):
    from cp360_tpu.utils.platform import apply_platform, apply_platform_env

    apply_platform_env()
    # allow_abbrev=False: an abbreviated --supervise would survive
    # strip_supervise_flag and nest supervisors recursively in the child
    parser = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    parser.add_argument("--out", type=str, default="static", help="output dir name")
    parser.add_argument("--mode", type=str, default="resnet50", help="backbone arch")
    parser.add_argument("-oi", "--output_img", action="store_true")
    parser.add_argument("-of", "--output_feature", action="store_true")
    parser.add_argument("-om", "--output_motion", action="store_true")
    parser.add_argument("--weights", type=str, default=None, help=".npz or .pth backbone weights")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--data-parallel", type=int, default=None,
                        help="shard frame batches over N devices")
    parser.add_argument("--supervise", nargs="?", type=float, const=420.0,
                        default=None, metavar="STALL_S",
                        help="run under a restart-on-stall supervisor "
                             "(utils/supervise.py): the transfer relay can "
                             "wedge a fetch forever; extraction is resumable, "
                             "so a child with no artifact/output progress for "
                             "STALL_S seconds is killed and relaunched")
    add_config_overrides(parser)
    args, _unknown = parser.parse_known_args(argv)
    from cp360_tpu.config import warn_ignored_args

    warn_ignored_args(_unknown)

    cfg = config_from_args(args)
    apply_platform(cfg)
    if args.supervise is not None:
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
        out_path = os.path.join(cfg.output_path, f"{args.out}_{args.mode}")
        raise SystemExit(supervise(
            [sys.executable, "-m", "cp360_tpu.cli.extract_features"] + child_argv,
            watch_paths=[out_path],
            stall_timeout_s=args.supervise,
        ))
    if args.data_parallel:
        cfg = cfg.replace(mesh_data=args.data_parallel)
    from cp360_tpu.parallel.mesh import maybe_init_distributed, mesh_from_config

    maybe_init_distributed()
    mesh = mesh_from_config(cfg)
    from cp360_tpu.utils.transfer import warm_link

    if cfg.transfer_codec == "auto":
        # measure the link's CURRENT phase and pick the codec it warrants
        # (VERDICT r4 #4: production must react to the measured phase, not
        # assume the healthy defaults).  probe_link calls warm_link first,
        # so the cold first-fetch is absorbed here either way.
        from cp360_tpu.utils.linkprobe import (
            predict_stage1_fps,
            probe_link,
            resolve_codec,
        )

        pr = probe_link()
        codec = resolve_codec("auto", pr, upload_format=cfg.upload_format,
                              cube_dim=cfg.cube_dim)
        print(f"link probe: {pr.phase} phase (duplex {pr.duplex_MBps} MB/s, "
              f"cold fetch {pr.cold_s}s) -> transfer_codec={codec} "
              f"(link model: exact "
              f"{predict_stage1_fps(pr.duplex_MBps, 'none', cfg.upload_format):.0f} fps, "
              f"int8 {predict_stage1_fps(pr.duplex_MBps, 'int8', cfg.upload_format):.0f} fps)",
              flush=True)
        cfg = cfg.replace(transfer_codec=codec)
    else:
        # absorb the degraded-tunnel cold first-fetch BEFORE any supervised
        # silence window; heartbeats keep a --supervise parent's clock alive
        warm_link()

    import dataclasses

    for k, v in sorted(dataclasses.asdict(cfg).items()):
        print(f"\t{k} : {v}")

    params = load_params(args.weights, args.mode)
    out_path = os.path.join(cfg.output_path, f"{args.out}_{args.mode}")
    os.makedirs(out_path, exist_ok=True)

    jobs = []
    if cfg.test_mode:
        jobs += [("test", v) for v in builtin_split("test_25")]
    if cfg.train_mode:
        jobs += [("train", v) for v in builtin_split("train_60")]

    import jax as _jax

    if _jax.process_count() > 1:
        # stage 1 is embarrassingly parallel over videos: each host takes a
        # stripe and computes on its OWN devices (see mesh.stripe_jobs)
        from cp360_tpu.parallel.mesh import local_data_mesh, stripe_jobs

        jobs = stripe_jobs(jobs)
        mesh = local_data_mesh(mesh)
        print(f"multi-host extraction: process {_jax.process_index()}/"
              f"{_jax.process_count()} takes {len(jobs)} video(s)")

    for split, vid in jobs:
        vid_file = os.path.join(cfg.data_vid_path, split, vid + ".mp4")
        if not os.path.exists(vid_file):
            print(f"skip {vid}: {vid_file} not found")
            continue
        print(f"Now process {vid}!")
        extract_video(
            params,
            cfg,
            vid_file,
            os.path.join(out_path, vid),
            output_img=args.output_img,
            output_feature=args.output_feature,
            output_motion=args.output_motion,
            arch=args.mode,
            max_frames=args.max_frames,
            batch_frames=cfg.extract_batch,
            mesh=mesh,
        )


if __name__ == "__main__":
    main()
