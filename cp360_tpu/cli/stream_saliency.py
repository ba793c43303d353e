"""Streaming CLI: one 360° video -> temporal saliency maps, no artifacts.

The reference has no single-command path from video to temporal saliency —
it requires dataset_feat_extractor writing .npy artifacts to disk and then
test_temporal re-reading them (SURVEY.md §1.2).  This CLI runs the fused
streaming pipeline (pipelines/stream.py: CAM cubes stay device-resident
between the stages) and writes one ``{frame:05}.npy`` saliency map per
complete window — numbering-compatible with the offline pipeline's output,
so `eval_saliency` scores either interchangeably.

    python -m cp360_tpu.cli.stream_saliency --video v.mp4 \
        --backbone resnet50.npz --clstm CLSTM.npz --out outdir \
        [--max-frames N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cp360_tpu.config import add_config_overrides, config_from_args
from cp360_tpu.utils.atomic import atomic_save


def main(argv=None):
    from cp360_tpu.utils.platform import apply_platform, apply_platform_env

    apply_platform_env()
    # allow_abbrev=False: an abbreviated --supervise would survive
    # strip_supervise_flag and nest supervisors recursively in the child
    parser = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    parser.add_argument("--video", type=str, required=True)
    parser.add_argument("--backbone", type=str, required=True, help=".npz/.pth backbone weights")
    parser.add_argument("--clstm", type=str, required=True, help=".npz/.pth ConvLSTM weights")
    parser.add_argument("--out", type=str, required=True, help="output dir for saliency .npy")
    parser.add_argument("--arch", type=str, default="resnet50")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--stage1-batch", type=int, default=8)
    parser.add_argument("--overlay", action="store_true",
                        help="also write jet-overlay jpgs under <out>/overlay/"
                             " ({frame:05}.jpg, same numbering as the .npy "
                             "maps — the offline test CLI's --overlay look)")
    parser.add_argument("--resume", action="store_true",
                        help="skip ahead to the first missing output map: "
                             "frames that feed only already-written windows "
                             "skip remap + device work (windows are "
                             "independent, so the suffix is identical)")
    parser.add_argument("--supervise", nargs="?", type=float, const=420.0,
                        default=None, metavar="STALL_S",
                        help="run under a restart-on-stall supervisor "
                             "(utils/supervise.py): the transfer relay can "
                             "wedge a fetch forever; the child is relaunched "
                             "with --resume, so a restart continues at the "
                             "first missing map")
    add_config_overrides(parser)
    args, _unknown = parser.parse_known_args(argv)
    from cp360_tpu.config import warn_ignored_args

    warn_ignored_args(_unknown)
    cfg = config_from_args(args)
    apply_platform(cfg)
    if args.supervise is not None:
        import sys

        from cp360_tpu.utils.supervise import strip_supervise_flag, supervise

        child_argv = strip_supervise_flag(
            list(argv) if argv is not None else sys.argv[1:])
        if "--resume" not in child_argv:
            child_argv.append("--resume")  # restarts must not redo the video
        raise SystemExit(supervise(
            [sys.executable, "-m", "cp360_tpu.cli.stream_saliency"] + child_argv,
            watch_paths=[args.out],
            stall_timeout_s=args.supervise,
        ))

    from cp360_tpu.cli.extract_features import load_params
    from cp360_tpu.cli.test_temporal import load_clstm
    from cp360_tpu.pipelines.stream import stream_video_saliency
    from cp360_tpu.utils.transfer import warm_link

    # absorb the degraded-tunnel cold first-fetch BEFORE any supervised
    # silence window; heartbeats keep a --supervise parent's clock alive
    warm_link()
    backbone = load_params(args.backbone, args.arch)
    clstm = load_clstm(args.clstm)

    os.makedirs(args.out, exist_ok=True)
    start_output = 0
    if args.resume:
        # first missing map in the contiguous prefix (ids start at
        # seq_len-1 — the offline numbering); later stragglers from an
        # interrupted batch are simply overwritten with identical content
        start_output = cfg.seq_len - 1
        while os.path.exists(os.path.join(args.out, f"{start_output:05}.npy")):
            start_output += 1
        if start_output > cfg.seq_len - 1:
            print(f"resume: maps before {start_output:05} exist — "
                  f"continuing there")
    ocap = None
    if args.overlay:
        import cv2

        from cp360_tpu.imaging.overlay import overlay as blend
        from cp360_tpu.pipelines.extract import _resize_frame_pil

        ocap = cv2.VideoCapture(args.video)
        odir = os.path.join(args.out, "overlay")
        os.makedirs(odir, exist_ok=True)
        opos = 0  # video index of the next ocap.read()

    n = 0
    try:
        for frame_id, sal in stream_video_saliency(
            backbone, clstm, args.video, cfg, arch=args.arch,
            stage1_batch=args.stage1_batch, max_frames=args.max_frames,
            start_output=start_output,
        ):
            # atomic: --resume treats an existing map as complete, so a
            # supervisor kill mid-write must not leave a truncated map at
            # the resume boundary (it would never be rewritten)
            atomic_save(os.path.join(args.out, f"{frame_id:05}.npy"), sal)
            if ocap is not None:
                # map id P is the saliency OF video frame P (stream.py's
                # offline-compatible numbering); ids ascend, so a second
                # sequential reader stays in lockstep with the stream
                frame_bgr = None
                while opos <= frame_id:
                    ok, frame_bgr = ocap.read()
                    opos += 1
                    if not ok:
                        frame_bgr = None
                        break
                if frame_bgr is not None:
                    # same look as the offline artifacts: the shared
                    # working-size resize (BGR-as-RGB + equi_h-is-width
                    # quirks live in _resize_frame_pil with their
                    # reference citations) and the test CLI's sal**2
                    _, img = _resize_frame_pil(frame_bgr,
                                               (cfg.equi_h, cfg.equi_w))
                    blend(img, np.asarray(sal) ** 2).save(
                        os.path.join(odir, f"{frame_id:05}.jpg"))
            n += 1
    finally:
        if ocap is not None:
            ocap.release()
    print(f"{args.video}: {n} saliency maps -> {args.out}"
          + (" (+overlays)" if args.overlay else ""))


if __name__ == "__main__":
    main()
