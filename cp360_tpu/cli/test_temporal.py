"""Stage-2 CLI: temporal inference + evaluation against Wild-360 GT.

Reference driver: temporal_model/test_temporal.py (flags --model, --dir,
--overlay; writes {dir}_result.txt with the aggregate).  Usage:

    python -m cp360_tpu.cli.test_temporal --model CLSTM.npz \
        --dir output/static_resnet50 [--overlay] [--config config.yaml]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cp360_tpu.config import add_config_overrides, config_from_args
from cp360_tpu.data.dataset import builtin_split
from cp360_tpu.pipelines.temporal import aggregate, evaluate_video, infer_video, video_windows
from cp360_tpu.utils.atomic import atomic_savez


def load_clstm(path: str):
    if path.endswith(".pth"):
        from cp360_tpu.compat.torch_weights import (
            convert_clstm_state_dict,
            load_torch_state_dict,
        )

        return convert_clstm_state_dict(load_torch_state_dict(path))
    from cp360_tpu.compat.torch_weights import load_npz

    return load_npz(path)


def main(argv=None):
    from cp360_tpu.utils.platform import apply_platform, apply_platform_env

    apply_platform_env()
    # allow_abbrev=False: an abbreviated --supervise would survive
    # strip_supervise_flag and nest supervisors recursively in the child
    parser = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    parser.add_argument("--model", type=str, required=True, help="CLSTM .npz or .pth")
    parser.add_argument("--dir", type=str, required=True, help="stage-1 artifact root")
    parser.add_argument("--overlay", action="store_true", help="write overlay jpgs")
    parser.add_argument("--batch-windows", type=int, default=64)
    parser.add_argument("--data-parallel", type=int, default=None,
                        help="shard window batches over N devices")
    parser.add_argument("--resume", action="store_true",
                        help="skip videos whose maps + metrics were already "
                             "completed (per-video _done.npz markers); their "
                             "cached metrics still enter the aggregate")
    parser.add_argument("--supervise", nargs="?", type=float, const=420.0,
                        default=None, metavar="STALL_S",
                        help="run under a restart-on-stall supervisor "
                             "(utils/supervise.py): the transfer relay can "
                             "wedge a fetch forever; the child is relaunched "
                             "with --resume, continuing at the first "
                             "unfinished video")
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
        if "--resume" not in child_argv:
            child_argv.append("--resume")  # restarts must not redo videos
        raise SystemExit(supervise(
            [sys.executable, "-m", "cp360_tpu.cli.test_temporal"] + child_argv,
            watch_paths=[os.path.join(cfg.output_path, "temporal")],
            stall_timeout_s=args.supervise,
        ))

    model_path = args.model
    if not os.path.exists(model_path):
        model_path = os.path.join(cfg.checkpoint_path, args.model)
    params = load_clstm(model_path)

    if args.data_parallel:
        cfg = cfg.replace(mesh_data=args.data_parallel)
    from cp360_tpu.parallel.mesh import clstm_param_sharding, maybe_init_distributed, mesh_from_config

    maybe_init_distributed()
    import jax

    from cp360_tpu.utils.transfer import warm_link

    # absorb the degraded-tunnel cold first-fetch BEFORE any supervised
    # silence window; heartbeats keep a --supervise parent's clock alive
    warm_link()
    mesh = mesh_from_config(cfg)
    multiproc = jax.process_count() > 1
    if multiproc:
        # videos are independent: stripe them across hosts, compute on each
        # host's own devices (mesh.stripe_jobs); the per-video metrics
        # merge through the shared-FS partials + barrier below
        from cp360_tpu.parallel.mesh import local_data_mesh

        mesh = local_data_mesh(mesh)
        if cfg.mesh_model > 1:
            print("NOTE: multi-host striping uses per-host data "
                  "parallelism; mesh_model is ignored")
    if mesh is not None and cfg.mesh_model > 1 and not multiproc:
        params = jax.device_put(params, clstm_param_sharding(mesh, params))

    vids = [v for v in builtin_split("test_25")
            if os.path.isdir(os.path.join(args.dir, v, "cube_feat"))]
    outdir = os.path.join(cfg.output_path, "temporal")
    os.makedirs(outdir, exist_ok=True)

    if multiproc:
        from cp360_tpu.parallel.mesh import stripe_jobs

        vids = stripe_jobs(vids)
        print(f"multi-host inference: process {jax.process_index()}/"
              f"{jax.process_count()} takes {len(vids)} video(s)")

    per_video, frame_counts = {}, {}
    error: "BaseException | None" = None
    try:
        _infer_all(args, cfg, params, mesh, vids, outdir,
                   per_video, frame_counts)
    except BaseException as e:  # noqa: BLE001 — peers must not hang on the
        error = e               # barrier below because this stripe failed

    if multiproc:
        # merge per-video metrics across hosts: each process writes its
        # partial to the shared output dir (even a failed stripe writes
        # one, flagged, so the barrier is ALWAYS reached and no peer hangs
        # waiting for a crashed host — a hard kill is handled one level up
        # by cli.launch tearing the job down), a global barrier orders the
        # writes, then process 0 aggregates exactly as single-host would
        import pickle

        from jax.experimental import multihost_utils

        part = os.path.join(outdir, f"_partial_{jax.process_index():03}.pkl")
        with open(part, "wb") as f:
            pickle.dump((per_video, frame_counts, error is not None), f)
        multihost_utils.sync_global_devices("cp360 temporal partials")
        if jax.process_index() != 0:
            if error is not None:
                raise error
            return
        per_video, frame_counts = {}, {}
        failed = [jax.process_index()] if error is not None else []
        for p in range(jax.process_count()):
            pp = os.path.join(outdir, f"_partial_{p:03}.pkl")
            with open(pp, "rb") as f:
                pv, fc, bad = pickle.load(f)
            if bad and p not in failed:
                failed.append(p)
            per_video.update(pv)
            frame_counts.update(fc)
            os.remove(pp)
        if failed:
            raise RuntimeError(
                f"stripe(s) on process(es) {sorted(failed)} failed — "
                "aggregate would be incomplete"
            ) from error
    elif error is not None:
        raise error

    if per_video:
        agg = aggregate(per_video, frame_counts)
        print(
            "========== AUC: {AUC}\tCC: {CC}\tAUCB: {AUCB}\tSIM: {SIM}".format(**agg)
        )
        # Reference-compatible result file (test_temporal.py:186-187).
        with open(f"{args.dir.split('/')[-1]}_result.txt", "w") as f:
            print(f"total result:{agg['CC']}, {agg['AUC']}, {agg['AUCB']}", file=f)


def _infer_all(args, cfg, params, mesh, vids, outdir, per_video, frame_counts):
    """Per-video inference/eval over this process's stripe (mutates the
    two dicts in place so a mid-stripe failure keeps what completed)."""
    for i, vid in enumerate(vids):
        marker = os.path.join(outdir, vid, "_done.npz")
        if args.resume and os.path.exists(marker):
            # the marker is written only after maps, overlays and metrics
            # all completed, so skipping is exact: cached metrics re-enter
            # the aggregate as if the video had just been processed.  A
            # marker that no longer matches the run's inputs (GT appeared
            # after a has_gt=False run; --overlay added) or that is
            # unreadable (pre-atomic-write truncation) falls through to a
            # recompute instead of silently skipping the new work.
            d = _load_marker(marker)
            if d is not None:
                gt_now = os.path.isdir(
                    os.path.join(cfg.label_path, vid + ".mp4"))
                overlay_ok = not args.overlay or d.get("overlay", False)
                if overlay_ok and (d["has_gt"] or not gt_now):
                    if d["has_gt"]:
                        per_video[vid] = {
                            k: d[k] for k in ("AUC", "AUCB", "CC", "SIM")}
                        frame_counts[vid] = int(d["frames"])
                    print(f"resume: {vid} complete — skipping "
                          f"[{i + 1}/{len(vids)}]")
                    continue
                print(f"resume: {vid} marker predates "
                      f"{'GT' if not d['has_gt'] else '--overlay'} — "
                      "recomputing")
        print(f"Extracting video {vid}[{i + 1}/{len(vids)}]")
        feat_dir = os.path.join(args.dir, vid, "cube_feat")
        import jax.numpy as jnp

        preds = infer_video(
            params, feat_dir, cfg.seq_len,
            batch_windows=args.batch_windows, use_cube_pad=cfg.cube_pad,
            conv_impl=cfg.clstm_conv_impl,
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            mesh=mesh, transfer_codec=cfg.transfer_codec,
        )

        vdir = os.path.join(outdir, vid)
        os.makedirs(vdir, exist_ok=True)
        for idx, p in preds.items():
            np.save(os.path.join(vdir, f"{idx + cfg.seq_len - 1:05}.npy"), p)

        if args.overlay:
            from PIL import Image

            from cp360_tpu.imaging.overlay import overlay

            odir = os.path.join(vdir, "overlay")
            os.makedirs(odir, exist_ok=True)
            for idx, p in preds.items():
                img_path = os.path.join(
                    args.dir, vid, "img", f"{idx + cfg.seq_len - 1:06}.jpg"
                )
                if os.path.exists(img_path):
                    overlay(Image.open(img_path), p**2).save(
                        os.path.join(odir, f"{idx + cfg.seq_len - 1:06}.jpg")
                    )

        gt_dir = os.path.join(cfg.label_path, vid + ".mp4")
        if os.path.isdir(gt_dir):
            res = evaluate_video(preds, gt_dir, cfg.seq_len)
            per_video[vid] = res
            frame_counts[vid] = len(video_windows(feat_dir))
            for key in ("AUCB", "AUC", "CC"):
                print(f"[{vid}]\t{key}:{np.mean(res[key])}")
            atomic_savez(marker, has_gt=True, overlay=args.overlay,
                         frames=frame_counts[vid],
                         **{k: np.asarray(res[k])
                            for k in ("AUC", "AUCB", "CC", "SIM")})
        else:
            atomic_savez(marker, has_gt=False, overlay=args.overlay)


def _load_marker(marker: str):
    """Marker contents as a plain dict, or None if unreadable (a truncated
    file from a pre-atomic-write kill must recompute, not crash --resume)."""
    try:
        with np.load(marker) as d:
            return {k: (bool(d[k]) if k in ("has_gt", "overlay") else d[k])
                    for k in d.files}
    except Exception:
        return None


if __name__ == "__main__":
    main()
