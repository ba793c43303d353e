"""Create a tiny synthetic Wild-360-shaped dataset for end-to-end smoke runs.

Produces:
  <root>/360_Discovery/test/<vid>.mp4   — short random videos (equi-shaped)
  <root>/Wild360_GT/<vid>.mp4/NNNNN.npy — gaussian-blob fixation maps
  optionally <root>/output/static_resnet50/<vid>/{cube_feat,motion}/ stage-1
  artifacts (random CAM cubes) so stage-2 can run without stage-1.

Usage: python tools/make_synthetic_data.py <root> [--videos 2] [--frames 12]
"""

import argparse
import os

import numpy as np


def write_video(path, frames, h=128, w=256, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, 10.0, (w, h))
    base = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    for t in range(frames):
        frame = np.roll(base, shift=3 * t, axis=1)  # panning scene
        vw.write(frame)
    vw.release()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--videos", type=int, default=2)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--stage1", action="store_true", help="also write fake stage-1 artifacts")
    ap.add_argument("--channels", type=int, default=1000)
    args = ap.parse_args()

    vids = [f"synth{i:02}" for i in range(args.videos)]
    vid_dir = os.path.join(args.root, "360_Discovery", "test")
    gt_root = os.path.join(args.root, "Wild360_GT")
    os.makedirs(vid_dir, exist_ok=True)

    for i, vid in enumerate(vids):
        write_video(os.path.join(vid_dir, vid + ".mp4"), args.frames, seed=i)
        gdir = os.path.join(gt_root, vid + ".mp4")
        os.makedirs(gdir, exist_ok=True)
        rng = np.random.RandomState(100 + i)
        for t in range(args.frames):
            yy, xx = np.mgrid[0:64, 0:128]
            cy, cx = 20 + (t % 5), 40 + 3 * t
            gt = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 60.0).astype(np.float32)
            np.save(os.path.join(gdir, f"{t:05}.npy"), gt)

        if args.stage1:
            sdir = os.path.join(args.root, "output", "static_resnet50", vid)
            os.makedirs(os.path.join(sdir, "cube_feat"), exist_ok=True)
            os.makedirs(os.path.join(sdir, "motion"), exist_ok=True)
            for t in range(2, args.frames + 1):
                cam = rng.rand(6, args.channels, 7, 7).astype(np.float32)
                np.save(os.path.join(sdir, "cube_feat", f"{t:06}.npy"), cam)
                flow = rng.randn(480, 960, 2).astype(np.float32)
                np.save(os.path.join(sdir, "motion", f"{t:06}.npy"), flow)

    # split file note: the built-in splits list the real Wild-360 ids; for
    # synthetic runs pass video ids explicitly or drop them in place.
    print("synthetic data at", args.root, "videos:", vids)


if __name__ == "__main__":
    main()
