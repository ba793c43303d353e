"""Standalone saliency evaluation CLI.

Reference analogue: utils/eval_saliency.py:214-317 — an offline comparison
of saved saliency maps against GT fixation maps.  The reference's main() is
partially broken (undefined `CC`, possibly-unbound `camidx`,
eval_saliency.py:282,296); this one works: it scores either stage-2
prediction dirs (<root>/<vid>/NNNNN.npy) or stage-1 CAM cube dirs
(<root>/<vid>/cube_feat/NNNNNN.npy, projected to equi + channel-maxed).

Prediction->GT frame alignment (``--offset`` = pred index − GT index):
  - stage-2 files are saved as {window_end:05}.npy and the reference loads
    the *same-numbered* GT (test_temporal.py:86-88,101-102) -> offset 0;
  - stage-1 cube_feat artifacts start at 000002 and artifact N holds video
    frame N-2 (dataset_feat_extractor.py:126-137,187-189: cnt+=1 after a
    skipped first frame, content is the previous iteration's cur_frame),
    and GT is 0-based -> offset 2.  (The reference's own standalone CLI
    instead expects `feat_0{gt:05}.npy` names its extractor never writes,
    eval_saliency.py:263-264 — mutually broken upstream; ours follows the
    alignment the published protocol implies.)

    python -m cp360_tpu.cli.eval_saliency --input output/temporal \
        --gt /path/Wild360_GT [--offset N]
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

from cp360_tpu.data.dataset import builtin_split
from cp360_tpu.metrics import saliency as M


def default_offset(pred_dir: str) -> int:
    """Pred-index minus GT-index for a prediction directory (see module doc)."""
    return 2 if os.path.basename(pred_dir) == "cube_feat" else 0


def gt_name_for(fname: str, offset: int) -> str:
    """GT filename for prediction file ``fname`` under the given offset."""
    return f"{int(fname.split('.')[0]) - offset:05}.npy"


def _load_prediction(path: str) -> np.ndarray:
    arr = np.load(path)
    if arr.ndim == 2:
        return arr
    if arr.ndim == 4 and arr.shape[0] == 6:  # stage-1 CAM cube [6,C,h,w]
        import jax.numpy as jnp

        from cp360_tpu.ops.resample import cube_to_equi

        equi = np.asarray(cube_to_equi(jnp.asarray(arr.transpose(0, 2, 3, 1))))
        return equi.max(-1)
    raise ValueError(f"unrecognized prediction shape {arr.shape} in {path}")


def main(argv=None):
    from cp360_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=str, required=True, help="prediction root")
    parser.add_argument("--gt", type=str, required=True, help="GT root (<vid>.mp4/NNNNN.npy)")
    parser.add_argument("--split", type=str, default="test_25")
    parser.add_argument("--seed", type=int, default=None, help="metric RNG seed")
    parser.add_argument("--offset", type=int, default=None,
                        help="pred index - GT index (default: auto — 0 for "
                             "stage-2 dirs, 2 for stage-1 cube_feat dirs)")
    parser.add_argument("--json", type=str, default=None, metavar="PATH",
                        help="also write the aggregate + per-video means as "
                             "one JSON file ('-' for stdout)")
    args, _unknown = parser.parse_known_args(argv)
    from cp360_tpu.config import warn_ignored_args

    warn_ignored_args(_unknown, supports_set=False)

    rng = np.random.RandomState(args.seed) if args.seed is not None else None
    totals = {"AUC": [], "AUCB": [], "CC": [], "SIM": []}
    weights = []
    per_video = {}
    for vid in builtin_split(args.split):
        vdir = os.path.join(args.input, vid)
        pred_dir = vdir if os.path.isdir(vdir) else None
        if pred_dir is None:
            continue
        if os.path.isdir(os.path.join(vdir, "cube_feat")):
            pred_dir = os.path.join(vdir, "cube_feat")
        gt_dir = os.path.join(args.gt, vid + ".mp4")
        if not os.path.isdir(gt_dir):
            continue

        offset = args.offset if args.offset is not None else default_offset(pred_dir)
        scores = {k: [] for k in totals}
        for fname in sorted(os.listdir(pred_dir)):
            # strict NNNN.npy only: stray files (crashed-writer leftovers,
            # _done markers) must not parse as prediction frames
            if not re.match(r"\d+\.npy$", fname):
                continue
            gt_path = os.path.join(gt_dir, gt_name_for(fname, offset))
            if not os.path.exists(gt_path):
                continue
            pred = _load_prediction(os.path.join(pred_dir, fname))
            gt = np.load(gt_path)
            scores["AUC"].append(M.auc_judd(pred, gt, rng=rng))
            scores["AUCB"].append(M.auc_borji(pred, gt, rng=rng))
            scores["CC"].append(M.corr_coeff(pred, gt))
            scores["SIM"].append(M.similarity(pred, gt))
        if not scores["AUC"]:
            continue
        n = len(scores["AUC"])
        print(
            f"[{vid}] n={n} AUC={np.mean(scores['AUC']):.4f} "
            f"AUCB={np.mean(scores['AUCB']):.4f} CC={np.mean(scores['CC']):.4f} "
            f"SIM={np.mean(scores['SIM']):.4f}"
        )
        for k in totals:
            totals[k].append(np.mean(scores[k]))
        weights.append(n)
        per_video[vid] = {k: float(np.mean(v)) for k, v in scores.items()}
        per_video[vid]["frames"] = n

    agg = None
    if weights:
        w = np.asarray(weights, dtype=np.float64)
        w = w / w.sum()
        agg = {k: float(np.sum(np.asarray(v) * w)) for k, v in totals.items()}
        print(
            "total result: AUC={AUC:.4f} AUCB={AUCB:.4f} CC={CC:.4f} SIM={SIM:.4f}".format(**agg)
        )
    else:
        print("no videos scored")
    if args.json:
        import json as _json

        doc = {"aggregate": agg, "per_video": per_video,
               "videos": len(per_video), "split": args.split}
        if args.json == "-":
            print(_json.dumps(doc))
        else:
            with open(args.json, "w") as f:
                _json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
