"""Quantify the optical-flow backend gap (VERDICT r1 #5).

The reference trains against DeepFlow (utils/optical_flow.py:24-29), which
this OpenCV build lacks; the pipeline ships Farneback (the reference's own
commented alternative, :32) and a TPU Horn-Schunck.  DeepFlow itself cannot
run here, so the comparison oracle is *synthetic scenes with analytically
known motion* — a stronger reference than any estimator:

  scene A: global translation (textured)            GT = (tx, ty) everywhere
  scene B: moving textured patch, static background  GT = patch motion | 0
  scene C: rotation about center                     GT = affine field

Reported per backend (markdown table for PARITY.md):
  - mean endpoint error (EPE, px) against GT,
  - magnitude scale ratio median(|flow|)/|GT| over moving pixels,
  - motion-mask quality at the shipped mm_th=0.15 on the *scaled* flow
    (x fscale=0.5, train_temporal.py:110-112 semantics): static-pixel
    coverage (TNR) and moving-pixel pass-through (TPR), plus the
    balanced-accuracy-optimal threshold,
  - the three training losses computed with backend flow vs GT flow, and
    the cosine of d(total_loss)/d(predictions) between them — how much the
    backend choice bends the actual training signal.

Usage: python tools/flow_backend_report.py [width=480]
(tests/test_flow_backends.py asserts the stable subset at width 240)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MM_TH = 0.15


def textured(h, w, seed=0):
    """Smooth multi-scale texture (natural-image-like spectrum)."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w))
    for scale in (4, 8, 16, 32):
        small = rng.rand(h // scale + 2, w // scale + 2)
        import cv2

        img += cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC) * scale
    img -= img.min()
    return (img / img.max() * 255).astype(np.uint8)


def warp_by_flow(img, gt_flow):
    """Second frame: sample frame1 at x - flow (forward motion = gt_flow)."""
    import cv2

    h, w = img.shape
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return cv2.remap(img, gx - gt_flow[..., 0], gy - gt_flow[..., 1],
                     cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def make_scenes(w):
    h = w // 2
    scenes = {}
    base = textured(h, w, 0)

    gt = np.zeros((h, w, 2), np.float32)
    gt[..., 0], gt[..., 1] = 3.0, -2.0
    scenes["translation"] = (base, warp_by_flow(base, gt), gt)

    gt = np.zeros((h, w, 2), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    patch = ((yy - h * 0.5) ** 2 + (xx - w * 0.4) ** 2) < (h * 0.22) ** 2
    gt[patch] = (4.0, 2.5)
    f1 = textured(h, w, 1)
    scenes["moving_patch"] = (f1, warp_by_flow(f1, gt), gt)

    ang = 0.02  # rad
    cx, cy = w / 2, h / 2
    gt = np.stack([-(yy - cy) * ang, (xx - cx) * ang], axis=-1).astype(np.float32)
    f1 = textured(h, w, 2)
    scenes["rotation"] = (f1, warp_by_flow(f1, gt), gt)
    return scenes


def backend_flow(name, f1, f2):
    """Run a backend on grayscale frames at their native size (bypassing the
    wrapper's resize/channel handling so flows compare at GT resolution)."""
    import cv2

    if name == "farneback":
        from cp360_tpu.flow.optical_flow import _FARNEBACK_PARAMS as p

        return cv2.calcOpticalFlowFarneback(
            f1, f2, None, p["pyr_scale"], p["levels"], p["winsize"],
            p["iterations"], p["poly_n"], p["poly_sigma"], p["flags"])
    if name == "horn_schunck":
        import jax.numpy as jnp

        from cp360_tpu.flow.optical_flow import horn_schunck_flow

        return np.asarray(horn_schunck_flow(
            jnp.asarray(f1, jnp.float32) / 255.0, jnp.asarray(f2, jnp.float32) / 255.0))
    if name == "variational":
        import jax.numpy as jnp

        from cp360_tpu.flow.variational import brox_flow

        return np.asarray(brox_flow(
            jnp.asarray(f1, jnp.float32) / 255.0, jnp.asarray(f2, jnp.float32) / 255.0))
    if name == "deepflow":
        import cv2

        df = cv2.optflow.createOptFlow_DeepFlow()
        return df.calc(f1, f2, np.zeros((*f1.shape, 2), np.float32))
    raise ValueError(name)


def interior(h, w, m=16):
    mask = np.zeros((h, w), bool)
    mask[m:-m, m:-m] = True
    return mask


def mask_metrics(flow, gt, fscale=0.5, th=MM_TH):
    """Static/moving classification by |flow*fscale| < th (the training
    motion mask, train_temporal.py:127-128 semantics)."""
    h, w = gt.shape[:2]
    ok = interior(h, w)
    mag = np.sqrt((flow[..., 0] * fscale) ** 2 + (flow[..., 1] * fscale) ** 2)
    gt_moving = (np.linalg.norm(gt, axis=-1) > 1e-6) & ok
    gt_static = (np.linalg.norm(gt, axis=-1) <= 1e-6) & ok
    tpr = float((mag[gt_moving] >= th).mean()) if gt_moving.any() else float("nan")
    tnr = float((mag[gt_static] < th).mean()) if gt_static.any() else float("nan")
    return tpr, tnr, mag, gt_moving, gt_static, ok


def best_threshold(mag, gt_moving, gt_static):
    ths = np.linspace(0.01, 2.0, 200)
    best, best_th = -1.0, MM_TH
    for th in ths:
        bal = ((mag[gt_moving] >= th).mean() + (mag[gt_static] < th).mean()) / 2
        if bal > best:
            best, best_th = bal, th
    return best_th, best


def loss_sensitivity(gt, flow_by_backend, flow_h):
    """Training losses + prediction-gradient with each flow source."""
    import jax
    import jax.numpy as jnp

    from cp360_tpu.train import losses as L

    h, w = gt.shape[:2]
    ph, pw = 14, 28
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:ph, 0:pw]
    preds = []
    for t in range(4):  # moving saliency blob, P=3 pairs
        cy, cx = ph * 0.5 + 0.4 * t, pw * 0.4 + 0.8 * t
        p = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 12.0) + rng.rand(ph, pw) * 0.05
        preds.append(p)
    preds = jnp.asarray(np.stack(preds)[:, None], jnp.float32)  # [4, 1, ph, pw]

    # raw stored flow is at (h, w); training scales by flow_h/w internally
    def total(preds_, flow_):
        flows = jnp.asarray(np.broadcast_to(flow_, (3, 1, h, w, 2)), jnp.float32)
        parts = L.weak_supervision_losses(preds_, flows, mm_th=MM_TH, flow_h=flow_h)
        return L.total_loss(parts, 0.7, 1.0, 0.01), parts

    out = {}
    for name, fl in flow_by_backend.items():
        (tot, parts), g = jax.value_and_grad(total, has_aux=True)(preds, fl)
        out[name] = {
            "total": float(tot),
            "parts": {k: float(v) for k, v in parts.items()},
            "grad": np.asarray(g).ravel(),
        }
    return out


def throughput_report(w, batch=8, n_iters=4, reps=5):
    """Pairs/s per backend (VERDICT r3 #5 / r4 #2) — host loop vs device
    batch-1 vs device vmapped batch-N.  Distinct data per iteration (the
    tunnel dedups repeated buffers) and device timings chain through a
    scalar accumulator (block_until_ready lies through the relay — see
    tools/bench_pallas.py).  Each backend is timed ``reps`` times; the
    table reports the median and the JSON line carries the per-backend
    IQR (artifact-of-record spread rule, VERDICT r4 #6)."""
    import time

    import jax
    import jax.numpy as jnp

    from cp360_tpu.flow.optical_flow import (
        horn_schunck_flow,
        horn_schunck_flow_batch,
    )
    from cp360_tpu.flow.variational import brox_flow, brox_flow_batch

    h = w // 2
    # distinct textured pairs under the same global translation
    n_data = max(batch, n_iters)
    f1s = np.stack([textured(h, w, 100 + i) for i in range(n_data)])
    gt = np.zeros((h, w, 2), np.float32)
    gt[..., 0], gt[..., 1] = 3.0, -2.0
    f2s = np.stack([warp_by_flow(f, gt) for f in f1s])

    rows = []

    def _median_iqr(samples):
        return (float(np.median(samples)),
                [round(float(np.percentile(samples, 25)), 1),
                 round(float(np.percentile(samples, 75)), 1)])

    def time_host(name):
        samples = []
        for _ in range(reps):
            t0 = time.time()
            for i in range(n_iters):
                backend_flow(name, f1s[i % n_data], f2s[i % n_data])
            samples.append(n_iters / (time.time() - t0))
        return _median_iqr(samples)

    def time_device(fn, arrs1, arrs2, per_call):
        # warm/compile (also absorbs a degraded-phase cold first fetch)
        out = fn(arrs1[0], arrs2[0])
        float(jnp.sum(out.astype(jnp.float32) * 0))
        samples = []
        for _ in range(reps):
            acc = jnp.zeros((), jnp.float32)
            t0 = time.time()
            for i in range(n_iters):
                out = fn(arrs1[i % len(arrs1)], arrs2[i % len(arrs2)])
                acc = acc + jnp.sum(out.reshape(-1)[:8].astype(jnp.float32))
            assert np.isfinite(float(acc))
            samples.append(per_call * n_iters / (time.time() - t0))
        return _median_iqr(samples)

    rows.append(("farneback (host)", *time_host("farneback")))

    g1 = [jnp.asarray(f, jnp.float32) / 255.0 for f in f1s]
    g2 = [jnp.asarray(f, jnp.float32) / 255.0 for f in f2s]
    b1 = jnp.stack(g1[:batch])
    b2 = jnp.stack(g2[:batch])
    for name, fn1, fnb in (("horn_schunck", horn_schunck_flow,
                            horn_schunck_flow_batch),
                           ("variational", brox_flow, brox_flow_batch)):
        rows.append((f"{name} (device, batch 1)",
                     *time_device(fn1, g1, g2, 1)))
        rows.append((f"{name} (device, batch {batch})",
                     *time_device(fnb, [b1], [b2], batch)))

    print(f"\n## Flow throughput ({w}x{h}, {n_iters} timed iters x "
          f"{reps} reps, device batch {batch})\n")
    print("| backend | pairs/s (median) | IQR |")
    print("|---|---|---|")
    for name, pps, iqr in rows:
        print(f"| {name} | {pps:.1f} | {iqr} |")
    import json

    print(json.dumps({
        "metric": "flow_pairs_per_sec", "unit": f"pairs/s at {w}x{h}",
        "value": round(max(p for n, p, _ in rows if "device" in n), 1),
        "backends": {n: round(p, 1) for n, p, _ in rows},
        "spread_iqr": {n: i for n, _, i in rows},
        "n_reps": reps,
    }), flush=True)
    return {n: p for n, p, _ in rows}


def main():
    if "--throughput" in sys.argv:
        sys.argv.remove("--throughput")
        w = int(sys.argv[1]) if len(sys.argv) > 1 else 480
        throughput_report(w)
        return
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    scenes = make_scenes(w)
    backends = ["farneback", "horn_schunck", "variational"]
    import cv2

    if hasattr(cv2, "optflow") and hasattr(cv2.optflow, "createOptFlow_DeepFlow"):
        backends.append("deepflow")

    rows = []
    flows_patch = {}
    for name in backends:
        epes, scales = {}, {}
        for sname, (f1, f2, gt) in scenes.items():
            fl = backend_flow(name, f1, f2)
            ok = interior(*gt.shape[:2])
            epe = float(np.linalg.norm(fl - gt, axis=-1)[ok].mean())
            moving = (np.linalg.norm(gt, axis=-1) > 1e-6) & ok
            sc = float(np.median(np.linalg.norm(fl, axis=-1)[moving])
                       / np.median(np.linalg.norm(gt, axis=-1)[moving]))
            epes[sname], scales[sname] = epe, sc
            if sname == "moving_patch":
                flows_patch[name] = fl
                tpr, tnr, mag, gm, gs, _ = mask_metrics(fl, gt)
                th_opt, bal = best_threshold(mag, gm, gs)
                mask_row = (tpr, tnr, th_opt, bal)
        rows.append((name, epes, scales, mask_row))

    gt_patch = scenes["moving_patch"][2]
    flows_for_loss = dict(flows_patch)
    flows_for_loss["ground_truth"] = gt_patch
    sens = loss_sensitivity(gt_patch, flows_for_loss, flow_h=gt_patch.shape[0])
    g_ref = sens["ground_truth"]["grad"]

    print(f"\n## Flow backend report (scenes at {gt_patch.shape[1]}x{gt_patch.shape[0]}, "
          f"mask = |flow*0.5| < {MM_TH})\n")
    print("| backend | EPE transl | EPE patch | EPE rot | scale transl | "
          "mask TPR@0.15 | mask TNR@0.15 | best th (bal acc) |")
    print("|---|---|---|---|---|---|---|---|")
    for name, epes, scales, (tpr, tnr, th_opt, bal) in rows:
        print(f"| {name} | {epes['translation']:.3f} | {epes['moving_patch']:.3f} | "
              f"{epes['rotation']:.3f} | {scales['translation']:.3f} | "
              f"{tpr:.3f} | {tnr:.3f} | {th_opt:.2f} ({bal:.3f}) |")

    print("\n| flow source | total loss | smooth | temporal | mask | grad cos vs GT |")
    print("|---|---|---|---|---|---|")
    for name in list(flows_patch) + ["ground_truth"]:
        s = sens[name]
        g = s["grad"]
        cos = float(g @ g_ref / (np.linalg.norm(g) * np.linalg.norm(g_ref)))
        print(f"| {name} | {s['total']:.2f} | {s['parts']['smooth']:.2f} | "
              f"{s['parts']['temporal']:.2f} | {s['parts']['mask']:.2f} | {cos:.4f} |")


if __name__ == "__main__":
    main()
