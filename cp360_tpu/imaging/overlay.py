"""Heatmap overlay + image normalization (host-side, PIL/NumPy).

Parity with reference utils/utils.py:9-45: jet-colorized heatmap bicubically
resized onto the frame, 50% alpha blend; per-channel ImageNet normalization.
``im_norm`` here does NOT mutate its input (the reference's does,
utils/utils.py:28-33 — a latent bug we don't reproduce since each frame is
normalized exactly once on the main path).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def jet_colormap(values01: np.ndarray) -> np.ndarray:
    """Matplotlib-'jet' RGB uint8 for values in [0, 1]."""
    try:
        import matplotlib.pyplot as plt

        return plt.get_cmap("jet")(values01, bytes=True)[..., :3]
    except Exception:  # pragma: no cover — matplotlib-free fallback
        v = np.clip(values01, 0.0, 1.0)
        r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
        return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def overlay(img, heatmap, cmap: str = "jet", alpha: float = 0.5) -> Image.Image:
    """Blend a heatmap over an image (reference utils/utils.py:9-25)."""
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    if isinstance(heatmap, np.ndarray):
        hm = heatmap - np.min(heatmap)
        mx = np.max(hm)
        if mx > 0:
            hm = hm / mx
        heatmap = Image.fromarray(jet_colormap(hm), mode="RGB")
    resample = getattr(Image, "BICUBIC", Image.Resampling.BICUBIC)
    heatmap = heatmap.resize((img.size[0], img.size[1]), resample=resample)
    return Image.blend(img.convert("RGB"), heatmap, alpha)


def im_norm(img: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """Per-channel (x - mean) / std, non-mutating."""
    out = np.empty_like(img, dtype=np.float32)
    for c in range(3):
        out[..., c] = (img[..., c] - mean[c]) / std[c]
    return out


def normalize_cube_faces(faces: np.ndarray) -> np.ndarray:
    """ImageNet-normalize a [6, H, W, 3] cube batch (extractor preprocessing,
    static_model/dataset_feat_extractor.py:148-157)."""
    return im_norm(faces.astype(np.float32))
