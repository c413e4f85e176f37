"""Deterministic procedural texture fixtures for the bundled scenes.

The reference course setup expects students to supply their own image
assets for the texture-mapping menu item (INSTRUCTION.md:114-116); we
generate ours so the repo is self-contained:

  python tools/gen_textures.py scenes/assets

writes stripes.png (albedo: vertical color stripes) and bubbles.png
(bump height map: radial blobs). Both 256x256, seed-free closed forms —
regenerating always produces identical bytes.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def stripes(res: int = 256) -> np.ndarray:
    """Vertical warm/cool stripes, 8 periods, soft edges."""
    x = np.arange(res, dtype=np.float32)[None, :] / res
    y = np.arange(res, dtype=np.float32)[:, None] / res
    s = (0.5 + 0.5 * np.sin(2 * np.pi * 8 * x)) + 0.0 * y  # (res,res)
    edge = np.clip((s - 0.35) / 0.3, 0.0, 1.0)
    warm = np.stack(
        [np.full_like(s, 0.9), 0.55 + 0.1 * s, np.full_like(s, 0.25)],
        axis=-1,
    )
    cool = np.stack(
        [np.full_like(s, 0.2), 0.45 + 0.1 * s, np.full_like(s, 0.85)],
        axis=-1,
    )
    img = warm * edge[..., None] + cool * (1.0 - edge[..., None])
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def bubbles(res: int = 256) -> np.ndarray:
    """Grayscale height map: a hex-ish lattice of smooth bumps."""
    x = np.arange(res, dtype=np.float32)[None, :] / res
    y = np.arange(res, dtype=np.float32)[:, None] / res
    h = np.zeros((res, res), np.float32)
    n = 6
    for i in range(n):
        for j in range(n):
            cx = (i + 0.5 + 0.5 * (j % 2)) / n
            cy = (j + 0.5) / n
            # wrapped distance so the texture tiles
            dx = np.minimum(np.abs(x - cx), 1.0 - np.abs(x - cx))
            dy = np.minimum(np.abs(y - cy), 1.0 - np.abs(y - cy))
            r2 = dx * dx + dy * dy
            h += np.exp(-r2 / (2 * 0.055**2))
    h = (h - h.min()) / (h.max() - h.min())
    return (h * 255).astype(np.uint8)


def sky(w: int = 512, h: int = 256) -> np.ndarray:
    """Lat-long sky: bright blue-white zenith fading to warm horizon,
    dark ground hemisphere, plus a sun disk at u=0.75, v=0.25 (i.e.
    direction -z-ish, 45 degrees up) for directional tests."""
    u = np.arange(w, dtype=np.float32)[None, :] / w
    v = np.arange(h, dtype=np.float32)[:, None] / h + 0.0 * u
    up = np.clip(1.0 - 2.0 * v, 0.0, 1.0)  # 1 at zenith row 0
    down = np.clip(2.0 * v - 1.0, 0.0, 1.0)
    r = 0.35 + 0.45 * up + 0.25 * (1 - np.abs(2 * v - 1)) - 0.25 * down
    g = 0.45 + 0.40 * up + 0.15 * (1 - np.abs(2 * v - 1)) - 0.30 * down
    b = 0.70 + 0.30 * up - 0.45 * down
    img = np.stack([r, g, b], axis=-1)
    du = np.minimum(np.abs(u - 0.75), 1.0 - np.abs(u - 0.75))
    sun = np.exp(-((du * 4) ** 2 + ((v - 0.25) * 4) ** 2) / (2 * 0.06**2))
    img += sun[..., None] * np.array([1.0, 0.95, 0.8])
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def write_assets(out_dir: str) -> list:
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, arr in (
        ("stripes.png", stripes()),
        ("bubbles.png", bubbles()),
        ("sky.png", sky()),
    ):
        path = os.path.join(out_dir, name)
        Image.fromarray(arr).save(path)
        written.append(path)
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "scenes/assets"
    for p in write_assets(out):
        print("wrote", p)
