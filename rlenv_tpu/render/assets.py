"""Sprite assets: generation + loading for textured rendering.

Two pieces of reference parity:

* :func:`create_assets` — the asset generator (`/root/reference/create_assets.py`):
  circle sprites for the rover (blue, dark-gray border) and thirsty/hydrated
  plants (brown/green) at cell size 30, written as RGBA PNGs. Implemented in
  pure numpy + a tiny PNG writer (no pygame required).
* :func:`load_assets` — the cached asset loader with directory fallback
  (`plantos_env_new.py:650-695`): looks for the five texture files in a
  given directory, then its parent; missing files -> None (the renderer
  falls back to solid colors, exactly like the reference).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Dict, Optional

import numpy as np

CELL_SIZE = 30
ROVER_RADIUS = 14
PLANT_RADIUS = 10

BLUE = (0, 0, 255)
GREEN = (0, 200, 0)
BROWN = (139, 69, 19)
DARK_GREY = (50, 50, 50)

ASSET_FILES = {
    "background": "grass_texture.png",
    "obstacle": "obstacles_texture.png",
    "rover": "mech_drone_agent.png",
    "plant_thirsty": "dry_plant_bg.png",
    "plant_hydrated": "good_plant_bg.png",
}


def write_png(path: str, rgba: np.ndarray) -> None:
    """Minimal RGBA PNG writer (uint8 [H, W, 4])."""
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def read_png(path: str) -> Optional[np.ndarray]:
    """Load a PNG as uint8 [H, W, 3|4] via matplotlib (None on failure)."""
    try:
        import matplotlib.image as mpimg
        img = mpimg.imread(path)
        if img.dtype != np.uint8:
            img = (img * 255).astype(np.uint8)
        return img
    except Exception:
        return None


def _disc(size: int, radius: int, color, border=None,
          border_width: int = 2) -> np.ndarray:
    img = np.zeros((size, size, 4), dtype=np.uint8)
    c = size // 2
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (yy - c) ** 2 + (xx - c) ** 2
    mask = d2 <= radius * radius
    img[mask, :3] = color
    img[mask, 3] = 255
    if border is not None:
        ring = (d2 <= radius * radius) & (
            d2 > (radius - border_width) ** 2)
        img[ring, :3] = border
        img[ring, 3] = 255
    return img


def create_assets(out_dir: str = ".") -> Dict[str, str]:
    """Generate rover.png / plant_thirsty.png / plant_hydrated.png
    (`create_assets.py:27-44`)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    sprites = {
        "rover.png": _disc(CELL_SIZE, ROVER_RADIUS, BLUE, DARK_GREY),
        "plant_thirsty.png": _disc(CELL_SIZE, PLANT_RADIUS, BROWN),
        "plant_hydrated.png": _disc(CELL_SIZE, PLANT_RADIUS, GREEN),
    }
    for name, img in sprites.items():
        path = os.path.join(out_dir, name)
        write_png(path, img)
        paths[name] = path
    print("Assets (rover.png, plant_thirsty.png, plant_hydrated.png) "
          "created successfully.")
    return paths


def load_assets(assets_dir: Optional[str] = None,
                cell_size: int = CELL_SIZE) -> Dict[str, Optional[np.ndarray]]:
    """Load the five render textures, trying ``assets_dir`` then its parent
    (`plantos_env_new.py:655-665`); missing -> None entries."""
    out: Dict[str, Optional[np.ndarray]] = {k: None for k in ASSET_FILES}
    if assets_dir is None:
        return out
    parent = os.path.dirname(os.path.abspath(assets_dir))
    for key, fname in ASSET_FILES.items():
        for base in (assets_dir, parent):
            path = os.path.join(base, fname)
            if os.path.exists(path):
                img = read_png(path)
                if img is not None:
                    out[key] = _scale_nearest(img, cell_size)
                break
    return out


def _scale_nearest(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor resize to (size, size)."""
    h, w = img.shape[:2]
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return img[ys][:, xs]
