"""2-D top-down frame renderer (host-side, pure numpy).

Produces the same visual spec as the reference's offscreen pygame renderer
(`/root/reference/gradio-app/plantos_env_new.py:697-762`) in its
no-assets fallback mode: green field, translucent explored overlay, gray
obstacles, orange/green plants, blue rover, blue LIDAR rays with endpoint
dots, light grid lines — returned as an ``HxWx3 uint8`` array (the
``render_mode='rgb_array'`` contract, `:631-633`).

Coordinate convention matches the reference: grid x is the IMAGE ROW and
grid y the IMAGE COLUMN (rects are drawn at ``(y*cs, x*cs)``, `:708`), and
ray endpoints use the reference's (sin, cos) screen mapping (`:748-749`).

Rendering is off the hot path (called on de-device-ified state), so plain
numpy is the right tool — no pygame dependency required; an optional
pygame window for ``render_mode='human'`` lives in
:mod:`rlenv_tpu.render.window`.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from rlenv_tpu.env.lidar import lidar_offsets
from rlenv_tpu.env.state import EnvState

COLOR_GRASS = (34, 139, 34)
COLOR_EXPLORED = (200, 200, 200)
EXPLORED_ALPHA = 100 / 255.0
COLOR_OBSTACLE = (105, 105, 105)
COLOR_PLANT_THIRSTY = (255, 165, 0)
COLOR_PLANT_HYDRATED = (0, 255, 0)
COLOR_ROVER = (0, 0, 255)
COLOR_RAY = (100, 100, 255)
COLOR_GRID = (200, 200, 200)


def _draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
               color) -> None:
    """Dense-sampled line segment; (x, y) are image column/row."""
    h, w = img.shape[:2]
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    t = np.linspace(0.0, 1.0, n + 1)
    xs = np.clip(np.round(x0 + (x1 - x0) * t).astype(int), 0, w - 1)
    ys = np.clip(np.round(y0 + (y1 - y0) * t).astype(int), 0, h - 1)
    img[ys, xs] = color


def _draw_disc(img: np.ndarray, cx: int, cy: int, r: int, color) -> None:
    h, w = img.shape[:2]
    y0, y1 = max(cy - r, 0), min(cy + r + 1, h)
    x0, x1 = max(cx - r, 0), min(cx + r + 1, w)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    img[y0:y1, x0:x1][mask] = color


def _blit(img: np.ndarray, sprite: np.ndarray, row: int, col: int) -> None:
    """Alpha-composite an RGBA/RGB sprite at pixel (row, col)."""
    h, w = sprite.shape[:2]
    tile = img[row:row + h, col:col + w]
    if sprite.shape[-1] == 4:
        alpha = sprite[..., 3:4].astype(np.float32) / 255.0
        tile[:] = tile * (1 - alpha) + sprite[..., :3].astype(np.float32) * alpha
    else:
        tile[:] = sprite[..., :3]


def render_frame(state: EnvState, lidar_channels: int, lidar_range: int,
                 cell_size: int = 30,
                 assets: Optional[dict] = None) -> np.ndarray:
    """Render one env state to HxWx3 uint8 (H = W = grid_size*cell_size).

    ``assets`` maps {'background','obstacle','rover','plant_thirsty',
    'plant_hydrated'} to RGB(A) sprite arrays (see
    :func:`rlenv_tpu.render.assets.load_assets`); any missing entry falls
    back to the reference's solid colors (`plantos_env_new.py:709-756`).
    """
    assets = assets or {}
    obstacles = np.asarray(state.obstacles)
    plants = np.asarray(state.plants)
    explored = np.asarray(state.explored)
    rover = np.asarray(state.rover)
    g = obstacles.shape[0]
    cs = cell_size
    size = g * cs

    img = np.empty((size, size, 3), dtype=np.float32)
    bg = assets.get("background")
    if bg is not None:
        img[:] = np.tile(bg[..., :3], (g, g, 1))[:size, :size]
    else:
        img[:] = COLOR_GRASS

    # explored overlay (alpha blend, `plantos_env_new.py:712-718`)
    overlay = np.kron(explored, np.ones((cs, cs), dtype=bool))
    img[overlay] = (img[overlay] * (1 - EXPLORED_ALPHA)
                    + np.array(COLOR_EXPLORED, np.float32) * EXPLORED_ALPHA)

    # obstacles and plants: cell rects at (row=x*cs, col=y*cs)
    cells = np.zeros((g, g, 3), np.float32)
    mask = np.zeros((g, g), bool)
    cells[obstacles] = COLOR_OBSTACLE
    mask |= obstacles
    cells[plants == 2] = COLOR_PLANT_THIRSTY
    cells[plants == 1] = COLOR_PLANT_HYDRATED
    mask |= plants > 0
    big_mask = np.kron(mask, np.ones((cs, cs), dtype=bool))
    big_cells = np.kron(cells, np.ones((cs, cs, 1), np.float32))
    img[big_mask] = big_cells[big_mask]

    # sprite pass: textured obstacles/plants over the solid fallback
    obstacle_sprite = assets.get("obstacle")
    thirsty_sprite = assets.get("plant_thirsty")
    hydrated_sprite = assets.get("plant_hydrated")
    if obstacle_sprite is not None:
        for x, y in np.argwhere(obstacles):
            _blit(img, obstacle_sprite, x * cs, y * cs)
    if thirsty_sprite is not None or hydrated_sprite is not None:
        for x, y in np.argwhere(plants > 0):
            sprite = (thirsty_sprite if plants[x, y] == 2
                      else hydrated_sprite)
            if sprite is not None:
                _blit(img, sprite, x * cs, y * cs)

    # LIDAR rays (`plantos_env_new.py:737-751`)
    rx, ry = int(rover[0]), int(rover[1])
    center_x = ry * cs + cs // 2   # image column
    center_y = rx * cs + cs // 2   # image row
    offs = lidar_offsets(lidar_channels, lidar_range)
    content = obstacles | (plants > 0)
    for i in range(lidar_channels):
        angle = (2 * math.pi * i) / lidar_channels
        hit = lidar_range
        for r in range(1, lidar_range + 1):
            dx, dy = int(offs[i, r - 1, 0]), int(offs[i, r - 1, 1])
            cx, cy = rx + dx, ry + dy
            if not (0 <= cx < g and 0 <= cy < g) or content[cx, cy]:
                hit = r
                break
        end_x = center_x + int(hit * cs * math.sin(angle))
        end_y = center_y + int(hit * cs * math.cos(angle))
        _draw_line(img, center_x, center_y, end_x, end_y, COLOR_RAY)
        _draw_disc(img, end_x, end_y, 2, COLOR_RAY)

    # rover on top (`plantos_env_new.py:753-756`)
    rover_sprite = assets.get("rover")
    if rover_sprite is not None:
        _blit(img, rover_sprite, rx * cs, ry * cs)
    else:
        img[rx * cs:(rx + 1) * cs, ry * cs:(ry + 1) * cs] = COLOR_ROVER

    # grid lines (`plantos_env_new.py:758-760`)
    for k in range(g + 1):
        p = min(k * cs, size - 1)
        img[p, :] = COLOR_GRID
        img[:, p] = COLOR_GRID

    return img.astype(np.uint8)
