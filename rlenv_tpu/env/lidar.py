"""LIDAR geometry tables.

The reference marches each ray in a Python loop, recomputing
``dx = int(r*cos(theta)), dy = int(r*sin(theta))`` per cell
(`/root/reference/gradio-app/plantos_env_new.py:282-305`). On TPU the whole
raycast is a precomputed ``(C, R, 2)`` integer offset table + one batched
gather + a branch-free "first hit" reduction (see
:meth:`rlenv_tpu.env.core.PlantOS._lidar`).

The ``int()`` truncation-toward-zero (asymmetric for negative ray
components) is part of the observation contract the reference's shipped
checkpoints were trained on, so it is reproduced exactly: for some angles a
ray's first probe lands on the rover's own cell (offset (0, 0)), which can
"see" a plant the rover is standing on — that quirk is preserved.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def lidar_offsets(channels: int, lidar_range: int) -> np.ndarray:
    """int32[(channels, lidar_range, 2)] relative probe offsets.

    ``offsets[i, r-1] = (trunc(r*cos(2*pi*i/C)), trunc(r*sin(2*pi*i/C)))``,
    computed in float64 to match CPython's double-precision ``math.cos`` /
    ``math.sin`` bit-for-bit.
    """
    angles = 2.0 * np.pi * np.arange(channels, dtype=np.float64) / channels
    r = np.arange(1, lidar_range + 1, dtype=np.float64)
    dx = np.trunc(np.outer(np.cos(angles), r)).astype(np.int32)  # [C, R]
    dy = np.trunc(np.outer(np.sin(angles), r)).astype(np.int32)
    return np.stack([dx, dy], axis=-1)  # [C, R, 2]


@functools.lru_cache(maxsize=None)
def visit_map_offsets(visit_map_size: int) -> np.ndarray:
    """int32[(visit_map_size**2, 2)] offsets of the local visit window.

    Row-major over (local_x, local_y) so that flat index
    ``local_x * size + local_y`` matches the reference layout
    (`plantos_env_new.py:317-328`).
    """
    half = visit_map_size // 2
    lx, ly = np.meshgrid(np.arange(visit_map_size), np.arange(visit_map_size),
                         indexing="ij")
    return np.stack([lx - half, ly - half], axis=-1).reshape(-1, 2).astype(np.int32)
