"""Procedural map generation.

Two algorithms, mirroring the reference dispatch
(`/root/reference/gradio-app/plantos_env_new.py:353-358`):

* ``original`` — random 2x2/3x3 obstacle clusters on an open field
  (`plantos_env_new.py:360-406`). Re-expressed here as a fully vectorized,
  branch-free on-device generator so auto-resetting thousands of envs never
  leaves the TPU.

* ``maze`` — randomized-DFS wide-corridor maze with irregular rooms
  (`plantos_env_new.py:408-604`). The DFS is inherently sequential and
  data-dependent, so it runs host-side (off the hot path, as a pregenerated
  map pool sampled on device at reset); see
  :class:`rlenv_tpu.env.vector.VecPlantOS`.

Design note on randomness: the reference draws map layout from the global
``random`` module, unaffected by ``reset(seed=...)``
(`plantos_env_new.py:373-406` vs `:129`), so "same seed => same map" is not
actually reproducible there. This build uses counter-based per-env JAX PRNG
keys: same key => bit-identical map, a deliberate, documented improvement.
Distributions match the reference; bit-level map parity with the reference's
unseeded global stream is ill-defined and not a goal (parity tests inject
recorded maps instead).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env.state import PLANT_HYDRATED, PLANT_THIRSTY


# ---------------------------------------------------------------------------
# 'original': on-device cluster scatter
# ---------------------------------------------------------------------------

def generate_original(key: jax.Array, cfg: EnvConfig
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate (obstacles bool[g,g], plants int8[g,g], rover int32[2]).

    Vectorized equivalent of `_generate_map_original`
    (`plantos_env_new.py:360-406`):

    * ``num_obstacles // 3`` clusters; each has a center drawn uniformly from
      ``[2, g-3]`` (inclusive, like ``random.randint``) and size 2 or 3;
      the cluster covers ``[c - s//2, c - s//2 + s)`` per axis, clipped to
      the grid.
    * plants: a uniform random ``num_plants``-subset of free cells — chosen
      via top-k over i.i.d. uniforms masked to free cells (top-k of i.i.d.
      draws restricted to a set is a uniform random subset of it).
    * rover: uniform over the remaining free cells (argmin of a fresh
      masked uniform).
    """
    g = cfg.grid_size
    n_clusters = cfg.num_obstacles // 3
    k_centers, k_sizes, k_plants, k_thirst, k_rover = jax.random.split(key, 5)

    # --- obstacle clusters ---
    if n_clusters > 0:
        centers = jax.random.randint(k_centers, (n_clusters, 2), 2, g - 2)
        sizes = jax.random.randint(k_sizes, (n_clusters,), 2, 4)  # {2, 3}
        starts = centers - (sizes // 2)[:, None]                   # [n, 2]
        coords = jnp.arange(g)
        in_x = (coords[None, :] >= starts[:, 0:1]) & \
               (coords[None, :] < starts[:, 0:1] + sizes[:, None])  # [n, g]
        in_y = (coords[None, :] >= starts[:, 1:2]) & \
               (coords[None, :] < starts[:, 1:2] + sizes[:, None])  # [n, g]
        obstacles = jnp.any(in_x[:, :, None] & in_y[:, None, :], axis=0)
    else:
        obstacles = jnp.zeros((g, g), dtype=bool)

    free = ~obstacles

    # --- plants: uniform k-subset of free cells ---
    u = jax.random.uniform(k_plants, (g * g,))
    scores = jnp.where(free.reshape(-1), u, jnp.inf)
    _, plant_idx = jax.lax.top_k(-scores, cfg.num_plants)           # k smallest
    thirsty = jax.random.uniform(k_thirst, (cfg.num_plants,)) < cfg.thirsty_plant_prob
    plant_vals = jnp.where(thirsty, PLANT_THIRSTY, PLANT_HYDRATED).astype(jnp.int8)
    plants = jnp.zeros((g * g,), dtype=jnp.int8).at[plant_idx].set(plant_vals)
    plants = plants.reshape(g, g)

    # --- rover: uniform over free cells not holding a plant ---
    v = jax.random.uniform(k_rover, (g * g,))
    rover_scores = jnp.where(free.reshape(-1) & (plants.reshape(-1) == 0), v, jnp.inf)
    rover_flat = jnp.argmin(rover_scores)
    rover = jnp.stack([rover_flat // g, rover_flat % g]).astype(jnp.int32)

    return obstacles, plants, rover


def place_entities(key: jax.Array, obstacles: jnp.ndarray, cfg: EnvConfig
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Place plants + rover on a given obstacle layout (used for maze-pool
    and injected maps). Same sampling scheme as :func:`generate_original`."""
    g = cfg.grid_size
    k_plants, k_thirst, k_rover = jax.random.split(key, 3)
    free = ~obstacles

    u = jax.random.uniform(k_plants, (g * g,))
    scores = jnp.where(free.reshape(-1), u, jnp.inf)
    _, plant_idx = jax.lax.top_k(-scores, cfg.num_plants)
    thirsty = jax.random.uniform(k_thirst, (cfg.num_plants,)) < cfg.thirsty_plant_prob
    plant_vals = jnp.where(thirsty, PLANT_THIRSTY, PLANT_HYDRATED).astype(jnp.int8)
    plants = jnp.zeros((g * g,), dtype=jnp.int8).at[plant_idx].set(plant_vals)
    plants = plants.reshape(g, g)

    v = jax.random.uniform(k_rover, (g * g,))
    rover_scores = jnp.where(free.reshape(-1) & (plants.reshape(-1) == 0), v, jnp.inf)
    rover_flat = jnp.argmin(rover_scores)
    rover = jnp.stack([rover_flat // g, rover_flat % g]).astype(jnp.int32)
    return plants, rover


# ---------------------------------------------------------------------------
# 'maze': host-side randomized DFS (off the hot path)
# ---------------------------------------------------------------------------

def generate_maze_host(rng: np.random.Generator, cfg: EnvConfig) -> np.ndarray:
    """Generate a wide-corridor maze obstacle layout, bool[g, g].

    Host-side equivalent of `_generate_map_maze` + its carving helpers
    (`plantos_env_new.py:408-604`): start fully walled, run randomized DFS
    over a ``(g-1)//6`` meta-grid, carving 5x5 rooms with 30%-chance
    extensions and a 40%-chance corner cut, connected by width-5 corridors
    with 20%-chance 2x2 bulges. (`_add_diagonal_walls` is dead code in the
    reference and intentionally not reproduced.)

    Falls back to an all-open field marker (returns ``None``) if the carved
    space can't fit plants + rover, mirroring `plantos_env_new.py:464-467`;
    callers should then use the 'original' generator.
    """
    g = cfg.grid_size
    walls = np.ones((g, g), dtype=bool)
    meta_w = (g - 1) // 6
    meta_h = (g - 1) // 6
    if meta_w <= 0 or meta_h <= 0:
        return None

    def carve_room(mx: int, my: int) -> None:
        bx, by = mx * 6 + 1, my * 6 + 1
        walls[max(bx, 0):min(bx + 5, g), max(by, 0):min(by + 5, g)] = False
        if rng.random() < 0.3:  # extend right (+x), rows 2..3 of the room
            walls[max(bx + 5, 0):min(bx + 7, g), max(by + 2, 0):min(by + 4, g)] = False
        if rng.random() < 0.3:  # extend down (+y)
            walls[max(bx + 2, 0):min(bx + 4, g), max(by + 5, 0):min(by + 7, g)] = False
        if rng.random() < 0.4:  # corner cut: re-wall one corner cell
            cx, cy = [(0, 0), (4, 0), (0, 4), (4, 4)][rng.integers(4)]
            px, py = bx + cx, by + cy
            if 0 <= px < g and 0 <= py < g:
                walls[px, py] = True

    def carve_corridor(ax: int, ay: int, bx: int, by: int, width: int = 5) -> None:
        if ax == bx:  # vertical run of meta cells
            for my in range(min(ay, by), max(ay, by) + 1):
                x0, y0 = ax * 6 + 1, my * 6 + 1
                walls[max(x0, 0):min(x0 + width, g), max(y0, 0):min(y0 + 6, g)] = False
        else:         # horizontal run
            for mx in range(min(ax, bx), max(ax, bx) + 1):
                x0, y0 = mx * 6 + 1, ay * 6 + 1
                walls[max(x0, 0):min(x0 + 6, g), max(y0, 0):min(y0 + width, g)] = False

    def add_bulge(ax: int, ay: int, bx: int, by: int, dx: int, dy: int) -> None:
        mx, my = (ax + bx) // 2, (ay + by) // 2
        side = rng.choice([-1, 1])
        if dx == 0:  # vertical path: bulge horizontally
            x0 = mx * 6 + 2 + side * 2
            y0 = my * 6 + 2
        else:        # horizontal path: bulge vertically
            x0 = mx * 6 + 2
            y0 = my * 6 + 2 + side * 2
        walls[max(x0, 0):min(x0 + 2, g), max(y0, 0):min(y0 + 2, g)] = False

    visited = np.zeros((meta_w, meta_h), dtype=bool)
    sx, sy = int(rng.integers(meta_w)), int(rng.integers(meta_h))
    stack = [(sx, sy)]
    visited[sx, sy] = True
    carve_room(sx, sy)

    while stack:
        cx, cy = stack[-1]
        neighbors = []
        for dx, dy in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nx, ny = cx + dx, cy + dy
            if 0 <= nx < meta_w and 0 <= ny < meta_h and not visited[nx, ny]:
                neighbors.append((nx, ny, dx, dy))
        if neighbors:
            nx, ny, dx, dy = neighbors[rng.integers(len(neighbors))]
            carve_corridor(cx, cy, nx, ny)
            if rng.random() < 0.2:
                add_bulge(cx, cy, nx, ny, dx, dy)
            carve_room(nx, ny)
            visited[nx, ny] = True
            stack.append((nx, ny))
        else:
            stack.pop()

    if (~walls).sum() < cfg.num_plants + 1:
        return None
    return walls


def generate_maze_pool(seed: int, cfg: EnvConfig, pool_size: int,
                       use_native: bool = True) -> np.ndarray:
    """Pregenerate ``pool_size`` maze layouts host-side → bool[pool, g, g].

    Device resets then sample uniformly from this pool, keeping the jitted
    hot path free of host callbacks. Uses the C++ generator
    (`native/mazegen.cpp`, built on demand) when available; otherwise the
    pure-Python carver above.
    """
    if use_native:
        from rlenv_tpu.env.native import generate_maze_pool_native
        pool = generate_maze_pool_native(seed, cfg.grid_size, pool_size,
                                         cfg.num_plants + 1)
        if pool is not None:
            return pool

    rng = np.random.default_rng(seed)
    layouts = []
    while len(layouts) < pool_size:
        walls = generate_maze_host(rng, cfg)
        if walls is None:  # fallback mirrors plantos_env_new.py:464-467
            import jax.random as jrandom
            obstacles, _, _ = generate_original(
                jrandom.PRNGKey(int(rng.integers(2**31))), cfg)
            walls = np.asarray(obstacles)
        layouts.append(walls)
    return np.stack(layouts)
