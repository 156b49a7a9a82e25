"""Dense-array environment state.

Replaces the reference env's Python-object state (``rover_pos`` tuple,
``plants`` dict, ``obstacles`` set, numpy maps —
`/root/reference/gradio-app/plantos_env_new.py:97-125`) with a single
registered pytree of fixed-shape arrays so the whole env lives in HBM and an
entire batch of envs steps in one fused XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Plant-grid codes (plant channel of the cell contents).
PLANT_NONE = 0
PLANT_HYDRATED = 1
PLANT_THIRSTY = 2

# LIDAR entity types (`plantos_env_new.py:19-23`).
ENTITY_EMPTY = 0
ENTITY_OBSTACLE = 1
ENTITY_PLANT_HYDRATED = 2
ENTITY_PLANT_THIRSTY = 3


@struct.dataclass
class EnvState:
    """Complete per-env state; every field is a fixed-shape array.

    Grids are indexed ``[x, y]`` with x the row coordinate, matching the
    reference convention (movement North = x-1, `plantos_env_new.py:207-208`).
    """

    # --- world ---
    obstacles: jnp.ndarray        # bool[g, g]    — static for the episode
    plants: jnp.ndarray           # int8[g, g]    — PLANT_{NONE,HYDRATED,THIRSTY}
    rover: jnp.ndarray            # int32[2]      — (x, y)

    # --- exploration bookkeeping ---
    visit_counts: jnp.ndarray     # int32[g, g]   — persists across curriculum resets
    explored: jnp.ndarray         # bool[g, g]    — visited THIS episode
    explored_count: jnp.ndarray   # int32[]       — popcount(explored), kept incrementally
    free_cells: jnp.ndarray       # int32[]       — g*g - #obstacles (denominator)

    # --- plant bookkeeping (incremental; avoids per-step grid reductions) ---
    thirsty_count: jnp.ndarray    # int32[]       — #(plants == THIRSTY)
    total_plants: jnp.ndarray     # int32[]       — #(plants > 0), episode-constant

    # --- episode tracking (`plantos_env_new.py:120-125`) ---
    step_count: jnp.ndarray            # int32[]
    completion_bonus_given: jnp.ndarray  # bool[]
    collided_with_wall: jnp.ndarray      # bool[]  — sticky within the episode
    total_collisions: jnp.ndarray        # int32[]

    # --- randomness ---
    key: jnp.ndarray              # PRNG key for this env's future resets
