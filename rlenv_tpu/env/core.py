"""PlantOS / GROW-R environment as pure, jittable functions.

The reference implements the simulation as a stateful Gymnasium class whose
``step`` walks Python loops and dict/set lookups
(`/root/reference/gradio-app/plantos_env_new.py:162-330`). Here the entire
transition — movement, watering, exploration bookkeeping, the C-ray LIDAR
raycast, reward machine and termination — is one branch-free array program:

    state', obs, reward, terminated, truncated, info = env.step(state, action)

``jax.vmap(env.step)`` steps thousands of envs in lockstep on one chip;
sharding the batch dimension over a `jax.sharding.Mesh` scales it across a
pod slice. No Python control flow depends on data, so XLA fuses the whole
step into a handful of kernels.

Behavioral contract (v1 semantics, `plantos_env_new.py`):

* actions: 0=North(-1,0), 1=East(0,+1), 2=South(+1,0), 3=West(0,-1), 4=Water
  (`:207-208`).
* rewards: R_STEP every step plus movement/watering reward; one-time
  completion bonus at 100% exploration (`:162-195`).
* observation: per-ray [dist/R, one-hot{empty,obstacle,hydrated,thirsty}]
  + (x/g, y/g) + 5x5 local visit map (counts clamped at 10, /10,
  out-of-bounds cells read 1.0), total C*5+2+25 (`:272-330`).
* termination at 100% exploration, truncation at max_steps (`:186-188`).

Documented deviations from the reference (bugs not reproduced):
* map layout is a deterministic function of the reset PRNG key (the
  reference draws from the unseeded global ``random`` module, so its
  ``reset(seed=...)`` does not actually fix the map — SURVEY.md §3.5).
* the v0 watering crash on hydrated plants (`plantos_env.py:219-220`)
  is fixed as in v1 (`plantos_env_new.py:236-245`).
* ``_update_lidar`` is a stub in the reference (`:259-262`) — exploration
  advances only by rover movement; we keep that semantic without the
  dead code, and likewise drop the write-only ``ground_truth_map``
  (`:249-253`) and never-called ``_add_diagonal_walls`` (`:582-604`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env import mapgen
from rlenv_tpu.env.lidar import lidar_offsets, visit_map_offsets
from rlenv_tpu.env.state import (
    ENTITY_OBSTACLE,
    EnvState,
    PLANT_HYDRATED,
    PLANT_THIRSTY,
)

# Movement deltas for actions 0..3; action 4 (water) maps to (0, 0) so the
# same gather path serves all actions (`plantos_env_new.py:207-208`).
_ACTION_DELTAS = np.array(
    [[-1, 0], [0, 1], [1, 0], [0, -1], [0, 0]], dtype=np.int32)

ACTION_NORTH, ACTION_EAST, ACTION_SOUTH, ACTION_WEST, ACTION_WATER = range(5)


class PlantOS:
    """Functional PlantOS environment.

    ``self`` carries only the (hashable) config and precomputed constant
    tables; all methods are pure functions of their array arguments and are
    safe to ``jax.jit`` / ``jax.vmap`` directly.
    """

    def __init__(self, config: EnvConfig = EnvConfig(),
                 maze_pool: Optional[np.ndarray] = None,
                 maze_pool_seed: int = 0, maze_pool_size: int = 64):
        self.config = config
        self._deltas = jnp.asarray(_ACTION_DELTAS)
        self._lidar_off = jnp.asarray(
            lidar_offsets(config.lidar_channels, config.lidar_range))
        self._visit_off = jnp.asarray(
            visit_map_offsets(config.visit_map_size))
        # Window half-width for the slice-based observation: all probe
        # offsets (rays + visit map) fit in a (2W+1)^2 window at the rover.
        self._win = max(config.lidar_range, config.visit_map_size // 2)
        if config.map_generation_algo == "maze":
            if maze_pool is None:
                maze_pool = mapgen.generate_maze_pool(
                    maze_pool_seed, config, maze_pool_size)
            self._maze_pool = jnp.asarray(maze_pool)
        else:
            self._maze_pool = None

    # -- properties ---------------------------------------------------------

    @property
    def obs_dim(self) -> int:
        return self.config.obs_dim

    @property
    def num_actions(self) -> int:
        return self.config.num_actions

    # -- reset --------------------------------------------------------------

    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray, Dict]:
        """Fresh episode on a newly generated map (`plantos_env_new.py:127-160`)."""
        map_key, next_key = jax.random.split(key)
        if self._maze_pool is not None:
            k_pool, k_place = jax.random.split(map_key)
            idx = jax.random.randint(k_pool, (), 0, self._maze_pool.shape[0])
            obstacles = self._maze_pool[idx]
            plants, rover = mapgen.place_entities(k_place, obstacles, self.config)
        else:
            obstacles, plants, rover = mapgen.generate_original(
                map_key, self.config)
        return self._reset_from(obstacles, plants, rover, next_key)

    def reset_from_map(self, key: jax.Array, obstacles: jnp.ndarray,
                       plants: jnp.ndarray, rover: jnp.ndarray
                       ) -> Tuple[EnvState, jnp.ndarray, Dict]:
        """Start an episode on an injected map (parity tests, curriculum
        maze-reuse, custom scenarios)."""
        return self._reset_from(jnp.asarray(obstacles, bool),
                                jnp.asarray(plants, jnp.int8),
                                jnp.asarray(rover, jnp.int32), key)

    def _reset_from(self, obstacles, plants, rover, key):
        g = self.config.grid_size
        explored = jnp.zeros((g, g), bool).at[rover[0], rover[1]].set(True)
        visit_counts = (jnp.zeros((g, g), jnp.int32)
                        .at[rover[0], rover[1]].set(1))
        state = EnvState(
            obstacles=obstacles,
            plants=plants,
            rover=rover,
            visit_counts=visit_counts,
            explored=explored,
            explored_count=jnp.int32(1),
            free_cells=(g * g - jnp.sum(obstacles)).astype(jnp.int32),
            thirsty_count=jnp.sum(plants == PLANT_THIRSTY).astype(jnp.int32),
            total_plants=jnp.sum(plants > 0).astype(jnp.int32),
            step_count=jnp.int32(0),
            completion_bonus_given=jnp.bool_(False),
            collided_with_wall=jnp.bool_(False),
            total_collisions=jnp.int32(0),
            key=key,
        )
        return state, self.observe(state), self.get_info(state)

    # -- step ---------------------------------------------------------------

    def step(self, state: EnvState, action: jnp.ndarray
             ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                        jnp.ndarray, Dict]:
        """One transition (`plantos_env_new.py:162-195`), branch-free."""
        cfg = self.config
        g = cfg.grid_size
        R = cfg.rewards
        action = jnp.asarray(action, jnp.int32)

        step_count = state.step_count + 1
        is_move = action < 4

        # --- movement (`plantos_env_new.py:197-234`) ---
        delta = self._deltas[action]
        new_pos = state.rover + delta
        in_bounds = jnp.all((new_pos >= 0) & (new_pos < g))
        npx = jnp.clip(new_pos[0], 0, g - 1)
        npy = jnp.clip(new_pos[1], 0, g - 1)
        blocked = state.obstacles[npx, npy]
        valid_move = is_move & in_bounds & ~blocked
        invalid_move = is_move & ~valid_move

        target = jnp.where(valid_move, new_pos, state.rover)
        tx, ty = target[0], target[1]
        never_visited = state.visit_counts[tx, ty] == 0
        move_reward = jnp.where(
            valid_move,
            jnp.where(never_visited, R.exploration, R.revisit),
            R.invalid)
        newly_explored = valid_move & ~state.explored[tx, ty]
        explored_count = state.explored_count + newly_explored.astype(jnp.int32)

        # --- watering (`plantos_env_new.py:236-245`) ---
        rx, ry = state.rover[0], state.rover[1]
        plant_here = state.plants[rx, ry]
        water_reward = jnp.where(
            plant_here == PLANT_THIRSTY, R.goal,
            jnp.where(plant_here == PLANT_HYDRATED, R.mistake, R.water_empty))
        do_water = (~is_move) & (plant_here == PLANT_THIRSTY)

        # --- grid updates as fused one-hot arithmetic ---
        # Scatter (`.at[]`) would force a full-array copy per update inside
        # scan; broadcast-compare selects instead fuse all three grid
        # updates into one elementwise pass on the VPU.
        ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        sel_target = (ix == tx) & (iy == ty)
        visit_counts = state.visit_counts + (
            sel_target & valid_move).astype(jnp.int32)
        explored = state.explored | sel_target
        sel_rover = (ix == rx) & (iy == ry)
        plants = jnp.where(sel_rover & do_water, jnp.int8(PLANT_HYDRATED),
                           state.plants)

        reward = R.step + jnp.where(is_move, move_reward, water_reward)

        # --- termination & completion bonus (`plantos_env_new.py:186-195`) ---
        fully_explored = explored_count >= state.free_cells
        terminated = fully_explored
        truncated = step_count >= cfg.max_steps
        give_bonus = fully_explored & ~state.completion_bonus_given
        reward = reward + jnp.where(give_bonus, R.complete_exploration, 0.0)

        new_state = EnvState(
            obstacles=state.obstacles,
            plants=plants,
            rover=target,
            visit_counts=visit_counts,
            explored=explored,
            explored_count=explored_count,
            free_cells=state.free_cells,
            thirsty_count=state.thirsty_count - do_water.astype(jnp.int32),
            total_plants=state.total_plants,
            step_count=step_count,
            completion_bonus_given=state.completion_bonus_given | fully_explored,
            collided_with_wall=state.collided_with_wall | invalid_move,
            total_collisions=state.total_collisions
            + invalid_move.astype(jnp.int32),
            key=state.key,
        )

        obs = self.observe(new_state)
        info = self.get_info(new_state)
        info["is_watering"] = ~is_move
        return (new_state, obs, jnp.asarray(reward, jnp.float32),
                terminated, truncated, info)

    # -- observation --------------------------------------------------------

    def observe(self, state: EnvState) -> jnp.ndarray:
        """107-dim (at training config) observation (`plantos_env_new.py:272-330`).

        TPU-friendly formulation: instead of one scattered gather per probe
        offset (C*R rays + 25 visit cells), slice ONE contiguous
        (2W+1)x(2W+1) window at the rover out of padded grids, then index
        it with compile-time-constant offsets. Padding encodes the
        boundary conventions exactly: out-of-bounds rays read
        ENTITY_OBSTACLE (first-OOB => obstacle hit, `:292-295`) and
        out-of-bounds visit cells read a saturated count (=> 1.0 after the
        clamp-by-10, `:326-327`).
        """
        cfg = self.config
        g = cfg.grid_size

        # --- LIDAR: masked point gathers straight off the world grids ---
        # (no full-grid entity materialization; the probe set is ~C*R
        # points per env). Out-of-bounds probes read as obstacle hits
        # (`plantos_env_new.py:292-295`).
        probe = state.rover[None, None, :] + self._lidar_off      # [C, R, 2]
        oob = jnp.any((probe < 0) | (probe >= g), axis=-1)        # [C, R]
        px = jnp.clip(probe[..., 0], 0, g - 1)
        py = jnp.clip(probe[..., 1], 0, g - 1)
        pl = state.plants[px, py].astype(jnp.int32)               # [C, R]
        val = jnp.where(oob | state.obstacles[px, py],
                        ENTITY_OBSTACLE, pl + (pl > 0))
        hit = val > 0
        any_hit = jnp.any(hit, axis=-1)                           # [C]
        first = jnp.argmax(hit, axis=-1)                          # [C]
        dist = jnp.where(any_hit, first + 1, cfg.lidar_range)
        etype = jnp.where(
            any_hit,
            jnp.take_along_axis(val, first[:, None], axis=-1)[:, 0], 0)
        lidar = jnp.concatenate(
            [(dist.astype(jnp.float32) / cfg.lidar_range)[:, None],
             jax.nn.one_hot(etype, 4, dtype=jnp.float32)], axis=-1)  # [C, 5]

        # --- normalized position (`plantos_env_new.py:313-315`) ---
        pos = state.rover.astype(jnp.float32) / g

        # --- 5x5 local visit map (`plantos_env_new.py:317-328`) ---
        vprobe = state.rover[None, :] + self._visit_off           # [25, 2]
        v_oob = jnp.any((vprobe < 0) | (vprobe >= g), axis=-1)
        vx = jnp.clip(vprobe[:, 0], 0, g - 1)
        vy = jnp.clip(vprobe[:, 1], 0, g - 1)
        counts = jnp.minimum(state.visit_counts[vx, vy], 10)
        visit_map = jnp.where(v_oob, 1.0, counts.astype(jnp.float32) / 10.0)

        return jnp.concatenate([lidar.reshape(-1), pos, visit_map]).astype(
            jnp.float32)

    # -- info ---------------------------------------------------------------

    def get_info(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        """Diagnostic dict mirroring `_get_info` (`plantos_env_new.py:332-351`)."""
        total_plants = state.total_plants
        thirsty = state.thirsty_count
        return {
            "rover_position": state.rover,
            "thirsty_plants": thirsty,
            "hydrated_plants": total_plants - thirsty,
            "total_plants": total_plants,
            "step_count": state.step_count,
            "explored_cells": state.explored_count,
            "total_cells": state.free_cells,
            "exploration_percentage":
                100.0 * state.explored_count.astype(jnp.float32)
                / state.free_cells.astype(jnp.float32),
            "lidar_range": jnp.int32(self.config.lidar_range),
            "lidar_channels": jnp.int32(self.config.lidar_channels),
            "collided_with_wall": state.collided_with_wall,
            "total_collisions": state.total_collisions,
        }
