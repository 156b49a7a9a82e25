"""Fused environment transition as a single Pallas TPU kernel.

The XLA path (`rlenv_tpu.env.core.PlantOS.step` + ``observe``) lowers to a
handful of kernels per step: the grid updates fuse into one elementwise
pass, but the LIDAR / visit-map probes become device gathers and the whole
pipeline re-reads the grids from HBM several times. This module fuses the
ENTIRE transition — movement, watering, exploration bookkeeping, reward
machine, termination and the full 107-dim observation — into ONE Pallas
program so every grid crosses HBM exactly once per step.

Design notes (TPU, not a port — the reference computes all of this in
Python loops, `/root/reference/gradio-app/plantos_env_new.py:162-330`):

* Grids live flattened and lane-padded: ``[B, L]`` with
  ``L = ceil(g*g/128)*128`` (640 lanes for the 25x25 training grid), so
  every row is perfectly tiled for the 8x128 VPU. Padding lanes hold 0 and
  can never be selected (all probe indices are < g*g).
* Per-env dynamic indexing (the classic TPU-hostile gather) appears twice
  and gets two different treatments:
  - The handful of PRE-movement probes (obstacle at the candidate cell,
    visits/plant at the rover cell) use *lane-compare reductions*:
    value-at-index = ``sum(where(lane_iota == idx, grid, 0), axis=lanes)``,
    vectorized over the env block.
  - The ~121 OBSERVATION probes (96 LIDAR + 25 visit-map cells) all sit at
    static displacements from the post-move rover cell. Entity codes and
    clamped visit counts are bit-packed into one int32 grid (``E |
    min(visits,10) << 2``) which is then *barrel-rotated* so the rover
    lands on lane 0: ten conditional static rotations (one per bit of
    ``rover_flat``), after which every probe is a STATIC lane read —
    no per-probe reductions or scalar address math at all.
* A probe at relative offset (dx, dy) has flat index ``rover_flat +
  dx*g + dy`` whenever it is in bounds, i.e. static rotated lane
  ``(dx*g + dy) mod L``; out-of-bounds probes are masked afterwards (OOB
  LIDAR reads "obstacle", OOB visit cells read 1.0 —
  `plantos_env_new.py:292-295,326-327`), and every wrapped-around lane
  read is by construction an OOB probe, so the masking also covers the
  rotation's modular wrap.
* The first-hit scan folds far-to-near over the 6 range slices (16 lanes
  each, range-major) so the nearest hit wins — no argmax gather.
* The kernel emits the observation in component-major column order; a
  static column permutation outside the kernel produces the reference's
  channel-major layout (`plantos_env_new.py:272-330`).

Exact-parity with the XLA path is asserted by ``tests/test_ops_fused.py``
(interpret mode on CPU, bit-identical obs/reward/state).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env.lidar import lidar_offsets, visit_map_offsets
from rlenv_tpu.env.state import ENTITY_OBSTACLE, EnvState, PLANT_HYDRATED, PLANT_THIRSTY

# scal[:, c] column assignments (int32 per-env scalars).
_SC_RX = 0
_SC_RY = 1
_SC_STEP = 2
_SC_EXPLORED = 3
_SC_FREE = 4
_SC_THIRSTY = 5
_SC_TOTAL_PLANTS = 6
_SC_BONUS = 7
_SC_COLLIDED = 8
_SC_COLLISIONS = 9
_SC_COLS = 16


def _lane_pad(n: int) -> int:
    return ((n + 127) // 128) * 128


@struct.dataclass
class FlatEnvState:
    """Kernel-layout batched env state: flattened, lane-padded grids."""

    obstacles: jnp.ndarray   # int8[B, L]
    plants: jnp.ndarray      # int8[B, L]
    visits: jnp.ndarray      # int32[B, L]
    explored: jnp.ndarray    # int8[B, L]
    scal: jnp.ndarray        # int32[B, 16]
    key: jnp.ndarray         # per-env PRNG key, [B, 2] uint32


def pack_state(state: EnvState, grid_size: int) -> FlatEnvState:
    """[B, g, g] EnvState batch -> kernel layout (used at reset boundaries)."""
    g = grid_size
    B = state.rover.shape[0]
    L = _lane_pad(g * g)

    def flat(x, dtype):
        x = x.reshape(B, g * g).astype(dtype)
        return jnp.pad(x, ((0, 0), (0, L - g * g)))

    scal = jnp.stack([
        state.rover[:, 0], state.rover[:, 1],
        state.step_count, state.explored_count, state.free_cells,
        state.thirsty_count, state.total_plants,
        state.completion_bonus_given.astype(jnp.int32),
        state.collided_with_wall.astype(jnp.int32),
        state.total_collisions,
    ], axis=1).astype(jnp.int32)
    scal = jnp.pad(scal, ((0, 0), (0, _SC_COLS - scal.shape[1])))
    return FlatEnvState(
        obstacles=flat(state.obstacles, jnp.int8),
        plants=flat(state.plants, jnp.int8),
        visits=flat(state.visit_counts, jnp.int32),
        explored=flat(state.explored, jnp.int8),
        scal=scal,
        key=state.key,
    )


def unpack_state(flat: FlatEnvState, grid_size: int) -> EnvState:
    """Kernel layout -> standard EnvState batch (rendering, debugging)."""
    g = grid_size
    B = flat.scal.shape[0]

    def grid(x, dtype):
        return x[:, : g * g].reshape(B, g, g).astype(dtype)

    sc = flat.scal
    return EnvState(
        obstacles=grid(flat.obstacles, bool),
        plants=grid(flat.plants, jnp.int8),
        rover=sc[:, _SC_RX:_SC_RY + 1],
        visit_counts=grid(flat.visits, jnp.int32),
        explored=grid(flat.explored, bool),
        explored_count=sc[:, _SC_EXPLORED],
        free_cells=sc[:, _SC_FREE],
        thirsty_count=sc[:, _SC_THIRSTY],
        total_plants=sc[:, _SC_TOTAL_PLANTS],
        step_count=sc[:, _SC_STEP],
        completion_bonus_given=sc[:, _SC_BONUS].astype(bool),
        collided_with_wall=sc[:, _SC_COLLIDED].astype(bool),
        total_collisions=sc[:, _SC_COLLISIONS],
        key=flat.key,
    )


@functools.lru_cache(maxsize=None)
def _probe_lanes(channels: int, lidar_range: int, visit_map_size: int,
                 grid_size: int, L: int):
    """Static probe geometry as ROTATED lane indices.

    After the kernel barrel-rotates the packed grid so the rover sits on
    lane 0, the probe at relative offset (dx, dy) lives at static lane
    ``(dx*g + dy) mod L``. Returns the raw offset tables plus per-range
    LIDAR lanes ([R, C], range-major for the first-hit fold) and the
    visit-window lanes ([V]).
    """
    lid = lidar_offsets(channels, lidar_range)          # [C, R, 2]
    vis = visit_map_offsets(visit_map_size)             # [V, 2]
    g = grid_size
    lid_lanes = np.array(
        [[(int(lid[c, r, 0]) * g + int(lid[c, r, 1])) % L
          for c in range(channels)]
         for r in range(lidar_range)], dtype=np.int32)   # [R, C]
    visit_lanes = np.array([(int(dx) * g + int(dy)) % L
                            for dx, dy in vis], dtype=np.int32)
    return lid, vis, lid_lanes, visit_lanes


def _obs_permutation(config: EnvConfig) -> np.ndarray:
    """Kernel column (component-major) -> reference obs (channel-major).

    Kernel layout: [dist(C) | onehot0(C) | .. | onehot3(C) | x | y | visits].
    Reference layout: per channel [dist, onehot0..3], then (x, y), visits
    (`plantos_env_new.py:272-330`).
    """
    C = config.lidar_channels
    V = config.visit_map_size ** 2
    perm = np.empty(config.obs_dim, dtype=np.int32)
    for c in range(C):
        perm[c * 5] = c
        for k in range(4):
            perm[c * 5 + 1 + k] = (k + 1) * C + c
    perm[5 * C] = 5 * C
    perm[5 * C + 1] = 5 * C + 1
    perm[5 * C + 2:] = np.arange(V) + 5 * C + 2
    return perm


def build_fused_step(config: EnvConfig, num_envs: int,
                     block_envs: int = 128, interpret: bool = False):
    """Returns ``step(flat_state, actions) -> (flat_state', obs, reward,
    terminated, truncated, is_watering)`` running as one Pallas program.

    ``obs`` comes back in the reference's channel-major layout; all outputs
    are bit-identical to the XLA path in :mod:`rlenv_tpu.env.core`.
    """
    from jax.experimental import pallas as pl

    g = config.grid_size
    C = config.lidar_channels
    Rr = config.lidar_range
    V = config.visit_map_size ** 2
    L = _lane_pad(g * g)
    R = config.rewards
    max_steps = config.max_steps

    while num_envs % block_envs != 0 or block_envs > num_envs:
        block_envs //= 2
    if block_envs < 1:
        raise ValueError(f"num_envs={num_envs} not blockable")
    Bb = block_envs
    n_blocks = num_envs // Bb

    lid, vis, lid_lanes, visit_lanes = _probe_lanes(
        C, Rr, config.visit_map_size, g, L)
    ROT_BITS = (g * g - 1).bit_length()   # rover_flat < g*g <= 1 << ROT_BITS
    perm = _obs_permutation(config)
    OBS_PAD = _lane_pad(config.obs_dim)

    def kernel(obst_ref, plants_ref, visits_ref, explored_ref, scal_ref,
               action_ref, pdx_ref, pdy_ref, vdx_ref, vdy_ref,
               plants_out, visits_out, explored_out, scal_out,
               obs_out, rew_out, flags_out):
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, L), 1)
        obst = obst_ref[:].astype(jnp.int32)
        plants = plants_ref[:].astype(jnp.int32)
        visits = visits_ref[:]
        explored = explored_ref[:].astype(jnp.int32)
        sc = scal_ref[:]

        rx = sc[:, _SC_RX:_SC_RX + 1]
        ry = sc[:, _SC_RY:_SC_RY + 1]
        a = action_ref[:]                     # [Bb, 1]
        is_move = a < 4

        # --- movement (`plantos_env_new.py:197-234`) ---
        dx = jnp.where(a == 0, -1, 0) + jnp.where(a == 2, 1, 0)
        dy = jnp.where(a == 1, 1, 0) + jnp.where(a == 3, -1, 0)
        npx, npy = rx + dx, ry + dy
        in_bounds = (npx >= 0) & (npx < g) & (npy >= 0) & (npy < g)
        nidx = jnp.clip(npx, 0, g - 1) * g + jnp.clip(npy, 0, g - 1)
        blocked = jnp.sum(jnp.where(lane == nidx, obst, 0),
                          axis=1, keepdims=True) > 0
        valid = is_move & in_bounds & ~blocked
        invalid_move = is_move & ~valid
        tx = jnp.where(valid, npx, rx)
        ty = jnp.where(valid, npy, ry)
        tidx = tx * g + ty
        sel_t = lane == tidx
        visit_at_t = jnp.sum(jnp.where(sel_t, visits, 0),
                             axis=1, keepdims=True)
        never_visited = visit_at_t == 0
        expl_at_t = jnp.sum(jnp.where(sel_t, explored, 0),
                            axis=1, keepdims=True) > 0
        newly_explored = valid & ~expl_at_t

        # --- watering (`plantos_env_new.py:236-245`); for action 4 the
        # rover does not move, so sel_t is also the rover cell ---
        ridx = rx * g + ry
        sel_r = lane == ridx
        plant_here = jnp.sum(jnp.where(sel_r, plants, 0),
                             axis=1, keepdims=True)
        water_reward = jnp.where(
            plant_here == PLANT_THIRSTY, R.goal,
            jnp.where(plant_here == PLANT_HYDRATED, R.mistake,
                      R.water_empty))
        do_water = ~is_move & (plant_here == PLANT_THIRSTY)

        # --- grid updates, one elementwise pass each ---
        new_visits = visits + (sel_t & valid).astype(jnp.int32)
        new_explored = explored | sel_t.astype(jnp.int32)
        new_plants = jnp.where(sel_r & do_water,
                               jnp.int32(PLANT_HYDRATED), plants)

        # --- reward & termination (`plantos_env_new.py:162-195`) ---
        move_reward = jnp.where(
            valid,
            jnp.where(never_visited, R.exploration, R.revisit),
            R.invalid)
        explored_count = (sc[:, _SC_EXPLORED:_SC_EXPLORED + 1]
                          + newly_explored.astype(jnp.int32))
        free_cells = sc[:, _SC_FREE:_SC_FREE + 1]
        fully = explored_count >= free_cells
        bonus_given = sc[:, _SC_BONUS:_SC_BONUS + 1] > 0
        give_bonus = fully & ~bonus_given
        reward = (jnp.float32(R.step)
                  + jnp.where(is_move, move_reward, water_reward)
                  + jnp.where(give_bonus, R.complete_exploration, 0.0))
        step_count = sc[:, _SC_STEP:_SC_STEP + 1] + 1
        terminated = fully
        truncated = step_count >= max_steps

        # --- observation on the POST-step state (rover at target) ---
        # Bit-pack entity code + clamped visit count, then barrel-rotate so
        # the rover cell lands on lane 0: one conditional static rotation
        # per bit of tidx. After that every probe is a static lane read.
        entity = jnp.where(obst > 0, ENTITY_OBSTACLE,
                           new_plants + (new_plants > 0))
        packed = entity | (jnp.minimum(new_visits, 10) << 2)
        rolled = packed
        for k in range(ROT_BITS):
            sh = 1 << k
            rot = jnp.concatenate([rolled[:, sh:], rolled[:, :sh]], axis=1)
            rolled = jnp.where((tidx & sh) > 0, rot, rolled)
        # rolled[e, j] == packed[e, (tidx[e] + j) % L]; wrapped lanes are
        # always OOB probes, masked below.

        def gather_lanes(lanes):
            return jnp.concatenate(
                [rolled[:, int(l):int(l) + 1] for l in lanes], axis=1)

        # First-hit fold, far -> near (`plantos_env_new.py:282-305`).
        dist = jnp.full((Bb, C), Rr, jnp.int32)
        etype = jnp.zeros((Bb, C), jnp.int32)
        for r in range(Rr - 1, -1, -1):
            pdx = pdx_ref[r:r + 1, :]                      # [1, C]
            pdy = pdy_ref[r:r + 1, :]
            px, py = tx + pdx, ty + pdy
            oob = (px < 0) | (px >= g) | (py < 0) | (py >= g)
            ev = gather_lanes(lid_lanes[r]) & 3            # [Bb, C]
            val = jnp.where(oob, ENTITY_OBSTACLE, ev)
            hit = val > 0
            dist = jnp.where(hit, r + 1, dist)
            etype = jnp.where(hit, val, etype)

        # Visit window (`plantos_env_new.py:317-328`): OOB reads 1.0.
        vx, vy = tx + vdx_ref[:], ty + vdy_ref[:]          # [Bb, V]
        v_oob = (vx < 0) | (vx >= g) | (vy < 0) | (vy >= g)
        vcounts = gather_lanes(visit_lanes) >> 2
        visit_map = jnp.where(v_oob, 1.0, vcounts.astype(jnp.float32) / 10.0)

        obs_out[:] = jnp.concatenate([
            dist.astype(jnp.float32) / Rr,                 # [Bb, C]
            (etype == 0).astype(jnp.float32),
            (etype == 1).astype(jnp.float32),
            (etype == 2).astype(jnp.float32),
            (etype == 3).astype(jnp.float32),
            tx.astype(jnp.float32) / g,
            ty.astype(jnp.float32) / g,
            visit_map,
            jnp.zeros((Bb, OBS_PAD - (5 * C + 2 + V)), jnp.float32),
        ], axis=1)                                         # [Bb, OBS_PAD]

        # --- writebacks ---
        plants_out[:] = new_plants.astype(jnp.int8)
        visits_out[:] = new_visits
        explored_out[:] = new_explored.astype(jnp.int8)
        zeros = jnp.zeros_like(tx)
        scal_out[:] = jnp.concatenate([
            tx, ty, step_count, explored_count, free_cells,
            sc[:, _SC_THIRSTY:_SC_THIRSTY + 1] - do_water.astype(jnp.int32),
            sc[:, _SC_TOTAL_PLANTS:_SC_TOTAL_PLANTS + 1],
            (bonus_given | fully).astype(jnp.int32),
            ((sc[:, _SC_COLLIDED:_SC_COLLIDED + 1] > 0) | invalid_move
             ).astype(jnp.int32),
            sc[:, _SC_COLLISIONS:_SC_COLLISIONS + 1]
            + invalid_move.astype(jnp.int32),
        ] + [zeros] * (_SC_COLS - 10), axis=1)
        rew_out[:] = reward.astype(jnp.float32)
        flags_out[:] = jnp.concatenate([
            terminated.astype(jnp.int32), truncated.astype(jnp.int32),
            (~is_move).astype(jnp.int32), zeros], axis=1)

    def spec(cols):
        return pl.BlockSpec((Bb, cols), lambda i: (i, 0))

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0))

    # Allow bigger env blocks than the default 16 MiB scoped-vmem budget
    # permits (the chip has 128 MiB of VMEM).
    if interpret:
        compiler_params = None
    else:
        from jax.experimental.pallas import tpu as pltpu
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)

    pallas_step = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid=(n_blocks,),
        in_specs=[spec(L), spec(L), spec(L), spec(L), spec(_SC_COLS),
                  spec(1), const_spec(Rr, C), const_spec(Rr, C),
                  const_spec(1, V), const_spec(1, V)],
        out_specs=[spec(L), spec(L), spec(L), spec(_SC_COLS),
                   spec(OBS_PAD), spec(1), spec(4)],
        out_shape=[
            jax.ShapeDtypeStruct((num_envs, L), jnp.int8),      # plants
            jax.ShapeDtypeStruct((num_envs, L), jnp.int32),     # visits
            jax.ShapeDtypeStruct((num_envs, L), jnp.int8),      # explored
            jax.ShapeDtypeStruct((num_envs, _SC_COLS), jnp.int32),
            jax.ShapeDtypeStruct((num_envs, OBS_PAD), jnp.float32),
            jax.ShapeDtypeStruct((num_envs, 1), jnp.float32),   # reward
            jax.ShapeDtypeStruct((num_envs, 4), jnp.int32),     # flags
        ],
        interpret=interpret,
    )

    perm_j = jnp.asarray(perm)
    pdx_j = jnp.asarray(lid[:, :, 0].T.copy())             # [R, C]
    pdy_j = jnp.asarray(lid[:, :, 1].T.copy())
    vdx_j = jnp.asarray(vis[:, 0][None, :].copy())         # [1, V]
    vdy_j = jnp.asarray(vis[:, 1][None, :].copy())

    def step(flat: FlatEnvState, actions: jnp.ndarray):
        actions = actions.astype(jnp.int32).reshape(num_envs, 1)
        plants, visits, explored, scal, obs_k, rew, flags = pallas_step(
            flat.obstacles, flat.plants, flat.visits, flat.explored,
            flat.scal, actions, pdx_j, pdy_j, vdx_j, vdy_j)
        new_flat = FlatEnvState(
            obstacles=flat.obstacles, plants=plants, visits=visits,
            explored=explored, scal=scal, key=flat.key)
        obs = jnp.take(obs_k, perm_j, axis=1)
        return (new_flat, obs, rew[:, 0], flags[:, 0].astype(bool),
                flags[:, 1].astype(bool), flags[:, 2].astype(bool))

    return step
