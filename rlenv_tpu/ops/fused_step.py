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

* The world lives in a single bit-packed int32 grid, flattened and
  lane-padded (``L = ceil(g*g/128)*128`` = 640 lanes for the 25x25
  training grid): per cell ``entity(2b) | min(visits,10)(4b) |
  explored(1b) | raw_visits(16b)``. Obstacle/plant/explored/visit grids
  are not materialized in the hot path at all — they are reconstructed
  from this field at the pack/unpack boundary, and the kernel's big-array
  HBM traffic is exactly ONE grid read + ONE grid write per step.
* The grid is stored in ROVER-CENTRIC rotation: lane ``j`` holds the cell
  at flat index ``(rover_flat + j) mod L``. That makes every per-env
  dynamic index STATIC:
  - the 4 movement-candidate cells are lanes ``(±1) mod L`` / ``(±g) mod
    L``, the rover cell is lane 0 — plain static slices, no gathers and no
    lane-compare reductions;
  - after the move, re-alignment is a rotation by the 1-cell displacement
    actually taken: four static rotations (N/E/S/W) selected per env —
    NOT a full barrel shift over the bits of ``rover_flat``;
  - every observation probe at relative offset (dx, dy) is the static
    lane ``(dx*g + dy) mod L``; all post-move updates (visit increment,
    explored bit, watering) land on static lane 0.
* Wrapped-around lane reads are by construction out-of-bounds probes; OOB
  masking (LIDAR reads "obstacle", visit cells read 1.0 —
  `plantos_env_new.py:292-295,326-327`) therefore also covers the
  rotation's modular wrap.
* Raw (unclamped) visit counts ride in the upper 16 bits of the same
  packed cell (saturating at 2^16-1) — they are state-fidelity data
  (curriculum persistence, `trainingCode.py:80-84`), not part of the
  observation math, and are only unpacked at reset boundaries.
* The first-hit LIDAR scan folds far-to-near over the range slices so the
  nearest hit wins — no argmax gather.
* The kernel emits the observation in component-major column order; a
  static column permutation outside the kernel produces the reference's
  channel-major layout (`plantos_env_new.py:272-330`).

Two kernels share the same transition body:

* :func:`build_fused_step` — one transition per ``pallas_call`` (the
  training hot path, where each step's actions come from the policy).
* :func:`build_fused_rollout` — ``horizon`` transitions per
  ``pallas_call`` over a ``(env_blocks, horizon)`` grid whose minor
  dimension is the TIME STEP: the packed world grid rides in the
  resident output block across all ``horizon`` steps, so it crosses HBM
  once per CHUNK instead of twice per step, while per-step observations /
  rewards / flags stream out through the normal output pipeline. Envs
  that finish mid-chunk FREEZE (zero reward, latched ``done`` scalar)
  until the wrapper resets them at the chunk boundary — bit-identical to
  the per-step path whenever episodes end on chunk boundaries (always
  true when ``horizon`` divides ``max_steps`` and termination does not
  fire mid-chunk).

Exact-parity with the XLA path is asserted by ``tests/test_ops_fused.py``
(interpret mode on CPU, bit-identical obs/reward/state) and on real
hardware by ``scripts/tpu_parity_check.py``.
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
from rlenv_tpu.env.state import (ENTITY_OBSTACLE, ENTITY_PLANT_HYDRATED,
                                 ENTITY_PLANT_THIRSTY, EnvState,
                                 PLANT_HYDRATED, PLANT_THIRSTY)

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
_SC_DONE = 10        # rollout-kernel latch: env finished inside the chunk
_SC_COLS = 16

# Packed-cell field layout:
#   entity(2) | clamped visits(4) | explored(1) | raw visits(16)
# Raw (unclamped) counts saturate at 65535 — they only feed curriculum
# persistence (`trainingCode.py:80-84`), whose worst case is
# max_episodes_per_maze(50) x max_steps(1000) = 50k < 2^16. The raw bits
# are masked off before the MXU probe gather (probe consumers only read
# bits 0-5; masked cells <= 127 are exact in bf16 — the TPU MXU computes
# at bf16 input precision, so unmasked cells would lose their low bits).
_VIS_SHIFT = 2
_EXPL_SHIFT = 6
_RAW_SHIFT = 7
_ENT_MASK = 3
_VIS_MASK = 15 << _VIS_SHIFT
_RAW_MAX = (1 << 16) - 1
_RAW_MASK = _RAW_MAX << _RAW_SHIFT


def _lane_pad(n: int) -> int:
    return ((n + 127) // 128) * 128


@struct.dataclass
class FlatEnvState:
    """Kernel-layout batched env state.

    ``rolled`` is the packed world grid in rover-centric rotation:
    ``rolled[e, j]`` is the packed cell at flat index
    ``(rover_flat[e] + j) mod L`` — ONE int32 grid holds the entire world
    (entity, clamped + raw visit counts, explored bit), so the kernel's
    big-array HBM traffic is exactly one grid in and one grid out per step.
    """

    rolled: jnp.ndarray      # int32[B, L] — packed, rover at lane 0
    scal: jnp.ndarray        # int32[B, 16]
    key: jnp.ndarray         # per-env PRNG key, [B, 2] uint32


def _roll_rows(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Per-row left-rotate: out[e, j] = x[e, (j + shift[e]) % L]."""
    return jax.vmap(lambda row, s: jnp.roll(row, -s))(x, shift)


def pack_state(state: EnvState, grid_size: int) -> FlatEnvState:
    """[B, g, g] EnvState batch -> kernel layout (used at reset boundaries)."""
    g = grid_size
    B = state.rover.shape[0]
    L = _lane_pad(g * g)

    # The 16-bit raw-visit field saturates at _RAW_MAX. The kernel MCTS
    # rollout policy (ops/mcts_rollout.py) selects least-visited neighbors
    # from THESE saturating counts while the XLA mirror compares unbounded
    # int32 — selection silently diverges once any true count exceeds
    # _RAW_MAX - rollout_depth. Documented worst case (curriculum
    # persistence 50 eps x 1000 steps = 50k, `trainingCode.py:32-36`, plus
    # rollout depth <= 1000) leaves ~22% headroom; revisit this bound if
    # curriculum limits change. Checked eagerly outside jit:
    if not isinstance(state.visit_counts, jax.core.Tracer):
        _max_vis = int(jnp.max(state.visit_counts)) if B else 0
        assert _max_vis <= _RAW_MAX - 1024, (
            f"visit_counts max {_max_vis} too close to the 16-bit packed "
            f"ceiling {_RAW_MAX}; kernel least-visited selection would "
            "diverge from the unbounded XLA path")
    raw = jnp.minimum(state.visit_counts.reshape(B, g * g), _RAW_MAX
                      ).astype(jnp.int32)
    plants = state.plants.reshape(B, g * g).astype(jnp.int32)
    entity = jnp.where(state.obstacles.reshape(B, g * g),
                       ENTITY_OBSTACLE, plants + (plants > 0))
    packed = (entity
              | (jnp.minimum(raw, 10) << _VIS_SHIFT)
              | (state.explored.reshape(B, g * g).astype(jnp.int32)
                 << _EXPL_SHIFT)
              | (raw << _RAW_SHIFT))
    packed = jnp.pad(packed, ((0, 0), (0, L - g * g)))
    tidx = state.rover[:, 0] * g + state.rover[:, 1]

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
        rolled=_roll_rows(packed, tidx),
        scal=scal,
        key=state.key,
    )


def unpack_state(flat: FlatEnvState, grid_size: int) -> EnvState:
    """Kernel layout -> standard EnvState batch (rendering, debugging)."""
    g = grid_size
    B = flat.scal.shape[0]
    sc = flat.scal
    tidx = sc[:, _SC_RX] * g + sc[:, _SC_RY]
    packed = _roll_rows(flat.rolled, -tidx)[:, : g * g]
    entity = packed & _ENT_MASK
    return EnvState(
        obstacles=(entity == ENTITY_OBSTACLE).reshape(B, g, g),
        plants=jnp.where(entity >= ENTITY_PLANT_HYDRATED, entity - 1, 0)
               .astype(jnp.int8).reshape(B, g, g),
        rover=sc[:, _SC_RX:_SC_RY + 1],
        visit_counts=((packed >> _RAW_SHIFT) & _RAW_MAX).reshape(B, g, g),
        explored=((packed >> _EXPL_SHIFT) & 1).astype(bool)
                 .reshape(B, g, g),
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


def raw_visits(flat: FlatEnvState, grid_size: int) -> jnp.ndarray:
    """Raw (unclamped) visit counts in unrotated flat layout, [B, L].

    Only called at reset boundaries (curriculum persistence); the hot path
    never materializes this.
    """
    g = grid_size
    tidx = flat.scal[:, _SC_RX] * g + flat.scal[:, _SC_RY]
    return (_roll_rows(flat.rolled, -tidx) >> _RAW_SHIFT) & _RAW_MAX


def repack_visits(flat: FlatEnvState, grid_size: int,
                  visits: jnp.ndarray) -> FlatEnvState:
    """Replace both visit-count fields (raw + clamped mirror) in the grid.

    Used by the curriculum wrapper when it restores persistent visit
    counts across a maze-reuse reset (`trainingCode.py:80-84`).
    ``visits`` is unrotated flat layout, [B, L] (or [B, >= g*g]).
    """
    g = grid_size
    L = flat.rolled.shape[1]
    raw = jnp.minimum(visits[:, : g * g].astype(jnp.int32), _RAW_MAX)
    vbits = (jnp.minimum(raw, 10) << _VIS_SHIFT) | (raw << _RAW_SHIFT)
    vbits = jnp.pad(vbits, ((0, 0), (0, L - g * g)))
    tidx = flat.scal[:, _SC_RX] * g + flat.scal[:, _SC_RY]
    rolled = (flat.rolled & ~(_VIS_MASK | _RAW_MASK)) | _roll_rows(vbits, tidx)
    return flat.replace(rolled=rolled)


@functools.lru_cache(maxsize=None)
def _probe_selector(channels: int, lidar_range: int, visit_map_size: int,
                    grid_size: int, L: int):
    """Static probe geometry as a constant 0/1 gather matrix.

    With the rover on lane 0, the probe at relative offset (dx, dy) lives
    at static lane ``(dx*g + dy) mod L`` — so gathering ALL probes is one
    MXU matmul ``rolled_bf16 @ SEL`` with a CONSTANT selector. Columns are
    laid out so each consumer reads an aligned contiguous slice:
    ``[r*C, (r+1)*C)`` = LIDAR range slice r+1 (range-major for the
    first-hit fold), ``[R*C, R*C+V)`` = the visit window. Cell values are
    masked to 7 bits before the dot, so the bf16 MXU pass is exact.
    """
    lid = lidar_offsets(channels, lidar_range)          # [C, R, 2]
    vis = visit_map_offsets(visit_map_size)             # [V, 2]
    g = grid_size
    V = visit_map_size ** 2
    n_cols = lidar_range * channels + V
    PCOL = _lane_pad(n_cols)
    sel = np.zeros((L, PCOL), dtype=np.float32)
    for r in range(lidar_range):
        for c in range(channels):
            lane = (int(lid[c, r, 0]) * g + int(lid[c, r, 1])) % L
            sel[lane, r * channels + c] = 1.0
    for i, (dx, dy) in enumerate(vis):
        sel[(int(dx) * g + int(dy)) % L, lidar_range * channels + i] = 1.0
    return lid, vis, sel


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


def _make_transition(config: EnvConfig, Bb: int):
    """Shared per-step transition body operating on kernel-resident values.

    Returns ``transition(rolled, sc, a, pdx, pdy, vdx, vdy, sel) ->
    (new_rolled, new_sc, obs, reward, terminated, truncated, is_watering)``
    with ``rolled`` int32[Bb, L] (rover-centric), ``sc`` int32[Bb, 16],
    ``a`` int32[Bb, 1]; obs is [Bb, OBS_PAD] in kernel column order,
    reward/terminated/truncated/is_watering are [Bb, 1].
    """
    g = config.grid_size
    C = config.lidar_channels
    Rr = config.lidar_range
    V = config.visit_map_size ** 2
    L = _lane_pad(g * g)
    R = config.rewards
    max_steps = config.max_steps
    OBS_PAD = _lane_pad(config.obs_dim)

    def transition(rolled, sc, a, pdx_all, pdy_all, vdx, vdy, sel):
        def rot(x, d):
            """Static left-rotate by d cells: out[j] = x[(j + d) % L]."""
            d %= L
            if d == 0:
                return x
            return jnp.concatenate([x[:, d:], x[:, :d]], axis=1)

        def lane_col(x, l):
            l = int(l) % L
            return x[:, l:l + 1]

        rx = sc[:, _SC_RX:_SC_RX + 1]
        ry = sc[:, _SC_RY:_SC_RY + 1]
        is_move = a < 4

        # --- movement (`plantos_env_new.py:197-234`) ---
        # Candidate cells are static lanes of the rover-centric grid.
        dx = jnp.where(a == 0, -1, 0) + jnp.where(a == 2, 1, 0)
        dy = jnp.where(a == 1, 1, 0) + jnp.where(a == 3, -1, 0)
        npx, npy = rx + dx, ry + dy
        in_bounds = (npx >= 0) & (npx < g) & (npy >= 0) & (npy < g)
        c0 = lane_col(rolled, 0)
        cand = jnp.where(
            a == 0, lane_col(rolled, -g),
            jnp.where(a == 1, lane_col(rolled, 1),
                      jnp.where(a == 2, lane_col(rolled, g),
                                jnp.where(a == 3, lane_col(rolled, -1),
                                          c0))))
        blocked = (cand & _ENT_MASK) == ENTITY_OBSTACLE
        valid = is_move & in_bounds & ~blocked
        invalid_move = is_move & ~valid
        tx = jnp.where(valid, npx, rx)
        ty = jnp.where(valid, npy, ry)
        tcell = jnp.where(valid, cand, c0)    # target cell, pre-update
        vclamp_t = (tcell >> _VIS_SHIFT) & 15
        never_visited = vclamp_t == 0
        expl_at_t = ((tcell >> _EXPL_SHIFT) & 1) > 0
        newly_explored = valid & ~expl_at_t

        # --- watering (`plantos_env_new.py:236-245`): rover cell = lane 0 ---
        ent_r = c0 & _ENT_MASK
        water_reward = jnp.where(
            ent_r == ENTITY_PLANT_THIRSTY, R.goal,
            jnp.where(ent_r == ENTITY_PLANT_HYDRATED, R.mistake,
                      R.water_empty))
        do_water = ~is_move & (ent_r == ENTITY_PLANT_THIRSTY)

        # --- re-align to the new rover frame: rotate by the 1-cell
        # displacement actually taken (at most one of dx/dy is nonzero) ---
        mdx = tx - rx
        mdy = ty - ry
        r1 = jnp.where(mdx == -1, rot(rolled, -g),
                       jnp.where(mdx == 1, rot(rolled, g), rolled))
        r2 = jnp.where(mdy == -1, rot(r1, -1),
                       jnp.where(mdy == 1, rot(r1, 1), r1))

        # --- all updates land on static lane 0 (the new rover cell):
        # saturating visit increments (clamped mirror at 10, raw at 2^16-1),
        # explored bit, watering 3 -> 2. Field arithmetic never carries:
        # both counters saturate below their field width and the watering
        # decrement only fires when the entity field is 3.
        raw_t = (tcell >> _RAW_SHIFT) & _RAW_MAX
        inc = (jnp.where(valid & (vclamp_t < 10),
                         jnp.int32(1 << _VIS_SHIFT), 0)
               + jnp.where(valid & (raw_t < _RAW_MAX),
                           jnp.int32(1 << _RAW_SHIFT), 0))
        dec = jnp.where(do_water, jnp.int32(1), 0)
        col0 = (tcell + inc - dec) | (1 << _EXPL_SHIFT)
        new_rolled = jnp.concatenate([col0, r2[:, 1:]], axis=1)

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

        # --- observation on the POST-step state: all 121 probes are static
        # lanes of the re-aligned grid, gathered by ONE MXU matmul with the
        # constant 0/1 selector. The raw-visit bits (7+) are masked off
        # BEFORE the dot: probe consumers only read bits 0-5, and the TPU
        # MXU computes f32 dots at bf16 input precision (8-bit significand)
        # — full packed cells (up to 2^23) would corrupt the low bits on
        # real hardware (interpret mode, being true f32, would not catch
        # it). Masked cells are <= 127, exact in bf16, so the dot runs
        # natively at bf16 MXU rate with an f32 accumulator.
        probes = jnp.dot((new_rolled & 0x7F).astype(jnp.bfloat16),
                         sel.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        probes = probes.astype(jnp.int32)                  # [Bb, PCOL]

        # First-hit fold, far -> near (`plantos_env_new.py:282-305`).
        dist = jnp.full((Bb, C), Rr, jnp.int32)
        etype = jnp.zeros((Bb, C), jnp.int32)
        for r in range(Rr - 1, -1, -1):
            pdx = pdx_all[r:r + 1, :]                      # [1, C]
            pdy = pdy_all[r:r + 1, :]
            px, py = tx + pdx, ty + pdy
            oob = (px < 0) | (px >= g) | (py < 0) | (py >= g)
            ev = probes[:, r * C:(r + 1) * C] & _ENT_MASK  # [Bb, C]
            val = jnp.where(oob, ENTITY_OBSTACLE, ev)
            hit = val > 0
            dist = jnp.where(hit, r + 1, dist)
            etype = jnp.where(hit, val, etype)

        # Visit window (`plantos_env_new.py:317-328`): OOB reads 1.0.
        vx, vy = tx + vdx, ty + vdy                        # [Bb, V]
        v_oob = (vx < 0) | (vx >= g) | (vy < 0) | (vy >= g)
        vcounts = (probes[:, Rr * C:Rr * C + V] >> _VIS_SHIFT) & 15
        visit_map = jnp.where(v_oob, 1.0, vcounts.astype(jnp.float32) / 10.0)

        obs = jnp.concatenate([
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

        zeros = jnp.zeros_like(tx)
        new_sc = jnp.concatenate([
            tx, ty, step_count, explored_count, free_cells,
            sc[:, _SC_THIRSTY:_SC_THIRSTY + 1] - do_water.astype(jnp.int32),
            sc[:, _SC_TOTAL_PLANTS:_SC_TOTAL_PLANTS + 1],
            (bonus_given | fully).astype(jnp.int32),
            ((sc[:, _SC_COLLIDED:_SC_COLLIDED + 1] > 0) | invalid_move
             ).astype(jnp.int32),
            sc[:, _SC_COLLISIONS:_SC_COLLISIONS + 1]
            + invalid_move.astype(jnp.int32),
        ] + [zeros] * (_SC_COLS - 10), axis=1)

        return (new_rolled, new_sc, obs, reward.astype(jnp.float32),
                terminated, truncated, ~is_move)

    return transition


def _obs_rows_t(grid, tx, ty, pdx_all, pdy_all, vdx, vdy, sel,
                g: int, C: int, Rr: int, V: int, OBS_PAD: int):
    """Transposed-layout observation assembly from a rover-centric grid.

    ``grid`` int32[L, Bb] with the rover at sublane 0 and ``tx``/``ty``
    int32[1, Bb] its absolute position. Shared by the rollout/actor
    kernels' post-step observation and the guided-MCTS kernel's
    PRE-step observation (same math either way — the observation is a
    pure function of (grid, position)). Returns float32[OBS_PAD, Bb] in
    the kernel's component-major column order (see
    :func:`_obs_permutation`)."""
    Bb = grid.shape[1]
    # One MXU matmul gathers every probe; raw-visit bits masked off so
    # the bf16 pass is exact (cells <= 127).
    probes = jnp.dot(sel.astype(jnp.bfloat16),
                     (grid & 0x7F).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    probes = probes.astype(jnp.int32)                  # [PCOL, Bb]

    # First-hit fold, far -> near (`plantos_env_new.py:282-305`).
    dist = jnp.full((C, Bb), Rr, jnp.int32)
    etype = jnp.zeros((C, Bb), jnp.int32)
    for r in range(Rr - 1, -1, -1):
        pdx = pdx_all[:, r:r + 1]                      # [C, 1]
        pdy = pdy_all[:, r:r + 1]
        px, py = tx + pdx, ty + pdy                    # [C, Bb]
        oob = (px < 0) | (px >= g) | (py < 0) | (py >= g)
        ev = probes[r * C:(r + 1) * C, :] & _ENT_MASK  # [C, Bb]
        val = jnp.where(oob, ENTITY_OBSTACLE, ev)
        hit = val > 0
        dist = jnp.where(hit, r + 1, dist)
        etype = jnp.where(hit, val, etype)

    # Visit window (`plantos_env_new.py:317-328`): OOB reads 1.0.
    vx, vy = tx + vdx, ty + vdy                        # [V, Bb]
    v_oob = (vx < 0) | (vx >= g) | (vy < 0) | (vy >= g)
    vcounts = (probes[Rr * C:Rr * C + V, :] >> _VIS_SHIFT) & 15
    visit_map = jnp.where(v_oob, 1.0, vcounts.astype(jnp.float32) / 10.0)

    return jnp.concatenate([
        dist.astype(jnp.float32) / Rr,                 # [C, Bb]
        (etype == 0).astype(jnp.float32),
        (etype == 1).astype(jnp.float32),
        (etype == 2).astype(jnp.float32),
        (etype == 3).astype(jnp.float32),
        tx.astype(jnp.float32) / g,
        ty.astype(jnp.float32) / g,
        visit_map,
        jnp.zeros((OBS_PAD - (5 * C + 2 + V), Bb), jnp.float32),
    ], axis=0)                                         # [OBS_PAD, Bb]


def _mlp_greedy_rows(x, ws, bs, act_fn, n_act: int):
    """Greedy action from a transposed-layout MLP forward.

    ``x`` float-ish [OBS_PAD, Bb] kernel-layout observation; ``ws``/``bs``
    from ``rlenv_tpu.ops.actor_rollout.pack_mlp_policy`` (trunk + padded
    action head). Computes ``act(W @ x + b)`` per layer (f32 accumulate),
    masks pad rows to -inf, and returns ``(logits [A_PAD, Bb], action
    [1, Bb] int32)`` with FIRST-max tie-breaking (== ``jnp.argmax``).

    THE single definition of this forward: the actor kernel, the guided
    MCTS kernel, the XLA parity mirror and the test oracles all call it,
    so the bit-parity guarantees cannot drift between copies.
    """
    for i in range(len(ws) - 1):
        x = act_fn(jnp.dot(ws[i], x, preferred_element_type=jnp.float32)
                   + bs[i]).astype(x.dtype)
    logits = (jnp.dot(ws[-1], x, preferred_element_type=jnp.float32)
              + bs[-1])
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    logits = jnp.where(row < n_act, logits, -jnp.inf)
    top = jnp.max(logits, axis=0, keepdims=True)
    action = jnp.min(jnp.where(logits == top, row, logits.shape[0]),
                     axis=0, keepdims=True).astype(jnp.int32)
    return logits, action


def _make_transition_t(config: EnvConfig, Bb: int):
    """Transposed-layout transition for the chunked rollout kernel.

    Same math as :func:`_make_transition`, but with ENVS ON THE LANE
    DIMENSION: ``rolled`` int32[L, Bb] (grid cells on sublanes), ``sc``
    int32[_SC_COLS, Bb], ``a`` int32[1, Bb]. Why: in the [Bb, L] layout
    every per-env scalar op works on a [Bb, 1] column — 1/128 lane
    utilization, and the transition does ~40 of them per step, which
    ablates to a third of the whole kernel's time. Transposed, those same
    ops are [1, Bb] lane-vectors (2 vregs each); the full-grid rotation /
    select passes cost the same in either layout (sublane shifts instead
    of lane shifts), and the probe gather becomes ``sel_T @ grid``
    (contraction over sublanes), still one MXU matmul.

    Constants come transposed too: ``pdx/pdy`` [C, R], ``vdx/vdy``
    [V, 1], ``sel`` [PCOL, L]. Returns obs [OBS_PAD, Bb] and per-env
    outputs [1, Bb].
    """
    g = config.grid_size
    C = config.lidar_channels
    Rr = config.lidar_range
    V = config.visit_map_size ** 2
    L = _lane_pad(g * g)
    R = config.rewards
    max_steps = config.max_steps
    OBS_PAD = _lane_pad(config.obs_dim)

    def transition(rolled, sc, a, pdx_all, pdy_all, vdx, vdy, sel):
        def rot(x, d):
            """Static up-rotate by d cells: out[j] = x[(j + d) % L]."""
            d %= L
            if d == 0:
                return x
            return jnp.concatenate([x[d:], x[:d]], axis=0)

        def cell_row(x, l):
            l = int(l) % L
            return x[l:l + 1, :]

        rx = sc[_SC_RX:_SC_RX + 1, :]
        ry = sc[_SC_RY:_SC_RY + 1, :]
        is_move = a < 4

        # --- movement (`plantos_env_new.py:197-234`) ---
        dx = jnp.where(a == 0, -1, 0) + jnp.where(a == 2, 1, 0)
        dy = jnp.where(a == 1, 1, 0) + jnp.where(a == 3, -1, 0)
        npx, npy = rx + dx, ry + dy
        in_bounds = (npx >= 0) & (npx < g) & (npy >= 0) & (npy < g)
        c0 = cell_row(rolled, 0)
        cand = jnp.where(
            a == 0, cell_row(rolled, -g),
            jnp.where(a == 1, cell_row(rolled, 1),
                      jnp.where(a == 2, cell_row(rolled, g),
                                jnp.where(a == 3, cell_row(rolled, -1),
                                          c0))))
        blocked = (cand & _ENT_MASK) == ENTITY_OBSTACLE
        valid = is_move & in_bounds & ~blocked
        invalid_move = is_move & ~valid
        tx = jnp.where(valid, npx, rx)
        ty = jnp.where(valid, npy, ry)
        tcell = jnp.where(valid, cand, c0)    # target cell, pre-update
        vclamp_t = (tcell >> _VIS_SHIFT) & 15
        never_visited = vclamp_t == 0
        expl_at_t = ((tcell >> _EXPL_SHIFT) & 1) > 0
        newly_explored = valid & ~expl_at_t

        # --- watering (`plantos_env_new.py:236-245`) ---
        ent_r = c0 & _ENT_MASK
        water_reward = jnp.where(
            ent_r == ENTITY_PLANT_THIRSTY, R.goal,
            jnp.where(ent_r == ENTITY_PLANT_HYDRATED, R.mistake,
                      R.water_empty))
        do_water = ~is_move & (ent_r == ENTITY_PLANT_THIRSTY)

        # --- re-align to the new rover frame ---
        # Moves are single-axis, so the combined shift is one of
        # {0, +-1, +-g}: a single 4-way select over pre-shifted copies of
        # the ORIGINAL grid (instead of chaining an x-select into a
        # y-select, which serializes two full-grid select passes).
        mdx = tx - rx
        mdy = ty - ry
        d = mdx * g + mdy                               # [1, Bb]
        r2 = jnp.where(d == -g, rot(rolled, -g),
                       jnp.where(d == g, rot(rolled, g),
                                 jnp.where(d == -1, rot(rolled, -1),
                                           jnp.where(d == 1, rot(rolled, 1),
                                                     rolled))))

        # --- lane-0 (now row-0) updates, as in _make_transition ---
        raw_t = (tcell >> _RAW_SHIFT) & _RAW_MAX
        inc = (jnp.where(valid & (vclamp_t < 10),
                         jnp.int32(1 << _VIS_SHIFT), 0)
               + jnp.where(valid & (raw_t < _RAW_MAX),
                           jnp.int32(1 << _RAW_SHIFT), 0))
        dec = jnp.where(do_water, jnp.int32(1), 0)
        col0 = (tcell + inc - dec) | (1 << _EXPL_SHIFT)
        new_rolled = jnp.concatenate([col0, r2[1:, :]], axis=0)

        # --- reward & termination (`plantos_env_new.py:162-195`) ---
        move_reward = jnp.where(
            valid,
            jnp.where(never_visited, R.exploration, R.revisit),
            R.invalid)
        explored_count = (sc[_SC_EXPLORED:_SC_EXPLORED + 1, :]
                          + newly_explored.astype(jnp.int32))
        free_cells = sc[_SC_FREE:_SC_FREE + 1, :]
        fully = explored_count >= free_cells
        bonus_given = sc[_SC_BONUS:_SC_BONUS + 1, :] > 0
        give_bonus = fully & ~bonus_given
        reward = (jnp.float32(R.step)
                  + jnp.where(is_move, move_reward, water_reward)
                  + jnp.where(give_bonus, R.complete_exploration, 0.0))
        step_count = sc[_SC_STEP:_SC_STEP + 1, :] + 1
        terminated = fully
        truncated = step_count >= max_steps

        # --- observation: one MXU probe matmul + first-hit fold + visit
        # window, shared with the guided-MCTS kernel (_obs_rows_t) ---
        obs = _obs_rows_t(new_rolled, tx, ty, pdx_all, pdy_all, vdx, vdy,
                          sel, g, C, Rr, V, OBS_PAD)

        zeros = jnp.zeros_like(tx)
        new_sc = jnp.concatenate([
            tx, ty, step_count, explored_count, free_cells,
            sc[_SC_THIRSTY:_SC_THIRSTY + 1, :] - do_water.astype(jnp.int32),
            sc[_SC_TOTAL_PLANTS:_SC_TOTAL_PLANTS + 1, :],
            (bonus_given | fully).astype(jnp.int32),
            ((sc[_SC_COLLIDED:_SC_COLLIDED + 1, :] > 0) | invalid_move
             ).astype(jnp.int32),
            sc[_SC_COLLISIONS:_SC_COLLISIONS + 1, :]
            + invalid_move.astype(jnp.int32),
        ] + [zeros] * (_SC_COLS - 10), axis=0)

        return (new_rolled, new_sc, obs, reward.astype(jnp.float32),
                terminated, truncated, ~is_move)

    return transition


def _block_envs_for(num_envs: int, block_envs: int) -> int:
    while num_envs % block_envs != 0 or block_envs > num_envs:
        block_envs //= 2
    if block_envs < 1:
        raise ValueError(f"num_envs={num_envs} not blockable")
    return block_envs


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

    Bb = _block_envs_for(num_envs, block_envs)
    n_blocks = num_envs // Bb

    lid, vis, sel_np = _probe_selector(C, Rr, config.visit_map_size, g, L)
    PCOL = sel_np.shape[1]
    perm = _obs_permutation(config)
    OBS_PAD = _lane_pad(config.obs_dim)
    transition = _make_transition(config, Bb)

    def kernel(rolled_ref, scal_ref, action_ref,
               pdx_ref, pdy_ref, vdx_ref, vdy_ref, sel_ref,
               rolled_out, scal_out,
               obs_out, rew_out, flags_out):
        new_rolled, new_sc, obs, reward, term, trunc, is_water = transition(
            rolled_ref[:], scal_ref[:], action_ref[:],
            pdx_ref[:], pdy_ref[:], vdx_ref[:], vdy_ref[:], sel_ref[:])
        rolled_out[:] = new_rolled
        scal_out[:] = new_sc
        obs_out[:] = obs
        rew_out[:] = reward
        flags_out[:] = jnp.concatenate([
            term.astype(jnp.int32), trunc.astype(jnp.int32),
            is_water.astype(jnp.int32),
            jnp.zeros((Bb, 1), jnp.int32)], axis=1)

    def spec(cols):
        return pl.BlockSpec((Bb, cols), lambda i: (i, 0))

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0))

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
        in_specs=[spec(L), spec(_SC_COLS),
                  spec(1), const_spec(Rr, C), const_spec(Rr, C),
                  const_spec(1, V), const_spec(1, V),
                  const_spec(L, PCOL)],
        out_specs=[spec(L), spec(_SC_COLS),
                   spec(OBS_PAD), spec(1), spec(4)],
        out_shape=[
            jax.ShapeDtypeStruct((num_envs, L), jnp.int32),     # rolled
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
    sel_j = jnp.asarray(sel_np)                            # [L, PCOL]

    def step(flat: FlatEnvState, actions: jnp.ndarray):
        actions = actions.astype(jnp.int32).reshape(num_envs, 1)
        rolled, scal, obs_k, rew, flags = pallas_step(
            flat.rolled, flat.scal, actions,
            pdx_j, pdy_j, vdx_j, vdy_j, sel_j)
        new_flat = FlatEnvState(rolled=rolled, scal=scal, key=flat.key)
        obs = jnp.take(obs_k, perm_j, axis=1)
        return (new_flat, obs, rew[:, 0], flags[:, 0].astype(bool),
                flags[:, 1].astype(bool), flags[:, 2].astype(bool))

    return step


def build_fused_rollout(config: EnvConfig, num_envs: int, horizon: int,
                        block_envs: int = 256, interpret: bool = False):
    """``horizon`` fused env transitions per Pallas program.

    Returns ``rollout(flat, actions) -> (flat', obs, reward, terminated,
    truncated, is_watering)`` where ``actions`` is int32[horizon, B] and
    the outputs are time-major: obs [horizon, B, obs_dim] (channel-major
    reference layout), the rest [horizon, B].

    Grid is ``(env_blocks, horizon)`` — horizon is the MINOR dimension, so
    grid steps over time run back-to-back on the same resident env block:
    the packed world grid and scalars live in the (revisited) output
    blocks for all ``horizon`` steps and cross HBM once per chunk, while
    per-step obs/reward/flags stream through the output pipeline and the
    per-step action rows through the input pipeline.

    The kernel computes in the TRANSPOSED layout (envs on lanes, grid
    cells on sublanes — see :func:`_make_transition_t` for why); the
    [B, L] <-> [L, B] transposes happen in XLA at the chunk boundary
    (~50 us per 21 MB chunk, amortized over ``horizon`` steps).

    Mid-chunk ``done`` envs FREEZE: state stops changing, rewards are 0,
    flags are 0, obs is 0, and scal column ``_SC_DONE`` latches so the
    caller can reset them at the chunk boundary. Whenever dones only occur
    on the final step of a chunk (guaranteed for truncation when
    ``horizon`` divides ``max_steps``), the trajectory is bit-identical to
    iterating :func:`build_fused_step`.
    """
    from jax.experimental import pallas as pl

    g = config.grid_size
    C = config.lidar_channels
    Rr = config.lidar_range
    V = config.visit_map_size ** 2
    L = _lane_pad(g * g)
    K = int(horizon)

    Bb = _block_envs_for(num_envs, block_envs)
    n_blocks = num_envs // Bb

    lid, vis, sel_np = _probe_selector(C, Rr, config.visit_map_size, g, L)
    PCOL = sel_np.shape[1]
    perm = _obs_permutation(config)
    OBS_PAD = _lane_pad(config.obs_dim)
    transition = _make_transition_t(config, Bb)

    def kernel(rolled_ref, scal_ref, action_ref,
               pdx_ref, pdy_ref, vdx_ref, vdy_ref, sel_ref,
               rolled_out, scal_out,
               obs_out, rew_out, flags_out):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _load():
            rolled_out[:] = rolled_ref[:]
            scal_out[:] = scal_ref[:]

        rolled = rolled_out[:]                             # [L, Bb]
        sc = scal_out[:]                                   # [SC, Bb]
        a = action_ref[0]                                  # [1, Bb]

        new_rolled, new_sc, obs, reward, term, trunc, is_water = transition(
            rolled, sc, a,
            pdx_ref[:], pdy_ref[:], vdx_ref[:], vdy_ref[:], sel_ref[:])

        # Freeze envs whose episode already ended inside this chunk.
        done_prev = sc[_SC_DONE:_SC_DONE + 1, :] > 0       # [1, Bb]
        new_rolled = jnp.where(done_prev, rolled, new_rolled)
        new_sc = jnp.where(done_prev, sc, new_sc)
        reward = jnp.where(done_prev, 0.0, reward)
        term = term & ~done_prev
        trunc = trunc & ~done_prev
        is_water = is_water & ~done_prev
        obs = jnp.where(done_prev, 0.0, obs)
        done_now = (done_prev | term | trunc).astype(jnp.int32)
        new_sc = jnp.concatenate([
            new_sc[:_SC_DONE, :], done_now,
            new_sc[_SC_DONE + 1:, :]], axis=0)

        rolled_out[:] = new_rolled
        scal_out[:] = new_sc
        obs_out[:] = obs[None]
        rew_out[:] = reward[None]
        flags_out[:] = jnp.concatenate([
            term.astype(jnp.int32), trunc.astype(jnp.int32),
            is_water.astype(jnp.int32),
            jnp.zeros((1, Bb), jnp.int32)], axis=0)[None]

    def state_spec(rows):
        return pl.BlockSpec((rows, Bb), lambda i, k: (0, i))

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, k: (0, 0))

    def time_spec(rows):
        return pl.BlockSpec((1, rows, Bb), lambda i, k: (k, 0, i))

    if interpret:
        compiler_params = None
    else:
        from jax.experimental.pallas import tpu as pltpu
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)

    pallas_rollout = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid=(n_blocks, K),
        in_specs=[state_spec(L), state_spec(_SC_COLS),
                  # step k's actions, streamed per grid step (Mosaic
                  # cannot dynamically slice a time dimension held
                  # resident, so the actions ride the input pipeline)
                  time_spec(1),
                  const_spec(C, Rr), const_spec(C, Rr),
                  const_spec(V, 1), const_spec(V, 1),
                  const_spec(PCOL, L)],
        out_specs=[state_spec(L), state_spec(_SC_COLS),
                   time_spec(OBS_PAD), time_spec(1), time_spec(4)],
        out_shape=[
            jax.ShapeDtypeStruct((L, num_envs), jnp.int32),     # rolled
            jax.ShapeDtypeStruct((_SC_COLS, num_envs), jnp.int32),
            jax.ShapeDtypeStruct((K, OBS_PAD, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((K, 1, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((K, 4, num_envs), jnp.int32),  # flags
        ],
        interpret=interpret,
    )

    perm_j = jnp.asarray(perm)
    pdx_j = jnp.asarray(lid[:, :, 0].copy())               # [C, R]
    pdy_j = jnp.asarray(lid[:, :, 1].copy())
    vdx_j = jnp.asarray(vis[:, 0][:, None].copy())         # [V, 1]
    vdy_j = jnp.asarray(vis[:, 1][:, None].copy())
    sel_j = jnp.asarray(sel_np.T.copy())                   # [PCOL, L]

    def rollout(flat: FlatEnvState, actions: jnp.ndarray):
        actions = actions.astype(jnp.int32).reshape(K, 1, num_envs)
        rolled, scal, obs_k, rew, flags = pallas_rollout(
            flat.rolled.T, flat.scal.T, actions,
            pdx_j, pdy_j, vdx_j, vdy_j, sel_j)
        new_flat = FlatEnvState(rolled=rolled.T, scal=scal.T, key=flat.key)
        obs = jnp.take(obs_k, perm_j, axis=1).transpose(0, 2, 1)
        return (new_flat, obs, rew[:, 0, :], flags[:, 0, :].astype(bool),
                flags[:, 1, :].astype(bool), flags[:, 2, :].astype(bool))

    return rollout


def chunk_done(flat: FlatEnvState) -> jnp.ndarray:
    """Per-env latched-done flags after a :func:`build_fused_rollout` chunk."""
    return flat.scal[:, _SC_DONE] > 0
