"""Fused MCTS rollout phase as a single Pallas TPU kernel.

The reference planner's rollout is the hottest code in its repo: up to
``max_depth`` serial Python ``env.step`` calls per simulation, with the
rollout action chosen by a 70% least-visited-neighbor / 30% uniform policy
(`/root/reference/mcts_custom_trainer.py:139-216`). The batched XLA search
(:mod:`rlenv_tpu.algos.mcts`) already turns that into a device
``while_loop`` — but each loop iteration still costs ~30-70 us of
per-iteration overhead for a tiny 25x25-grid batch, and the rollout phase
ablates to ~90% of the whole search.

This kernel runs the ENTIRE rollout — up to ``max_depth`` transitions,
with the rollout policy evaluated INSIDE the kernel — as one Pallas
program over a ``(env_blocks, depth)`` grid. It reuses the packed
rover-centric world layout of :mod:`rlenv_tpu.ops.fused_step` (one int32
grid, every dynamic index a static sublane) in the transposed
envs-on-lanes orientation, but strips everything rollouts don't need:
no LIDAR/visit-map observation (no MXU probe matmul), no per-step output
streaming — the only streamed input is 3 random int32 rows per step and
the only outputs are the resident state blocks plus one accumulated
return row.

Randomness is STREAMED, not generated in-kernel: the caller draws
``[depth, 3, B]`` int32 bits with ``jax.random`` and both this kernel and
the XLA mirror (:func:`rollout_returns_xla`) consume them with identical
integer arithmetic, so the two paths are bit-identical (asserted by
``tests/test_mcts_fused.py`` in interpret mode). Per step and env the
three rows are: mode bits (heuristic vs uniform — compare against
``heuristic_prob * 2^31`` on the sign-masked value), uniform action bits,
and fallback action bits (``(bits & 0x7fffffff) % 5``; the modulo bias at
2^31/5 is ~1e-9 and applies identically to both paths).

Rollout semantics replicated from the reference
(`mcts_custom_trainer.py:139-216` via `rlenv_tpu.algos.mcts`):

* policy: with prob 0.7 move to the valid neighbor (N/E/S/W order) with
  the LOWEST raw visit count (ties -> lowest action index, matching
  ``jnp.argmin``); if no neighbor is valid, a uniform action in [0, 5);
  with prob 0.3 a uniform action in [0, 5).
* rewards accumulate from the leaf's depth ``d0`` until ``max_depth`` or
  episode end; +``completion_bonus`` (500) when the episode ends with
  exploration at 100% (`:162-164`).
* envs freeze after done (latched) — identical to the while_loop exit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env.state import (ENTITY_OBSTACLE, ENTITY_PLANT_HYDRATED,
                                 ENTITY_PLANT_THIRSTY, EnvState)
from rlenv_tpu.ops.fused_step import (_ENT_MASK, _EXPL_SHIFT, _RAW_MASK,
                                      _RAW_MAX, _RAW_SHIFT, _SC_BONUS,
                                      _SC_COLS, _SC_DONE, _SC_EXPLORED,
                                      _SC_FREE, _SC_RX, _SC_RY, _SC_STEP,
                                      _VIS_SHIFT, FlatEnvState,
                                      _block_envs_for, _lane_pad)

# Spare scal column used as the rollout's depth counter (cols 0-10 are
# owned by fused_step; 11-15 are padding there).
_SC_ROLLD = 11

# Plain int (not a jnp array): jnp arrays at module scope would be captured
# as closure constants by the Pallas kernel, which pallas_call rejects.
_INT32_MAX = 2**31 - 1


def _policy_rows(rolled, sc, r0, r1, r2, g, heuristic_prob):
    """Rollout action per env, transposed layout ([rows, B] operands).

    ``rolled`` int32[L, B] rover-centric packed grid, ``sc``
    int32[_SC_COLS, B], ``r0/r1/r2`` int32[1, B] streamed random rows.
    Mirrors ``MCTSPlanner._rollout_action`` (70% least-visited valid
    neighbor / 30% uniform, `mcts_custom_trainer.py:168-216`).
    """
    L = rolled.shape[0]
    rx = sc[_SC_RX:_SC_RX + 1, :]
    ry = sc[_SC_RY:_SC_RY + 1, :]

    def cell_row(l):
        return rolled[int(l) % L:int(l) % L + 1, :]

    # Neighbors in action order N/E/S/W = lanes -g, +1, +g, -1.
    cells = [cell_row(-g), cell_row(1), cell_row(g), cell_row(-1)]
    in_b = [rx - 1 >= 0, ry + 1 < g, rx + 1 < g, ry - 1 >= 0]
    best_v = None
    best_i = None
    any_valid = None
    for i in range(4):
        valid = in_b[i] & ((cells[i] & _ENT_MASK) != ENTITY_OBSTACLE)
        vis = jnp.where(valid, (cells[i] >> _RAW_SHIFT) & _RAW_MAX,
                        _INT32_MAX)
        if best_v is None:
            best_v, best_i, any_valid = vis, jnp.zeros_like(vis), valid
        else:
            take = vis < best_v       # strict: ties keep the lowest index
            best_v = jnp.where(take, vis, best_v)
            best_i = jnp.where(take, jnp.int32(i), best_i)
            any_valid = any_valid | valid

    fallback = (r2 & 0x7FFFFFFF) % 5
    heur = jnp.where(any_valid, best_i, fallback)
    rand = (r1 & 0x7FFFFFFF) % 5
    thresh = jnp.int32(int(heuristic_prob * (2**31 - 1)))
    use_heur = (r0 & 0x7FFFFFFF) < thresh
    return jnp.where(use_heur, heur, rand).astype(jnp.int32)


def _make_rollout_transition_t(config: EnvConfig):
    """Observation-free transposed transition: same movement / watering /
    reward / termination math as ``fused_step._make_transition_t``
    (`plantos_env_new.py:162-245`), minus the probe matmul and obs
    assembly that rollouts never consume."""
    g = config.grid_size
    L = _lane_pad(g * g)
    R = config.rewards
    max_steps = config.max_steps

    def transition(rolled, sc, a):
        def rot(x, d):
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
        tx = jnp.where(valid, npx, rx)
        ty = jnp.where(valid, npy, ry)
        tcell = jnp.where(valid, cand, c0)
        vclamp_t = (tcell >> _VIS_SHIFT) & 15
        never_visited = vclamp_t == 0
        expl_at_t = ((tcell >> _EXPL_SHIFT) & 1) > 0
        newly_explored = valid & ~expl_at_t

        ent_r = c0 & _ENT_MASK
        water_reward = jnp.where(
            ent_r == ENTITY_PLANT_THIRSTY, R.goal,
            jnp.where(ent_r == ENTITY_PLANT_HYDRATED, R.mistake,
                      R.water_empty))
        do_water = ~is_move & (ent_r == ENTITY_PLANT_THIRSTY)

        # Single-axis moves: one 4-way select over pre-shifted copies of
        # the original grid (see fused_step._make_transition_t).
        mdx = tx - rx
        mdy = ty - ry
        d = mdx * g + mdy
        r2_ = jnp.where(d == -g, rot(rolled, -g),
                        jnp.where(d == g, rot(rolled, g),
                                  jnp.where(d == -1, rot(rolled, -1),
                                            jnp.where(d == 1, rot(rolled, 1),
                                                      rolled))))

        raw_t = (tcell >> _RAW_SHIFT) & _RAW_MAX
        inc = (jnp.where(valid & (vclamp_t < 10),
                         jnp.int32(1 << _VIS_SHIFT), 0)
               + jnp.where(valid & (raw_t < _RAW_MAX),
                           jnp.int32(1 << _RAW_SHIFT), 0))
        dec = jnp.where(do_water, jnp.int32(1), 0)
        col0 = (tcell + inc - dec) | (1 << _EXPL_SHIFT)
        new_rolled = jnp.concatenate([col0, r2_[1:, :]], axis=0)

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

        # Rebuild scal rows 0-9; rows 10+ (done latch, rollout depth,
        # padding) are managed by the caller. Collision tracking is kept
        # for state fidelity with the step kernel even though rollouts
        # never read it back.
        new_sc = jnp.concatenate([
            tx, ty, step_count, explored_count, free_cells,
            sc[5:6, :] - do_water.astype(jnp.int32),    # thirsty
            sc[6:7, :],                                  # total plants
            (bonus_given | fully).astype(jnp.int32),     # bonus given
            sc[8:9, :], sc[9:10, :],                     # collisions: frozen
            sc[10:, :],
        ], axis=0)
        return new_rolled, new_sc, reward.astype(jnp.float32), terminated, \
            truncated

    return transition


def build_mcts_rollout(config: EnvConfig, num_envs: int, max_depth: int,
                       heuristic_prob: float = 0.7,
                       completion_bonus: float = 500.0,
                       block_envs: int = 256, interpret: bool = False,
                       guided_layers: int = 0, guided_prob: float = 0.0,
                       guided_activation: str = "relu",
                       emit_leaf_obs: bool = False):
    """Returns ``rollout(flat, d0, rand_bits) -> returns`` running the whole
    MCTS rollout phase as one Pallas program.

    * ``flat`` — :class:`FlatEnvState` batch (B-major, as from
      ``pack_state``); its ``_SC_DONE``/``_SC_ROLLD`` columns are
      initialized here (done cleared, depth set to ``d0``).
    * ``d0`` — int32[B] starting depth per env (the selection+tree depth;
      the rollout runs ``max_depth - d0`` steps, `mcts_custom_trainer.py:
      139-166`).
    * ``rand_bits`` — int32[max_depth, 3, B] streamed randomness (see
      module docstring); [max_depth, 4, B] when guided (row 3 = the
      policy-vs-base draw, mirroring ``_rollout_action``'s ``k_pol``).
    * ``returns`` — float32[B] accumulated rollout return incl. the
      full-exploration completion bonus.

    **Guided rollouts in-kernel** (round 5): with ``guided_layers = n``
    (trunk depth + head, :func:`rlenv_tpu.ops.actor_rollout
    .pack_mlp_policy` layout) the call becomes ``rollout(flat, d0,
    rand_bits, ws, bs)`` and each step computes the CURRENT state's
    107-dim observation in-kernel (the same `_obs_rows_t` the step
    kernels use — one MXU probe matmul) and takes the policy's greedy
    action with probability ``guided_prob`` instead of the 70/30 base
    draw — the `MCTSPlanner(rollout_policy=...)` semantics
    (`algos/mcts.py`) at fused-kernel speed.

    **Leaf observation** (round 5): ``emit_leaf_obs=True`` additionally
    returns ``(returns, leaf_obs[B, obs_dim])`` — the observation of the
    state the rollout STARTED from (computed at grid step 0, reference
    layout), which is exactly what AlphaZero-style leaf evaluation
    (``MCTSPlanner(leaf_value=...)``) needs: the caller mixes
    ``V(leaf_obs)`` into the backup without a second obs pass.
    """
    from jax.experimental import pallas as pl

    from rlenv_tpu.ops.fused_step import (_mlp_greedy_rows,
                                          _obs_permutation, _obs_rows_t,
                                          _probe_selector)

    g = config.grid_size
    C = config.lidar_channels
    Rr = config.lidar_range
    V = config.visit_map_size ** 2
    OBS_PAD = _lane_pad(config.obs_dim)
    L = _lane_pad(g * g)
    K = int(max_depth)
    Bb = _block_envs_for(num_envs, block_envs)
    n_blocks = num_envs // Bb
    transition = _make_rollout_transition_t(config)
    guided = guided_layers > 0
    need_obs = guided or emit_leaf_obs
    n_rand = 4 if guided else 3
    act_fn = jnp.tanh if guided_activation == "tanh" else \
        (lambda x: jnp.maximum(x, 0.0))
    n_act = config.num_actions
    if need_obs:
        lid, vis, sel_np = _probe_selector(C, Rr, config.visit_map_size,
                                           g, L)
        PCOL = sel_np.shape[1]
        perm = _obs_permutation(config)

    def kernel(*refs):
        rolled_ref, scal_ref, rand_ref = refs[:3]
        at = 3
        if need_obs:
            pdx_ref, pdy_ref, vdx_ref, vdy_ref, sel_ref = refs[at:at + 5]
            at += 5
        w_refs = refs[at:at + guided_layers]
        b_refs = refs[at + guided_layers:at + 2 * guided_layers]
        at += 2 * guided_layers
        rolled_out, scal_out, ret_out = refs[at:at + 3]
        leaf_obs_out = refs[at + 3] if emit_leaf_obs else None
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _load():
            rolled_out[:] = rolled_ref[:]
            scal_out[:] = scal_ref[:]
            ret_out[:] = jnp.zeros_like(ret_out)

        rolled = rolled_out[:]                       # [L, Bb]
        sc = scal_out[:]                             # [SC, Bb]
        r = rand_ref[0]                              # [n_rand, Bb]
        r0, r1, r2 = r[0:1, :], r[1:2, :], r[2:3, :]

        d = sc[_SC_ROLLD:_SC_ROLLD + 1, :]
        done_l = sc[_SC_DONE:_SC_DONE + 1, :] > 0
        active = (d < K) & ~done_l

        # Observation of the CURRENT state (pure fn of grid+position):
        # every step when the prior consumes it, else once for the leaf.
        if guided:
            obs = _obs_rows_t(rolled, sc[_SC_RX:_SC_RX + 1, :],
                              sc[_SC_RY:_SC_RY + 1, :],
                              pdx_ref[:], pdy_ref[:], vdx_ref[:],
                              vdy_ref[:], sel_ref[:],
                              g, C, Rr, V, OBS_PAD)
            if emit_leaf_obs:
                @pl.when(k == 0)
                def _leaf():
                    leaf_obs_out[:] = obs
        elif emit_leaf_obs:
            # leaf obs only: one probe pass at grid step 0
            @pl.when(k == 0)
            def _leaf():
                leaf_obs_out[:] = _obs_rows_t(
                    rolled, sc[_SC_RX:_SC_RX + 1, :],
                    sc[_SC_RY:_SC_RY + 1, :],
                    pdx_ref[:], pdy_ref[:], vdx_ref[:], vdy_ref[:],
                    sel_ref[:], g, C, Rr, V, OBS_PAD)

        a = _policy_rows(rolled, sc, r0, r1, r2, g, heuristic_prob)
        if guided:
            # forward/argmax shared with the actor kernel and every
            # parity mirror (_mlp_greedy_rows)
            _, pol = _mlp_greedy_rows(obs, [w[:] for w in w_refs],
                                      [b[:] for b in b_refs], act_fn,
                                      n_act)
            r3 = r[3:4, :]
            thresh_p = jnp.int32(int(guided_prob * (2**31 - 1)))
            use_pol = (r3 & 0x7FFFFFFF) < thresh_p
            a = jnp.where(use_pol, pol, a).astype(jnp.int32)
        new_rolled, new_sc, reward, term, trunc = transition(rolled, sc, a)

        # Completion bonus: episode ends with exploration at 100%
        # (terminated <=> fully explored, `mcts_custom_trainer.py:162-164`).
        step_ret = jnp.where(
            active, reward + jnp.where(term, completion_bonus, 0.0), 0.0)
        done_next = (done_l | (active & (term | trunc))).astype(jnp.int32)

        base = jnp.where(active, new_sc, sc)
        base = jnp.concatenate([
            base[:_SC_DONE, :], done_next,
            d + active.astype(jnp.int32),
            base[_SC_ROLLD + 1:, :]], axis=0)
        rolled_out[:] = jnp.where(active, new_rolled, rolled)
        scal_out[:] = base
        ret_out[:] = ret_out[:] + step_ret

    def state_spec(rows):
        return pl.BlockSpec((rows, Bb), lambda i, k: (0, i))

    def time_spec(rows):
        return pl.BlockSpec((1, rows, Bb), lambda i, k: (k, 0, i))

    if interpret:
        compiler_params = None
    else:
        from jax.experimental.pallas import tpu as pltpu
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, k: (0, 0))

    in_specs = [state_spec(L), state_spec(_SC_COLS), time_spec(n_rand)]
    out_specs = [state_spec(L), state_spec(_SC_COLS), state_spec(1)]
    out_shape = [
        jax.ShapeDtypeStruct((L, num_envs), jnp.int32),
        jax.ShapeDtypeStruct((_SC_COLS, num_envs), jnp.int32),
        jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
    ]
    if need_obs:
        in_specs += [const_spec(C, Rr), const_spec(C, Rr),
                     const_spec(V, 1), const_spec(V, 1),
                     const_spec(PCOL, L)]
    if emit_leaf_obs:
        out_specs.append(state_spec(OBS_PAD))
        out_shape.append(
            jax.ShapeDtypeStruct((OBS_PAD, num_envs), jnp.float32))

    def make_call(w_shapes):
        specs = list(in_specs)
        specs += [const_spec(s[0], s[1]) for s in w_shapes]
        specs += [const_spec(s[0], 1) for s in w_shapes]
        return pl.pallas_call(
            kernel,
            compiler_params=compiler_params,
            grid=(n_blocks, K),
            in_specs=specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )

    if need_obs:
        pdx_j = jnp.asarray(lid[:, :, 0].copy())           # [C, R]
        pdy_j = jnp.asarray(lid[:, :, 1].copy())
        vdx_j = jnp.asarray(vis[:, 0][:, None].copy())     # [V, 1]
        vdy_j = jnp.asarray(vis[:, 1][:, None].copy())
        sel_j = jnp.asarray(sel_np.T.copy())               # [PCOL, L]
        perm_j = jnp.asarray(perm)

    def rollout(flat: FlatEnvState, d0: jnp.ndarray,
                rand_bits: jnp.ndarray, ws=(), bs=()):
        assert len(ws) == guided_layers and len(bs) == guided_layers
        scal = flat.scal.at[:, _SC_DONE].set(0)
        scal = scal.at[:, _SC_ROLLD].set(d0.astype(jnp.int32))
        args = [flat.rolled.T, scal.T,
                rand_bits.astype(jnp.int32).reshape(K, n_rand, num_envs)]
        if need_obs:
            args += [pdx_j, pdy_j, vdx_j, vdy_j, sel_j]
        args += list(ws) + list(bs)
        out = make_call([w.shape for w in ws])(*args)
        ret = out[2][0]
        if emit_leaf_obs:
            leaf_obs = jnp.take(out[3], perm_j, axis=0).T  # [B, obs_dim]
            return ret, leaf_obs
        return ret

    return rollout


def rollout_returns_xla(env, state: EnvState, d0: jnp.ndarray,
                        rand_bits: jnp.ndarray, max_depth: int,
                        heuristic_prob: float = 0.7,
                        completion_bonus: float = 500.0,
                        guided_ws=(), guided_bs=(),
                        guided_prob: float = 0.0,
                        guided_activation: str = "relu") -> jnp.ndarray:
    """XLA mirror of :func:`build_mcts_rollout` on a batched
    :class:`EnvState` — the independent parity oracle (it goes through
    ``PlantOS.step``, not the packed-grid transition). Consumes the SAME
    streamed random bits with the SAME integer arithmetic, and accumulates
    rewards in the same order, so its float32 returns are bit-identical
    to the kernel's.

    With ``guided_ws/guided_bs`` (:func:`rlenv_tpu.ops.actor_rollout
    .pack_mlp_policy` layout) it mirrors the guided kernel too: the
    observation comes from ``env.observe`` (bit-identical to the
    in-kernel probe path, as the step-kernel parity suite proves) and
    the greedy forward uses the SAME operand order (``W @ x_T`` on the
    kernel-layout obs), so guided actions also match bit-exactly."""
    g = env.config.grid_size
    B = state.rover.shape[0]
    deltas = jnp.asarray([[-1, 0], [0, 1], [1, 0], [0, -1]], jnp.int32)
    guided = len(guided_ws) > 0
    if guided:
        from rlenv_tpu.ops.fused_step import (_lane_pad, _mlp_greedy_rows,
                                              _obs_permutation)
        perm_g = jnp.asarray(_obs_permutation(env.config))
        obs_pad = _lane_pad(env.config.obs_dim)
        act_fn = jnp.tanh if guided_activation == "tanh" else \
            (lambda v: jnp.maximum(v, 0.0))
        v_observe = jax.vmap(env.observe)

        def greedy(s: EnvState):
            obs_ref = v_observe(s)                          # [B, obs_dim]
            x = jnp.zeros((B, obs_pad)).at[:, perm_g].set(obs_ref).T
            _, a = _mlp_greedy_rows(x, guided_ws, guided_bs, act_fn,
                                    env.config.num_actions)
            return a[0]                                     # [B]

    def policy(s: EnvState, r0, r1, r2):
        nb = s.rover[:, None, :] + deltas[None, :, :]          # [B, 4, 2]
        in_b = jnp.all((nb >= 0) & (nb < g), axis=-1)          # [B, 4]
        nx = jnp.clip(nb[..., 0], 0, g - 1)
        ny = jnp.clip(nb[..., 1], 0, g - 1)
        bidx = jnp.arange(B)[:, None]
        valid = in_b & ~s.obstacles[bidx, nx, ny]
        vis = jnp.where(valid, s.visit_counts[bidx, nx, ny], _INT32_MAX)
        best_v = vis[:, 0]
        best_i = jnp.zeros(B, jnp.int32)
        for i in range(1, 4):
            take = vis[:, i] < best_v
            best_v = jnp.where(take, vis[:, i], best_v)
            best_i = jnp.where(take, jnp.int32(i), best_i)
        any_valid = jnp.any(valid, axis=-1)
        fallback = (r2 & 0x7FFFFFFF) % 5
        heur = jnp.where(any_valid, best_i, fallback)
        rand = (r1 & 0x7FFFFFFF) % 5
        thresh = jnp.int32(int(heuristic_prob * (2**31 - 1)))
        use_heur = (r0 & 0x7FFFFFFF) < thresh
        return jnp.where(use_heur, heur, rand).astype(jnp.int32)

    v_step = jax.vmap(env.step)

    def body(carry, r):
        s, d, done, ret = carry
        active = (d < max_depth) & ~done
        a = policy(s, r[0], r[1], r[2])
        if guided:
            pol = greedy(s).astype(jnp.int32)
            thresh_p = jnp.int32(int(guided_prob * (2**31 - 1)))
            use_pol = (r[3] & 0x7FFFFFFF) < thresh_p
            a = jnp.where(use_pol, pol, a)
        ns, _, reward, term, trunc, _ = v_step(s, a)
        step_ret = jnp.where(
            active, reward + jnp.where(term, completion_bonus, 0.0), 0.0)
        s = jax.tree.map(
            lambda new, old: jnp.where(
                active.reshape((B,) + (1,) * (new.ndim - 1)), new, old),
            ns, s)
        done = done | (active & (term | trunc))
        d = d + active.astype(jnp.int32)
        return (s, d, done, ret + step_ret), None

    init = (state, d0.astype(jnp.int32), jnp.zeros(B, bool),
            jnp.zeros(B, jnp.float32))
    (_, _, _, ret), _ = jax.lax.scan(
        body, init, rand_bits.astype(jnp.int32), length=max_depth)
    return ret
