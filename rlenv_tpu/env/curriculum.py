"""Batched progressive-curriculum environment.

The reference implements curriculum as a per-env Python ``gym.Wrapper``
holding mutable host state (`/root/reference/trainingCode.py:24-98` and the
A2C variant `/root/reference/A2C_training.py:37-109`). Here the curriculum
bookkeeping is itself batched device state stepped inside the same jitted
program as the env — per SURVEY.md §7 ("curriculum state across resets ...
becomes part of the batched env state").

Replicated semantics (PPO/DQN variant; A2C differences via
``CurriculumConfig.a2c()``):

* an env keeps its current maze (same map key => identical map, see the
  mapgen determinism note) until its exploration threshold is reached
  (``maze_completed``) or ``max_episodes_per_maze`` episodes elapse;
* on threshold success the threshold rises by ``threshold_increment`` up to
  ``max_threshold`` (`trainingCode.py:55-62`);
* visit counts persist across resets of the same maze — and, exactly like
  the reference, tracking only engages from the second episode on a maze
  (the first same-maze reset snapshots a *fresh* counter:
  `trainingCode.py:80-84` runs after ``env.reset``), so carry-over starts
  with episode 2;
* the A2C variant additionally forces termination the moment the threshold
  is met mid-episode (`A2C_training.py:101-104`).

Reset amortization (``reset_pool``): the expensive part of ``do_resets``
is the full-width vmapped env reset (map generation + initial obs), and in
steady state SOME env finishes on most steps, so the `lax.cond` fires its
full cost nearly every step (round-3 profiling, DESIGN.md "Known
headroom"). But both candidate next states of every env are pure functions
of keys that only change at that env's own resets: the same-maze candidate
is ``reset(maze_key)`` and the fresh-maze candidate is
``reset(split(key)[0])``. With ``reset_pool=R`` the wrapper therefore
carries both candidates as device-resident spares: a finishing env swaps
in the right spare (cheap selects — no map generation on the done path),
the same-maze spare refreshes for free at consumption (the chosen reset
state IS the next same-maze reset state), and consumed fresh-maze spares
are regenerated in ONE batched reset at most every R steps. An env that
finishes again before its fresh spare refills falls back to the full
reset path under a (rare) inner cond — the trajectory is bit-identical to
``reset_pool=0`` either way (`tests/test_vector_curriculum.py`).

Measured outcome (round-4 A/B at the 10M-step 512-env DQN config, same
seed, bit-identical final metrics across all arms): pool=64 vs pool=0 is
60.4 s vs 55.3 s on the fused path and 126.2 s vs 126.7 s on the XLA
path — i.e. NEUTRAL to slightly negative, disproving the round-3
"reset branch dominates the residual cost" hypothesis (the spare states
triple the per-step ``lax.cond``'s carried state, which costs about what
the amortization saves). The knob stays available (``reset_pool=R``) but
defaults OFF; the actual residual wall-clock turned out to be the
full-width in-training evals (see ``train.trainer.make_eval_fn``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rlenv_tpu.config import CurriculumConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.state import EnvState
from rlenv_tpu.env.vector import _select


@struct.dataclass
class CurriculumState:
    """Per-env curriculum bookkeeping (stacked along the batch axis)."""

    env: EnvState                      # inner batched env state
    maze_key: jnp.ndarray              # key identifying the current maze
    key: jnp.ndarray                   # wrapper's own PRNG stream
    threshold: jnp.ndarray             # f32[] current exploration threshold
    episodes_on_maze: jnp.ndarray      # i32[]
    maze_completed: jnp.ndarray        # bool[]
    persistent_visits: jnp.ndarray     # i32[g, g]
    persistent_set: jnp.ndarray        # bool[] — tracking engaged?
    episode_count: jnp.ndarray         # i32[]
    successful_explorations: jnp.ndarray  # i32[]
    # Reset-pool spares (None when reset_pool=0 — empty pytree leaves, so
    # the pool-less state layout is unchanged). See module docstring.
    spare_same: EnvState = None        # reset(maze_key) candidate
    spare_same_obs: jnp.ndarray = None
    spare_fresh: EnvState = None       # reset(split(key)[0]) candidate
    spare_fresh_obs: jnp.ndarray = None
    spare_stale: jnp.ndarray = None    # bool[] — fresh spare consumed?
    tick: jnp.ndarray = None           # i32 global step counter


class CurriculumVecPlantOS:
    """Vectorized PlantOS with per-env progressive curriculum + auto-reset."""

    def __init__(self, env: PlantOS, num_envs: int,
                 config: CurriculumConfig = CurriculumConfig(),
                 reset_pool: int = 0):
        self.env = env
        self.num_envs = num_envs
        self.config = config
        self.reset_pool = reset_pool
        self._v_reset = jax.vmap(env.reset)
        self._v_step = jax.vmap(env.step)

    # -- state-layout hooks (overridden by the fused-kernel subclass) -----

    def _env_reset_batch(self, keys):
        return self._v_reset(keys)

    def _env_step_batch(self, env_states, actions):
        return self._v_step(env_states, actions)

    def _visits(self, env_states) -> jnp.ndarray:
        return env_states.visit_counts

    def _replace_visits(self, env_states, visits):
        return env_states.replace(visit_counts=visits)

    @staticmethod
    def _b(mask: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Broadcast a [B] mask against x's trailing dims."""
        return mask.reshape(mask.shape + (1,) * (x.ndim - 1))

    # ---------------------------------------------------------------------

    @property
    def obs_dim(self) -> int:
        return self.env.obs_dim

    @property
    def num_actions(self) -> int:
        return self.env.num_actions

    def reset(self, key: jax.Array) -> Tuple[CurriculumState, jnp.ndarray, Dict]:
        B = self.num_envs
        k_maze, k_self = jax.random.split(key)
        maze_keys = jax.random.split(k_maze, B)
        env_states, obs, info = self._env_reset_batch(maze_keys)
        cstate = CurriculumState(
            env=env_states,
            maze_key=maze_keys,
            key=jax.random.split(k_self, B),
            threshold=jnp.full((B,), self.config.initial_threshold, jnp.float32),
            episodes_on_maze=jnp.ones((B,), jnp.int32),  # first episode running
            maze_completed=jnp.zeros((B,), bool),
            persistent_visits=jnp.zeros_like(self._visits(env_states)),
            persistent_set=jnp.zeros((B,), bool),
            episode_count=jnp.ones((B,), jnp.int32),
            successful_explorations=jnp.zeros((B,), jnp.int32),
        )
        if self.reset_pool:
            # Same-maze spare == the freshly built initial states (that is
            # literally what reset(maze_key) produces); fresh-maze spare
            # needs one extra batched reset, paid once at wrapper reset.
            fresh_keys = jax.vmap(
                lambda k: jax.random.split(k, 2))(cstate.key)[:, 0]
            fresh_states, fresh_obs, _ = self._env_reset_batch(fresh_keys)
            cstate = cstate.replace(
                spare_same=env_states, spare_same_obs=obs,
                spare_fresh=fresh_states, spare_fresh_obs=fresh_obs,
                spare_stale=jnp.zeros((B,), bool),
                tick=jnp.zeros((), jnp.int32))
        return cstate, obs, info

    def step(self, cstate: CurriculumState, actions: jnp.ndarray
             ) -> Tuple[CurriculumState, jnp.ndarray, jnp.ndarray,
                        jnp.ndarray, jnp.ndarray, Dict]:
        cfg = self.config
        env_states, obs, rewards, term, trunc, info = self._env_step_batch(
            cstate.env, actions)

        expl = info["exploration_percentage"]
        threshold_met = expl >= cstate.threshold
        maze_completed = cstate.maze_completed | threshold_met
        if cfg.terminate_on_threshold:   # A2C variant (`A2C_training.py:101-104`)
            term = term | threshold_met
        done = term | trunc

        def do_resets(args):
            env_states, obs = args
            # Persistent tracking (`trainingCode.py:95-97`). The reference
            # refreshes its snapshot every step, but the value is only ever
            # READ here at reset time and ``persistent_set`` only changes at
            # resets — so snapshotting once, at the moment an episode ends,
            # is step-for-step equivalent and keeps the [B, g*g]-sized
            # select out of the hot loop.
            visits_now = self._visits(env_states)
            persistent = jnp.where(
                self._b(cstate.persistent_set, visits_now),
                visits_now, cstate.persistent_visits)
            # --- reset decision (`trainingCode.py:44-84`) ---
            episodes_inc = cstate.episodes_on_maze + 1
            timeout = episodes_inc >= cfg.max_episodes_per_maze
            new_maze = maze_completed | timeout
            threshold_next = jnp.where(
                maze_completed,
                jnp.minimum(cstate.threshold + cfg.threshold_increment,
                            cfg.max_threshold),
                cstate.threshold)

            split2 = jax.vmap(lambda k: jax.random.split(k, 2))(cstate.key)
            fresh_maze_key, key_next = split2[:, 0], split2[:, 1]
            if cfg.fresh_map_each_reset:
                # reference ACTUAL behavior: new map every reset while the
                # curriculum bookkeeping still runs (SURVEY.md §3.5)
                maze_key_next = fresh_maze_key
            else:
                maze_key_next = jnp.where(
                    new_maze[:, None], fresh_maze_key, cstate.maze_key)

            if self.reset_pool:
                # Swap in the precomputed spare instead of regenerating:
                # spare_fresh == reset(fresh_maze_key) and
                # spare_same == reset(maze_key) by construction, so the
                # selected state is bit-identical to
                # _env_reset_batch(maze_key_next) — without the map-gen +
                # initial-obs cost on the (near-every-step) done path.
                use_fresh = (jnp.ones_like(new_maze)
                             if cfg.fresh_map_each_reset else new_maze)
                reset_states = _select(use_fresh, cstate.spare_fresh,
                                       cstate.spare_same)
                reset_obs = jnp.where(use_fresh[:, None],
                                      cstate.spare_fresh_obs,
                                      cstate.spare_same_obs)

                # Rare fallback: an env finished again before its consumed
                # fresh spare was refilled (possible only for episodes
                # shorter than the refill interval).
                need_fb = done & cstate.spare_stale

                def fallback(args):
                    reset_states, reset_obs = args
                    full_states, full_obs, _ = self._env_reset_batch(
                        maze_key_next)
                    return (_select(need_fb, full_states, reset_states),
                            jnp.where(need_fb[:, None], full_obs,
                                      reset_obs))

                reset_states, reset_obs = jax.lax.cond(
                    jnp.any(need_fb), fallback, lambda a: a,
                    (reset_states, reset_obs))
                # The chosen (pre-visit-restore) reset state IS the next
                # same-maze candidate reset(maze_key_next): refresh free.
                spare_updates = dict(
                    spare_same=_select(done, reset_states,
                                       cstate.spare_same),
                    spare_same_obs=jnp.where(done[:, None], reset_obs,
                                             cstate.spare_same_obs),
                    # key advances at EVERY reset, so the fresh candidate
                    # (a function of key) is stale after any done.
                    spare_stale=cstate.spare_stale | done,
                    spare_fresh=cstate.spare_fresh,
                    spare_fresh_obs=cstate.spare_fresh_obs,
                    tick=cstate.tick,
                )
            else:
                spare_updates = {}
                reset_states, reset_obs, _ = self._env_reset_batch(
                    maze_key_next)

            # Same-maze: restore persistent counts if tracking engaged,
            # else snapshot the fresh (post-reset) counter — which is how
            # the reference only starts carrying from episode 2.
            restore = (~new_maze) & cstate.persistent_set
            reset_visits = self._visits(reset_states)
            visit_counts = jnp.where(
                self._b(restore, persistent), persistent, reset_visits)
            reset_states = self._replace_visits(reset_states, visit_counts)
            persistent_next = jnp.where(
                self._b(new_maze, persistent),
                jnp.zeros_like(persistent),
                jnp.where(self._b(~cstate.persistent_set, persistent),
                          self._visits(reset_states), persistent))

            new_cstate = CurriculumState(
                env=_select(done, reset_states, env_states),
                maze_key=jnp.where(done[:, None], maze_key_next,
                                   cstate.maze_key),
                key=jnp.where(done[:, None], key_next, cstate.key),
                threshold=jnp.where(done, threshold_next, cstate.threshold),
                episodes_on_maze=jnp.where(
                    done, jnp.where(new_maze, 0, episodes_inc),
                    cstate.episodes_on_maze),
                maze_completed=jnp.where(done, False, maze_completed),
                persistent_visits=jnp.where(
                    self._b(done, persistent), persistent_next, persistent),
                persistent_set=jnp.where(
                    done, jnp.where(new_maze, False, True),
                    cstate.persistent_set),
                episode_count=cstate.episode_count + done.astype(jnp.int32),
                successful_explorations=cstate.successful_explorations
                + (done & maze_completed).astype(jnp.int32),
                **spare_updates,
            )
            return new_cstate, jnp.where(done[:, None], reset_obs, obs)

        def no_resets(args):
            env_states, obs = args
            return (cstate.replace(env=env_states,
                                   maze_completed=maze_completed), obs)

        new_cstate, new_obs = jax.lax.cond(
            jnp.any(done), do_resets, no_resets, (env_states, obs))

        if self.reset_pool:
            tick = cstate.tick + 1
            new_cstate = new_cstate.replace(tick=tick)

            def refill(cs):
                # One batched reset regenerates ALL consumed fresh spares —
                # amortized to at most once per reset_pool steps.
                fresh_keys = jax.vmap(
                    lambda k: jax.random.split(k, 2))(cs.key)[:, 0]
                st, ob, _ = self._env_reset_batch(fresh_keys)
                return cs.replace(
                    spare_fresh=_select(cs.spare_stale, st, cs.spare_fresh),
                    spare_fresh_obs=jnp.where(cs.spare_stale[:, None], ob,
                                              cs.spare_fresh_obs),
                    spare_stale=jnp.zeros_like(cs.spare_stale))

            new_cstate = jax.lax.cond(
                (tick % self.reset_pool == 0)
                & jnp.any(new_cstate.spare_stale),
                refill, lambda cs: cs, new_cstate)

        info = dict(info)
        info["final_obs"] = obs
        info["done"] = done
        info["exploration_threshold"] = cstate.threshold
        info["maze_completed"] = maze_completed
        return new_cstate, new_obs, rewards, term, trunc, info
