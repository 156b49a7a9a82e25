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


class CurriculumVecPlantOS:
    """Vectorized PlantOS with per-env progressive curriculum + auto-reset."""

    def __init__(self, env: PlantOS, num_envs: int,
                 config: CurriculumConfig = CurriculumConfig()):
        self.env = env
        self.num_envs = num_envs
        self.config = config
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

            reset_states, reset_obs, _ = self._env_reset_batch(maze_key_next)

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
            )
            return new_cstate, jnp.where(done[:, None], reset_obs, obs)

        def no_resets(args):
            env_states, obs = args
            return (cstate.replace(env=env_states,
                                   maze_completed=maze_completed), obs)

        new_cstate, new_obs = jax.lax.cond(
            jnp.any(done), do_resets, no_resets, (env_states, obs))

        info = dict(info)
        info["final_obs"] = obs
        info["done"] = done
        info["exploration_threshold"] = cstate.threshold
        info["maze_completed"] = maze_completed
        return new_cstate, new_obs, rewards, term, trunc, info
