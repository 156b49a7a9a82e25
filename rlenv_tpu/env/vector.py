"""Vectorized, auto-resetting environment.

TPU-native replacement for the reference's serial ``DummyVecEnv`` fan-out
(`/root/reference/trainingCode.py:129-130`: N Python envs stepped in a
Python loop, 64 used in the checked-in runs). Here the batch is a single
pytree of stacked states; one ``vmap``-ed XLA program steps all envs in
lockstep, and done envs are re-seeded on device (the SB3 VecEnv semantic:
the returned obs on a done step is the fresh reset obs, with the terminal
observation preserved in ``info['final_obs']``).

Resets (map generation included) only execute when at least one env
finished — a batch-level ``lax.cond`` keeps the common no-reset step free
of the map-gen cost.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.state import EnvState


def _select(done: jnp.ndarray, a, b):
    """Per-env tree select: done -> a, else b."""
    def sel(x, y):
        d = done.reshape(done.shape + (1,) * (x.ndim - 1))
        return jnp.where(d, x, y)
    return jax.tree.map(sel, a, b)


class VecPlantOS:
    """Batch of ``num_envs`` lockstep PlantOS instances with auto-reset."""

    def __init__(self, env: PlantOS, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        self._v_reset = jax.vmap(env.reset)
        self._v_step = jax.vmap(env.step)

    @property
    def obs_dim(self) -> int:
        return self.env.obs_dim

    @property
    def num_actions(self) -> int:
        return self.env.num_actions

    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray, Dict]:
        keys = jax.random.split(key, self.num_envs)
        return self._v_reset(keys)

    def step(self, states: EnvState, actions: jnp.ndarray
             ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                        jnp.ndarray, Dict]:
        """Step all envs; auto-reset the done ones.

        Returns ``(states, obs, rewards, terminated, truncated, info)`` with
        ``info['final_obs']`` holding the pre-reset (terminal) observation
        and ``info['done']`` the combined done mask.
        """
        states, obs, rewards, term, trunc, info = self._v_step(states, actions)
        done = term | trunc

        def do_resets(args):
            states, obs = args
            # Each env's carried key seeds its own next episode.
            reset_states, reset_obs, _ = self._v_reset(states.key)
            return (_select(done, reset_states, states),
                    jnp.where(done[:, None], reset_obs, obs))

        new_states, new_obs = jax.lax.cond(
            jnp.any(done), do_resets, lambda args: args, (states, obs))

        info = dict(info)
        info["final_obs"] = obs
        info["done"] = done
        return new_states, new_obs, rewards, term, trunc, info
