"""Gymnasium ``VectorEnv`` adapter over the device-batched engine.

The reference's only vectorization is SB3's ``DummyVecEnv`` over 64 serial
Python envs (`/root/reference/trainingCode.py:129-130`). This adapter
exposes the TPU-batched :class:`rlenv_tpu.env.vector.VecPlantOS` (or its
curriculum wrapper) through the standard ``gymnasium.vector.VectorEnv``
interface, so migrating users can drive thousands of lockstep on-device
envs from any Gymnasium-vector-compatible training loop — one jitted
program per ``step()`` instead of N Python ``env.step`` calls.

Autoreset follows gymnasium's SAME_STEP mode (the SB3 ``VecEnv`` semantic
the reference trained under): a done env's returned observation is the
fresh reset observation, and the terminal observation is preserved in
``infos["final_obs"]`` with per-env validity in ``infos["_final_obs"]``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from rlenv_tpu.config import CurriculumConfig, EnvConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.curriculum import CurriculumVecPlantOS
from rlenv_tpu.env.vector import VecPlantOS

try:
    import gymnasium as gym
    from gymnasium import spaces
    from gymnasium.vector import VectorEnv
    from gymnasium.vector.utils import batch_space
    try:
        from gymnasium.vector import AutoresetMode
        _AUTORESET_META = {"autoreset_mode": AutoresetMode.SAME_STEP}
    except ImportError:  # older gymnasium: no autoreset-mode metadata
        _AUTORESET_META = {}
except ImportError:  # pragma: no cover
    gym = None
    VectorEnv = object
    _AUTORESET_META = {}


class PlantOSVectorEnv(VectorEnv):
    """``gymnasium.vector.VectorEnv`` over ``num_envs`` on-device instances."""

    metadata = {"render_modes": ["rgb_array"], **_AUTORESET_META}

    def __init__(self, num_envs: int = 64,
                 env_config: Optional[EnvConfig] = None,
                 curriculum: Optional[CurriculumConfig] = None,
                 seed: int = 0):
        if gym is None:  # pragma: no cover
            raise ImportError("gymnasium is required for PlantOSVectorEnv")
        self.config = env_config or EnvConfig.training()
        engine = PlantOS(self.config)
        if curriculum is not None:
            self._venv = CurriculumVecPlantOS(engine, num_envs, curriculum)
        else:
            self._venv = VecPlantOS(engine, num_envs)
        self.num_envs = num_envs
        self._jit_step = jax.jit(self._venv.step)
        self._states = None
        self._default_seed = seed

        self.single_action_space = spaces.Discrete(self.config.num_actions)
        self.single_observation_space = spaces.Box(
            low=0.0, high=1.0, shape=(self.config.obs_dim,),
            dtype=np.float32)
        self.action_space = batch_space(self.single_action_space, num_envs)
        self.observation_space = batch_space(self.single_observation_space,
                                             num_envs)

    # -- VectorEnv API -------------------------------------------------------

    def reset(self, *, seed: Optional[int] = None, options: Optional[Dict]
              = None) -> Tuple[np.ndarray, Dict]:
        if seed is None:
            seed = self._default_seed
            self._default_seed += 1
        self._states, obs, info = self._venv.reset(jax.random.PRNGKey(seed))
        return np.asarray(obs), self._np_infos(info)

    def step(self, actions) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                     np.ndarray, Dict]:
        if self._states is None:
            raise RuntimeError(
                "reset() must be called before step() (and after close())")
        import jax.numpy as jnp
        actions = jnp.asarray(np.asarray(actions), jnp.int32)
        self._states, obs, rew, term, trunc, info = self._jit_step(
            self._states, actions)
        done = np.asarray(info["done"])
        infos = self._np_infos(
            {k: v for k, v in info.items() if k != "done"})
        # SAME_STEP terminal-observation convention.
        if "final_obs" in infos:
            infos["_final_obs"] = done
        return (np.asarray(obs), np.asarray(rew), np.asarray(term),
                np.asarray(trunc), infos)

    def render(self):
        from rlenv_tpu.render.render2d import render_frame
        first = jax.tree.map(lambda x: x[0], self._states)
        if hasattr(first, "env"):     # curriculum wrapper state
            first = first.env
        return render_frame(first, self.config.lidar_channels,
                            self.config.lidar_range)

    def close_extras(self, **kwargs) -> None:
        self._states = None

    # -- helpers -------------------------------------------------------------

    @property
    def states(self):
        """The underlying batched EnvState pytree (advanced use)."""
        return self._states

    @staticmethod
    def _np_infos(info: Dict) -> Dict:
        return {k: np.asarray(v) for k, v in info.items()}
