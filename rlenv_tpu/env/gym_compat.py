"""Gymnasium-compatible adapter over the functional core.

Gives reference users the exact single-env API they already have
(`/root/reference/gradio-app/plantos_env_new.py:12-160`): same constructor
signature, ``reset(seed=...)``/``step(action)`` 5-tuples, the same info
dict keys (Python scalars/tuples), ``render()`` honoring
``'human'``/``'rgb_array'``, and registration as ``'PlantOS-v0'``.

Internally every call delegates to the jitted functional env — this class
is a thin host shell holding one ``EnvState``. For training at scale use
:class:`rlenv_tpu.env.vector.VecPlantOS` instead; this adapter exists for
interactive use, visualization and drop-in compatibility.

Improvement over the reference (documented divergence): ``reset(seed=N)``
here actually reproduces the map — the reference draws layout from the
unseeded global ``random`` module (`plantos_env_new.py:373-406` vs `:129`),
so its seeding silently does nothing (SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from rlenv_tpu.config import EnvConfig, RewardConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.render.render2d import render_frame

try:
    import gymnasium as gym
    from gymnasium import spaces
    _BASE = gym.Env
except ImportError:  # pragma: no cover
    gym = None
    spaces = None
    _BASE = object


class PlantOSGymEnv(_BASE):
    """Single-instance Gymnasium view of the TPU-native PlantOS engine."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 30}

    def __init__(self, grid_size: int = 21, num_plants: int = 8,
                 num_obstacles: int = 50, lidar_range: int = 2,
                 lidar_channels: int = 10, thirsty_plant_prob: float = 0.7,
                 observation_mode: str = "grid",
                 render_mode: Optional[str] = None,
                 map_generation_algo: str = "original",
                 rewards: Optional[RewardConfig] = None,
                 assets_dir: Optional[str] = None):
        self.config = EnvConfig(
            grid_size=grid_size, num_plants=num_plants,
            num_obstacles=num_obstacles, lidar_range=lidar_range,
            lidar_channels=lidar_channels,
            thirsty_plant_prob=thirsty_plant_prob,
            map_generation_algo=map_generation_algo,
            rewards=rewards or RewardConfig())
        # mirrored attributes (`plantos_env_new.py:31-40`)
        self.grid_size = grid_size
        self.num_plants = num_plants
        self.num_obstacles = num_obstacles
        self.lidar_range = lidar_range
        self.lidar_channels = lidar_channels
        self.thirsty_plant_prob = thirsty_plant_prob
        self.observation_mode = observation_mode
        self.render_mode = render_mode
        self.map_generation_algo = map_generation_algo
        self.observation_space_per_channel = 5
        self.visit_map_size = self.config.visit_map_size
        self.max_steps = self.config.max_steps

        self._engine = PlantOS(self.config)
        self._jit_step = jax.jit(self._engine.step)
        self._jit_reset = jax.jit(self._engine.reset)
        self._state = None
        self._seed_counter = 0
        self._window = None
        # cached texture loading with parent-dir fallback
        # (`plantos_env_new.py:650-695`)
        self._assets = None
        self._assets_dir = assets_dir

        if spaces is not None:
            self.action_space = spaces.Discrete(5)
            self.observation_space = spaces.Box(
                low=0.0, high=1.0, shape=(self.config.obs_dim,),
                dtype=np.float32)

    # -- gym API -------------------------------------------------------------

    def reset(self, seed: Optional[int] = None,
              options: Optional[Dict[str, Any]] = None
              ) -> Tuple[np.ndarray, Dict[str, Any]]:
        if gym is not None:
            super().reset(seed=seed)
        if seed is None:
            self._seed_counter += 1
            seed = self._seed_counter + 997
        self._state, obs, info = self._jit_reset(jax.random.PRNGKey(seed))
        return np.asarray(obs), self._pyinfo(info)

    def step(self, action: int) -> Tuple[np.ndarray, float, bool, bool,
                                         Dict[str, Any]]:
        self._state, obs, reward, term, trunc, info = self._jit_step(
            self._state, int(action))
        return (np.asarray(obs), float(reward), bool(term), bool(trunc),
                self._pyinfo(info))

    def render(self):
        if self.render_mode not in ("rgb_array", "human"):
            return None
        if self._assets is None:
            from rlenv_tpu.render.assets import load_assets
            self._assets = load_assets(self._assets_dir)
        frame = render_frame(self._state, self.lidar_channels,
                             self.lidar_range, assets=self._assets)
        if self.render_mode == "rgb_array":
            return frame
        from rlenv_tpu.render.window import FrameWindow
        if self._window is None:
            self._window = FrameWindow(self.grid_size * 30)
        self._window.show(frame)
        return None

    def close(self) -> None:
        if self._window is not None:
            self._window.close()
            self._window = None

    # -- helpers -------------------------------------------------------------

    @property
    def state(self):
        """The underlying functional EnvState (advanced use)."""
        return self._state

    @staticmethod
    def _pyinfo(info: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in info.items():
            if k == "rover_position":
                arr = np.asarray(v)
                out[k] = (int(arr[0]), int(arr[1]))
            elif k == "exploration_percentage":
                out[k] = float(v)
            elif k in ("collided_with_wall", "is_watering"):
                out[k] = bool(v)
            else:
                out[k] = int(np.asarray(v))
        return out


_ENTRY_POINT = "rlenv_tpu.env.gym_compat:PlantOSGymEnv"


def register_env() -> None:
    """(Re-)register ``'PlantOS-v0'`` pointing at :class:`PlantOSGymEnv`.

    Registration parity with `plantos_env_new.py:774-777`. Idempotent, but
    reclaims the ID if another module registered it: the reference registers
    the same ID with a broken entry point (``'plantos_env:PlantOSEnvNew'`` —
    that module only defines ``PlantOSEnv``), so after importing the
    reference (e.g. in parity tests) ``gym.make('PlantOS-v0')`` would raise
    AttributeError unless we take the slot back.
    """
    if gym is None:
        return
    try:
        spec = gym.registry.get("PlantOS-v0")
        if spec is None or spec.entry_point != _ENTRY_POINT:
            gym.register(id="PlantOS-v0", entry_point=_ENTRY_POINT)
    except Exception:  # registry API unavailable
        pass


register_env()
