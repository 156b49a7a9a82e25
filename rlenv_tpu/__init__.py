"""rlenv_tpu — a TPU-native re-implementation of the GROW-R / PlantOS RL framework.

A brand-new JAX/XLA framework with the capabilities of GammaKing2000/RL-Env
(reference mounted read-only at /root/reference): a procedurally generated
2-D grid world in which a rover explores, perceives via a ray-cast LIDAR +
local visit-map observation, and waters thirsty plants — re-designed
TPU-first:

* The environment is a pure function ``step(state, action) -> (state, ...)``
  over dense arrays (no Python objects in the hot loop), batched with
  ``jax.vmap`` to thousands of lockstep instances and sharded over device
  meshes with ``jax.sharding`` — replacing the reference's single-instance
  Gymnasium class (`/root/reference/gradio-app/plantos_env_new.py`) and its
  serial ``DummyVecEnv`` fan-out (`/root/reference/trainingCode.py:129-130`).
* Training (A2C / DQN / Recurrent PPO / MCTS) runs as on-device
  actor-learner loops under ``lax.scan`` — replacing the SB3/torch trainers
  (`/root/reference/trainingCode.py`, `A2C_training.py`,
  `mcts_custom_trainer.py`).
* Periphery (rendering, metrics, checkpointing, web UI) mirrors the
  reference's feature set with host-side code fed from de-device-ified state.
"""

from rlenv_tpu.config import EnvConfig, RewardConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.state import EnvState

__version__ = "0.1.0"

__all__ = [
    "EnvConfig",
    "RewardConfig",
    "PlantOS",
    "EnvState",
    "__version__",
]
