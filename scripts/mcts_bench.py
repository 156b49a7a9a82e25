import os, time
# env-var jax config is frozen before user code on this box
# (sitecustomize pre-imports jax); use the working form:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
from rlenv_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.config import MCTSConfig
from rlenv_tpu.algos.mcts import MCTSPlanner
from rlenv_tpu.env.vector import VecPlantOS

# Reference config: grid 15, 50 sims, depth 100 (mcts_custom_trainer.py defaults)
cfg = EnvConfig(grid_size=15, num_plants=5, num_obstacles=8,
                lidar_range=2, lidar_channels=10, max_steps=500)
env = PlantOS(cfg)
B = 256
venv = VecPlantOS(env, B)
planner = MCTSPlanner(env, MCTSConfig(n_simulations=50, max_depth=100))

states, obs, _ = venv.reset(jax.random.PRNGKey(0))
keys = jax.random.split(jax.random.PRNGKey(1), B)
t0 = time.perf_counter()
acts = planner.search_batch(states, keys)
print("first call (incl compile):", time.perf_counter() - t0, "s", flush=True)

reps = 5
t0 = time.perf_counter()
for i in range(reps):
    keys = jax.random.split(keys[0], B)
    acts = planner.search_batch(states, keys)
x = acts.sum().item()
dt = (time.perf_counter() - t0) / reps
per_action_env_steps = 50 * 100  # sims x depth upper bound
print(f"XLA search: {dt*1e3:.1f} ms per batched search of {B} envs -> "
      f"{B/dt:.1f} planned actions/s "
      f"(~{B*per_action_env_steps/dt/1e6:.2f}M sim env-steps/s)", flush=True)

# Fused path: packed sim state, selection via the fused step kernel,
# rollout phase as ONE Pallas program per simulation.
key = jax.random.PRNGKey(2)
t0 = time.perf_counter()
acts = planner.search_batch_fused(states, key)
print("fused first call (incl compile):",
      time.perf_counter() - t0, "s", flush=True)
t0 = time.perf_counter()
for i in range(reps):
    key, k = jax.random.split(key)
    acts = planner.search_batch_fused(states, k)
x = acts.sum().item()
dt = (time.perf_counter() - t0) / reps
print(f"fused search: {dt*1e3:.1f} ms per batched search of {B} envs -> "
      f"{B/dt:.1f} planned actions/s "
      f"(~{B*per_action_env_steps/dt/1e6:.2f}M sim env-steps/s)", flush=True)
