"""Guided + leaf-value MCTS search throughput: XLA path vs the round-5
fused path (prior MLP evaluated inside the rollout kernel, leaf value
mixed off the kernel-emitted leaf observation).

The quality headline (RESULTS.md: 64.65% exploration at leaf mix 0.5 +
guided p=0.8, grid 25) was measured through the XLA guided path; this
benchmark times that EXACT planner configuration both ways on the real
chip. Uses the round-5 flagship DQN best-model checkpoint as the prior.

Usage: python scripts/mcts_bench_guided.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.algos.mcts import MCTSPlanner, policy_score_fn, value_score_fn
from rlenv_tpu.apps.policies import load_policy
from rlenv_tpu.config import MCTSConfig
from rlenv_tpu.ops.actor_rollout import qnet_policy_layers
from rlenv_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

CKPT = "runs/dqn_tpu_10m_512env_r5evalfused/models/best_model"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    # The quality-headline config: grid 25 training env, 50 sims.
    cfg = EnvConfig(grid_size=25, num_plants=10, num_obstacles=12,
                    lidar_range=6, lidar_channels=16)
    env = PlantOS(cfg)
    runner = load_policy(CKPT, "dqn", cfg)
    mcfg = MCTSConfig(n_simulations=50, max_depth=100, max_nodes=64,
                      rollout_policy_prob=0.8, leaf_value_mix=0.5)

    xla = MCTSPlanner(env, mcfg, rollout_policy=policy_score_fn(runner),
                      leaf_value=value_score_fn(runner))
    fused = MCTSPlanner(env, mcfg, leaf_value=value_score_fn(runner),
                        rollout_policy_layers=(
                            qnet_policy_layers(runner.params), "relu"))

    states, _, _ = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(0), B))
    reps = 5

    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    acts = fused.search_batch_fused(states, key)
    acts.sum().item()
    print(f"fused guided+leaf first call: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        key, k = jax.random.split(key)
        acts = fused.search_batch_fused(states, k)
    acts.sum().item()
    dt_f = (time.perf_counter() - t0) / reps
    print(f"fused guided+leaf: {dt_f * 1e3:.1f} ms / {B}-env search -> "
          f"{B / dt_f:.1f} planned actions/s", flush=True)

    keys = jax.random.split(jax.random.PRNGKey(1), B)
    t0 = time.perf_counter()
    acts = xla.search_batch(states, keys)
    acts.sum().item()
    print(f"XLA guided+leaf first call: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        keys = jax.random.split(keys[0], B)
        acts = xla.search_batch(states, keys)
    acts.sum().item()
    dt_x = (time.perf_counter() - t0) / reps
    print(f"XLA guided+leaf: {dt_x * 1e3:.1f} ms / {B}-env search -> "
          f"{B / dt_x:.1f} planned actions/s", flush=True)
    print(f"speedup: {dt_x / dt_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
