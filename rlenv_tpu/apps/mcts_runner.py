"""MCTS train/test host loops.

Parity with `/root/reference/mcts_custom_trainer.py:246-491`: episode loops
driven by the MCTS planner, periodic stats pickles (every 10 episodes and
final), running 10-episode averages, and the argparse CLI — except the
planner itself is the batched device search
(:class:`rlenv_tpu.algos.mcts.MCTSPlanner`), so N episodes run in LOCKSTEP
rather than one at a time: with ``--parallel 64`` a "batch episode" plans
for 64 envs in one device call.

Run: ``python -m rlenv_tpu.apps.mcts_runner --mode train --episodes 50
--simulations 50``."""

from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import Optional

import jax
import numpy as np

from rlenv_tpu.config import EnvConfig, MCTSConfig
from rlenv_tpu.algos.mcts import MCTSPlanner
from rlenv_tpu.env.core import PlantOS


def run_mcts(n_episodes: int = 50, n_simulations: int = 50,
             grid_size: int = 25, num_plants: int = 10,
             num_obstacles: int = 12, max_depth: int = 100,
             parallel: int = 16, save_dir: Optional[str] = "mcts_models",
             render: bool = False, seed: int = 0,
             max_episode_steps: Optional[int] = None,
             fused: bool = False,
             policy_path: Optional[str] = None,
             policy_type: str = "auto",
             rollout_policy_prob: float = 0.8,
             leaf_value_mix: float = 0.0,
             puct_c: float = 0.0, puct_prior_temp: float = 50.0,
             verbose: bool = True) -> dict:
    """Plan with MCTS over batches of episodes; returns the stats dict
    (same keys as the reference pickles, `mcts_custom_trainer.py:347-353`).

    ``policy_path``: load a trained DQN/A2C checkpoint as the rollout
    prior (policy-guided rollouts; see ``MCTSPlanner.rollout_policy``).
    With ``fused`` the prior runs INSIDE the rollout kernel and the
    leaf value mixes off the kernel-emitted leaf observation (round 5);
    without it, guided search uses the XLA ``search_batch`` path."""
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    env_cfg = EnvConfig(grid_size=grid_size, num_plants=num_plants,
                        num_obstacles=num_obstacles, lidar_range=6,
                        lidar_channels=16)
    env = PlantOS(env_cfg)
    rollout_policy = None
    leaf_value = None
    rollout_policy_layers = None
    if policy_path:
        from rlenv_tpu.algos.mcts import policy_score_fn, value_score_fn
        from rlenv_tpu.apps.policies import load_policy
        runner = load_policy(policy_path, policy_type, env_cfg)
        want_prior = rollout_policy_prob > 0 and leaf_value_mix < 1
        if leaf_value_mix > 0:
            # AlphaZero-style leaf evaluation from the same checkpoint
            # (DQN: V = max_a Q; A2C: the critic head). With
            # rollout_policy_prob > 0 the rollout phase (when mix < 1)
            # is ALSO policy-guided — the two levers compose.
            leaf_value = value_score_fn(runner)
            if want_prior:
                rollout_policy = policy_score_fn(runner)
        else:
            rollout_policy = policy_score_fn(runner)
        if fused and want_prior:
            # Raw MLP stack for the in-kernel prior (round 5).
            from rlenv_tpu.ops.actor_rollout import (
                actor_critic_policy_layers, qnet_policy_layers)
            if runner.model_type == "dqn":
                rollout_policy_layers = (qnet_policy_layers(runner.params),
                                         "relu")
            else:
                rollout_policy_layers = (
                    actor_critic_policy_layers(runner.params),
                    runner.model.activation)
    planner = MCTSPlanner(env, MCTSConfig(n_simulations=n_simulations,
                                          max_depth=max_depth,
                                          max_nodes=max(n_simulations + 8,
                                                        32),
                                          rollout_policy_prob=
                                          rollout_policy_prob,
                                          leaf_value_mix=leaf_value_mix,
                                          puct_c=puct_c,
                                          puct_prior_temp=
                                          puct_prior_temp),
                          rollout_policy=rollout_policy,
                          leaf_value=leaf_value,
                          rollout_policy_layers=rollout_policy_layers)
    v_step = jax.jit(jax.vmap(env.step))
    horizon = max_episode_steps or env_cfg.max_steps

    episode_rewards, episode_lengths, exploration_percentages = [], [], []
    key = jax.random.PRNGKey(seed)
    def make_device_loop(B):
        """Whole planning EPISODE as one device program: ``horizon``
        (batched search -> env step) pairs under ``lax.scan``, stats
        accumulated on device. The per-step host round trips of the
        Python loop below (~30-40 ms each through this box's device
        tunnel — about a third of a grid-25 batch's wall-clock) vanish;
        per-step math, masking and key-splitting are identical, so the
        stats match the host loop bit-for-bit (render mode keeps the
        host loop — it needs per-step frames)."""
        import jax.numpy as jnp

        def body(carry, _):
            states, key, returns, lengths, expl, alive = carry
            key, k_search = jax.random.split(key)
            if fused:
                actions = planner.search_batch_fused(states, k_search)
            else:
                actions = planner.search_batch(
                    states, jax.random.split(k_search, B))
            states, _, rewards, term, trunc, info = v_step(states, actions)
            done = term | trunc
            returns = returns + rewards * alive
            lengths = lengths + alive.astype(jnp.int32)
            expl = jnp.where(alive, info["exploration_percentage"], expl)
            alive = alive & ~done
            return (states, key, returns, lengths, expl, alive), None

        def run(states, key):
            init = (states, key, jnp.zeros(B), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B), jnp.ones(B, bool))
            (_, key, returns, lengths, expl, _), _ = jax.lax.scan(
                body, init, None, length=horizon)
            return key, returns, lengths, expl

        return jax.jit(run)

    device_loops: dict = {}
    episodes_done = 0
    batch_idx = 0
    while episodes_done < n_episodes:
        B = min(parallel, n_episodes - episodes_done)
        batch_idx += 1
        key, k_reset = jax.random.split(key)
        states, _, _ = jax.vmap(env.reset)(jax.random.split(k_reset, B))
        t0 = time.time()
        if not render:
            if B not in device_loops:
                device_loops[B] = make_device_loop(B)
            key, d_ret, d_len, d_expl = device_loops[B](states, key)
            returns = np.asarray(d_ret)
            lengths = np.asarray(d_len)
            expl = np.asarray(d_expl)
        else:
            returns = np.zeros(B)
            lengths = np.zeros(B, dtype=int)
            expl = np.zeros(B)
            alive = np.ones(B, dtype=bool)
            for step in range(horizon):
                key, k_search = jax.random.split(key)
                if fused:
                    # Packed-state search with the rollout phase as one
                    # Pallas program per simulation (`algos/mcts.py`).
                    actions = planner.search_batch_fused(states, k_search)
                else:
                    actions = planner.search_batch(
                        states, jax.random.split(k_search, B))
                states, _, rewards, term, trunc, info = v_step(states,
                                                               actions)
                done = np.asarray(term | trunc)
                r = np.asarray(rewards)
                e = np.asarray(info["exploration_percentage"])
                returns += r * alive
                lengths += alive
                expl = np.where(alive, e, expl)
                alive &= ~done
                from rlenv_tpu.render.render2d import render_frame
                render_frame(jax.tree.map(lambda x: x[0], states),
                             env_cfg.lidar_channels, env_cfg.lidar_range)
                if not alive.any():
                    break
        episode_rewards += list(returns)
        episode_lengths += list(lengths)
        exploration_percentages += list(expl)
        episodes_done += B
        if verbose:
            print(f"Batch {batch_idx}: {B} episodes in "
                  f"{time.time() - t0:.1f}s | "
                  f"avg reward {returns.mean():.2f} | "
                  f"avg exploration {expl.mean():.2f}% | "
                  f"episodes {episodes_done}/{n_episodes}", flush=True)
        stats = {
            "episode_rewards": episode_rewards,
            "episode_lengths": episode_lengths,
            "exploration_percentages": exploration_percentages,
            "n_simulations": n_simulations,
            "grid_size": grid_size,
        }
        if save_dir and (episodes_done % 10 == 0
                         or episodes_done >= n_episodes):
            path = os.path.join(save_dir,
                                f"mcts_stats_ep{episodes_done}.pkl")
            with open(path, "wb") as f:
                pickle.dump(stats, f)

    if save_dir:
        with open(os.path.join(save_dir, "mcts_stats_final.pkl"),
                  "wb") as f:
            pickle.dump(stats, f)
    if verbose:
        print("=" * 60)
        print("MCTS RUN COMPLETE")
        print(f"Total Episodes: {len(episode_rewards)}")
        print(f"Average Reward: {np.mean(episode_rewards):.2f} ± "
              f"{np.std(episode_rewards):.2f}")
        print(f"Average Exploration: "
              f"{np.mean(exploration_percentages):.2f}% ± "
              f"{np.std(exploration_percentages):.2f}%")
        print(f"Average Episode Length: {np.mean(episode_lengths):.1f}")
    return stats


def main() -> None:
    parser = argparse.ArgumentParser(description="MCTS Runner for PlantOS")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "test"])
    parser.add_argument("--episodes", type=int, default=50)
    parser.add_argument("--simulations", type=int, default=50)
    parser.add_argument("--grid-size", type=int, default=25)
    parser.add_argument("--plants", type=int, default=10)
    parser.add_argument("--obstacles", type=int, default=12)
    parser.add_argument("--parallel", type=int, default=16)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="Use the Pallas fused search path (TPU)")
    parser.add_argument("--policy", type=str, default=None,
                        help="Trained DQN/A2C checkpoint as rollout prior")
    parser.add_argument("--policy-type", type=str, default="auto")
    parser.add_argument("--policy-prob", type=float, default=0.8,
                        help="Per-step probability of the prior's action")
    parser.add_argument("--leaf-value-mix", type=float, default=0.0,
                        help="AlphaZero-style leaf evaluation: backup = "
                             "(1-mix)*rollout + mix*V(leaf) from the "
                             "--policy checkpoint's critic; 1.0 skips "
                             "rollouts entirely")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-depth", type=int, default=100,
                        help="tree+rollout depth cap per simulation "
                             "(the reference's max_depth)")
    parser.add_argument("--puct-c", type=float, default=0.0,
                        help="AlphaZero-style PUCT selection with the "
                             "--policy prior (fused search; 0 = UCB1)")
    parser.add_argument("--puct-temp", type=float, default=50.0,
                        help="softmax temperature for the PUCT prior "
                             "(Q-values are return-scale; T >> 1)")
    args = parser.parse_args()
    run_mcts(n_episodes=args.episodes, n_simulations=args.simulations,
             grid_size=args.grid_size, num_plants=args.plants,
             num_obstacles=args.obstacles, max_depth=args.max_depth,
             parallel=args.parallel,
             render=args.render, fused=args.fused,
             policy_path=args.policy, policy_type=args.policy_type,
             rollout_policy_prob=args.policy_prob,
             leaf_value_mix=args.leaf_value_mix, seed=args.seed,
             puct_c=args.puct_c, puct_prior_temp=args.puct_temp,
             save_dir="mcts_models" if args.mode == "train" else None)


if __name__ == "__main__":
    main()
