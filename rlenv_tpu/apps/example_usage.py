"""CLI inference runner.

Parity with `/root/reference/example_usage.py`: load a trained model
(explicit ``--model-type`` or filename auto-detect), run episodes in the
grid-25 inference config with rendering, print per-episode summaries, loop
until Ctrl-C, then report the average reward.

Run: ``python -m rlenv_tpu.apps.example_usage <model_path>
[--model-type auto|dqn|ppo|a2c] [--render human|rgb_array|none]
[--episodes N]``."""

from __future__ import annotations

import argparse
import time

import numpy as np

from rlenv_tpu.env.gym_compat import PlantOSGymEnv
from rlenv_tpu.apps.policies import load_policy


def main(model_path: str, model_type: str = "auto",
         max_steps_per_episode: int = 1000, render: str = "human",
         episodes: int = 0, step_delay: float = 0.05) -> None:
    print("Starting PlantOS Environment with 2D and 3D Views")
    print("=" * 60)

    # Default inference config mirrors `example_usage.py:34` (grid 25,
    # LIDAR 16x6); when the checkpoint carries its training env config in
    # the metadata sidecar, that wins — the obs contract must match the
    # network's input layer.
    from rlenv_tpu.config import RewardConfig
    from rlenv_tpu.train.checkpoint import load_metadata
    env_kwargs = dict(grid_size=25, num_plants=10, num_obstacles=20,
                      lidar_range=6, lidar_channels=16)
    meta = load_metadata(model_path) or {}
    env_meta = meta.get("env_config")
    rewards = None
    if env_meta:
        rewards = RewardConfig(**env_meta.pop("rewards", {}))
        env_meta.pop("visit_map_size", None)
        env_meta.pop("max_steps", None)
        env_kwargs.update(
            {k: v for k, v in env_meta.items()
             if k in ("grid_size", "num_plants", "num_obstacles",
                      "lidar_range", "lidar_channels",
                      "thirsty_plant_prob", "map_generation_algo")})
    env = PlantOSGymEnv(**env_kwargs, rewards=rewards,
                        render_mode=None if render == "none" else render)
    try:
        policy = load_policy(model_path, model_type, env.config)
    except ValueError as e:
        print(f"  {e}")
        return
    print(f" Model loaded successfully ({policy.model_type.upper()})")

    total_rewards = []
    try:
        episode = 0
        while episodes <= 0 or episode < episodes:
            episode += 1
            print(f"\nEpisode {episode}")
            print("-" * 30)
            obs, info = env.reset()
            policy.reset_state(1)
            episode_reward = 0.0
            episode_start = True
            for step in range(max_steps_per_episode):
                action = policy.act(obs, episode_start=episode_start,
                                    deterministic=True)
                episode_start = False
                obs, reward, terminated, truncated, info = env.step(
                    int(action))
                episode_reward += reward
                env.render()
                if terminated or truncated:
                    break
                if step_delay:
                    time.sleep(step_delay)
            print(f"\nEpisode {episode} finished after {step + 1} steps")
            print(f"Total episode reward: {episode_reward:.2f}")
            print(f"Exploration: {info['exploration_percentage']:.1f}%")
            print(f"Final thirsty plants: {info['thirsty_plants']}")
            total_rewards.append(episode_reward)
    except KeyboardInterrupt:
        print("\n  Environment interrupted by user")
    finally:
        env.close()
        if total_rewards:
            print("\n" + "=" * 60)
            print(" FINAL SUMMARY")
            print("=" * 60)
            print(f"Episodes completed: {len(total_rewards)}")
            print(f"Average reward: {np.mean(total_rewards):.2f}")
        print("Environment closed successfully!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Run a trained agent in the PlantOS environment.")
    parser.add_argument("model_path", type=str,
                        help="Path to the trained model checkpoint")
    parser.add_argument("--model-type", type=str, default="auto",
                        choices=["auto", "dqn", "ppo", "a2c"],
                        help="Model type (auto-detect from filename)")
    parser.add_argument("--render", type=str, default="human",
                        choices=["human", "rgb_array", "none"])
    parser.add_argument("--episodes", type=int, default=0,
                        help="Number of episodes (0 = run until Ctrl-C)")
    args = parser.parse_args()
    main(model_path=args.model_path, model_type=args.model_type,
         render=args.render, episodes=args.episodes)
