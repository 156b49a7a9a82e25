"""Unified training/testing CLI.

Replaces the reference's three entry styles — interactive input() menus
(`/root/reference/trainingCode.py:461-522`), the A2C argparse CLI
(`A2C_training.py:423-467`), and the MCTS CLI
(`mcts_custom_trainer.py:454-491`) — with one argparse front-end over the
config tree.

Examples:
  python -m rlenv_tpu.apps.cli train --algo a2c --timesteps 100000 \
      --envs 64 --curriculum
  python -m rlenv_tpu.apps.cli train --algo dqn --timesteps 10000000
  python -m rlenv_tpu.apps.cli test --model-path logs/train/models/a2c_final
  python -m rlenv_tpu.apps.cli mcts --episodes 50 --simulations 50
"""

from __future__ import annotations

import argparse

from rlenv_tpu.config import CurriculumConfig, EnvConfig


def _add_env_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--grid-size", type=int, default=25)
    p.add_argument("--plants", type=int, default=10)
    p.add_argument("--obstacles", type=int, default=12)
    p.add_argument("--lidar-range", type=int, default=6)
    p.add_argument("--lidar-channels", type=int, default=16)
    p.add_argument("--map-algo", type=str, default="original",
                   choices=["original", "maze"])
    p.add_argument("--reward-set", type=str, default="dqn",
                   choices=["dqn", "a2c", "ppo"],
                   help="Reward constants: the active DQN-tuned set or the "
                        "reference's commented A2C/RecurrentPPO-tuned sets "
                        "(plantos_env_new.py:67-95)")


def _env_config(args) -> EnvConfig:
    from rlenv_tpu.config import RewardConfig
    rewards = {"dqn": RewardConfig.dqn, "a2c": RewardConfig.a2c,
               "ppo": RewardConfig.recurrent_ppo}[args.reward_set]()
    return EnvConfig(grid_size=args.grid_size, num_plants=args.plants,
                     num_obstacles=args.obstacles,
                     lidar_range=args.lidar_range,
                     lidar_channels=args.lidar_channels,
                     map_generation_algo=args.map_algo,
                     rewards=rewards)


def _int_or(text: str, default: int) -> int:
    """Parse menu input, falling back to the documented default on
    empty/non-numeric input (the reference menu crashes here)."""
    try:
        return int(text)
    except (TypeError, ValueError):
        if text:
            print(f"  (not a number — using default {default})")
        return default


def _interactive_menu() -> None:
    """Prompt-driven front-end over the same trainers the argparse path
    uses — the third entry style of the reference
    (`/root/reference/trainingCode.py:461-522`)."""
    bar = "=" * 60
    print(f"\n{bar}\nGROW-R / PlantOS Training & Testing\n{bar}")
    print("\nChoose an option:")
    print("1. Train with Recurrent PPO (LSTM)")
    print("2. Train with DQN")
    print("3. Train with A2C")
    print("4. Test existing model")
    choice = input("\nEnter choice (1-4): ").strip()

    if choice == "4":
        path = input("\nModel path (checkpoint dir or SB3 .zip): ").strip()
        import os
        if not (os.path.exists(path) or os.path.exists(path + ".zip")):
            print(f"Error: model '{path}' not found.")
            return
        eps = input("Number of test episodes (default: 3): ").strip()
        from rlenv_tpu.apps.example_usage import main as run_test
        run_test(model_path=path, model_type="auto",
                 episodes=_int_or(eps, 3), render="rgb_array",
                 step_delay=0.0)
        print(f"\n{bar}\nTesting complete!\n{bar}")
    elif choice in ("1", "2", "3"):
        algo = {"1": "ppo", "2": "dqn", "3": "a2c"}[choice]
        envs = input("\nNumber of parallel environments (default: 64): "
                     ).strip()
        steps = input("Total timesteps (default: 100000): ").strip()
        from rlenv_tpu.train.trainer import train
        curriculum = (CurriculumConfig.a2c() if algo == "a2c"
                      else CurriculumConfig.ppo_dqn())
        train(algo=algo, total_timesteps=_int_or(steps, 100_000),
              n_envs=_int_or(envs, 64), use_curriculum=True,
              env_config=EnvConfig.training(),
              curriculum_config=curriculum, log_dir=f"logs/{algo}")
        print(f"\n{bar}\nTraining complete!\n{bar}")
    else:
        print("Invalid choice. Exiting.")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="rlenv_tpu", description="TPU-native PlantOS/GROW-R trainer")
    sub = parser.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="Train a policy")
    t.add_argument("--algo", type=str, default="a2c",
                   choices=["a2c", "dqn", "ppo"])
    t.add_argument("--timesteps", type=int, default=100_000)
    t.add_argument("--envs", type=int, default=64)
    t.add_argument("--curriculum", action="store_true")
    t.add_argument("--log-dir", type=str, default=None)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--fused", action="store_true", default=None,
                   help="Force the fused Pallas env kernel "
                        "(rlenv_tpu/ops/fused_step.py). Default: auto — "
                        "fused on TPU, XLA elsewhere (bit-identical)")
    t.add_argument("--no-fused", dest="fused", action="store_false",
                   help="Force the XLA env path (verification mode)")
    _add_env_args(t)

    e = sub.add_parser("test", help="Run a trained model with rendering")
    e.add_argument("--model-path", type=str, required=True)
    e.add_argument("--model-type", type=str, default="auto",
                   choices=["auto", "dqn", "ppo", "a2c"])
    e.add_argument("--episodes", type=int, default=5)
    e.add_argument("--render", type=str, default="rgb_array",
                   choices=["human", "rgb_array", "none"])

    m = sub.add_parser("mcts", help="Run the MCTS planner")
    m.add_argument("--episodes", type=int, default=50)
    m.add_argument("--simulations", type=int, default=50)
    m.add_argument("--parallel", type=int, default=16)
    _add_env_args(m)

    b = sub.add_parser("bench", help="Run the throughput benchmark")

    sub.add_parser("menu", help="Interactive prompt-driven entry "
                                "(the reference's input() menu style, "
                                "trainingCode.py:461-522)")

    args = parser.parse_args(argv)

    if args.command == "menu":
        return _interactive_menu()

    if args.command == "train":
        from rlenv_tpu.train.trainer import train
        curriculum = (CurriculumConfig.a2c() if args.algo == "a2c"
                      else CurriculumConfig.ppo_dqn())
        train(algo=args.algo, total_timesteps=args.timesteps,
              n_envs=args.envs, use_curriculum=args.curriculum,
              env_config=_env_config(args),
              curriculum_config=curriculum,
              log_dir=args.log_dir or f"logs/{args.algo}",
              seed=args.seed, resume=args.resume, fused=args.fused)
    elif args.command == "test":
        from rlenv_tpu.apps.example_usage import main as run_test
        run_test(model_path=args.model_path, model_type=args.model_type,
                 episodes=args.episodes, render=args.render,
                 step_delay=0.0)
    elif args.command == "mcts":
        from rlenv_tpu.apps.mcts_runner import run_mcts
        run_mcts(n_episodes=args.episodes, n_simulations=args.simulations,
                 grid_size=args.grid_size, num_plants=args.plants,
                 num_obstacles=args.obstacles, parallel=args.parallel)
    elif args.command == "bench":
        import runpy
        runpy.run_path("bench.py", run_name="__main__")


if __name__ == "__main__":
    main()
