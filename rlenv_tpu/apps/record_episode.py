"""Episode video/GIF recorder.

The reference ships a demo rollout video (`/root/reference/episode.mp4`);
this produces the same artifact from any policy (trained checkpoint,
'random', or 'mcts') using the rgb_array renderer — written as an animated
GIF via PIL (no ffmpeg in this image).

Run: ``python -m rlenv_tpu.apps.record_episode out.gif
[--model-path P | --policy random|mcts] [--steps N]``."""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import numpy as np

from rlenv_tpu.config import EnvConfig, MCTSConfig


def record_episode(out_path: str, policy: str = "random",
                   model_path: Optional[str] = None,
                   env_config: Optional[EnvConfig] = None,
                   max_steps: int = 300, fps: int = 15,
                   frame_stride: int = 2, seed: int = 0,
                   cell_size: int = 20,
                   assets_dir: Optional[str] = None) -> dict:
    """Roll one episode and write an animated GIF; returns episode stats.

    ``assets_dir`` enables the textured-sprite pass: the directory is
    searched (then its parent) for the reference's five texture files —
    pass ``/root/reference/assets`` to render with the reference's shipped
    sprites (`plantos_env_new.py:650-695`)."""
    from PIL import Image

    from rlenv_tpu.env.core import PlantOS
    from rlenv_tpu.render.render2d import render_frame
    from rlenv_tpu.render.assets import load_assets

    assets = load_assets(assets_dir, cell_size) if assets_dir else None
    cfg = env_config or EnvConfig.training()
    env = PlantOS(cfg)
    step = jax.jit(env.step)
    state, obs, info = env.reset(jax.random.PRNGKey(seed))

    actor = None
    planner = None
    if policy == "mcts":
        from rlenv_tpu.algos.mcts import MCTSPlanner
        planner = MCTSPlanner(env, MCTSConfig(n_simulations=32,
                                              max_depth=30, max_nodes=48))
    elif model_path is not None:
        from rlenv_tpu.apps.policies import load_policy
        actor = load_policy(model_path, policy if policy != "random"
                            else "auto", cfg)
        actor.reset_state(1)

    frames = []
    total_reward = 0.0
    key = jax.random.PRNGKey(seed + 1)
    episode_start = True
    for t in range(max_steps):
        if t % frame_stride == 0:
            frames.append(Image.fromarray(render_frame(
                state, cfg.lidar_channels, cfg.lidar_range,
                cell_size=cell_size, assets=assets)))
        key, k = jax.random.split(key)
        if planner is not None:
            batched = jax.tree.map(lambda x: x[None], state)
            action = int(planner.search_batch(batched, k[None])[0])
        elif actor is not None:
            action = int(actor.act(np.asarray(obs),
                                   episode_start=episode_start))
        else:
            action = int(jax.random.randint(k, (), 0, 5))
        episode_start = False
        state, obs, reward, term, trunc, info = step(state, action)
        total_reward += float(reward)
        if bool(term) or bool(trunc):
            frames.append(Image.fromarray(render_frame(
                state, cfg.lidar_channels, cfg.lidar_range,
                cell_size=cell_size, assets=assets)))
            break

    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    stats = dict(steps=t + 1, total_reward=round(total_reward, 2),
                 exploration=round(float(info["exploration_percentage"]), 2),
                 frames=len(frames), path=out_path)
    print(stats)
    return stats


def main() -> None:
    p = argparse.ArgumentParser(description="Record a PlantOS episode GIF")
    p.add_argument("out", type=str)
    p.add_argument("--policy", type=str, default="random",
                   choices=["random", "mcts", "auto", "dqn", "ppo", "a2c"])
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--assets-dir", type=str, default=None,
                   help="Texture directory (e.g. /root/reference/assets)")
    args = p.parse_args()
    record_episode(args.out, policy=args.policy, model_path=args.model_path,
                   max_steps=args.steps, seed=args.seed,
                   assets_dir=args.assets_dir)


if __name__ == "__main__":
    main()
