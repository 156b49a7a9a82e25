"""A2C exploration sweep — closing (or bounding) the gap to the
reference's claimed "~87% avg exploration" (`plantos_env.py:65`:
10M steps, curriculum, 512 n_env).

Round-2 A2C runs landed at 55-60% mean exploration. This sweeps the
documented levers over full-scale 10M-step 512-env runs (each ~2-4 min on
one chip): reward preset, curriculum variant (the A2C wrapper terminates
on threshold; thresholds 40 +10 -> 100, 3 episodes/maze,
`A2C_training.py:37-109`), entropy coefficient, n_steps, and
fresh-map-each-reset. Writes one JSON line per config to
runs/a2c_sweep/summary.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

from rlenv_tpu.config import (A2CConfig, CurriculumConfig, EnvConfig,
                              RewardConfig)
from rlenv_tpu.train.trainer import train

TOTAL = int(os.environ.get("SWEEP_TIMESTEPS", 10_000_000))
N_ENVS = int(os.environ.get("SWEEP_ENVS", 512))
OUT = os.environ.get("SWEEP_OUT", "runs/a2c_sweep")

CONFIGS = {
    # name: (reward preset, curriculum preset, a2c config overrides
    #        [, extra train() kwargs])
    "a2crew_a2ccur": (RewardConfig.a2c, CurriculumConfig.a2c, {}),
    "a2crew_pdcur": (RewardConfig.a2c, CurriculumConfig.ppo_dqn, {}),
    "dqnrew_a2ccur": (RewardConfig.dqn, CurriculumConfig.a2c, {}),
    "dqnrew_pdcur": (RewardConfig.dqn, CurriculumConfig.ppo_dqn, {}),
    "dqnrew_a2ccur_ent05": (RewardConfig.dqn, CurriculumConfig.a2c,
                            {"ent_coef": 0.05}),
    "dqnrew_a2ccur_n16": (RewardConfig.dqn, CurriculumConfig.a2c,
                          {"n_steps": 16}),
    "a2crew_a2ccur_ent05": (RewardConfig.a2c, CurriculumConfig.a2c,
                            {"ent_coef": 0.05}),
    "dqnrew_a2ccur_fresh": (RewardConfig.dqn,
                            lambda: dataclasses.replace(
                                CurriculumConfig.a2c(),
                                fresh_map_each_reset=True), {}),
    # -- stage 2: is 50-59% a step-count ceiling or a capability ceiling?
    # (50M answered: step count — 68.8% mean / 73.9% tail vs 54/59 at 10M;
    # the per-env threshold ladder needs episodes to climb)
    "dqnrew_a2ccur_50m": (RewardConfig.dqn, CurriculumConfig.a2c, {},
                          {"total_timesteps": 50_000_000}),
    "dqnrew_a2ccur_200m": (RewardConfig.dqn, CurriculumConfig.a2c, {},
                           {"total_timesteps": 200_000_000}),
    "dqnrew_a2ccur_seed1": (RewardConfig.dqn, CurriculumConfig.a2c, {},
                            {"seed": 1}),
    "dqnrew_a2ccur_seed2": (RewardConfig.dqn, CurriculumConfig.a2c, {},
                            {"seed": 2}),
    # bigger net (the reference's DQN-sized tower) + lower lr
    "dqnrew_a2ccur_big": (RewardConfig.dqn, CurriculumConfig.a2c,
                          {"hidden_sizes": (512, 512, 256),
                           "learning_rate": 3e-4}),
    # longer bootstrap horizon with more entropy
    "dqnrew_a2ccur_n32_ent05": (RewardConfig.dqn, CurriculumConfig.a2c,
                                {"n_steps": 32, "ent_coef": 0.05}),
    # -- round 5: re-baseline of the best cell after the Monitor-parity
    # fix (episode stats now log RAW env rewards, not the
    # timeout-bootstrapped training reward; the GAE math is bit-identical
    # via the deferred batched bootstrap forward). The return column drops
    # by ~gamma*V(s_T) per episode relative to earlier rounds; exploration
    # is unaffected.
    "dqnrew_a2ccur_r5": (RewardConfig.dqn, CurriculumConfig.a2c, {}),
}


def tail_exploration(log_dir: str, frac: float = 0.2) -> float:
    """Mean final-episode exploration over the last `frac` of episodes."""
    path = os.path.join(log_dir, "env_all.monitor.csv")
    expl = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or line.startswith("r,"):
                continue
            parts = line.strip().split(",")
            if len(parts) >= 4:
                expl.append(float(parts[3]))
    if not expl:
        return float("nan")
    k = max(int(len(expl) * frac), 1)
    return float(np.mean(expl[-k:]))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    summary_path = os.path.join(OUT, "summary.jsonl")
    done = set()
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            done = {json.loads(line)["name"] for line in f if line.strip()}

    only = sys.argv[1:] or list(CONFIGS)
    for name in only:
        if name in done:
            print(f"[sweep] {name}: already done, skipping", flush=True)
            continue
        spec = CONFIGS[name]
        rewards_fn, cur_fn, overrides = spec[:3]
        extra = dict(spec[3]) if len(spec) > 3 else {}
        env_config = EnvConfig.training(rewards=rewards_fn())
        algo_config = dataclasses.replace(A2CConfig(), **overrides)
        log_dir = os.path.join(OUT, name)
        t0 = time.time()
        kwargs = dict(total_timesteps=TOTAL, seed=0)
        kwargs.update(extra)
        try:
            _, result = train(
                algo="a2c", n_envs=N_ENVS,
                use_curriculum=True, env_config=env_config,
                algo_config=algo_config, curriculum_config=cur_fn(),
                log_dir=log_dir, iterations_per_chunk=64,
                plot=False, verbose=False, **kwargs)
        except Exception as e:
            print(f"[sweep] {name}: FAILED {e!r}", flush=True)
            continue
        row = {
            "name": name,
            "timesteps": result.timesteps,
            "episodes": result.episodes,
            "mean_return": round(result.mean_return, 1),
            "mean_exploration": round(result.mean_exploration, 2),
            "tail20_exploration": (lambda t: None if np.isnan(t)
                                   else round(t, 2))(tail_exploration(log_dir)),
            "wall_seconds": round(time.time() - t0, 1),
            "steps_per_sec": round(result.steps_per_sec, 0),
        }
        with open(summary_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[sweep] {json.dumps(row)}", flush=True)


if __name__ == "__main__":
    main()
