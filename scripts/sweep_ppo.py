"""RecurrentPPO exploration sweep — bounding (or closing) the gap to the
reference's claimed "~84% avg exploration" (`plantos_env.py:85`: 3M steps,
curriculum, 128 n_env, ~120 min).

Round 3 had exactly two data points (65.4% run-mean at 256-step BPTT,
60.6% at the reference-exact 1024) and no bounding argument, because runs
cost 32-44 min. The round-4 chunked-BPTT path runs 3M steps in ~7 min, so
this sweeps the documented levers the way the A2C sweep did
(`scripts/sweep_a2c.py`): BPTT horizon, minibatch size, entropy
coefficient, reward preset, curriculum variant (the A2C wrapper's
terminate-on-threshold turns over episodes much faster — the A2C sweep's
key finding was that the per-env threshold ladder needs EPISODES to
climb, and 3M steps / 128 envs is only ~23 episodes per env), compute
dtype, seeds, and longer step budgets. One JSON line per config to
runs/ppo_sweep/summary.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import train

N_ENVS = int(os.environ.get("SWEEP_ENVS", 128))
OUT = os.environ.get("SWEEP_OUT", "runs/ppo_sweep")

_BASE = dict(bptt_chunk=128, compute_dtype="bfloat16", remat=False)


def _ppo(**kw):
    d = dict(_BASE)
    d.update(kw)
    return d


CONFIGS = {
    # name: (reward preset, curriculum preset, ppo config overrides
    #        [, extra train() kwargs])
    # reference-exact horizon, the r4 flagship (already run standalone;
    # kept here so the summary holds every cell)
    "n1024_b16384": (RewardConfig.recurrent_ppo, CurriculumConfig.ppo_dqn,
                     _ppo(n_steps=1024, batch_size=16384)),
    # round-3's best-quality horizon on the fast path
    "n256_b4096": (RewardConfig.recurrent_ppo, CurriculumConfig.ppo_dqn,
                   _ppo(n_steps=256, batch_size=4096)),
    # episode-turnover lever: A2C curriculum variant ends episodes at the
    # threshold -> many more episodes -> the ladder can climb
    "n256_b4096_a2ccur": (RewardConfig.recurrent_ppo, CurriculumConfig.a2c,
                          _ppo(n_steps=256, batch_size=4096)),
    "n1024_b16384_a2ccur": (RewardConfig.recurrent_ppo,
                            CurriculumConfig.a2c,
                            _ppo(n_steps=1024, batch_size=16384)),
    # entropy and reward-preset levers
    "n256_b4096_ent05": (RewardConfig.recurrent_ppo,
                         CurriculumConfig.ppo_dqn,
                         _ppo(n_steps=256, batch_size=4096,
                              ent_coef=0.05)),
    "n256_b4096_dqnrew": (RewardConfig.dqn, CurriculumConfig.ppo_dqn,
                          _ppo(n_steps=256, batch_size=4096)),
    # dtype check: does bf16 cost quality?
    "n256_b4096_f32": (RewardConfig.recurrent_ppo, CurriculumConfig.ppo_dqn,
                       _ppo(n_steps=256, batch_size=4096,
                            compute_dtype="float32")),
    # seed replicas of the base cell
    "n256_b4096_seed1": (RewardConfig.recurrent_ppo,
                         CurriculumConfig.ppo_dqn,
                         _ppo(n_steps=256, batch_size=4096), {"seed": 1}),
    # geometry: 64-step chunks, 128-sequence minibatches (full MXU tile,
    # ~4x the update throughput of n256_b4096) at the same total data
    "n256_c64_b8192": (RewardConfig.recurrent_ppo, CurriculumConfig.ppo_dqn,
                       _ppo(n_steps=256, bptt_chunk=64, batch_size=8192)),
    "n256_c64_b8192_a2ccur": (RewardConfig.recurrent_ppo,
                              CurriculumConfig.a2c,
                              _ppo(n_steps=256, bptt_chunk=64,
                                   batch_size=8192)),
    "n1024_b16384_a2ccur_bis": (RewardConfig.recurrent_ppo,
                                CurriculumConfig.a2c,
                                _ppo(n_steps=1024, batch_size=16384)),
    # late-decay counter-lever: linear lr anneal to 10%
    "n256_b4096_lrdecay": (RewardConfig.recurrent_ppo,
                           CurriculumConfig.ppo_dqn,
                           _ppo(n_steps=256, batch_size=4096,
                                lr_final_scale=0.1)),
    "n256_b4096_a2ccur_lrdecay": (RewardConfig.recurrent_ppo,
                                  CurriculumConfig.a2c,
                                  _ppo(n_steps=256, batch_size=4096,
                                       lr_final_scale=0.1)),
    # step-budget ceiling probes (the A2C sweep's decisive axis)
    "n256_b4096_9m": (RewardConfig.recurrent_ppo, CurriculumConfig.ppo_dqn,
                      _ppo(n_steps=256, batch_size=4096),
                      {"total_timesteps": 9_000_000}),
    "n256_b4096_a2ccur_9m": (RewardConfig.recurrent_ppo,
                             CurriculumConfig.a2c,
                             _ppo(n_steps=256, batch_size=4096),
                             {"total_timesteps": 9_000_000}),
    # -- round 5: re-baseline after the SB3 timeout-bootstrap fix (PPO now
    # bootstraps gamma*V(terminal_obs) on truncation — value targets
    # changed) and the cast_params_once speed lever (13.4k steps/s at the
    # flagship config, up from 9.6k; profile logs in RESULTS.md).
    "n1024_b16384_r5": (RewardConfig.recurrent_ppo, CurriculumConfig.ppo_dqn,
                        _ppo(n_steps=1024, batch_size=16384)),
    "n1024_b16384_a2ccur_r5": (RewardConfig.recurrent_ppo,
                               CurriculumConfig.a2c,
                               _ppo(n_steps=1024, batch_size=16384)),
    # speed frontier: M=256-sequence minibatches halve the update's serial
    # BPTT steps (weight traffic dominates; see the round-5 roofline)
    "n1024_b32768_a2ccur_r5": (RewardConfig.recurrent_ppo,
                               CurriculumConfig.a2c,
                               _ppo(n_steps=1024, batch_size=32768)),
    # A/B for cast_params_once: f32 in-scan weights + f32 grad
    # accumulation (the round-4 numerics) at the new-semantics baseline
    "n1024_b16384_a2ccur_f32cast": (RewardConfig.recurrent_ppo,
                                    CurriculumConfig.a2c,
                                    _ppo(n_steps=1024, batch_size=16384,
                                         cast_params_once=False)),
    # -- round 5: the 30M asymptote run (VERDICT #3) — the best config at
    # full speed, measured to saturation like the A2C 50M/200M table
    "n1024_b16384_a2ccur_30m": (RewardConfig.recurrent_ppo,
                                CurriculumConfig.a2c,
                                _ppo(n_steps=1024, batch_size=16384),
                                {"total_timesteps": 30_000_000}),
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
        algo_config = dataclasses.replace(RecurrentPPOConfig(), **overrides)
        log_dir = os.path.join(OUT, name)
        t0 = time.time()
        kwargs = dict(total_timesteps=3_000_000, seed=0)
        kwargs.update(extra)
        try:
            _, result = train(
                algo="ppo", n_envs=N_ENVS,
                use_curriculum=True, env_config=env_config,
                algo_config=algo_config, curriculum_config=cur_fn(),
                log_dir=log_dir, iterations_per_chunk=1,
                eval_interval=1_000_000, n_eval_episodes=16,
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
