"""DQN late-run stability sweep — making final ≈ best.

The reference claims "~97% avg exploration" for DQN
(`/root/reference/plantos_env.py:75`); our runs MATCH that at the 6-8M
peak (97.4% window exploration, +5329 train return) but the policy decays
at the epsilon floor (final-window ~62-75%), so round 3 relied on
best-model capture. Runs now cost ~30-45 s, so this sweeps the
stabilizers: lr decay after the floor, n-step returns, epsilon floor,
slower anneal, target cadence, double-Q combinations. One JSON line per
config to runs/dqn_stability/summary.jsonl, including the FINAL-QUARTER
mean episode exploration (the quantity that should reach >=90%) and the
final-model vs best-model eval gap.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

from rlenv_tpu.config import (CurriculumConfig, DQNConfig, EnvConfig,
                              RewardConfig)
from rlenv_tpu.train.trainer import train

TOTAL = int(os.environ.get("SWEEP_TIMESTEPS", 10_000_000))
N_ENVS = int(os.environ.get("SWEEP_ENVS", 512))
OUT = os.environ.get("SWEEP_OUT", "runs/dqn_stability")

CONFIGS = {
    "base": {},
    # decay lr to 10% over the last 30% (after the eps floor at 70%)
    "lrdecay": {"lr_decay_start_fraction": 0.7},
    "lrdecay_deep": {"lr_decay_start_fraction": 0.7,
                     "lr_final_scale": 0.01},
    # n-step returns sharpen credit through the dense penalties
    "n3": {"n_step": 3},
    "n5": {"n_step": 5},
    # epsilon floor: less forced exploration noise late
    "eps01": {"exploration_final_eps": 0.01},
    "eps01_lrdecay": {"exploration_final_eps": 0.01,
                      "lr_decay_start_fraction": 0.7},
    # slower anneal: the floor arrives at 90% instead of 70%
    "anneal09": {"exploration_fraction": 0.9},
    # steadier targets late
    "target20k": {"target_update_interval": 20_000},
    # known-good opt-in from round 3, now combined
    "double": {"double_q": True},
    "double_lrdecay": {"double_q": True,
                       "lr_decay_start_fraction": 0.7},
    "double_n3_lrdecay": {"double_q": True, "n_step": 3,
                          "lr_decay_start_fraction": 0.7},
    "n3_lrdecay_eps01": {"n_step": 3, "lr_decay_start_fraction": 0.7,
                         "exploration_final_eps": 0.01},
    # -- stage 2: combinations of the winning single levers (anneal09
    # 85.0 / eps01 84.3 / double_lrdecay 83.6 / target20k 81.4 final-
    # quarter exploration vs base 78.8)
    "anneal09_eps01": {"exploration_fraction": 0.9,
                       "exploration_final_eps": 0.01},
    "anneal09_eps01_double": {"exploration_fraction": 0.9,
                              "exploration_final_eps": 0.01,
                              "double_q": True},
    "anneal09_eps01_t20k": {"exploration_fraction": 0.9,
                            "exploration_final_eps": 0.01,
                            "target_update_interval": 20_000},
    "anneal09_eps01_double_t20k": {"exploration_fraction": 0.9,
                                   "exploration_final_eps": 0.01,
                                   "double_q": True,
                                   "target_update_interval": 20_000},
    # -- stage 3: the ~87% combo plateau — more anneal / more budget
    "anneal10_eps01_double": {"exploration_fraction": 1.0,
                              "exploration_final_eps": 0.01,
                              "double_q": True},
    # -- stage 4 (round 5): the 20M collapse. Round 4 measured the best
    # 10M combo COLLAPSING past ~12M at 2x budget (final-quarter 14.6%,
    # Q-divergence). "_total" overrides the step budget per cell. Levers:
    # lr anneal GATED ON THE POST-eps-FLOOR PHASE (the floor lands at 90%
    # of training with anneal09 — round 4 only tried whole-run decay),
    # slower/harder target updates at scale, and TD-target clipping
    # (DQNConfig.td_target_clip, round-5 knob: target drift rate-limited
    # to +-clip per update).
    "20m_lrgate": {"_total": 20_000_000, "exploration_fraction": 0.9,
                   "exploration_final_eps": 0.01, "double_q": True,
                   "lr_decay_start_fraction": 0.9},
    "20m_lrgate_deep": {"_total": 20_000_000, "exploration_fraction": 0.9,
                        "exploration_final_eps": 0.01, "double_q": True,
                        "lr_decay_start_fraction": 0.9,
                        "lr_final_scale": 0.01},
    "20m_t50k": {"_total": 20_000_000, "exploration_fraction": 0.9,
                 "exploration_final_eps": 0.01, "double_q": True,
                 "target_update_interval": 50_000},
    "20m_clip50": {"_total": 20_000_000, "exploration_fraction": 0.9,
                   "exploration_final_eps": 0.01, "double_q": True,
                   "td_target_clip": 50.0},
    "20m_clip10": {"_total": 20_000_000, "exploration_fraction": 0.9,
                   "exploration_final_eps": 0.01, "double_q": True,
                   "td_target_clip": 10.0},
    "20m_clip50_lrgate": {"_total": 20_000_000,
                          "exploration_fraction": 0.9,
                          "exploration_final_eps": 0.01, "double_q": True,
                          "td_target_clip": 50.0,
                          "lr_decay_start_fraction": 0.9},
    # -- stage 5: target-update cadence is the measured lever (t50k:
    # final-quarter 58.2% vs 14.6% collapse; lr-gate and TD-clip are
    # null results at 20M). Push the cadence axis + combine with lr-gate.
    "20m_t100k": {"_total": 20_000_000, "exploration_fraction": 0.9,
                  "exploration_final_eps": 0.01, "double_q": True,
                  "target_update_interval": 100_000},
    "20m_t200k": {"_total": 20_000_000, "exploration_fraction": 0.9,
                  "exploration_final_eps": 0.01, "double_q": True,
                  "target_update_interval": 200_000},
    "20m_t50k_lrgate": {"_total": 20_000_000, "exploration_fraction": 0.9,
                        "exploration_final_eps": 0.01, "double_q": True,
                        "target_update_interval": 50_000,
                        "lr_decay_start_fraction": 0.9},
    "20m_t100k_lrgate": {"_total": 20_000_000, "exploration_fraction": 0.9,
                         "exploration_final_eps": 0.01, "double_q": True,
                         "target_update_interval": 100_000,
                         "lr_decay_start_fraction": 0.9},
    # t20k was the 10M cadence optimum (87.1% final-quarter) — the 20M
    # curve was only sampled at 50k/100k/200k; close the gap.
    "20m_t20k": {"_total": 20_000_000, "exploration_fraction": 0.9,
                 "exploration_final_eps": 0.01, "double_q": True,
                 "target_update_interval": 20_000},
    "20m_t20k_lrgate": {"_total": 20_000_000, "exploration_fraction": 0.9,
                        "exploration_final_eps": 0.01, "double_q": True,
                        "target_update_interval": 20_000,
                        "lr_decay_start_fraction": 0.9},
}


def tail_quarter(log_dir: str):
    """(mean exploration, mean return) over the final quarter of
    completed episodes."""
    path = os.path.join(log_dir, "env_all.monitor.csv")
    expl, rets = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or line.startswith("r,"):
                continue
            parts = line.strip().split(",")
            if len(parts) >= 4:
                rets.append(float(parts[0]))
                expl.append(float(parts[3]))
    if not expl:
        return None, None
    k = max(len(expl) // 4, 1)
    return float(np.mean(expl[-k:])), float(np.mean(rets[-k:]))


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
        overrides = dict(CONFIGS[name])
        cell_total = overrides.pop("_total", TOTAL)
        log_dir = os.path.join(OUT, name)
        t0 = time.time()
        try:
            _, result = train(
                algo="dqn", total_timesteps=cell_total, n_envs=N_ENVS,
                use_curriculum=True,
                env_config=EnvConfig.training(rewards=RewardConfig.dqn()),
                algo_config=dataclasses.replace(DQNConfig(), **overrides),
                curriculum_config=CurriculumConfig.ppo_dqn(),
                log_dir=log_dir, seed=0, iterations_per_chunk=64,
                eval_interval=500_000, n_eval_episodes=16,
                plot=False, verbose=False)
        except Exception as e:
            print(f"[sweep] {name}: FAILED {e!r}", flush=True)
            continue
        tail_expl, tail_ret = tail_quarter(log_dir)
        # final-model vs best-model eval gap
        from rlenv_tpu.train.checkpoint import load_metadata
        best_meta = load_metadata(
            os.path.join(log_dir, "models", "best_model")) or {}
        row = {
            "name": name,
            "timesteps": result.timesteps,
            "mean_return": round(result.mean_return, 1),
            "mean_exploration": round(result.mean_exploration, 2),
            "final_quarter_exploration": (None if tail_expl is None
                                          else round(tail_expl, 2)),
            "final_quarter_return": (None if tail_ret is None
                                     else round(tail_ret, 1)),
            "best_eval_return": best_meta.get("eval_mean_return"),
            "best_eval_step": best_meta.get("timesteps"),
            "wall_seconds": round(time.time() - t0, 1),
        }
        with open(summary_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[sweep] {json.dumps(row)}", flush=True)


if __name__ == "__main__":
    main()
