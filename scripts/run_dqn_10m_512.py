"""DQN 10M-step run at 512 envs — the reference's headline DQN claim.

The reference's env-source comment (`/root/reference/plantos_env.py:75`)
quotes "~97% avg exploration, 10M steps, curriculum, 512 n_env, ~9 min"
for DQN; its only checked-in artifacts are 64-env runs (875-890 s). This
run targets the 512-env configuration directly: same SB3-mirrored
hyperparameters (`trainingCode.py:226-247`), curriculum, DQN reward set.

SB3 semantics at 512 envs (replicated by DQNTrainer): target-net cadence
max(5000 // n_envs, 1) vec steps; train_freq=4 vec steps between updates;
epsilon anneals on TOTAL env steps.

Run via scripts/run_dqn_10m_512.sh (process-level retry loop; a TPU-worker
crash poisons the PJRT client so retries need a fresh process; resume=True
continues from the latest Orbax checkpoint).
"""

from rlenv_tpu.config import CurriculumConfig, EnvConfig, RewardConfig
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    import os
    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    state, result = train(
        algo="dqn",
        total_timesteps=10_000_000,
        n_envs=512,
        use_curriculum=True,
        # fused resolves by platform now (Pallas kernel on TPU, XLA
        # elsewhere; bit-identical). DQN_FUSED=0 forces the XLA
        # verification path; DQN_FUSED=1 forces Pallas.
        fused=(None if "DQN_FUSED" not in os.environ
               else os.environ["DQN_FUSED"] == "1"),
        reset_pool=int(os.environ.get("DQN_RESET_POOL", 0)),
        env_config=env_config,
        curriculum_config=CurriculumConfig.ppo_dqn(),
        log_dir=os.environ.get("DQN_LOG_DIR", "runs/dqn_tpu_10m_512env"),
        seed=int(os.environ.get("DQN_SEED", 0)),
        iterations_per_chunk=64,
        checkpoint_interval=500_000,
        # Eval-driven best-model capture: DQN peaks around 6-8M steps and
        # decays at the epsilon floor (RESULTS.md); models/best_model holds
        # the peak policy.
        eval_interval=500_000,
        n_eval_episodes=16,
        resume=True,
    )
    print("DONE", result)
