"""Round-1 flagship RecurrentPPO run: 3M steps, 64 envs, curriculum.

Mirrors the reference's `train_with_recurrent_ppo`
(/root/reference/trainingCode.py:116-198): MlpLstmPolicy with
lstm_hidden=2562, net_arch [128,128], curriculum wrapper, PPO reward set.
TPU-worker-stable recipe (see .claude/skills/verify/SKILL.md):
n_steps=256 (not 1024 — the tunnel's worker crashes on 1024-step BPTT of
the 2562-wide LSTM), iterations_per_chunk=1.
"""

from rlenv_tpu.config import (CurriculumConfig, EnvConfig,
                              RecurrentPPOConfig, RewardConfig)
from rlenv_tpu.train.trainer import train

if __name__ == "__main__":
    # NOTE: a TPU-worker crash poisons the whole PJRT client, so retries
    # must come from a FRESH process — see scripts/run_ppo_3m.sh, which
    # loops this script until it prints DONE. ``resume=True`` continues
    # from the latest Orbax checkpoint.
    env_config = EnvConfig.training(rewards=RewardConfig.recurrent_ppo())
    state, result = train(
        algo="ppo",
        total_timesteps=3_000_000,
        n_envs=64,
        use_curriculum=True,
        env_config=env_config,
        # batch_size 4096 samples = 16 whole 256-step sequences per
        # minibatch (4 minibatches/epoch). Whole-sequence minibatching is
        # this framework's documented divergence from SB3's padded
        # sub-sequences; tiny minibatches are weight-streaming-bound on
        # TPU (each BPTT step reads the 2x ~110MB LSTM weights from HBM
        # regardless of batch size), so 1-sequence minibatches ran 16x
        # slower for the same arithmetic.
        algo_config=RecurrentPPOConfig(n_steps=256, batch_size=4096),
        curriculum_config=CurriculumConfig.ppo_dqn(),
        log_dir="runs/ppo_tpu_3m",
        seed=0,
        iterations_per_chunk=1,
        # One device program per rollout / GAE / epoch: the monolithic
        # iteration program crashes the tunnel's TPU worker.
        program_split=2,
        checkpoint_interval=100_000,
        resume=True,
    )
    print("DONE", result)
