"""Profile the A2C training iteration piecewise at 512 envs.

Stage-1 sweep measured ~130-170k env-steps/s end-to-end; the env scan
alone does ~3.9M at this width and the update is one batch-2560 MLP
fwd/bwd, so there is ~10x unexplained. Times each piece on hardware.
"""

import os
import time

# env-var jax config is frozen before user code on this box
# (sitecustomize pre-imports jax); use the working form:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
from rlenv_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from rlenv_tpu.config import (A2CConfig, CurriculumConfig, EnvConfig,
                              RewardConfig)
from rlenv_tpu.algos.a2c import A2CTrainer
from rlenv_tpu.train.trainer import make_venv

N = int(os.environ.get("PROF_ENVS", 512))


def timeit(name, fn, state, n=16, warmup=2):
    for _ in range(warmup):
        state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:10.2f} ms/call", flush=True)
    return state, dt


def main():
    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    venv = make_venv(env_config, N, use_curriculum=True,
                     curriculum=CurriculumConfig.a2c())
    trainer = A2CTrainer(venv, A2CConfig())
    state = jax.jit(trainer.init)(jax.random.PRNGKey(0))
    cfg = trainer.config
    print(f"envs={N} n_steps={cfg.n_steps}")

    # 1. rollout only (n_steps collect scan), x16 iterations' worth
    def rollout16(s):
        def iter_body(carry, _):
            carry, traj = jax.lax.scan(trainer._rollout_step, carry, None,
                                       length=cfg.n_steps)
            return carry, traj["reward"].sum()
        s, _ = jax.lax.scan(iter_body, s, None, length=16)
        return s
    state, dt = timeit("rollout-scan x16 iters", jax.jit(rollout16), state)
    print(f"    -> {16*cfg.n_steps*N/dt:,.0f} env-steps/s")

    # 2. full train_iteration x16
    def iter16(s):
        def body(carry, _):
            carry, m = trainer.train_iteration(carry)
            return carry, m["loss"]
        s, _ = jax.lax.scan(body, s, None, length=16)
        return s
    state, dt = timeit("train_iteration x16", jax.jit(iter16), state)
    print(f"    -> {16*cfg.n_steps*N/dt:,.0f} env-steps/s")

    # 3. chunk as the driver runs it
    chunk = jax.jit(lambda s: trainer.train_chunk(s, 64)[0])
    state, dt = timeit("train_chunk(64)", chunk, state, n=8)
    print(f"    -> {64*cfg.n_steps*N/dt:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
