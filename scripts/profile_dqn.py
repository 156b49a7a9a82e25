"""Profile the DQN training iteration piecewise at 512 envs.

Times (on the real chip, with an explicit device->host sync as in
bench.py) each suspect in the chain the round-2 run showed at ~12k
env-steps/s: env collect, replay write, gradient step, target update,
and the composed train_chunk.
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

from rlenv_tpu.config import (CurriculumConfig, DQNConfig, EnvConfig,
                              RewardConfig)
from rlenv_tpu.algos.dqn import DQNTrainer
from rlenv_tpu.train.trainer import make_venv

N_ENVS = int(os.environ.get("PROF_ENVS", 512))
FUSED = os.environ.get("PROF_FUSED", "0") == "1"


def timeit(name, fn, state, n=8, warmup=2):
    for _ in range(warmup):
        state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:10.2f} ms/call")
    return state, dt


def main():
    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    venv = make_venv(env_config, N_ENVS, use_curriculum=True,
                     curriculum=CurriculumConfig.ppo_dqn(), fused=FUSED)
    trainer = DQNTrainer(venv, DQNConfig(), total_timesteps=10_000_000)
    state = trainer.init(jax.random.PRNGKey(0))
    print(f"envs={N_ENVS} fused={FUSED} buffer slots={state.buffer.obs.shape}")

    # 1. env step alone, scan x64
    def env_only(s):
        def body(carry, _):
            es, obs, key = carry
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (N_ENVS,), 0, 5)
            es, obs, r, term, trunc, info = venv.step(es, a)
            return (es, obs, key), r.sum()
        (es, obs, key), rs = jax.lax.scan(
            body, (s.env_state, s.obs, s.key), None, length=64)
        import dataclasses
        return dataclasses.replace(s, env_state=es, obs=obs, key=key)
    state, dt = timeit("env step x64 (scan)", jax.jit(env_only), state)
    print(f"    -> {64*N_ENVS/dt:,.0f} env-steps/s")

    # 2. collect step (env + buffer write + stats) x64
    def collect_only(s):
        def body(carry, _):
            c, trans = trainer._collect_step(carry)
            return c, trans
        import dataclasses
        carry = dataclasses.replace(s, buffer=None)
        carry, trans = jax.lax.scan(body, carry, None, length=64)
        buf = s.buffer
        for k in range(0, 64, trainer.config.train_freq):
            buf = buf.add_block(*jax.tree.map(
                lambda x: x[k:k + trainer.config.train_freq], trans))
        return dataclasses.replace(carry, buffer=buf)
    state, dt = timeit("collect (env+buffer+stats) x64", jax.jit(collect_only), state)
    print(f"    -> {64*N_ENVS/dt:,.0f} env-steps/s")

    # 3. collect + target update x64 (what train_iteration's collect does)
    def collect_target(s):
        def body(carry, _):
            c, trans = trainer._collect_step(carry)
            return trainer._maybe_update_target(c), trans
        import dataclasses
        carry = dataclasses.replace(s, buffer=None)
        carry, _ = jax.lax.scan(body, carry, None, length=64)
        return dataclasses.replace(carry, buffer=s.buffer)
    state, dt = timeit("collect+target x64", jax.jit(collect_target), state)
    print(f"    -> {64*N_ENVS/dt:,.0f} env-steps/s")

    # 4. gradient step x16
    def grad_only(s):
        def body(carry, _):
            s2, m = trainer._gradient_step(carry)
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, s, None, length=16)
        return s
    state, dt = timeit("gradient step x16 (scan)", jax.jit(grad_only), state)
    print(f"    -> {dt/16*1e3:.3f} ms/gradient-step")

    # 5. full train_iteration x16 (= 16*train_freq vec steps)
    def chunk(s):
        s, m = trainer.train_chunk(s, 16)
        return s
    state, dt = timeit("train_chunk(16 iters)", jax.jit(chunk), state)
    steps = 16 * trainer.config.train_freq * N_ENVS
    print(f"    -> {steps/dt:,.0f} env-steps/s end-to-end")


if __name__ == "__main__":
    main()
