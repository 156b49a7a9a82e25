"""Isolate the per-step cost of EpisodeStats.update on hardware.

A2C rollout steps and DQN collect steps both cost ~1.7 ms at 512 envs
while the bare curriculum env scan costs 0.13 ms; the shared extras are
the policy forward and the episode-stats ring scatters. Times each.
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

from rlenv_tpu.algos.common import EpisodeStats
from rlenv_tpu.config import A2CConfig, CurriculumConfig, EnvConfig, RewardConfig
from rlenv_tpu.models.mlp import ActorCritic
from rlenv_tpu.train.trainer import make_venv

N = 512


def timeit(name, fn, state, n=16, warmup=2):
    for _ in range(warmup):
        state = fn(state)
    # honest sync: explicit device->host transfer (block_until_ready can
    # return early through the axon tunnel, see bench.py)
    float(jnp.asarray(jax.tree.leaves(state)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    float(jnp.asarray(jax.tree.leaves(state)[0]).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms/call ({dt*1e3/64:6.3f} ms/step)",
          flush=True)
    return state, dt


def main():
    import sys
    variant = sys.argv[1] if len(sys.argv) > 1 else "a2c"
    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    fused = "fused" in variant
    venv = make_venv(env_config, N, use_curriculum=True,
                     curriculum=getattr(CurriculumConfig,
                                        "ppo_dqn" if "pd" in variant
                                        else "a2c")(), fused=fused)
    print("curriculum variant:", variant, "fused:", fused)
    model = ActorCritic(num_actions=5, hidden_sizes=A2CConfig().hidden_sizes)

    cstate, obs, _ = venv.reset(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), obs)
    stats = EpisodeStats.init(N)

    # 1. env only
    def env64(carry):
        def body(c, _):
            cs, o, key = c
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (N,), 0, 5)
            cs, o, r, te, tr, info = venv.step(cs, a)
            return (cs, o, key), None
        c, _ = jax.lax.scan(body, carry, None, length=64)
        return c
    carry = (cstate, obs, jax.random.PRNGKey(2))
    carry, _ = timeit("env x64", jax.jit(env64), carry)

    # 2. env + policy
    def envpol64(carry):
        def body(c, _):
            cs, o, key = c
            key, k = jax.random.split(key)
            logits, value = model.apply(params, o)
            a = jax.random.categorical(k, logits)
            cs, o, r, te, tr, info = venv.step(cs, a)
            return (cs, o, key), None
        c, _ = jax.lax.scan(body, carry, None, length=64)
        return c
    carry, _ = timeit("env+policy x64", jax.jit(envpol64), carry)

    # 3. env + policy + stats
    def envpolstats64(carry):
        def body(c, _):
            cs, o, st, key = c
            key, k = jax.random.split(key)
            logits, value = model.apply(params, o)
            a = jax.random.categorical(k, logits)
            cs, o, r, te, tr, info = venv.step(cs, a)
            st = st.update(r, te | tr, info["exploration_percentage"])
            return (cs, o, st, key), None
        c, _ = jax.lax.scan(body, carry, None, length=64)
        return c
    carry3 = (carry[0], carry[1], stats, carry[2])
    carry3, _ = timeit("env+policy+stats x64", jax.jit(envpolstats64), carry3)

    # 4. stats alone
    def stats64(st):
        def body(s, i):
            r = jnp.full((N,), 1.0) * i
            done = (jnp.arange(N) % 97) == (i % 97)
            s = s.update(r, done, jnp.full((N,), 50.0))
            return s, None
        s, _ = jax.lax.scan(body, st, jnp.arange(64.0))
        return s
    stats, _ = timeit("stats.update x64 (alone)", jax.jit(stats64), stats)


if __name__ == "__main__":
    main()
