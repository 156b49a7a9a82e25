"""Isolate the cost of the curriculum reset branch inside the DQN chunk.

Round-2 run log: chunks containing episode boundaries took ~60 s versus
~0.7 s for pure-collect chunks. This measures (a) vmapped env.reset alone,
(b) a 64-step collect scan with zero dones, (c) the same scan with
truncations forced every step (step_count pinned at max), i.e. the
do_resets branch firing on every step.
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

from rlenv_tpu.config import CurriculumConfig, EnvConfig, RewardConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.curriculum import CurriculumVecPlantOS

N = 512


def timed(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1e3:10.2f} ms")
    return out


def main():
    cfg = EnvConfig.training(rewards=RewardConfig.dqn())
    env = PlantOS(cfg)
    venv = CurriculumVecPlantOS(env, N, CurriculumConfig.ppo_dqn())

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    v_reset = jax.jit(jax.vmap(env.reset))
    timed("vmap(env.reset) x512", v_reset, keys)

    cstate, obs, _ = venv.reset(jax.random.PRNGKey(0))
    step = jax.jit(venv.step)

    @jax.jit
    def scan_steps(cstate, key):
        def body(carry, _):
            cs, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (N,), 0, 5)
            cs, o, r, te, tr, i = venv.step(cs, a)
            return (cs, k), r.sum()
        (cs, k), rs = jax.lax.scan(body, (cstate, key), None, length=64)
        return cs, rs.sum()

    timed("curriculum scan x64, no dones", scan_steps, cstate,
          jax.random.PRNGKey(1))

    # Force truncation EVERY step: pin step_count at max_steps - 1.
    pinned = cstate.replace(env=cstate.env.replace(
        step_count=jnp.full((N,), cfg.max_steps - 1, jnp.int32)))

    @jax.jit
    def scan_steps_alldone(cstate, key):
        def body(carry, _):
            cs, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (N,), 0, 5)
            cs, o, r, te, tr, i = venv.step(cs, a)
            # re-pin so every step truncates again
            cs = cs.replace(env=cs.env.replace(
                step_count=jnp.full((N,), cfg.max_steps - 1, jnp.int32)))
            return (cs, k), r.sum()
        (cs, k), rs = jax.lax.scan(body, (cstate, key), None, length=64)
        return cs, rs.sum()

    timed("curriculum scan x64, ALL done each step", scan_steps_alldone,
          pinned, jax.random.PRNGKey(2), n=3)

    # One done env out of 512 (any(done) still true every step).
    @jax.jit
    def scan_steps_onedone(cstate, key):
        def body(carry, _):
            cs, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (N,), 0, 5)
            cs, o, r, te, tr, i = venv.step(cs, a)
            sc = cs.env.step_count.at[0].set(cfg.max_steps - 1)
            cs = cs.replace(env=cs.env.replace(step_count=sc))
            return (cs, k), r.sum()
        (cs, k), rs = jax.lax.scan(body, (cstate, key), None, length=64)
        return cs, rs.sum()

    timed("curriculum scan x64, ONE done each step", scan_steps_onedone,
          pinned, jax.random.PRNGKey(3), n=3)


if __name__ == "__main__":
    main()
