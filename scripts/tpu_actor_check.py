"""Real-TPU check for the policy-in-kernel actor rollout.

Verifies the Mosaic lowering of :mod:`rlenv_tpu.ops.actor_rollout` at
production sizes (QNetwork 512-512-256, 1000-step horizon) and times it
against the per-step XLA eval scan (`make_eval_fn`) at the in-training
eval width. Env-half parity (action replay through the plain rollout
kernel) is asserted on hardware; policy agreement vs the XLA forward is
reported as a match-rate (f32 summation order differs between the
in-kernel ``W @ x_T`` and XLA's ``x @ W``, so knife-edge argmax ties may
flip — anything >99% is the same policy for evaluation purposes).

Usage: python scripts/tpu_actor_check.py [width] [horizon]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.fused_vector import FusedVecPlantOS
from rlenv_tpu.models import QNetwork
from rlenv_tpu.ops.actor_rollout import (build_actor_rollout,
                                         pack_mlp_policy,
                                         qnet_policy_layers)
from rlenv_tpu.ops.fused_step import build_fused_rollout


def sync(x):
    np.asarray(jax.device_get(x))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    block_envs = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    config = EnvConfig.training(max_steps=K)
    env = PlantOS(config)
    fenv = FusedVecPlantOS(env, B)
    flat, obs0, _ = fenv.reset(jax.random.PRNGKey(0))

    net = QNetwork(num_actions=config.num_actions)
    params = net.init(jax.random.PRNGKey(1), obs0)
    wdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    ws, bs = pack_mlp_policy(config, qnet_policy_layers(params), dtype=wdt)

    actor = build_actor_rollout(config, B, K, n_layers=len(ws),
                                compute_dtype=dtype, block_envs=block_envs)
    actor_j = jax.jit(actor)
    t0 = time.time()
    flat2, last_obs, ret, actions, rewards = actor_j(flat, obs0, ws, bs)
    sync(ret)
    compile_s = time.time() - t0
    t0 = time.time()
    n_rep = 5
    for _ in range(n_rep):
        out = actor_j(flat, obs0, ws, bs)
        sync(out[2])
    actor_s = (time.time() - t0) / n_rep
    print(f"actor rollout: B={B} K={K} compile={compile_s:.1f}s "
          f"run={actor_s * 1e3:.1f}ms ({B * K / actor_s / 1e6:.2f}M steps/s)")

    # env-half parity on hardware
    rollout_j = jax.jit(build_fused_rollout(config, B, K))
    flat3, obs_seq, rew2, *_ = rollout_j(flat, actions)
    np.testing.assert_array_equal(np.asarray(rewards), np.asarray(rew2))
    np.testing.assert_array_equal(np.asarray(flat2.rolled),
                                  np.asarray(flat3.rolled))
    np.testing.assert_array_equal(np.asarray(flat2.scal),
                                  np.asarray(flat3.scal))
    print("env-half parity (replay): OK")

    # policy agreement vs XLA forward on the replayed obs stream
    obs_prev = np.concatenate([np.asarray(obs0)[None],
                               np.asarray(obs_seq)[:-1]])
    fwd = jax.jit(lambda o: jnp.argmax(net.apply(params, o), axis=-1))
    agree = total = 0
    acts = np.asarray(actions)
    for k in range(0, K, max(1, K // 100)):
        exp = np.asarray(fwd(jnp.asarray(obs_prev[k])))
        agree += (acts[k] == exp).sum()
        total += B
    print(f"policy agreement vs XLA forward: {agree}/{total} "
          f"({100.0 * agree / total:.2f}%)")

    # XLA per-step eval scan for comparison (same shape of work as
    # trainer.make_eval_fn)
    def eval_scan(params, flat, obs):
        def body(c, _):
            flat, obs = c
            a = jnp.argmax(net.apply(params, obs), axis=-1)
            flat, obs, r, te, tr, _ = fenv.step(flat, a)
            return (flat, obs), r

        (_, _), rs = jax.lax.scan(body, (flat, obs), None, length=K)
        return rs.sum(0)

    es = jax.jit(eval_scan)
    sync(es(params, flat, obs0))
    t0 = time.time()
    sync(es(params, flat, obs0))
    scan_s = time.time() - t0
    print(f"XLA per-step eval scan: {scan_s * 1e3:.1f}ms -> speedup "
          f"{scan_s / actor_s:.1f}x")


if __name__ == "__main__":
    main()
