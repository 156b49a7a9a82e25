"""Headline benchmark: vectorized env throughput on one chip.

Metric: env-steps/s at 4096 lockstep envs on the reference training config
(grid 25, 10 plants, 12 obstacles, LIDAR 16x6 -> 107-dim obs), random
actions, auto-reset — directly comparable to the reference's measured
~11.4k env-steps/s at 64 DummyVecEnv Python envs (BASELINE.md: 10.05M steps
in <=881 s across `train_improved1/gym/env_*.monitor.csv`).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "env_steps_per_sec", "vs_baseline": N}

Multi-chip mode: ``python bench.py --mesh N`` (or ``BENCH_MESH=N``) shards
the env batch over a ('data',) mesh of N devices — each device runs the
same chunked Pallas rollout on its local shard via
``rlenv_tpu.env.fused_vector.build_sharded_rollout`` (the trainers' dp
sharding; bit-identical per-env trajectories, verified on the virtual
8-CPU mesh by ``tests/test_ops_fused.py::test_sharded_bench_rollout_parity``).
On real N-chip hardware this produces the scaling table with no new code.
"""

from __future__ import annotations

import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from rlenv_tpu.utils.jaxcache import enable_persistent_cache

# jax is already imported by this box's sitecustomize, so env vars are
# too late — jax.config.update (inside the helper) is the working form.
enable_persistent_cache()

BASELINE_STEPS_PER_SEC = 11_400.0   # BASELINE.md, derived from monitor CSVs
NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
# Whole-episode chunks amortize the per-program pack/launch cost best:
# measured 219.9M steps/s at CHUNK=250, 239.8M at 500, 251.7M at 1000
# (round 4, one v5e chip). 1000 divides max_steps, so chunked == per-step
# bit-exactly.
CHUNK = int(os.environ.get("BENCH_CHUNK", 1000))  # env steps per device call
CHUNKS_TIMED = int(os.environ.get("BENCH_CHUNKS", 32))  # timed device calls
WARMUP_CHUNKS = 2


def _mesh_size() -> int:
    if "--mesh" in __import__("sys").argv:
        i = __import__("sys").argv.index("--mesh")
        return int(__import__("sys").argv[i + 1])
    return int(os.environ.get("BENCH_MESH", 0))


def mesh_main(n_mesh: int) -> None:
    """Multi-chip headline: env batch dp-sharded over a ('data',) mesh."""
    import jax

    from rlenv_tpu import EnvConfig, PlantOS
    from rlenv_tpu.env.fused_vector import build_sharded_rollout
    from rlenv_tpu.parallel.mesh import make_mesh

    env = PlantOS(EnvConfig.training())
    assert env.config.max_steps % CHUNK == 0, \
        "BENCH_CHUNK must divide max_steps for per-step-exact chunks"
    mesh = make_mesh(n_mesh, model_parallel=1)
    reset_fn, rollout_fn = build_sharded_rollout(
        env, NUM_ENVS, mesh, CHUNK,
        block_envs=int(os.environ.get("BENCH_BLOCK", 1024)))

    @jax.jit
    def rollout_chunk(states, key):
        key, k_act = jax.random.split(key)
        actions = jax.random.randint(k_act, (CHUNK, NUM_ENVS), 0, 5)
        states, _, traj = rollout_fn(states, actions)
        return states, key, traj["rewards"].sum()

    key = jax.random.PRNGKey(0)
    states, _ = jax.jit(reset_fn)(key)
    for _ in range(WARMUP_CHUNKS):
        states, key, acc = rollout_chunk(states, key)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(CHUNKS_TIMED):
        states, key, acc = rollout_chunk(states, key)
    float(acc)
    elapsed = time.perf_counter() - t0
    steps_per_sec = NUM_ENVS * CHUNK * CHUNKS_TIMED / elapsed
    print(json.dumps({
        "metric": f"env_steps_per_sec_{NUM_ENVS}envs_{n_mesh}chips",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rlenv_tpu import EnvConfig, PlantOS
    from rlenv_tpu.env.vector import VecPlantOS

    n_mesh = _mesh_size()
    if n_mesh:
        return mesh_main(n_mesh)

    env = PlantOS(EnvConfig.training())
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    chunked = fused and os.environ.get("BENCH_ROLLOUT", "1") == "1"
    if fused:
        # Fused Pallas kernel path (rlenv_tpu/ops/fused_step.py) — the
        # default and fastest. BENCH_ROLLOUT=1 (default) runs CHUNK env
        # steps per Pallas program with the world grid resident on-chip
        # (build_fused_rollout); BENCH_ROLLOUT=0 launches one program per
        # step; BENCH_FUSED=0 forces the pure-XLA path.
        from rlenv_tpu.env.fused_vector import FusedVecPlantOS
        venv = FusedVecPlantOS(env, NUM_ENVS,
                               block_envs=int(os.environ.get("BENCH_BLOCK",
                                                             1024)))
    else:
        venv = VecPlantOS(env, NUM_ENVS)

    if chunked:
        # CHUNK divides max_steps (1000), so episode boundaries land
        # exactly on chunk boundaries and the chunked trajectory is
        # bit-identical to the per-step path (tests/test_ops_fused.py).
        assert env.config.max_steps % CHUNK == 0, \
            "BENCH_CHUNK must divide max_steps for per-step-exact chunks"

        @jax.jit
        def rollout_chunk(states, key):
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(k_act, (CHUNK, NUM_ENVS), 0, 5)
            states, _, traj = venv.rollout(states, actions)
            return states, key, traj["rewards"].sum()
    else:
        @jax.jit
        def rollout_chunk(states, key):
            def body(carry, _):
                states, key = carry
                key, k_act = jax.random.split(key)
                actions = jax.random.randint(k_act, (NUM_ENVS,), 0, 5)
                states, _, reward, _, _, _ = venv.step(states, actions)
                return (states, key), reward.sum()

            (states, key), rewards = jax.lax.scan(body, (states, key), None,
                                                  length=CHUNK)
            return states, key, rewards.sum()

    key = jax.random.PRNGKey(0)
    states, _, _ = venv.reset(key)

    # Sync via an explicit device->host transfer: through the remote-TPU
    # tunnel, block_until_ready can return before single-launch programs
    # actually finish, which inflates throughput by orders of magnitude.
    # The timed region dispatches CHUNKS_TIMED chained chunks and pays ONE
    # round-trip at the end (~30 ms on this tunnel), so CHUNKS_TIMED is
    # sized to amortize it to a few percent.
    for _ in range(WARMUP_CHUNKS):
        states, key, acc = rollout_chunk(states, key)
    float(acc)

    t0 = time.perf_counter()
    for _ in range(CHUNKS_TIMED):
        states, key, acc = rollout_chunk(states, key)
    float(acc)
    elapsed = time.perf_counter() - t0

    steps = NUM_ENVS * CHUNK * CHUNKS_TIMED
    steps_per_sec = steps / elapsed
    print(json.dumps({
        "metric": f"env_steps_per_sec_{NUM_ENVS}envs_1chip",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
