"""Isolate Orbax save cost on FRESH chunk-output arrays (uncached host
copies), reproducing the real driver sequence: jitted chunk -> scalar sync
-> ckpt.save. Also times a real train_chunk with dones occurring, i.e. the
exact every-4th-chunk composition of the round-2 run.
"""

import os
import shutil
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

from rlenv_tpu.config import CurriculumConfig, DQNConfig, EnvConfig, RewardConfig
from rlenv_tpu.algos.dqn import DQNTrainer
from rlenv_tpu.train.trainer import make_venv, _buffer_stripped
from rlenv_tpu.train.checkpoint import CheckpointManager
from rlenv_tpu.train.metrics import MonitorWriter

N = 512


def main():
    env_config = EnvConfig.training(rewards=RewardConfig.dqn())
    venv = make_venv(env_config, N, use_curriculum=True,
                     curriculum=CurriculumConfig.ppo_dqn())
    trainer = DQNTrainer(venv, DQNConfig(), total_timesteps=10_000_000)

    t0 = time.perf_counter()
    state = trainer.init(jax.random.PRNGKey(0))
    int(state.stats.timesteps)  # sync
    print(f"init+sync                      {time.perf_counter()-t0:8.2f} s")

    chunk_fn = jax.jit(lambda s: trainer.train_chunk(s, 64))
    t0 = time.perf_counter()
    state, m = chunk_fn(state)
    int(state.stats.timesteps)
    print(f"chunk 1 (compile+run)          {time.perf_counter()-t0:8.2f} s")

    for i in range(2, 5):
        t0 = time.perf_counter()
        state, m = chunk_fn(state)
        ts = int(state.stats.timesteps)
        print(f"chunk {i} (run, ts={ts})      {time.perf_counter()-t0:8.2f} s")

    # Fresh outputs, synced via one scalar — now time Orbax directly.
    d = "/tmp/ckpt_probe2"
    shutil.rmtree(d, ignore_errors=True)
    ckpt = CheckpointManager(d)
    t0 = time.perf_counter()
    ckpt.save(1, _buffer_stripped(state))
    print(f"ckpt.save fresh arrays         {time.perf_counter()-t0:8.2f} s")
    t0 = time.perf_counter()
    ckpt.wait()
    print(f"ckpt.wait                      {time.perf_counter()-t0:8.2f} s")

    # Run 4 more chunks so episode boundaries (step 1000 = chunk 4) occur,
    # then drain like the real loop.
    mon = MonitorWriter("/tmp/ckpt_probe2_mon")
    for i in range(5, 10):
        t0 = time.perf_counter()
        state, m = chunk_fn(state)
        ts = int(state.stats.timesteps)
        dt_chunk = time.perf_counter() - t0
        t0 = time.perf_counter()
        summary = mon.drain(state.stats)
        dt_drain = time.perf_counter() - t0
        print(f"chunk {i}: run {dt_chunk:6.2f} s, drain {dt_drain:6.2f} s, "
              f"episodes={summary.get('episodes', 0)}, ts={ts}")

    t0 = time.perf_counter()
    ckpt.save(2, _buffer_stripped(state))
    ckpt.wait()
    print(f"ckpt.save+wait fresh arrays 2  {time.perf_counter()-t0:8.2f} s")
    ckpt.close()


if __name__ == "__main__":
    main()
