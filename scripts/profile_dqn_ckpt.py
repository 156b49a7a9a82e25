"""Measure host-loop costs in the DQN driver: Orbax checkpoint save,
monitor drain, and scalar reads — through the axon TPU tunnel.

Round-2's 512-env run logged ~60 s every ~4th chunk; chunks align with
both episode boundaries AND the 500k-step checkpoint cadence. The device
probes (profile_dqn_resets.py) cleared the reset branch (<1 ms/step), so
the tunnel-side host work is the remaining suspect.
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
import numpy as np

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
    state = trainer.init(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)

    stripped = _buffer_stripped(state)
    leaves = jax.tree.leaves(stripped)
    nbytes = sum(x.nbytes for x in leaves if hasattr(x, "nbytes"))
    print(f"stripped state: {len(leaves)} leaves, {nbytes/1e6:.1f} MB")

    t0 = time.perf_counter()
    host = jax.device_get(stripped)
    print(f"device_get(stripped)            {time.perf_counter()-t0:8.2f} s")

    t0 = time.perf_counter()
    host = jax.device_get(stripped)
    print(f"device_get(stripped) again      {time.perf_counter()-t0:8.2f} s")

    d = "/tmp/ckpt_probe"
    shutil.rmtree(d, ignore_errors=True)
    ckpt = CheckpointManager(d)
    t0 = time.perf_counter()
    ckpt.save(1, stripped)
    print(f"ckpt.save (no wait)             {time.perf_counter()-t0:8.2f} s")
    t0 = time.perf_counter()
    ckpt.wait()
    print(f"ckpt.wait                       {time.perf_counter()-t0:8.2f} s")

    t0 = time.perf_counter()
    ckpt.save(2, stripped)
    ckpt.wait()
    print(f"ckpt.save+wait (warm)           {time.perf_counter()-t0:8.2f} s")

    mon = MonitorWriter("/tmp/ckpt_probe_mon")
    t0 = time.perf_counter()
    for _ in range(10):
        mon.drain(state.stats)
        int(state.stats.timesteps)
    print(f"monitor.drain + int(ts) x10     {time.perf_counter()-t0:8.2f} s")
    ckpt.close()


if __name__ == "__main__":
    main()
