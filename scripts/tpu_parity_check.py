"""Real-TPU bitwise parity: fused Pallas kernels vs the XLA path.

Usage (one TPU process at a time on this box):
    PYTHONPATH="/root/repo:$PYTHONPATH" timeout 580 python scripts/tpu_parity_check.py

Guards against precision hazards interpret-mode CPU tests cannot see
(e.g. the MXU's bf16 input precision for f32 dots, which silently
corrupted probe reads before the packed cells were masked to 7 bits).
Checks both the per-step fused kernel (vs the XLA path) and the chunked
rollout kernel (vs iterated per-step fused calls).
"""

import os

# env-var jax config is frozen before user code on this box
# (sitecustomize pre-imports jax); use the working form:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
from rlenv_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.env.vector import VecPlantOS
from rlenv_tpu.env.fused_vector import FusedVecPlantOS

print("devices:", jax.devices())
env = PlantOS(EnvConfig.training())
N = 256
v = VecPlantOS(env, N)
f = FusedVecPlantOS(env, N, block_envs=128)

key = jax.random.PRNGKey(7)
sv, ov, _ = v.reset(key)
sf, of, _ = f.reset(key)
print("reset obs equal:", bool(jnp.array_equal(ov, of)))
fail = not bool(jnp.array_equal(ov, of))

kact = jax.random.PRNGKey(123)
stepv = jax.jit(v.step)
stepf = jax.jit(f.step)

max_obs_diff = 0.0
max_rew_diff = 0.0
for t in range(50):
    kact, k = jax.random.split(kact)
    a = jax.random.randint(k, (N,), 0, 5)
    sv, ov, rv, tv, uv, _ = stepv(sv, a)
    sf, of, rf, tf, uf, _ = stepf(sf, a)
    od = float(jnp.max(jnp.abs(ov - of)))
    rd = float(jnp.max(jnp.abs(rv - rf)))
    max_obs_diff = max(max_obs_diff, od)
    max_rew_diff = max(max_rew_diff, rd)
    if od or rd:
        print(f"t={t} obs_diff={od} rew_diff={rd} "
              f"term_eq={bool(jnp.array_equal(tv, tf))}")
print("per-step kernel vs XLA: max_obs_diff:", max_obs_diff,
      "max_rew_diff:", max_rew_diff)
print("term/trunc equal:", bool(jnp.array_equal(tv, tf)),
      bool(jnp.array_equal(uv, uf)))
fail |= bool(max_obs_diff or max_rew_diff)

# --- chunked rollout kernel vs iterated per-step fused calls ---
K = 16
flat0, _, _ = f.reset(jax.random.PRNGKey(11))
acts = jax.random.randint(jax.random.PRNGKey(5), (K, N), 0, 5)

flat = flat0
obs_l, rew_l = [], []
for k in range(K):
    flat, _, rew, te, tr, info = stepf(flat, acts[k])
    obs_l.append(np.asarray(info["final_obs"]))
    rew_l.append(np.asarray(rew))

flat_c, _, traj = jax.jit(f.rollout)(flat0, acts)
obs_eq = np.array_equal(np.stack(obs_l), np.asarray(traj["obs"]))
rew_eq = np.array_equal(np.stack(rew_l), np.asarray(traj["rewards"]))
state_eq = (np.array_equal(np.asarray(flat.rolled), np.asarray(flat_c.rolled))
            and np.array_equal(np.asarray(flat.scal[:, :10]),
                               np.asarray(flat_c.scal[:, :10])))
print("rollout kernel vs per-step: obs", obs_eq, "rew", rew_eq,
      "state", state_eq)
fail |= not (obs_eq and rew_eq and state_eq)

print("PARITY", "FAIL" if fail else "PASS")
raise SystemExit(1 if fail else 0)
