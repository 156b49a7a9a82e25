import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
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

kact = jax.random.PRNGKey(123)
@jax.jit
def stepv(s, a): return v.step(s, a)
@jax.jit
def stepf(s, a): return f.step(s, a)

max_obs_diff = 0.0; max_rew_diff = 0.0
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
        print(f"t={t} obs_diff={od} rew_diff={rd} term_eq={bool(jnp.array_equal(tv,tf))}")
print("max_obs_diff:", max_obs_diff, "max_rew_diff:", max_rew_diff)
print("term/trunc equal:", bool(jnp.array_equal(tv, tf)), bool(jnp.array_equal(uv, uf)))

# Usage (one TPU process at a time on this box):
#   PYTHONPATH="/root/repo:$PYTHONPATH" timeout 580 python scripts/tpu_parity_check.py
# Guards against precision hazards interpret-mode CPU tests cannot see
# (e.g. the MXU's bf16 input precision for f32 dots).
