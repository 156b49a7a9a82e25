"""Characterize device->host transfer cost through the axon tunnel.

Hypothesis from profile_dqn_ckpt.py: per-ARRAY fixed cost ~1.7 s
regardless of size, so fetching 71 leaves costs ~2 min while one packed
array of the same bytes is cheap.
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
import numpy as np


def fresh(shape, dtype=jnp.float32, seed=0):
    # A NEW device array each call (jax.Array caches host fetches).
    return jax.jit(lambda k: jax.random.uniform(
        k, shape).astype(dtype))(jax.random.PRNGKey(seed))


def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name:42s} {dt:8.3f} s")
    return out


def main():
    # warm up dispatch
    float(fresh((8,), seed=99).sum())

    a = fresh((4096,), seed=1)
    t("device_get one [4096] f32", lambda: jax.device_get(a))

    b = fresh((2048, 1024), seed=2)          # 8 MB
    t("device_get one [2048,1024] f32 (8MB)", lambda: jax.device_get(b))

    small = [fresh((64,), seed=100 + i) for i in range(16)]
    t("device_get 16 fresh [64] arrays", lambda: jax.device_get(small))

    s = fresh((), seed=3)
    t("float(scalar)", lambda: float(s))

    c = [fresh((256, 256), seed=200 + i) for i in range(8)]   # 8 x 256KB
    t("device_get 8 fresh [256,256]", lambda: jax.device_get(c))


if __name__ == "__main__":
    main()
