"""Micro-benchmark of fused-step kernel phases on the TPU.

Isolates the cost of: plain copy (launch+IO floor), the 4-way conditional
realign rotate, the 10-stage barrel rotate, 121 static lane extracts, and
a lane-compare reduction, each as a standalone Pallas kernel over the
same [4096, 640] int32 state. Helps decide which probe-addressing scheme
the fused kernel should use. Not part of the test suite.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, Bb = 4096, 640, 256
N_BLOCKS = B // Bb
ITERS = 256
G = 25

CP = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                          vmem_limit_bytes=100 * 1024 * 1024)


def run(name, kernel, n_in=2):
    in_specs = [pl.BlockSpec((Bb, L), lambda i: (i, 0)),
                pl.BlockSpec((Bb, 16), lambda i: (i, 0))][:n_in]
    call = pl.pallas_call(
        kernel, compiler_params=CP, grid=(N_BLOCKS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bb, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32))

    @jax.jit
    def loop(x, s):
        def body(c, _):
            x, s = c
            y = call(x, s) if n_in == 2 else call(x)
            return (y, s), ()
        (x, s), _ = jax.lax.scan(body, (x, s), None, length=ITERS)
        return x

    x = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L) & 127
    s = (jnp.arange(B * 16, dtype=jnp.int32).reshape(B, 16) * 37) % (G * G)
    y = loop(x, s); _ = float(y.sum())   # force real execution (tunnel!)
    t0 = time.perf_counter()
    for _ in range(4):
        y = loop(y, s)          # chain outputs so nothing can be reused
    _ = float(y.sum())          # host fetch forces completion
    wall = time.perf_counter() - t0
    dt = wall / (4 * ITERS * N_BLOCKS)
    print(f"{name:24s} {dt*1e6:8.2f} us/block   ({wall*1e3:7.1f} ms total)")


def rot(x, d):
    d %= L
    if d == 0:
        return x
    return jnp.concatenate([x[:, d:], x[:, :d]], axis=1)


def k_copy(x_ref, s_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


def k_realign(x_ref, s_ref, o_ref):
    x = x_ref[:]
    m = s_ref[:, 0:1] % 5 - 2
    r1 = jnp.where(m == -1, rot(x, -G), jnp.where(m == 1, rot(x, G), x))
    m2 = s_ref[:, 1:2] % 5 - 2
    o_ref[:] = jnp.where(m2 == -1, rot(r1, -1),
                         jnp.where(m2 == 1, rot(r1, 1), r1))


def k_barrel(x_ref, s_ref, o_ref):
    x = x_ref[:]
    t = s_ref[:, 0:1]
    for k in range(10):
        sh = 1 << k
        x = jnp.where((t & sh) > 0, rot(x, sh), x)
    o_ref[:] = x


def k_extract121(x_ref, s_ref, o_ref):
    x = x_ref[:]
    acc = x[:, 0:1]
    for i in range(121):
        l = (i * 37 + 5) % L
        acc = acc + x[:, l:l + 1]
    o_ref[:] = x + acc


def k_reduce4(x_ref, s_ref, o_ref):
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, L), 1)
    acc = x[:, 0:1]
    for i in range(4):
        idx = s_ref[:, i:i + 1]
        acc = acc + jnp.sum(jnp.where(lane == idx, x, 0), axis=1,
                            keepdims=True)
    o_ref[:] = x + acc


def k_gathercat(x_ref, s_ref, o_ref):
    """121 extracts concatenated into [Bb,121] then reduced (obs-like)."""
    x = x_ref[:]
    cols = jnp.concatenate([x[:, (i * 37 + 5) % L:(i * 37 + 5) % L + 1]
                            for i in range(121)], axis=1)
    o_ref[:] = x + jnp.sum(cols, axis=1, keepdims=True)


if __name__ == "__main__":
    run("copy", k_copy)
    run("realign(4rot+sel)", k_realign)
    run("barrel(10 stages)", k_barrel)
    run("extract121(sum)", k_extract121)
    run("extract121(concat)", k_gathercat)
    run("lane-reduce x4", k_reduce4)
