import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.config import MCTSConfig
from rlenv_tpu.algos.mcts import MCTSPlanner
from rlenv_tpu.ops.fused_step import pack_state, build_fused_step
from rlenv_tpu.ops.mcts_rollout import build_mcts_rollout

cfg = EnvConfig(grid_size=15, num_plants=5, num_obstacles=8,
                lidar_range=2, lidar_channels=10, max_steps=500)
env = PlantOS(cfg)
B = 256
states, _, _ = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
flat = pack_state(states, cfg.grid_size)

def timeit(name, fn, *args, reps=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    jnp.asarray(out).sum().item()
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")

# 1. 50 sequential rollout-kernel calls (the rollout phase alone)
roll = build_mcts_rollout(cfg, B, 100, block_envs=256)
d0 = jnp.zeros(B, jnp.int32)
@jax.jit
def fifty_rollouts(flat, key):
    def body(i, acc):
        rand = jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.fold_in(key, i), (100, 3, B), jnp.uint32), jnp.int32)
        return acc + roll(flat, d0, rand)
    return jax.lax.fori_loop(0, 50, body, jnp.zeros(B, jnp.float32))
timeit("50x rollout kernel (depth 100)", fifty_rollouts, flat, jax.random.PRNGKey(1))

# 2. 50x single fused step kernel calls (selection/expansion cost scale)
step = build_fused_step(cfg, B, block_envs=256)
@jax.jit
def fifty_steps(flat, key):
    def body(i, f):
        a = jax.random.randint(jax.random.fold_in(key, i), (B,), 0, 5)
        nf, _, r, _, _, _ = step(f, a)
        return nf
    return jax.lax.fori_loop(0, 50, body, flat).scal.sum()
timeit("50x fused step kernel", fifty_steps, flat, jax.random.PRNGKey(2))

# 3. full fused search split by depth
for depth in (1, 100):
    planner = MCTSPlanner(env, MCTSConfig(n_simulations=50, max_depth=depth))
    timeit(f"fused search depth={depth}", planner.search_batch_fused, states, jax.random.PRNGKey(3))
