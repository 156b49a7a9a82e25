import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.config import MCTSConfig
from rlenv_tpu.algos.mcts import MCTSPlanner
from rlenv_tpu.env.vector import VecPlantOS

cfg = EnvConfig(grid_size=15, num_plants=5, num_obstacles=8,
                lidar_range=2, lidar_channels=10, max_steps=500)
env = PlantOS(cfg)
B = 256
venv = VecPlantOS(env, B)
states, obs, _ = venv.reset(jax.random.PRNGKey(0))
keys = jax.random.split(jax.random.PRNGKey(1), B)

def timeit(name, fn, *args, reps=3):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    # force real sync through the tunnel
    jnp.asarray(out).sum().item() if hasattr(out, 'sum') else None
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms")
    return dt

# 1. full search baseline
planner = MCTSPlanner(env, MCTSConfig(n_simulations=50, max_depth=100))
timeit("full search (50 sims, depth 100)", planner.search_batch, states, keys)

# 2. no rollout: max_depth high but rollout disabled via depth trick is hard;
# instead: depth 1 rollouts
p2 = MCTSPlanner(env, MCTSConfig(n_simulations=50, max_depth=1))
timeit("search depth=1 (sel+expand+backprop only)", p2.search_batch, states, keys)

# 3. pure env.step scan floor: 5000 sequential vmapped steps
step_v = jax.vmap(env.step)
def rollout_scan(states, key):
    def body(carry, _):
        s, k = carry
        k, ka = jax.random.split(k)
        a = jax.random.randint(ka, (B,), 0, 5)
        s, _, r, _, _, _ = step_v(s, a)
        return (s, k), r.sum()
    (s, k), rs = jax.lax.scan(body, (states, key), None, length=5000)
    return rs.sum()
rollout_scan_j = jax.jit(rollout_scan)
timeit("5000-step scan of vmapped env.step (B=256)", rollout_scan_j, states, jax.random.PRNGKey(2))

# 4. same but via while_loop to measure while overhead
def rollout_while(states, key):
    def cond(c): return c[2] < 5000
    def body(c):
        s, k, i, acc = c
        k, ka = jax.random.split(k)
        a = jax.random.randint(ka, (B,), 0, 5)
        s, _, r, _, _, _ = step_v(s, a)
        return (s, k, i+1, acc + r.sum())
    return jax.lax.while_loop(cond, body, (states, key, jnp.int32(0), jnp.float32(0)))[3]
timeit("5000-step while_loop of vmapped env.step", jax.jit(rollout_while), states, jax.random.PRNGKey(2))
