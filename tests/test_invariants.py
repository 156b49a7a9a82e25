"""Property-style invariants over random trajectories.

The golden parity suite pins behavior to the reference; these invariants
additionally pin the internal accounting to itself — any future refactor
that breaks reward/counter bookkeeping consistency fails here without
needing the reference mounted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlenv_tpu import EnvConfig, PlantOS


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_reward_decomposition_identity(seed):
    """Sum of step rewards over an episode equals the closed-form
    decomposition from the state counters:

    total = T*R_step + new_cells*R_expl + revisits*R_revisit
          + collisions*R_invalid + waterings*R_goal + mistakes*R_mistake
          + empty_waters*R_water_empty + bonus_given*R_complete
    """
    cfg = EnvConfig(grid_size=9, num_plants=3, num_obstacles=6,
                    lidar_range=2, lidar_channels=4, max_steps=300)
    env = PlantOS(cfg)
    R = cfg.rewards
    state, _, info0 = env.reset(jax.random.PRNGKey(seed))
    step = jax.jit(env.step)
    rng = np.random.default_rng(seed)

    total = 0.0
    T = 0
    moves = collisions = new_cells = revisits = 0
    goals = mistakes = empty_waters = 0
    for _ in range(300):
        a = int(rng.integers(5))
        prev = state
        state, _, r, term, trunc, info = step(state, a)
        total += float(r)
        T += 1
        if a < 4:
            if bool(info["total_collisions"] > prev.total_collisions):
                collisions += 1
            else:
                moves += 1
                if int(prev.visit_counts[state.rover[0],
                                         state.rover[1]]) == 0:
                    new_cells += 1
                else:
                    revisits += 1
        else:
            plant_prev = int(prev.plants[prev.rover[0], prev.rover[1]])
            if plant_prev == 2:
                goals += 1
            elif plant_prev == 1:
                mistakes += 1
            else:
                empty_waters += 1
        if bool(term) or bool(trunc):
            break

    bonus = R.complete_exploration if bool(state.completion_bonus_given) \
        else 0.0
    expected = (T * R.step + new_cells * R.exploration
                + revisits * R.revisit + collisions * R.invalid
                + goals * R.goal + mistakes * R.mistake
                + empty_waters * R.water_empty + bonus)
    assert total == pytest.approx(expected, abs=1e-2)
    # counter consistency
    assert int(state.total_collisions) == collisions
    assert int(state.thirsty_count) == int(info0["thirsty_plants"]) - goals
    assert int(state.explored_count) == 1 + new_cells


def test_obs_bounds_random_maps():
    """Every observation component stays in [0, 1] across random maps and
    actions (the Box contract, `plantos_env_new.py:61-65`)."""
    cfg = EnvConfig(grid_size=11, num_plants=4, num_obstacles=12,
                    lidar_range=4, lidar_channels=12, max_steps=50)
    env = PlantOS(cfg)
    v_reset = jax.vmap(env.reset)
    states, obs, _ = v_reset(jax.random.split(jax.random.PRNGKey(3), 16))
    assert float(obs.min()) >= 0.0 and float(obs.max()) <= 1.0

    # One jitted scan over 50 random steps, accumulating the global obs
    # bounds on device (one transfer instead of 100 per-step fetches).
    @jax.jit
    def bounds_after(states, key):
        def body(carry, _):
            states, key, lo, hi = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(k, (16,), 0, 5)
            states, obs, *_ = jax.vmap(env.step)(states, actions)
            return (states, key, jnp.minimum(lo, obs.min()),
                    jnp.maximum(hi, obs.max())), None
        (states, _, lo, hi), _ = jax.lax.scan(
            body, (states, key, jnp.float32(1.0), jnp.float32(0.0)), None,
            length=50)
        return lo, hi

    lo, hi = bounds_after(states, jax.random.PRNGKey(4))
    assert float(lo) >= 0.0 and float(hi) <= 1.0


def test_plant_conservation_under_watering():
    """Plant count is invariant; thirsty count is non-increasing."""
    cfg = EnvConfig(grid_size=9, num_plants=4, num_obstacles=0,
                    lidar_range=2, lidar_channels=4, max_steps=400)
    env = PlantOS(cfg)
    state, _, info = env.reset(jax.random.PRNGKey(9))
    total0 = int(info["total_plants"])
    prev_thirsty = int(info["thirsty_plants"])
    step = jax.jit(env.step)
    rng = np.random.default_rng(1)
    for _ in range(200):
        state, _, _, term, trunc, info = step(state, int(rng.integers(5)))
        assert int(info["total_plants"]) == total0
        assert int(info["thirsty_plants"]) <= prev_thirsty
        prev_thirsty = int(info["thirsty_plants"])
        if bool(term) or bool(trunc):
            break
