"""Vectorized auto-reset + batched curriculum semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.config import CurriculumConfig
from rlenv_tpu.env.curriculum import CurriculumVecPlantOS
from rlenv_tpu.env.vector import VecPlantOS


@pytest.fixture(scope="module")
def tiny_env():
    return PlantOS(EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                             lidar_range=2, lidar_channels=4, max_steps=5))


def test_autoreset_on_truncation(tiny_env):
    venv = VecPlantOS(tiny_env, 4)
    states, obs, _ = venv.reset(jax.random.PRNGKey(0))
    step = jax.jit(venv.step)
    for t in range(5):
        states, obs, rew, term, trunc, info = step(
            states, jnp.full(4, 4, jnp.int32))  # water in place, no motion
    # all envs truncated at step 5 and were auto-reset
    assert bool(jnp.all(info["done"]))
    assert bool(jnp.all(states.step_count == 0))
    # returned obs is the fresh reset obs, terminal obs preserved
    assert not bool(jnp.all(obs == info["final_obs"]))
    # next step proceeds from the new episodes
    states, obs, rew, term, trunc, info = step(
        states, jnp.zeros(4, jnp.int32))
    assert bool(jnp.all(states.step_count == 1))
    assert not bool(jnp.any(info["done"]))


def test_autoreset_independent_envs(tiny_env):
    """Only done envs reset; others keep stepping."""
    env = PlantOS(EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                            lidar_range=2, lidar_channels=4, max_steps=1000))
    venv = VecPlantOS(env, 4)
    states, obs, _ = venv.reset(jax.random.PRNGKey(1))
    step = jax.jit(venv.step)
    for _ in range(10):
        actions = jax.random.randint(jax.random.PRNGKey(0), (4,), 0, 4)
        states, obs, *_ = step(states, actions)
    assert bool(jnp.all(states.step_count == 10))


def test_curriculum_same_maze_until_timeout():
    """Without reaching the threshold, the same maze layout persists for
    max_episodes_per_maze episodes, then changes."""
    env = PlantOS(EnvConfig(grid_size=9, num_plants=2, num_obstacles=6,
                            lidar_range=2, lidar_channels=4, max_steps=3))
    ccfg = CurriculumConfig(initial_threshold=99.0,
                            max_episodes_per_maze=3)
    venv = CurriculumVecPlantOS(env, 2, ccfg)
    cstate, obs, _ = venv.reset(jax.random.PRNGKey(0))
    first_obstacles = np.asarray(cstate.env.obstacles)
    step = jax.jit(venv.step)

    layouts = [first_obstacles]
    for t in range(12):  # 4 episodes x 3 steps
        cstate, obs, rew, term, trunc, info = step(
            cstate, jnp.full(2, 4, jnp.int32))
        if bool(jnp.any(info["done"])):
            layouts.append(np.asarray(cstate.env.obstacles))
    # Reference counting (`trainingCode.py:44-54`): the initial reset already
    # counts as episode 1 on the maze, so the FIRST maze hosts episodes 1-2,
    # then a fresh maze hosts episodes 3-5.
    assert np.array_equal(layouts[0], layouts[1])      # ep2 reuses maze A
    assert not np.array_equal(layouts[0], layouts[2])  # ep3 -> fresh maze B
    assert np.array_equal(layouts[2], layouts[3])      # ep4 reuses maze B


def test_curriculum_reference_actual_fresh_maps():
    """fresh_map_each_reset=True: every reset draws a new map (the
    reference's ACTUAL dynamics, SURVEY.md §3.5), while threshold
    bookkeeping still operates."""
    env = PlantOS(EnvConfig(grid_size=9, num_plants=2, num_obstacles=6,
                            lidar_range=2, lidar_channels=4, max_steps=3))
    ccfg = CurriculumConfig.reference_actual(initial_threshold=99.0,
                                             max_episodes_per_maze=50)
    venv = CurriculumVecPlantOS(env, 2, ccfg)
    cstate, obs, _ = venv.reset(jax.random.PRNGKey(0))
    step = jax.jit(venv.step)
    layouts = [np.asarray(cstate.env.obstacles)]
    for t in range(9):
        cstate, obs, rew, term, trunc, info = step(
            cstate, jnp.full(2, 4, jnp.int32))
        if bool(jnp.any(info["done"])):
            layouts.append(np.asarray(cstate.env.obstacles))
    assert len(layouts) == 4
    for a, b in zip(layouts, layouts[1:]):
        assert not np.array_equal(a, b)


def test_curriculum_visit_persistence_from_second_episode():
    """Visit counts carry across same-maze resets only from episode 2 on
    (reference behavior, trainingCode.py:80-84)."""
    env = PlantOS(EnvConfig(grid_size=9, num_plants=2, num_obstacles=0,
                            lidar_range=2, lidar_channels=4, max_steps=4))
    ccfg = CurriculumConfig(initial_threshold=101.0,
                            max_episodes_per_maze=10)
    venv = CurriculumVecPlantOS(env, 1, ccfg)
    cstate, obs, _ = venv.reset(jax.random.PRNGKey(3))
    step = jax.jit(venv.step)

    def run_episode(cstate, actions):
        for a in actions:
            cstate, *_ = step(cstate, jnp.array([a], jnp.int32))
        return cstate

    # episode 1: move east 4x -> truncate+reset (same maze)
    cstate = run_episode(cstate, [1, 1, 1, 1])
    v_after_ep1_reset = np.asarray(cstate.env.visit_counts[0])
    # ep-1 visits were NOT carried (tracking engages at this reset)
    assert v_after_ep1_reset.sum() == 1
    # episode 2: move east 4x again -> this time counts persist
    cstate = run_episode(cstate, [1, 1, 1, 1])
    v_after_ep2_reset = np.asarray(cstate.env.visit_counts[0])
    assert v_after_ep2_reset.sum() > 1


@pytest.mark.parametrize("pool,variant", [(32, "ppo_dqn"), (8, "a2c")])
def test_reset_pool_bit_exact(pool, variant):
    """reset_pool amortization is bit-identical to the plain path across
    many auto-resets. pool=8 < episode length exercises the normal
    refill cadence; pool=32 > the 13-step episodes forces consumption of
    stale spares, exercising the full-reset fallback cond; the a2c
    variant adds terminate-on-threshold (earlier, raggeder dones)."""
    env = PlantOS(EnvConfig(grid_size=8, num_plants=3, num_obstacles=3,
                            lidar_range=2, lidar_channels=4, max_steps=13))
    ccfg = getattr(CurriculumConfig, variant)()
    v0 = CurriculumVecPlantOS(env, 8, ccfg)
    v1 = CurriculumVecPlantOS(env, 8, ccfg, reset_pool=pool)
    key = jax.random.PRNGKey(0)
    s0, o0, _ = jax.jit(v0.reset)(key)
    s1, o1, _ = jax.jit(v1.reset)(key)
    assert bool(jnp.all(o0 == o1))

    def rollout(venv, cstate):
        def body(carry, t):
            cs, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (8,), 0, 5)
            cs, o, r, te, tr, i = venv.step(cs, a)
            return (cs, k), (o, r, te, tr)
        (cs, _), traj = jax.lax.scan(
            body, (cstate, jax.random.PRNGKey(1)), jnp.arange(28))
        return cs, traj

    s0, traj0 = jax.jit(lambda s: rollout(v0, s))(s0)
    s1, traj1 = jax.jit(lambda s: rollout(v1, s))(s1)
    for a, b in zip(traj0, traj1):
        assert bool(jnp.all(a == b))
    for a, b in zip(jax.tree.leaves(s0.env), jax.tree.leaves(s1.env)):
        assert bool(jnp.all(a == b))
    if pool == 32:
        # the stale window really was exercised
        assert bool(s1.spare_stale.any())


def test_curriculum_threshold_progression():
    """Meeting the threshold bumps it by the increment, capped at
    max_threshold; unmet thresholds stall."""
    env = PlantOS(EnvConfig(grid_size=9, num_plants=2, num_obstacles=0,
                            lidar_range=2, lidar_channels=4, max_steps=2))
    # Tiny initial threshold: the 1-cell start exploration (1/81 = 1.23%)
    # already meets it, so episode 1 completes the maze; the bumped
    # threshold (+5 -> 6%) then exceeds what a 2-step episode can explore
    # (<= 3/81 = 3.7%), so it stalls — exactly the progressive-curriculum
    # mechanics of `trainingCode.py:55-62`.
    ccfg = CurriculumConfig(initial_threshold=1.0, threshold_increment=5.0,
                            max_threshold=11.0, max_episodes_per_maze=50)
    venv = CurriculumVecPlantOS(env, 2, ccfg)
    cstate, obs, _ = venv.reset(jax.random.PRNGKey(4))
    step = jax.jit(venv.step)
    for _ in range(8):  # 4 episodes of 2 steps
        cstate, *_ = step(cstate, jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(cstate.threshold), 6.0)
    assert int(cstate.successful_explorations.sum()) == 2  # one per env
    # cap: with increment past the max, threshold clamps at max_threshold
    ccfg2 = CurriculumConfig(initial_threshold=1.0, threshold_increment=50.0,
                             max_threshold=11.0, max_episodes_per_maze=50)
    venv2 = CurriculumVecPlantOS(env, 2, ccfg2)
    cstate2, _, _ = venv2.reset(jax.random.PRNGKey(4))
    step2 = jax.jit(venv2.step)
    for _ in range(4):
        cstate2, *_ = step2(cstate2, jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(cstate2.threshold), 11.0)
