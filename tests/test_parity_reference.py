"""Golden parity tests against the ACTUAL reference environment.

The reference repo is imported read-only from /root/reference (with its
Ursina viewer stubbed) and driven side-by-side with the JAX env on the SAME
injected map and action sequence. Transitions, rewards, observations,
termination and info must match exactly (float32 vs float64 tolerance
only).

This is the strongest possible parity evidence: no re-implementation of the
oracle, the oracle IS the reference. Skipped when /root/reference is not
mounted.
"""

import random

import jax
import numpy as np
import pytest

from rlenv_tpu import EnvConfig, PlantOS
from tests.reference_oracle import extract_map, load_reference_env_class

RefEnv = load_reference_env_class()

pytestmark = pytest.mark.skipif(
    RefEnv is None, reason="/root/reference not available")


def _make_pair(seed, **env_kwargs):
    """Reference env reset on a random map + JAX env on the same map."""
    random.seed(seed)
    np.random.seed(seed)
    ref = RefEnv(**env_kwargs)
    ref_obs, ref_info = ref.reset(seed=seed)
    obstacles, plants, rover = extract_map(ref)
    cfg = EnvConfig(grid_size=env_kwargs.get("grid_size", 21),
                    num_plants=env_kwargs.get("num_plants", 8),
                    num_obstacles=env_kwargs.get("num_obstacles", 50),
                    lidar_range=env_kwargs.get("lidar_range", 2),
                    lidar_channels=env_kwargs.get("lidar_channels", 10))
    env = PlantOS(cfg)
    state, obs, info = env.reset_from_map(
        jax.random.PRNGKey(seed), obstacles, plants, rover)
    return ref, ref_obs, ref_info, env, state, obs, info


def _assert_info_match(ref_info, info):
    assert tuple(np.asarray(info["rover_position"])) == tuple(
        ref_info["rover_position"])
    for k in ("thirsty_plants", "hydrated_plants", "total_plants",
              "step_count", "explored_cells", "total_cells",
              "total_collisions"):
        assert int(info[k]) == int(ref_info[k]), k
    assert bool(info["collided_with_wall"]) == bool(
        ref_info["collided_with_wall"])
    assert float(info["exploration_percentage"]) == pytest.approx(
        float(ref_info["exploration_percentage"]), abs=1e-3)


@pytest.mark.parametrize("seed,kwargs", [
    (0, {}),                                                     # defaults
    (1, dict(grid_size=25, num_plants=10, num_obstacles=12,
             lidar_range=6, lidar_channels=16)),                 # training cfg
    (2, dict(grid_size=15, num_plants=5, num_obstacles=9,
             lidar_range=4, lidar_channels=12)),
])
def test_initial_obs_parity(seed, kwargs):
    ref, ref_obs, ref_info, env, state, obs, info = _make_pair(seed, **kwargs)
    np.testing.assert_allclose(np.asarray(obs), ref_obs, atol=1e-6)
    _assert_info_match(ref_info, info)
    ref.close()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_trajectory_parity_random_walk(seed):
    """400-step random-walk trajectories must match transition-for-transition
    on the training config (107-dim obs contract)."""
    ref, _, _, env, state, _, _ = _make_pair(
        seed, grid_size=25, num_plants=10, num_obstacles=12,
        lidar_range=6, lidar_channels=16)
    step = jax.jit(env.step)
    rng = np.random.default_rng(seed)
    for t in range(400):
        a = int(rng.integers(5))
        ref_obs, ref_r, ref_term, ref_trunc, ref_info = ref.step(a)
        state, obs, r, term, trunc, info = step(state, a)
        np.testing.assert_allclose(
            np.asarray(obs), ref_obs, atol=1e-6,
            err_msg=f"obs mismatch at t={t} action={a}")
        assert float(r) == pytest.approx(float(ref_r), abs=1e-4), f"t={t}"
        assert bool(term) == bool(ref_term), f"t={t}"
        assert bool(trunc) == bool(ref_trunc), f"t={t}"
        assert bool(info["is_watering"]) == bool(ref_info["is_watering"])
        _assert_info_match(ref_info, info)
        if bool(term) or bool(trunc):
            break
    ref.close()


@pytest.mark.parametrize("seed", [5, 6])
def test_trajectory_parity_exploring_policy(seed):
    """Parity under a greedy least-visited-neighbor policy, which reaches
    high exploration and exercises the completion-bonus path more often than
    a random walk."""
    ref, _, _, env, state, _, _ = _make_pair(
        seed, grid_size=11, num_plants=3, num_obstacles=6,
        lidar_range=6, lidar_channels=16)
    step = jax.jit(env.step)
    rng = np.random.default_rng(seed)
    dirs = [(-1, 0), (0, 1), (1, 0), (0, -1)]
    for t in range(600):
        # policy computed from the REFERENCE state (shared ground truth)
        x, y = ref.rover_pos
        g = ref.grid_size
        if rng.random() < 0.15:
            a = int(rng.integers(5))
        else:
            best, best_v = 4, np.inf
            for ai, (dx, dy) in enumerate(dirs):
                nx, ny = x + dx, y + dy
                if 0 <= nx < g and 0 <= ny < g and (nx, ny) not in ref.obstacles:
                    v = ref.visit_counts[nx, ny]
                    if v < best_v:
                        best, best_v = ai, v
            a = best
        ref_obs, ref_r, ref_term, ref_trunc, ref_info = ref.step(a)
        state, obs, r, term, trunc, info = step(state, a)
        np.testing.assert_allclose(np.asarray(obs), ref_obs, atol=1e-6,
                                   err_msg=f"t={t}")
        assert float(r) == pytest.approx(float(ref_r), abs=1e-4), f"t={t}"
        assert bool(term) == bool(ref_term) and bool(trunc) == bool(ref_trunc)
        if bool(term) or bool(trunc):
            assert float(info["exploration_percentage"]) == pytest.approx(
                float(ref_info["exploration_percentage"]), abs=1e-3)
            break
    ref.close()


@pytest.mark.parametrize("seed", [11, 12])
def test_trajectory_parity_on_maze_maps(seed):
    """Parity on maze-generated layouts (`plantos_env_new.py:408-604`):
    the reference generates the maze, both envs run it."""
    random.seed(seed)
    np.random.seed(seed)
    ref = RefEnv(grid_size=25, num_plants=10, num_obstacles=12,
                 lidar_range=6, lidar_channels=16,
                 map_generation_algo="maze")
    ref.reset(seed=seed)
    obstacles, plants, rover = extract_map(ref)
    cfg = EnvConfig(grid_size=25, num_plants=10, num_obstacles=12,
                    lidar_range=6, lidar_channels=16)
    env = PlantOS(cfg)
    state, obs, _ = env.reset_from_map(jax.random.PRNGKey(seed), obstacles,
                                       plants, rover)
    step = jax.jit(env.step)
    rng = np.random.default_rng(seed)
    for t in range(250):
        a = int(rng.integers(5))
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref.step(a)
        state, obs, r, term, trunc, _ = step(state, a)
        np.testing.assert_allclose(np.asarray(obs), ref_obs, atol=1e-6,
                                   err_msg=f"t={t}")
        assert float(r) == pytest.approx(float(ref_r), abs=1e-4)
        assert bool(term) == bool(ref_term) and bool(trunc) == bool(ref_trunc)
        if bool(term) or bool(trunc):
            break
    ref.close()


def test_lidar_offset_truncation_parity():
    """The int() truncation geometry (`plantos_env_new.py:287-289`) —
    including rays whose first probe is the rover's own cell — must match
    CPython exactly for every channel/range used by shipped checkpoints."""
    import math

    from rlenv_tpu.env.lidar import lidar_offsets

    for C, R in [(10, 2), (16, 6), (12, 4), (7, 5)]:
        table = lidar_offsets(C, R)
        for i in range(C):
            angle = 2 * math.pi * i / C
            for r in range(1, R + 1):
                assert table[i, r - 1, 0] == int(r * math.cos(angle))
                assert table[i, r - 1, 1] == int(r * math.sin(angle))
