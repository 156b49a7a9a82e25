"""Core environment unit tests.

Covers (and extends) the reference's hand-rolled suite
(`/root/reference/test_environment.py`): construction, spaces, reset
invariants, step API, reward bounds, termination, LIDAR content validity,
exploration monotonicity — plus jit/vmap equivalence the reference has no
analogue for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlenv_tpu import EnvConfig, PlantOS, RewardConfig


@pytest.fixture(scope="module")
def env():
    return PlantOS(EnvConfig.training())


@pytest.fixture(scope="module")
def small_env():
    return PlantOS(EnvConfig(grid_size=11, num_plants=4, num_obstacles=9,
                             lidar_range=2, lidar_channels=10))


def test_config_defaults():
    cfg = EnvConfig()
    assert cfg.grid_size == 21
    assert cfg.num_plants == 8
    assert cfg.num_obstacles == 50
    assert cfg.lidar_range == 2
    assert cfg.lidar_channels == 10
    assert cfg.obs_dim == 10 * 5 + 2 + 25  # 77
    assert cfg.num_actions == 5


def test_training_config_obs_dim():
    cfg = EnvConfig.training()
    assert cfg.obs_dim == 16 * 5 + 2 + 25  # 107 (README.md:22-35)


def test_reward_presets():
    dqn = RewardConfig.dqn()
    assert (dqn.goal, dqn.mistake, dqn.invalid, dqn.water_empty) == (20, -10, -5, -5)
    a2c = RewardConfig.a2c()
    assert (a2c.goal, a2c.complete_exploration) == (200, 100)
    ppo = RewardConfig.recurrent_ppo()
    assert (ppo.step, ppo.revisit) == (-0.05, -0.5)


def test_config_validation():
    with pytest.raises(ValueError):
        EnvConfig(grid_size=3)
    with pytest.raises(ValueError):
        EnvConfig(map_generation_algo="bogus")
    with pytest.raises(ValueError):
        EnvConfig(grid_size=5, num_plants=30, num_obstacles=0)


def test_reset_invariants(env):
    state, obs, info = env.reset(jax.random.PRNGKey(0))
    cfg = env.config
    assert obs.shape == (cfg.obs_dim,)
    assert obs.dtype == jnp.float32
    assert bool(jnp.all((obs >= 0) & (obs <= 1)))
    # plant conservation
    assert int(info["total_plants"]) == cfg.num_plants
    assert int(info["thirsty_plants"] + info["hydrated_plants"]) == cfg.num_plants
    # rover on a free, plant-less cell
    r = np.asarray(state.rover)
    assert 0 <= r[0] < cfg.grid_size and 0 <= r[1] < cfg.grid_size
    assert not bool(state.obstacles[r[0], r[1]])
    assert int(state.plants[r[0], r[1]]) == 0
    # initial exploration: exactly the start cell
    assert int(info["explored_cells"]) == 1
    assert float(info["exploration_percentage"]) > 0
    assert int(info["total_cells"]) == cfg.grid_size ** 2 - int(
        jnp.sum(state.obstacles))


def test_reset_deterministic(env):
    s1, o1, _ = env.reset(jax.random.PRNGKey(42))
    s2, o2, _ = env.reset(jax.random.PRNGKey(42))
    assert bool(jnp.all(s1.obstacles == s2.obstacles))
    assert bool(jnp.all(s1.plants == s2.plants))
    assert bool(jnp.all(s1.rover == s2.rover))
    assert bool(jnp.all(o1 == o2))
    s3, _, _ = env.reset(jax.random.PRNGKey(43))
    assert not (bool(jnp.all(s1.obstacles == s3.obstacles))
                and bool(jnp.all(s1.rover == s3.rover)))


def test_step_api_and_reward_bounds(env):
    state, _, _ = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = int(rng.integers(5))
        state, obs, reward, term, trunc, info = step(state, jnp.int32(a))
        assert obs.shape == (env.config.obs_dim,)
        assert -110 <= float(reward) <= 300  # test_environment.py:135
        assert term.dtype == jnp.bool_ and trunc.dtype == jnp.bool_
        assert bool(info["is_watering"]) == (a == 4)
        if bool(term) or bool(trunc):
            break


def test_movement_semantics(small_env):
    """Scripted transition checks on a hand-built map."""
    g = small_env.config.grid_size
    obstacles = np.zeros((g, g), bool)
    obstacles[5, 6] = True  # east of start
    plants = np.zeros((g, g), np.int8)
    plants[4, 5] = 2  # thirsty plant north of start
    state, _, _ = small_env.reset_from_map(
        jax.random.PRNGKey(0), obstacles, plants, np.array([5, 5]))
    R = small_env.config.rewards

    # collide with obstacle to the east
    s, _, r, term, trunc, info = small_env.step(state, 1)
    assert float(r) == pytest.approx(R.step + R.invalid)
    assert bool(info["collided_with_wall"]) and int(info["total_collisions"]) == 1
    assert tuple(np.asarray(s.rover)) == (5, 5)

    # move north onto the plant cell: new cell => exploration bonus
    s2, _, r, *_ = small_env.step(s, 0)
    assert float(r) == pytest.approx(R.step + R.exploration)
    assert tuple(np.asarray(s2.rover)) == (4, 5)

    # water the thirsty plant
    s3, _, r, _, _, info = small_env.step(s2, 4)
    assert float(r) == pytest.approx(R.step + R.goal)
    assert int(info["thirsty_plants"]) == 0
    assert int(info["hydrated_plants"]) == 1
    assert bool(info["is_watering"])

    # water again: now hydrated => mistake
    s4, _, r, *_ = small_env.step(s3, 4)
    assert float(r) == pytest.approx(R.step + R.mistake)

    # move back south: revisit penalty
    s5, _, r, *_ = small_env.step(s4, 2)
    assert float(r) == pytest.approx(R.step + R.revisit)

    # water empty ground
    _, _, r, *_ = small_env.step(s5, 4)
    assert float(r) == pytest.approx(R.step + R.water_empty)


def test_out_of_bounds_collision(small_env):
    g = small_env.config.grid_size
    state, _, _ = small_env.reset_from_map(
        jax.random.PRNGKey(0), np.zeros((g, g), bool),
        np.zeros((g, g), np.int8), np.array([0, 0]))
    R = small_env.config.rewards
    _, _, r, *_ = small_env.step(state, 0)  # north off the edge
    assert float(r) == pytest.approx(R.step + R.invalid)
    _, _, r, *_ = small_env.step(state, 3)  # west off the edge
    assert float(r) == pytest.approx(R.step + R.invalid)


def test_completion_bonus_once():
    """Walk a tiny obstacle-free map to 100% exploration; the completion
    bonus fires exactly once (`plantos_env_new.py:190-195`)."""
    cfg = EnvConfig(grid_size=5, num_plants=1, num_obstacles=0,
                    lidar_range=2, lidar_channels=4, max_steps=1000)
    env = PlantOS(cfg)
    g = cfg.grid_size
    plants = np.zeros((g, g), np.int8)
    plants[0, 0] = 1
    state, _, _ = env.reset_from_map(
        jax.random.PRNGKey(0), np.zeros((g, g), bool), plants,
        np.array([0, 0]))
    # boustrophedon sweep covering all 25 cells
    actions = []
    for row in range(g):
        actions += [1 if row % 2 == 0 else 3] * (g - 1)
        if row < g - 1:
            actions.append(2)
    total = 0.0
    terminated = False
    for a in actions:
        state, _, r, term, trunc, info = env.step(state, a)
        total += float(r)
        if bool(term):
            terminated = True
    assert terminated
    assert float(info["exploration_percentage"]) == pytest.approx(100.0)
    R = cfg.rewards
    n = len(actions)
    expected = n * R.step + n * R.exploration + R.complete_exploration
    assert total == pytest.approx(expected, abs=1e-3)
    # stepping again must not re-award the bonus
    state, _, r, term, _, _ = env.step(state, 3)
    assert bool(term)  # still fully explored
    assert float(r) == pytest.approx(R.step + R.revisit)


def test_truncation():
    cfg = EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=7)
    env = PlantOS(cfg)
    state, _, _ = env.reset(jax.random.PRNGKey(0))
    for i in range(7):
        state, _, _, _, trunc, _ = env.step(state, 4)  # water in place
        assert bool(trunc) == (i == 6)


def test_lidar_obs_structure(env):
    state, obs, _ = env.reset(jax.random.PRNGKey(3))
    C = env.config.lidar_channels
    lidar = np.asarray(obs[:C * 5]).reshape(C, 5)
    assert np.all((lidar[:, 0] >= 0) & (lidar[:, 0] <= 1))
    onehot = lidar[:, 1:]
    assert np.allclose(onehot.sum(axis=1), 1.0)
    assert np.all((onehot == 0) | (onehot == 1))
    # position block normalized
    pos = np.asarray(obs[C * 5:C * 5 + 2])
    assert np.all((pos >= 0) & (pos < 1))
    # visit map: center cell is the rover's (visited once => 0.1)
    vm = np.asarray(obs[C * 5 + 2:]).reshape(5, 5)
    assert vm[2, 2] == pytest.approx(0.1)


def test_exploration_monotonic(env):
    state, _, info = env.reset(jax.random.PRNGKey(5))
    prev = float(info["exploration_percentage"])
    rng = np.random.default_rng(7)
    for _ in range(100):
        state, _, _, term, trunc, info = env.step(
            state, int(rng.integers(5)))
        cur = float(info["exploration_percentage"])
        assert cur >= prev - 1e-6
        prev = cur
        if bool(term) or bool(trunc):
            break


def test_jit_matches_eager(env):
    state, _, _ = env.reset(jax.random.PRNGKey(11))
    jstep = jax.jit(env.step)
    s_e, s_j = state, state
    rng = np.random.default_rng(11)
    for _ in range(30):
        a = jnp.int32(int(rng.integers(5)))
        s_e, o_e, r_e, te, tre, _ = env.step(s_e, a)
        s_j, o_j, r_j, tj, trj, _ = jstep(s_j, a)
        # XLA may fuse divisions differently under jit (x/g -> x*(1/g));
        # allow one-ulp drift.
        np.testing.assert_allclose(np.asarray(o_e), np.asarray(o_j),
                                   atol=1e-6)
        assert float(r_e) == pytest.approx(float(r_j), abs=1e-5)
        assert bool(te) == bool(tj) and bool(tre) == bool(trj)


def test_vmap_matches_single(env):
    """A vmapped batch of envs steps identically to stepping each alone."""
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(21), B)
    v_reset = jax.vmap(env.reset)
    states, obs, _ = v_reset(keys)
    v_step = jax.jit(jax.vmap(env.step))
    rng = np.random.default_rng(3)
    actions = jnp.asarray(rng.integers(0, 5, size=(20, B)), jnp.int32)
    single_states = [jax.tree.map(lambda x: x[i], states) for i in range(B)]
    for t in range(20):
        states, obs, rew, term, trunc, _ = v_step(states, actions[t])
        for i in range(B):
            s, o, r, te, tr, _ = env.step(single_states[i], actions[t][i])
            single_states[i] = s
            np.testing.assert_allclose(np.asarray(o), np.asarray(obs[i]),
                                       atol=1e-6)
            assert float(r) == pytest.approx(float(rew[i]), abs=1e-5)
