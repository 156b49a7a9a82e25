"""Fused MCTS path: rollout-kernel parity and batch-search semantics.

The rollout kernel (`rlenv_tpu/ops/mcts_rollout.py`) and its XLA mirror
consume the SAME streamed random bits with the same integer arithmetic, so
their float32 returns must be BIT-identical (the mirror goes through
``PlantOS.step`` on unpacked state — a genuinely independent oracle).
Kernels run in Pallas interpret mode on the CPU test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import EnvConfig, MCTSConfig
from rlenv_tpu.algos.mcts import MCTSPlanner
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.ops.fused_step import pack_state
from rlenv_tpu.ops.mcts_rollout import (build_mcts_rollout,
                                        rollout_returns_xla)


def _reset_batch(env, B, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    states, _, _ = jax.vmap(env.reset)(keys)
    return states


def test_rollout_kernel_matches_xla_mirror():
    """Kernel rollout returns == XLA-mirror returns, bitwise, including
    mid-rollout termination/truncation freezing and nonzero start depths."""
    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=12)
    env = PlantOS(cfg)
    B, K = 8, 20   # max_steps < K => truncation freezes lanes mid-rollout
    states = _reset_batch(env, B)
    flat = pack_state(states, cfg.grid_size)
    d0 = jnp.asarray([0, 1, 3, 0, 7, 0, 20, 2], jnp.int32)
    rand = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(42), (K, 3, B), jnp.uint32),
        jnp.int32)

    kernel = build_mcts_rollout(cfg, B, K, heuristic_prob=0.7,
                                completion_bonus=500.0, interpret=True)
    got = jax.jit(kernel)(flat, d0, rand)
    want = jax.jit(lambda s, d, r: rollout_returns_xla(
        env, s, d, r, K, heuristic_prob=0.7, completion_bonus=500.0)
    )(states, d0, rand)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # sanity: lanes starting at d0 == K accumulate nothing
    assert float(got[6]) == 0.0


def test_rollout_kernel_completion_bonus():
    """A rover one step from full exploration earns the +500 rollout bonus
    (`mcts_custom_trainer.py:162-164`) plus the env's own completion
    reward; the kernel and mirror agree bitwise."""
    cfg = EnvConfig(grid_size=5, num_plants=1, num_obstacles=0,
                    lidar_range=2, lidar_channels=4, max_steps=100)
    env = PlantOS(cfg)
    B, K = 4, 30
    states = _reset_batch(env, B, seed=3)
    flat = pack_state(states, cfg.grid_size)
    d0 = jnp.zeros(B, jnp.int32)
    rand = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(7), (K, 3, B), jnp.uint32),
        jnp.int32)
    kernel = build_mcts_rollout(cfg, B, K, interpret=True)
    got = jax.jit(kernel)(flat, d0, rand)
    want = rollout_returns_xla(env, states, d0, rand, K)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # On a 5x5 open grid, 30 heuristic-guided steps explore a lot; at
    # least one lane should finish and collect the +500 bonus.
    assert float(jnp.max(got)) > 400.0


def test_fused_search_plans_reasonably():
    """Batch-major fused search returns valid actions and explores at
    least as well as random actions (same sanity bar as the XLA-search
    test in test_algos.py)."""
    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=60)
    env = PlantOS(cfg)
    planner = MCTSPlanner(env, MCTSConfig(n_simulations=12, max_depth=10,
                                          max_nodes=32), interpret=True)
    B = 4
    states = _reset_batch(env, B, seed=1)
    v_step = jax.jit(jax.vmap(env.step))
    key = jax.random.PRNGKey(0)

    expl_mcts = None
    for _ in range(15):
        key, k = jax.random.split(key)
        actions = planner.search_batch_fused(states, k)
        assert actions.shape == (B,)
        assert bool(jnp.all((actions >= 0) & (actions < 5)))
        states, _, _, _, _, info = v_step(states, actions)
        expl_mcts = info["exploration_percentage"]

    rstates = _reset_batch(env, B, seed=1)
    key = jax.random.PRNGKey(0)
    expl_rand = None
    for _ in range(15):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (B,), 0, 5)
        rstates, _, _, _, _, info = v_step(rstates, actions)
        expl_rand = info["exploration_percentage"]

    assert float(jnp.mean(expl_mcts)) >= float(jnp.mean(expl_rand)) - 1e-6


def test_policy_guided_rollouts():
    """An MCTSPlanner with a trained rollout prior (policy-guided
    rollouts) searches deterministically and actually consults the
    prior: with rollout_policy_prob=1 and a prior that scores 'water'
    (action 4) highest, rollout trajectories differ from the 70/30
    heuristic's, shifting the root decision for some seeds."""
    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=2,
                    lidar_range=2, lidar_channels=4, max_steps=30)
    env = PlantOS(cfg)
    mcfg = dict(n_simulations=8, max_depth=12, max_nodes=16)
    prior = lambda obs: jnp.array([0.0, 0.0, 0.0, 0.0, 10.0])
    plain = MCTSPlanner(env, MCTSConfig(**mcfg))
    guided = MCTSPlanner(env, MCTSConfig(rollout_policy_prob=1.0, **mcfg),
                         rollout_policy=prior)
    states, _, _ = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(0), 8))
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    a_plain = np.asarray(plain.search_batch(states, keys))
    a_guided = np.asarray(guided.search_batch(states, keys))
    a_guided2 = np.asarray(guided.search_batch(states, keys))
    np.testing.assert_array_equal(a_guided, a_guided2)  # deterministic
    assert ((a_guided >= 0) & (a_guided < 5)).all()
    assert not np.array_equal(a_plain, a_guided)  # the prior mattered


def test_guided_rollout_kernel_matches_xla_mirror():
    """Policy-guided rollout kernel (prior MLP evaluated in-kernel on the
    in-kernel observation, round 5) == extended XLA mirror, bitwise; the
    emitted leaf observation equals ``env.observe`` of the start state."""
    from rlenv_tpu.models import QNetwork
    from rlenv_tpu.ops.actor_rollout import (pack_mlp_policy,
                                             qnet_policy_layers)

    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=30)
    env = PlantOS(cfg)
    B, K = 8, 10
    states = _reset_batch(env, B, seed=3)
    flat = pack_state(states, cfg.grid_size)
    obs = jax.vmap(env.observe)(states)
    net = QNetwork(num_actions=5, hidden_sizes=(16,))
    params = net.init(jax.random.PRNGKey(1), obs)
    ws, bs = pack_mlp_policy(cfg, qnet_policy_layers(params))
    d0 = jnp.asarray([0, 1, 3, 0, 5, 0, 10, 2], jnp.int32)
    rand = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(7), (K, 4, B), jnp.uint32),
        jnp.int32)

    kernel = build_mcts_rollout(cfg, B, K, guided_layers=len(ws),
                                guided_prob=0.8, emit_leaf_obs=True,
                                interpret=True, block_envs=B)
    got, leaf_obs = jax.jit(
        lambda f, d, r, w, b: kernel(f, d, r, w, b))(flat, d0, rand, ws, bs)
    want = jax.jit(lambda s, d, r: rollout_returns_xla(
        env, s, d, r, K, guided_ws=ws, guided_bs=bs, guided_prob=0.8)
    )(states, d0, rand)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # compare under jit on both sides: XLA rewrites the position
    # normalization's divide-by-constant to multiply-by-reciprocal
    # inside compiled programs, so EAGER env.observe differs in the
    # last ulp of x/g (every production consumer is jitted)
    obs_jit = jax.jit(jax.vmap(env.observe))(states)
    np.testing.assert_array_equal(np.asarray(leaf_obs),
                                  np.asarray(obs_jit))


def test_fused_search_guided_with_leaf_value():
    """The fused search runs the prior in-kernel and mixes the leaf value
    off the kernel-emitted observation: deterministic, valid actions, and
    the prior/value change the decision vs the plain fused search."""
    from rlenv_tpu.models import QNetwork
    from rlenv_tpu.ops.actor_rollout import qnet_policy_layers

    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=2,
                    lidar_range=2, lidar_channels=4, max_steps=30)
    env = PlantOS(cfg)
    B = 8
    states = _reset_batch(env, B, seed=5)
    obs = jax.vmap(env.observe)(states)
    net = QNetwork(num_actions=5, hidden_sizes=(16,))
    params = net.init(jax.random.PRNGKey(2), obs)
    layers = qnet_policy_layers(params)
    leaf = lambda o: jnp.max(net.apply(params, o))
    mcfg = dict(n_simulations=8, max_depth=10, max_nodes=16)

    plain = MCTSPlanner(env, MCTSConfig(**mcfg), interpret=True)
    guided = MCTSPlanner(
        env, MCTSConfig(rollout_policy_prob=1.0, leaf_value_mix=0.5,
                        **mcfg),
        leaf_value=leaf, rollout_policy_layers=(layers, "relu"),
        interpret=True)
    k = jax.random.PRNGKey(9)
    a_plain = np.asarray(plain.search_batch_fused(states, k))
    a_guided = np.asarray(guided.search_batch_fused(states, k))
    a_guided2 = np.asarray(guided.search_batch_fused(states, k))
    np.testing.assert_array_equal(a_guided, a_guided2)  # deterministic
    assert ((a_guided >= 0) & (a_guided < 5)).all()
    assert not np.array_equal(a_plain, a_guided)  # the levers mattered

    # pure value bootstrap (mix >= 1): rollouts skipped — the fused
    # search builds a 1-step leaf-obs-only kernel and still plans
    pure = MCTSPlanner(env, MCTSConfig(leaf_value_mix=1.0, **mcfg),
                       leaf_value=leaf, interpret=True)
    a_pure = np.asarray(pure.search_batch_fused(states, k))
    assert ((a_pure >= 0) & (a_pure < 5)).all()


def test_fused_search_puct_selection():
    """PUCT selection (puct_c > 0 + a batch-capable prior) runs, is
    deterministic, and changes decisions vs UCB1 with the same levers;
    puct_c=0 stays bit-identical UCB1 (covered by the other tests)."""
    from rlenv_tpu.models import QNetwork

    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=2,
                    lidar_range=2, lidar_channels=4, max_steps=30)
    env = PlantOS(cfg)
    B = 8
    states = _reset_batch(env, B, seed=11)
    obs = jax.vmap(env.observe)(states)
    net = QNetwork(num_actions=5, hidden_sizes=(16,))
    params = net.init(jax.random.PRNGKey(3), obs)
    prior = lambda o: net.apply(params, o)
    mcfg = dict(n_simulations=10, max_depth=10, max_nodes=16,
                rollout_policy_prob=0.8)

    ucb1 = MCTSPlanner(env, MCTSConfig(**mcfg), rollout_policy=prior,
                       interpret=True)
    puct = MCTSPlanner(env, MCTSConfig(puct_c=2.5, puct_prior_temp=50.0,
                                       **mcfg),
                       rollout_policy=prior, interpret=True)
    k = jax.random.PRNGKey(13)
    a_ucb = np.asarray(ucb1.search_batch_fused(states, k))
    a_puct = np.asarray(puct.search_batch_fused(states, k))
    a_puct2 = np.asarray(puct.search_batch_fused(states, k))
    np.testing.assert_array_equal(a_puct, a_puct2)
    assert ((a_puct >= 0) & (a_puct < 5)).all()
    assert not np.array_equal(a_ucb, a_puct)  # selection rule mattered
