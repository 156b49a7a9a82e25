"""Policy-in-kernel actor rollout: parity in Pallas interpret mode.

Two halves, each pinned exactly (see ops/actor_rollout.py docstring):

* env half — replaying the actor kernel's recorded action stream through
  the plain action-driven rollout kernel must reproduce its rewards,
  returns and final state BIT-exactly (same transition body, same freeze
  semantics);
* policy half — every recorded action must equal the argmax of a
  same-operand-order forward (``W @ x_T`` in kernel obs layout) on the
  replayed observation stream. Same order => exact equality even in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlenv_tpu.config import A2CConfig, DQNConfig, EnvConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.fused_vector import FusedVecPlantOS
from rlenv_tpu.models import ActorCritic, QNetwork
from rlenv_tpu.ops.actor_rollout import (actor_critic_policy_layers,
                                         build_actor_rollout,
                                         pack_mlp_policy,
                                         qnet_policy_layers)
from rlenv_tpu.ops.fused_step import build_fused_rollout

B, K = 8, 10


@pytest.fixture(scope="module")
def qnet_run():
    config = EnvConfig.training(max_steps=40)
    env = PlantOS(config)
    fenv = FusedVecPlantOS(env, B, interpret=True)
    flat, obs0, _ = fenv.reset(jax.random.PRNGKey(0))
    net = QNetwork(num_actions=config.num_actions, hidden_sizes=(32, 16))
    params = net.init(jax.random.PRNGKey(1), obs0)
    ws, bs = pack_mlp_policy(config, qnet_policy_layers(params))
    actor = build_actor_rollout(config, B, K, n_layers=len(ws),
                                activation="relu", interpret=True)
    out = jax.jit(actor)(flat, obs0, ws, bs)
    return config, flat, obs0, ws, bs, out


def _same_order_forward(config, obs_ref, ws, bs, activation):
    """Reference-layout obs -> greedy action through THE shared forward
    (`fused_step._mlp_greedy_rows`) after the kernel-layout scatter —
    the same code path the kernels run, so equality is exact."""
    from rlenv_tpu.ops.fused_step import (_lane_pad, _mlp_greedy_rows,
                                          _obs_permutation)
    perm = _obs_permutation(config)
    act = jnp.tanh if activation == "tanh" else \
        (lambda v: jnp.maximum(v, 0.0))
    x = jnp.zeros((obs_ref.shape[0], _lane_pad(config.obs_dim))
                  ).at[:, perm].set(obs_ref).T
    _, a = _mlp_greedy_rows(x, ws, bs, act, config.num_actions)
    return a[0]


def test_actor_rollout_env_half_replay_parity(qnet_run):
    config, flat, obs0, ws, bs, out = qnet_run
    flat2, last_obs, ret, actions, rewards = out
    rollout = jax.jit(build_fused_rollout(config, B, K, interpret=True))
    flat3, obs_seq, rew2, term2, trunc2, water2 = rollout(flat, actions)
    np.testing.assert_array_equal(np.asarray(rewards), np.asarray(rew2))
    np.testing.assert_array_equal(np.asarray(flat2.rolled),
                                  np.asarray(flat3.rolled))
    np.testing.assert_array_equal(np.asarray(flat2.scal),
                                  np.asarray(flat3.scal))
    np.testing.assert_allclose(np.asarray(ret),
                               np.asarray(rew2).sum(0), rtol=1e-6)
    # the resident last-obs block equals the replayed final observation
    np.testing.assert_array_equal(np.asarray(last_obs),
                                  np.asarray(obs_seq[-1]))


def test_actor_rollout_policy_half_argmax_parity(qnet_run):
    config, flat, obs0, ws, bs, out = qnet_run
    _, _, _, actions, _ = out
    rollout = jax.jit(build_fused_rollout(config, B, K, interpret=True))
    _, obs_seq, *_ = rollout(flat, actions)
    obs_prev = np.concatenate([np.asarray(obs0)[None],
                               np.asarray(obs_seq)[:-1]])
    fwd = jax.jit(lambda o: _same_order_forward(config, o, ws, bs, "relu"))
    for k in range(K):
        np.testing.assert_array_equal(
            np.asarray(actions)[k], np.asarray(fwd(jnp.asarray(obs_prev[k]))),
            err_msg=f"step {k}")


def test_actor_rollout_actor_critic_tanh():
    """ActorCritic pi-tower extraction drives the kernel (tanh path)."""
    config = EnvConfig.training(max_steps=40)
    env = PlantOS(config)
    fenv = FusedVecPlantOS(env, B, interpret=True)
    flat, obs0, _ = fenv.reset(jax.random.PRNGKey(5))
    net = ActorCritic(num_actions=config.num_actions, hidden_sizes=(16,))
    params = net.init(jax.random.PRNGKey(6), obs0)
    ws, bs = pack_mlp_policy(config, actor_critic_policy_layers(params))
    actor = build_actor_rollout(config, B, 4, n_layers=len(ws),
                                activation="tanh", interpret=True)
    _, _, ret, actions, rewards = jax.jit(actor)(flat, obs0, ws, bs)
    # greedy head of the flax forward, step 0 (same obs both sides)
    logits, _ = net.apply(params, obs0)
    a0 = np.asarray(jnp.argmax(logits, axis=-1))
    got = np.asarray(actions)[0]
    # f32 summation order differs from flax's x @ W here, so allow
    # knife-edge ties to flip only where the top-2 gap is ~eps
    gap = np.sort(np.asarray(logits), axis=-1)
    knife = (gap[:, -1] - gap[:, -2]) < 1e-5
    np.testing.assert_array_equal(got[~knife], a0[~knife])
    assert np.isfinite(np.asarray(ret)).all()


def test_fused_eval_fn_contract():
    """make_fused_eval_fn: deterministic, width-padded, finite returns."""
    from rlenv_tpu.train.trainer import (make_fused_eval_fn, make_trainer,
                                         make_venv)
    env_config = EnvConfig.training(max_steps=8)
    venv = make_venv(env_config, 8, use_curriculum=False, fused=False)
    trainer = make_trainer("dqn", venv, DQNConfig(hidden_sizes=(16,),
                                                  buffer_size=256))
    state = jax.jit(trainer.init)(jax.random.PRNGKey(0))
    eval_fn = make_fused_eval_fn(trainer, env_config, n_eval_episodes=5,
                                 use_curriculum=True, interpret=True)
    r1 = np.asarray(eval_fn(state.params, jnp.int32(7)))
    r2 = np.asarray(eval_fn(state.params, jnp.int32(7)))
    assert r1.shape == (8,)  # padded up to a lane-friendly width
    np.testing.assert_array_equal(r1, r2)
    assert np.isfinite(r1).all()
    # a different seed evaluates different episodes
    r3 = np.asarray(eval_fn(state.params, jnp.int32(8)))
    assert not np.array_equal(r1, r3)


def test_sharded_actor_rollout_parity():
    """The dp-sharded policy-in-kernel loop (env batch over 'data',
    weights replicated) produces per-env outputs bit-identical to the
    single-device actor — the correctness gate for running the full
    agent loop on N chips with no new code."""
    from rlenv_tpu.ops.actor_rollout import build_sharded_actor_rollout
    from rlenv_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the multi-device CPU mesh")
    config = EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                       lidar_range=2, lidar_channels=4, max_steps=6)
    env = PlantOS(config)
    Bs, K = n_dev * 2, 6
    mesh = make_mesh(n_dev, model_parallel=1)
    net = QNetwork(num_actions=5, hidden_sizes=(16,))

    reset_fn, actor_fn = build_sharded_actor_rollout(
        env, Bs, mesh, K, n_layers=2, interpret=True)
    key = jax.random.PRNGKey(4)
    s_flat, s_obs = jax.jit(reset_fn)(key)
    params = net.init(jax.random.PRNGKey(1), s_obs)
    ws, bs = pack_mlp_policy(config, qnet_policy_layers(params))
    s_out = jax.jit(actor_fn)(s_flat, s_obs, tuple(ws), tuple(bs))

    fenv = FusedVecPlantOS(env, Bs, interpret=True)
    r_flat, r_obs, _ = fenv.reset(key)
    np.testing.assert_array_equal(np.asarray(r_obs), np.asarray(s_obs))
    actor = build_actor_rollout(config, Bs, K, n_layers=2, interpret=True,
                                block_envs=Bs // n_dev)
    r_out = jax.jit(actor)(r_flat, r_obs, ws, bs)

    for got, want, name in zip(s_out, r_out,
                               ("rolled", "last_obs", "returns",
                                "actions", "rewards")):
        if name == "rolled":
            np.testing.assert_array_equal(np.asarray(got.rolled),
                                          np.asarray(want.rolled))
            np.testing.assert_array_equal(np.asarray(got.scal),
                                          np.asarray(want.scal))
        else:
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want), err_msg=name)
