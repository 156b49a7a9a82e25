"""Fused Pallas step kernel vs the XLA path: bit-exact parity.

Runs the kernel in Pallas interpret mode on CPU and demands exact equality
of observation, reward, termination flags, info and full state against
:class:`rlenv_tpu.env.vector.VecPlantOS` over random rollouts that include
auto-resets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.fused_vector import FusedVecPlantOS
from rlenv_tpu.env.vector import VecPlantOS
from rlenv_tpu.ops.fused_step import pack_state, unpack_state

N_ENVS = 16


@pytest.fixture(scope="module")
def envs():
    config = EnvConfig.training(max_steps=40)  # short episodes: auto-resets
    env = PlantOS(config)
    return (VecPlantOS(env, N_ENVS),
            FusedVecPlantOS(env, N_ENVS, interpret=True))


def _assert_state_equal(ref_states, flat, g):
    got = unpack_state(flat, g)
    for field in ("obstacles", "plants", "rover", "visit_counts", "explored",
                  "explored_count", "free_cells", "thirsty_count",
                  "total_plants", "step_count", "completion_bonus_given",
                  "collided_with_wall", "total_collisions"):
        a = np.asarray(getattr(ref_states, field))
        b = np.asarray(getattr(got, field))
        np.testing.assert_array_equal(a, b.astype(a.dtype), err_msg=field)


def test_pack_unpack_roundtrip(envs):
    venv, _ = envs
    states, _, _ = venv.reset(jax.random.PRNGKey(3))
    g = venv.env.config.grid_size
    _assert_state_equal(states, pack_state(states, g), g)


def _step_parity(envs, horizon):
    venv, fenv = envs
    g = venv.env.config.grid_size
    key = jax.random.PRNGKey(0)
    ref_states, ref_obs, _ = venv.reset(key)
    flat, fused_obs, _ = fenv.reset(key)
    np.testing.assert_array_equal(np.asarray(ref_obs), np.asarray(fused_obs))

    ref_step = jax.jit(venv.step)
    # jit the interpret-mode pallas step: one compile (persistently
    # cached) instead of ~6 s of op-by-op interpretation PER STEP.
    fused_step = jax.jit(fenv.step)

    rng = np.random.default_rng(7)
    for t in range(horizon):
        # Bias toward movement but include watering.
        actions = jnp.asarray(rng.integers(0, 5, size=N_ENVS), jnp.int32)
        ref_states, ref_obs, ref_r, ref_te, ref_tr, ref_info = ref_step(
            ref_states, actions)
        flat, fused_obs, f_r, f_te, f_tr, f_info = fused_step(flat, actions)

        np.testing.assert_array_equal(
            np.asarray(ref_obs), np.asarray(fused_obs), err_msg=f"obs t={t}")
        np.testing.assert_array_equal(
            np.asarray(ref_r), np.asarray(f_r), err_msg=f"reward t={t}")
        np.testing.assert_array_equal(np.asarray(ref_te), np.asarray(f_te))
        np.testing.assert_array_equal(np.asarray(ref_tr), np.asarray(f_tr))
        for k in ("exploration_percentage", "thirsty_plants", "step_count",
                  "total_collisions", "done"):
            np.testing.assert_array_equal(
                np.asarray(ref_info[k]), np.asarray(f_info[k]),
                err_msg=f"info[{k}] t={t}")
        np.testing.assert_array_equal(
            np.asarray(ref_info["final_obs"]),
            np.asarray(f_info["final_obs"]), err_msg=f"final_obs t={t}")
        _assert_state_equal(ref_states, flat, g)


def test_fused_step_parity_smoke(envs):
    """Short-horizon bit-exactness (fast path; no auto-reset coverage)."""
    _step_parity(envs, 6)


@pytest.mark.slow
def test_fused_step_parity(envs):
    """Full-horizon bit-exactness incl. auto-reset (> max_steps=40)."""
    _step_parity(envs, 60)


def test_fused_watering_parity(envs):
    """Watering on thirsty/hydrated/empty cells gives identical rewards."""
    venv, fenv = envs
    key = jax.random.PRNGKey(42)
    ref_states, _, _ = venv.reset(key)
    flat, _, _ = fenv.reset(key)
    water = jnp.full((N_ENVS,), 4, jnp.int32)
    ref_step, f_step = jax.jit(venv.step), jax.jit(fenv.step)
    for _ in range(3):
        ref_states, _, ref_r, *_ = ref_step(ref_states, water)
        flat, _, f_r, *_ = f_step(flat, water)
        np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(f_r))


@pytest.mark.parametrize("use_curriculum", [False, True])
def test_train_a2c_fused(tmp_path, use_curriculum):
    """A2C trains end-to-end on the fused-kernel env (interpret mode),
    with and without the curriculum wrapper."""
    from rlenv_tpu.train.trainer import train

    _, result = train(algo="a2c", total_timesteps=80, n_envs=8,
                      use_curriculum=use_curriculum, fused=True,
                      env_config=EnvConfig.training(max_steps=40),
                      log_dir=str(tmp_path), iterations_per_chunk=2,
                      plot=False, verbose=False)
    assert result.timesteps >= 80


def _curriculum_parity(horizon):
    from rlenv_tpu.config import CurriculumConfig
    from rlenv_tpu.env.curriculum import CurriculumVecPlantOS
    from rlenv_tpu.env.fused_vector import FusedCurriculumVecPlantOS

    config = EnvConfig.training(max_steps=30)
    ccfg = CurriculumConfig.ppo_dqn()
    env = PlantOS(config)
    ref = CurriculumVecPlantOS(env, N_ENVS, ccfg)
    fus = FusedCurriculumVecPlantOS(env, N_ENVS, ccfg, interpret=True)

    key = jax.random.PRNGKey(5)
    ref_c, ref_obs, _ = ref.reset(key)
    fus_c, fus_obs, _ = fus.reset(key)
    np.testing.assert_array_equal(np.asarray(ref_obs), np.asarray(fus_obs))

    ref_step = jax.jit(ref.step)
    fus_step = jax.jit(fus.step)
    rng = np.random.default_rng(11)
    for t in range(horizon):
        actions = jnp.asarray(rng.integers(0, 5, size=N_ENVS), jnp.int32)
        ref_c, ref_obs, ref_r, ref_te, ref_tr, ref_i = ref_step(ref_c, actions)
        fus_c, fus_obs, f_r, f_te, f_tr, f_i = fus_step(fus_c, actions)
        np.testing.assert_array_equal(
            np.asarray(ref_obs), np.asarray(fus_obs), err_msg=f"obs t={t}")
        np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(f_r))
        np.testing.assert_array_equal(np.asarray(ref_te), np.asarray(f_te))
        for k in ("exploration_threshold", "maze_completed", "done",
                  "exploration_percentage"):
            np.testing.assert_array_equal(
                np.asarray(ref_i[k]), np.asarray(f_i[k]),
                err_msg=f"info[{k}] t={t}")
        np.testing.assert_array_equal(
            np.asarray(ref_c.persistent_visits.reshape(N_ENVS, -1)),
            np.asarray(fus_c.persistent_visits[:, :config.grid_size ** 2]),
            err_msg=f"persistent_visits t={t}")
        np.testing.assert_array_equal(
            np.asarray(ref_c.threshold), np.asarray(fus_c.threshold))
        np.testing.assert_array_equal(
            np.asarray(ref_c.episodes_on_maze),
            np.asarray(fus_c.episodes_on_maze))


def test_fused_curriculum_parity_smoke():
    """Short-horizon fused-vs-XLA curriculum bit-exactness (fast path;
    within-episode only — resets are covered by the slow variant)."""
    _curriculum_parity(6)


@pytest.mark.slow
def test_fused_curriculum_parity():
    """FusedCurriculumVecPlantOS == CurriculumVecPlantOS, bit-exact,
    across threshold updates, maze reuse and persistent visit carry
    (70 steps > 2 episodes at max_steps=30)."""
    _curriculum_parity(70)


@pytest.mark.slow
def test_fused_rollout_matches_per_step(envs):
    """A K-step chunk (build_fused_rollout) is bit-identical to K iterated
    per-step fused calls when dones land on the chunk boundary, and the
    wrapper's chunk-end auto-reset matches the per-step auto-reset.
    (slow: 8 eager interpret-mode steps; the fast path still covers the
    rollout kernel via freeze_and_chunk_reset and under_shard_map)"""
    _, fenv = envs
    K = 8  # divides max_steps=40: truncation lands on a chunk boundary
    flat0, _, _ = fenv.reset(jax.random.PRNGKey(9))
    rng = np.random.default_rng(3)
    actions = jnp.asarray(rng.integers(0, 5, size=(K, N_ENVS)), jnp.int32)

    flat = flat0
    per = {"obs": [], "rewards": [], "terminated": [], "truncated": [],
           "is_watering": []}
    for k in range(K):
        flat, next_obs, r, te, tr, info = fenv.step(flat, actions[k])
        per["obs"].append(info["final_obs"])
        per["rewards"].append(r)
        per["terminated"].append(te)
        per["truncated"].append(tr)
        per["is_watering"].append(info["is_watering"])

    flat_c, next_obs_c, traj = fenv.rollout(flat0, actions)
    for k, v in per.items():
        np.testing.assert_array_equal(
            np.stack([np.asarray(x) for x in v]), np.asarray(traj[k]),
            err_msg=k)
    np.testing.assert_array_equal(np.asarray(next_obs),
                                  np.asarray(next_obs_c))
    np.testing.assert_array_equal(np.asarray(flat.rolled),
                                  np.asarray(flat_c.rolled))
    np.testing.assert_array_equal(np.asarray(flat.scal),
                                  np.asarray(flat_c.scal))


def test_fused_rollout_freeze_and_chunk_reset(envs):
    """Envs whose episode ends mid-chunk freeze (zero reward/flags) until
    the wrapper resets them at the chunk boundary."""
    _, fenv = envs
    K = 6
    flat, _, _ = fenv.reset(jax.random.PRNGKey(2))
    # Jump to 3 steps before truncation (max_steps=40) by setting the
    # step-count scalar directly (cheaper than stepping 37 times).
    from rlenv_tpu.ops.fused_step import _SC_STEP
    max_steps = fenv.env.config.max_steps
    flat = flat.replace(scal=flat.scal.at[:, _SC_STEP].set(max_steps - 3))

    actions = jnp.asarray(
        np.random.default_rng(0).integers(0, 5, size=(K, N_ENVS)), jnp.int32)
    flat2, next_obs, traj = fenv.rollout(flat, actions)
    trunc = np.asarray(traj["truncated"])
    assert trunc[2].all(), "all envs truncate at step 40 (k=2)"
    assert not trunc[3:].any(), "no flags after the latch"
    assert (np.asarray(traj["rewards"])[3:] == 0).all(), "frozen rewards"
    assert (np.asarray(traj["obs"])[3:] == 0).all(), "frozen obs"
    assert np.asarray(traj["done_mask"]).all()
    # Chunk-end reset: fresh episodes (step_count 0, done latch cleared).
    assert (np.asarray(flat2.scal[:, 2]) == 0).all()
    from rlenv_tpu.ops.fused_step import chunk_done
    assert not np.asarray(chunk_done(flat2)).any()
    assert np.isfinite(np.asarray(next_obs)).all()


@pytest.mark.slow
def test_fused_rollout_under_shard_map():
    """The chunked rollout kernel composes with shard_map over the 'data'
    mesh axis: per-device chunks produce the same trajectory as the
    single-device kernel."""
    from jax.sharding import PartitionSpec as P

    from rlenv_tpu.ops.fused_step import build_fused_rollout
    from rlenv_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the multi-device CPU mesh")
    config = EnvConfig.training(max_steps=40)
    env = PlantOS(config)
    B, K = n_dev * 4, 5
    mesh = make_mesh(n_dev, model_parallel=1)

    fenv = FusedVecPlantOS(env, B, interpret=True)
    flat, _, _ = fenv.reset(jax.random.PRNGKey(1))
    actions = jnp.asarray(
        np.random.default_rng(4).integers(0, 5, size=(K, B)), jnp.int32)

    local_roll = build_fused_rollout(config, B // n_dev, K, interpret=True)
    dp = lambda tree: jax.tree.map(lambda _: P("data"), tree)
    sharded = jax.shard_map(
        local_roll, mesh=mesh,
        in_specs=(dp(flat), P(None, "data")),
        out_specs=(dp(flat), P(None, "data"), P(None, "data"),
                   P(None, "data"), P(None, "data"), P(None, "data")),
        check_vma=False)
    s_flat, s_obs, s_rew, s_te, s_tr, _ = jax.jit(sharded)(flat, actions)

    ref_roll = build_fused_rollout(config, B, K, interpret=True)
    r_flat, r_obs, r_rew, r_te, r_tr, _ = ref_roll(flat, actions)

    np.testing.assert_array_equal(np.asarray(r_obs), np.asarray(s_obs))
    np.testing.assert_array_equal(np.asarray(r_rew), np.asarray(s_rew))
    np.testing.assert_array_equal(np.asarray(r_flat.rolled),
                                  np.asarray(s_flat.rolled))
    np.testing.assert_array_equal(np.asarray(r_flat.scal),
                                  np.asarray(s_flat.scal))


def test_fused_step_under_shard_map():
    """The fused kernel composes with shard_map over the 'data' mesh axis
    (multi-chip env sharding): per-device blocks produce the same results
    as the single-device kernel."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    from rlenv_tpu.env.fused_vector import FusedVecPlantOS
    from rlenv_tpu.ops.fused_step import build_fused_step
    from rlenv_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the multi-device CPU mesh")
    config = EnvConfig.training(max_steps=40)
    env = PlantOS(config)
    B = n_dev * 4
    mesh = make_mesh(n_dev, model_parallel=1)

    fenv = FusedVecPlantOS(env, B, interpret=True)
    flat, obs0, _ = fenv.reset(jax.random.PRNGKey(0))
    local_step = build_fused_step(config, B // n_dev, interpret=True)

    dp = lambda tree: jax.tree.map(lambda _: P("data"), tree)
    actions = jnp.asarray(
        np.random.default_rng(0).integers(0, 5, size=B), jnp.int32)
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(dp(flat), P("data")),
        out_specs=(dp(flat), P("data"), P("data"), P("data"), P("data"),
                   P("data")),
        check_vma=False)
    s_flat, s_obs, s_rew, s_te, s_tr, _ = jax.jit(sharded)(flat, actions)
    r_flat, r_obs, r_rew, r_te, r_tr, _ = jax.jit(fenv._fused)(flat, actions)

    np.testing.assert_array_equal(np.asarray(r_obs), np.asarray(s_obs))
    np.testing.assert_array_equal(np.asarray(r_rew), np.asarray(s_rew))
    np.testing.assert_array_equal(np.asarray(r_flat.rolled),
                                  np.asarray(s_flat.rolled))
    np.testing.assert_array_equal(np.asarray(r_flat.scal),
                                  np.asarray(s_flat.scal))


def test_sharded_bench_rollout_parity():
    """bench.py --mesh N's actual code path (build_sharded_rollout: chunked
    kernel + auto-reset per shard) produces per-env trajectories
    bit-identical to the single-device FusedVecPlantOS.rollout — the
    correctness gate for the day-one multi-chip scaling table."""
    from rlenv_tpu.env.fused_vector import build_sharded_rollout
    from rlenv_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the multi-device CPU mesh")
    config = EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                       lidar_range=2, lidar_channels=4, max_steps=5)
    env = PlantOS(config)
    B, K = n_dev * 2, 5    # K == max_steps: auto-resets at the chunk end
    mesh = make_mesh(n_dev, model_parallel=1)

    reset_fn, rollout_fn = build_sharded_rollout(env, B, mesh, K,
                                                 interpret=True)
    key = jax.random.PRNGKey(7)
    s_flat, s_obs0 = jax.jit(reset_fn)(key)
    actions = jnp.asarray(
        np.random.default_rng(11).integers(0, 5, size=(2, K, B)), jnp.int32)

    fenv = FusedVecPlantOS(env, B, interpret=True)
    r_flat, r_obs0, _ = fenv.reset(key)
    np.testing.assert_array_equal(np.asarray(r_obs0), np.asarray(s_obs0))

    roll_sharded = jax.jit(rollout_fn)
    roll_single = jax.jit(fenv.rollout)
    for chunk in range(2):   # second chunk starts from auto-reset states
        s_flat, s_next, s_traj = roll_sharded(s_flat, actions[chunk])
        r_flat, r_next, r_traj = roll_single(r_flat, actions[chunk])
        np.testing.assert_array_equal(np.asarray(r_traj["obs"]),
                                      np.asarray(s_traj["obs"]))
        np.testing.assert_array_equal(np.asarray(r_traj["rewards"]),
                                      np.asarray(s_traj["rewards"]))
        np.testing.assert_array_equal(np.asarray(r_traj["truncated"]),
                                      np.asarray(s_traj["truncated"]))
        np.testing.assert_array_equal(np.asarray(r_next),
                                      np.asarray(s_next))
        np.testing.assert_array_equal(np.asarray(r_flat.scal),
                                      np.asarray(s_flat.scal))
