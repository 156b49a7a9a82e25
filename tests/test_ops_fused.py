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


def test_fused_step_parity(envs):
    venv, fenv = envs
    g = venv.env.config.grid_size
    key = jax.random.PRNGKey(0)
    ref_states, ref_obs, _ = venv.reset(key)
    flat, fused_obs, _ = fenv.reset(key)
    np.testing.assert_array_equal(np.asarray(ref_obs), np.asarray(fused_obs))

    ref_step = jax.jit(venv.step)
    fused_step = fenv.step  # interpret-mode pallas: run uncompiled

    rng = np.random.default_rng(7)
    for t in range(60):  # > max_steps: exercises auto-reset
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


def test_fused_watering_parity(envs):
    """Watering on thirsty/hydrated/empty cells gives identical rewards."""
    venv, fenv = envs
    key = jax.random.PRNGKey(42)
    ref_states, _, _ = venv.reset(key)
    flat, _, _ = fenv.reset(key)
    water = jnp.full((N_ENVS,), 4, jnp.int32)
    for _ in range(3):
        ref_states, _, ref_r, *_ = venv.step(ref_states, water)
        flat, _, f_r, *_ = fenv.step(flat, water)
        np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(f_r))


def test_train_a2c_fused(tmp_path):
    """A2C trains end-to-end on the fused-kernel env (interpret mode)."""
    from rlenv_tpu.train.trainer import train

    _, result = train(algo="a2c", total_timesteps=160, n_envs=16,
                      use_curriculum=False, fused=True,
                      env_config=EnvConfig.training(max_steps=40),
                      log_dir=str(tmp_path), iterations_per_chunk=2,
                      plot=False, verbose=False)
    assert result.timesteps >= 160


def test_fused_curriculum_rejected():
    from rlenv_tpu.train.trainer import make_venv

    with pytest.raises(NotImplementedError):
        make_venv(EnvConfig.training(), 16, use_curriculum=True, fused=True)
