"""Periphery tests: rendering, gym adapter, metrics, checkpointing,
policy save/load, simulation generator, 3-D viewer protocol, CLI."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlenv_tpu import EnvConfig, PlantOS
from rlenv_tpu.algos.common import EpisodeStats


# -- 2D renderer -------------------------------------------------------------

def test_render_frame_contents():
    from rlenv_tpu.render.render2d import (COLOR_OBSTACLE,
                                           COLOR_PLANT_HYDRATED,
                                           COLOR_PLANT_THIRSTY, COLOR_ROVER,
                                           render_frame)

    cfg = EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=8)
    env = PlantOS(cfg)
    g = cfg.grid_size
    obstacles = np.zeros((g, g), bool)
    obstacles[0, 8] = True
    plants = np.zeros((g, g), np.int8)
    plants[2, 3] = 2
    plants[6, 1] = 1
    state, _, _ = env.reset_from_map(jax.random.PRNGKey(0), obstacles,
                                     plants, np.array([4, 4]))
    frame = render_frame(state, cfg.lidar_channels, cfg.lidar_range,
                         cell_size=10)
    assert frame.shape == (90, 90, 3) and frame.dtype == np.uint8
    # rover cell (row x=4, col y=4): center pixel is rover blue
    assert tuple(frame[45, 45]) == COLOR_ROVER
    # obstacle at (x=0, y=8) -> image rows 0-9, cols 80-89
    assert tuple(frame[5, 85]) == COLOR_OBSTACLE
    # thirsty plant at (2,3) -> rows 20-29, cols 30-39
    assert tuple(frame[25, 35]) == COLOR_PLANT_THIRSTY
    assert tuple(frame[65, 15]) == COLOR_PLANT_HYDRATED


def test_render_human_requires_no_crash_headless():
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from rlenv_tpu.render.window import FrameWindow
    w = FrameWindow(90)
    w.show(np.zeros((90, 90, 3), np.uint8))
    w.close()


# -- gymnasium adapter -------------------------------------------------------

def test_gym_adapter_api():
    from rlenv_tpu.env.gym_compat import PlantOSGymEnv
    env = PlantOSGymEnv(grid_size=11, num_plants=3, num_obstacles=6,
                        lidar_range=2, lidar_channels=6,
                        render_mode="rgb_array")
    obs, info = env.reset(seed=7)
    assert obs.shape == env.observation_space.shape
    assert env.observation_space.contains(obs)
    for key in ("rover_position", "thirsty_plants", "hydrated_plants",
                "total_plants", "step_count", "explored_cells",
                "total_cells", "exploration_percentage", "lidar_range",
                "lidar_channels", "collided_with_wall", "total_collisions"):
        assert key in info, key
    assert isinstance(info["rover_position"], tuple)
    obs2, reward, term, trunc, info = env.step(0)
    assert isinstance(reward, float) and isinstance(term, bool)
    assert info["is_watering"] is False
    frame = env.render()
    assert frame.shape == (11 * 30, 11 * 30, 3)
    # seeded reset reproduces the map (documented improvement)
    o1, _ = env.reset(seed=42)
    o2, _ = env.reset(seed=42)
    np.testing.assert_array_equal(o1, o2)
    env.close()


def test_gym_registration():
    import gymnasium as gym
    from rlenv_tpu.env.gym_compat import register_env
    register_env()  # reclaims the ID if the reference import clobbered it
    env = gym.make("PlantOS-v0", grid_size=9, num_plants=2,
                   num_obstacles=3, lidar_range=2, lidar_channels=4)
    obs, info = env.reset(seed=1)
    assert obs.shape == (4 * 5 + 2 + 25,)
    env.close()


def test_gym_env_checker():
    """Gymnasium's own conformance checker passes.

    The reference imports SB3's `check_env` but never calls it
    (`trainingCode.py:5`, SURVEY.md §4); here the equivalent check
    actually runs.
    """
    from gymnasium.utils.env_checker import check_env

    from rlenv_tpu.env.gym_compat import PlantOSGymEnv
    env = PlantOSGymEnv(grid_size=9, num_plants=2, num_obstacles=3,
                        lidar_range=2, lidar_channels=4,
                        render_mode="rgb_array")
    check_env(env, skip_render_check=False)
    env.close()


# -- metrics -----------------------------------------------------------------

def test_episode_ring_log():
    stats = EpisodeStats.init(3, log_capacity=8)
    stats = stats.update(jnp.array([1.0, 2.0, 3.0]),
                         jnp.array([True, False, True]),
                         jnp.array([10.0, 0.0, 30.0]))
    assert int(stats.log_pos) == 2
    logged = np.asarray(stats.log_return[:2])
    assert set(np.round(logged, 3)) == {1.0, 3.0}


def test_monitor_writer(tmp_path):
    from rlenv_tpu.train.metrics import MonitorWriter
    stats = EpisodeStats.init(2, log_capacity=8)
    stats = stats.update(jnp.array([5.0, 1.0]), jnp.array([True, False]),
                         jnp.array([42.0, 0.0]))
    w = MonitorWriter(str(tmp_path))
    summary = w.drain(stats)
    assert summary["episodes"] == 1
    assert summary["mean_return"] == pytest.approx(5.0)
    # no new episodes -> empty summary
    assert w.drain(stats) == {}
    stats = stats.update(jnp.array([2.0, 2.0]), jnp.array([False, True]),
                         jnp.array([0.0, 77.0]))
    summary = w.drain(stats)
    assert summary["episodes"] == 1 and summary["mean_return"] == 3.0
    lines = open(w.path).read().strip().split("\n")
    assert lines[0].startswith("#")
    assert lines[1] == "r,l,t,exploration,env"
    assert len(lines) == 4
    # parse-compatible with the plotting loader
    from rlenv_tpu.train.plotting import _load_monitor_csvs
    x, r, l = _load_monitor_csvs(str(tmp_path))
    assert len(r) == 2


def test_monitor_writer_per_env_shards(tmp_path):
    import jax.numpy as jnp
    from rlenv_tpu.train.metrics import MonitorWriter
    stats = EpisodeStats.init(3, log_capacity=8)
    stats = stats.update(jnp.array([5.0, 1.0, 2.0]),
                         jnp.array([True, False, True]),
                         jnp.array([42.0, 0.0, 10.0]))
    w = MonitorWriter(str(tmp_path / "shards"), per_env_files=3)
    w.drain(stats)
    assert os.path.exists(tmp_path / "shards" / "env_0.monitor.csv")
    assert os.path.exists(tmp_path / "shards" / "env_2.monitor.csv")
    assert not os.path.exists(tmp_path / "shards" / "env_1.monitor.csv")
    rows = open(tmp_path / "shards" / "env_2.monitor.csv").read().strip()
    assert rows.endswith(",2") and ",10.0" in rows


def test_training_log_writer(tmp_path):
    from rlenv_tpu.train.metrics import TrainingLogWriter
    stats = EpisodeStats.init(1, log_capacity=8)
    stats = stats.update(jnp.array([1.0]), jnp.array([True]),
                         jnp.array([100.0]))
    w = TrainingLogWriter(str(tmp_path), eval_freq=10)
    w.maybe_log(20, stats)
    content = open(w.path).read()
    assert "Mean Exploration: 100.00%" in content
    assert "Mazes completed: 1" in content


# -- checkpointing -----------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    from rlenv_tpu.train.checkpoint import CheckpointManager
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(1, state)
    mgr.wait()
    template = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7
    mgr.close()


def test_policy_save_load_roundtrip(tmp_path):
    from rlenv_tpu.train.checkpoint import save_params
    from rlenv_tpu.apps.policies import load_policy
    from rlenv_tpu.config import A2CConfig
    from rlenv_tpu.models.mlp import ActorCritic

    cfg = EnvConfig.training()
    model = ActorCritic(num_actions=5, hidden_sizes=A2CConfig().hidden_sizes)
    obs = jnp.zeros((1, cfg.obs_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), obs)
    path = str(tmp_path / "a2c_final")
    save_params(path, params)

    runner = load_policy(path, "auto", cfg)   # auto-detect from 'a2c' in name
    assert runner.model_type == "a2c"
    batch = np.random.default_rng(0).random((4, cfg.obs_dim)).astype(
        np.float32)
    actions = runner.act(batch)
    assert actions.shape == (4,)
    # matches direct apply
    logits, _ = model.apply(params, jnp.asarray(batch))
    np.testing.assert_array_equal(actions, np.asarray(
        jnp.argmax(logits, axis=-1)))


def test_detect_model_type():
    from rlenv_tpu.apps.policies import detect_model_type
    assert detect_model_type("models/dqn_improved_final") == "dqn"
    assert detect_model_type("recurrent_PPO_final") == "ppo"
    assert detect_model_type("x/a2c_final") == "a2c"
    assert detect_model_type("mystery_model") is None


# -- simulation generator / viewer protocol ----------------------------------

def test_run_simulation_live_yields_frames(tmp_path):
    from rlenv_tpu.train.checkpoint import save_params
    from rlenv_tpu.apps.simulate import run_simulation_live
    from rlenv_tpu.config import A2CConfig
    from rlenv_tpu.models.mlp import ActorCritic

    cfg = EnvConfig.training(grid_size=11, num_plants=3, num_obstacles=6)
    model = ActorCritic(num_actions=5, hidden_sizes=A2CConfig().hidden_sizes)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.obs_dim), jnp.float32))
    path = str(tmp_path / "a2c_final")
    save_params(path, params)

    gen = run_simulation_live(path, "A2C", grid_size=11, num_plants=3,
                              num_obstacles=6, use_3d_viewer=False,
                              realtime=False, max_steps_per_episode=3)
    outputs = list(gen)
    assert len(outputs) == 3
    frame, reward, expl, thirsty, summary = outputs[-1]
    assert frame.shape == (330, 330, 3)
    assert "Step: 3/3" in summary


def test_run_simulation_live_bad_model_path():
    from rlenv_tpu.apps.simulate import run_simulation_live
    gen = run_simulation_live("/nonexistent/model", "DQN", 11, 3, 6,
                              use_3d_viewer=False, realtime=False)
    frame, reward, expl, thirsty, summary = next(gen)
    assert summary.startswith("Error:")
    assert frame.shape == (300, 300, 3)


def test_viewer_process_protocol():
    """STOP sentinel + update dispatch with a mock viewer (no ursina)."""
    import queue as queue_mod
    from rlenv_tpu.render.viewer3d import run_3d_viewer_process

    events = []

    class MockViewer:
        def __init__(self, grid_size):
            events.append(("init", grid_size))

        def setup_scene(self, obstacles, plants, rover_pos):
            events.append(("setup", rover_pos))

        def update_scene(self, plants, rover_pos, stats=None):
            events.append(("update", rover_pos))

        def render_step(self):
            pass

        def close(self):
            events.append(("close",))

    q = queue_mod.Queue()
    q.put({"plants": {}, "rover_pos": (1, 2), "stats": {}})
    q.put("STOP")
    run_3d_viewer_process(q, {"grid_size": 9, "obstacles": [],
                              "plants": {}, "rover_pos": (0, 0)},
                          viewer_factory=MockViewer, poll_sleep=0,
                          max_iterations=50)
    assert events == [("init", 9), ("setup", (0, 0)), ("update", (1, 2)),
                      ("close",)]


# -- pretty printers ---------------------------------------------------------

def test_pretty_printers(capsys):
    from rlenv_tpu.utils.pretty import (print_episode_summary,
                                        print_reset_info, print_step_info)
    info = {"rover_position": (1, 2), "thirsty_plants": 3,
            "total_plants": 5, "exploration_percentage": 42.5,
            "explored_cells": 17, "total_cells": 40}
    print_step_info(7, 4, -0.1, info)
    print_reset_info(info)
    print_episode_summary(100, info)
    out = capsys.readouterr().out
    assert "Step 7" in out and "Thirsty Spiders: 3 / 5" in out
    assert "Exploration: 42.5% (17 / 40 cells)" in out
    assert "Episode Finished" in out


# -- CLI ---------------------------------------------------------------------

def test_cli_help():
    from rlenv_tpu.apps.cli import main
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0


def test_gym_vector_env():
    """gymnasium.vector.VectorEnv adapter: spaces, SAME_STEP autoreset
    convention, render."""
    import gymnasium as gym

    from rlenv_tpu.config import EnvConfig
    from rlenv_tpu.env.gym_vector import PlantOSVectorEnv

    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=5)
    venv = PlantOSVectorEnv(num_envs=8, env_config=cfg, seed=0)
    assert isinstance(venv, gym.vector.VectorEnv)
    assert venv.observation_space.shape == (8, cfg.obs_dim)

    obs, infos = venv.reset(seed=0)
    assert obs.shape == (8, cfg.obs_dim) and obs.dtype == np.float32

    done_seen = False
    for _ in range(6):   # max_steps=5 forces truncation within the loop
        actions = venv.action_space.sample()
        obs, rew, term, trunc, infos = venv.step(actions)
        assert obs.shape == (8, cfg.obs_dim)
        assert rew.shape == term.shape == trunc.shape == (8,)
        if (term | trunc).any():
            done_seen = True
            # SAME_STEP: obs is already the reset obs; terminal obs in infos
            assert infos["_final_obs"].any()
            assert infos["final_obs"].shape == (8, cfg.obs_dim)
    assert done_seen
    frame = venv.render()
    assert frame.shape == (7 * 30, 7 * 30, 3)
    venv.close()


def test_gym_vector_env_curriculum():
    from rlenv_tpu.config import CurriculumConfig, EnvConfig
    from rlenv_tpu.env.gym_vector import PlantOSVectorEnv

    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=5)
    venv = PlantOSVectorEnv(num_envs=4, env_config=cfg,
                            curriculum=CurriculumConfig.ppo_dqn())
    obs, _ = venv.reset(seed=1)
    for _ in range(6):
        obs, rew, term, trunc, infos = venv.step(np.zeros(4, np.int64))
    assert venv.render() is not None
    venv.close()


def test_cli_interactive_menu(capsys):
    """The prompt-driven entry style (`trainingCode.py:461-522`): bad model
    path and invalid choice both exit gracefully."""
    from unittest import mock

    from rlenv_tpu.apps.cli import main

    with mock.patch("builtins.input", side_effect=["4", "/nonexistent"]):
        main(["menu"])
    assert "not found" in capsys.readouterr().out
    with mock.patch("builtins.input", side_effect=["9"]):
        main(["menu"])
    assert "Invalid choice" in capsys.readouterr().out


def test_mcts_runner_stats(tmp_path):
    from rlenv_tpu.apps.mcts_runner import run_mcts
    stats = run_mcts(n_episodes=2, n_simulations=4, grid_size=7,
                     num_plants=2, num_obstacles=0, max_depth=4,
                     parallel=2, save_dir=str(tmp_path),
                     max_episode_steps=5, verbose=False)
    assert len(stats["episode_rewards"]) == 2
    with open(tmp_path / "mcts_stats_final.pkl", "rb") as f:
        loaded = pickle.load(f)
    assert loaded["grid_size"] == 7
