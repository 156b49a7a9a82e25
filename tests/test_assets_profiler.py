"""Asset pipeline, textured rendering, profiler, emergency checkpoint."""

import os

import jax
import numpy as np
import pytest

from rlenv_tpu.config import A2CConfig, EnvConfig


def test_create_and_read_assets(tmp_path):
    from rlenv_tpu.render.assets import create_assets, read_png
    paths = create_assets(str(tmp_path))
    assert set(paths) == {"rover.png", "plant_thirsty.png",
                          "plant_hydrated.png"}
    rover = read_png(paths["rover.png"])
    assert rover.shape == (30, 30, 4)
    # center is blue with full alpha, corner transparent
    assert tuple(rover[15, 15]) == (0, 0, 255, 255)
    assert rover[0, 0, 3] == 0
    # border ring is dark grey
    assert tuple(rover[15, 15 + 13][:3]) == (50, 50, 50)


def test_load_assets_with_parent_fallback(tmp_path):
    from rlenv_tpu.render.assets import load_assets, write_png
    child = tmp_path / "child"
    child.mkdir()
    # rover texture in child, background in PARENT (fallback path)
    sprite = np.full((8, 8, 4), 255, np.uint8)
    write_png(str(child / "mech_drone_agent.png"), sprite)
    write_png(str(tmp_path / "grass_texture.png"), sprite)
    assets = load_assets(str(child), cell_size=10)
    assert assets["rover"] is not None and assets["rover"].shape[:2] == (10, 10)
    assert assets["background"] is not None
    assert assets["obstacle"] is None


def test_textured_render(tmp_path):
    from rlenv_tpu import PlantOS
    from rlenv_tpu.render.assets import create_assets, read_png
    from rlenv_tpu.render.render2d import render_frame, COLOR_ROVER

    cfg = EnvConfig(grid_size=7, num_plants=2, num_obstacles=0,
                    lidar_range=2, lidar_channels=4)
    env = PlantOS(cfg)
    plants = np.zeros((7, 7), np.int8)
    plants[1, 1] = 2
    state, _, _ = env.reset_from_map(jax.random.PRNGKey(0),
                                     np.zeros((7, 7), bool), plants,
                                     np.array([3, 3]))
    paths = create_assets(str(tmp_path))
    assets = {
        "rover": read_png(paths["rover.png"]),
        "plant_thirsty": read_png(paths["plant_thirsty.png"]),
    }
    frame = render_frame(state, 4, 2, cell_size=30, assets=assets)
    # rover sprite center (blue disc) at cell (3,3)
    assert tuple(frame[3 * 30 + 15, 3 * 30 + 15]) == (0, 0, 255)
    # sprite corner shows grass through the alpha, not solid rover blue
    assert tuple(frame[3 * 30 + 1, 3 * 30 + 1]) != tuple(COLOR_ROVER)
    # thirsty plant sprite: brown disc center
    assert tuple(frame[1 * 30 + 15, 1 * 30 + 15]) == (139, 69, 19)


def test_throughput_counter():
    from rlenv_tpu.utils.profiler import Throughput
    t = Throughput()
    assert t.update(0) == 0.0
    rate = t.update(1000)
    assert rate > 0


def test_emergency_checkpoint_on_interrupt(tmp_path, monkeypatch):
    """A crash mid-training leaves a resumable checkpoint behind."""
    from rlenv_tpu.train import trainer as trainer_mod
    from rlenv_tpu.train.checkpoint import CheckpointManager

    env_config = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                           lidar_range=2, lidar_channels=4, max_steps=20)
    log_dir = str(tmp_path / "run")

    calls = {"n": 0}
    orig_jit = jax.jit

    def exploding_jit(fn, *a, **k):
        jitted = orig_jit(fn, *a, **k)

        def wrapper(state):
            calls["n"] += 1
            if calls["n"] >= 3:
                raise RuntimeError("simulated preemption")
            return jitted(state)
        return wrapper

    monkeypatch.setattr(trainer_mod.jax, "jit", exploding_jit)
    with pytest.raises(RuntimeError, match="simulated preemption"):
        trainer_mod.train(
            algo="a2c", total_timesteps=10_000, n_envs=8,
            env_config=env_config,
            algo_config=A2CConfig(hidden_sizes=(16,), n_steps=2),
            log_dir=log_dir, iterations_per_chunk=2, plot=False,
            verbose=False)
    mgr = CheckpointManager(os.path.join(log_dir, "models", "checkpoints"))
    assert mgr.latest_step() is not None and mgr.latest_step() > 0
