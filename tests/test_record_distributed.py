"""Episode recorder + distributed helpers."""

import os

import jax

from rlenv_tpu.config import EnvConfig


def test_record_episode_gif(tmp_path):
    from rlenv_tpu.apps.record_episode import record_episode
    out = str(tmp_path / "ep.gif")
    stats = record_episode(
        out, policy="random",
        env_config=EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                             lidar_range=2, lidar_channels=4, max_steps=30),
        max_steps=12, frame_stride=3, cell_size=10)
    assert os.path.exists(out)
    assert stats["steps"] <= 12 and stats["frames"] >= 4
    from PIL import Image
    img = Image.open(out)
    assert img.size == (90, 90)
    assert getattr(img, "n_frames", 1) == stats["frames"]


def test_distributed_runtime_info():
    from rlenv_tpu.parallel.distributed import initialize, runtime_info
    initialize()  # single-process no-op path
    info = runtime_info()
    assert info["process_count"] >= 1
    assert info["global_device_count"] == len(jax.devices())
    assert info["platform"] == "cpu"
