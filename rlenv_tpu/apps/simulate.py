"""Live simulation generator + 3-D viewer process management.

The gradio-independent core of the reference's web app
(`/root/reference/gradio-app/gradioUI.py:10-128`): a generator that steps a
policy through one episode, yielding
``(rgb_frame, total_reward, exploration_pct, thirsty_count, summary_text)``
per step, while pushing state dicts to a 3-D viewer subprocess over a
``multiprocessing.Queue`` (spawn start method, STOP sentinel, atexit
cleanup)."""

from __future__ import annotations

import atexit
import multiprocessing
import time
from typing import Iterator, Optional, Tuple

import numpy as np

from rlenv_tpu.env.gym_compat import PlantOSGymEnv
from rlenv_tpu.apps.policies import load_policy

_viewer_process: Optional[multiprocessing.Process] = None
_update_queue = None


def cleanup_viewer_process() -> None:
    """Terminate the 3-D viewer process (`gradioUI.py:14-24`)."""
    global _viewer_process, _update_queue
    if _viewer_process is not None and _viewer_process.is_alive():
        if _update_queue is not None:
            _update_queue.put("STOP")
            # Let the viewer drain the sentinel and finish cleanly (the
            # software backend writes its session GIF on quit); terminate
            # only as the reference's last-resort safety net
            # (`gradioUI.py:17-24`).
            _viewer_process.join(timeout=2)
        if _viewer_process.is_alive():
            _viewer_process.terminate()
            _viewer_process.join(timeout=2)
    _viewer_process = None
    _update_queue = None


atexit.register(cleanup_viewer_process)


def _software_viewer_factory(grid_size: int):
    """Viewer over the built-in software rasterizer backend (no Ursina,
    no display; set RLENV_VIEWER3D_GIF to record the session)."""
    from rlenv_tpu.render.stage_software import SoftwareStage
    from rlenv_tpu.render.viewer3d import PlantOS3DViewer
    return PlantOS3DViewer(grid_size, stage_factory=SoftwareStage)


def start_3d_viewer(initial_data: dict) -> None:
    """Spawn the 3-D viewer subprocess (`gradioUI.py:30-45`).

    Backend selection: the Ursina engine when installed (the reference's
    stack), otherwise the built-in software rasterizer
    (:mod:`rlenv_tpu.render.stage_software`) — the viewer pipeline runs
    either way."""
    global _viewer_process, _update_queue
    cleanup_viewer_process()
    from rlenv_tpu.render.viewer3d import run_3d_viewer_process
    try:
        import ursina  # noqa: F401
        kwargs = {}
    except ImportError:
        kwargs = {"viewer_factory": _software_viewer_factory}

    _update_queue = multiprocessing.Queue()
    _viewer_process = multiprocessing.Process(
        target=run_3d_viewer_process, args=(_update_queue, initial_data),
        kwargs=kwargs)
    _viewer_process.start()


def _extract_viewer_state(env: PlantOSGymEnv) -> dict:
    """De-device-ify state into the viewer's dict protocol
    (`gradioUI.py:73-79`)."""
    state = env.state
    obstacles = np.argwhere(np.asarray(state.obstacles))
    plants_arr = np.asarray(state.plants)
    plants = {(int(x), int(y)): bool(plants_arr[x, y] == 2)
              for x, y in np.argwhere(plants_arr > 0)}
    rover = tuple(int(v) for v in np.asarray(state.rover))
    return {
        "grid_size": env.grid_size,
        "obstacles": [tuple(int(v) for v in o) for o in obstacles],
        "plants": plants,
        "rover_pos": rover,
    }


def run_simulation_live(model_path: str, model_type: str, grid_size: int,
                        num_plants: int, num_obstacles: int,
                        map_generation_algo: str = "original",
                        max_steps_per_episode: int = 1000,
                        use_3d_viewer: bool = True,
                        realtime: bool = True
                        ) -> Iterator[Tuple[np.ndarray, float, float, int, str]]:
    """Stream one policy episode (`gradioUI.py:47-128`)."""
    env = PlantOSGymEnv(grid_size=int(grid_size),
                        num_plants=int(num_plants),
                        num_obstacles=int(num_obstacles),
                        lidar_range=6, lidar_channels=16,
                        render_mode="rgb_array",
                        map_generation_algo=map_generation_algo)
    try:
        policy = load_policy(model_path, model_type.lower(),
                             env.config)
    except Exception as e:
        dummy = np.zeros((300, 300, 3), dtype=np.uint8)
        yield dummy, 0.0, 0.0, 0, f"Error: {e}"
        return

    try:
        obs, info = env.reset()
        policy.reset_state(1)
        if use_3d_viewer:
            data = _extract_viewer_state(env)
            data["stats"] = info
            start_3d_viewer(data)

        episode_reward = 0.0
        episode_start = True
        for step in range(max_steps_per_episode):
            frame = env.render()
            action = policy.act(obs, episode_start=episode_start,
                                deterministic=True)
            episode_start = False
            obs, reward, terminated, truncated, info = env.step(int(action))
            episode_reward += reward

            if _update_queue is not None:
                update = _extract_viewer_state(env)
                _update_queue.put({
                    "plants": update["plants"],
                    "rover_pos": update["rover_pos"],
                    "stats": {
                        "timesteps": info["step_count"],
                        "collisions": info["total_collisions"],
                        "thirsty_plants": info["thirsty_plants"],
                        "is_watering": info["is_watering"],
                    },
                })

            summary = (
                f"Step: {step + 1}/{max_steps_per_episode} | "
                f"Reward: {episode_reward:.2f}\n"
                f"Exploration: {info['exploration_percentage']:.1f}% | "
                f"Thirsty Plants: {info['thirsty_plants']}\n"
                f"Rover Position: {info['rover_position']} | "
                f"Collisions: {info['total_collisions']}\n"
                f"Explored Cells: {info['explored_cells']}"
                f"/{info['total_cells']}")
            yield (frame, episode_reward, info["exploration_percentage"],
                   info["thirsty_plants"], summary)

            # pause to match the watering animation (`gradioUI.py:116-117`)
            if realtime and info.get("is_watering", False):
                time.sleep(1)
            if terminated or truncated:
                break
            if realtime:
                time.sleep(0.05)
    finally:
        env.close()
        cleanup_viewer_process()
