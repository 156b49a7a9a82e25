"""The 3-D viewer EXECUTES on the built-in software rasterizer backend.

Round-2 review: the viewer's Ursina backend could never run in this image
(engine not installable), leaving the 3-D path logic-tested only. The
SoftwareStage closes that gap — these tests drive the full viewer
pipeline (scene description -> reconciliation -> rasterized frames ->
subprocess queue protocol) and check actual pixels.
"""

import multiprocessing
import os

import numpy as np
import pytest

from rlenv_tpu.render.stage_software import SoftwareStage, TINT_FALLBACK
from rlenv_tpu.render.viewer3d import (PlantOS3DViewer, describe_scene,
                                       run_3d_viewer_process)

SCENE = dict(
    grid_size=9,
    obstacles=[(2, 2), (2, 3), (6, 6)],
    plants={(1, 7): True, (7, 1): False},
    rover_pos=(4, 4),
)


def _viewer():
    return PlantOS3DViewer(SCENE["grid_size"], stage_factory=SoftwareStage)


def test_stage_renders_scene_pixels():
    stage = SoftwareStage(width=320, height=240)
    stage.sync(describe_scene(SCENE["grid_size"], SCENE["obstacles"],
                              SCENE["plants"], SCENE["rover_pos"]))
    stage.set_hud("Timesteps: 3\nTotal Collisions: 1\nThirsty Plants: 1")
    stage.frame()
    img = stage.last_frame
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    colors = img.reshape(-1, 3)
    # ground plane fills a large area with the green base color family
    green = (colors[:, 1] > colors[:, 0]) & (colors[:, 1] > colors[:, 2])
    assert green.mean() > 0.2, "ground plane visible"
    # obstacle cubes: near-gray shaded pixels
    gray = (np.abs(colors[:, 0].astype(int) - colors[:, 1]) < 12) & \
           (np.abs(colors[:, 1].astype(int) - colors[:, 2]) < 12) & \
           (colors[:, 0] > 40) & (colors[:, 0] < 180)
    assert gray.sum() > 50, "cube faces rasterized"
    # rover billboard: blue disc fallback
    rover = np.asarray(TINT_FALLBACK["rover"])
    assert (np.abs(colors.astype(int) - rover).sum(1) < 30).any(), \
        "rover billboard drawn"
    # thirsty plant: orange disc
    orange = np.asarray(TINT_FALLBACK["thirsty"])
    assert (np.abs(colors.astype(int) - orange).sum(1) < 30).any(), \
        "thirsty plant billboard drawn"


def test_stage_texture_maps_ground_and_cubes(tmp_path):
    """Ground and obstacle faces are perspective-correct TEXTURE-mapped
    (reference `plantos_3d_viewer_new.py:47-65`), not average-color
    fills: with a high-contrast checkerboard as both textures, the
    rendered faces must be non-uniform with both checker tones present."""
    from PIL import Image

    from rlenv_tpu.render.stage_software import TEXTURE_FILES

    checker = np.zeros((16, 16, 3), np.uint8)
    checker[:8, :8] = checker[8:, 8:] = (250, 250, 250)
    checker[:8, 8:] = checker[8:, :8] = (60, 60, 60)
    for tint in ("ground", "obstacle"):
        Image.fromarray(checker).save(tmp_path / TEXTURE_FILES[tint])

    stage = SoftwareStage(width=320, height=240,
                          assets_dir=str(tmp_path))
    stage.sync(describe_scene(SCENE["grid_size"], SCENE["obstacles"],
                              SCENE["plants"], SCENE["rover_pos"]))
    stage.frame()
    colors = stage.last_frame.reshape(-1, 3)
    # Both checker tones appear in quantity. The dark tone only comes from
    # textures (sky/discs/HUD are none of these colors); shading scales
    # the obstacle faces but the ground is unshaded, so the bright tone
    # survives exactly.
    bright = (np.abs(colors.astype(int) - 250).max(1) < 20).sum()
    dark = (np.abs(colors.astype(int) - 60).max(1) < 20).sum()
    assert bright > 500 and dark > 500, (bright, dark)
    # an average-color fill would collapse each face to ONE value;
    # require many distinct values in the gray family instead
    grayish = colors[(np.abs(colors[:, 0].astype(int) - colors[:, 1]) < 8)
                     & (np.abs(colors[:, 1].astype(int) - colors[:, 2]) < 8)]
    assert len(np.unique(grayish[:, 0])) > 10


def test_stage_uses_reference_textures():
    ref = "/root/reference/assets"
    if not os.path.isdir(ref):
        pytest.skip("reference assets not present")
    stage = SoftwareStage(width=320, height=240, assets_dir=ref)
    assert stage._textures["rover"] is not None
    assert stage._textures["water"] is not None
    stage.sync(describe_scene(SCENE["grid_size"], SCENE["obstacles"],
                              SCENE["plants"], SCENE["rover_pos"]))
    stage.frame()
    assert np.unique(stage.last_frame.reshape(-1, 3), axis=0).shape[0] > 50


def test_viewer_full_surface_executes():
    """setup/update/watering/reset/render/close on real rasterization."""
    v = _viewer()
    v.setup_scene(SCENE["obstacles"], SCENE["plants"], SCENE["rover_pos"])
    v.render_step()
    first = v._stage.last_frame.copy()
    # move the rover and water: scene must visibly change
    v.update_scene(SCENE["plants"], (0, 0),
                   stats={"timesteps": 5, "collisions": 0,
                          "thirsty_plants": 1, "is_watering": True})
    v.render_step()
    second = v._stage.last_frame
    assert not np.array_equal(first, second)
    v.reset_scene()
    v.render_step()
    v.close()


def test_subprocess_queue_protocol_with_software_backend(tmp_path):
    """run_3d_viewer_process over a real Queue: initial scene, one update,
    STOP sentinel — all on the software backend, recording a GIF."""
    gif = str(tmp_path / "viewer3d.gif")

    def factory(grid_size):
        return PlantOS3DViewer(
            grid_size,
            stage_factory=lambda: SoftwareStage(width=160, height=120,
                                                gif_path=gif, gif_stride=1))

    q = multiprocessing.Queue()
    q.put({"plants": SCENE["plants"], "rover_pos": (5, 5),
           "stats": {"timesteps": 1, "collisions": 0, "thirsty_plants": 1}})
    q.put("STOP")
    run_3d_viewer_process(q, SCENE, viewer_factory=factory,
                          poll_sleep=0.0, max_iterations=50)
    assert os.path.exists(gif), "viewer session recorded"
