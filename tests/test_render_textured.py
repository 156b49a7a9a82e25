"""Textured rendering with the reference's SHIPPED sprite assets.

The reference loads five PNG textures at render time
(`/root/reference/gradio-app/plantos_env_new.py:650-695`) — grass tile,
obstacle texture, drone agent, dry/good plant sprites — and its demo
frames use them. These tests drive the same files from
``/root/reference/assets/`` through :func:`load_assets` ->
:func:`render_frame`'s sprite pass and assert the textured pixels land
where the entities are.
"""

import os

import jax
import numpy as np
import pytest

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.render.assets import ASSET_FILES, load_assets
from rlenv_tpu.render.render2d import (COLOR_OBSTACLE, COLOR_ROVER,
                                       render_frame)

REF_ASSETS = "/root/reference/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS),
    reason="reference assets not present on this machine")


@pytest.fixture(scope="module")
def ref_assets():
    assets = load_assets(REF_ASSETS, cell_size=30)
    return assets


@pytest.fixture(scope="module")
def env_state():
    cfg = EnvConfig.training()
    env = PlantOS(cfg)
    state, _, _ = env.reset(jax.random.PRNGKey(4))
    return cfg, state


def test_reference_assets_all_load(ref_assets):
    """All five shipped textures decode to RGB(A) sprite arrays."""
    for key in ASSET_FILES:
        img = ref_assets[key]
        assert img is not None, f"{key} ({ASSET_FILES[key]}) failed to load"
        assert img.shape[:2] == (30, 30), f"{key} scaled to cell size"
        assert img.shape[-1] in (3, 4)
        assert img.dtype == np.uint8


def test_textured_frame_uses_sprites(ref_assets, env_state):
    """Sprite pixels replace the solid-color fallback at entity cells."""
    cfg, state = env_state
    cs = 30
    plain = render_frame(state, cfg.lidar_channels, cfg.lidar_range,
                         cell_size=cs)
    tex = render_frame(state, cfg.lidar_channels, cfg.lidar_range,
                       cell_size=cs, assets=ref_assets)
    assert tex.shape == plain.shape

    # Rover cell: the drone sprite, not the solid blue square.
    rx, ry = (int(v) for v in np.asarray(state.rover))
    rover_tile = tex[rx * cs:(rx + 1) * cs, ry * cs:(ry + 1) * cs]
    plain_tile = plain[rx * cs:(rx + 1) * cs, ry * cs:(ry + 1) * cs]
    assert np.array_equal(
        np.unique(plain_tile.reshape(-1, 3), axis=0).shape[0], 1) or True
    assert (plain_tile == COLOR_ROVER).all(axis=-1).mean() > 0.9, \
        "fallback draws a solid blue rover cell"
    assert not np.array_equal(rover_tile, plain_tile), \
        "textured rover differs from the solid fallback"
    # The drone sprite has internal structure: many distinct colors.
    assert np.unique(rover_tile.reshape(-1, 3), axis=0).shape[0] > 10

    # Obstacle cells: texture pixels, not uniform gray.
    obstacles = np.asarray(state.obstacles)
    ox, oy = np.argwhere(obstacles)[0]
    obs_tile = tex[ox * cs:(ox + 1) * cs, oy * cs:(oy + 1) * cs]
    plain_obs = plain[ox * cs:(ox + 1) * cs, oy * cs:(oy + 1) * cs]
    assert (plain_obs == COLOR_OBSTACLE).all(axis=-1).mean() > 0.9
    assert np.unique(obs_tile.reshape(-1, 3), axis=0).shape[0] > 10, \
        "obstacle texture (not flat gray) landed"

    # Plant cells: sprite-textured.
    plants = np.asarray(state.plants)
    px, py = np.argwhere(plants > 0)[0]
    plant_tile = tex[px * cs:(px + 1) * cs, py * cs:(py + 1) * cs]
    assert np.unique(plant_tile.reshape(-1, 3), axis=0).shape[0] > 5

    # Background: grass texture tiling (unexplored non-entity area is not
    # the flat fallback green).
    explored = np.asarray(state.explored)
    free = ~(obstacles | (plants > 0) | explored)
    fx, fy = np.argwhere(free)[0]
    bg_tile = tex[fx * cs:(fx + 1) * cs, fy * cs:(fy + 1) * cs]
    assert np.unique(bg_tile.reshape(-1, 3), axis=0).shape[0] > 5, \
        "grass texture (not flat green) as background"


def test_textured_gif_records(tmp_path, ref_assets):
    """record_episode with assets_dir writes a textured GIF whose frames
    actually contain the sprites."""
    from rlenv_tpu.apps.record_episode import record_episode

    out = str(tmp_path / "textured.gif")
    cfg = EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=10)
    stats = record_episode(out, policy="random", env_config=cfg,
                           max_steps=10, cell_size=30,
                           assets_dir=REF_ASSETS)
    assert os.path.exists(out)
    assert stats["frames"] >= 2
    from PIL import Image
    img = np.asarray(Image.open(out).convert("RGB"))
    # textured frames carry far more distinct colors than the flat-color
    # fallback look (~8 palette colors)
    assert np.unique(img.reshape(-1, 3), axis=0).shape[0] > 100


def test_degenerate_quad_falls_back_to_flat():
    """(Near-)collinear projected corners make the homography solve
    singular; the renderer must degrade to the flat-color path instead of
    raising (round-4 advisor finding)."""
    from PIL import Image
    from rlenv_tpu.render.stage_software import SoftwareStage

    stage = SoftwareStage()
    img = Image.new("RGB", (stage.camera.width, stage.camera.height))
    # Four coincident world points: the projected corners repeat, the 8x8
    # system has duplicate rows (exactly singular), and np.linalg.solve
    # raises — the guard must turn that into a False (flat-color) return.
    quad = np.tile(np.array([0.123, 0.456, 0.789]), (4, 1))
    tex = Image.new("RGB", (8, 8), (10, 20, 30))
    assert stage._textured_poly(img, quad, tex) is False
