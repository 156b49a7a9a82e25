"""Regenerate `runs/viewer3d_session.gif`: a scripted episode through the
full 3-D viewer pipeline (scene description -> reconciliation -> software
rasterizer) with the reference's real textures — ground tiled g x g and
obstacle cube faces texture-mapped (`plantos_3d_viewer_new.py:47-65`),
rover/plant billboards, a watering spin mid-session.

Pure CPU; run with
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/render_viewer3d_session.py
"""

import numpy as np

from rlenv_tpu.render.stage_software import SoftwareStage
from rlenv_tpu.render.viewer3d import PlantOS3DViewer

ASSETS = "/root/reference/assets"
GIF = "runs/viewer3d_session.gif"

if __name__ == "__main__":
    stage = SoftwareStage(width=480, height=360, assets_dir=ASSETS,
                          gif_path=GIF, gif_stride=1, max_gif_frames=80)
    viewer = PlantOS3DViewer(13, stage_factory=lambda: stage)

    rng = np.random.default_rng(3)
    obstacles = [(3, 3), (3, 4), (4, 3), (8, 9), (9, 9), (9, 8), (6, 1)]
    plants = {(1, 10): True, (10, 2): False, (5, 7): True, (11, 11): True}
    pos = [6, 6]
    viewer.setup_scene(obstacles, plants, tuple(pos))
    viewer.render_step()

    for t in range(60):
        step = rng.integers(0, 4)
        d = [(-1, 0), (0, 1), (1, 0), (0, -1)][step]
        nxt = (min(max(pos[0] + d[0], 0), 12), min(max(pos[1] + d[1], 0), 12))
        if nxt not in obstacles:
            pos = list(nxt)
        watering = tuple(pos) in plants and plants[tuple(pos)]
        if watering:
            plants[tuple(pos)] = False  # hydrate it
        viewer.update_scene(plants, tuple(pos), stats={
            "timesteps": t, "collisions": 0,
            "thirsty_plants": sum(plants.values()),
            "is_watering": watering})
        viewer.render_step()
    viewer.close()
    print(f"wrote {GIF} ({stage._frames_rendered} frames rendered)")
