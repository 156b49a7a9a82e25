"""3-D viewer + subprocess streaming protocol.

Capability parity with the reference's Ursina viewer
(`/root/reference/gradio-app/plantos_3d_viewer_new.py`): textured ground,
obstacle cubes, billboard sprites for rover and plants, a wireframe cell
highlighter, a HUD stats readout, a 3x360-degree watering spin, and a
subprocess entry point that drains a ``multiprocessing.Queue`` of state
dicts until a ``"STOP"`` sentinel arrives (reference `:191-217`).

The design here is different from the reference's imperative scene code:
the world is first reduced to a backend-agnostic *scene description*
(``describe_scene`` -> dict of ``Sprite3D`` records keyed by id), and a
thin Ursina backend reconciles the live entity set against that
description each frame (create / move / retint / destroy). The pure
description layer is unit-testable without a display or Ursina; only
``_UrsinaStage`` touches the engine, via lazy import (Ursina is not in
this image).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

GROUND_RGB = (34, 139, 34)
OBSTACLE_RGB = (105, 105, 105)
HUD_FORMAT = ("Timesteps: {timesteps}\n"
              "Total Collisions: {collisions}\n"
              "Thirsty Plants: {thirsty_plants}")


@dataclasses.dataclass(frozen=True)
class Sprite3D:
    """One renderable item, engine-agnostic."""
    kind: str                       # 'cube' | 'billboard' | 'wire' | 'plane'
    world_pos: Tuple[float, float, float]
    tint: str                       # 'ground'|'obstacle'|'rover'|'thirsty'|
                                    # 'hydrated'|'highlight'
    scale: Any = 1.0


def grid_to_world(gx: float, gy: float, height: float,
                  grid_size: int, cell: float = 1.0):
    """Center the grid on the origin; grid y maps to world z
    (reference `_grid_to_world`, `plantos_3d_viewer_new.py:176-183`)."""
    half = grid_size / 2 - 0.5
    return ((gx - half) * cell, height * cell, (gy - half) * cell)


def describe_scene(grid_size: int, obstacles, plants, rover_pos,
                   cell: float = 1.0) -> Dict[str, Sprite3D]:
    """Pure world-state -> scene-description reduction.

    ``plants`` maps (x, y) -> is_thirsty. The returned dict is keyed by a
    stable id so successive descriptions can be diffed.
    """
    w = lambda x, y, h: grid_to_world(x, y, h, grid_size, cell)  # noqa: E731
    scene: Dict[str, Sprite3D] = {
        "ground": Sprite3D("plane", (0.0, 0.0, 0.0), "ground",
                           (grid_size * cell, 1, grid_size * cell)),
        "rover": Sprite3D("billboard", w(*rover_pos, 0.5), "rover",
                          cell * 2),
        "highlight": Sprite3D("wire", w(*rover_pos, 0.05), "highlight",
                              (cell, 0.1, cell)),
    }
    for (x, y) in obstacles:
        scene[f"obs:{x},{y}"] = Sprite3D("cube", w(x, y, 0.5), "obstacle",
                                         (cell, cell, cell))
    for (x, y), thirsty in plants.items():
        scene[f"plant:{x},{y}"] = Sprite3D(
            "billboard", w(x, y, 0.5),
            "thirsty" if thirsty else "hydrated", cell * 2)
    return scene


def hud_line(stats: Optional[dict]) -> Optional[str]:
    if not stats:
        return None
    return HUD_FORMAT.format(timesteps=stats.get("timesteps", 0),
                             collisions=stats.get("collisions", 0),
                             thirsty_plants=stats.get("thirsty_plants", 0))


class _UrsinaStage:
    """The only Ursina-touching layer: reconciles live entities against a
    scene description and owns the app loop, HUD, and animations."""

    # tint name -> (texture asset, fallback color attr). Texture files are
    # looked up next to the process cwd like the reference does; missing
    # files fall back to flat colors.
    _TEXTURES = {
        "ground": ("grass_texture.png", None),
        "obstacle": ("obstacles_texture.png", None),
        "rover": ("mech_drone_agent.png", "blue"),
        "thirsty": ("dry_plant_bg.png", "orange"),
        "hydrated": ("good_plant_bg.png", "green"),
        "highlight": (None, "green"),
    }

    def __init__(self, title: str = "PlantOS 3D View"):
        import os

        import ursina
        self._u = ursina
        self._os = os
        self.app = ursina.Ursina(title=title, borderless=False,
                                 development_mode=False)
        ursina.EditorCamera()
        ursina.AmbientLight(color=ursina.color.rgba(1, 1, 1, 0.8))
        ursina.DirectionalLight(color=ursina.color.rgba(1, 1, 1, 0.9),
                                direction=(-1, -1, 1))
        self.hud = ursina.Text(text="", origin=(1, 1), background=False,
                               position=ursina.window.top_right
                               - ursina.Vec2(0.05, 0.05))
        self._live: Dict[str, Any] = {}

    # -- reconciliation -------------------------------------------------
    def sync(self, scene: Dict[str, Sprite3D]) -> None:
        u = self._u
        for key in [k for k in self._live if k not in scene]:
            u.destroy(self._live.pop(key))
        for key, spec in scene.items():
            ent = self._live.get(key)
            if ent is None:
                ent = self._spawn(spec)
                self._live[key] = ent
            ent.position = spec.world_pos
            self._tint(ent, spec.tint)

    def _spawn(self, spec: Sprite3D):
        u = self._u
        kw: Dict[str, Any] = dict(scale=spec.scale)
        if spec.kind == "billboard":
            kw.update(model="quad", billboard=True)
        elif spec.kind == "wire":
            kw.update(model="cube", mode="wireframe")
        elif spec.kind == "plane":
            kw.update(model="plane")
        else:
            kw.update(model="cube")
        return u.Entity(**kw)

    def _tint(self, ent, tint: str) -> None:
        u = self._u
        tex, fallback = self._TEXTURES[tint]
        if tex and self._os.path.exists(tex):
            ent.texture, ent.color = tex, u.color.white
        elif tint == "ground":
            ent.color = u.color.rgb(*GROUND_RGB)
        elif tint == "obstacle":
            ent.color = u.color.rgb(*OBSTACLE_RGB)
        else:
            ent.texture = None
            ent.color = getattr(u.color, fallback)

    # -- effects ---------------------------------------------------------
    def spin_rover(self) -> None:
        """Watering effect: swap to the watering sprite and spin 3 turns in
        1 s, then restore (reference `:136-149`)."""
        u, os = self._u, self._os
        rover = self._live.get("rover")
        if rover is None:
            return
        rover.animations.clear()
        if os.path.exists("mech_drone_water.png"):
            rover.texture = "mech_drone_water.png"
        rover.animate("rotation_y", rover.rotation_y + 3 * 360,
                      duration=1, curve=u.curve.linear)

        def _restore():
            self._tint(rover, "rover")
            rover.rotation = u.Vec3(0, 0, 0)

        u.Sequence(u.Wait(1.1), u.Func(_restore)).start()

    def set_hud(self, text: Optional[str]) -> None:
        if text is not None:
            self.hud.text = text

    def clear(self) -> None:
        for ent in self._live.values():
            self._u.destroy(ent)
        self._live.clear()

    def frame(self) -> None:
        self.app.step()

    def quit(self) -> None:
        from ursina import application
        application.quit()


class PlantOS3DViewer:
    """Reference-compatible facade over the stage + scene description.

    Method surface matches `plantos_3d_viewer_new.py:6-189`:
    ``setup_scene`` / ``update_scene`` / ``reset_scene`` / ``render_step`` /
    ``trigger_watering_animation`` / ``close``.
    """

    def __init__(self, grid_size: int, cell_size: int = 1,
                 stage_factory: Callable[[], Any] = _UrsinaStage):
        self.grid_size = grid_size
        self.cell_size = cell_size
        self._stage = stage_factory()
        self._obstacles: list = []

    def setup_scene(self, obstacles, plants, rover_pos) -> None:
        self._obstacles = list(obstacles)
        self.update_scene(plants, rover_pos)

    def update_scene(self, plants, rover_pos,
                     stats: Optional[dict] = None) -> None:
        self._stage.set_hud(hud_line(stats))
        self._stage.sync(describe_scene(self.grid_size, self._obstacles,
                                        plants, rover_pos, self.cell_size))
        if stats and stats.get("is_watering", False):
            self.trigger_watering_animation()

    def trigger_watering_animation(self) -> None:
        self._stage.spin_rover()

    def reset_scene(self) -> None:
        self._obstacles = []
        self._stage.clear()

    def render_step(self) -> None:
        self._stage.frame()

    def close(self) -> None:
        self._stage.quit()


def run_3d_viewer_process(update_queue, initial_data: dict,
                          viewer_factory: Callable = PlantOS3DViewer,
                          poll_sleep: float = 0.01,
                          max_iterations: Optional[int] = None) -> None:
    """Subprocess entry point (reference `:191-217`): build the scene from
    ``initial_data``, then pump frames while draining the queue — state
    dicts update the scene, the string ``"STOP"`` ends the loop.

    ``viewer_factory`` / ``poll_sleep`` / ``max_iterations`` are hooks for
    headless tests; defaults reproduce the reference's ~100 Hz poll.
    """
    viewer = viewer_factory(grid_size=initial_data["grid_size"])
    viewer.setup_scene(initial_data["obstacles"], initial_data["plants"],
                       initial_data["rover_pos"])
    pumped = 0
    stop = False
    while not stop and (max_iterations is None or pumped < max_iterations):
        pumped += 1
        # Drain the whole backlog to the NEWEST state each frame (dropping
        # stale intermediates) so a renderer slower than the producer still
        # reaches the STOP sentinel promptly instead of replaying history
        # until the parent's terminate() safety net fires.
        msg = None
        while not update_queue.empty():
            m = update_queue.get()
            if isinstance(m, str) and m == "STOP":
                stop = True
                break
            msg = m
        if msg is not None:
            viewer.update_scene(msg["plants"], msg["rover_pos"],
                                msg.get("stats"))
        if stop:
            if msg is not None:
                # Render the last pre-STOP state so the final frame of the
                # session (e.g. the software backend's GIF) reflects it.
                viewer.render_step()
            break
        viewer.render_step()
        time.sleep(poll_sleep)
    viewer.close()
