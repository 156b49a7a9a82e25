"""3-D viewer (Ursina) + subprocess streaming protocol.

Feature parity with `/root/reference/gradio-app/plantos_3d_viewer_new.py`:
ground plane, obstacle cubes, billboard quads for rover/plants, wireframe
cell highlighter, HUD stats text, watering spin animation, and the
``run_3d_viewer_process(queue, initial_data)`` entry point that polls a
``multiprocessing.Queue`` for state dicts / a ``"STOP"`` sentinel at
~100 Hz (`:191-217`).

Ursina is not installed in this image, so all Ursina usage is inside the
class and imported lazily; the process/queue protocol (the part other code
depends on) is viewer-agnostic and unit-testable via the
``viewer_factory`` hook.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional


class PlantOS3DViewer:
    """Ursina scene manager (lazy import; raises ImportError when absent)."""

    def __init__(self, grid_size: int, cell_size: int = 1):
        from ursina import (AmbientLight, DirectionalLight, EditorCamera,
                            Text, Ursina, Vec2, color, window)

        self._u = __import__("ursina")
        self.grid_size = grid_size
        self.cell_size = cell_size
        self.app = Ursina(title="PlantOS 3D View", borderless=False,
                          development_mode=False)
        EditorCamera()
        self.rover_entity = None
        self.cell_highlighter = None
        self.plant_entities: Dict[tuple, Any] = {}
        self.obstacle_entities: Dict[tuple, Any] = {}
        self.hud_text = Text(text="", position=window.top_right
                             - Vec2(0.05, 0.05), origin=(1, 1),
                             background=False)
        AmbientLight(color=color.rgba(1, 1, 1, 0.8))
        DirectionalLight(color=color.rgba(1, 1, 1, 0.9),
                         direction=(-1, -1, 1))

    # grid→world transform (`plantos_3d_viewer_new.py:176-183`)
    def _grid_to_world(self, gx, gy, height):
        wx = (gx - self.grid_size / 2 + 0.5) * self.cell_size
        wz = (gy - self.grid_size / 2 + 0.5) * self.cell_size
        return (wx, height * self.cell_size, wz)

    def setup_scene(self, obstacles, plants, rover_pos):
        u = self._u
        self.ground = u.Entity(
            model="plane",
            scale=(self.grid_size, 1, self.grid_size),
            color=u.color.rgb(34, 139, 34))
        for (x, y) in obstacles:
            self.obstacle_entities[(x, y)] = u.Entity(
                model="cube", color=u.color.rgb(105, 105, 105),
                position=self._grid_to_world(x, y, 0.5),
                scale=(self.cell_size,) * 3)
        self.update_scene(plants, rover_pos)

    def update_scene(self, plants, rover_pos, stats: Optional[dict] = None):
        u = self._u
        if stats:
            self.hud_text.text = (
                f"Timesteps: {stats.get('timesteps', 0)}\n"
                f"Total Collisions: {stats.get('collisions', 0)}\n"
                f"Thirsty Plants: {stats.get('thirsty_plants', 0)}")
        if self.rover_entity is None:
            self.rover_entity = u.Entity(model="quad", color=u.color.blue,
                                         billboard=True,
                                         scale=self.cell_size * 2)
        self.rover_entity.position = self._grid_to_world(
            rover_pos[0], rover_pos[1], 0.5)
        if stats and stats.get("is_watering", False):
            self.trigger_watering_animation()
        if self.cell_highlighter is None:
            self.cell_highlighter = u.Entity(
                model="cube", color=u.color.green,
                scale=(self.cell_size, 0.1, self.cell_size),
                mode="wireframe")
        self.cell_highlighter.position = self._grid_to_world(
            rover_pos[0], rover_pos[1], 0.05)

        current = set(self.plant_entities)
        target = set(plants)
        for pos in current - target:
            u.destroy(self.plant_entities.pop(pos))
        for pos, is_thirsty in plants.items():
            if pos not in self.plant_entities:
                self.plant_entities[pos] = u.Entity(
                    model="quad", scale=self.cell_size * 2, billboard=True)
            ent = self.plant_entities[pos]
            ent.position = self._grid_to_world(pos[0], pos[1], 0.5)
            ent.color = u.color.orange if is_thirsty else u.color.green

    def trigger_watering_animation(self):
        """360°x3 spin over 1 s (`plantos_3d_viewer_new.py:136-149`)."""
        u = self._u
        if not self.rover_entity:
            return
        self.rover_entity.animations.clear()
        self.rover_entity.animate(
            "rotation_y", self.rover_entity.rotation_y + 360 * 3,
            duration=1, curve=u.curve.linear)
        u.Sequence(
            u.Wait(1.1),
            u.Func(lambda: setattr(self.rover_entity, "rotation",
                                   u.Vec3(0, 0, 0))),
        ).start()

    def reset_scene(self):
        u = self._u
        for ent in self.obstacle_entities.values():
            u.destroy(ent)
        self.obstacle_entities.clear()
        for ent in self.plant_entities.values():
            u.destroy(ent)
        self.plant_entities.clear()
        if self.rover_entity:
            u.destroy(self.rover_entity)
            self.rover_entity = None
        if self.cell_highlighter:
            u.destroy(self.cell_highlighter)
            self.cell_highlighter = None

    def render_step(self):
        self.app.step()

    def close(self):
        from ursina import application
        application.quit()


def run_3d_viewer_process(update_queue, initial_data: dict,
                          viewer_factory: Callable = PlantOS3DViewer,
                          poll_sleep: float = 0.01,
                          max_iterations: Optional[int] = None) -> None:
    """Subprocess entry point: build the scene, then poll the queue for
    state dicts until a ``"STOP"`` sentinel (`plantos_3d_viewer_new.py:191-217`).

    ``viewer_factory``/``max_iterations`` exist for headless testing.
    """
    viewer = viewer_factory(grid_size=initial_data["grid_size"])
    viewer.setup_scene(initial_data["obstacles"], initial_data["plants"],
                       initial_data["rover_pos"])
    iterations = 0
    while max_iterations is None or iterations < max_iterations:
        iterations += 1
        if not update_queue.empty():
            message = update_queue.get()
            if isinstance(message, str) and message == "STOP":
                break
            viewer.update_scene(message["plants"], message["rover_pos"],
                                message.get("stats"))
        viewer.render_step()
        time.sleep(poll_sleep)
    viewer.close()
