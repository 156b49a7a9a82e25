"""Software 3-D stage: a dependency-light rasterizer backend for the
PlantOS 3-D viewer.

The reference's 3-D viewer only runs on Ursina/Panda3D
(`/root/reference/gradio-app/plantos_3d_viewer_new.py`), which is not
installable in this image — so the Ursina backend here
(:class:`rlenv_tpu.render.viewer3d._UrsinaStage`) could never execute.
This module provides a second implementation of the same stage interface
(``sync`` / ``set_hud`` / ``spin_rover`` / ``clear`` / ``frame`` /
``quit``) that renders real 3-D frames itself: a perspective pinhole
camera orbiting the scene, painter's-algorithm rasterization (per-FACE
depth sort) of the ground plane and obstacle cubes — both
perspective-correct texture-mapped with the reference's texture files
when available (ground tiled ``grid_size x grid_size`` exactly like the
reference's ``texture_scale``, `plantos_3d_viewer_new.py:47-53`; cube
faces Lambert-shaded, `:55-65`), flat colors otherwise — camera-facing
billboard sprites for rover and plants, the wireframe cell highlighter,
the HUD text block, and the 3x360-degree watering spin (sprite swap +
in-plane rotation over ~1 s, reference `:136-149`).

Texture mapping: the image of a planar quad under a pinhole camera is a
projective (homography) transform, so each visible face maps its texture
through PIL's PERSPECTIVE transform with coefficients from an 8x8 linear
solve — perspective-CORRECT, not merely affine, and still pure
numpy+PIL.

Pure numpy + PIL (already required for GIF artifacts); no display, no
GPU, no game engine. ``PlantOS3DViewer(stage_factory=SoftwareStage)``
therefore executes the ENTIRE viewer pipeline — scene description,
reconciliation, subprocess queue protocol — and produces frames you can
write to disk.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from rlenv_tpu.render.viewer3d import GROUND_RGB, OBSTACLE_RGB, Sprite3D

SKY_RGB = (170, 200, 235)
TINT_FALLBACK = {
    "rover": (40, 80, 255),
    "thirsty": (255, 165, 0),
    "hydrated": (0, 220, 0),
    "highlight": (0, 255, 0),
}
TEXTURE_FILES = {
    "ground": "grass_texture.png",
    "obstacle": "obstacles_texture.png",
    "rover": "mech_drone_agent.png",
    "thirsty": "dry_plant_bg.png",
    "hydrated": "good_plant_bg.png",
    "water": "mech_drone_water.png",
}


class Camera:
    """Orbiting pinhole camera looking at the origin (the software stand-in
    for Ursina's EditorCamera default view)."""

    def __init__(self, distance: float = 1.45, azimuth_deg: float = 35.0,
                 elevation_deg: float = 42.0, fov_deg: float = 55.0,
                 width: int = 480, height: int = 360):
        self.width, self.height = width, height
        self.f = (width / 2) / math.tan(math.radians(fov_deg) / 2)
        self.distance = distance
        self.azimuth_deg = azimuth_deg
        self.elevation_deg = elevation_deg
        self.set_orbit(distance, azimuth_deg, elevation_deg)

    def fit(self, scene_radius: float) -> None:
        """Re-orbit so a scene of the given radius fills the view."""
        self.set_orbit(self.distance, self.azimuth_deg, self.elevation_deg,
                       scene_radius=max(scene_radius, 1.0))

    def set_orbit(self, distance_factor: float, azimuth_deg: float,
                  elevation_deg: float, scene_radius: float = 10.0) -> None:
        d = distance_factor * scene_radius
        az, el = math.radians(azimuth_deg), math.radians(elevation_deg)
        self.pos = np.array([d * math.cos(el) * math.sin(az),
                             d * math.sin(el),
                             -d * math.cos(el) * math.cos(az)])
        fwd = -self.pos / np.linalg.norm(self.pos)   # look at origin
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        self._view = np.stack([right, up, fwd])      # world -> camera rows

    def to_camera(self, pts: np.ndarray) -> np.ndarray:
        return (pts - self.pos) @ self._view.T

    def project(self, pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """World [N,3] -> (screen [N,2] float, depth [N])."""
        cam = self.to_camera(np.atleast_2d(pts).astype(float))
        z = np.maximum(cam[:, 2], 1e-6)
        x = self.width / 2 + self.f * cam[:, 0] / z
        y = self.height / 2 - self.f * cam[:, 1] / z
        return np.stack([x, y], axis=1), z


_CUBE_FACES = (
    ((0, 1, 2, 3), (0, -1, 0)), ((4, 5, 6, 7), (0, 1, 0)),
    ((0, 1, 5, 4), (0, 0, -1)), ((2, 3, 7, 6), (0, 0, 1)),
    ((1, 2, 6, 5), (1, 0, 0)), ((0, 3, 7, 4), (-1, 0, 0)),
)
_LIGHT = np.array([-1.0, -1.0, 1.0])  # reference DirectionalLight direction
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)


def _homography_coeffs(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """PIL PERSPECTIVE coefficients mapping output (screen-local) points to
    input (texture) points: for each corner, ``src = H(dst)``."""
    A, b = [], []
    for (x, y), (u, v) in zip(dst, src):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y]); b.append(u)
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y]); b.append(v)
    return np.linalg.solve(np.asarray(A, float), np.asarray(b, float))


def _cube_corners(center, scale) -> np.ndarray:
    cx, cy, cz = center
    sx, sy, sz = (scale if isinstance(scale, (tuple, list))
                  else (scale,) * 3)
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    return np.array([
        [cx - hx, cy - hy, cz - hz], [cx + hx, cy - hy, cz - hz],
        [cx + hx, cy - hy, cz + hz], [cx - hx, cy - hy, cz + hz],
        [cx - hx, cy + hy, cz - hz], [cx + hx, cy + hy, cz - hz],
        [cx + hx, cy + hy, cz + hz], [cx - hx, cy + hy, cz + hz]])


class SoftwareStage:
    """Drop-in alternative to ``_UrsinaStage`` that rasterizes frames."""

    def __init__(self, title: str = "PlantOS 3D View",
                 width: int = 480, height: int = 360,
                 assets_dir: Optional[str] = None,
                 gif_path: Optional[str] = None, gif_stride: int = 5,
                 max_gif_frames: int = 200):
        self.title = title
        self.camera = Camera(width=width, height=height)
        self._scene: Dict[str, Sprite3D] = {}
        self._hud: Optional[str] = None
        self._frames_rendered = 0
        self.last_frame: Optional[np.ndarray] = None
        self._spin_until = 0.0
        self._spin_t0 = 0.0
        assets_dir = assets_dir or os.environ.get("RLENV_VIEWER3D_ASSETS")
        self._gif_path = gif_path or os.environ.get("RLENV_VIEWER3D_GIF")
        self._gif_stride = gif_stride
        self._max_gif_frames = max_gif_frames
        self._gif_frames: List[Any] = []
        self._textures: Dict[str, Optional[np.ndarray]] = {}
        self._tex_pil: Dict[str, Any] = {}
        self._ground_tiled: Dict[int, Any] = {}
        # Texture lookup mirrors the reference: files beside the cwd (or an
        # explicit assets dir); missing -> flat-color fallbacks.
        for tint, fname in TEXTURE_FILES.items():
            self._textures[tint] = self._load(fname, assets_dir)

    @staticmethod
    def _load(fname: str, assets_dir: Optional[str]) -> Optional[np.ndarray]:
        for base in filter(None, (assets_dir, ".")):
            path = os.path.join(base, fname)
            if os.path.exists(path):
                try:
                    from PIL import Image
                    return np.asarray(
                        Image.open(path).convert("RGBA"), dtype=np.uint8)
                except Exception:
                    return None
        return None

    # -- stage interface --------------------------------------------------

    def sync(self, scene: Dict[str, Sprite3D]) -> None:
        self._scene = dict(scene)
        plane = scene.get("ground")
        if plane is not None and isinstance(plane.scale, (tuple, list)):
            self.camera.fit(max(plane.scale) / 2)

    def set_hud(self, text: Optional[str]) -> None:
        if text is not None:
            self._hud = text

    def spin_rover(self) -> None:
        self._spin_t0 = time.time()
        self._spin_until = self._spin_t0 + 1.0

    def clear(self) -> None:
        self._scene = {}

    def frame(self) -> None:
        self.last_frame = self.render()
        if (self._gif_path
                and self._frames_rendered % self._gif_stride == 0
                and len(self._gif_frames) < self._max_gif_frames):
            from PIL import Image
            self._gif_frames.append(Image.fromarray(self.last_frame))
        self._frames_rendered += 1

    def quit(self) -> None:
        if self._gif_path and self._gif_frames:
            self._gif_frames[0].save(
                self._gif_path, save_all=True,
                append_images=self._gif_frames[1:], duration=100, loop=0)
        self._scene = {}

    # -- rasterization ----------------------------------------------------

    def render(self) -> np.ndarray:
        from PIL import Image, ImageDraw

        cam = self.camera
        img = Image.new("RGB", (cam.width, cam.height), SKY_RGB)
        draw = ImageDraw.Draw(img, "RGBA")

        # Ground first (everything rests on it), then every remaining
        # primitive — each visible CUBE FACE individually, wires,
        # billboards — painter-sorted far -> near by its own depth.
        ops: List[Tuple[float, Any]] = []
        for key, spec in self._scene.items():
            if spec.kind == "plane":
                self._draw_ground(img, draw, spec)
                continue
            center = np.asarray(spec.world_pos, float)
            _, z = cam.project(center[None])
            depth = float(z[0])
            if spec.kind == "cube":
                corners = _cube_corners(spec.world_pos, spec.scale)
                for face_idx, normal in _CUBE_FACES:
                    n = np.asarray(normal, float)
                    face = corners[list(face_idx)]
                    to_cam = cam.pos - face.mean(axis=0)
                    if np.dot(n, to_cam) <= 0:       # back-face cull
                        continue
                    _, fz = cam.project(face.mean(axis=0)[None])
                    ops.append((float(fz[0]),
                                (self._draw_cube_face, img, draw, face, n)))
            elif spec.kind == "wire":
                ops.append((depth, (self._draw_wire, draw, spec)))
            elif spec.kind == "billboard":
                ops.append((depth, (self._draw_billboard, img, spec,
                                    depth)))
        ops.sort(key=lambda t: -t[0])                # far -> near
        for _, (fn, *args) in ops:
            fn(*args)

        if self._hud:
            draw = ImageDraw.Draw(img, "RGBA")
            draw.rectangle([cam.width - 178, 6, cam.width - 6, 58],
                           fill=(0, 0, 0, 120))
            draw.multiline_text((cam.width - 172, 10), self._hud,
                                fill=(255, 255, 255))
        return np.asarray(img, dtype=np.uint8)

    def _tex_image(self, tint: str):
        """Cached PIL RGBA of a loaded texture (None when unavailable)."""
        if tint in self._tex_pil:
            return self._tex_pil[tint]
        from PIL import Image
        arr = self._textures.get(tint)
        pil = Image.fromarray(arr) if arr is not None else None
        self._tex_pil[tint] = pil
        return pil

    def _textured_poly(self, img, world_pts: np.ndarray, tex,
                       shade: float = 1.0) -> bool:
        """Perspective-correct map of ``tex`` onto the projected quad.

        The planar quad's screen image is a homography of the texture
        square; PIL's PERSPECTIVE transform applies the inverse mapping
        (output pixel -> texture coords) from an 8x8 solve. Returns False
        when the quad is behind the camera or off screen."""
        from PIL import Image, ImageDraw, ImageEnhance

        scr, z = self.camera.project(world_pts)
        if (z <= 1e-5).any():
            return False
        x0 = max(int(math.floor(scr[:, 0].min())), 0)
        y0 = max(int(math.floor(scr[:, 1].min())), 0)
        x1 = min(int(math.ceil(scr[:, 0].max())), img.width)
        y1 = min(int(math.ceil(scr[:, 1].max())), img.height)
        w, h = x1 - x0, y1 - y0
        if w <= 0 or h <= 0:
            return False
        local = scr - np.array([x0, y0], float)
        tw, th = tex.size
        try:
            coeffs = _homography_coeffs(
                local, np.array([[0, 0], [tw, 0], [tw, th], [0, th]],
                                float))
        except np.linalg.LinAlgError:
            # (Near-)collinear projected corners — e.g. a face grazing the
            # back-face cull — make the 8x8 system singular. Degrade to
            # the flat-color path instead of crashing the frame.
            return False
        patch = tex.transform((w, h), Image.PERSPECTIVE, tuple(coeffs),
                              Image.BILINEAR)
        if shade != 1.0:
            patch = ImageEnhance.Brightness(patch).enhance(shade)
        mask = Image.new("L", (w, h), 0)
        ImageDraw.Draw(mask).polygon([tuple(p) for p in local], fill=255)
        if patch.mode == "RGBA":
            from PIL import ImageChops
            mask = ImageChops.multiply(mask, patch.getchannel("A"))
        img.paste(patch.convert("RGB"), (x0, y0), mask)
        return True

    def _poly(self, draw, world_pts: np.ndarray, fill) -> None:
        scr, z = self.camera.project(world_pts)
        if (z <= 1e-5).any():
            return
        draw.polygon([tuple(p) for p in scr], fill=fill)

    def _ground_texture(self, reps: int):
        """The grass texture tiled ``reps x reps`` — the reference's
        ``texture_scale=(grid_size, grid_size)``
        (`plantos_3d_viewer_new.py:47-53`). Cached per rep count."""
        if reps in self._ground_tiled:
            return self._ground_tiled[reps]
        tex = self._tex_image("ground")
        tiled = None
        if tex is not None:
            from PIL import Image
            cell = 512 // max(reps, 1)
            if cell >= 4:
                small = np.asarray(tex.convert("RGB").resize((cell, cell)))
                tiled = Image.fromarray(np.tile(small, (reps, reps, 1)))
        self._ground_tiled[reps] = tiled
        return tiled

    def _draw_ground(self, img, draw, spec: Sprite3D) -> None:
        sx, _, sz = spec.scale if isinstance(spec.scale, (tuple, list)) \
            else (spec.scale,) * 3
        cx, cy, cz = spec.world_pos
        hx, hz = sx / 2, sz / 2
        quad = np.array([[cx - hx, cy, cz - hz], [cx + hx, cy, cz - hz],
                         [cx + hx, cy, cz + hz], [cx - hx, cy, cz + hz]])
        tiled = self._ground_texture(int(round(sx)))
        if tiled is None or not self._textured_poly(img, quad, tiled):
            self._poly(draw, quad, GROUND_RGB)
        # grid lines give the ground its tiled look
        n = int(round(sx))
        for i in range(n + 1):
            a = np.array([[cx - hx + i, cy + 0.01, cz - hz],
                          [cx - hx + i, cy + 0.01, cz + hz]])
            b = np.array([[cx - hx, cy + 0.01, cz - hz + i],
                          [cx + hx, cy + 0.01, cz - hz + i]])
            for seg in (a, b):
                scr, z = self.camera.project(seg)
                if (z > 1e-5).all():
                    draw.line([tuple(scr[0]), tuple(scr[1])],
                              fill=(255, 255, 255, 60))

    def _draw_cube_face(self, img, draw, face: np.ndarray, n: np.ndarray
                        ) -> None:
        lambert = 0.45 + 0.55 * max(np.dot(n, -_LIGHT), 0.0)
        tex = self._tex_image("obstacle")
        if tex is not None and self._textured_poly(img, face, tex,
                                                   shade=lambert):
            return
        base = np.asarray(OBSTACLE_RGB, float)
        color = tuple(np.clip(base * lambert, 0, 255).astype(int))
        self._poly(draw, face, color)

    def _draw_wire(self, draw, spec: Sprite3D) -> None:
        corners = _cube_corners(spec.world_pos, spec.scale)
        scr, z = self.camera.project(corners)
        if (z <= 1e-5).any():
            return
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            draw.line([tuple(scr[a]), tuple(scr[b])],
                      fill=TINT_FALLBACK["highlight"], width=1)

    def _draw_billboard(self, img, spec: Sprite3D, depth: float) -> None:
        from PIL import Image

        scr, z = self.camera.project(np.asarray(spec.world_pos)[None])
        size = max(int(self.camera.f * float(spec.scale) / depth), 2)
        tint = spec.tint
        now = time.time()
        spinning = tint == "rover" and now < self._spin_until
        if spinning and self._textures.get("water") is not None:
            tex = self._textures["water"]
        else:
            tex = self._textures.get(tint)

        if tex is not None:
            sprite = Image.fromarray(tex).resize((size, size))
            if spinning:
                angle = ((now - self._spin_t0) / 1.0) * 3 * 360.0
                sprite = sprite.rotate(angle)
        else:
            color = TINT_FALLBACK.get(tint, (255, 255, 255))
            sprite = Image.new("RGBA", (size, size), (0, 0, 0, 0))
            from PIL import ImageDraw
            ImageDraw.Draw(sprite).ellipse([0, 0, size - 1, size - 1],
                                           fill=color + (255,))
        x, y = int(scr[0, 0] - size / 2), int(scr[0, 1] - size / 2)
        img.paste(sprite, (x, y), sprite)
