"""Load the actual reference environment as a golden parity oracle.

The reference repo (read-only at /root/reference) is pure Python on
gymnasium+pygame, both available in this image; only its Ursina 3-D viewer
import needs stubbing. Parity tests inject the reference's generated map
into the JAX env and demand matching transitions/rewards/observations.

If /root/reference is absent (e.g. CI without the mount), importing helpers
return None and parity tests skip.
"""

from __future__ import annotations

import os
import sys
import types

_REF_ROOT = "/root/reference"
_REF_APP = os.path.join(_REF_ROOT, "gradio-app")


def _stub_ursina() -> None:
    if "ursina" in sys.modules:
        return
    ur = types.ModuleType("ursina")
    ur.application = types.ModuleType("ursina.application")

    def _unavailable(*a, **k):  # pragma: no cover
        raise RuntimeError("ursina stubbed for headless parity testing")

    for name in ("Ursina", "Entity", "EditorCamera", "Text", "AmbientLight",
                 "DirectionalLight", "Vec2", "Vec3", "color", "window",
                 "destroy", "Sequence", "Wait", "Func", "curve"):
        setattr(ur, name, _unavailable)
    sys.modules["ursina"] = ur
    sys.modules["ursina.application"] = ur.application


def load_reference_env_class():
    """Return the reference ``PlantOSEnvNew`` class, or None if unavailable."""
    if not os.path.isdir(_REF_APP):
        return None
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    _stub_ursina()
    for p in (_REF_APP, _REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        from plantos_env_new import PlantOSEnvNew  # noqa: PLC0415
        return PlantOSEnvNew
    except Exception:
        return None


def extract_map(ref_env):
    """Read (obstacles bool[g,g], plants int8[g,g], rover int32[2]) out of a
    reset reference env instance."""
    import numpy as np

    g = ref_env.grid_size
    obstacles = np.zeros((g, g), dtype=bool)
    for (x, y) in ref_env.obstacles:
        obstacles[x, y] = True
    plants = np.zeros((g, g), dtype=np.int8)
    for (x, y), thirsty in ref_env.plants.items():
        plants[x, y] = 2 if thirsty else 1
    rover = np.asarray(ref_env.rover_pos, dtype=np.int32)
    return obstacles, plants, rover
