"""Web-UI import gating (gradio is optional)."""

import importlib.util

import pytest


def test_build_demo_gradio_gate():
    from rlenv_tpu.apps.webui import build_demo
    if importlib.util.find_spec("gradio") is None:
        with pytest.raises(ImportError, match="gradio is not installed"):
            build_demo()
    else:  # pragma: no cover - exercised only where gradio exists
        demo = build_demo()
        assert demo is not None


def test_viewer3d_gate():
    """PlantOS3DViewer raises cleanly without ursina; the module itself
    imports fine (protocol helpers stay usable)."""
    import sys

    import rlenv_tpu.render.viewer3d as v3d

    # the parity oracle may have installed a non-functional ursina stub;
    # either way construction must raise (ImportError when truly absent,
    # the stub's RuntimeError otherwise), never half-initialize.
    if "ursina" in sys.modules and getattr(
            sys.modules["ursina"], "__spec__", None) is None:
        with pytest.raises((ImportError, RuntimeError, TypeError)):
            v3d.PlantOS3DViewer(grid_size=9)
    elif importlib.util.find_spec("ursina") is None:
        with pytest.raises(ImportError):
            v3d.PlantOS3DViewer(grid_size=9)
