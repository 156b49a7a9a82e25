"""Execute the gradio Blocks wiring of ``rlenv_tpu.apps.webui`` against a
stub ``gradio`` module.

gradio itself is uninstallable in this image (no wheel, no egress), so the
binding's ~90 lines would otherwise never run. The stub below implements
just enough of the ``gr`` API surface (Blocks context manager, component
constructors that record their kwargs, ``Button.click`` event wiring) to
build the demo for real and assert the control graph matches the
reference app (`/root/reference/gradio-app/gradioUI.py:131-172`): same
dropdown choices, slider ranges and defaults, Run streaming through
:func:`rlenv_tpu.apps.simulate.run_simulation_live` (the SAME generator
the dependency-free ``webserve`` server uses), and Stop cancelling the
run event.
"""

import sys
import types

import numpy as np
import pytest


class _Component:
    KIND = "component"

    def __init__(self, *args, **kwargs):
        self.kwargs = kwargs
        ctx = _Blocks.current
        if ctx is not None:
            ctx.components.append(self)

    def __init_subclass__(cls):
        cls.KIND = cls.__name__.lower()


class _Container(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Event:
    def __init__(self, fn, inputs, outputs, cancels):
        self.fn = fn
        self.inputs = inputs or []
        self.outputs = outputs or []
        self.cancels = cancels or []


class _Button(_Component):
    def click(self, fn=None, inputs=None, outputs=None, cancels=None):
        ev = _Event(fn, inputs, outputs, cancels)
        _Blocks.current.events.append(ev)
        return ev


class _Blocks:
    current = None

    def __init__(self, *args, **kwargs):
        self.components = []
        self.events = []

    def __enter__(self):
        _Blocks.current = self
        return self

    def __exit__(self, *exc):
        _Blocks.current = None
        return False

    def launch(self, *a, **k):  # pragma: no cover - not exercised
        raise RuntimeError("stub gradio cannot launch")


def _make_stub():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Blocks
    gr.Button = _Button
    for name in ("Markdown", "Dropdown", "Textbox", "Slider", "Image",
                 "Number"):
        gr.__dict__[name] = type(name, (_Component,), {})
    for name in ("Row", "Column"):
        gr.__dict__[name] = type(name, (_Container,), {})
    return gr


@pytest.fixture()
def demo(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", _make_stub())
    from rlenv_tpu.apps.webui import build_demo

    return build_demo()


def _by_label(demo, label):
    for c in demo.components:
        if c.kwargs.get("label") == label:
            return c
    raise AssertionError(f"no component labeled {label!r}")


def test_blocks_graph_matches_reference_controls(demo):
    """Control inventory and parameter ranges of `gradioUI.py:135-165`."""
    mt = _by_label(demo, "Model Type")
    assert mt.kwargs["choices"] == ["DQN", "PPO", "A2C"]
    assert mt.kwargs["value"] == "PPO"

    env_t = _by_label(demo, "Environment Type")
    assert env_t.kwargs["choices"] == ["original", "maze"]
    assert env_t.kwargs["value"] == "original"

    for label, lo, hi, val in (("Grid Size", 10, 50, 25),
                               ("Number of Plants", 1, 100, 10),
                               ("Number of Obstacles", 0, 200, 20)):
        s = _by_label(demo, label)
        assert (s.kwargs["minimum"], s.kwargs["maximum"],
                s.kwargs["value"], s.kwargs["step"]) == (lo, hi, val, 1)

    assert _by_label(demo, "2D Top-Down View").kwargs["type"] == "numpy"
    for label in ("Model Path", "Total Reward", "Exploration %",
                  "Thirsty Plants", "Live Episode Stats"):
        _by_label(demo, label)


def test_run_and_stop_event_wiring(demo):
    """Run streams run_simulation_live into the five outputs; Stop cancels
    the run event (`gradioUI.py:167-172`)."""
    from rlenv_tpu.apps.simulate import run_simulation_live

    run_ev, stop_ev = demo.events
    assert run_ev.fn is run_simulation_live
    assert [c.kwargs.get("label") for c in run_ev.inputs] == [
        "Model Path", "Model Type", "Grid Size", "Number of Plants",
        "Number of Obstacles", "Environment Type"]
    assert [c.kwargs.get("label") for c in run_ev.outputs] == [
        "2D Top-Down View", "Total Reward", "Exploration %",
        "Thirsty Plants", "Live Episode Stats"]
    assert stop_ev.fn is None
    assert stop_ev.cancels == [run_ev]


def test_run_event_streams_frames(demo):
    """Calling the wired fn with the UI's input ordering streams
    (frame, reward, exploration, thirsty, summary) tuples — the load-error
    path here (`gradioUI.py:55-65` semantics), keeping the test free of a
    trained checkpoint; the trained-policy stream of the same generator is
    covered by test_webserve.py::test_streams_trained_policy_episode."""
    run_ev = demo.events[0]
    gen = run_ev.fn("/nonexistent/model", "DQN", 10, 2, 3, "original")
    frame, reward, exploration, thirsty, summary = next(gen)
    assert isinstance(frame, np.ndarray) and frame.ndim == 3
    assert summary.startswith("Error:")
    assert list(gen) == []
