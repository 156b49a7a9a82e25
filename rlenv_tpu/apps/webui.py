"""Gradio web UI.

Feature parity with `/root/reference/gradio-app/gradioUI.py:131-178`: model
type dropdown (DQN/PPO/A2C), model path textbox, map-algorithm dropdown,
sliders (grid 10-50, plants 1-100, obstacles 0-200), live-streaming Run
button, Stop cancellation, and the companion 3-D viewer window.

gradio is an optional dependency; :func:`build_demo` imports it lazily and
raises a clear error when missing. Run with ``python -m
rlenv_tpu.apps.webui``. When gradio is unavailable (it is not installable
in this image — no wheel, no egress), the dependency-free server
:mod:`rlenv_tpu.apps.webserve` serves the same control surface and live
stream over ``http.server``."""

from __future__ import annotations

import multiprocessing

from rlenv_tpu.apps.simulate import run_simulation_live


def build_demo():
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed; `pip install gradio` to serve the "
            "web UI. The simulation generator itself is importable from "
            "rlenv_tpu.apps.simulate without gradio.") from e

    with gr.Blocks() as demo:
        gr.Markdown("# GROW-R - 2D & 3D Live View")
        gr.Markdown("Select a model and path, then click Run. The 2D view "
                    "will appear below, and a 3D view will open in a new "
                    "window.")
        with gr.Row():
            with gr.Column(scale=1):
                model_type = gr.Dropdown(label="Model Type",
                                         choices=["DQN", "PPO", "A2C"],
                                         value="PPO")
                model_path = gr.Textbox(
                    label="Model Path",
                    placeholder="e.g., logs/train/models/dqn_final")
                map_algo = gr.Dropdown(
                    label="Environment Type",
                    choices=["original", "maze"], value="original",
                    info="original: Open space with scattered obstacles | "
                         "maze: Wide corridors with irregular walls")
                grid_size = gr.Slider(minimum=10, maximum=50, value=25,
                                      step=1, label="Grid Size")
                num_plants = gr.Slider(minimum=1, maximum=100, value=10,
                                       step=1, label="Number of Plants")
                num_obstacles = gr.Slider(minimum=0, maximum=200, value=20,
                                          step=1,
                                          label="Number of Obstacles")
                with gr.Row():
                    run_btn = gr.Button("Run Live Simulation",
                                        variant="primary")
                    stop_btn = gr.Button("Stop Simulation")
            with gr.Column(scale=3):
                image_2d = gr.Image(label="2D Top-Down View", type="numpy",
                                    interactive=False)
        with gr.Row():
            reward_out = gr.Number(label="Total Reward")
            exploration_out = gr.Number(label="Exploration %")
            plants_out = gr.Number(label="Thirsty Plants")
        status_out = gr.Textbox(label="Live Episode Stats", lines=6,
                                interactive=False)

        run_event = run_btn.click(
            fn=run_simulation_live,
            inputs=[model_path, model_type, grid_size, num_plants,
                    num_obstacles, map_algo],
            outputs=[image_2d, reward_out, exploration_out, plants_out,
                     status_out])
        stop_btn.click(fn=None, inputs=None, outputs=None,
                       cancels=[run_event])
    return demo


def main() -> None:
    if multiprocessing.get_start_method(allow_none=True) != "spawn":
        multiprocessing.set_start_method("spawn", force=True)
    build_demo().launch()


if __name__ == "__main__":
    main()
