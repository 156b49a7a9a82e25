from rlenv_tpu.render.render2d import render_frame

__all__ = ["render_frame"]
