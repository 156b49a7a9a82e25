"""Dependency-free web UI server (Python stdlib only).

The reference's L5 serving layer is a Gradio app
(`/root/reference/gradio-app/gradioUI.py:131-178`): model-type dropdown
(DQN/PPO/A2C), model-path textbox, map-algorithm dropdown, sliders for
grid size 10-50 / plants 1-100 / obstacles 0-200, and a Run button that
live-streams one policy episode (frame, reward, exploration %, thirsty
count, text summary) with a Stop cancel.

``rlenv_tpu.apps.webui`` reproduces that app 1:1 *when gradio is
installed*; this image has no gradio wheel and no network egress
(verified: ``pip download gradio`` -> "no matching distribution"), so this
module serves the SAME feature set over ``http.server`` instead — the
same :func:`rlenv_tpu.apps.simulate.run_simulation_live` generator behind
a single-page UI with an auto-polling frame view. No third-party web
framework required, so the serving layer actually runs anywhere the
framework does.

Run: ``python -m rlenv_tpu.apps.webserve --port 7860
[--model-path P --model-type dqn]`` then open http://127.0.0.1:7860/.
"""

from __future__ import annotations

import argparse
import base64
import html
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>GROW-R / PlantOS Live Simulation</title>
<style>
 body { font-family: sans-serif; margin: 1.5em; background: #fafafa; }
 .row { display: flex; gap: 2em; }
 .panel { background: #fff; border: 1px solid #ddd; border-radius: 8px;
          padding: 1em 1.5em; }
 label { display: block; margin-top: .8em; font-weight: 600; }
 .info { font-weight: 400; color: #666; font-size: .85em; }
 input[type=range] { width: 220px; }
 button { margin-top: 1em; margin-right: .5em; padding: .5em 1.4em; }
 #frame { border: 1px solid #ccc; min-width: 300px; min-height: 300px; }
 pre { background: #f4f4f4; padding: .6em; }
</style></head><body>
<h2>PlantOS Rover Simulation</h2>
<div class="row">
<div class="panel">
  <label>Model Type</label>
  <select id="model_type"><option>DQN</option><option>PPO</option>
    <option>A2C</option></select>
  <label>Model Path <span class="info">checkpoint dir or SB3 .zip</span></label>
  <input id="model_path" size="48" value="MODEL_PATH_DEFAULT"/>
  <label>Map Generation Algorithm</label>
  <select id="map_algo"><option>original</option><option>maze</option></select>
  <label>Grid Size <span class="info" id="grid_v">25</span></label>
  <input type="range" id="grid" min="10" max="50" value="25"
    oninput="grid_v.textContent=this.value"/>
  <label>Number of Plants <span class="info" id="plants_v">10</span></label>
  <input type="range" id="plants" min="1" max="100" value="10"
    oninput="plants_v.textContent=this.value"/>
  <label>Number of Obstacles <span class="info" id="obst_v">12</span></label>
  <input type="range" id="obst" min="0" max="200" value="12"
    oninput="obst_v.textContent=this.value"/>
  <div>
    <button id="run" onclick="start()">Run Simulation</button>
    <button id="stop" onclick="stop()">Stop</button>
  </div>
</div>
<div class="panel">
  <img id="frame" alt="simulation frame"/>
  <div>Total Reward: <b id="reward">0.0</b> &nbsp;
       Exploration: <b id="expl">0.0%</b> &nbsp;
       Thirsty Plants: <b id="thirsty">-</b></div>
  <pre id="summary">(idle)</pre>
</div>
</div>
<script>
let timer = null;
async function poll() {
  const r = await fetch('/state'); const s = await r.json();
  if (s.frame) document.getElementById('frame').src = s.frame;
  document.getElementById('reward').textContent = s.reward.toFixed(2);
  document.getElementById('expl').textContent = s.exploration.toFixed(1) + '%';
  document.getElementById('thirsty').textContent = s.thirsty;
  document.getElementById('summary').textContent = s.summary;
  if (!s.running && timer && s.step > 0) { clearInterval(timer); timer = null; }
}
async function start() {
  const body = {
    model_type: document.getElementById('model_type').value,
    model_path: document.getElementById('model_path').value,
    map_generation_algo: document.getElementById('map_algo').value,
    grid_size: +document.getElementById('grid').value,
    num_plants: +document.getElementById('plants').value,
    num_obstacles: +document.getElementById('obst').value };
  await fetch('/start', {method: 'POST', body: JSON.stringify(body)});
  if (!timer) timer = setInterval(poll, 200);
}
async function stop() { await fetch('/stop', {method: 'POST'}); }
window.addEventListener('load', poll);
</script></body></html>
"""


class SimulationState:
    """Latest-frame store written by the worker thread, read by /state."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.stop_event = threading.Event()
        self.thread: Optional[threading.Thread] = None
        self.frame_png: Optional[bytes] = None
        self.reward = 0.0
        self.exploration = 0.0
        self.thirsty = 0
        self.summary = "(idle)"
        self.step = 0
        self.running = False

    def snapshot(self) -> dict:
        with self.lock:
            frame = None
            if self.frame_png is not None:
                frame = ("data:image/png;base64,"
                         + base64.b64encode(self.frame_png).decode())
            return {"frame": frame, "reward": self.reward,
                    "exploration": self.exploration,
                    "thirsty": int(self.thirsty), "summary": self.summary,
                    "step": self.step, "running": self.running}


STATE = SimulationState()


def _encode_png(frame: np.ndarray) -> bytes:
    try:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:
        # zero-dependency fallback: the repo's own PNG writer
        from rlenv_tpu.render.assets import write_png
        import tempfile, os
        rgba = np.dstack([frame, np.full(frame.shape[:2], 255, np.uint8)])
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            path = f.name
        write_png(path, rgba.astype(np.uint8))
        data = open(path, "rb").read()
        os.unlink(path)
        return data


def _worker(params: dict) -> None:
    from rlenv_tpu.apps.simulate import run_simulation_live

    gen = run_simulation_live(
        model_path=params.get("model_path", ""),
        model_type=params.get("model_type", "DQN"),
        grid_size=int(params.get("grid_size", 25)),
        num_plants=int(params.get("num_plants", 10)),
        num_obstacles=int(params.get("num_obstacles", 12)),
        map_generation_algo=params.get("map_generation_algo", "original"),
        use_3d_viewer=params.get("use_3d_viewer", True),
        realtime=False)
    try:
        for step, (frame, reward, expl, thirsty, summary) in enumerate(gen):
            if STATE.stop_event.is_set():
                break
            with STATE.lock:
                STATE.frame_png = _encode_png(np.asarray(frame))
                STATE.reward = float(reward)
                STATE.exploration = float(expl)
                STATE.thirsty = int(thirsty)
                STATE.summary = summary
                STATE.step = step + 1
    finally:
        gen.close()
        with STATE.lock:
            STATE.running = False


class Handler(BaseHTTPRequestHandler):
    default_model_path = ""

    def _send(self, code: int, body: bytes,
              ctype: str = "application/json") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (stdlib API)
        if self.path in ("/", "/index.html"):
            page = _PAGE.replace("MODEL_PATH_DEFAULT",
                                 html.escape(self.default_model_path,
                                             quote=True))
            self._send(200, page.encode(), "text/html; charset=utf-8")
        elif self.path == "/state":
            self._send(200, json.dumps(STATE.snapshot()).encode())
        else:
            self._send(404, b'{"error": "not found"}')

    def do_POST(self) -> None:  # noqa: N802
        length = int(self.headers.get("Content-Length", 0) or 0)
        raw = self.rfile.read(length) if length else b"{}"
        if self.path == "/start":
            try:
                params = json.loads(raw or b"{}")
            except json.JSONDecodeError:
                self._send(400, b'{"error": "bad json"}')
                return
            if STATE.thread is not None and STATE.thread.is_alive():
                STATE.stop_event.set()
                STATE.thread.join(timeout=5)
            STATE.stop_event.clear()
            with STATE.lock:
                STATE.running = True
                STATE.step = 0
                STATE.summary = "(starting...)"
            STATE.thread = threading.Thread(target=_worker, args=(params,),
                                            daemon=True)
            STATE.thread.start()
            self._send(200, b'{"ok": true}')
        elif self.path == "/stop":
            STATE.stop_event.set()
            self._send(200, b'{"ok": true}')
        else:
            self._send(404, b'{"error": "not found"}')

    def log_message(self, fmt, *args) -> None:  # quiet
        pass


def serve(host: str = "127.0.0.1", port: int = 7860,
          model_path: str = "", block: bool = True,
          allow_remote: bool = False) -> ThreadingHTTPServer:
    Handler.default_model_path = model_path
    if host not in ("127.0.0.1", "localhost", "::1") and not allow_remote:
        # /start loads model files from client-supplied filesystem paths —
        # fine on the loopback default, a remote-driven file probe on an
        # open bind (same trust model as `gradioUI.py`'s share link).
        # Refuse unless the caller explicitly opted in.
        raise ValueError(
            f"binding to {host!r} exposes model loading from arbitrary "
            f"local paths to any network client; pass --allow-remote "
            f"(allow_remote=True) to opt in on a trusted network.")
    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"PlantOS web UI on http://{host}:{httpd.server_address[1]}/")
    if block:
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def main() -> None:
    p = argparse.ArgumentParser(description="Serve the PlantOS web UI")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--model-path", type=str, default="",
                   help="Prefill for the model-path textbox")
    p.add_argument("--allow-remote", action="store_true",
                   help="Permit a non-loopback --host (model loading from "
                        "client-supplied paths becomes network-reachable)")
    args = p.parse_args()
    serve(args.host, args.port, model_path=args.model_path,
          allow_remote=args.allow_remote)


if __name__ == "__main__":
    main()
