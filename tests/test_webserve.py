"""The stdlib web UI server actually serves.

Gradio is uninstallable in this image (no wheel, no egress), so the L5
serving layer runs on ``rlenv_tpu.apps.webserve`` (http.server). These
tests bind a real socket, fetch the page, drive /start -> /state -> /stop
through the same endpoints the page's JS uses, and stream a real episode
with a trained tiny policy.
"""

import json
import time
import urllib.request

import pytest

from rlenv_tpu.config import A2CConfig, EnvConfig


@pytest.fixture(scope="module")
def server():
    from rlenv_tpu.apps import webserve

    httpd = webserve.serve(host="127.0.0.1", port=0, block=False)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _post(url, payload=None):
    data = json.dumps(payload or {}).encode()
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_page_serves_reference_controls(server):
    page = _get(server + "/").decode()
    # the Gradio app's control surface (`gradioUI.py:131-165`)
    for needle in ("Model Type", "DQN", "PPO", "A2C", "Model Path",
                   "Map Generation Algorithm", "original", "maze",
                   "Grid Size", "Number of Plants", "Number of Obstacles",
                   "Run Simulation", "Stop"):
        assert needle in page, f"missing control: {needle}"


def test_model_path_html_escaped(server):
    """A CLI-provided default model path is HTML-escaped into the page
    (advisor finding: raw substitution let a crafted path inject
    markup)."""
    from rlenv_tpu.apps.webserve import Handler

    old = Handler.default_model_path
    try:
        Handler.default_model_path = 'x"><script>alert(1)</script>'
        page = _get(server + "/").decode()
        assert "<script>alert(1)</script>" not in page
        assert "&lt;script&gt;" in page
    finally:
        Handler.default_model_path = old


def test_state_endpoint_idle(server):
    s = json.loads(_get(server + "/state"))
    assert set(s) == {"frame", "reward", "exploration", "thirsty",
                      "summary", "step", "running"}


def test_bad_model_path_yields_error_frame(server):
    # mirrors the Gradio app's load-failure path (`gradioUI.py:55-65`)
    assert _post(server + "/start", {
        "model_path": "/nonexistent/model", "model_type": "DQN",
        "grid_size": 10, "num_plants": 2, "num_obstacles": 3})["ok"]
    for _ in range(50):
        s = json.loads(_get(server + "/state"))
        if not s["running"] and s["step"] > 0:
            break
        time.sleep(0.2)
    assert s["summary"].startswith("Error:")


def test_streams_trained_policy_episode(server, tmp_path):
    from rlenv_tpu.train.trainer import train

    env_config = EnvConfig(grid_size=10, num_plants=2, num_obstacles=3,
                           lidar_range=6, lidar_channels=16, max_steps=40)
    _, result = train(algo="a2c", total_timesteps=8 * 2 * 2, n_envs=8,
                      env_config=env_config,
                      algo_config=A2CConfig(hidden_sizes=(16,), n_steps=2),
                      log_dir=str(tmp_path), iterations_per_chunk=2,
                      plot=False, verbose=False)

    assert _post(server + "/start", {
        "model_path": result.final_model_path, "model_type": "A2C",
        "grid_size": 10, "num_plants": 2, "num_obstacles": 3,
        "use_3d_viewer": False})["ok"]
    frame = None
    for _ in range(150):
        s = json.loads(_get(server + "/state"))
        if s["step"] >= 3 and s["frame"]:
            frame = s["frame"]
            break
        time.sleep(0.2)
    assert frame is not None and frame.startswith("data:image/png;base64,")
    assert "Step:" in s["summary"] and "Exploration:" in s["summary"]
    _post(server + "/stop")
    for _ in range(50):
        s = json.loads(_get(server + "/state"))
        if not s["running"]:
            break
        time.sleep(0.2)
    assert not s["running"], "Stop cancels the stream"


def test_non_loopback_bind_requires_opt_in():
    """/start loads model files from client-supplied paths, so an open
    bind must be an explicit opt-in (round-4 advisor finding)."""
    from rlenv_tpu.apps import webserve

    with pytest.raises(ValueError, match="allow-remote"):
        webserve.serve(host="0.0.0.0", port=0, block=False)
