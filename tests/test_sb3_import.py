"""SB3 ``.zip`` checkpoint import: torch-vs-flax forward equivalence.

The reference ships SB3 torch checkpoints and loads them for inference
(`example_usage.py:37-48`, `gradioUI.py:56-60`). These tests verify that
:mod:`rlenv_tpu.apps.sb3_import` reproduces the torch policies' outputs:
the real shipped DQN checkpoint from `/root/reference`, plus synthesized
archives for the A2C and RecurrentPPO layouts (no A2C/PPO zips are
checked into the reference).
"""

import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rlenv_tpu.apps.policies import load_policy
from rlenv_tpu.apps.sb3_import import detect_sb3_model_type, load_sb3_policy

REF_DQN_ZIP = "/root/reference/train_improved1/models/dqn_improved_final.zip"
OBS_DIM = 107


def _make_zip(tmp_path, name, policy_class_blob, state_dict):
    path = str(tmp_path / name)
    buf = io.BytesIO()
    torch.save(state_dict, buf)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("data", json.dumps({"policy_class": {
            "__module__": policy_class_blob}}))
        zf.writestr("policy.pth", buf.getvalue())
    return path


def _rand_linear(rng, n_in, n_out):
    return (torch.tensor(rng.normal(size=(n_out, n_in)).astype(np.float32)),
            torch.tensor(rng.normal(size=(n_out,)).astype(np.float32)))


def test_load_reference_dqn_zip():
    runner = load_policy(REF_DQN_ZIP)   # .zip routes to the SB3 importer
    assert runner.model_type == "dqn"
    assert runner.model.hidden_sizes == (256, 256)

    sd = torch.load(io.BytesIO(zipfile.ZipFile(REF_DQN_ZIP)
                               .read("policy.pth")),
                    map_location="cpu", weights_only=True)
    rng = np.random.default_rng(0)
    obs = rng.random((16, OBS_DIM), dtype=np.float32)
    x = torch.tensor(obs)
    for i in (0, 2):
        x = torch.relu(x @ sd[f"q_net.q_net.{i}.weight"].T
                       + sd[f"q_net.q_net.{i}.bias"])
    q_ref = (x @ sd["q_net.q_net.4.weight"].T
             + sd["q_net.q_net.4.bias"]).numpy()

    import jax.numpy as jnp
    q = np.asarray(runner._apply(runner.params, jnp.asarray(obs)))
    np.testing.assert_allclose(q, q_ref, atol=1e-3)
    assert (q.argmax(1) == q_ref.argmax(1)).all()
    assert (runner.act(obs) == q_ref.argmax(1)).all()


def test_load_reference_dqn_optimizer_state():
    """The shipped archive's torch Adam moments import exactly: shapes
    match the converted params, count carries the training step, and the
    state drives an optax update (small steps, since nu is converged)."""
    import optax

    from rlenv_tpu.apps.sb3_import import (load_sb3_dqn_optimizer_state,
                                           load_sb3_policy)

    runner = load_sb3_policy(REF_DQN_ZIP, "dqn")
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.adam(5e-4))
    opt_state, archive_lr = load_sb3_dqn_optimizer_state(
        REF_DQN_ZIP, runner.params, optimizer)
    assert archive_lr == pytest.approx(5e-4)

    adam_states = [s for s in jax.tree.leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(x := s, optax.ScaleByAdamState)]
    assert len(adam_states) == 1
    st = adam_states[0]
    assert int(st.count) > 0
    for m, p in zip(jax.tree.leaves(st.mu), jax.tree.leaves(runner.params)):
        assert m.shape == p.shape
    assert all(float(v.max()) >= 0 for v in jax.tree.leaves(st.nu))

    grads = jax.tree.map(jnp.ones_like, runner.params)
    updates, _ = optimizer.update(grads, opt_state, runner.params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree.leaves(updates))


def test_a2c_zip_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    sd = {}
    dims = [OBS_DIM, 64, 32]
    for tower in ("policy_net", "value_net"):
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            w, bias = _rand_linear(rng, a, b)
            sd[f"mlp_extractor.{tower}.{2 * i}.weight"] = w
            sd[f"mlp_extractor.{tower}.{2 * i}.bias"] = bias
    sd["action_net.weight"], sd["action_net.bias"] = _rand_linear(rng, 32, 5)
    sd["value_net.weight"], sd["value_net.bias"] = _rand_linear(rng, 32, 1)

    path = _make_zip(tmp_path, "a2c_model.zip",
                     "stable_baselines3.common.policies", sd)
    assert detect_sb3_model_type(path) == "a2c"
    runner = load_sb3_policy(path)
    assert runner.model.hidden_sizes == (64, 32)

    obs = rng.random((8, OBS_DIM), dtype=np.float32)
    x = torch.tensor(obs)
    for i in (0, 2):
        x = torch.tanh(x @ sd[f"mlp_extractor.policy_net.{i}.weight"].T
                       + sd[f"mlp_extractor.policy_net.{i}.bias"])
    logits_ref = (x @ sd["action_net.weight"].T
                  + sd["action_net.bias"]).numpy()
    v = torch.tensor(obs)
    for i in (0, 2):
        v = torch.tanh(v @ sd[f"mlp_extractor.value_net.{i}.weight"].T
                       + sd[f"mlp_extractor.value_net.{i}.bias"])
    value_ref = (v @ sd["value_net.weight"].T
                 + sd["value_net.bias"]).numpy()[:, 0]

    import jax.numpy as jnp
    logits, value = runner._apply(runner.params, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(logits), logits_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(value), value_ref, atol=1e-4)


def test_recurrent_ppo_zip_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    H = 24
    sd = {}
    for lstm in ("lstm_actor", "lstm_critic"):
        for nm, shape in (("weight_ih_l0", (4 * H, OBS_DIM)),
                          ("weight_hh_l0", (4 * H, H)),
                          ("bias_ih_l0", (4 * H,)),
                          ("bias_hh_l0", (4 * H,))):
            sd[f"{lstm}.{nm}"] = torch.tensor(
                rng.normal(scale=0.3, size=shape).astype(np.float32))
    for tower in ("policy_net", "value_net"):
        w, b = _rand_linear(rng, H, 16)
        sd[f"mlp_extractor.{tower}.0.weight"] = w
        sd[f"mlp_extractor.{tower}.0.bias"] = b
    sd["action_net.weight"], sd["action_net.bias"] = _rand_linear(rng, 16, 5)
    sd["value_net.weight"], sd["value_net.bias"] = _rand_linear(rng, 16, 1)

    path = _make_zip(tmp_path, "recurrent_ppo_model.zip",
                     "RecurrentActorCriticPolicy", sd)
    assert detect_sb3_model_type(path) == "ppo"
    runner = load_sb3_policy(path)
    assert runner.is_recurrent
    assert runner.model.lstm_hidden_size == H

    # Two timesteps through torch LSTMs vs two act() calls.
    obs_seq = rng.random((2, 3, OBS_DIM), dtype=np.float32)

    def torch_lstm(prefix):
        m = torch.nn.LSTM(OBS_DIM, H, batch_first=False)
        m.weight_ih_l0.data = sd[f"{prefix}.weight_ih_l0"]
        m.weight_hh_l0.data = sd[f"{prefix}.weight_hh_l0"]
        m.bias_ih_l0.data = sd[f"{prefix}.bias_ih_l0"]
        m.bias_hh_l0.data = sd[f"{prefix}.bias_hh_l0"]
        return m

    with torch.no_grad():
        a_out, _ = torch_lstm("lstm_actor")(torch.tensor(obs_seq))
        pi = torch.tanh(a_out @ sd["mlp_extractor.policy_net.0.weight"].T
                        + sd["mlp_extractor.policy_net.0.bias"])
        logits_ref = (pi @ sd["action_net.weight"].T
                      + sd["action_net.bias"]).numpy()

    runner.reset_state(3)
    a0 = runner.act(obs_seq[0], episode_start=True)
    a1 = runner.act(obs_seq[1])
    assert (a0 == logits_ref[0].argmax(1)).all()
    assert (a1 == logits_ref[1].argmax(1)).all()
