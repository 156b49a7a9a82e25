"""Import Stable-Baselines3 ``.zip`` checkpoints — including the
reference's own shipped models — into this framework's policies.

The reference trains with SB3/sb3_contrib and ships torch checkpoints
(`/root/reference/train_improved1/models/dqn_improved_final.zip`,
saved by `trainingCode.py:164-168,249-253` / loaded for inference by
`example_usage.py:37-48` and `gradioUI.py:56-60`). A user migrating from
the reference can point this framework at those same ``.zip`` files and
run them on TPU: this module parses the SB3 archive directly (zipfile +
``torch.load`` on ``policy.pth``; the ``stable_baselines3`` package is
NOT required) and converts the torch ``state_dict`` into the matching
flax parameter tree.

Weight-layout conversions:

* torch ``nn.Linear.weight`` is ``[out, in]``; flax ``Dense.kernel`` is
  ``[in, out]`` — transpose.
* torch ``nn.LSTM`` packs the four gates as ``[4H, in]`` rows in order
  (i, f, g, o) with BOTH ``bias_ih`` and ``bias_hh``; flax
  ``OptimizedLSTMCell`` keeps per-gate Dense params ``ii/if/ig/io``
  (input, no bias) and ``hi/hf/hg/ho`` (hidden, bias) — split rows,
  transpose, and fold ``bias_ih + bias_hh`` into the hidden-side bias.

Supported policies (everything the reference produces):

* DQN ``MlpPolicy`` (``q_net.q_net.*``) -> :class:`QNetwork` (ReLU).
* A2C / PPO ``MlpPolicy`` (``mlp_extractor.{policy,value}_net.*``,
  ``action_net``, ``value_net``) -> :class:`ActorCritic` (tanh).
* sb3_contrib RecurrentPPO ``MlpLstmPolicy`` (``lstm_actor``,
  ``lstm_critic``, towers, heads) -> :class:`RecurrentActorCritic`.
"""

from __future__ import annotations

import io
import json
import re
import zipfile
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.models.mlp import ActorCritic, QNetwork
from rlenv_tpu.models.recurrent import RecurrentActorCritic

_GATES = ("i", "f", "g", "o")   # torch nn.LSTM row-chunk order


def _torch_state_dict(zf: zipfile.ZipFile) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(io.BytesIO(zf.read("policy.pth")), map_location="cpu",
                    weights_only=True)
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()}


def detect_sb3_model_type(zip_path: str) -> str:
    """Read the algo family out of the archive's ``data`` json."""
    with zipfile.ZipFile(zip_path) as zf:
        data = json.loads(zf.read("data").decode())
        blob = str(data.get("policy_class", ""))
        names = set(zf.namelist())
    if "RecurrentActorCriticPolicy" in blob or "recurrent" in blob.lower():
        return "ppo"
    if "dqn" in blob.lower():
        return "dqn"
    if "ActorCriticPolicy" in blob or "a2c" in blob.lower() \
            or "ppo" in blob.lower():
        return "a2c"
    # Fallback: inspect the state dict's key shapes.
    with zipfile.ZipFile(zip_path) as zf:
        sd = _torch_state_dict(zf)
    if any(k.startswith("q_net.") for k in sd):
        return "dqn"
    if any(k.startswith("lstm_actor.") for k in sd):
        return "ppo"
    return "a2c"


def _linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
            "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _tower(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Dict]:
    """Sequential Linear(+activation) stack -> MLPTower dense_{i} params."""
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(rf"{re.escape(prefix)}\.(\d+)\.weight",
                                      k)] if m})
    return {f"dense_{i}": _linear(sd, f"{prefix}.{j}")
            for i, j in enumerate(idxs)}


def _lstm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Dict]:
    """torch nn.LSTM (1 layer) -> flax OptimizedLSTMCell per-gate params."""
    w_ih = sd[f"{prefix}.weight_ih_l0"]          # [4H, in]
    w_hh = sd[f"{prefix}.weight_hh_l0"]          # [4H, H]
    bias = (sd[f"{prefix}.bias_ih_l0"] + sd[f"{prefix}.bias_hh_l0"])
    H = w_hh.shape[1]
    params: Dict[str, Dict] = {}
    for n, gate in enumerate(_GATES):
        rows = slice(n * H, (n + 1) * H)
        params[f"i{gate}"] = {"kernel": jnp.asarray(w_ih[rows].T)}
        params[f"h{gate}"] = {"kernel": jnp.asarray(w_hh[rows].T),
                              "bias": jnp.asarray(bias[rows])}
    return params


def load_sb3_policy(zip_path: str, model_type: str = "auto",
                    env_config: Optional[EnvConfig] = None):
    """SB3 ``.zip`` -> ``PolicyRunner`` (same interface as
    :func:`rlenv_tpu.apps.policies.load_policy`)."""
    from rlenv_tpu.apps.policies import PolicyRunner

    if model_type == "auto":
        model_type = detect_sb3_model_type(zip_path)
    model_type = model_type.lower()

    with zipfile.ZipFile(zip_path) as zf:
        sd = _torch_state_dict(zf)

    # Sanity-check the checkpoint's input width against the env config the
    # caller intends to run it in (obs-dim mismatches otherwise surface as
    # shape errors deep inside jit).
    # (For recurrent policies the MLP towers consume LSTM features, so the
    # observation width lives on the LSTM's input kernel.)
    in_keys = ("lstm_actor.weight_ih_l0", "q_net.q_net.0.weight",
               "mlp_extractor.policy_net.0.weight")
    in_dims = [sd[k].shape[1] for k in in_keys if k in sd]
    if env_config is not None and in_dims and in_dims[0] != env_config.obs_dim:
        raise ValueError(
            f"checkpoint expects {in_dims[0]}-dim observations but the env "
            f"config produces {env_config.obs_dim} (grid/LIDAR mismatch)")

    if model_type == "dqn":
        widths = [sd[k].shape[0] for k in sorted(
            (k for k in sd if re.match(r"q_net\.q_net\.\d+\.weight$", k)),
            key=lambda k: int(k.split(".")[2]))]
        hidden, n_actions = tuple(widths[:-1]), widths[-1]
        model = QNetwork(num_actions=n_actions, hidden_sizes=hidden)
        trunk = _tower(sd, "q_net.q_net")        # includes the linear head
        head = trunk.pop(f"dense_{len(hidden)}")
        params = {"params": {"trunk": trunk, "q_head": head}}
        return PolicyRunner(model, params, "dqn")

    if model_type == "a2c":
        pi_tower = _tower(sd, "mlp_extractor.policy_net")
        vf_tower = _tower(sd, "mlp_extractor.value_net")
        hidden = tuple(v["kernel"].shape[1] for _, v in sorted(
            pi_tower.items(), key=lambda kv: int(kv[0].split("_")[1])))
        n_actions = sd["action_net.weight"].shape[0]
        model = ActorCritic(num_actions=n_actions, hidden_sizes=hidden)
        params = {"params": {
            "pi_tower": pi_tower,
            "vf_tower": vf_tower,
            "pi_head": _linear(sd, "action_net"),
            "vf_head": _linear(sd, "value_net"),
        }}
        return PolicyRunner(model, params, "a2c")

    if model_type == "ppo":
        has_critic_lstm = any(k.startswith("lstm_critic.") for k in sd)
        H = sd["lstm_actor.weight_hh_l0"].shape[1]
        pi_tower = _tower(sd, "mlp_extractor.policy_net")
        hidden = tuple(v["kernel"].shape[1] for _, v in sorted(
            pi_tower.items(), key=lambda kv: int(kv[0].split("_")[1])))
        n_actions = sd["action_net.weight"].shape[0]
        model = RecurrentActorCritic(
            num_actions=n_actions, lstm_hidden_size=H, hidden_sizes=hidden,
            enable_critic_lstm=has_critic_lstm)
        p = {
            "actor_lstm": _lstm(sd, "lstm_actor"),
            "pi_tower": pi_tower,
            "vf_tower": _tower(sd, "mlp_extractor.value_net"),
            "pi_head": _linear(sd, "action_net"),
            "vf_head": _linear(sd, "value_net"),
        }
        if has_critic_lstm:
            p["critic_lstm"] = _lstm(sd, "lstm_critic")
        return PolicyRunner(model, {"params": p}, "ppo")

    raise ValueError(f"Unknown SB3 model type: {model_type}")


# -- optimizer-state import (full-fidelity continue-training) ----------------

def _replace_adam_state(opt_state, count, mu, nu):
    """Swap every ScaleByAdamState inside an optax state tuple tree."""
    import optax

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
        if isinstance(s, tuple):
            mapped = [rec(x) for x in s]
            return type(s)(*mapped) if hasattr(s, "_fields") \
                else tuple(mapped)
        return s

    return rec(opt_state)


def load_sb3_dqn_optimizer_state(zip_path: str, params, optimizer):
    """Import the torch Adam moments from an SB3 DQN ``.zip`` into an optax
    optimizer state matching ``params`` (the tree from
    :func:`load_sb3_policy`).

    SB3 archives include ``policy.optimizer.pth`` — without it a continued
    run restarts Adam from zero moments, and the first full-learning-rate
    steps destroy a converged policy (measured: the shipped
    ``dqn_improved_final`` collapses from +2589 to −1200 mean return
    within 1M steps when continued with a fresh optimizer,
    `runs/dqn_tpu_continue_ref/`). The reference's own checked-in
    continuation runs implicitly relied on SB3 restoring this state.

    Returns ``(opt_state, archive_lr)``. torch Adam's per-param
    ``exp_avg``/``exp_avg_sq`` are the SAME biased moments optax's
    ``scale_by_adam`` tracks as ``mu``/``nu`` (bias correction happens at
    use time in both), so the transfer is exact; kernels transpose
    [out, in] -> [in, out] like the weights.
    """
    import io as _io

    import torch

    with zipfile.ZipFile(zip_path) as zf:
        blob = torch.load(_io.BytesIO(zf.read("policy.optimizer.pth")),
                          map_location="cpu", weights_only=True)
    state, groups = blob["state"], blob["param_groups"]
    archive_lr = float(groups[0]["lr"])

    # torch parameter order for the q_net Linear stack: weight, bias per
    # layer, trunk layers first, then the head — mirror of _tower/_linear.
    tree = params["params"]
    layers = [tree["trunk"][k] for k in sorted(
        tree["trunk"], key=lambda n: int(n.split("_")[1]))]
    layers.append(tree["q_head"])

    def moment(field):
        out_layers = []
        idx = 0
        for _ in layers:
            w = jnp.asarray(np.asarray(state[idx][field]).T)   # [in, out]
            b = jnp.asarray(np.asarray(state[idx + 1][field]))
            out_layers.append({"kernel": w, "bias": b})
            idx += 2
        trunk = {f"dense_{i}": p for i, p in enumerate(out_layers[:-1])}
        return {"params": {"trunk": trunk, "q_head": out_layers[-1]}}

    n_torch_params = 2 * len(layers)
    if len(state) != n_torch_params:
        raise ValueError(
            f"optimizer archive has {len(state)} parameter states, "
            f"expected {n_torch_params} for this q_net")
    count = jnp.asarray(int(state[0]["step"]), jnp.int32)
    mu = moment("exp_avg")
    nu = moment("exp_avg_sq")
    chex_shapes = jax.tree.map(lambda a, b: a.shape == b.shape, mu, params)
    if not all(jax.tree.leaves(chex_shapes)):
        raise ValueError("optimizer moments do not match parameter shapes")
    return _replace_adam_state(optimizer.init(params), count, mu, nu), \
        archive_lr
