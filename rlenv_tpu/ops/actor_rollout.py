"""Policy-in-kernel rollouts: the actor MLP runs INSIDE the fused
Pallas env kernel (the "Anakin" architecture, Hessel et al. 2021 —
whole agent-environment loop on-chip).

:func:`build_fused_rollout` needs the whole action sequence up front, so
any policy-driven rollout degenerates to one kernel launch per step: a
policy forward (3-4 tiny matmuls), an env kernel, and host-side glue, a
~0.7 ms serial chain per step through this box's device tunnel. The
reference has the same shape of cost in Python (`trainingCode.py:188-194`
evaluates with SB3 ``evaluate_policy``: one torch forward + one Python
env step per timestep).

This module instead keeps BOTH halves of the agent-env loop resident in
one Pallas program over a ``(env_blocks, horizon)`` grid:

* the packed world grid and scalars ride in revisited output blocks
  (exactly as in :func:`build_fused_rollout`);
* the CURRENT observation rides in a revisited ``[OBS_PAD, Bb]`` output
  block — step k's policy forward reads the obs step k-1's transition
  wrote, all in VMEM;
* the policy is an MLP evaluated in the kernel's TRANSPOSED layout:
  ``h = act(W @ x + b)`` with envs on lanes, so every layer is one MXU
  matmul over the resident obs block (weights enter as constant-indexed
  blocks, fetched into VMEM once and reused for all ``horizon`` steps);
* action selection is an in-kernel argmax (first-max tie-breaking,
  identical to ``jnp.argmax``) over the ``A_PAD``-padded logit rows;
* per-env RETURNS accumulate in a revisited ``[1, Bb]`` block, so a
  whole deterministic evaluation episode needs ZERO per-step HBM
  traffic beyond the streamed action/reward rows.

A 1000-step greedy evaluation of the DQN policy becomes ONE kernel
launch instead of 1000 launches of ~5 programs each — used by the
in-training evaluator (`rlenv_tpu.train.trainer.make_eval_fn`), which
DESIGN.md round 4 measured at ~0.7 s per eval (~13 s of a 45 s flagship
DQN run).

Weight layout: flax ``Dense`` kernels are ``[in, out]`` computing
``x @ W + b`` on reference-layout observations. In-kernel we compute
``W' @ x_k + b`` on KERNEL-layout observations (component-major,
lane-padded), so layer 0's kernel is transposed AND column-scattered
through the obs permutation: ``W0'[:, perm] = W0.T`` (padding lanes get
zero weight; see :func:`_scatter_input_kernel`). Deeper layers are plain
transposes. All matmuls run in float32 (``preferred_element_type``) —
these are [<=512, <=512] @ [<=512, Bb] matmuls, far too small to be MXU
-bound, and f32 keeps the in-kernel forward bit-comparable to the XLA
forward up to summation order.

Parity is asserted two ways (``tests/test_actor_rollout.py``):
* env half: replaying the recorded action stream through
  :func:`build_fused_rollout` reproduces the actor kernel's rewards and
  final state bit-exactly;
* policy half: each recorded action equals ``argmax`` of the same-order
  matmul forward on the replayed observation stream.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlenv_tpu.config import EnvConfig
from rlenv_tpu.ops.fused_step import (FlatEnvState, _SC_COLS, _SC_DONE,
                                      _block_envs_for, _lane_pad,
                                      _make_transition_t, _mlp_greedy_rows,
                                      _obs_permutation,
                                      _probe_selector)

_A_PAD = 8  # logit rows, padded for sublane alignment (5 real actions)


def _scatter_input_kernel(w0: np.ndarray | jnp.ndarray,
                          perm: np.ndarray, obs_pad: int) -> jnp.ndarray:
    """[obs_dim, H] flax kernel -> [H, OBS_PAD] kernel-layout matrix."""
    h = w0.shape[1]
    out = jnp.zeros((h, obs_pad), w0.dtype)
    return out.at[:, perm].set(jnp.asarray(w0).T)


def pack_mlp_policy(config: EnvConfig, layers: Sequence[Tuple[jnp.ndarray,
                                                              jnp.ndarray]],
                    dtype=jnp.float32):
    """Transpose/scatter/pad a flax MLP ``[(kernel, bias), ...]`` stack
    (trunk layers then action head, reference obs layout) into the
    kernel-layout operands :func:`build_actor_rollout`'s actor expects.

    Cheap enough to run per eval call (a few hundred KB of copies), so
    updated params flow straight in with no kernel rebuild. ``dtype``
    selects the WEIGHT storage/matmul-input precision (pass bfloat16 to
    pair with ``build_actor_rollout(compute_dtype="bfloat16")`` — the
    cast must happen here, outside the kernel, or it reruns on every
    grid step); biases stay float32 (they add into the f32 accumulator).
    """
    perm = _obs_permutation(config)
    obs_pad = _lane_pad(config.obs_dim)
    ws, bs = [], []
    for i, (w, b) in enumerate(layers):
        wt = (_scatter_input_kernel(w, perm, obs_pad) if i == 0
              else jnp.asarray(w).T)
        if i == len(layers) - 1:  # action head: pad rows to _A_PAD
            pad = _A_PAD - wt.shape[0]
            wt = jnp.pad(wt, ((0, pad), (0, 0)))
            b = jnp.pad(jnp.asarray(b), (0, pad))
        ws.append(wt.astype(dtype))
        bs.append(jnp.asarray(b).astype(jnp.float32)[:, None])
    return ws, bs


def qnet_policy_layers(params) -> list:
    """Flax :class:`rlenv_tpu.models.QNetwork` params -> layer list."""
    p = params["params"] if "params" in params else params
    layers = []
    trunk = p["trunk"]
    for i in range(len(trunk)):
        d = trunk[f"dense_{i}"]
        layers.append((d["kernel"], d["bias"]))
    layers.append((p["q_head"]["kernel"], p["q_head"]["bias"]))
    return layers


def actor_critic_policy_layers(params) -> list:
    """Flax :class:`rlenv_tpu.models.ActorCritic` params -> pi layers."""
    p = params["params"] if "params" in params else params
    tower = p["pi_tower"]
    layers = []
    for i in range(len(tower)):
        d = tower[f"dense_{i}"]
        layers.append((d["kernel"], d["bias"]))
    layers.append((p["pi_head"]["kernel"], p["pi_head"]["bias"]))
    return layers


def build_actor_rollout(config: EnvConfig, num_envs: int, horizon: int,
                        n_layers: int, activation: str = "relu",
                        block_envs: int = 128, interpret: bool = False,
                        compute_dtype: str = "float32"):
    """``horizon`` (policy forward -> env transition) pairs per Pallas
    program.

    Returns ``actor(flat, obs0, ws, bs) -> (flat', last_obs, returns,
    actions, rewards)`` with ``obs0`` the [B, obs_dim] reference-layout
    observation of ``flat``'s current state, ``ws``/``bs`` from
    :func:`pack_mlp_policy` (``n_layers`` INCLUDES the action head),
    ``returns`` float32[B] (sum of rewards over the chunk), ``actions``
    int32[horizon, B] and ``rewards`` float32[horizon, B] time-major.

    Action selection is greedy argmax (deterministic evaluation — SB3
    ``evaluate_policy(deterministic=True)``, `trainingCode.py:188`).
    Mid-chunk done envs freeze exactly as :func:`build_fused_rollout`:
    state/reward/obs pinned, done latched for the caller's reset.

    ``compute_dtype="bfloat16"`` runs the matmuls at the MXU's native
    input precision (~4x the f32 MXU rate; accumulation stays f32) —
    the throughput mode: argmax ties may resolve differently than the
    f32/XLA forward in the last ulp, so the default stays f32 for the
    evaluator's near-bit policy agreement.
    """
    from jax.experimental import pallas as pl

    g = config.grid_size
    C = config.lidar_channels
    Rr = config.lidar_range
    V = config.visit_map_size ** 2
    L = _lane_pad(g * g)
    K = int(horizon)
    act_fn = jnp.tanh if activation == "tanh" else \
        (lambda x: jnp.maximum(x, 0.0))

    Bb = _block_envs_for(num_envs, block_envs)
    n_blocks = num_envs // Bb

    lid, vis, sel_np = _probe_selector(C, Rr, config.visit_map_size, g, L)
    PCOL = sel_np.shape[1]
    perm = _obs_permutation(config)
    OBS_PAD = _lane_pad(config.obs_dim)
    transition = _make_transition_t(config, Bb)
    n_act = config.num_actions

    def kernel(*refs):
        (rolled_ref, scal_ref, obs0_ref, pdx_ref, pdy_ref, vdx_ref,
         vdy_ref, sel_ref) = refs[:8]
        w_refs = refs[8:8 + n_layers]
        b_refs = refs[8 + n_layers:8 + 2 * n_layers]
        (rolled_out, scal_out, obs_res, ret_out, act_out,
         rew_out) = refs[8 + 2 * n_layers:]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _load():
            rolled_out[:] = rolled_ref[:]
            scal_out[:] = scal_ref[:]
            obs_res[:] = obs0_ref[:]
            ret_out[:] = jnp.zeros_like(ret_out)

        # --- policy forward on the resident observation ---
        # (weights enter PRE-cast to the compute dtype via
        # pack_mlp_policy — an in-kernel cast would rerun per grid step;
        # forward/argmax shared with every parity mirror: _mlp_greedy_rows)
        cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        _, a = _mlp_greedy_rows(
            obs_res[:].astype(cdt), [w[:] for w in w_refs],
            [b[:] for b in b_refs], act_fn, n_act)         # [1, Bb]

        rolled = rolled_out[:]
        sc = scal_out[:]
        new_rolled, new_sc, obs, reward, term, trunc, is_water = transition(
            rolled, sc, a,
            pdx_ref[:], pdy_ref[:], vdx_ref[:], vdy_ref[:], sel_ref[:])

        # Freeze envs whose episode already ended inside this chunk
        # (same latch as build_fused_rollout).
        done_prev = sc[_SC_DONE:_SC_DONE + 1, :] > 0       # [1, Bb]
        new_rolled = jnp.where(done_prev, rolled, new_rolled)
        new_sc = jnp.where(done_prev, sc, new_sc)
        reward = jnp.where(done_prev, 0.0, reward)
        term = term & ~done_prev
        trunc = trunc & ~done_prev
        obs = jnp.where(done_prev, 0.0, obs)
        done_now = (done_prev | term | trunc).astype(jnp.int32)
        new_sc = jnp.concatenate([
            new_sc[:_SC_DONE, :], done_now,
            new_sc[_SC_DONE + 1:, :]], axis=0)

        rolled_out[:] = new_rolled
        scal_out[:] = new_sc
        obs_res[:] = obs
        ret_out[:] = ret_out[:] + reward
        act_out[:] = a[None]
        rew_out[:] = reward[None]

    def state_spec(rows):
        return pl.BlockSpec((rows, Bb), lambda i, k: (0, i))

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, k: (0, 0))

    def time_spec(rows):
        return pl.BlockSpec((1, rows, Bb), lambda i, k: (k, 0, i))

    if interpret:
        compiler_params = None
    else:
        from jax.experimental.pallas import tpu as pltpu
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)

    def make_call(w_shapes):
        w_specs = [const_spec(s[0], s[1]) for s in w_shapes]
        b_specs = [const_spec(s[0], 1) for s in w_shapes]
        return pl.pallas_call(
            kernel,
            compiler_params=compiler_params,
            grid=(n_blocks, K),
            in_specs=[state_spec(L), state_spec(_SC_COLS),
                      state_spec(OBS_PAD),
                      const_spec(C, Rr), const_spec(C, Rr),
                      const_spec(V, 1), const_spec(V, 1),
                      const_spec(PCOL, L)] + w_specs + b_specs,
            out_specs=[state_spec(L), state_spec(_SC_COLS),
                       state_spec(OBS_PAD), state_spec(1),
                       time_spec(1), time_spec(1)],
            out_shape=[
                jax.ShapeDtypeStruct((L, num_envs), jnp.int32),
                jax.ShapeDtypeStruct((_SC_COLS, num_envs), jnp.int32),
                jax.ShapeDtypeStruct((OBS_PAD, num_envs), jnp.float32),
                jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
                jax.ShapeDtypeStruct((K, 1, num_envs), jnp.int32),
                jax.ShapeDtypeStruct((K, 1, num_envs), jnp.float32),
            ],
            interpret=interpret,
        )

    perm_j = jnp.asarray(perm)
    pdx_j = jnp.asarray(lid[:, :, 0].copy())               # [C, R]
    pdy_j = jnp.asarray(lid[:, :, 1].copy())
    vdx_j = jnp.asarray(vis[:, 0][:, None].copy())         # [V, 1]
    vdy_j = jnp.asarray(vis[:, 1][:, None].copy())
    sel_j = jnp.asarray(sel_np.T.copy())                   # [PCOL, L]

    def actor(flat: FlatEnvState, obs0: jnp.ndarray, ws, bs):
        assert len(ws) == n_layers and len(bs) == n_layers
        call = make_call([w.shape for w in ws])
        # reference-layout obs -> kernel layout: obs_k[perm] = obs_ref
        obs0_k = jnp.zeros((num_envs, OBS_PAD),
                           jnp.float32).at[:, perm_j].set(obs0)
        rolled, scal, last_obs_k, ret, act_s, rew_s = call(
            flat.rolled.T, flat.scal.T, obs0_k.T,
            pdx_j, pdy_j, vdx_j, vdy_j, sel_j, *ws, *bs)
        new_flat = FlatEnvState(rolled=rolled.T, scal=scal.T, key=flat.key)
        last_obs = jnp.take(last_obs_k, perm_j, axis=0).T
        return (new_flat, last_obs, ret[0],
                act_s[:, 0, :], rew_s[:, 0, :])

    return actor


def build_sharded_actor_rollout(env, num_envs: int, mesh, horizon: int,
                                n_layers: int, activation: str = "relu",
                                block_envs: int = 128,
                                interpret: bool | None = None):
    """Multi-chip closed agent-env loop: the env batch dp-sharded over the
    mesh's ``data`` axis, the policy weights REPLICATED.

    Each device runs the SAME policy-in-kernel rollout program the
    single-chip path runs on its local env shard — envs are independent
    and the policy is read-only, so this is pure data parallelism with
    zero collectives per step (the same 'data'-axis sharding the
    trainers and ``bench.py --mesh`` use). Per-env outputs are
    bit-identical to single-device execution
    (``tests/test_actor_rollout.py::test_sharded_actor_rollout_parity``),
    so N-chip hardware runs the full agent loop with no new code.

    Returns jittable ``(reset_fn, actor_fn)``:
      * ``reset_fn(key) -> (flat, obs)`` — sharded batch reset (same
        per-env keys as the single-device path).
      * ``actor_fn(flat, obs, ws, bs) -> (flat', last_obs, returns,
        actions, rewards)`` — one device program per shard; ``ws``/``bs``
        from :func:`pack_mlp_policy`, replicated.
    """
    from jax.sharding import PartitionSpec as P

    from rlenv_tpu.ops.fused_step import pack_state

    if interpret is None:
        dev = jax.devices()[0]
        interpret = not ("tpu" in dev.platform.lower()
                         or "tpu" in dev.device_kind.lower())
    n_data = mesh.shape["data"]
    if num_envs % n_data:
        raise ValueError(f"num_envs={num_envs} not divisible by the "
                         f"data-axis size {n_data}")
    local = num_envs // n_data
    g = env.config.grid_size
    v_reset = jax.vmap(env.reset)
    with jax.ensure_compile_time_eval():
        actor = build_actor_rollout(env.config, local, horizon,
                                    n_layers=n_layers,
                                    activation=activation,
                                    block_envs=min(block_envs, local),
                                    interpret=interpret)

    def local_reset(keys):
        states, obs, _ = v_reset(keys)
        return pack_state(states, g), obs

    def local_actor(flat, obs, ws, bs):
        return actor(flat, obs, list(ws), list(bs))

    flat_shape, _ = jax.eval_shape(
        local_reset, jax.random.split(jax.random.PRNGKey(0), local))
    dp_state = jax.tree.map(lambda _: P("data"), flat_shape)
    rep = P()
    reset_sharded = jax.shard_map(
        local_reset, mesh=mesh, in_specs=P("data"),
        out_specs=(dp_state, P("data")), check_vma=False)
    actor_fn = jax.shard_map(
        local_actor, mesh=mesh,
        in_specs=(dp_state, P("data"), rep, rep),
        out_specs=(dp_state, P("data"), P("data"),
                   P(None, "data"), P(None, "data")),
        check_vma=False)

    def reset_fn(key):
        return reset_sharded(jax.random.split(key, num_envs))

    return reset_fn, actor_fn
