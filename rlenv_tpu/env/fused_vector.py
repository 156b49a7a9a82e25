"""Vectorized auto-resetting env backed by the fused Pallas step kernel.

Drop-in alternative to :class:`rlenv_tpu.env.vector.VecPlantOS` with the
same ``reset`` / ``step`` API and info dict, but the per-step work runs as
ONE Pallas TPU program (`rlenv_tpu.ops.fused_step`) over a flat, lane-padded
state layout. Resets (map generation) stay on the XLA path — they run once
per episode, not per step — and convert at the pack/unpack boundary.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rlenv_tpu.config import CurriculumConfig
from rlenv_tpu.env.core import PlantOS
from rlenv_tpu.env.curriculum import CurriculumVecPlantOS
from rlenv_tpu.env.vector import _select
from rlenv_tpu.ops.fused_step import (FlatEnvState, build_fused_rollout,
                                      build_fused_step, chunk_done,
                                      pack_state, raw_visits, repack_visits)


def _fused_info(cfg, scal: jnp.ndarray, is_watering: jnp.ndarray
                ) -> Dict[str, jnp.ndarray]:
    """Info dict matching ``PlantOS.get_info`` from the kernel's scalars."""
    total = scal[:, 6]
    thirsty = scal[:, 5]
    return {
        "rover_position": scal[:, 0:2],
        "thirsty_plants": thirsty,
        "hydrated_plants": total - thirsty,
        "total_plants": total,
        "step_count": scal[:, 2],
        "explored_cells": scal[:, 3],
        "total_cells": scal[:, 4],
        "exploration_percentage":
            100.0 * scal[:, 3].astype(jnp.float32)
            / scal[:, 4].astype(jnp.float32),
        "lidar_range": jnp.int32(cfg.lidar_range),
        "lidar_channels": jnp.int32(cfg.lidar_channels),
        "collided_with_wall": scal[:, 8].astype(bool),
        "total_collisions": scal[:, 9],
        "is_watering": is_watering,
    }


class FusedVecPlantOS:
    """Batch of lockstep PlantOS envs stepped by the fused Pallas kernel."""

    def __init__(self, env: PlantOS, num_envs: int, block_envs: int = 128,
                 interpret: bool | None = None):
        if interpret is None:
            # Mosaic only lowers on TPU; fall back to the Pallas
            # interpreter elsewhere (CPU tests) for identical semantics.
            # (TPU platforms can carry other names, e.g. the axon tunnel.)
            dev = jax.devices()[0]
            interpret = not ("tpu" in dev.platform.lower()
                             or "tpu" in dev.device_kind.lower())
        self.env = env
        self.num_envs = num_envs
        self._g = env.config.grid_size
        self._v_reset = jax.vmap(env.reset)
        self._block_envs = block_envs
        self._interpret = interpret
        self._fused = build_fused_step(env.config, num_envs,
                                       block_envs=block_envs,
                                       interpret=interpret)
        self._rollouts: Dict[int, object] = {}

    @property
    def obs_dim(self) -> int:
        return self.env.obs_dim

    @property
    def num_actions(self) -> int:
        return self.env.num_actions

    def reset(self, key: jax.Array) -> Tuple[FlatEnvState, jnp.ndarray, Dict]:
        keys = jax.random.split(key, self.num_envs)
        states, obs, info = self._v_reset(keys)
        return pack_state(states, self._g), obs, info

    def step(self, flat: FlatEnvState, actions: jnp.ndarray
             ) -> Tuple[FlatEnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                        jnp.ndarray, Dict]:
        flat, obs, rewards, term, trunc, is_watering = self._fused(
            flat, actions)
        done = term | trunc
        info = _fused_info(self.env.config, flat.scal, is_watering)

        def do_resets(args):
            flat, obs = args
            reset_states, reset_obs, _ = self._v_reset(flat.key)
            reset_flat = pack_state(reset_states, self._g)
            return (_select(done, reset_flat, flat),
                    jnp.where(done[:, None], reset_obs, obs))

        new_flat, new_obs = jax.lax.cond(
            jnp.any(done), do_resets, lambda args: args, (flat, obs))

        info["final_obs"] = obs
        info["done"] = done
        return new_flat, new_obs, rewards, term, trunc, info

    def rollout(self, flat: FlatEnvState, actions: jnp.ndarray
                ) -> Tuple[FlatEnvState, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Run ``actions.shape[0]`` env steps as ONE Pallas program.

        ``actions`` is int32[K, num_envs] (time-major). Returns
        ``(flat', next_obs, traj)`` where ``next_obs`` is the [B, obs_dim]
        observation the NEXT chunk starts from (post-reset for envs that
        finished) and ``traj`` holds the time-major per-step outputs:
        ``obs`` [K, B, obs_dim], ``rewards``/``terminated``/``truncated``/
        ``is_watering`` [K, B].

        The world grid stays resident on-chip for the whole chunk (it
        crosses HBM once per chunk instead of twice per step). Envs whose
        episode ends mid-chunk freeze (zero reward/obs, latched done) and
        are auto-reset here at the chunk boundary; when dones land on the
        chunk's final step — always true for truncation when K divides
        ``max_steps`` — the trajectory is bit-identical to per-step
        :meth:`step`.
        """
        K = actions.shape[0]
        if K not in self._rollouts:
            # The builder materializes constant tables (selector matrices,
            # LIDAR offsets) as jnp arrays; when the first rollout call is
            # itself being traced (jit/shard_map), force those to concrete
            # compile-time values — otherwise the cached closure would hold
            # leaked tracers.
            with jax.ensure_compile_time_eval():
                self._rollouts[K] = build_fused_rollout(
                    self.env.config, self.num_envs, K,
                    block_envs=self._block_envs, interpret=self._interpret)
        flat, obs_seq, rewards, term, trunc, water = self._rollouts[K](
            flat, actions)
        need = chunk_done(flat)
        last_obs = obs_seq[-1]

        def do_resets(args):
            flat, last_obs = args
            reset_states, reset_obs, _ = self._v_reset(flat.key)
            reset_flat = pack_state(reset_states, self._g)
            # reset_flat's done column is zero by construction
            # (pack_state zero-pads scal), so selecting it clears the latch.
            return (_select(need, reset_flat, flat),
                    jnp.where(need[:, None], reset_obs, last_obs))

        flat, next_obs = jax.lax.cond(
            jnp.any(need), do_resets, lambda args: args, (flat, last_obs))
        traj = {"obs": obs_seq, "rewards": rewards, "terminated": term,
                "truncated": trunc, "is_watering": water, "done_mask": need}
        return flat, next_obs, traj


def build_sharded_rollout(env: PlantOS, num_envs: int, mesh, horizon: int,
                          block_envs: int = 256,
                          interpret: bool | None = None):
    """Multi-chip whole-chunk env rollout: the batch dp-sharded over the
    mesh's ``data`` axis.

    Each device runs the SAME chunked Pallas rollout program the
    single-chip path runs (:meth:`FusedVecPlantOS.rollout`, auto-reset
    included) on its local env shard — envs are independent, so this is
    pure data parallelism with zero collectives inside the step, the same
    'data'-axis sharding the trainers use (``tests/test_parallel.py``).
    Per-env trajectories are bit-identical to single-device execution
    (``tests/test_ops_fused.py::test_sharded_bench_rollout_parity``), so
    N-chip hardware runs the scaling table with no new code: this builder
    IS ``bench.py --mesh N``'s code path.

    Returns jittable ``(reset_fn, rollout_fn)``:
      * ``reset_fn(key) -> (flat_states, obs)`` — sharded batch reset
        (same per-env keys as the single-device path).
      * ``rollout_fn(flat_states, actions[K, num_envs]) ->
        (flat_states', next_obs, traj)`` — one device program per shard.
    """
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]
    if num_envs % n_data:
        raise ValueError(f"num_envs={num_envs} not divisible by the "
                         f"data-axis size {n_data}")
    local = num_envs // n_data
    lenv = FusedVecPlantOS(env, local, block_envs=min(block_envs, local),
                           interpret=interpret)

    def local_reset(keys):
        states, obs, _ = lenv._v_reset(keys)
        return pack_state(states, lenv._g), obs

    def local_rollout(flat, actions):
        return lenv.rollout(flat, actions)

    flat_shape, _ = jax.eval_shape(
        local_reset, jax.random.split(jax.random.PRNGKey(0), local))
    dp_state = jax.tree.map(lambda _: P("data"), flat_shape)
    traj_spec = {"obs": P(None, "data"), "rewards": P(None, "data"),
                 "terminated": P(None, "data"), "truncated": P(None, "data"),
                 "is_watering": P(None, "data"), "done_mask": P("data")}
    reset_sharded = jax.shard_map(
        local_reset, mesh=mesh, in_specs=P("data"),
        out_specs=(dp_state, P("data")), check_vma=False)
    rollout_fn = jax.shard_map(
        local_rollout, mesh=mesh,
        in_specs=(dp_state, P(None, "data")),
        out_specs=(dp_state, P("data"), traj_spec), check_vma=False)

    def reset_fn(key):
        return reset_sharded(jax.random.split(key, num_envs))

    return reset_fn, rollout_fn


class FusedCurriculumVecPlantOS(CurriculumVecPlantOS):
    """Curriculum wrapper whose inner env steps via the fused Pallas kernel.

    Reuses the whole curriculum state machine from
    :class:`CurriculumVecPlantOS`; only the state layout changes
    (flat, lane-padded grids) and the per-step work runs as one Pallas
    program.
    """

    def __init__(self, env: PlantOS, num_envs: int,
                 config: CurriculumConfig = CurriculumConfig(),
                 block_envs: int = 128, interpret: bool | None = None,
                 reset_pool: int = 0):
        super().__init__(env, num_envs, config, reset_pool=reset_pool)
        if interpret is None:
            dev = jax.devices()[0]
            interpret = not ("tpu" in dev.platform.lower()
                             or "tpu" in dev.device_kind.lower())
        self._g = env.config.grid_size
        self._fused = build_fused_step(env.config, num_envs,
                                       block_envs=block_envs,
                                       interpret=interpret)

    def _env_reset_batch(self, keys):
        states, obs, info = self._v_reset(keys)
        return pack_state(states, self._g), obs, info

    def _env_step_batch(self, flat: FlatEnvState, actions: jnp.ndarray):
        flat, obs, rewards, term, trunc, is_watering = self._fused(
            flat, actions)
        info = _fused_info(self.env.config, flat.scal, is_watering)
        return flat, obs, rewards, term, trunc, info

    def _visits(self, flat: FlatEnvState) -> jnp.ndarray:
        # Unrotate + unpack raw counts — only ever called at reset
        # boundaries (the curriculum snapshots/restores under lax.cond).
        return raw_visits(flat, self._g)

    def _replace_visits(self, flat: FlatEnvState, visits):
        # Rewrites both visit fields (raw + clamped mirror) in the grid.
        return repack_visits(flat, self._g, visits)
