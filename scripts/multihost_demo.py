"""Multi-host (N>=2 processes) distributed training demo.

The reference has no distributed execution at all (SURVEY.md §2 parallelism
table); this demonstrates the TPU-native scale-out story end to end with
REAL process boundaries: ``--launch N`` spawns N worker processes, each
owning 4 CPU devices (``xla_force_host_platform_device_count``), connected
through ``jax.distributed.initialize`` exactly as N TPU hosts of a pod
slice would be. A single ('data', 'model') mesh then spans all N*4 devices
across the processes; the A2C train step jits once and runs SPMD — env
batch + curriculum state sharded over 'data', tensor-parallel Dense kernels
over 'model', gradient psum crossing the process boundary (the stand-in for
DCN/ICI).

Each worker verifies that (a) the global device count is N*4 while only 4
are addressable locally, (b) the train step executes and its psum-reduced
metrics are finite, and (c) all workers observe bit-identical metrics
(cross-host agreement after the gradient all-reduce). The launcher asserts
every worker exits 0 and prints MULTIHOST OK.

Usage:
  python scripts/multihost_demo.py --launch 2     # the demo (parent)
  python scripts/multihost_demo.py --worker ...   # internal (children)

On a real TPU pod the worker path is unchanged: drop the CPU forcing, let
``jax.distributed.initialize()`` auto-discover the slice topology, and the
same mesh/sharding code spans the pod (rlenv_tpu/parallel/distributed.py).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICES_PER_PROC = 4


def worker(coordinator: str, num_processes: int, process_id: int) -> None:
    # On axon-tunnel machines sitecustomize imports jax (JAX_PLATFORMS=axon)
    # before this runs, so mirror tests/conftest.py: force cpu on the live
    # config and drop the axon backend factory so N workers don't fight over
    # the single tunneled TPU session.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}")
    sys.path.insert(0, REPO)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

    from rlenv_tpu.parallel import distributed

    distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    info = distributed.runtime_info()
    assert info["process_count"] == num_processes, info
    assert info["local_device_count"] == DEVICES_PER_PROC, info
    assert info["global_device_count"] == num_processes * DEVICES_PER_PROC, \
        info

    from rlenv_tpu import EnvConfig, PlantOS
    from rlenv_tpu.config import A2CConfig, CurriculumConfig
    from rlenv_tpu.algos.a2c import A2CTrainer
    from rlenv_tpu.env.curriculum import CurriculumVecPlantOS
    from rlenv_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    n_devices = info["global_device_count"]
    mesh = make_mesh(n_devices, model_parallel=2)

    cfg = EnvConfig(grid_size=9, num_plants=2, num_obstacles=3,
                    lidar_range=2, lidar_channels=4, max_steps=50)
    env = PlantOS(cfg)
    num_envs = n_devices * 4
    venv = CurriculumVecPlantOS(env, num_envs, CurriculumConfig.ppo_dqn())
    trainer = A2CTrainer(venv, A2CConfig(n_steps=2, hidden_sizes=(32, 32)))

    # Every process computes the same host-local initial state (same seed),
    # then device_put lays the GLOBAL array out over the cross-process mesh
    # (each process transfers only its addressable shards).
    state = trainer.init(jax.random.PRNGKey(0))
    state = state.replace(
        env_state=shard_batch(state.env_state, mesh),
        obs=shard_batch(state.obs, mesh),
        stats=state.stats.replace(
            ep_return=shard_batch(state.stats.ep_return, mesh),
            ep_length=shard_batch(state.stats.ep_length, mesh)),
        params=shard_params(state.params, mesh),
        opt_state=shard_params(state.opt_state, mesh),
    )

    with jax.set_mesh(mesh):
        train_step = jax.jit(trainer.train_iteration)
        for _ in range(3):
            state, metrics = train_step(state)
        jax.block_until_ready(metrics)

    local = {k: float(v) for k, v in metrics.items()}
    for k, v in local.items():
        assert v == v and abs(v) < 1e9, f"non-finite metric {k}={v}"
    assert int(state.stats.timesteps) == num_envs * 2 * 3

    # Cross-host agreement: after the psum'd update every process must see
    # bit-identical replicated metrics.
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        jnp.asarray([local[k] for k in sorted(local)]))
    assert gathered.shape[0] == num_processes
    for row in gathered[1:]:
        assert (row == gathered[0]).all(), \
            f"metrics diverged across hosts: {gathered}"

    print(f"worker {process_id}/{num_processes} OK: "
          f"{info['global_device_count']} global devices "
          f"({info['local_device_count']} local), mesh {dict(mesh.shape)}, "
          f"{num_envs} envs, metrics={local}", flush=True)


def _free_port() -> int:
    """Bind port 0 to let the OS pick a free port for the coordinator —
    a fixed port is a flake source when runs overlap (stale listener =>
    jax.distributed.initialize hangs until timeout)."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(num_processes: int, port: int = 0) -> None:
    coordinator = f"127.0.0.1:{port or _free_port()}"
    procs = []
    for i in range(num_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--coordinator", coordinator,
             "--num-processes", str(num_processes),
             "--process-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    failed = False
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- worker {i} (rc={p.returncode}) ---\n{tail}", flush=True)
        failed |= p.returncode != 0
    if failed:
        sys.exit("MULTIHOST FAILED")
    print(f"MULTIHOST OK: {num_processes} processes x {DEVICES_PER_PROC} "
          f"devices, one global mesh, SPMD train step, metrics "
          f"bit-identical across hosts")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", type=int, default=None, metavar="N",
                    help="spawn N simulated hosts and run the demo")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", type=str, default="127.0.0.1:12423")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()
    if args.worker:
        worker(args.coordinator, args.num_processes, args.process_id)
    else:
        launch(args.launch or 2)


if __name__ == "__main__":
    main()
