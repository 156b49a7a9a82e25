"""Device-mesh scaling utilities.

The reference has no learner/gradient distribution at all — its only
"parallelism" is 64 serial Python envs in one process (SURVEY.md §2,
parallelism table). The TPU-native scaling story is:

* **data parallelism (dp)** — the env batch (and per-env curriculum state)
  is sharded along a ``data`` mesh axis; each chip steps its shard of envs
  locally, and gradient reductions ride ICI via ``psum`` inserted by XLA.
* **tensor parallelism (tp)** — Dense kernels are sharded along a ``model``
  axis (column-parallel on the output dim where divisible). For the
  reference's MLP scale this is not needed for capacity, but the sharding
  rules exist so the same code scales to larger towers (e.g. the 2562-wide
  LSTM policy).
* pp/sp/ep — not applicable to this workload (no layer pipeline depth, no
  long-sequence axis beyond lax.scan, no experts); documented here per the
  survey rather than left implicit.

Multi-host: under ``jax.distributed`` the same ``Mesh`` spans hosts; env
state lives sharded in HBM and only metrics cross to the host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_parallel={model_parallel}")
    arr = mesh_utils.create_device_mesh(
        (n_devices // model_parallel, model_parallel),
        devices=np.asarray(devices))
    return Mesh(arr, ("data", "model"))


def shard_batch(tree, mesh: Mesh):
    """Shard every leaf's leading (batch) axis over the 'data' axis."""
    def to_sharded(x):
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(to_sharded, tree)


def batch_sharding(mesh: Mesh, tree):
    """Shardings pytree matching :func:`shard_batch` (for in_shardings)."""
    def spec(x):
        s = P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return NamedSharding(mesh, s)
    return jax.tree.map(spec, tree)


def shard_axis(tree, mesh: Mesh, axis: int, name: str = "data"):
    """Shard every leaf's ``axis`` over a mesh axis; leaves with fewer dims
    (e.g. scalar counters) are replicated.

    Used for the DQN replay buffer, whose slot-major layout puts the env
    (batch) dimension at axis 1 (``[S, B, ...]``): sharding axis 1 over
    'data' co-locates each env's transitions with the chip stepping it, so
    buffer writes are device-local and only the batch-64 sample gather
    crosses chips."""
    def to_sharded(x):
        nd = np.ndim(x)
        if nd > axis:
            spec = [None] * nd
            spec[axis] = name
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P(*([None] * nd))))
    return jax.tree.map(to_sharded, tree)


def shard_params(params, mesh: Mesh):
    """Tensor-parallel placement: shard each kernel's last (output) axis
    over 'model' when divisible, replicate everything else."""
    model_size = mesh.shape["model"]

    def to_sharded(x):
        if x.ndim >= 2 and x.shape[-1] % model_size == 0:
            spec = P(*([None] * (x.ndim - 1)), "model")
        else:
            spec = P(*([None] * x.ndim))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(to_sharded, params)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    def to_sharded(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(*([None] * np.ndim(x)))))
    return jax.tree.map(to_sharded, tree)
