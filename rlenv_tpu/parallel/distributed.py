"""Multi-host bootstrap.

The reference has no distributed execution at all (SURVEY.md §2); this is
the TPU-native scale-out path: ``jax.distributed.initialize`` connects the
hosts of a pod slice, after which the SAME mesh/sharding code from
:mod:`rlenv_tpu.parallel.mesh` spans all chips — env batches shard across
hosts over the 'data' axis, XLA routes collectives over ICI within the
slice and DCN between slices.

Single-chip rounds exercise this path via the virtual-device CPU mesh
(tests/test_parallel.py) and the driver's ``dryrun_multichip``; on real
multi-host TPU the only addition is calling :func:`initialize` first.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed, with TPU-pod auto-detection.

    On Cloud TPU pods all three arguments are discovered from the
    metadata/environment; elsewhere they can be passed explicitly or via
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
    Safe to call when already initialized (no-op).
    """
    if getattr(jax.distributed, "is_initialized", None) and \
            jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        # Single-process contexts: no coordinator discoverable, or JAX
        # backends already initialized (interactive use) — run local.
        pass


def runtime_info() -> dict:
    """Process/device topology summary for logs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "platform": jax.devices()[0].platform if jax.devices() else None,
    }
