"""Pallas TPU kernels for the framework's hot ops."""

from rlenv_tpu.ops.fused_step import FlatEnvState, build_fused_step, pack_state, unpack_state

__all__ = ["FlatEnvState", "build_fused_step", "pack_state", "unpack_state"]
