"""Test harness configuration.

Tests run on a virtual 8-device CPU platform so multi-chip sharding paths
(dp/tp meshes, collectives) are exercised without TPU hardware — the
TPU-native analogue of testing multi-node code without a cluster (which the
reference never does, SURVEY.md §4).

This environment routes the real TPU through a single-session tunnel
("axon" PJRT plugin, registered by sitecustomize in every Python process);
a test process touching it would serialize on — and sometimes deadlock
against — the one TPU session. So before any JAX backend initializes we
(a) force the cpu platform and (b) deregister the axon backend factory
entirely. Benchmarks (bench.py) keep the default platform and get the TPU.
"""

import os

# Virtual 8-device CPU mesh for sharding tests.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache: this box has 2 weak cores and cold
# compiles of fused env/train programs take minutes; cached reloads are
# seconds. Lives in-repo (gitignored) so repeat test runs stay fast.
# NOTE: configured below via jax.config.update, NOT env vars — on this
# box sitecustomize imports jax at interpreter startup, so jax's
# env-var-derived config is already frozen before ANY user code
# (including this conftest) runs; the env-var form was silently a no-op
# and every suite run recompiled every program from scratch.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# CPU only — must happen before any backend initialization. The env var
# alone is not enough: jax was already imported (with JAX_PLATFORMS=axon)
# by sitecustomize, so update the live config and drop the axon factory.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo_root, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
try:  # pragma: no cover - only present on axon-tunnel machines
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
