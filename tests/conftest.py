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
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_repo_root, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

# CPU only — must happen before any backend initialization. The env var
# alone is not enough: jax was already imported (with JAX_PLATFORMS=axon)
# by sitecustomize, so update the live config and drop the axon factory.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # pragma: no cover - only present on axon-tunnel machines
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
