"""Characterize device->host transfer cost through the axon tunnel.

Hypothesis from profile_dqn_ckpt.py: per-ARRAY fixed cost ~1.7 s
regardless of size, so fetching 71 leaves costs ~2 min while one packed
array of the same bytes is cheap.
"""

import os
import time

# env-var jax config is frozen before user code on this box
# (sitecustomize pre-imports jax); use the working form:
import sys; sys.path.insert(0, ".")
from rlenv_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()