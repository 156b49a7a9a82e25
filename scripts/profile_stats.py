"""Isolate the per-step cost of EpisodeStats.update on hardware.

A2C rollout steps and DQN collect steps both cost ~1.7 ms at 512 envs
while the bare curriculum env scan costs 0.13 ms; the shared extras are
the policy forward and the episode-stats ring scatters. Times each.
"""

import os
import time

# env-var jax config is frozen before user code on this box
# (sitecustomize pre-imports jax); use the working form:
import sys; sys.path.insert(0, ".")
from rlenv_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()