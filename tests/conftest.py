"""Test env: force an 8-device virtual CPU mesh before jax is imported.

Exercises all mesh/pjit/shard_map code paths without TPU hardware
(SURVEY.md §4). bench.py / __graft_entry__.py run outside pytest and use the
real TPU backend.
"""

import os
import sys

# The machine presets JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize
# that imports jax at interpreter start, so env vars are too late here —
# switch platforms via jax.config (works until first backend init).
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent XLA compile cache — works for the CPU backend too. The test
# host has ONE core and pays multi-second XLA compiles per program shape;
# with the cache, repeat runs skip them (measured 9.7s -> 2.9s on a tiny
# CLIP encode round trip). Shared with bench.py's TPU cache dir (keys
# include the platform). This is what makes the fast tier
# (`pytest -m "not slow"`) fast in CI-style repeated verification.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
