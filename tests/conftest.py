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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
