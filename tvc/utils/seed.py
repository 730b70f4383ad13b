"""Reproducibility utilities.

Covers reference src/utils/seed.py (set_random_seed :13, SeedContext :69)
and experiments/utils/seed.py. In JAX, determinism is by construction via
threefry keys — this module seeds the HOST-side stochastic dependencies
(python random, numpy; the reference also flips cudnn.deterministic, which
has no TPU analogue) and provides the key-derivation helpers the rest of
the framework uses instead of global seed state.
"""

from __future__ import annotations

import contextlib
import random
from typing import Iterator

import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (reference seed.py:13-42)."""
    random.seed(seed)
    np.random.seed(seed)


@contextlib.contextmanager
def SeedContext(seed: int) -> Iterator[None]:
    """Scoped host seeding; restores prior RNG state on exit
    (reference seed.py:69+)."""
    py_state = random.getstate()
    np_state = np.random.get_state()
    set_random_seed(seed)
    try:
        yield
    finally:
        random.setstate(py_state)
        np.random.set_state(np_state)


def derive_key(seed: int, *folds: int):
    """Root threefry key + fold_in chain — the device-side replacement for
    the reference's seed bookkeeping (e.g. sd_ref.py:485-511 fixed seed
    ranges map to fold_in(prompt_idx, image_idx))."""
    import jax

    key = jax.random.PRNGKey(seed)
    for f in folds:
        key = jax.random.fold_in(key, f)
    return key
