"""Seeding helpers (capability parity: reference utils/seeds.py).

JAX is functional: randomness flows through explicit ``jax.random`` keys, so
"fixing the seed" mostly means choosing the root PRNG key. We also seed numpy
and python for host-side code (data shuffling, scanners).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def fix_seeds(seed: int = 0) -> jax.Array:
    """Seed numpy + python RNGs and return a root JAX PRNG key."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
