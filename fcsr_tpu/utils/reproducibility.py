"""Reproducibility helpers (ref: utils/reproducibility.py:6-23).

JAX is deterministic by construction given fixed PRNG keys and identical
compiled programs; what needs seeding is the HOST-side randomness the
pipelines use (numpy shuffles, python `random` pivot draws for the
betweenness evaluator). ``set_seed`` mirrors the reference's call site and
returns a root jax PRNG key derived from the same seed.
"""

from __future__ import annotations

import random

import numpy as np

__all__ = ["set_seed", "seed_everything"]


def set_seed(random_seed: int = 42):
    """Seed python/numpy global RNGs and return a jax root key."""
    import jax

    random.seed(random_seed)
    np.random.seed(random_seed)
    return jax.random.PRNGKey(random_seed)


# alias with the more common modern name
seed_everything = set_seed
