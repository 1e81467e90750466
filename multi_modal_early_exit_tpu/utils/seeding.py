"""Reproducibility helpers (reference: EE/configs.py:209-216).

JAX is functionally deterministic given a PRNG key, so unlike the torch
reference there is no global framework RNG to seed; we seed python/numpy for
host-side code and hand out a root ``jax.random.key``.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
