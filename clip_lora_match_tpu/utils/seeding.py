"""Deterministic seeding (ref:scripts/train_lora.py:22-26 seeds
random/np/torch; here the JAX equivalent is a PRNGKey, plus python/np for the
host-side pipeline)."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed python + numpy host RNGs and return the root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
