"""Small pytree utilities."""

from __future__ import annotations

import jax
import numpy as np


def tree_size(tree) -> int:
    """Total number of array elements in a pytree."""
    return sum(np.prod(x.shape, dtype=np.int64) for x in jax.tree_util.tree_leaves(tree))


def tree_bytes(tree) -> int:
    """Total bytes of a pytree's leaves."""
    return sum(
        int(np.prod(x.shape, dtype=np.int64)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
    )
