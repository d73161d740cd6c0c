"""Optimizer-state placement for sharded LoRA training (TP / PP).

Sharding-propagation through ``jit(tx.init)`` does NOT place the moments:
they are zeros — compile-time constants with no data dependence on the
sharded params — so the partitioner is free to (and does) leave them
unsharded. ``optax.tree_map_params`` instead pairs every param-shaped leaf of
the optimizer state (adam mu/nu, MultiSteps accumulators, ...) with the
matching param leaf's PartitionSpec and ``device_put``s it explicitly;
non-param leaves (step counts) replicate.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

Params = dict[str, Any]


def init_sharded_train_state(
    sharded_lora: Params,
    tx,
    specs: Params,
    seed: int = 42,
    rng_impl: Optional[str] = None,
):
    """TrainState whose optimizer moments carry ``specs``' shardings.

    ``sharded_lora`` must already be placed (NamedSharding leaves); ``specs``
    is a PartitionSpec tree with the same structure.
    """
    import jax.numpy as jnp
    import optax

    from clip_lora_match_tpu.train.step import TrainState

    mesh = None
    for leaf in jax.tree_util.tree_leaves(sharded_lora):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding):
            mesh = sharding.mesh
            break
    if mesh is None:
        raise ValueError(
            "sharded_lora has no NamedSharding leaves — place it first"
        )

    opt_state = optax.tree_map_params(
        tx,
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        tx.init(sharded_lora),
        specs,
        transform_non_params=lambda x: jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P())
        ),
    )
    rng = (
        jax.random.key(seed, impl=rng_impl) if rng_impl else jax.random.PRNGKey(seed)
    )
    return TrainState(
        lora=sharded_lora,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
