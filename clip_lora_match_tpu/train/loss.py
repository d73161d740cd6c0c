"""Contrastive (InfoNCE) losses.

Single-device form matches the reference's ``compute_clip_contrastive_loss``
(ref:scripts/train_lora.py:83-108): L2-normalize both feature sets, logits =
(img @ txt.T) / temperature, symmetric cross-entropy against the diagonal.

Global-batch form: under a data-parallel mesh the negatives must span the
GLOBAL batch (SURVEY §2.4). Computed in "global view" under jit/GSPMD — the
partitioner inserts the feature all-gather over ICI automatically; labels are
the global diagonal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.models.clip import l2_normalize


def _xent_diagonal(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy with targets = arange(B) (the matched diagonal)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(logp))


def clip_contrastive_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Symmetric InfoNCE at fixed temperature (ref:train_lora.py:83-108)."""
    img = l2_normalize(image_features).astype(jnp.float32)
    txt = l2_normalize(text_features).astype(jnp.float32)
    logits = jnp.dot(img, txt.T, preferred_element_type=jnp.float32) / temperature
    return 0.5 * (_xent_diagonal(logits) + _xent_diagonal(logits.T))


def clip_contrastive_loss_learned_scale(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Variant with CLIP's learned logit_scale (exp-parameterized)."""
    img = l2_normalize(image_features).astype(jnp.float32)
    txt = l2_normalize(text_features).astype(jnp.float32)
    logits = jnp.exp(logit_scale) * jnp.dot(
        img, txt.T, preferred_element_type=jnp.float32
    )
    return 0.5 * (_xent_diagonal(logits) + _xent_diagonal(logits.T))
