"""In-batch contrastive alignment (v7.01_with_contrastive_alignment).

Symmetric InfoNCE between per-sample text-EOS and image-EOS hidden features at
temperature 0.07, added to the LM loss (reference v7.01_with_contrastive_
alignment/src/model.py:414-452).  Features are gathered at given positions
(one text-EOS and one image-EOS position per sample) — a jit-friendly
take_along_axis instead of the reference's boolean-mask indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_positions(features: Array, positions: Array) -> Array:
    """features [B, T, C], positions [B] -> [B, C]."""
    return jnp.take_along_axis(
        features, positions[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]


def in_batch_contrastive_loss(
    text_feats: Array, image_feats: Array, temperature: float = 0.07
) -> Array:
    """Symmetric InfoNCE over the batch diagonal."""
    f32 = jnp.float32
    t = text_feats.astype(f32)
    v = image_feats.astype(f32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    t2v = (t @ v.T) / temperature
    v2t = (v @ t.T) / temperature
    labels = jnp.arange(t.shape[0])

    def ce(logits):
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return (logz - gold).mean()

    return (ce(t2v) + ce(v2t)) / 2


def contrastive_alignment_loss(
    hidden: Array,
    text_eos_positions: Array,
    image_eos_positions: Array,
    temperature: float = 0.07,
) -> Array:
    """hidden [B, T, C] (pre-head features), per-sample EOS positions [B]."""
    t = gather_positions(hidden, text_eos_positions)
    v = gather_positions(hidden, image_eos_positions)
    return in_batch_contrastive_loss(t, v, temperature)
