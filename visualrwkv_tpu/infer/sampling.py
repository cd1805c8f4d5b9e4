"""Token sampling: top-p with temperature + presence/frequency penalties.

Matches the reference serving pipeline (rwkv PIPELINE.sample_logits semantics
and the penalty protocol of VisualRWKV-v7/v7.00/app/app_gpu.py:57-86):

- ``logits[n] -= presence * seen[n] + occurrence[n] * frequency``
- occurrence decays by 0.996 each step, +1 for the sampled token
- top-p on softmax probs (cutoff at the first cumulative > top_p), then
  ``probs ** (1/temperature)`` re-normalized.

Everything is batched and jit-friendly (dense [B, V] occurrence state).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class SamplingParams(NamedTuple):
    temperature: float = 1.0
    top_p: float = 1.0
    alpha_presence: float = 0.0
    alpha_frequency: float = 0.0
    occurrence_decay: float = 0.996


def apply_penalties(logits: Array, occurrence: Array, p: SamplingParams) -> Array:
    seen = (occurrence > 0).astype(logits.dtype)
    return logits - (p.alpha_presence * seen + occurrence * p.alpha_frequency)


def update_occurrence(occurrence: Array, token: Array, p: SamplingParams) -> Array:
    occurrence = occurrence * p.occurrence_decay
    one_hot = jax.nn.one_hot(token, occurrence.shape[-1], dtype=occurrence.dtype)
    return occurrence + one_hot


def sample_logits(key: Array, logits: Array, p: SamplingParams) -> Array:
    """[B, V] logits -> [B] sampled token ids."""
    logits = logits.astype(jnp.float32)
    if p.temperature == 0.0:  # greedy
        return jnp.argmax(logits, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # cutoff = prob of the first sorted entry whose cumulative exceeds top_p
    idx = jnp.argmax(cum > p.top_p, axis=-1)
    cutoff = jnp.take_along_axis(sorted_probs, idx[:, None], axis=-1)
    probs = jnp.where(probs < cutoff, 0.0, probs)
    if p.temperature != 1.0:
        probs = jnp.power(probs, 1.0 / p.temperature)
    logp = jnp.log(jnp.maximum(probs, 1e-38))
    logp = jnp.where(probs > 0, logp, -jnp.inf)
    return jax.random.categorical(key, logp, axis=-1)
