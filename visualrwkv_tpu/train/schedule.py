"""LR / weight-decay schedules.

Cosine decay with linear warmup, matching the reference callback
(VisualRWKV-v7/v7.00/src/trainer.py:19-53):

- ``progress = clip((step - warmup + 1) / (total - warmup), 0, 1)``
- ``lr = lr_final + (lr_init - lr_final) * 0.5 * (1 + cos(pi * progress))``
- warmup: ``lr *= 0.1 + 0.9 * step / warmup``
- wd: log-space interpolation toward ``weight_decay_final``

Deviation (documented): the reference pokes the LR only into param groups with
``weight_decay == 0`` (trainer.py:45-49), leaving the decayed group at a fixed
lr_init; we apply the schedule to all groups.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warmup_lr(
    step,
    lr_init: float,
    lr_final: float,
    warmup_steps: int,
    total_steps: int,
):
    step = jnp.asarray(step, jnp.float32)
    w = max(warmup_steps, 0)
    if lr_final == lr_init or total_steps <= 0:
        lr = jnp.full_like(step, lr_init)
    else:
        denom = max(total_steps - w, 1)
        progress = jnp.clip((step - w + 1) / denom, 0.0, 1.0)
        cosine = jnp.maximum(0.0, 0.5 * (1 + jnp.cos(math.pi * progress)))
        lr = lr_final + (lr_init - lr_final) * cosine
    if w > 0:
        lr = jnp.where(step < w, lr * (0.1 + 0.9 * step / w), lr)
    return lr


def wd_schedule(
    step,
    weight_decay: float,
    weight_decay_final: float,
    warmup_steps: int,
    total_steps: int,
):
    if weight_decay_final <= 0 or weight_decay <= 0:
        return jnp.asarray(weight_decay, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    denom = max(total_steps - max(warmup_steps, 0), 1)
    progress = jnp.clip((step - warmup_steps + 1) / denom, 0.0, 1.0)
    return weight_decay * jnp.exp(
        math.log(weight_decay_final / weight_decay) * progress
    )
