"""WKV4 — the legacy RWKV-4 per-channel recurrence (TPU-native).

The RWKV-4 attention state is three [C] vectors per layer: a numerator
``aa``, a denominator ``bb``, and a log-domain max-tracker ``pp`` (the
reference computes it token-by-token in torch/CUDA: VisualRWKV-v4/
visualrwkv/components/rwkv_rnn.py::att_seq (the ``for t in range(T)`` loop)
and app-style CUDA ``operators.cu`` aa/bb/pp kernels).  Everything is
elementwise over channels, so the TPU form is ONE ``lax.scan`` over T of
vectorized [B, C] ops — no MXU involvement, fully fused by XLA, O(1) memory.

All math is fp32: the recurrence is a log-domain softmax-style accumulation
(exp/max), where bf16 would lose the max-tracking guarantees.

State convention: ``[B, C, 3]`` stacking (aa, bb, pp) on the trailing axis,
with ``pp`` initialized to -1e30 (the reference's init) so the first token
contributes with weight 1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_PP_INIT = -1e30


def wkv4_init_state(B: int, C: int) -> Array:
    """Zero (aa, bb) + -1e30 (pp) initial state, [B, C, 3] fp32."""
    aa = jnp.zeros((B, C), jnp.float32)
    return jnp.stack([aa, aa, jnp.full((B, C), _PP_INIT, jnp.float32)], axis=-1)


def _unstack(state: Array) -> Tuple[Array, Array, Array]:
    return state[..., 0], state[..., 1], state[..., 2]


def wkv4(
    w: Array,
    u: Array,
    k: Array,
    v: Array,
    initial_state: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Sequence form.

    w: [C] log-decay (= -exp(time_decay), <= 0); u: [C] first-token bonus;
    k, v: [B, T, C]; initial_state: [B, C, 3] or None.
    Returns (y [B, T, C] fp32, final_state [B, C, 3]).
    """
    B, T, C = k.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    state = wkv4_init_state(B, C) if initial_state is None else initial_state
    aa, bb, pp = _unstack(state.astype(jnp.float32))

    def step(carry, kv):
        aa, bb, pp = carry
        kt, vt = kv
        # output first (bonus u applies to the current token only)
        ww = uf + kt
        p = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - p)
        e2 = jnp.exp(ww - p)
        y = (e1 * aa + e2 * vt) / (e1 * bb + e2)
        # then decay-and-accumulate
        ww = wf + pp
        p = jnp.maximum(ww, kt)
        e1 = jnp.exp(ww - p)
        e2 = jnp.exp(kt - p)
        return (e1 * aa + e2 * vt, e1 * bb + e2, p), y

    (aa, bb, pp), ys = jax.lax.scan(
        step, (aa, bb, pp), (kf.swapaxes(0, 1), vf.swapaxes(0, 1))
    )
    y = ys.swapaxes(0, 1)
    return y, jnp.stack([aa, bb, pp], axis=-1)


def wkv4_step(
    state: Array, w: Array, u: Array, k: Array, v: Array
) -> Tuple[Array, Array]:
    """One autoregressive step: k, v [B, C]; state [B, C, 3].
    Returns (new_state, y [B, C])."""
    aa, bb, pp = _unstack(state.astype(jnp.float32))
    kt = k.astype(jnp.float32)
    vt = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    ww = uf + kt
    p = jnp.maximum(pp, ww)
    e1 = jnp.exp(pp - p)
    e2 = jnp.exp(ww - p)
    y = (e1 * aa + e2 * vt) / (e1 * bb + e2)
    ww = wf + pp
    p = jnp.maximum(ww, kt)
    e1 = jnp.exp(ww - p)
    e2 = jnp.exp(kt - p)
    new = jnp.stack([e1 * aa + e2 * vt, e1 * bb + e2, p], axis=-1)
    return new, y
