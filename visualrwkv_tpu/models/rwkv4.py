"""RWKV-4 ("x040") language model — pure-functional JAX.

The legacy VisualRWKV-v4 backbone: a FROZEN RWKV-4 World RNN behind the
BLIP2-style adapter (reference VisualRWKV-v4/visualrwkv/components/
rwkv_rnn.py::att_seq/ffn_seq serving math; VisualRWKV-v4/visualrwkv/
model.py:11-142 pairs it with the adapter).  Static token-shift mixes like
v5, a per-CHANNEL (headless) recurrence with log-domain max-tracked
aa/bb/pp state (ops.wkv4), sigmoid receptance, and the squared-ReLU
receptance-gated ChannelMix.

Checkpoint-canonical tree: ``blocks.N.att.{time_decay,time_first,
time_mix_k/v/r,key/value/receptance/output}``, ``blocks.N.ffn.{time_mix_k/r,
key/receptance/value}``, ``blocks.0.ln0`` applied in-forward (the reference
serving code folds ln0 into emb at load time, rwkv_rnn.py:199 — we keep the
checkpoint layout and apply it explicitly, same math).

``time_decay`` is stored RAW (the checkpoint value); the forward applies the
reference's load-time transform ``w = -exp(time_decay)`` (rwkv_rnn.py:230).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models.rwkv5 import _static_mixes
from visualrwkv_tpu.models.rwkv7 import (
    LayerState,
    STOP_TOKEN_INDEX,
    _ln_init,
    _ortho,
    _token_shift,
    _uniform,
    embed,
    layer_norm,
    linear,
)
from visualrwkv_tpu.ops.wkv4 import wkv4, wkv4_init_state, wkv4_step

Array = jax.Array
Params = Dict[str, Any]


def init_tmix_x040(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    """RWKV-4 init formulas (RWKV-LM v4 heritage: per-channel fancy decay,
    zigzag time_first around log(0.3), positional time-mix powers)."""
    C, A = cfg.n_embd, cfg.dim_att
    ratio_0_to_1 = layer_id / max(1, cfg.n_layer - 1)
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    ks = jax.random.split(key, 4)

    decay_speed = jnp.array(
        [-5 + 8 * (h / max(1, A - 1)) ** (0.7 + 1.3 * ratio_0_to_1) for h in range(A)],
        jnp.float32,
    )
    zigzag = jnp.array([0.5 * ((i + 1) % 3 - 1) for i in range(A)], jnp.float32)
    time_first = jnp.full((A,), float(jnp.log(0.3))) + zigzag

    return {
        "time_decay": decay_speed,
        "time_first": time_first,
        "time_mix_k": ddd**ratio_1_to_almost0,
        "time_mix_v": ddd**ratio_1_to_almost0 + 0.3 * ratio_0_to_1,
        "time_mix_r": ddd ** (0.5 * ratio_1_to_almost0),
        "receptance": {"weight": _uniform(ks[0], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "key": {"weight": _uniform(ks[1], (C, A), -0.05 / C**0.5, 0.05 / C**0.5)},
        "value": {"weight": _uniform(ks[2], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "output": {"weight": jnp.zeros((A, C), jnp.float32)},
    }


def init_cmix_x040(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C = cfg.n_embd
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    k1, k2 = jax.random.split(key)
    return {
        "time_mix_k": ddd**ratio_1_to_almost0,
        "time_mix_r": ddd**ratio_1_to_almost0,
        "key": {"weight": _uniform(k1, (C, cfg.dim_ffn), -0.5 / C**0.5, 0.5 / C**0.5)},
        "receptance": {"weight": _uniform(k2, (C, C), -0.5 / C**0.5, 0.5 / C**0.5)},
        "value": {"weight": jnp.zeros((cfg.dim_ffn, C), jnp.float32)},
    }


def init_rwkv4_params(key: Array, cfg: RWKVConfig, dtype=None) -> Params:
    C = cfg.n_embd
    keys = jax.random.split(key, cfg.n_layer * 2 + 2)
    blocks: List[Params] = []
    for i in range(cfg.n_layer):
        blk = {
            "ln1": _ln_init(C),
            "ln2": _ln_init(C),
            "att": init_tmix_x040(keys[2 * i], cfg, i),
            "ffn": init_cmix_x040(keys[2 * i + 1], cfg, i),
        }
        if i == 0:
            blk["ln0"] = _ln_init(C)
        blocks.append(blk)
    emb = _uniform(keys[-2], (cfg.vocab_size, C), -1e-4, 1e-4)
    if C * cfg.vocab_size <= 16 * 2**20:
        head = _ortho(keys[-1], (C, cfg.vocab_size), 0.5)
    else:
        head = jax.random.normal(keys[-1], (C, cfg.vocab_size), jnp.float32) * (
            0.5 * C**-0.5
        )
    params = {"emb": {"weight": emb}, "blocks": blocks, "ln_out": _ln_init(C),
              "head": {"weight": head}}
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params


def init_state_x040(cfg: RWKVConfig, batch: int) -> List[LayerState]:
    # token-shift carries are n_embd-wide (they hold the block INPUT), but the
    # aa/bb/pp recurrence runs over the dim_att k/v channels
    zero = jnp.zeros((batch, cfg.n_embd), jnp.float32)
    return [
        LayerState(zero, wkv4_init_state(batch, cfg.dim_att), zero)
        for _ in range(cfg.n_layer)
    ]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def tmix_x040(
    p: Params,
    cfg: RWKVConfig,
    x: Array,
    shift_state: Optional[Array] = None,
    wkv_state: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    prev = _token_shift(xf, shift_state)
    xk, xv, xr = _static_mixes(p, xf, prev, dt, ("k", "v", "r"))

    r = jax.nn.sigmoid(linear(p["receptance"], xr, dt).astype(jnp.float32))
    k = linear(p["key"], xk, dt).astype(jnp.float32)
    v = linear(p["value"], xv, dt).astype(jnp.float32)

    w = -jnp.exp(p["time_decay"].astype(jnp.float32))
    y, new_wkv = wkv4(w, p["time_first"], k, v, initial_state=wkv_state)
    out = linear(p["output"], (r * y).astype(dt), dt)
    return out, xf[:, -1], new_wkv


def cmix_x040(
    p: Params, cfg: RWKVConfig, x: Array, shift_state: Optional[Array] = None
) -> Tuple[Array, Array]:
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    prev = _token_shift(xf, shift_state)
    xk, xr = _static_mixes(p, xf, prev, dt, ("k", "r"))
    k = jnp.square(jax.nn.relu(linear(p["key"], xk, dt)))
    kv = linear(p["value"], k.astype(dt), dt)
    out = jax.nn.sigmoid(linear(p["receptance"], xr, dt)) * kv
    return out, xf[:, -1]


def block_x040(
    p: Params,
    cfg: RWKVConfig,
    layer_id: int,
    x: Array,
    state: Optional[LayerState] = None,
) -> Tuple[Array, LayerState]:
    if layer_id == 0:
        x = layer_norm(p["ln0"], x)
    att_shift = state.att_shift if state is not None else None
    wkv_state = state.wkv if state is not None else None
    ffn_shift = state.ffn_shift if state is not None else None

    xx, new_att_shift, new_wkv = tmix_x040(
        p["att"], cfg, layer_norm(p["ln1"], x), att_shift, wkv_state
    )
    x = x + xx
    ff, new_ffn_shift = cmix_x040(p["ffn"], cfg, layer_norm(p["ln2"], x), ffn_shift)
    x = x + ff
    return x, LayerState(new_att_shift, new_wkv, new_ffn_shift)


def rwkv4_forward(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    states: Optional[List[LayerState]] = None,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Tuple[Array, List[LayerState]]:
    """Full forward over embeddings ``x`` [B, T, C].  The per-channel scan
    has no chunk-length constraint (any T); the RNN is typically FROZEN (the
    reference only ever trains the v4 adapter, never this backbone)."""
    new_states: List[LayerState] = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i] if states is not None else None
        if grad_cp:
            fn = jax.checkpoint(lambda p, xx, ss, i=i: block_x040(p, cfg, i, xx, ss))
            x, ns = fn(blk, x, st)
        else:
            x, ns = block_x040(blk, cfg, i, x, st)
        new_states.append(ns)

    x = layer_norm(params["ln_out"], x)
    if return_hidden:
        return x, new_states
    logits = linear(params["head"], x, jnp.dtype(cfg.compute_dtype))
    return logits, new_states


def rwkv4_forward_tokens(params, cfg, tokens, states=None, grad_cp=False):
    return rwkv4_forward(params, cfg, embed(params, tokens), states, grad_cp)


def rwkv4_decode_step(
    params: Params, cfg: RWKVConfig, token: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    return rwkv4_decode_step_embed(params, cfg, embed(params, token), states)


def rwkv4_decode_step_embed(
    params: Params, cfg: RWKVConfig, x_emb: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    """One autoregressive T=1 step with the stateful aa/bb/pp step."""
    x = x_emb[:, None, :]
    dt = jnp.dtype(cfg.compute_dtype)
    new_states: List[LayerState] = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i]
        if i == 0:
            x = layer_norm(blk["ln0"], x)
        xin = layer_norm(blk["ln1"], x)

        p = blk["att"]
        xf = xin.astype(jnp.float32)
        prev = st.att_shift[:, None, :]
        xk, xv, xr = _static_mixes(p, xf, prev, dt, ("k", "v", "r"))
        r = jax.nn.sigmoid(linear(p["receptance"], xr, dt).astype(jnp.float32))
        k = linear(p["key"], xk, dt).astype(jnp.float32)
        v = linear(p["value"], xv, dt).astype(jnp.float32)
        w = -jnp.exp(p["time_decay"].astype(jnp.float32))
        new_wkv, y = wkv4_step(st.wkv, w, p["time_first"], k[:, 0], v[:, 0])
        att_out = linear(p["output"], (r * y[:, None]).astype(dt), dt)
        x = x + att_out
        ff, new_ffn_shift = cmix_x040(blk["ffn"], cfg, layer_norm(blk["ln2"], x), st.ffn_shift)
        x = x + ff
        new_states.append(LayerState(xf[:, -1], new_wkv, new_ffn_shift))
    x = layer_norm(params["ln_out"], x)
    logits = linear(params["head"], x, dt)[:, 0]
    return logits, new_states
