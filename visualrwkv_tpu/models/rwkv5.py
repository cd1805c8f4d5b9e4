"""RWKV-5.2 ("x052") language model — pure-functional JAX.

The legacy VisualRWKV-v5 backbone (reference VisualRWKV-v5/v5.2/src/
model.py:94-207 training code; serving math app/modeling_rwkv.py::
att_seq_v5_2): STATIC token-shift mixes (``xk = x*mix + shift(x)*(1-mix)``),
static per-(head, channel) decay ``exp(-exp(time_decay))``, per-head bonus
``time_faaaa``, SiLU gate, GroupNorm over heads, and the same
receptance-gated ChannelMix as v6 under ``time_mix_*`` names.

The recurrence is the WKV6 diagonal-decay recurrence with the decay held
constant over time, so the fused WKV6 Pallas kernel serves it by
broadcasting ``time_decay`` across T (the reference compiles a separate
wkv5 CUDA kernel, v5.2/cuda/wkv5_cuda.cu — one kernel family covers both
here).

GroupNorm note: the v5 training code computes ``ln_x(x / head_size_divisor)``
with default eps 1e-5; that is algebraically identical to GroupNorm(x) with
eps ``1e-5 * divisor**2`` (the form the serving engine uses, eps=64e-5), so
this module uses the shared group_norm with the scaled eps and no division.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models.rwkv7 import (
    LayerState,
    STOP_TOKEN_INDEX,
    _ln_init,
    _ortho,
    _token_shift,
    _uniform,
    embed,
    group_norm,
    layer_norm,
    linear,
)
from visualrwkv_tpu.ops.wkv6 import wkv6, wkv6_step_auto

Array = jax.Array
Params = Dict[str, Any]


def init_tmix_x052(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C, H, N = cfg.n_embd, cfg.n_head, cfg.head_size
    A = cfg.dim_att
    ratio_0_to_1 = layer_id / max(1, cfg.n_layer - 1)
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    ks = jax.random.split(key, 5)

    decay_speed = jnp.array(
        [-6 + 5 * (n / max(1, A - 1)) ** (0.7 + 1.3 * ratio_0_to_1) for n in range(A)],
        jnp.float32,
    )
    zigzag = jnp.array([((n + 1) % 3 - 1) * 0.1 for n in range(A)], jnp.float32)
    faaaa = ratio_0_to_1 * (1 - jnp.arange(A) / max(1, A - 1)) + zigzag

    return {
        "time_mix_k": ddd**ratio_1_to_almost0,
        "time_mix_v": ddd**ratio_1_to_almost0 + 0.3 * ratio_0_to_1,
        "time_mix_r": ddd ** (0.5 * ratio_1_to_almost0),
        "time_mix_g": ddd ** (0.5 * ratio_1_to_almost0),
        "time_decay": decay_speed.reshape(H, N),
        "time_faaaa": faaaa.reshape(H, N),
        "receptance": {"weight": _uniform(ks[0], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "key": {"weight": _uniform(ks[1], (C, A), -0.05 / C**0.5, 0.05 / C**0.5)},
        "value": {"weight": _uniform(ks[2], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "gate": {"weight": _uniform(ks[3], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "output": {"weight": jnp.zeros((A, C), jnp.float32)},
        "ln_x": {"weight": jnp.ones((A,), jnp.float32),
                 "bias": jnp.zeros((A,), jnp.float32)},
    }


def init_cmix_x052(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
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


def init_rwkv5_params(key: Array, cfg: RWKVConfig, dtype=None) -> Params:
    C = cfg.n_embd
    keys = jax.random.split(key, cfg.n_layer * 2 + 2)
    blocks: List[Params] = []
    for i in range(cfg.n_layer):
        blk = {
            "ln1": _ln_init(C),
            "ln2": _ln_init(C),
            "att": init_tmix_x052(keys[2 * i], cfg, i),
            "ffn": init_cmix_x052(keys[2 * i + 1], cfg, i),
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


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _static_mixes(p: Params, xf: Array, prev: Array, dt, names) -> List[Array]:
    """v5 static token-shift: x*mix + prev*(1-mix) per branch."""
    return [
        (xf * p[f"time_mix_{n}"] + prev * (1.0 - p[f"time_mix_{n}"])).astype(dt)
        for n in names
    ]


def tmix_x052(
    p: Params,
    cfg: RWKVConfig,
    x: Array,
    shift_state: Optional[Array] = None,
    wkv_state: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    prev = _token_shift(xf, shift_state)
    xk, xv, xr, xg = _static_mixes(p, xf, prev, dt, ("k", "v", "r", "g"))

    r = linear(p["receptance"], xr, dt)
    k = linear(p["key"], xk, dt)
    v = linear(p["value"], xv, dt)
    g = jax.nn.silu(linear(p["gate"], xg, dt))

    shp = (B, T, H, N)
    # static decay broadcast over time: the WKV6 recurrence with constant w
    w_raw = jnp.broadcast_to(
        p["time_decay"].astype(dt).reshape(1, 1, H, N), shp
    )
    y, new_wkv = wkv6(
        r.astype(dt).reshape(shp),
        w_raw,
        k.astype(dt).reshape(shp),
        v.astype(dt).reshape(shp),
        p["time_faaaa"],
        initial_state=wkv_state,
        chunk=cfg.chunk_len,
    )
    y = y.reshape(B, T, cfg.dim_att)
    eps = 1e-5 * cfg.head_size_divisor**2
    y = group_norm(p["ln_x"], y.astype(dt), H, eps)
    out = linear(p["output"], (y.astype(jnp.float32) * g.astype(jnp.float32)).astype(dt), dt)
    return out, xf[:, -1], new_wkv


def cmix_x052(
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


def block_x052(
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

    xx, new_att_shift, new_wkv = tmix_x052(
        p["att"], cfg, layer_norm(p["ln1"], x), att_shift, wkv_state
    )
    x = x + xx
    ff, new_ffn_shift = cmix_x052(p["ffn"], cfg, layer_norm(p["ln2"], x), ffn_shift)
    x = x + ff
    return x, LayerState(new_att_shift, new_wkv, new_ffn_shift)


def rwkv5_forward(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    states: Optional[List[LayerState]] = None,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Tuple[Array, List[LayerState]]:
    B, T, C = x.shape
    pad = (-T) % cfg.chunk_len
    if pad:
        if states is not None:
            raise ValueError("stateful forward requires T % chunk_len == 0")
        eos = embed(params, jnp.full((B, pad), STOP_TOKEN_INDEX, jnp.int32))
        x = jnp.concatenate([eos.astype(x.dtype), x], axis=1)

    new_states: List[LayerState] = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i] if states is not None else None
        if grad_cp:
            fn = jax.checkpoint(lambda p, xx, ss, i=i: block_x052(p, cfg, i, xx, ss))
            x, ns = fn(blk, x, st)
        else:
            x, ns = block_x052(blk, cfg, i, x, st)
        new_states.append(ns)

    x = layer_norm(params["ln_out"], x)
    if pad:
        x = x[:, pad:]
    if return_hidden:
        return x, new_states
    logits = linear(params["head"], x, jnp.dtype(cfg.compute_dtype))
    return logits, new_states


def rwkv5_forward_tokens(params, cfg, tokens, states=None, grad_cp=False):
    return rwkv5_forward(params, cfg, embed(params, tokens), states, grad_cp)


def rwkv5_decode_step(
    params: Params, cfg: RWKVConfig, token: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    return rwkv5_decode_step_embed(params, cfg, embed(params, token), states)


def rwkv5_decode_step_embed(
    params: Params, cfg: RWKVConfig, x_emb: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    """One autoregressive T=1 step with the stateful WKV step kernel."""
    x = x_emb[:, None, :]
    B = x.shape[0]
    H, N = cfg.n_head, cfg.head_size
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
        xk, xv, xr, xg = _static_mixes(p, xf, prev, dt, ("k", "v", "r", "g"))
        r = linear(p["receptance"], xr, dt)
        k = linear(p["key"], xk, dt)
        v = linear(p["value"], xv, dt)
        g = jax.nn.silu(linear(p["gate"], xg, dt))

        shp = (B, H, N)
        w_raw = jnp.broadcast_to(p["time_decay"].astype(dt)[None], shp)
        new_wkv, y = wkv6_step_auto(
            st.wkv, r.reshape(shp), w_raw, k.reshape(shp), v.reshape(shp),
            p["time_faaaa"],
        )
        eps = 1e-5 * cfg.head_size_divisor**2
        y = group_norm(p["ln_x"], y.reshape(B, 1, -1).astype(dt), H, eps)
        att_out = linear(
            p["output"], (y.astype(jnp.float32) * g.astype(jnp.float32)).astype(dt), dt
        )
        x = x + att_out
        ff, new_ffn_shift = cmix_x052(blk["ffn"], cfg, layer_norm(blk["ln2"], x), st.ffn_shift)
        x = x + ff
        new_states.append(
            LayerState(xf[:, -1], new_wkv.astype(st.wkv.dtype), new_ffn_shift)
        )
    x = layer_norm(params["ln_out"], x)
    logits = linear(params["head"], x, dt)[:, 0]
    return logits, new_states
