"""RWKV-6 ("x060") language model — pure-functional JAX.

The published-paper VisualRWKV backbone (reference VisualRWKV-v6/v6.0/
src/model.py:92-226): 5-way data-dependent token shift via a shared LoRA,
data-dependent decay LoRA, per-head bonus ``time_faaaa``, SiLU gate, and a
receptance-gated ChannelMix.  Parameter names mirror the reference checkpoint
keys; linear weights are stored ``[in, out]``.

Supports an optional recurrent state per layer (token-shift carries + WKV
matrix state) for O(1) decode, state tuning, and image-as-state training
(the v6.xx ``fused_recurrent_rwkv6(initial_state=...)`` path).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models.rwkv7 import (
    LayerState,
    STOP_TOKEN_INDEX,
    _token_shift,
    embed,
    init_state,
    layer_norm,
    group_norm,
    linear,
    _ln_init,
    _ortho,
    _uniform,
)
from visualrwkv_tpu.ops.wkv6 import wkv6, wkv6_step, wkv6_step_auto

Array = jax.Array
Params = Dict[str, Any]


def _d_mix_lora(cfg: RWKVConfig) -> int:
    return 64 if cfg.n_embd >= 4096 else 32


def _d_decay_lora(cfg: RWKVConfig) -> int:
    return 128 if cfg.n_embd >= 4096 else 64


def init_tmix_x060(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C, H, N = cfg.n_embd, cfg.n_head, cfg.head_size
    A = cfg.dim_att
    ratio_0_to_1 = layer_id / max(1, cfg.n_layer - 1)
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    ks = jax.random.split(key, 8)

    decay_speed = jnp.array(
        [-6 + 5 * (n / max(1, A - 1)) ** (0.7 + 1.3 * ratio_0_to_1) for n in range(A)],
        jnp.float32,
    )
    zigzag = jnp.array([((n + 1) % 3 - 1) * 0.1 for n in range(A)], jnp.float32)
    faaaa = ratio_0_to_1 * (1 - jnp.arange(A) / max(1, A - 1)) + zigzag

    dm, dd = _d_mix_lora(cfg), _d_decay_lora(cfg)
    return {
        "time_maa_x": 1.0 - ddd**ratio_1_to_almost0,
        "time_maa_w": 1.0 - ddd**ratio_1_to_almost0,
        "time_maa_k": 1.0 - ddd**ratio_1_to_almost0,
        "time_maa_v": 1.0 - (ddd**ratio_1_to_almost0 + 0.3 * ratio_0_to_1),
        "time_maa_r": 1.0 - ddd ** (0.5 * ratio_1_to_almost0),
        "time_maa_g": 1.0 - ddd ** (0.5 * ratio_1_to_almost0),
        "time_maa_w1": jnp.zeros((C, dm * 5), jnp.float32),
        "time_maa_w2": _uniform(ks[0], (5, dm, C), -0.01, 0.01),
        "time_decay": decay_speed,
        "time_decay_w1": jnp.zeros((C, dd), jnp.float32),
        "time_decay_w2": _uniform(ks[1], (dd, A), -0.01, 0.01),
        "time_faaaa": faaaa.reshape(H, N),
        "receptance": {"weight": _uniform(ks[2], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "key": {"weight": _uniform(ks[3], (C, A), -0.05 / C**0.5, 0.05 / C**0.5)},
        "value": {"weight": _uniform(ks[4], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "gate": {"weight": _uniform(ks[5], (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "output": {"weight": jnp.zeros((A, C), jnp.float32)},
        "ln_x": {"weight": jnp.ones((A,), jnp.float32), "bias": jnp.zeros((A,), jnp.float32)},
    }


def init_cmix_x060(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C = cfg.n_embd
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    k1, k2 = jax.random.split(key)
    return {
        "time_maa_k": 1.0 - ddd**ratio_1_to_almost0,
        "time_maa_r": 1.0 - ddd**ratio_1_to_almost0,
        "key": {"weight": _uniform(k1, (C, cfg.dim_ffn), -0.5 / C**0.5, 0.5 / C**0.5)},
        "receptance": {"weight": _uniform(k2, (C, C), -0.5 / C**0.5, 0.5 / C**0.5)},
        "value": {"weight": jnp.zeros((cfg.dim_ffn, C), jnp.float32)},
    }


def init_rwkv6_params(key: Array, cfg: RWKVConfig, dtype=None) -> Params:
    """dtype: optional storage dtype for all leaves (e.g. bf16 for serving
    7B-scale models whose fp32 init would not fit in HBM)."""
    C = cfg.n_embd
    keys = jax.random.split(key, cfg.n_layer * 2 + 2)
    blocks: List[Params] = []
    for i in range(cfg.n_layer):
        blk = {
            "ln1": _ln_init(C),
            "ln2": _ln_init(C),
            "att": init_tmix_x060(keys[2 * i], cfg, i),
            "ffn": init_cmix_x060(keys[2 * i + 1], cfg, i),
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


def tmix_x060(
    p: Params,
    cfg: RWKVConfig,
    x: Array,
    shift_state: Optional[Array] = None,
    wkv_state: Optional[Array] = None,
    wkv_fn=None,
) -> Tuple[Array, Array, Array]:
    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    xx = _token_shift(xf, shift_state) - xf

    xxx = (xf + xx * p["time_maa_x"]).astype(dt)
    mixed = jnp.tanh(
        jnp.matmul(xxx, p["time_maa_w1"].astype(dt), preferred_element_type=jnp.float32)
    )  # [B, T, 5*D]
    D = mixed.shape[-1] // 5
    mixed = mixed.reshape(B, T, 5, D)
    # per-branch LoRA: [B,T,5,D] x [5,D,C] -> [B,T,5,C]
    m = jnp.einsum("btsd,sdc->btsc", mixed.astype(dt), p["time_maa_w2"].astype(dt),
                   preferred_element_type=jnp.float32)
    mw, mk, mv, mr, mg = (m[:, :, i] for i in range(5))

    xw = (xf + xx * (p["time_maa_w"] + mw)).astype(dt)
    xk = (xf + xx * (p["time_maa_k"] + mk)).astype(dt)
    xv = (xf + xx * (p["time_maa_v"] + mv)).astype(dt)
    xr = (xf + xx * (p["time_maa_r"] + mr)).astype(dt)
    xg = (xf + xx * (p["time_maa_g"] + mg)).astype(dt)

    r = linear(p["receptance"], xr, dt)
    k = linear(p["key"], xk, dt)
    v = linear(p["value"], xv, dt)
    g = jax.nn.silu(linear(p["gate"], xg, dt))
    ww = jnp.matmul(
        jnp.tanh(jnp.matmul(xw, p["time_decay_w1"].astype(dt), preferred_element_type=jnp.float32)).astype(dt),
        p["time_decay_w2"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    w_raw = p["time_decay"] + ww

    shp = (B, T, H, N)
    y, new_wkv = (wkv_fn or wkv6)(
        r.astype(dt).reshape(shp),
        w_raw.astype(dt).reshape(shp),
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


def cmix_x060(
    p: Params, cfg: RWKVConfig, x: Array, shift_state: Optional[Array] = None
) -> Tuple[Array, Array]:
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    xx = _token_shift(xf, shift_state) - xf
    xk = (xf + xx * p["time_maa_k"]).astype(dt)
    xr = (xf + xx * p["time_maa_r"]).astype(dt)
    k = jnp.square(jax.nn.relu(linear(p["key"], xk, dt)))
    kv = linear(p["value"], k.astype(dt), dt)
    out = jax.nn.sigmoid(linear(p["receptance"], xr, dt)) * kv
    return out, xf[:, -1]


def block_x060(
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

    xx, new_att_shift, new_wkv = tmix_x060(
        p["att"], cfg, layer_norm(p["ln1"], x), att_shift, wkv_state
    )
    x = x + xx
    ff, new_ffn_shift = cmix_x060(p["ffn"], cfg, layer_norm(p["ln2"], x), ffn_shift)
    x = x + ff
    return x, LayerState(new_att_shift, new_wkv, new_ffn_shift)


def rwkv6_forward(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    states: Optional[List[LayerState]] = None,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Tuple[Array, List[LayerState]]:
    """Full forward over input embeddings ``x`` [B, T, C] (EOS left-padding to
    chunk multiples when stateless, like the v7 path)."""
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
            fn = jax.checkpoint(lambda p, xx, ss, i=i: block_x060(p, cfg, i, xx, ss))
            x, ns = fn(blk, x, st)
        else:
            x, ns = block_x060(blk, cfg, i, x, st)
        new_states.append(ns)

    x = layer_norm(params["ln_out"], x)
    if pad:
        x = x[:, pad:]
    if return_hidden:
        return x, new_states
    logits = linear(params["head"], x, jnp.dtype(cfg.compute_dtype))
    return logits, new_states


def rwkv6_forward_tokens(params, cfg, tokens, states=None, grad_cp=False):
    return rwkv6_forward(params, cfg, embed(params, tokens), states, grad_cp)


def rwkv6_forward_seq(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    axis: str = "seq",
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Array:
    """Context-parallel forward: run INSIDE shard_map with the TOKEN axis
    sharded over ``axis`` (the x060 counterpart of
    ``models.rwkv7.rwkv7_forward_seq``; same halo/ring design, no v_first).

    The shard-boundary couplings are the 1-token shift (a halo exchange of
    each shard's last post-ln token) and the WKV recurrence (the ring-scan
    state composition of ops.wkv_sp, dispatched via ops.wkv7.wkv_seq_axis —
    WKV6's diagonal-decay transition uses the same identity-probe
    construction). ``x``: [B, T_local, C] with T_local % chunk_len == 0.
    Returns this shard's logits (or hidden).
    """
    from visualrwkv_tpu.ops.wkv7 import wkv_seq_axis

    B, T, C = x.shape
    if T % cfg.chunk_len:
        raise ValueError(
            f"seq-parallel shards must be chunk-aligned: T_local={T}, "
            f"chunk_len={cfg.chunk_len}"
        )
    D = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    def halo_last(t):
        recv = jax.lax.ppermute(
            t[:, -1], axis, [(s, (s + 1) % D) for s in range(D)]
        )
        return jnp.where(idx == 0, jnp.zeros_like(recv), recv)

    def body(p, xx, i):
        if i == 0:
            xx = layer_norm(p["ln0"], xx)
        xin = layer_norm(p["ln1"], xx)
        att_shift = halo_last(xin.astype(jnp.float32))
        yy, _, _ = tmix_x060(p["att"], cfg, xin, att_shift, None)
        xx = xx + yy
        xin2 = layer_norm(p["ln2"], xx)
        ffn_shift = halo_last(xin2.astype(jnp.float32))
        ff, _ = cmix_x060(p["ffn"], cfg, xin2, ffn_shift)
        return xx + ff

    with wkv_seq_axis(axis):
        for i, blk in enumerate(params["blocks"]):
            if grad_cp:
                x = jax.checkpoint(lambda p, xx, i=i: body(p, xx, i))(blk, x)
            else:
                x = body(blk, x, i)

    x = layer_norm(params["ln_out"], x)
    if return_hidden:
        return x
    return linear(params["head"], x, jnp.dtype(cfg.compute_dtype))


def rwkv6_decode_step(
    params: Params, cfg: RWKVConfig, token: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    return rwkv6_decode_step_embed(params, cfg, embed(params, token), states)


def rwkv6_decode_step_embed(
    params: Params, cfg: RWKVConfig, x_emb: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    """One autoregressive step (T=1) reusing the sequence-mode math, with the
    T=1 WKV step kernel swapped in via a one-token sequence."""
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
        xx = st.att_shift[:, None, :] - xf
        xxx = (xf + xx * p["time_maa_x"]).astype(dt)
        mixed = jnp.tanh(jnp.matmul(xxx, p["time_maa_w1"].astype(dt), preferred_element_type=jnp.float32))
        D = mixed.shape[-1] // 5
        mixed = mixed.reshape(B, 1, 5, D)
        m = jnp.einsum("btsd,sdc->btsc", mixed.astype(dt), p["time_maa_w2"].astype(dt),
                       preferred_element_type=jnp.float32)
        mw, mk, mv, mr, mg = (m[:, :, j] for j in range(5))
        xw = (xf + xx * (p["time_maa_w"] + mw)).astype(dt)
        xk = (xf + xx * (p["time_maa_k"] + mk)).astype(dt)
        xv = (xf + xx * (p["time_maa_v"] + mv)).astype(dt)
        xr = (xf + xx * (p["time_maa_r"] + mr)).astype(dt)
        xg = (xf + xx * (p["time_maa_g"] + mg)).astype(dt)
        r = linear(p["receptance"], xr, dt)
        k = linear(p["key"], xk, dt)
        v = linear(p["value"], xv, dt)
        g = jax.nn.silu(linear(p["gate"], xg, dt))
        ww = jnp.matmul(
            jnp.tanh(jnp.matmul(xw, p["time_decay_w1"].astype(dt), preferred_element_type=jnp.float32)).astype(dt),
            p["time_decay_w2"].astype(dt), preferred_element_type=jnp.float32,
        )
        w_raw = p["time_decay"] + ww

        shp = (B, H, N)
        new_wkv, y = wkv6_step_auto(
            st.wkv, r.reshape(shp), w_raw.reshape(shp), k.reshape(shp),
            v.reshape(shp), p["time_faaaa"],
        )
        eps = 1e-5 * cfg.head_size_divisor**2
        y = group_norm(p["ln_x"], y.reshape(B, 1, -1).astype(dt), H, eps)
        att_out = linear(
            p["output"], (y.astype(jnp.float32) * g.astype(jnp.float32)).astype(dt), dt
        )
        x = x + att_out
        ff, new_ffn_shift = cmix_x060(blk["ffn"], cfg, layer_norm(blk["ln2"], x), st.ffn_shift)
        x = x + ff
        # preserve carry dtype (bf16 serving states, see rwkv7 decode step)
        new_states.append(
            LayerState(xf[:, -1], new_wkv.astype(st.wkv.dtype), new_ffn_shift)
        )
    x = layer_norm(params["ln_out"], x)
    logits = linear(params["head"], x, dt)[:, 0]
    return logits, new_states
