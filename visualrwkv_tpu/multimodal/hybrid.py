"""Hybrid RWKV <-> image-memory variants (v6.21 / v6.22 / v6.23).

- v6.21 memory-read hybrid Tmix: attention-free memory lookup over the
  per-layer image WKV state — out = wkv_out * relu(1-mg) + (mr @ S_img) * mg,
  with mr/mg produced by a 2-way data-dependent token-shift LoRA
  (reference v6.21/src/model.py:235-291).
- v6.22 cross-attention Tmix: softmax cross-attention (Q from the text stream's
  ddlerp'd receptance, K/V from image features) with a SiLU gate
  (v6.22/src/model.py:234+).
- v6.23 hybrid stack: standard RWKV blocks with CrossAttentionBlocks (softmax
  Q=text, K/V=image, zero-init output; ReLU MLP with zero-init proj)
  interleaved from the end at ``cross_layer_interval``
  (v6.23/src/model.py:232-367,500-519; utils.py:256-270).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.models.rwkv7 import (
    LayerState,
    _ln_init,
    _token_shift,
    _uniform,
    group_norm,
    layer_norm,
    linear,
)

Array = jax.Array
Params = Dict[str, Any]


def _d_mix_lora(cfg: RWKVConfig) -> int:
    return 64 if cfg.n_embd >= 4096 else 32


# ---------------------------------------------------------------------------
# v6.21: memory-read hybrid
# ---------------------------------------------------------------------------


def init_memory_read_params(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C, A = cfg.n_embd, cfg.dim_att
    dm = _d_mix_lora(cfg)
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mem_read": {"weight": _uniform(k1, (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "mem_gate": {"weight": _uniform(k2, (C, A), -1e-4, 1e-4)},
        "time_mem_w1": jnp.zeros((C, dm * 2), jnp.float32),
        "time_mem_w2": _uniform(k3, (2, dm, C), -0.01, 0.01),
        "time_mem_r": 1.0 - ddd ** (0.5 * ratio_1_to_almost0),
        "time_mem_g": 1.0 - ddd ** (0.5 * ratio_1_to_almost0),
    }


def memory_read_mix(
    p: Params,
    mem: Params,
    cfg: RWKVConfig,
    x: Array,
    wkv_out: Array,
    s_img: Array,
) -> Array:
    """Blend the Tmix WKV output with a lookup over the image state.

    x: block input [B,T,C] (pre-Tmix, ln1'd); wkv_out: [B,T,C] (the WKV output
    before ln_x); s_img: [B,H,N,N] per-layer image state. Returns [B,T,C].
    """
    B, T, C = x.shape
    H, N = cfg.n_head, cfg.head_size
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    xx = _token_shift(xf, None) - xf
    xxx = (xf + xx * p["time_maa_x"]).astype(dt)
    mixed = jnp.tanh(jnp.matmul(xxx, mem["time_mem_w1"].astype(dt), preferred_element_type=jnp.float32))
    D = mixed.shape[-1] // 2
    m = jnp.einsum("btsd,sdc->btsc", mixed.reshape(B, T, 2, D).astype(dt),
                   mem["time_mem_w2"].astype(dt), preferred_element_type=jnp.float32)
    er, eg = m[:, :, 0], m[:, :, 1]
    xr = (xf + xx * (mem["time_mem_r"] + er)).astype(dt)
    xg = (xf + xx * (mem["time_mem_g"] + eg)).astype(dt)
    mr = linear(mem["mem_read"], xr, dt).reshape(B, T, H, N)
    mg = jax.nn.relu(linear(mem["mem_gate"], xg, dt)).reshape(B, T, H, N)

    # [B,T,H,N] x [B,H,N,N] -> [B,T,H,N]
    read = jnp.einsum("bthn,bhnm->bthm", mr.astype(jnp.float32), s_img.astype(jnp.float32))
    out = wkv_out.astype(jnp.float32).reshape(B, T, H, N)
    mixed_out = out * jax.nn.relu(1.0 - mg.astype(jnp.float32)) + read * mg.astype(jnp.float32)
    return mixed_out.reshape(B, T, C).astype(wkv_out.dtype)


# ---------------------------------------------------------------------------
# v6.22 / v6.23: softmax cross-attention over image features
# ---------------------------------------------------------------------------


def init_cross_attention_params(key: Array, cfg: RWKVConfig) -> Params:
    C, A = cfg.n_embd, cfg.dim_att
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "query": {"weight": _uniform(k1, (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "key": {"weight": _uniform(k2, (C, A), -0.05 / C**0.5, 0.05 / C**0.5)},
        "value": {"weight": _uniform(k3, (C, A), -0.5 / C**0.5, 0.5 / C**0.5)},
        "output": {"weight": jnp.zeros((A, C), jnp.float32)},
    }


def cross_attention(
    p: Params, cfg: RWKVConfig, query: Array, key_value: Array
) -> Array:
    """Multi-head softmax cross-attention (zero-init output projection)."""
    B, T, C = query.shape
    H, N = cfg.n_head, cfg.head_size
    dt = jnp.dtype(cfg.compute_dtype)
    q = linear(p["query"], query, dt).reshape(B, T, H, N).transpose(0, 2, 1, 3)
    k = linear(p["key"], key_value, dt).reshape(B, -1, H, N).transpose(0, 2, 1, 3)
    v = linear(p["value"], key_value, dt).reshape(B, -1, H, N).transpose(0, 2, 1, 3)
    scores = jnp.matmul(q.astype(dt), k.astype(dt).transpose(0, 1, 3, 2),
                        preferred_element_type=jnp.float32) / math.sqrt(N)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.matmul(attn.astype(dt), v.astype(dt), preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return linear(p["output"], out.astype(dt), dt)


def init_cross_block_params(key: Array, cfg: RWKVConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    C = cfg.n_embd
    return {
        "ln1": _ln_init(C),
        "ln2": _ln_init(C),
        "att": init_cross_attention_params(k1, cfg),
        "ffn": {
            "c_fc": {"weight": _uniform(k2, (C, cfg.dim_ffn), -0.5 / C**0.5, 0.5 / C**0.5)},
            "c_proj": {"weight": jnp.zeros((cfg.dim_ffn, C), jnp.float32)},
        },
    }


def cross_attention_block(
    p: Params, cfg: RWKVConfig, x: Array, image_features: Array
) -> Array:
    dt = jnp.dtype(cfg.compute_dtype)
    x = x + cross_attention(p["att"], cfg, layer_norm(p["ln1"], x), image_features)
    h = jax.nn.relu(linear(p["ffn"]["c_fc"], layer_norm(p["ln2"], x), dt))
    return x + linear(p["ffn"]["c_proj"], h.astype(dt), dt)


def get_cross_block_indices(
    n_layer: int, n_cross_layer: int, cross_layer_interval: int
) -> List[int]:
    """Cross blocks placed from the END at the given interval (utils.py:256-270)."""
    total = n_layer + n_cross_layer
    indices = []
    for i in range(n_cross_layer):
        idx = total - 1 - cross_layer_interval * i
        if idx < 0:
            raise ValueError("cross_layer_interval too large")
        indices.append(idx)
    return indices


def init_hybrid_rwkv_params(
    key: Array, cfg: RWKVConfig, n_cross_layer: int
) -> Params:
    """RWKV LM params + interleaved cross-attention blocks (v6.23 HybridRWKV)."""
    k1, k2 = jax.random.split(key)
    params = lm.init_lm_params(k1, cfg)
    keys = jax.random.split(k2, n_cross_layer)
    params["cross_blocks"] = [init_cross_block_params(k, cfg) for k in keys]
    return params


def hybrid_rwkv_forward(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    image_features: Array,
    cross_layer_interval: int = 1,
    grad_cp: bool = False,
) -> Array:
    """Interleaved forward (v6.23 forward_with_image_features)."""
    from visualrwkv_tpu.models.rwkv7 import STOP_TOKEN_INDEX

    B, T, C = x.shape
    pad = (-T) % cfg.chunk_len
    if pad:
        eos = lm.embed(params, jnp.full((B, pad), STOP_TOKEN_INDEX, jnp.int32))
        x = jnp.concatenate([eos.astype(x.dtype), x], axis=1)

    n_cross = len(params["cross_blocks"])
    cross_at = set(get_cross_block_indices(len(params["blocks"]), n_cross, cross_layer_interval))
    bi = ci = 0
    v_first = None
    for i in range(len(params["blocks"]) + n_cross):
        if i in cross_at:
            blk = params["cross_blocks"][ci]
            if grad_cp:
                x = jax.checkpoint(
                    lambda p, xx, feats: cross_attention_block(p, cfg, xx, feats)
                )(blk, x, image_features)
            else:
                x = cross_attention_block(blk, cfg, x, image_features)
            ci += 1
        else:
            blk = params["blocks"][bi]
            if grad_cp:
                fn = jax.checkpoint(
                    lambda p, xx, vf, j=bi: lm.lm_block_forward(p, cfg, j, xx, vf)
                )
                x, v_first, _ = fn(blk, x, v_first)
            else:
                x, v_first, _ = lm.lm_block_forward(blk, cfg, bi, x, v_first)
            bi += 1

    x = layer_norm(params["ln_out"], x)
    if pad:
        x = x[:, pad:]
    return linear(params["head"], x, jnp.dtype(cfg.compute_dtype))
