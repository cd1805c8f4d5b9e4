"""Visual Token Compressor (v7.03/v7.04).

``n_vtc_layer`` RWKV blocks run bidirectionally (sequence flipped on odd
layers) over the visual tokens, followed by a LayerNorm; weights can be
initialized from the first LM blocks (reference VisualRWKV-v7/v7.03/
src/model.py:329-375,408-413).  Zero left-padding to chunk multiples.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.models.rwkv7 import (
    _ln_init,
    init_cmix_x070,
    init_tmix_x070,
    layer_norm,
)

Array = jax.Array
Params = Dict[str, Any]


def init_vtc_params(key: Array, cfg: RWKVConfig, n_vtc_layer: int) -> Params:
    keys = jax.random.split(key, n_vtc_layer * 2)
    blocks: List[Params] = []
    for i in range(n_vtc_layer):
        blk = {
            "ln1": _ln_init(cfg.n_embd),
            "ln2": _ln_init(cfg.n_embd),
            "att": init_tmix_x070(keys[2 * i], cfg, i),
            "ffn": init_cmix_x070(keys[2 * i + 1], cfg, i),
        }
        if i == 0:
            blk["ln0"] = _ln_init(cfg.n_embd)
        blocks.append(blk)
    return {"blocks": blocks, "ln_out": _ln_init(cfg.n_embd)}


def init_vtc_from_lm(lm_params: Params, n_vtc_layer: int) -> Params:
    """Copy the first n LM blocks + ln_out (reference init_vtc_weights)."""
    blocks = jax.tree_util.tree_map(lambda x: x, lm_params["blocks"][:n_vtc_layer])
    return {"blocks": blocks, "ln_out": dict(lm_params["ln_out"])}


def vtc_forward(params: Params, cfg: RWKVConfig, x: Array, grad_cp: bool = False) -> Array:
    """Compress/contextualize visual tokens [B, L, C] -> [B, L, C]."""
    B, T, C = x.shape
    pad = (-T) % cfg.chunk_len
    if pad:
        x = jnp.concatenate([jnp.zeros((B, pad, C), x.dtype), x], axis=1)

    v_first = None
    for i, blk in enumerate(params["blocks"]):
        reverse = i % 2 == 1
        if reverse:
            x = jnp.flip(x, axis=1)
            if v_first is not None:
                v_first = jnp.flip(v_first, axis=1)
        if grad_cp:
            fn = jax.checkpoint(
                lambda b, xx, vf, i=i: lm.lm_block_forward(b, cfg, i, xx, vf)
            )
            x, v_first, _ = fn(blk, x, v_first)
        else:
            x, v_first, _ = lm.lm_block_forward(blk, cfg, i, x, v_first)
        if reverse:
            x = jnp.flip(x, axis=1)
            if v_first is not None:
                v_first = jnp.flip(v_first, axis=1)

    x = layer_norm(params["ln_out"], x)
    return x[:, pad:] if pad else x
