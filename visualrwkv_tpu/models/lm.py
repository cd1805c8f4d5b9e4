"""Version-dispatch facade over the RWKV language model families.

The reference is a version-snapshot monorepo (one codebase per model
generation); here every generation is a config (``RWKVConfig.version``):
"x070" (RWKV-7, flagship), "x060" (RWKV-6, the published-paper backbone),
"x052" (legacy RWKV-5.2; static decay through the same diagonal-decay
WKV6 kernel), and "x040" (the frozen RWKV-4 RNN the v4 adapter pairs with;
per-channel aa/bb/pp recurrence, ops.wkv4). Checkpoint families are auto-detected from state-dict keys by
convert.pth_import.detect_rwkv_version (reference app/modeling_rwkv.py:227-244).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import rwkv4, rwkv5, rwkv6, rwkv7
from visualrwkv_tpu.models.rwkv7 import LayerState, embed, init_state  # noqa: F401

Array = jax.Array
Params = Dict[str, Any]


def init_lm_state(cfg: RWKVConfig, batch: int) -> List[LayerState]:
    """Version-dispatched zero recurrent state. x052/x060/x070 share the
    [B, H, N, N] matrix-state layout (rwkv7.init_state); x040 carries the
    per-channel aa/bb/pp log-domain triple instead (reference
    app/cuda/operators.cu:12-50 state layout)."""
    if cfg.version == "x040":
        return rwkv4.init_state_x040(cfg, batch)
    return init_state(cfg, batch)


def init_lm_params(key: Array, cfg: RWKVConfig) -> Params:
    if cfg.version == "x070":
        return rwkv7.init_rwkv7_params(key, cfg)
    if cfg.version == "x060":
        return rwkv6.init_rwkv6_params(key, cfg)
    if cfg.version == "x052":
        return rwkv5.init_rwkv5_params(key, cfg)
    if cfg.version == "x040":
        return rwkv4.init_rwkv4_params(key, cfg)
    raise ValueError(f"unknown RWKV version {cfg.version}")


def lm_forward(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    states: Optional[List[LayerState]] = None,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Tuple[Array, List[LayerState]]:
    if rwkv7.is_stacked(params):
        # layer loop as ONE lax.scan body: compile time O(1) in depth
        # (training/prefill layout, see rwkv7.stack_blocks). Stateless.
        if states is not None:
            raise ValueError("stacked layout does not carry recurrent states")
        if cfg.version != "x070":
            raise ValueError("stacked layout is x070-only")
        out = rwkv7.rwkv7_forward_stacked(
            params, cfg, x, grad_cp=grad_cp, return_hidden=return_hidden
        )
        return out, []
    if cfg.version == "x070":
        return rwkv7.rwkv7_forward(params, cfg, x, states, grad_cp, return_hidden)
    if cfg.version == "x060":
        return rwkv6.rwkv6_forward(params, cfg, x, states, grad_cp, return_hidden)
    if cfg.version == "x052":
        return rwkv5.rwkv5_forward(params, cfg, x, states, grad_cp, return_hidden)
    if cfg.version == "x040":
        return rwkv4.rwkv4_forward(params, cfg, x, states, grad_cp, return_hidden)
    raise ValueError(f"unknown RWKV version {cfg.version}")


def lm_forward_tokens(params, cfg, tokens, states=None, grad_cp=False):
    return lm_forward(params, cfg, embed(params, tokens), states, grad_cp)


def lm_decode_step(params, cfg, token, states):
    if cfg.version == "x070":
        return rwkv7.rwkv7_decode_step(params, cfg, token, states)
    if cfg.version == "x060":
        return rwkv6.rwkv6_decode_step(params, cfg, token, states)
    if cfg.version == "x052":
        return rwkv5.rwkv5_decode_step(params, cfg, token, states)
    if cfg.version == "x040":
        return rwkv4.rwkv4_decode_step(params, cfg, token, states)
    raise ValueError(f"unknown RWKV version {cfg.version}")


def lm_decode_step_embed(params, cfg, x_emb, states):
    if cfg.version == "x070":
        return rwkv7.rwkv7_decode_step_embed(params, cfg, x_emb, states)
    if cfg.version == "x060":
        return rwkv6.rwkv6_decode_step_embed(params, cfg, x_emb, states)
    if cfg.version == "x052":
        return rwkv5.rwkv5_decode_step_embed(params, cfg, x_emb, states)
    if cfg.version == "x040":
        return rwkv4.rwkv4_decode_step_embed(params, cfg, x_emb, states)
    raise ValueError(f"unknown RWKV version {cfg.version}")


def lm_block_forward(
    params: Params,
    cfg: RWKVConfig,
    layer_id: int,
    x: Array,
    v_first: Optional[Array],
    state: Optional[LayerState] = None,
):
    """Single-block forward (used by the bidirectional image path and the
    visual token compressor). Returns (x, v_first, state); v_first is unused
    (passed through) for x060."""
    if cfg.version == "x070":
        return rwkv7.block_x070(params, cfg, layer_id, x, v_first, state)
    if cfg.version == "x060":
        x, st = rwkv6.block_x060(params, cfg, layer_id, x, state)
        return x, v_first, st
    if cfg.version == "x052":
        x, st = rwkv5.block_x052(params, cfg, layer_id, x, state)
        return x, v_first, st
    if cfg.version == "x040":
        x, st = rwkv4.block_x040(params, cfg, layer_id, x, state)
        return x, v_first, st
    raise ValueError(f"unknown RWKV version {cfg.version}")
