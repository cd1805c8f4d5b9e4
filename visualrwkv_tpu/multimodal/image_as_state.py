"""Image-as-state training/inference and state tuning.

v6.xx protocol (reference VisualRWKV-v6/v6.xx/src/model.py:302-344): per block,
the image embeddings run through the block first to produce its WKV state, and
the text sequence runs through the same block *starting from that state* —
the image is absorbed into the recurrent state instead of the token stream.
v6.yy variant (v6.yy/src/model.py:392-407): states of N images are averaged.
State tuning trains a per-block initial state ``time_state``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import VLMConfig
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.models.rwkv7 import LayerState, STOP_TOKEN_INDEX, layer_norm, linear

Array = jax.Array
Params = Dict[str, Any]


def init_time_states(cfg: VLMConfig) -> Array:
    """Trainable per-block initial WKV state (v6.xx ``time_state``)."""
    r = cfg.rwkv
    return jnp.zeros((r.n_layer, r.n_head, r.head_size, r.head_size), jnp.float32)


def _wkv_only_state(cfg, batch: int, wkv: Array) -> LayerState:
    C = cfg.rwkv.n_embd
    return LayerState(
        att_shift=jnp.zeros((batch, C), jnp.float32),
        wkv=wkv,
        ffn_shift=jnp.zeros((batch, C), jnp.float32),
    )


def image_as_state_forward(
    params: Params,
    cfg: VLMConfig,
    text_emb: Array,
    image_emb: Array,
    grad_cp: bool = False,
    mean_multi_image: bool = False,
    time_states: Optional[Array] = None,
) -> Array:
    """Per-block: image pass -> WKV state -> text pass from that state.

    text_emb: [B, T_text, C]; image_emb: [B or N, T_img, C] (with
    ``mean_multi_image`` the leading dim is N images whose states average into
    a single batch row, v6.yy). Both lengths are left-padded to chunk
    multiples (EOS for text, zeros for image features).
    """
    rcfg = cfg.rwkv
    B, T, C = text_emb.shape

    pad_t = (-T) % rcfg.chunk_len
    if pad_t:
        eos = lm.embed(
            params["rwkv"], jnp.full((B, pad_t), STOP_TOKEN_INDEX, jnp.int32)
        )
        text_emb = jnp.concatenate([eos.astype(text_emb.dtype), text_emb], axis=1)
    pad_i = (-image_emb.shape[1]) % rcfg.chunk_len
    if pad_i:
        zeros = jnp.zeros(
            (image_emb.shape[0], pad_i, image_emb.shape[2]), image_emb.dtype
        )
        image_emb = jnp.concatenate([zeros, image_emb], axis=1)

    n_img = image_emb.shape[0]
    x_img, x_txt = image_emb, text_emb
    vf_img = vf_txt = None

    def block_step(blk, i, x_img, vf_img, x_txt, vf_txt, ts_i=None):
        init_img = None
        if ts_i is not None:
            init_img = _wkv_only_state(
                cfg, n_img, jnp.broadcast_to(ts_i, (n_img,) + ts_i.shape)
            )
        x_img, vf_img, st_img = lm.lm_block_forward(blk, rcfg, i, x_img, vf_img, init_img)
        wkv = st_img.wkv
        if mean_multi_image:
            wkv = wkv.mean(axis=0, keepdims=True)
            wkv = jnp.broadcast_to(wkv, (B,) + wkv.shape[1:])
        txt_state = _wkv_only_state(cfg, B, wkv)
        x_txt, vf_txt, _ = lm.lm_block_forward(blk, rcfg, i, x_txt, vf_txt, txt_state)
        return x_img, vf_img, x_txt, vf_txt

    from visualrwkv_tpu.models.rwkv7 import is_stacked

    if is_stacked(params["rwkv"]):
        # stacked layout: scan the double pass (image -> state -> text) over
        # blocks 1..L-1 (O(1)-in-depth compile, like rwkv7_forward_stacked)
        sp = params["rwkv"]
        ts0 = time_states[0] if time_states is not None else None
        x_img, vf_img, x_txt, vf_txt = block_step(
            sp["block0"], 0, x_img, vf_img, x_txt, vf_txt, ts0
        )

        if time_states is None:
            def body(carry, blk):
                xi, vi, xt, vt = carry
                fn = lambda b, a1, a2, a3, a4: block_step(b, 1, a1, a2, a3, a4)
                if grad_cp:
                    fn = jax.checkpoint(fn)
                return fn(blk, xi, vi, xt, vt), None

            xs = sp["blocks_stacked"]
        else:
            def body(carry, xs_i):
                xi, vi, xt, vt = carry
                blk, ts_i = xs_i
                fn = lambda b, a1, a2, a3, a4, t: block_step(b, 1, a1, a2, a3, a4, t)
                if grad_cp:
                    fn = jax.checkpoint(fn)
                return fn(blk, xi, vi, xt, vt, ts_i), None

            xs = (sp["blocks_stacked"], time_states[1:])
        (x_img, vf_img, x_txt, vf_txt), _ = jax.lax.scan(
            body, (x_img, vf_img, x_txt, vf_txt), xs
        )
        x = layer_norm(params["rwkv"]["ln_out"], x_txt)
        if pad_t:
            x = x[:, pad_t:]
        return linear(params["rwkv"]["head"], x, jnp.dtype(rcfg.compute_dtype))

    for i in range(rcfg.n_layer):
        blk = params["rwkv"]["blocks"][i]
        ts_i = time_states[i] if time_states is not None else None
        if grad_cp:
            fn = jax.checkpoint(
                lambda b, xi, vi, xt, vt, t, i=i: block_step(b, i, xi, vi, xt, vt, t)
            )
            x_img, vf_img, x_txt, vf_txt = fn(blk, x_img, vf_img, x_txt, vf_txt, ts_i)
        else:
            x_img, vf_img, x_txt, vf_txt = block_step(
                blk, i, x_img, vf_img, x_txt, vf_txt, ts_i
            )

    x = layer_norm(params["rwkv"]["ln_out"], x_txt)
    if pad_t:
        x = x[:, pad_t:]
    return linear(params["rwkv"]["head"], x, jnp.dtype(rcfg.compute_dtype))
