"""Weight quantization for serving.

The reference's int8 path dequantizes inside custom CUDA mm8 kernels with
per-row/column min/range factors (app/modeling_rwkv.py:383-411, app/cuda/
operators.cu mm8_seq/mm8_one).  TPU-natively, weight-only int8 with a
per-output-channel symmetric scale is stored as ``{"weight_q": int8 [in,out],
"scale": f32 [out]}``; the dequant multiply fuses into the consuming matmul's
operand read under XLA, halving decode HBM traffic vs bf16.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


def quantize_weight(w: Array) -> Params:
    """[in, out] float -> int8 + per-out-channel scale."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"weight_q": q, "scale": scale}


def dequantize_weight(p: Params, dt) -> Array:
    return (p["weight_q"].astype(jnp.float32) * p["scale"]).astype(dt)


def linear_any(p: Params, x: Array, dt) -> Array:
    """Linear that transparently handles float or int8-quantized weights."""
    if "weight_q" in p:
        w = dequantize_weight(p, dt)
    else:
        w = p["weight"].astype(dt)
    y = jnp.matmul(x.astype(dt), w, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y


_QUANT_MIN_SIZE = 256 * 256


def quantize_lm_params(params: Params, min_size: int = _QUANT_MIN_SIZE) -> Params:
    """Quantize every large 2-D linear weight in an LM/VLM param tree.

    Only dict nodes of the form {"weight": 2-D} (optionally with bias) are
    rewritten; LoRA/time-mix/norm params stay in float (they are small and
    precision-sensitive).
    """

    def walk(node, name=""):
        if isinstance(node, dict):
            if (
                name != "emb"  # embedding stays float (gather, not matmul)
                and "weight" in node
                and hasattr(node["weight"], "ndim")
                and node["weight"].ndim == 2
                and node["weight"].size >= min_size
            ):
                out = quantize_weight(node["weight"])
                for k, v in node.items():
                    if k != "weight":
                        out[k] = v
                return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params)
