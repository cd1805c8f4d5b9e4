"""Strategy-string DSL for serving placement/precision.

The reference's serving engine is configured by strings like
``"cuda fp16 *20+ -> cpu fp32"`` (per-layer device/dtype plans + streaming,
app/modeling_rwkv.py:184-314).  On TPU, weights fit or are sharded — layer
streaming is unnecessary — so the grammar maps to device + compute dtype +
optional weight quantization:

    "tpu bf16"           all weights bf16 on the TPU (default)
    "tpu bf16i8"         bf16 activations, int8 weights (weight-only quant)
    "cpu fp32"           host CPU, fp32
    "tpu bf16 *int8"     same as bf16i8 (reference-style modifier)
    "tpu bf16i8 s16"     + WKV decode state carried in bf16 (the reference's
                         fp16 serving strategies also carry half-precision
                         states; halves the dominant decode HBM-traffic term,
                         measured 4448 -> 6694 tok/s at 1B5/B32 int8)
    "tpu bf16i8 flat"    + lane-flat [B, 64, H*64] decode state carry (no
                         TPU 64->128 lane padding; measured +6% for
                         fp32-state configs, but LOSES to s16 — see
                         ops.wkv7.wkv7_step_flat for numbers)

``apply_strategy`` places/casts a parameter tree accordingly; ``state_dtype``
is consumed by ``InferenceEngine``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

_STRATEGY_RE = re.compile(
    r"^\s*(?P<device>tpu|cpu|gpu)\s+"
    r"(?P<dtype>bf16|fp16|fp32)(?P<quant>i8)?"
    r"(?:\s+\*(?P<mod>int8|stream))?"
    r"(?:\s+s(?P<state>16|32))?"
    r"(?:\s+(?P<layout>flat))?\s*$"
)

_DTYPES = {"bf16": jnp.bfloat16, "fp16": jnp.float16, "fp32": jnp.float32}


@dataclass(frozen=True)
class Strategy:
    device: str = "tpu"
    compute_dtype: Any = jnp.bfloat16
    int8_weights: bool = False
    state_dtype: str = "float32"  # WKV decode-state carry dtype
    state_layout: str = "head"  # "head" | "flat" decode-state layout

    @property
    def dtype_name(self) -> str:
        return jnp.dtype(self.compute_dtype).name


def parse_strategy(s: str) -> Strategy:
    m = _STRATEGY_RE.match(s)
    if not m:
        raise ValueError(
            f"bad strategy {s!r}; expected e.g. 'tpu bf16', 'tpu bf16i8 s16', 'cpu fp32'"
        )
    return Strategy(
        device=m.group("device"),
        compute_dtype=_DTYPES[m.group("dtype")],
        int8_weights=bool(m.group("quant")) or m.group("mod") == "int8",
        state_dtype="bfloat16" if m.group("state") == "16" else "float32",
        state_layout="flat" if m.group("layout") else "head",
    )


def make_engine(params, cfg, strategy):
    """Build an InferenceEngine from a strategy string (the one-call serving
    entry point: quantization + dtype placement + state carry dtype)."""
    s = parse_strategy(strategy) if isinstance(strategy, str) else strategy
    params = apply_strategy(params, s)
    from visualrwkv_tpu.infer.engine import InferenceEngine

    return InferenceEngine(params, cfg, state_dtype=s.state_dtype,
                           state_layout=s.state_layout)


def apply_strategy(params, strategy: Strategy):
    """Cast/quantize a parameter tree and place it on the strategy's device."""
    if strategy.int8_weights:
        from visualrwkv_tpu.infer.quant import quantize_lm_params

        params = quantize_lm_params(params)

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(strategy.compute_dtype)
        return x

    params = jax.tree_util.tree_map(cast, params)
    plat = "cpu" if strategy.device == "cpu" else None
    if plat:
        dev = jax.devices(plat)[0]
        params = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), params)
    return params
