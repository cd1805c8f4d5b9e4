"""Tests: native C++ tokenizer parity, strategy-string DSL."""

import shutil

import jax.numpy as jnp
import pytest

from visualrwkv_tpu.data.tokenizer import WorldTokenizer
from visualrwkv_tpu.infer.strategy import Strategy, apply_strategy, parse_strategy


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_native_tokenizer_parity():
    native = WorldTokenizer(use_native="always")
    pure = WorldTokenizer(use_native="never")
    cases = [
        "User: What is in this image?\n\nAssistant: A cat.\n\n",
        "中文 🙂 mixed", "\x00\x01 bytes", "", "  \n\n\n  ",
    ]
    for c in cases:
        assert native.encode(c) == pure.encode(c), c
        assert native.decode(native.encode(c)) == c or c == ""


def test_parse_strategy():
    s = parse_strategy("tpu bf16")
    assert s.device == "tpu" and s.compute_dtype == jnp.bfloat16 and not s.int8_weights
    s = parse_strategy("tpu bf16i8")
    assert s.int8_weights
    s = parse_strategy("tpu bf16 *int8")
    assert s.int8_weights
    s = parse_strategy("cpu fp32")
    assert s.device == "cpu" and s.compute_dtype == jnp.float32
    with pytest.raises(ValueError):
        parse_strategy("cuda fp16 *20+ -> cpu fp32")


def test_apply_strategy():
    params = {"blocks": [{"att": {"receptance": {"weight": jnp.zeros((512, 512))}}}]}
    out = apply_strategy(params, parse_strategy("cpu bf16i8"))
    leaf = out["blocks"][0]["att"]["receptance"]
    assert "weight_q" in leaf and leaf["weight_q"].dtype == jnp.int8
    out2 = apply_strategy({"w": jnp.zeros((4, 4), jnp.float32)}, parse_strategy("cpu bf16"))
    assert out2["w"].dtype == jnp.bfloat16


def test_strategy_state_dtype_token():
    from visualrwkv_tpu.infer.strategy import parse_strategy

    s = parse_strategy("tpu bf16i8 s16")
    assert s.int8_weights and s.state_dtype == "bfloat16"
    assert parse_strategy("tpu bf16").state_dtype == "float32"
    assert parse_strategy("cpu fp32 s32").state_dtype == "float32"


@pytest.mark.slow
def test_make_engine_from_strategy_string():
    """make_engine: one-call serving setup (quant + dtypes + state carry)."""
    import jax
    import jax.numpy as jnp

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.infer.strategy import make_engine
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params

    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=256, vocab_size=66000, head_size=64,
                        compute_dtype="float32", ctx_len=128),
        vision=VisionConfig(towers=()), proj_type="linear",
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    eng = make_engine(params, cfg, "cpu fp32 s16")
    assert eng.state_dtype == jnp.bfloat16
    import numpy as np

    res = eng.generate(np.array([[11, 22, 33, 44]]), max_new_tokens=4, stop_tokens=(-1,))
    assert res.tokens.shape == (1, 4)
    # int8 weights materialize as weight_q
    eng2 = make_engine(params, cfg, "cpu fp32i8")
    assert "weight_q" in eng2.params["rwkv"]["head"]


def test_parse_strategy_state_tokens():
    s = parse_strategy("tpu bf16i8 s16")
    assert s.state_dtype == "bfloat16" and s.state_layout == "head"
    s = parse_strategy("tpu bf16i8 s16 flat")
    assert s.state_dtype == "bfloat16" and s.state_layout == "flat" and s.int8_weights
    s = parse_strategy("tpu bf16 flat")
    assert s.state_dtype == "float32" and s.state_layout == "flat"
