"""Tests: v6.2x hybrid variants, v5.1 scanning strategies, v5.2 tiny attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.multimodal.hybrid import (
    cross_attention_block,
    get_cross_block_indices,
    hybrid_rwkv_forward,
    init_cross_block_params,
    init_hybrid_rwkv_params,
    init_memory_read_params,
    memory_read_mix,
)
from visualrwkv_tpu.multimodal.scanning import (
    apply_scanning,
    init_tiny_attention_params,
    scan_orders,
    snake_order,
    spiral_order,
    tiny_attention,
    zigzag_order,
)


@pytest.fixture(scope="module")
def cfg():
    return RWKVConfig(n_layer=2, n_embd=64, vocab_size=512, head_size=32,
                      compute_dtype="float32", version="x060")


def test_cross_block_indices():
    assert get_cross_block_indices(4, 2, 2) == [5, 3]
    assert get_cross_block_indices(3, 1, 1) == [3]
    with pytest.raises(ValueError):
        get_cross_block_indices(2, 3, 4)


def test_memory_read_mix(cfg):
    from visualrwkv_tpu.models.rwkv6 import init_tmix_x060

    p = init_tmix_x060(jax.random.PRNGKey(0), cfg, 0)
    mem = init_memory_read_params(jax.random.PRNGKey(1), cfg, 0)
    mem["mem_gate"]["weight"] = jax.random.normal(jax.random.PRNGKey(2), (64, 64)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 64))
    wkv_out = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 64))
    s0 = jnp.zeros((1, 2, 32, 32))
    s1 = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 32, 32))
    o0 = memory_read_mix(p, mem, cfg, x, wkv_out, s0)
    o1 = memory_read_mix(p, mem, cfg, x, wkv_out, s1)
    assert o0.shape == (1, 8, 64)
    assert float(jnp.abs(o1 - o0).max()) > 1e-4  # image state read through


def test_cross_attention_block_zero_init_is_identity_plus(cfg):
    p = init_cross_block_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 64))
    out = cross_attention_block(p, cfg, x, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)  # zero-init
    p["att"]["output"]["weight"] = jax.random.normal(jax.random.PRNGKey(3), (64, 64)) * 0.1
    out2 = cross_attention_block(p, cfg, x, feats)
    assert float(jnp.abs(out2 - x).max()) > 1e-3


@pytest.mark.slow
def test_hybrid_rwkv_forward(cfg):
    params = init_hybrid_rwkv_params(jax.random.PRNGKey(0), cfg, n_cross_layer=1)
    # make cross output visible
    params["cross_blocks"][0]["att"]["output"]["weight"] = (
        jax.random.normal(jax.random.PRNGKey(1), (64, 64)) * 0.1
    )
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 512)
    x = lm.embed(params, tokens)
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 64))
    logits = hybrid_rwkv_forward(params, cfg, x, feats, cross_layer_interval=1)
    assert logits.shape == (1, 8, 512)
    feats2 = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 64))
    logits2 = hybrid_rwkv_forward(params, cfg, x, feats2, cross_layer_interval=1)
    assert float(jnp.abs(logits2 - logits).max()) > 1e-5


def test_scan_orders_are_permutations():
    n = 4
    for strat in ("unidirection", "bidirection", "multidirection", "rotation",
                  "spiral", "snake", "zigzag"):
        for order in scan_orders(n, strat):
            assert sorted(order.tolist()) == list(range(n * n)), strat
    assert snake_order(2).tolist() == [0, 1, 3, 2]
    assert spiral_order(3).tolist() == [0, 1, 2, 5, 8, 7, 6, 3, 4]
    assert zigzag_order(2).tolist() == [0, 2, 1, 3]


def test_apply_scanning_shapes():
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    assert apply_scanning(feats, "snake").shape == (2, 16, 8)
    assert apply_scanning(feats, "bidirection").shape == (2, 32, 8)
    assert apply_scanning(feats, "multidirection").shape == (2, 64, 8)


def test_tiny_attention():
    p = init_tiny_attention_params(jax.random.PRNGKey(0), 64, 16)
    p["out"]["weight"] = jax.random.normal(jax.random.PRNGKey(1), (64, 64)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))
    x_emb = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 64))
    out = tiny_attention(p, x, x_emb, causal=False, dtype=jnp.float32)
    assert out.shape == x.shape
    assert float(jnp.abs(out - x).max()) > 1e-4
