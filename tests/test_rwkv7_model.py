"""RWKV-7 LM tests: shapes, left-pad semantics, sequence-vs-decode parity,
state chaining, and gradient flow with activation checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import rwkv7 as m


@pytest.fixture(scope="module")
def setup():
    cfg = RWKVConfig(
        n_layer=2, n_embd=128, vocab_size=512, head_size=64, compute_dtype="float32"
    )
    params = m.init_rwkv7_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


def test_forward_shapes_and_padding(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 512)
    logits, states = m.rwkv7_forward_tokens(params, cfg, tokens)
    assert logits.shape == (2, 10, 512)
    assert len(states) == cfg.n_layer
    assert states[0].wkv.shape == (2, 2, 64, 64)

    # left-padding with EOS must give the same logits as explicit left-pad
    eos = jnp.full((2, 6), m.STOP_TOKEN_INDEX, tokens.dtype)
    padded = jnp.concatenate([eos, tokens], axis=1)
    logits_pad, _ = m.rwkv7_forward_tokens(params, cfg, padded)
    assert rel_err(logits, logits_pad[:, 6:]) < 1e-5


def test_decode_matches_sequence(setup):
    cfg, params = setup
    B, T = 2, 16
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, 512)
    logits_seq, states_seq = m.rwkv7_forward_tokens(params, cfg, tokens)

    states = m.init_state(cfg, B)
    step = jax.jit(lambda tok, st: m.rwkv7_decode_step(params, cfg, tok, st))
    outs = []
    for t in range(T):
        logits_t, states = step(tokens[:, t], states)
        outs.append(logits_t)
    logits_dec = jnp.stack(outs, axis=1)
    assert rel_err(logits_dec, logits_seq) < 2e-4
    for ss, sd in zip(states_seq, states):
        assert rel_err(sd.wkv, ss.wkv) < 1e-4
        assert rel_err(sd.att_shift, ss.att_shift) < 1e-4


def test_prefill_state_then_continue(setup):
    cfg, params = setup
    B, T = 1, 32
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, 512)
    logits_full, _ = m.rwkv7_forward_tokens(params, cfg, tokens)
    _, states = m.rwkv7_forward_tokens(params, cfg, tokens[:, :16])
    logits2, _ = m.rwkv7_forward_tokens(params, cfg, tokens[:, 16:], states=states)
    assert rel_err(logits2, logits_full[:, 16:]) < 1e-4


@pytest.mark.slow
def test_grad_cp_matches(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 16), 0, 512)

    def loss(p, grad_cp):
        logits, _ = m.rwkv7_forward_tokens(p, cfg, tokens, grad_cp=grad_cp)
        return (logits.astype(jnp.float32) ** 2).mean()

    g1 = jax.grad(lambda p: loss(p, False))(params)
    flat1 = jax.tree_util.tree_leaves(g1)
    # "wkv" = selective policy: save only the named WKV output/state stream
    # (ops.wkv7 checkpoint_name) and recompute everything else
    for grad_cp in (True, "dots", "wkv"):
        g2 = jax.grad(lambda p: loss(p, grad_cp))(params)
        flat2 = jax.tree_util.tree_leaves(g2)
        total = 0.0
        for a, b in zip(flat1, flat2):
            assert rel_err(b, a) < 1e-4, grad_cp
            total += float(jnp.abs(a).sum())
        assert total > 0  # gradients actually flow


def test_stacked_forward_matches(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(9), (2, 16), 0, 512)
    logits_ref, _ = m.rwkv7_forward_tokens(params, cfg, tokens)
    sparams = m.stack_blocks(params)
    logits_stk = m.rwkv7_forward_stacked(sparams, cfg, m.embed(params, tokens))
    assert rel_err(logits_stk, logits_ref) < 1e-5
    # grad_cp path agrees too
    logits_cp = m.rwkv7_forward_stacked(sparams, cfg, m.embed(params, tokens), grad_cp=True)
    assert rel_err(logits_cp, logits_ref) < 1e-5
