"""RWKV-6 LM tests: shapes, seq-vs-decode parity, state chaining, converter
round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.convert.pth_import import (
    export_rwkv_state_dict,
    import_rwkv_state_dict,
)
from visualrwkv_tpu.models import rwkv6 as m


@pytest.fixture(scope="module")
def setup():
    cfg = RWKVConfig(
        n_layer=2, n_embd=128, vocab_size=512, head_size=64,
        compute_dtype="float32", version="x060",
    )
    params = m.init_rwkv6_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


def test_forward_shapes(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 512)
    logits, states = m.rwkv6_forward_tokens(params, cfg, tokens)
    assert logits.shape == (2, 10, 512)
    assert states[0].wkv.shape == (2, 2, 64, 64)
    assert cfg.dim_ffn == int(round(128 * 3.5 / 32) * 32)


def test_decode_matches_sequence(setup):
    cfg, params = setup
    B, T = 2, 16
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, 512)
    logits_seq, states_seq = m.rwkv6_forward_tokens(params, cfg, tokens)
    states = m.init_state(cfg, B)
    step = jax.jit(lambda tok, st: m.rwkv6_decode_step(params, cfg, tok, st))
    outs = []
    for t in range(T):
        logits_t, states = step(tokens[:, t], states)
        outs.append(logits_t)
    logits_dec = jnp.stack(outs, axis=1)
    assert rel_err(logits_dec, logits_seq) < 2e-4
    for ss, sd in zip(states_seq, states):
        assert rel_err(sd.wkv, ss.wkv) < 1e-4


def test_state_chaining(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0, 512)
    logits_full, _ = m.rwkv6_forward_tokens(params, cfg, tokens)
    _, st = m.rwkv6_forward_tokens(params, cfg, tokens[:, :16])
    logits2, _ = m.rwkv6_forward_tokens(params, cfg, tokens[:, 16:], states=st)
    assert rel_err(logits2, logits_full[:, 16:]) < 1e-4


def test_converter_round_trip(setup):
    cfg, params = setup
    sd = export_rwkv_state_dict(params)
    assert sd["blocks.0.att.time_maa_x"].shape == (1, 1, 128)
    assert sd["blocks.0.att.time_maa_w2"].shape == (5, 32, 128)
    assert sd["blocks.0.att.time_faaaa"].shape == (2, 64)
    assert sd["blocks.0.att.gate.weight"].shape == (128, 128)
    back = import_rwkv_state_dict(sd)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
