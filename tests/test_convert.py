"""Cross-framework parity: torch oracle (reference key layout) -> converter ->
our JAX model, logits must match. Also round-trips the exporter."""

import jax
import numpy as np
import torch

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.convert.pth_import import (
    export_rwkv_state_dict,
    import_rwkv_state_dict,
)
from visualrwkv_tpu.models import rwkv7 as m

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from torch_oracle import RWKV7Oracle


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


def test_torch_to_jax_logit_parity():
    torch.manual_seed(0)
    cfg = RWKVConfig(
        n_layer=3, n_embd=128, vocab_size=512, head_size=64, compute_dtype="float32"
    )
    loras = (cfg.d_decay_lora, cfg.d_aaa_lora, cfg.d_mv_lora, cfg.d_gate_lora)
    oracle = RWKV7Oracle(cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.vocab_size, cfg.dim_ffn, loras)
    oracle.eval().float()

    idx = torch.randint(0, 512, (2, 16))
    logits_torch = oracle(idx).numpy()

    params = import_rwkv_state_dict(oracle.state_dict())
    logits_jax, _ = m.rwkv7_forward_tokens(params, cfg, np.asarray(idx.numpy()))
    err = rel_err(np.asarray(logits_jax), logits_torch)
    assert err < 2e-5, f"logit parity failed: rel rms {err}"


def test_export_round_trip():
    cfg = RWKVConfig(
        n_layer=2, n_embd=128, vocab_size=512, head_size=64, compute_dtype="float32"
    )
    params = m.init_rwkv7_params(jax.random.PRNGKey(0), cfg)
    sd = export_rwkv_state_dict(params)
    # reference-style keys present with reference shapes
    assert sd["blocks.0.att.receptance.weight"].shape == (128, 128)
    assert sd["blocks.0.att.x_r"].shape == (1, 1, 128)
    assert sd["blocks.1.att.v0"].shape == (1, 1, 128)
    assert sd["head.weight"].shape == (512, 128)
    back = import_rwkv_state_dict(sd)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_torch_to_jax_logit_parity_fused_path():
    """Same cross-framework lock, but through the fused Pallas custom_vjp
    dispatch (interpret mode on CPU) — the path real TPU inference/training
    takes. Guards converter + model + fused-kernel integration against an
    independent torch implementation."""
    from visualrwkv_tpu.ops.wkv7 import set_wkv_impl

    torch.manual_seed(1)
    cfg = RWKVConfig(
        n_layer=2, n_embd=128, vocab_size=512, head_size=64, compute_dtype="float32"
    )
    loras = (cfg.d_decay_lora, cfg.d_aaa_lora, cfg.d_mv_lora, cfg.d_gate_lora)
    oracle = RWKV7Oracle(cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.vocab_size, cfg.dim_ffn, loras)
    oracle.eval().float()

    idx = torch.randint(0, 512, (2, 16))
    logits_torch = oracle(idx).numpy()
    params = import_rwkv_state_dict(oracle.state_dict())

    for impl in ("pallas", "packed"):
        set_wkv_impl(impl)
        try:
            logits_jax, _ = m.rwkv7_forward_tokens(params, cfg, np.asarray(idx.numpy()))
        finally:
            set_wkv_impl("auto")
        err = rel_err(np.asarray(logits_jax), logits_torch)
        assert err < 2e-5, f"{impl}: rel rms {err}"
