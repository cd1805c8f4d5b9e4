"""RWKV-4 ("x040") LM tests: shapes, decode parity, state chaining,
converter round trip, torch-oracle logit parity, version autodetection, and
the adapter-v4 pairing (the reference's frozen-RNN + BLIP2-adapter assembly,
VisualRWKV-v4/visualrwkv/model.py:11-142 / components/rwkv_rnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.convert.pth_import import (
    detect_rwkv_version,
    export_rwkv_state_dict,
    import_rwkv_state_dict,
)
from visualrwkv_tpu.models import rwkv4 as m


@pytest.fixture(scope="module")
def setup():
    cfg = RWKVConfig(
        n_layer=2, n_embd=64, vocab_size=256,
        compute_dtype="float32", version="x040",
    )
    params = m.init_rwkv4_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


# Every sequence forward in this module runs at (B, T) = (2, 12) so the x040
# scan compiles ONCE for the whole file (each distinct shape costs a full
# scan compile; this module used to pay ~6 of them).
B0, T0 = 2, 12


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


def test_forward_shapes(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B0, T0), 0, 256)
    logits, states = m.rwkv4_forward_tokens(params, cfg, tokens)
    assert logits.shape == (B0, T0, 256)
    assert states[0].wkv.shape == (B0, 64, 3)  # aa/bb/pp per channel
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_decode_step_matches_forward(setup):
    """T=1 stepping through init_state must reproduce the sequence forward."""
    cfg, params = setup
    T = T0
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B0, T), 0, 256)
    logits_seq, _ = m.rwkv4_forward_tokens(params, cfg, tokens)

    states = m.init_state_x040(cfg, B0)
    outs = []
    for t in range(T):
        lg, states = m.rwkv4_decode_step(params, cfg, tokens[:, t], states)
        outs.append(lg)
    logits_step = jnp.stack(outs, axis=1)
    assert rel_err(logits_step, logits_seq) < 1e-5


def test_state_chaining(setup):
    """Split-sequence forward with carried state == one-shot forward."""
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B0, T0), 0, 256)
    full, _ = m.rwkv4_forward_tokens(params, cfg, tokens)
    a, st = m.rwkv4_forward_tokens(params, cfg, tokens[:, :6])
    b, _ = m.rwkv4_forward_tokens(params, cfg, tokens[:, 6:], states=st)
    assert rel_err(jnp.concatenate([a, b], axis=1), full) < 1e-5


def test_converter_round_trip(setup):
    cfg, params = setup
    sd = export_rwkv_state_dict(params)
    back = import_rwkv_state_dict(sd)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B0, T0), 0, 256)
    l1, _ = m.rwkv4_forward_tokens(params, cfg, tokens)
    l2, _ = m.rwkv4_forward_tokens(back, cfg, tokens)
    assert rel_err(l2, l1) < 1e-6


def test_version_autodetect(setup):
    cfg, params = setup
    info = detect_rwkv_version(export_rwkv_state_dict(params))
    assert info["version"] == "x040"
    assert info["n_layer"] == cfg.n_layer
    assert info["n_embd"] == cfg.n_embd
    assert info["vocab_size"] == cfg.vocab_size


def test_torch_oracle_parity(setup):
    """Independent eager torch re-derivation of the v4 serving math
    (reference rwkv_rnn.py::att_seq/ffn_seq: log-domain aa/bb/pp recurrence
    with the u-bonus applied pre-update) on our exported weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg, params = setup
    sd = {k: torch.tensor(v) for k, v in export_rwkv_state_dict(params).items()}
    C = cfg.n_embd
    T = T0
    # duplicate row 0 so the jax forward reuses the module's (B0, T0) compile
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (1, T), 0, 256)
    ).repeat(B0, axis=0)

    with torch.no_grad():
        x = sd["emb.weight"][torch.tensor(tokens[0])]  # [T, C]
        for li in range(cfg.n_layer):
            pre = f"blocks.{li}."
            if li == 0:
                x = F.layer_norm(x, (C,), sd[pre + "ln0.weight"], sd[pre + "ln0.bias"])
            # --- TimeMix ---
            xx = F.layer_norm(x, (C,), sd[pre + "ln1.weight"], sd[pre + "ln1.bias"])
            sx = torch.cat((torch.zeros(1, C), xx[:-1]))
            mk = sd[pre + "att.time_mix_k"].reshape(C)
            mv = sd[pre + "att.time_mix_v"].reshape(C)
            mr = sd[pre + "att.time_mix_r"].reshape(C)
            kx, vx = xx * mk + sx * (1 - mk), xx * mv + sx * (1 - mv)
            rx = xx * mr + sx * (1 - mr)
            r = torch.sigmoid(rx @ sd[pre + "att.receptance.weight"].T)
            k = kx @ sd[pre + "att.key.weight"].T
            v = vx @ sd[pre + "att.value.weight"].T
            w = -torch.exp(sd[pre + "att.time_decay"].reshape(C))
            u = sd[pre + "att.time_first"].reshape(C)
            aa = torch.zeros(C)
            bb = torch.zeros(C)
            pp = torch.full((C,), -1e30)
            wkv = torch.empty(T, C)
            for t in range(T):
                ww = u + k[t]
                p = torch.maximum(pp, ww)
                e1, e2 = torch.exp(pp - p), torch.exp(ww - p)
                wkv[t] = (e1 * aa + e2 * v[t]) / (e1 * bb + e2)
                ww = w + pp
                p = torch.maximum(ww, k[t])
                e1, e2 = torch.exp(ww - p), torch.exp(k[t] - p)
                aa, bb, pp = e1 * aa + e2 * v[t], e1 * bb + e2, p
            x = x + (r * wkv) @ sd[pre + "att.output.weight"].T
            # --- ChannelMix ---
            xx = F.layer_norm(x, (C,), sd[pre + "ln2.weight"], sd[pre + "ln2.bias"])
            sx = torch.cat((torch.zeros(1, C), xx[:-1]))
            fk = sd[pre + "ffn.time_mix_k"].reshape(C)
            fr = sd[pre + "ffn.time_mix_r"].reshape(C)
            kx = xx * fk + sx * (1 - fk)
            rx = xx * fr + sx * (1 - fr)
            kk = torch.relu(kx @ sd[pre + "ffn.key.weight"].T) ** 2
            x = x + torch.sigmoid(rx @ sd[pre + "ffn.receptance.weight"].T) * (
                kk @ sd[pre + "ffn.value.weight"].T
            )
        x = F.layer_norm(x, (C,), sd["ln_out.weight"], sd["ln_out.bias"])
        logits_torch = (x @ sd["head.weight"].T).numpy()

    logits_jax, _ = m.rwkv4_forward_tokens(params, cfg, jnp.asarray(tokens))
    assert rel_err(np.asarray(logits_jax)[0], logits_torch) < 2e-5


def test_adapter_v4_pairs_with_x040(setup):
    """The reference v4 assembly: adapter queries as a visual prefix into the
    FROZEN RWKV-4 — adapter_pretrain_losses must run (and be finite) with an
    x040 backbone through the generic lm dispatch."""
    cfg, params = setup
    from visualrwkv_tpu.multimodal.adapter_v4 import (
        AdapterConfig,
        adapter_pretrain_losses,
        init_adapter_params,
    )

    acfg = AdapterConfig(num_task_embeddings=4, n_adapter_layers=1)
    ap = init_adapter_params(jax.random.PRNGKey(7), cfg, acfg)
    B, T, L = 2, 6, 5
    feats = jax.random.normal(jax.random.PRNGKey(8), (B, L, cfg.n_embd))
    ids = jax.random.randint(jax.random.PRNGKey(9), (B, T), 1, 256)
    mask = jnp.ones((B, T), bool)
    # one value_and_grad trace covers both the loss values and gradient flow
    # (tracing the frozen x040 scan twice doubled this test's compile time)
    (total, parts), g = jax.value_and_grad(
        lambda a: adapter_pretrain_losses(a, params, cfg, feats, ids, mask),
        has_aux=True,
    )(ap)
    assert np.isfinite(float(total))
    assert set(parts) == {"loss_itc", "loss_itm", "loss_lm"}
    # gradients flow to the adapter, not the frozen LM
    gn = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    )
    assert np.isfinite(gn) and gn > 0


def test_init_lm_state_dispatch_and_dim_att():
    """lm.init_lm_state must route x040 to the aa/bb/pp state (not the
    [B,H,N,N] matrix state rwkv7.init_state builds) and size the recurrence
    over dim_att, which may differ from n_embd."""
    from visualrwkv_tpu.models import lm

    cfg = RWKVConfig(
        n_layer=2, n_embd=128, dim_att=64, vocab_size=512,
        compute_dtype="float32", version="x040",
    )
    params = m.init_rwkv4_params(jax.random.PRNGKey(0), cfg)
    states = lm.init_lm_state(cfg, batch=3)
    assert states[0].wkv.shape == (3, 64, 3)  # dim_att channels, not n_embd
    assert states[0].att_shift.shape == (3, 128)  # shifts stay n_embd-wide
    tokens = jax.random.randint(jax.random.PRNGKey(1), (3,), 0, 512)
    logits, new_states = lm.lm_decode_step(params, cfg, tokens, states)
    assert logits.shape == (3, 512)
    assert new_states[0].wkv.shape == (3, 64, 3)
    assert np.isfinite(np.asarray(logits)).all()
    # x070 (and the shared x052/x060 layout) still gets the matrix state
    cfg7 = RWKVConfig(n_layer=2, n_embd=128, vocab_size=512, version="x070")
    st7 = lm.init_lm_state(cfg7, batch=2)
    assert st7[0].wkv.shape == (2, cfg7.n_head, 64, 64)


def test_detect_rejects_non_rwkv_dict():
    """A vision-only / empty / non-RWKV state dict must raise, not silently
    classify as an empty x040 checkpoint."""
    with pytest.raises(ValueError, match="no RWKV LM keys"):
        detect_rwkv_version({})
    with pytest.raises(ValueError, match="no RWKV LM keys"):
        detect_rwkv_version(
            {"vit.dino_featurizer.blocks.0.attn.qkv.weight": np.zeros((3, 3))}
        )
