"""RWKV-5.2 ("x052") LM tests: shapes, decode parity, state chaining,
converter round trip, torch-oracle logit parity, and checkpoint version
autodetection (reference app/modeling_rwkv.py:227-244)."""

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
from visualrwkv_tpu.models import rwkv5 as m


@pytest.fixture(scope="module")
def setup():
    cfg = RWKVConfig(
        n_layer=2, n_embd=128, vocab_size=512, head_size=64,
        compute_dtype="float32", version="x052",
    )
    params = m.init_rwkv5_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


def test_forward_shapes(setup):
    cfg, params = setup
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 512)
    logits, states = m.rwkv5_forward_tokens(params, cfg, tokens)
    assert logits.shape == (2, 10, 512)
    assert states[0].wkv.shape == (2, 2, 64, 64)


def test_decode_matches_sequence(setup):
    cfg, params = setup
    B, T = 2, 16
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, 512)
    logits_seq, states_seq = m.rwkv5_forward_tokens(params, cfg, tokens)
    from visualrwkv_tpu.models.rwkv7 import init_state

    states = init_state(cfg, B)
    step = jax.jit(lambda tok, st: m.rwkv5_decode_step(params, cfg, tok, st))
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
    logits_full, _ = m.rwkv5_forward_tokens(params, cfg, tokens)
    _, st = m.rwkv5_forward_tokens(params, cfg, tokens[:, :16])
    logits2, _ = m.rwkv5_forward_tokens(params, cfg, tokens[:, 16:], states=st)
    assert rel_err(logits2, logits_full[:, 16:]) < 1e-4


def test_converter_round_trip(setup):
    cfg, params = setup
    sd = export_rwkv_state_dict(params)
    assert sd["blocks.0.att.time_mix_k"].shape == (1, 1, 128)
    assert sd["blocks.0.att.time_decay"].shape == (2, 64)
    assert sd["blocks.0.att.time_faaaa"].shape == (2, 64)
    back = import_rwkv_state_dict(sd)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_torch_oracle_parity(setup):
    """Independent eager torch re-derivation of the v5.2 math (the serving
    recurrence, reference app/modeling_rwkv.py::att_seq_v5_2 + the training
    ln_x(x/divisor) normalization) on our exported weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg, params = setup
    sd = {k: torch.tensor(v) for k, v in export_rwkv_state_dict(params).items()}
    B, T, C, H, N = 1, 12, cfg.n_embd, cfg.n_head, cfg.head_size
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (B, T), 0, 512)
    )

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
            mg = sd[pre + "att.time_mix_g"].reshape(C)
            kx, vx = xx * mk + sx * (1 - mk), xx * mv + sx * (1 - mv)
            rx, gx = xx * mr + sx * (1 - mr), xx * mg + sx * (1 - mg)
            r = (rx @ sd[pre + "att.receptance.weight"].T).view(T, H, N).transpose(0, 1)
            k = (kx @ sd[pre + "att.key.weight"].T).view(T, H, N).permute(1, 2, 0)
            v = (vx @ sd[pre + "att.value.weight"].T).view(T, H, N).transpose(0, 1)
            g = F.silu(gx @ sd[pre + "att.gate.weight"].T)
            t_decay = torch.exp(-torch.exp(sd[pre + "att.time_decay"])).view(H, N, 1)
            t_first = sd[pre + "att.time_faaaa"].view(H, N, 1)
            s = torch.zeros(H, N, N)
            out = torch.empty(T, H, N)
            for t in range(T):
                rt = r[:, t : t + 1, :]
                kt = k[:, :, t : t + 1]
                vt = v[:, t : t + 1, :]
                at = kt @ vt
                out[t] = (rt @ (t_first * at + s)).squeeze(1)
                s = at + t_decay * s
            out = out.reshape(T, H * N)
            out = F.group_norm(
                out / cfg.head_size_divisor, num_groups=H,
                weight=sd[pre + "att.ln_x.weight"], bias=sd[pre + "att.ln_x.bias"],
            )
            x = x + (out * g) @ sd[pre + "att.output.weight"].T
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
        ref_logits = (x @ sd["head.weight"].T).numpy()

    ours, _ = m.rwkv5_forward_tokens(params, cfg, jnp.asarray(tokens))
    assert rel_err(np.asarray(ours)[0], ref_logits) < 2e-5


def test_detect_rwkv_version():
    z = np.zeros
    x052 = {
        "emb.weight": z((512, 128)),
        "blocks.0.att.time_decay": z((2, 64)),
        "blocks.0.att.time_faaaa": z((2, 64)),
        "blocks.0.att.gate.weight": z((128, 128)),
        "blocks.0.att.ln_x.weight": z((128,)),
        "blocks.1.att.time_decay": z((2, 64)),
    }
    info = detect_rwkv_version(x052)
    assert info["version"] == "x052"
    assert info == {
        "version": "x052", "n_layer": 2, "n_embd": 128, "vocab_size": 512,
        "head_size": 64, "n_head": 2,
    }

    x060 = {
        "rwkv.emb.weight": z((512, 128)),  # combined-checkpoint prefix
        "rwkv.blocks.0.att.time_maa_x": z((1, 1, 128)),
        "rwkv.blocks.0.att.time_faaaa": z((2, 64)),
        "rwkv.blocks.0.att.ln_x.weight": z((128,)),
        "rwkv.blocks.0.att.gate.weight": z((128, 128)),
    }
    assert detect_rwkv_version(x060)["version"] == "x060"
    assert detect_rwkv_version(x060)["head_size"] == 64

    x070 = {
        "emb.weight": z((512, 128)),
        "blocks.0.att.r_k": z((2, 64)),
        "blocks.0.att.w0": z((1, 1, 128)),
        "blocks.0.att.ln_x.weight": z((128,)),
        "blocks.3.att.r_k": z((2, 64)),
    }
    info7 = detect_rwkv_version(x070)
    assert info7["version"] == "x070" and info7["n_layer"] == 4

    x040 = {
        "emb.weight": z((512, 128)),
        "blocks.0.att.time_decay": z((128,)),  # v4: 1-D, no ln_x
        "blocks.0.att.time_first": z((128,)),
    }
    info4 = detect_rwkv_version(x040)
    assert info4["version"] == "x040"
    assert info4["n_head"] == 1 and info4["head_size"] == 128


def test_detect_rwkv_version_combined_and_order_independent():
    """Regressions: (a) combined VisualRWKV checkpoints carry vision keys like
    'vit.dino_featurizer.blocks.0...' which must not crash the layer parse or
    inflate n_layer; (b) detection must not depend on state-dict insertion
    order (a block's time_decay may precede its ln_x/gate keys)."""
    z = np.zeros
    combined = {
        "rwkv.emb.weight": z((512, 128)),
        "rwkv.blocks.0.att.r_k": z((2, 64)),
        "rwkv.blocks.0.att.w0": z((1, 1, 128)),
        "rwkv.blocks.1.att.r_k": z((2, 64)),
        "vit.dino_featurizer.blocks.0.attn.qkv.weight": z((96, 32)),
        "vit.dino_featurizer.blocks.11.attn.qkv.weight": z((96, 32)),
        "proj.o_proj.weight": z((128, 3200)),
    }
    info = detect_rwkv_version(combined)
    assert info["version"] == "x070" and info["n_layer"] == 2

    # single-block v5.2 with time_decay FIRST: order-dependent scanning would
    # read it while version is still 4.x and miss the 2-D-shape promotion
    x052_reordered = {
        "blocks.0.att.time_decay": z((2, 64)),
        "blocks.0.att.time_faaaa": z((2, 64)),
        "blocks.0.att.gate.weight": z((128, 128)),
        "blocks.0.att.ln_x.weight": z((128,)),
        "emb.weight": z((512, 128)),
    }
    info = detect_rwkv_version(x052_reordered)
    assert info["version"] == "x052" and info["head_size"] == 64
