"""Inference engine tests: O(1)-state greedy decode must match the naive
O(T^2) full-recompute decode (the reference's generate semantics); stop-token
masking; multi-round state chaining; image-state cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
from visualrwkv_tpu.infer.engine import InferenceEngine
from visualrwkv_tpu.models import rwkv7
from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
from visualrwkv_tpu.vision.vit import ViTConfig


@pytest.fixture(scope="module")
def setup():
    tiny_vit = ViTConfig(
        img_size=16, patch_size=8, width=32, depth=1, heads=2, mlp_dim=64,
        use_cls=False, num_reg=0, layerscale=False,
    )
    cfg = VLMConfig(
        rwkv=RWKVConfig(
            n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
            compute_dtype="float32", ctx_len=256,
        ),
        vision=VisionConfig(
            towers=("dino",), image_size=16, dino_dim=32,
            tower_config_overrides={"dino": tiny_vit},
        ),
        proj_type="linear",
        num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, InferenceEngine(params, cfg)


def naive_greedy(params, cfg, ids, n_new):
    """Reference-style generate: full forward per token (src/model.py:496-530)."""
    ids = jnp.asarray(ids)
    out = []
    for _ in range(n_new):
        logits, _ = rwkv7.rwkv7_forward_tokens(params["rwkv"], cfg.rwkv, ids)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        out.append(int(nxt[0]))
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
    return out


@pytest.mark.slow
def test_engine_matches_naive_greedy(setup):
    cfg, params, engine = setup
    prompt = np.array([[11, 22, 33, 44, 55, 66, 77]])
    n = 8
    res = engine.generate(prompt, max_new_tokens=n, stop_tokens=(-1,))
    want = naive_greedy(params, cfg, prompt, n)
    assert list(res.tokens[0][:n]) == want
    assert res.lengths[0] == n
    assert np.all(np.isfinite(res.logits[0])) and np.all(res.probs[0] > 0)


def test_stop_token_masks_tail(setup):
    cfg, params, engine = setup
    prompt = np.array([[11, 22, 33]])
    free = engine.generate(prompt, max_new_tokens=6, stop_tokens=(-1,))
    stop_at = int(free.tokens[0][2])  # force a stop on the 3rd token
    res = engine.generate(prompt, max_new_tokens=6, stop_tokens=(stop_at,))
    assert res.lengths[0] == 3
    # everything after the stop is the pad/stop filler
    assert all(int(t) == 261 for t in res.tokens[0][3:])


@pytest.mark.slow
def test_multi_round_state_chaining(setup):
    cfg, params, engine = setup
    full = np.array([[11, 22, 33, 44, 55, 66]])
    logits_full, _ = engine.prefill_ids(full)
    # round 1 then round 2 continuing from the returned state
    _, st = engine.prefill_ids(full[:, :2])
    logits_chained, _ = engine.prefill_ids(full[:, 2:], states=st)
    np.testing.assert_allclose(
        np.asarray(logits_chained), np.asarray(logits_full), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_image_state_cache(setup):
    cfg, params, engine = setup
    images = {"dino": np.zeros((1, 16, 16, 3), np.uint8)}
    s1 = engine.compute_image_state(images)
    s2 = engine.compute_image_state(images)
    assert s1 is s2  # cache hit by content hash
    assert len(engine._state_cache) == 1
    # generation from an image state runs and yields tokens
    res = engine.generate(np.array([[11, 22]]), states=s1, max_new_tokens=3,
                          stop_tokens=(-1,))
    assert res.tokens.shape == (1, 3)


@pytest.mark.slow
def test_engine_x060_and_quant():
    """The engine serves x060 models and int8-quantized params."""
    from visualrwkv_tpu.infer.quant import quantize_lm_params

    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
                        compute_dtype="float32", ctx_len=256, version="x060"),
        vision=VisionConfig(towers=()),
        proj_type="linear", num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(params, cfg)
    res = engine.generate(np.array([[11, 22, 33]]), max_new_tokens=4, stop_tokens=(-1,))
    assert res.tokens.shape == (1, 4)

    qparams = dict(params)
    qparams["rwkv"] = quantize_lm_params(params["rwkv"], min_size=64 * 64)
    engine_q = InferenceEngine(qparams, cfg)
    res_q = engine_q.generate(np.array([[11, 22, 33]]), max_new_tokens=4, stop_tokens=(-1,))
    assert res_q.tokens.shape == (1, 4)


@pytest.mark.slow
def test_bf16_state_decode_matches_fp32(setup):
    """Serving with state_dtype=bfloat16 (halved decode state traffic): short
    greedy generations must match the fp32-state engine on a tiny model, and
    the carried WKV state must actually be bf16."""
    cfg, params, engine = setup
    engine_bf = InferenceEngine(params, cfg, state_dtype="bfloat16")
    prompt = np.array([[11, 22, 33, 44, 55, 66, 77]])
    n = 8
    ref = engine.generate(prompt, max_new_tokens=n, stop_tokens=(-1,))
    got = engine_bf.generate(prompt, max_new_tokens=n, stop_tokens=(-1,))
    assert list(got.tokens[0][:n]) == list(ref.tokens[0][:n])
    # logit drift stays small at this horizon
    np.testing.assert_allclose(got.logits[0], ref.logits[0], rtol=0.05, atol=0.05)

    # dtype check at the decode-step level
    states = rwkv7.init_state(cfg.rwkv, 1)
    states = [s._replace(wkv=s.wkv.astype(jnp.bfloat16)) for s in states]
    _, new_states = rwkv7.rwkv7_decode_step(
        params["rwkv"], cfg.rwkv, jnp.array([7]), states
    )
    assert all(s.wkv.dtype == jnp.bfloat16 for s in new_states)


@pytest.mark.slow
def test_batch_sharded_decode_on_mesh(setup):
    """Data-parallel serving: a batch sharded over the 8-device mesh decodes
    to the same tokens as the unsharded engine (GSPMD partitions the whole
    prefill->decode scan per batch row; params replicated)."""
    from visualrwkv_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg, params, engine = setup
    prompts = np.tile(np.array([[11, 22, 33, 44, 55, 66, 77]]), (8, 1))
    prompts = prompts + np.arange(8)[:, None]  # distinct rows
    ref = engine.generate(prompts, max_new_tokens=6, stop_tokens=(-1,))

    mesh = make_mesh(n_data=8)
    sharded = jax.device_put(jnp.asarray(prompts), batch_sharding(mesh))
    got = engine.generate(sharded, max_new_tokens=6, stop_tokens=(-1,))
    np.testing.assert_array_equal(got.tokens, ref.tokens)


@pytest.mark.slow
def test_flat_state_layout_decode_matches_head(setup):
    """state_layout="flat" (lane-flat [B, 64, H*64] decode carry — no TPU
    64->128 lane padding, halves decode state traffic) must produce the same
    greedy generations and near-identical logits as the canonical layout,
    alone and combined with the bf16 state carry."""
    cfg, params, engine = setup
    prompt = np.array([[11, 22, 33, 44, 55, 66, 77]])
    n = 8
    ref = engine.generate(prompt, max_new_tokens=n, stop_tokens=(-1,))
    for dtype in ("float32", "bfloat16"):
        eng = InferenceEngine(params, cfg, state_dtype=dtype, state_layout="flat")
        got = eng.generate(prompt, max_new_tokens=n, stop_tokens=(-1,))
        assert list(got.tokens[0][:n]) == list(ref.tokens[0][:n]), dtype
    np.testing.assert_allclose(got.logits[0], ref.logits[0], rtol=0.05, atol=0.05)

    with pytest.raises(ValueError):
        InferenceEngine(params, cfg, state_layout="diag")


def test_batched_server_matches_engine(setup):
    """Continuous batching (infer/server.py): greedy per-request outputs must
    match InferenceEngine.generate exactly, including when requests queue
    behind a full slot table and are admitted mid-flight."""
    from visualrwkv_tpu.infer.server import BatchedServer

    cfg, params, engine = setup
    prompts = [
        np.array([[11, 22, 33, 44]]),
        np.array([[7, 8, 9, 10, 11, 12]]),
        np.array([[100, 200]]),
    ]
    budgets = [6, 4, 8]
    refs = [
        engine.generate(p, max_new_tokens=n, stop_tokens=(-1,))
        for p, n in zip(prompts, budgets)
    ]

    server = BatchedServer(engine, max_batch=2, stop_tokens=(-1,))
    rids = [server.submit(p, max_new_tokens=n) for p, n in zip(prompts, budgets)]
    results = server.run()
    assert set(results) == set(rids)
    for rid, ref, n in zip(rids, refs, budgets):
        assert results[rid] == list(ref.tokens[0][:n]), rid


@pytest.mark.slow
def test_batched_server_stop_token_retires_slot(setup):
    """A slot that emits a stop token retires early and its slot is reused;
    sampled mode smoke-checks the jitted step with penalties."""
    from visualrwkv_tpu.infer.sampling import SamplingParams
    from visualrwkv_tpu.infer.server import BatchedServer

    cfg, params, engine = setup
    # find the greedy-next token of this prompt and declare it a stop token
    probe = engine.generate(np.array([[5, 6, 7]]), max_new_tokens=1, stop_tokens=(-1,))
    stop_tok = int(probe.tokens[0][0])
    server = BatchedServer(engine, max_batch=1, stop_tokens=(stop_tok,))
    r1 = server.submit(np.array([[5, 6, 7]]), max_new_tokens=50)
    r2 = server.submit(np.array([[9, 9, 9]]), max_new_tokens=3)
    out = server.run()
    assert out[r1] == [stop_tok]  # retired on the first step, not after 50
    assert len(out[r2]) <= 3

    sampled = BatchedServer(
        engine, max_batch=2,
        sp=SamplingParams(temperature=1.0, top_p=0.7, alpha_presence=0.1,
                          alpha_frequency=0.1),
        stop_tokens=(-1,),
    )
    rid = sampled.submit(np.array([[1, 2, 3]]), max_new_tokens=4)
    out = sampled.run()
    assert len(out[rid]) == 4


@pytest.mark.slow
def test_batched_server_honors_state_config(setup):
    """Regression: the server must apply the engine's serving state config
    (bf16 carry, flat layout) to its decode carry — previously the flags
    were silently ignored — and a lazy image callable loads at admission."""
    from visualrwkv_tpu.infer.server import BatchedServer

    cfg, params, engine = setup
    ref = engine.generate(np.array([[3, 4, 5]]), max_new_tokens=5, stop_tokens=(-1,))

    eng = InferenceEngine(params, cfg, state_dtype="bfloat16", state_layout="flat")
    server = BatchedServer(eng, max_batch=2, stop_tokens=(-1,))
    assert server._states[0].wkv.dtype == jnp.bfloat16
    assert server._states[0].wkv.ndim == 3  # flat [B, N, H*N]
    rid = server.submit(np.array([[3, 4, 5]]), max_new_tokens=5)
    out = server.run()
    assert out[rid] == list(ref.tokens[0][:5])

    # lazy images: the callable runs at admission, not submit
    calls = []

    def loader():
        calls.append(1)
        return {"dino": np.zeros((1, 16, 16, 3), np.uint8)}

    rid2 = server.submit(np.array([[9, 9]]), images=loader, max_new_tokens=2)
    assert not calls  # not loaded yet
    server.run()
    assert calls == [1]

    with pytest.raises(ValueError, match="ONE request"):
        server.submit(np.array([[1, 2], [3, 4]]))
