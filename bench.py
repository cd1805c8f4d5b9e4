"""Headline benchmark: batched O(1) decode throughput of VisualRWKV-7 1B5 on
one chip (random-init weights in bf16; decode is weight-bandwidth-bound so
throughput is independent of weight values).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 2000 decode tokens/sec/chip (BASELINE.json north star).

Measurement notes (remote-TPU "axon" tunnel): per-call dispatch is ~5-20 ms
and async, so every timed region is forced by fetching a scalar reduced from
the outputs; parameter init is one jitted program (eager init would issue
thousands of tunnel round-trips).
"""

import functools
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

_PROBE = "import jax, jax.numpy as jnp; x = jnp.ones((256, 256)); (x @ x).block_until_ready()"

# one name for the headline metric: the tunnel-down error line must carry the
# SAME metric key the success path reports, or driver parsing silently breaks
METRIC = "decode_tokens_per_sec_per_chip_1B5_int8_bf16state_B32"


def wait_for_tpu(max_wait_s: float | None = None, interval_s: float = 60.0) -> None:
    """The remote-TPU tunnel goes UNAVAILABLE for stretches and recovers on
    its own; probe it in a SUBPROCESS (a failed in-process backend init
    sticks for the interpreter's lifetime) and wait before measuring.

    If the tunnel never comes back, print ONE parseable JSON line (the
    driver's contract: a real number or a machine-readable reason) before
    raising. Wait budget tunable via BENCH_MAX_WAIT_S (default 900s, so a
    dead tunnel cannot consume the whole driver window as in round 2)."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("BENCH_MAX_WAIT_S", "900"))
    start = time.time()
    deadline = start + max_wait_s
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", _PROBE], timeout=240, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
            if time.time() > deadline:
                print(json.dumps({
                    "metric": METRIC,
                    "value": None,
                    "unit": "tokens/s/chip",
                    "vs_baseline": None,
                    "error": "tpu_tunnel_down",
                    "waited_s": round(time.time() - start, 1),
                }), flush=True)
                raise RuntimeError(
                    "TPU tunnel unavailable for %.0f min; refusing to record "
                    "a garbage benchmark" % (max_wait_s / 60)
                )
            print(
                "bench: TPU probe failed, retrying in %.0fs" % interval_s,
                file=sys.stderr, flush=True,
            )
            time.sleep(interval_s)


def measure_vision_suite(cfg=None, reps: int = 15, drop: int = 5,
                         enc_batch: int = 8, enc_reps: int = 5) -> dict:
    """One flagship 1B5 assembly build -> three driver-recorded numbers:
    p50 TTFT for a 336px and a 448px input image (the north-star gate is
    <=150 ms @336), and batched image-encode throughput (images/sec through
    resize -> DINOv2-L/SigLIP/SAM-B -> projector at 448px, batch 8 — the
    north star's "prefill images/sec"). Sharing the params across the three
    legs avoids re-initializing the 2.3B-param assembly (reference protocol
    app/benchmark_gpu.py:121-148). ``cfg`` overrides the flagship geometry
    (the driver-contract smoke passes a tiny triple-tower config)."""
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.conversation import IMAGE_TOKEN_INDEX
    from visualrwkv_tpu.data.transforms import resize_images
    from visualrwkv_tpu.models.visualrwkv import (
        encode_images,
        init_visualrwkv_params,
        vlm_forward,
    )

    if cfg is None:
        cfg = VLMConfig(
            rwkv=RWKVConfig(n_layer=24, n_embd=2048, vocab_size=65536,
                            head_size=64, compute_dtype="bfloat16",
                            ctx_len=2048),
            vision=VisionConfig(),
            proj_type="mlp",
            num_token_per_image=1024,
        )

    def init_bf16(key):
        p = init_visualrwkv_params(key, cfg)
        return jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)

    params = jax.jit(init_bf16)(jax.random.PRNGKey(0))
    tower_sizes = {
        t: (cfg.vision.sam_image_size if t == "sam" else cfg.vision.image_size)
        for t in cfg.vision.towers
    }

    @jax.jit
    def first_token(params, img, ids):
        images = {t: resize_images(img, s) for t, s in tower_sizes.items()}
        logits = vlm_forward(params, cfg, ids, images)
        return jnp.argmax(logits[:, -1], axis=-1)

    ids_np = np.full((1, cfg.num_token_per_image + 32), 7, np.int32)
    ids_np[:, : cfg.num_token_per_image] = IMAGE_TOKEN_INDEX
    ids = jnp.asarray(ids_np)
    out = {}
    rng = np.random.default_rng(0)
    for px in (336, 448):
        img = jnp.asarray(rng.integers(0, 256, (1, px, px, 3), np.uint8))
        lat = []
        for _ in range(reps):
            t0 = time.time()
            int(first_token(params, img, ids)[0])
            lat.append(time.time() - t0)
        lat = sorted(lat[drop:])
        out[f"ttft_p50_ms_{px}px"] = round(lat[len(lat) // 2] * 1e3, 1)

    B_img = enc_batch
    img = jnp.asarray(rng.integers(0, 256, (B_img, 448, 448, 3), np.uint8))

    @jax.jit
    def encode(params, img):
        images = {t: resize_images(img, s) for t, s in tower_sizes.items()}
        f = encode_images(params, cfg, images)
        return jnp.sum(f.astype(jnp.float32))

    float(encode(params, img))
    t0 = time.time()
    for _ in range(enc_reps):
        s = encode(params, img)
    float(s)
    out["images_per_sec_encode_448"] = round(
        B_img * enc_reps / (time.time() - t0), 2
    )
    return out


def measure_decode_7b_x060(B: int = 16, T: int = 128) -> float:
    """7B RWKV-6 (BASELINE configs[3] geometry: L32 D4096) int8 weight-only
    decode with bf16-carried states on ONE chip. init + quantize run fused in
    a single jit so the 28 GB fp32 init tree never materializes."""
    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.infer.quant import quantize_lm_params
    from visualrwkv_tpu.models import lm

    cfg = RWKVConfig(n_layer=32, n_embd=4096, vocab_size=65536, head_size=64,
                     compute_dtype="bfloat16", ctx_len=2048, version="x060")

    @jax.jit
    def init_q(key):
        return quantize_lm_params(lm.init_lm_params(key, cfg))

    params = init_q(jax.random.PRNGKey(0))

    @jax.jit
    def decode(params, first_logits, states):
        def body(carry, _):
            logits, st = carry
            tok = jnp.argmax(logits, axis=-1)
            logits, st = lm.lm_decode_step(params, cfg, tok, st)
            return (logits.astype(jnp.float32), st), tok

        (logits, states), toks = jax.lax.scan(
            body, (first_logits, states), None, length=T
        )
        return jnp.sum(toks), logits, states

    fl = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    st = lm.init_lm_state(cfg, B)
    st = [s._replace(wkv=s.wkv.astype(jnp.bfloat16)) for s in st]
    ssum, lg, st2 = decode(params, fl, st)
    int(ssum)
    reps = 3
    lg, st2 = fl, st
    t0 = time.time()
    for _ in range(reps):
        ssum, lg, st2 = decode(params, lg, st2)
    int(ssum)
    return round(B * T * reps / (time.time() - t0), 1)


def measure_ttft_336px(cfg=None, reps: int = 15, drop: int = 5,
                       input_px: int = 336) -> float:
    """p50 time-to-first-token for ONE 336px image through the flagship 1B5
    assembly: device-side resize (336 -> 448/448/1024) + normalize ->
    DINOv2-L/SigLIP-SO400M/SAM-B encode (Pallas flash attention) ->
    gated-MLP projector -> token scatter -> RWKV-7 prefill (1024 image +
    32 text tokens) -> argmax first token. Protocol: 15 reps, drop the
    first 5, p50 (reference app/benchmark_gpu.py:121-148); the BASELINE
    north-star gate is <= 150 ms."""
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.conversation import IMAGE_TOKEN_INDEX
    from visualrwkv_tpu.data.transforms import resize_images
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params, vlm_forward

    if cfg is None:
        cfg = VLMConfig(
            rwkv=RWKVConfig(n_layer=24, n_embd=2048, vocab_size=65536,
                            head_size=64, compute_dtype="bfloat16", ctx_len=2048),
            vision=VisionConfig(),  # flagship triple tower @448 + SAM-1024
            proj_type="mlp",
            num_token_per_image=1024,
        )

    # init + bf16 cast in ONE jitted program so the fp32 intermediates of the
    # ~2.3B-param assembly never coexist with the bf16 copy in HBM
    def init_bf16(key):
        p = init_visualrwkv_params(key, cfg)
        return jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)

    params = jax.jit(init_bf16)(jax.random.PRNGKey(0))

    tower_sizes = {
        t: (cfg.vision.sam_image_size if t == "sam" else cfg.vision.image_size)
        for t in cfg.vision.towers
    }

    @jax.jit
    def first_token(params, img336, ids):
        images = {t: resize_images(img336, s) for t, s in tower_sizes.items()}
        logits = vlm_forward(params, cfg, ids, images)
        return jnp.argmax(logits[:, -1], axis=-1)

    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 336, 336, 3), np.uint8)
    )
    ids_np = np.full((1, cfg.num_token_per_image + 32), 7, np.int32)
    ids_np[:, : cfg.num_token_per_image] = IMAGE_TOKEN_INDEX
    ids = jnp.asarray(ids_np)

    lat = []
    for _ in range(reps):
        t0 = time.time()
        int(first_token(params, img, ids)[0])
        lat.append(time.time() - t0)
    lat = sorted(lat[drop:])
    return round(lat[len(lat) // 2] * 1e3, 1)


def measure_decode() -> dict:
    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models import rwkv7

    # VisualRWKV-7 1B5 LM geometry (RWKV-x070-World 1.5B: L24 D2048)
    cfg = RWKVConfig(
        n_layer=24, n_embd=2048, vocab_size=65536, head_size=64,
        compute_dtype="bfloat16", ctx_len=2048,
    )
    init = jax.jit(functools.partial(rwkv7.init_rwkv7_params, cfg=cfg))
    params_f32 = init(jax.random.PRNGKey(0))
    params = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    )(params_f32)
    from visualrwkv_tpu.infer.quant import quantize_lm_params

    params_i8 = jax.jit(quantize_lm_params)(params_f32)

    B = 32
    PREFILL_B, PREFILL_T = 8, 512
    DECODE_T = 128

    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (PREFILL_B, PREFILL_T), 0, 65000
    )

    @jax.jit
    def prefill(params, tokens):
        logits, states = rwkv7.rwkv7_forward_tokens(params, cfg, tokens)
        return jnp.sum(logits[:, -1].astype(jnp.float32)), logits[:, -1], states

    @jax.jit
    def decode(params, first_logits, states):
        def body(carry, _):
            logits, st = carry
            tok = jnp.argmax(logits, axis=-1)
            logits, st = rwkv7.rwkv7_decode_step(params, cfg, tok, st)
            return (logits.astype(jnp.float32), st), tok

        (_, states), toks = jax.lax.scan(
            body, (first_logits, states), None, length=DECODE_T
        )
        return jnp.sum(toks), toks

    # warmup/compile (scalar fetch forces completion through the async tunnel)
    s, fl, st = prefill(params, tokens)
    float(s)
    fl32 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    st32 = rwkv7.init_state(cfg, B)
    ssum, _ = decode(params, fl32, st32)
    int(ssum)

    t0 = time.time()
    reps = 5
    for _ in range(reps):
        s, fl, st = prefill(params, tokens)
    float(s)
    prefill_s = (time.time() - t0) / reps

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        ssum, _ = decode(params, fl32, st32)
    int(ssum)
    decode_s = (time.time() - t0) / reps

    # int8 weight-only serving config (the reference ships int8 serving too)
    ssum, _ = decode(params_i8, fl32, st32)
    int(ssum)
    t0 = time.time()
    for _ in range(reps):
        ssum, _ = decode(params_i8, fl32, st32)
    int(ssum)
    decode_i8_s = (time.time() - t0) / reps

    # + bf16-carried WKV state ("tpu bf16i8 s16" serving strategy): the state
    # is the dominant decode HBM term at B=32; the reference's fp16 serving
    # strategies also carry half-precision states (app/modeling_rwkv.py atype).
    # Greedy-decode parity with fp32 states is regression-tested
    # (tests/test_engine.py::test_bf16_state_decode_matches_fp32).
    st16 = [s._replace(wkv=s.wkv.astype(jnp.bfloat16)) for s in st32]
    ssum, _ = decode(params_i8, fl32, st16)
    int(ssum)
    t0 = time.time()
    for _ in range(reps):
        ssum, _ = decode(params_i8, fl32, st16)
    int(ssum)
    decode_i8s16_s = (time.time() - t0) / reps

    tok_per_s = B * DECODE_T / decode_i8s16_s
    baseline = 2000.0
    return {
        "metric": METRIC,
        "value": round(tok_per_s, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_s / baseline, 3),
        "extra": {
            "decode_tok_per_s_int8_fp32state_B32": round(B * DECODE_T / decode_i8_s, 1),
            "decode_tok_per_s_bf16_B32": round(B * DECODE_T / decode_s, 1),
            "prefill_tok_per_s_B8_T512": round(PREFILL_B * PREFILL_T / prefill_s, 1),
            "decode_ms_per_step": round(decode_i8s16_s / DECODE_T * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }


def measure_spec_decode_small_draft(B: int = 1, prompt_T: int = 32,
                                    max_new: int = 256,
                                    ks: tuple = (8, 16, 24),
                                    reps: int = 3) -> dict:
    """Two-checkpoint speculative decoding at deployment shape: a SEPARATE
    0B1-geometry draft (L12 D768, int8 — the released-family small model,
    reference MODEL_ZOO.md) proposing for the 1B5 bf16 target, swept over k.

    Random weights measure the MECHANICS faithfully (round latency is
    weight-bandwidth-bound, independent of values) but an untrained separate
    draft agrees with the target near-never, so the measured acceptance
    floors at ~0 and tok/s shows the worst case. To expose the ceiling a
    TRAINED draft would reach, each k also reports
    ``spec_small_ceiling_tok_per_s_k{k}``: committed tokens/round replaced
    by the int8 SELF-draft's measured acceptance at the same k (the two
    agreement distributions bound deployment from above/below) over the
    MEASURED small-draft round time. The engine path itself is exercised
    end-to-end (tests/test_speculative.py::test_separate_small_draft_*)."""
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.infer.quant import quantize_lm_params
    from visualrwkv_tpu.infer.speculative import SpeculativeEngine
    from visualrwkv_tpu.models import rwkv7

    tcfg = RWKVConfig(n_layer=24, n_embd=2048, vocab_size=65536, head_size=64,
                      compute_dtype="bfloat16", ctx_len=2048)
    dcfg = RWKVConfig(n_layer=12, n_embd=768, vocab_size=65536, head_size=64,
                      compute_dtype="bfloat16", ctx_len=2048)
    vcfg_t = VLMConfig(rwkv=tcfg, vision=VisionConfig(towers=()),
                       proj_type="linear", num_token_per_image=1)
    vcfg_d = VLMConfig(rwkv=dcfg, vision=VisionConfig(towers=()),
                       proj_type="linear", num_token_per_image=1)

    target = {"rwkv": jax.jit(
        lambda key: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            rwkv7.init_rwkv7_params(key, cfg=tcfg),
        )
    )(jax.random.PRNGKey(0))}
    draft = {"rwkv": jax.jit(
        lambda key: quantize_lm_params(rwkv7.init_rwkv7_params(key, cfg=dcfg))
    )(jax.random.PRNGKey(7))}

    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (B, prompt_T), 1, 65000)
    )
    eng = InferenceEngine(target, vcfg_t)

    def timed(fn):
        fn()
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        return (time.time() - t0) / reps, out

    plain_s, _ = timed(lambda: eng.generate(
        ids, max_new_tokens=max_new, do_sample=False, stop_tokens=()))
    out = {"spec_small_plain_tok_per_s": round(B * max_new / plain_s, 1)}
    # int8 SELF-draft acceptance per k: the trained-draft agreement proxy
    self_acc = {8: 0.81, 12: 0.78, 16: 0.74, 24: 0.66}  # measured r4, v5e
    for k in ks:
        spec = SpeculativeEngine(target, vcfg_t, draft, vcfg_d, k=k)
        spec_s, s = timed(lambda: spec.generate(
            ids, max_new_tokens=max_new, stop_tokens=()))
        acc = float(s.accepted.sum()) / max(1, s.rounds * k * B)
        out[f"spec_small_tok_per_s_k{k}"] = round(B * max_new / spec_s, 1)
        out[f"spec_small_acceptance_k{k}"] = round(acc, 3)
        # ceiling: measured round time at this k (t_round = spec_s/rounds)
        # with the proxy acceptance a: ~k*a+1 committed tokens per round
        a = self_acc.get(k, 0.7)
        out[f"spec_small_ceiling_tok_per_s_k{k}"] = round(
            (k * a + 1.0) * s.rounds / spec_s, 1
        )
    return out


def measure_spec_decode(B: int = 1, prompt_T: int = 32, max_new: int = 256,
                        k: int = 12, reps: int = 3) -> dict:
    """Speculative decoding at the single-stream latency point (1B5 x070):
    bf16 target + int8 SELF-draft vs plain greedy decode. B=1 decode is
    weight-bandwidth-bound (~1 token per 3 GB weight read); the verify pass
    amortizes one read over k+1 positions, so committed-prefix acceptance
    converts directly into single-stream speedup (infer/speculative.py; the
    reference serves strictly one token per read, app/modeling_rwkv.py:1007).
    Acceptance is measured, not assumed — random-init int8-vs-bf16 greedy
    agreement is reported alongside the throughput. k sweep (v5e, this
    config): k=8 1.17x, k=12 1.20x (default), k=16 1.12x, k=24 0.99x —
    the int8 self-draft costs ~half a target step, so long windows pay
    more in draft serial time than the amortized verify saves; a smaller
    trained draft (0B1/0B4) raises the ceiling at deployment."""
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.infer.quant import quantize_lm_params
    from visualrwkv_tpu.infer.speculative import SpeculativeEngine
    from visualrwkv_tpu.models import rwkv7

    rcfg = RWKVConfig(n_layer=24, n_embd=2048, vocab_size=65536, head_size=64,
                      compute_dtype="bfloat16", ctx_len=2048)
    cfg = VLMConfig(rwkv=rcfg, vision=VisionConfig(towers=()),
                    proj_type="linear", num_token_per_image=1)
    init = jax.jit(functools.partial(rwkv7.init_rwkv7_params, cfg=rcfg))
    p32 = init(jax.random.PRNGKey(0))
    target = {"rwkv": jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    )(p32)}
    draft = {"rwkv": jax.jit(quantize_lm_params)(p32)}

    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (B, prompt_T), 1, 65000)
    )
    eng = InferenceEngine(target, cfg)
    spec = SpeculativeEngine(target, cfg, draft, cfg, k=k)

    def timed(fn):
        fn()  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        return (time.time() - t0) / reps, out

    plain_s, _ = timed(lambda: eng.generate(
        ids, max_new_tokens=max_new, do_sample=False, stop_tokens=()))
    spec_s, s = timed(lambda: spec.generate(
        ids, max_new_tokens=max_new, stop_tokens=()))
    acc = float(s.accepted.sum()) / max(1, s.rounds * k * B)
    return {
        "decode_tok_per_s_1B5_B1_bf16_plain": round(B * max_new / plain_s, 1),
        "spec_decode_tok_per_s_1B5_B1_int8draft": round(B * max_new / spec_s, 1),
        "spec_acceptance_rate": round(acc, 3),
        "spec_speedup_B1": round(plain_s / spec_s, 2),
    }


def measure_train_step_0b4(x: int = 16, rounds: int = 2, n_layer: int = 24,
                           n_embd: int = 1024, micro_bsz: int = 2,
                           accum: int = 4, T: int = 2048,
                           vocab_size: int = 65536, version: str = "x070",
                           optim_precision: str = "master_fp32",
                           stacked: bool = True, grad_cp=True,
                           ce_chunk_t: int = 512) -> float:
    """Steady-state text-only training throughput (tok/s/chip). Default
    geometry is 0B4 RWKV-7 L24/C1024: bf16 params + fp32 masters, stacked
    layout, per-block remat, fused two-level WKV kernels, micro-batch 2 x
    in-jit grad-accum 4 (global batch 8 @ T2048 — the measured per-token
    optimum: the B2 activation working set runs ~28%% faster than the same
    tokens as one B8 batch). `version`/`optim_precision` parameterize the
    v6-family and 1B5 bf16_sr bench legs (stacked is x070-only; the trainer
    falls back to the list layout for other versions)."""
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.train.trainer import Trainer

    vlm_cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=n_layer, n_embd=n_embd, ctx_len=T,
                        vocab_size=vocab_size, version=version),
        vision=VisionConfig(towers=()),
    )
    cfg = TrainConfig(
        micro_bsz=micro_bsz, accumulate_grad_batches=accum,
        param_dtype="bfloat16", stacked_layers=stacked, grad_cp=grad_cp,
        optim_precision=optim_precision, ce_chunk_t=ce_chunk_t,
        epoch_steps=100, epoch_count=1,
    )
    # init DIRECTLY in the training dtype inside one jit program: the fp32
    # init tree (5.7 GB at 1B5) must never exist on device — the split-step
    # trainer AOT pre-loads its executables at construction time and the
    # 2026-08-20 runtime refuses loads without generous free HBM
    pd = jnp.dtype(cfg.param_dtype)

    def _init_cast(key):
        tree = init_visualrwkv_params(key, vlm_cfg)
        return jax.tree_util.tree_map(
            lambda p: p.astype(pd)
            if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
            tree,
        )

    params = jax.jit(_init_cast)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    tr = Trainer(vlm_cfg, cfg, params, proj_dir="/tmp/bench_train", log_every=10**9)
    del params

    rng = np.random.default_rng(0)
    eff = micro_bsz * accum
    ids = jnp.asarray(rng.integers(0, vocab_size, (eff, T)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, vocab_size, (eff, T)), jnp.int32)
    batch = {"input_ids": ids, "labels": labels, "images": None}

    p_, o_, s_ = tr.state.params, tr.state.opt_state, tr.state.step
    step_fn = tr.train_step
    # drop the Trainer's references to the initial params/opt tree: at 1B5
    # they would pin ~3 GB of stale bf16 params across the whole loop (the
    # opt program's own peak is 15.06/15.75 GB — no room for leaks)
    tr.state = None
    p_, o_, s_, loss = step_fn(p_, o_, s_, batch)
    float(loss)
    best = 0.0
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(x):
            p_, o_, s_, loss = step_fn(p_, o_, s_, batch)
        float(loss)  # one scalar fetch syncs the whole chain
        best = max(best, eff * T * x / (time.time() - t0))
    return round(best, 1)


# Leg registry. Every leg runs in its OWN subprocess: round 4 proved the
# HBM-edge legs (1B5 bf16_sr train peaks 15.06/15.75 GB) OOM when run after
# earlier legs in one process even with jax.clear_caches() between them —
# the residue is allocator fragmentation / executable-pinned memory the
# in-process scrub cannot reach (the live-array forensics never fired).
# A fresh process per leg gets the chip's full HBM; the ORCHESTRATING
# process never initializes the TPU backend at all.
LEGS = {
    # headline: 1B5 int8 batched decode (+prefill, bf16 variants)
    "decode": measure_decode,
    # image-inclusive TTFT @336/448 + batched encode throughput (BASELINE
    # gate <= 150 ms @336px; north-star "prefill images/sec")
    "vision": measure_vision_suite,
    # 0B4 training throughput (driver-recorded evidence for train claims).
    # ce_chunk_t=2048 (=T, one CE chunk): the round-5 profiler traced the
    # fp32 [C,vocab] head-wgrad accumulator at 51 ms/step of pure re-read/
    # re-write traffic at chunk 128; one chunk per micro-step removes it
    # (measured +6.1%, 19,143 -> 20,313 tok/s, 36.0% MFU). The 1.07 GB
    # fp32 logits buffer this costs is free at 0B4 geometry only, so it is
    # per-leg here, not the TrainConfig default (128, safe at the 1B5 edge
    # where even 512's 268 MB chunk OOMs - measured).
    "train_tok_per_s_0B4_B2a4": lambda: measure_train_step_0b4(
        ce_chunk_t=2048
    ),
    # v6-family training (the published-paper backbone) at the same geometry
    "train_tok_per_s_0B4_x060": lambda: measure_train_step_0b4(
        x=8, version="x060", stacked=False, ce_chunk_t=2048
    ),
    # 1B5 training on ONE chip via the master-less bf16_sr optimizer.
    # List layout: the stacked tree's whole-depth [23, ...] gradient leaves
    # push compile-time HBM to 16.59G/15.75G at this scale (64.5% HLO-temp
    # fragmentation), while the per-layer list leaves free early and fit.
    # ce_chunk_t stays 128 here: 512's 268 MB logits chunk OOMs this
    # 15.06/15.75 GB config (measured 2026-08-20).
    "train_tok_per_s_1B5_bf16sr": lambda: measure_train_step_0b4(
        x=8, n_embd=2048, optim_precision="bf16_sr", stacked=False,
        ce_chunk_t=128
    ),
    # NOT in _LEG_ENV: spawned by main() only as the documented fallback
    # when the full-geometry 1B5 leg exhausts its retries. T=1024 halves
    # the backward working set (~2 GB of slack instead of ~0.3), trading
    # some efficiency; reported under its own key, never as the full leg.
    "train_tok_per_s_1B5_bf16sr_T1024": lambda: {
        "train_tok_per_s_1B5_bf16sr_T1024": measure_train_step_0b4(
            x=8, n_embd=2048, optim_precision="bf16_sr", stacked=False,
            ce_chunk_t=128, T=1024,
        )
    },
    # speculative decoding at the single-stream latency point (bf16 1B5 +
    # int8 self-draft; measured acceptance, lossless greedy)
    "spec_decode": measure_spec_decode,
    # two-checkpoint spec decode: separate 0B1-geometry int8 draft + k sweep
    "spec_decode_small_draft": measure_spec_decode_small_draft,
    # 7B x060 int8 serving (BASELINE configs[3]); biggest HBM leg
    "decode_tok_per_s_7B_x060_int8": measure_decode_7b_x060,
}

_LEG_ENV = {
    "vision": "BENCH_TTFT",
    "train_tok_per_s_0B4_B2a4": "BENCH_TRAIN",
    "train_tok_per_s_0B4_x060": "BENCH_TRAIN_X060",
    "train_tok_per_s_1B5_bf16sr": "BENCH_TRAIN_1B5",
    "spec_decode": "BENCH_SPEC",
    "spec_decode_small_draft": "BENCH_SPEC_SMALL",
    "decode_tok_per_s_7B_x060_int8": "BENCH_7B",
}

_CHILD_JSON_TAG = "BENCH_LEG_RESULT:"


def run_leg_child(name: str) -> None:
    """Child mode (``bench.py --leg NAME``): run one measurement and print a
    tagged JSON line. Tagged so stray library prints cannot be mistaken for
    the result; the parent scans stdout for the tag.

    BENCH_FAKE_LEG_JSON/_SIGNAL short-circuit the measurement so the
    driver-contract tests can exercise the real subprocess plumbing (parse,
    crash, merge) without a TPU."""
    fake = os.environ.get("BENCH_FAKE_LEG_JSON")
    if fake is not None:
        sig = os.environ.get("BENCH_FAKE_LEG_SIGNAL")
        if sig:
            os.kill(os.getpid(), int(sig))
        print(_CHILD_JSON_TAG + fake, flush=True)
        return
    if os.environ.get("BENCH_COMPILE_CACHE", "1") == "1":
        # persistent executable cache for the TPU legs: the per-leg fresh
        # subprocesses (HBM isolation) otherwise recompile everything every
        # round — measured 85 s -> 3.1 s for a cached program over the
        # axon tunnel. Fail-soft: cache trouble must never cost a leg.
        try:
            from visualrwkv_tpu.utils.jax_cache import tpu_cache_dir

            jax.config.update(
                "jax_compilation_cache_dir",
                tpu_cache_dir(os.path.dirname(os.path.abspath(__file__))),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:
            pass
    out = LEGS[name]()
    print(_CHILD_JSON_TAG + json.dumps(out), flush=True)


def _spawn_leg(name: str, timeout_s: float):
    """Run one leg in a fresh interpreter; returns (parsed_json_or_None,
    error_string_or_None)."""
    env = dict(os.environ)
    env["BENCH_SKIP_PROBE"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", name],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s:.0f}s"
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_CHILD_JSON_TAG):
            try:
                return json.loads(line[len(_CHILD_JSON_TAG):]), None
            except json.JSONDecodeError as e:
                return None, f"unparseable leg output: {e}"
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    tail = "; ".join(tail[-3:])[-280:]
    return None, f"rc={proc.returncode}: {tail}"


def main():
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        wait_for_tpu()
    t_start = time.time()
    # 4200s: the per-leg fresh subprocesses (round-5, HBM isolation) pay
    # per-leg compiles that one shared process amortized; the round-4
    # driver capture ran 1756s in-process and the full 9-leg subprocess
    # rehearsal measured ~55 min cold. wait_for_tpu still caps a dead
    # tunnel at 900s, so the worst case stays bounded.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "4200"))

    # headline leg first; its failure must still yield ONE parseable line
    headline, err = _spawn_leg("decode", min(budget_s, 1500.0))
    if headline is None:
        result = {
            "metric": METRIC, "value": None, "unit": "tokens/s/chip",
            "vs_baseline": None, "error": err, "extra": {},
        }
    else:
        result = headline
    extra = result.setdefault("extra", {})

    # optional legs in increasing-memory order, each gated by an env var AND
    # a global soft budget so a degraded tunnel cannot eat the driver's whole
    # window; every failure/skip is recorded machine-readably.
    # retries: the 2026-08-20 runtime keeps executable temp arenas resident
    # and the full-geometry 1B5 leg fits with only ~300 MB of slack, so it
    # fails nondeterministically; a retry (fresh chip state) often lands it,
    # and a documented half-T fallback records SOMETHING numeric for the
    # 1B5-on-one-chip claim when the full geometry will not go.
    _RETRIES = {"train_tok_per_s_1B5_bf16sr": 1}
    _FALLBACK = {
        "train_tok_per_s_1B5_bf16sr": "train_tok_per_s_1B5_bf16sr_T1024",
    }
    for name, env_var in _LEG_ENV.items():
        if os.environ.get(env_var, "1") != "1":
            continue
        elapsed = time.time() - t_start
        if elapsed > budget_s:
            extra[f"{name}_skipped"] = "budget"
            continue
        attempts = 1 + _RETRIES.get(name, 0)
        out = err = None
        for _ in range(attempts):
            out, err = _spawn_leg(
                name, max(180.0, budget_s - (time.time() - t_start))
            )
            if out is not None:
                break
        if out is None and name in _FALLBACK and (
            time.time() - t_start
        ) < budget_s:
            extra[f"{name}_error"] = err
            out, err = _spawn_leg(
                _FALLBACK[name],
                max(180.0, budget_s - (time.time() - t_start)),
            )
        if out is None:
            extra[f"{name}_error"] = err
        elif isinstance(out, dict):
            out.pop("extra", None)
            extra.update(out)
        else:
            extra[name] = out

    extra["bench_total_s"] = round(time.time() - t_start, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        run_leg_child(sys.argv[2])
    else:
        main()
