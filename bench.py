"""Headline benchmark: batched O(1) decode throughput of VisualRWKV-7 1B5 on
one chip (random-init weights in bf16; throughput is weight-bandwidth-bound and
independent of weight values).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >= 2000 decode tokens/sec/chip (BASELINE.json north star).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models import rwkv7

    # VisualRWKV-7 1B5 LM geometry (RWKV-x070-World 1.5B: L24 D2048)
    cfg = RWKVConfig(
        n_layer=24, n_embd=2048, vocab_size=65536, head_size=64,
        compute_dtype="bfloat16", ctx_len=2048,
    )
    key = jax.random.PRNGKey(0)
    params = rwkv7.init_rwkv7_params(key, cfg)
    # serve in bf16 (weights dominate decode HBM traffic)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    B = 8
    PREFILL_T = 512
    DECODE_T = 256

    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, PREFILL_T), 0, 65000)

    @jax.jit
    def prefill(params, tokens):
        logits, states = rwkv7.rwkv7_forward_tokens(params, cfg, tokens)
        return logits[:, -1], states

    @jax.jit
    def decode(params, first_logits, states):
        def body(carry, _):
            logits, st = carry
            tok = jnp.argmax(logits, axis=-1)
            logits, st = rwkv7.rwkv7_decode_step(params, cfg, tok, st)
            return (logits, st), tok

        (_, states), toks = jax.lax.scan(
            body, (first_logits, states), None, length=DECODE_T
        )
        return toks, states

    # warmup/compile
    fl, st = jax.block_until_ready(prefill(params, tokens))
    toks, _ = jax.block_until_ready(decode(params, fl, st))

    # timed prefill (TTFT component)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        fl, st = prefill(params, tokens)
    jax.block_until_ready((fl, st))
    prefill_s = (time.time() - t0) / reps

    # timed decode
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        toks, _ = decode(params, fl, st)
    jax.block_until_ready(toks)
    decode_s = (time.time() - t0) / reps

    tok_per_s = B * DECODE_T / decode_s
    baseline = 2000.0
    result = {
        "metric": "decode_tokens_per_sec_per_chip_1B5_bf16_B8",
        "value": round(tok_per_s, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_s / baseline, 3),
        "extra": {
            "prefill_512tok_B8_ms": round(prefill_s * 1e3, 1),
            "decode_ms_per_step": round(decode_s / DECODE_T * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
