"""Serving latency/memory benchmark (reference app/benchmark_gpu.py protocol):

- decode latency for new_tokens in powers of two, 15 reps discarding the
  first 5 (benchmark_gpu.py:121-148);
- image-state reuse (prefill once, decode many);
- TTFT (image encode + prefill + first token);
- device memory stats (the TPU analog of the reference's NVML VRAM polls).

Writes jsonl records and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np


def device_memory_stats() -> dict:
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": int(stats.get("bytes_in_use", -1)),
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", -1)),
        }
    except Exception:
        return {}


def main(argv=None):
    p = argparse.ArgumentParser("visualrwkv_tpu.apps.benchmark")
    p.add_argument("--model_path", default="", type=str)
    p.add_argument("--n_layer", default=24, type=int)
    p.add_argument("--n_embd", default=2048, type=int)
    p.add_argument("--ctx_len", default=2048, type=int)
    p.add_argument("--quant", default="none", choices=["none", "int8"])
    p.add_argument("--state_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--state_layout", default="head", choices=["head", "flat"],
                   help="flat = lane-flat [B, 64, H*64] decode state carry "
                        "(no TPU 64->128 lane padding)")
    p.add_argument("--batch", default=1, type=int)
    p.add_argument("--max_pow", default=10, type=int, help="max new_tokens = 2^max_pow")
    p.add_argument("--reps", default=15, type=int)
    p.add_argument("--discard", default=5, type=int)
    p.add_argument("--spec_k", default=0, type=int,
                   help="also benchmark speculative decoding at this "
                        "proposal window (0 = off; greedy-lossless, see "
                        "infer/speculative.py)")
    p.add_argument("--spec_draft", default="int8_self",
                   choices=["int8_self", "small"],
                   help="draft source: int8_self = quantized copy of the "
                        "target (no second checkpoint); small = a separate "
                        "smaller RWKV draft (--draft_n_layer/--draft_n_embd, "
                        "optionally --draft_model_path)")
    p.add_argument("--draft_n_layer", default=12, type=int)
    p.add_argument("--draft_n_embd", default=768, type=int)
    p.add_argument("--draft_model_path", default="", type=str,
                   help=".pth checkpoint for the separate draft (random "
                        "init if empty)")
    p.add_argument("--draft_quant", default="int8", choices=["none", "int8"])
    p.add_argument("--output_file", default="benchmark_results.jsonl")
    args = p.parse_args(argv)

    import functools

    import jax.numpy as jnp

    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models import rwkv7

    cfg = RWKVConfig(n_layer=args.n_layer, n_embd=args.n_embd, ctx_len=args.ctx_len)
    init = jax.jit(functools.partial(rwkv7.init_rwkv7_params, cfg=cfg))
    params = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    )(init(jax.random.PRNGKey(0)))
    if args.model_path.endswith(".pth"):
        from visualrwkv_tpu.convert.pth_import import import_rwkv_state_dict, load_pth

        params = import_rwkv_state_dict(load_pth(args.model_path))
    if args.quant == "int8":
        from visualrwkv_tpu.infer.quant import quantize_lm_params

        params = jax.jit(quantize_lm_params)(params)

    # prefill once ("image state reuse"), decode many
    prompt = jax.random.randint(jax.random.PRNGKey(1), (args.batch, 512), 0, 65000)
    state_dt = jnp.dtype(args.state_dtype)

    @jax.jit
    def prefill(params, tokens):
        logits, states = rwkv7.rwkv7_forward_tokens(params, cfg, tokens)
        if args.state_layout == "flat":  # strategy 'flat': unpadded state carry
            from visualrwkv_tpu.ops.wkv7 import state_to_flat

            states = [s._replace(wkv=state_to_flat(s.wkv)) for s in states]
        # serving state dtype (strategy 's16'): halves decode state traffic
        states = [s._replace(wkv=s.wkv.astype(state_dt)) for s in states]
        return logits[:, -1].astype(jnp.float32), states

    def make_decode(n):
        @jax.jit
        def decode(params, fl, st):
            def body(carry, _):
                logits, s = carry
                tok = jnp.argmax(logits, axis=-1)
                logits, s = rwkv7.rwkv7_decode_step(params, cfg, tok, s)
                return (logits.astype(jnp.float32), s), tok

            (_, s), toks = jax.lax.scan(body, (fl, st), None, length=n)
            return jnp.sum(toks)

        return decode

    out_path = Path(args.output_file)
    records = []

    # TTFT: prefill + 1 token
    fl, st = prefill(params, prompt)
    float(jnp.sum(fl))
    t0 = time.time()
    for _ in range(5):
        fl, st = prefill(params, prompt)
    float(jnp.sum(fl))
    ttft = (time.time() - t0) / 5
    records.append({"metric": "ttft_prefill512_s", "value": round(ttft, 4)})

    for pow2 in range(0, args.max_pow + 1):
        n = 2**pow2
        decode = make_decode(n)
        s = decode(params, fl, st)
        int(s)  # compile + force
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            s = decode(params, fl, st)
            int(s)
            times.append(time.time() - t0)
        times = times[args.discard :]
        mean_s = float(np.mean(times))
        records.append(
            {
                "new_tokens": n,
                "batch": args.batch,
                "latency_s": round(mean_s, 5),
                "tok_per_s": round(args.batch * n / mean_s, 1),
                "memory": device_memory_stats(),
            }
        )
        print(records[-1])

    if args.spec_k > 0:
        from visualrwkv_tpu.config import VisionConfig, VLMConfig
        from visualrwkv_tpu.infer.speculative import (
            SpeculativeEngine,
            quantize_self_draft,
        )

        vcfg = VLMConfig(rwkv=cfg, vision=VisionConfig(towers=()),
                         proj_type="linear", num_token_per_image=1)
        tgt = {"rwkv": params}
        if args.spec_draft == "small":
            # deployment shape: a SEPARATE smaller draft checkpoint
            dcfg = RWKVConfig(n_layer=args.draft_n_layer,
                              n_embd=args.draft_n_embd, ctx_len=args.ctx_len)
            dvcfg = VLMConfig(rwkv=dcfg, vision=VisionConfig(towers=()),
                              proj_type="linear", num_token_per_image=1)
            if args.draft_model_path.endswith(".pth"):
                from visualrwkv_tpu.convert.pth_import import (
                    import_rwkv_state_dict,
                    load_pth,
                )

                dparams = import_rwkv_state_dict(load_pth(args.draft_model_path))
            else:
                dparams = jax.jit(
                    lambda p: jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16), p
                    )
                )(jax.jit(functools.partial(rwkv7.init_rwkv7_params, cfg=dcfg))(
                    jax.random.PRNGKey(7)))
            if args.draft_quant == "int8":
                from visualrwkv_tpu.infer.quant import quantize_lm_params

                dparams = jax.jit(quantize_lm_params)(dparams)
            draft, dvcfg_used = {"rwkv": dparams}, dvcfg
        elif args.quant == "none":
            draft, dvcfg_used = {"rwkv": quantize_self_draft(params)}, vcfg
        else:
            # already-int8 target: the draft IS the target (full acceptance;
            # measures loop overhead rather than a deployment config)
            draft, dvcfg_used = tgt, vcfg
        spec = SpeculativeEngine(tgt, vcfg, draft, dvcfg_used, k=args.spec_k)
        n = 2**args.max_pow
        ids = np.asarray(prompt)
        r = spec.generate(ids, max_new_tokens=n, stop_tokens=())
        times = []
        for _ in range(max(1, args.reps - args.discard)):
            t0 = time.time()
            r = spec.generate(ids, max_new_tokens=n, stop_tokens=())
            times.append(time.time() - t0)
        mean_s = float(np.mean(times))
        records.append({
            "new_tokens": n,
            "batch": args.batch,
            "spec_k": args.spec_k,
            "spec_draft": args.spec_draft,
            "latency_s": round(mean_s, 5),
            "tok_per_s": round(args.batch * n / mean_s, 1),
            "acceptance": round(
                float(r.accepted.sum()) / max(1, r.rounds * args.spec_k * args.batch), 3
            ),
        })
        print(records[-1])

    with open(out_path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
