"""Decode-step A/B at 1B5 int8 B32 (the bench headline protocol): state
layout (head/flat) x step impl (jnp/pallas) x carry dtype.

Protocol mirrors bench.measure_decode: one jitted lax.scan of 128 greedy
steps, 3 reps with a scalar-fetch sync (decode is naturally chained).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/decode_ab.py
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--embd", type=int, default=2048)
    p.add_argument("--T", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--modes", default="head_s16,flat_s16_jnp,flat_s16_pallas,flat_f32_pallas")
    args = p.parse_args()

    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.infer.quant import quantize_lm_params
    from visualrwkv_tpu.models import rwkv7
    from visualrwkv_tpu.ops.wkv7 import set_wkv_step_impl, state_to_flat

    cfg = RWKVConfig(
        n_layer=args.layers, n_embd=args.embd, vocab_size=65536, head_size=64,
        compute_dtype="bfloat16", ctx_len=2048,
    )
    params_f32 = jax.jit(functools.partial(rwkv7.init_rwkv7_params, cfg=cfg))(
        jax.random.PRNGKey(0)
    )
    params = jax.jit(quantize_lm_params)(params_f32)

    B, T = args.B, args.T

    def make_decode():
        @jax.jit
        def decode(params, first_logits, states):
            def body(carry, _):
                logits, st = carry
                tok = jnp.argmax(logits, axis=-1)
                logits, st = rwkv7.rwkv7_decode_step(params, cfg, tok, st)
                return (logits.astype(jnp.float32), st), tok

            (logits, states), toks = jax.lax.scan(
                body, (first_logits, states), None, length=T
            )
            # return the carry so reps can be CHAINED (each rep consumes the
            # previous rep's logits/state): independent same-input dispatches
            # could overlap on a backend with multiple streams and understate
            # the per-step time (advisor round-3 finding)
            return jnp.sum(toks), logits, states

        return decode

    fl = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    st_head = rwkv7.init_state(cfg, B)

    def states_for(mode):
        st = st_head
        if mode.startswith("flat"):
            st = [s._replace(wkv=state_to_flat(s.wkv)) for s in st]
        if "_s16" in mode:
            st = [s._replace(wkv=s.wkv.astype(jnp.bfloat16)) for s in st]
        return st

    for mode in args.modes.split(","):
        set_wkv_step_impl("pallas" if mode.endswith("pallas") else "jnp")
        try:
            decode = make_decode()
            st = states_for(mode)
            ssum, lg, st2 = decode(params, fl, st)
            int(ssum)  # compile + sync
            t0 = time.time()
            lg, st2 = fl, st
            for _ in range(args.reps):
                ssum, lg, st2 = decode(params, lg, st2)
            int(ssum)
            dt = (time.time() - t0) / args.reps
            print(f"{mode:<18} {dt/T*1e3:7.3f} ms/step  "
                  f"{B*T/dt:9.1f} tok/s", flush=True)
        except Exception as e:
            print(f"{mode:<18} FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
        finally:
            set_wkv_step_impl("jnp")


if __name__ == "__main__":
    main()
