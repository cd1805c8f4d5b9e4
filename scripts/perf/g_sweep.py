"""Sweep G (heads per Pallas program) for the WKV7 fwd / fwd_res / bwd kernels.

Monkeypatches ``_pick_g`` to force each candidate and reports ms/call with
the RTT-cancelling differenced-scan harness (scripts/perf/kernel_ab.py).
Failures (VMEM OOM / compile errors) are reported, not fatal — the sweep's
output decides the production ``_pick_g`` table.

Usage: python scripts/perf/g_sweep.py [--B 8 --T 2048 --H 16 --chunk 16]
"""

from __future__ import annotations

import argparse
import importlib

import jax
import jax.numpy as jnp

from scripts.perf.kernel_ab import make_inputs, timeit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--T", type=int, default=2048)
    p.add_argument("--H", type=int, default=16)
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--gs", type=str, default="8,16,32,64")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    wp = importlib.import_module("visualrwkv_tpu.ops.wkv7_pallas")
    w7 = importlib.import_module("visualrwkv_tpu.ops.wkv7")

    B, T, H, N, chunk = args.B, args.T, args.H, args.N, args.chunk
    inputs = make_inputs(B, T, H, N)
    print(f"G sweep: B={B} T={T} H={H} N={N} chunk={chunk} BH={B*H}", flush=True)

    orig = wp._pick_g
    for g_val in [int(x) for x in args.gs.split(",")]:
        if (B * H) % g_val:
            continue
        wp._pick_g = lambda *a, _g=g_val, **kw: _g  # accept any _pick_g signature
        try:
            fns = {
                "fwd": jax.jit(lambda *x: wp.wkv7_pallas(*x, chunk=chunk)),
                "fwd_res": jax.jit(lambda *x: wp.wkv7_pallas_fwd_res(*x, chunk=chunk)),
            }

            def bwd_chain(*x):
                w7.set_wkv_impl("pallas")
                try:
                    y, s = w7.wkv7(*x, chunk=chunk)
                finally:
                    w7.set_wkv_impl("auto")
                return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s ** 2)

            fns["fwd+bwd"] = jax.jit(jax.grad(bwd_chain, argnums=tuple(range(6))))
            row = [f"G={g_val:<3}"]
            for name, fn in fns.items():
                try:
                    dt = timeit(fn, *inputs, reps=args.reps)
                    row.append(f"{name} {dt:7.3f} ms")
                except Exception as e:
                    row.append(f"{name} FAIL({type(e).__name__}:{str(e)[:60]})")
            print("  ".join(row), flush=True)
        finally:
            wp._pick_g = orig


if __name__ == "__main__":
    main()
