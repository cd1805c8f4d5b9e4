"""Kernel validation + benchmark harness (reference v6.xx/test_kernel.py:
fp32 sequential kernel as golden, per-implementation relative RMS error on
outputs and ALL gradients, plus timing loops).

Usage: python -m visualrwkv_tpu.ops.kernel_bench [wkv7|wkv6] [--B 8 --T 512 ...]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def rel_err(x, y):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    return float(np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum())))


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _time(f, *args, reps=10):
    _force(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _force(out)
    return (time.time() - t0) / reps


def bench_wkv7(B, T, H, N, dtype):
    from visualrwkv_tpu.ops.wkv7 import wkv7_chunked, wkv7_reference
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    shape = (B, T, H, N)
    r, k, v = (jax.random.normal(ks[i], shape, dtype) * 0.5 for i in range(3))
    kk = jax.random.normal(ks[3], shape)
    kk = (kk / jnp.linalg.norm(kk, axis=-1, keepdims=True)).astype(dtype)
    a = -kk
    b = kk * jax.nn.sigmoid(jax.random.normal(ks[4], shape)).astype(dtype)
    w = (-0.5 - jax.nn.softplus(-jax.random.normal(ks[5], shape))).astype(dtype)
    inputs = (r, w, k, v, a, b)
    f32_inputs = tuple(x.astype(jnp.float32) for x in inputs)

    y_ref, s_ref = jax.jit(wkv7_reference)(*f32_inputs)
    impls = {
        "chunked16": lambda *x: wkv7_chunked(*x, chunk=16),
        "chunked64": lambda *x: wkv7_chunked(*x, chunk=64),
        "pallas64": lambda *x: wkv7_pallas(*x, chunk=64),
        "pallas128": lambda *x: wkv7_pallas(*x, chunk=128),
    }
    print(f"wkv7  B={B} T={T} H={H} N={N} dtype={np.dtype(dtype).name}")
    for name, fn in impls.items():
        try:
            jfn = jax.jit(fn)
            y, s = jfn(*inputs)
            dt = _time(jfn, *inputs)
            print(
                f"  {name:<10} {dt*1e3:7.2f} ms  y_err {rel_err(y.astype(jnp.float32), y_ref):.2e}"
                f"  s_err {rel_err(s, s_ref):.2e}"
            )
        except Exception as e:
            print(f"  {name:<10} FAILED: {type(e).__name__}: {str(e)[:80]}")

    # gradient error ratios vs the sequential reference (fp32 inputs)
    def make_loss(fn):
        def loss(*args):
            y, s = fn(*args)
            return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s**2)

        return jax.jit(jax.grad(loss, argnums=tuple(range(6))))

    g_ref = make_loss(wkv7_reference)(*f32_inputs)
    from visualrwkv_tpu.ops.wkv7 import wkv7

    g_disp = make_loss(wkv7)(*f32_inputs)
    names = "rwkvab"
    errs = "  ".join(
        f"d{n} {rel_err(gd, gr):.1e}" for n, gr, gd in zip(names, g_ref, g_disp)
    )
    print(f"  dispatch grads vs golden: {errs}")


def bench_wkv6(B, T, H, N, dtype):
    from visualrwkv_tpu.ops.wkv6 import wkv6, wkv6_chunked, wkv6_reference
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    shape = (B, T, H, N)
    r, k, v = (jax.random.normal(ks[i], shape, dtype) * 0.5 for i in range(3))
    w = (-0.3 - jax.nn.softplus(-jax.random.normal(ks[3], shape))).astype(dtype)
    u = jax.random.normal(ks[4], (H, N)) * 0.3
    inputs = (r, w, k, v, u)
    f32_inputs = tuple(x.astype(jnp.float32) for x in inputs)

    y_ref, s_ref = jax.jit(wkv6_reference)(*f32_inputs)
    impls = {
        "chunked16": lambda *x: wkv6_chunked(*x, chunk=16),
        "pallas64": lambda *x: wkv6_pallas(*x, chunk=64),
        "pallas128": lambda *x: wkv6_pallas(*x, chunk=128),
    }
    print(f"wkv6  B={B} T={T} H={H} N={N} dtype={np.dtype(dtype).name}")
    for name, fn in impls.items():
        try:
            jfn = jax.jit(fn)
            y, s = jfn(*inputs)
            dt = _time(jfn, *inputs)
            print(
                f"  {name:<10} {dt*1e3:7.2f} ms  y_err {rel_err(y.astype(jnp.float32), y_ref):.2e}"
                f"  s_err {rel_err(s, s_ref):.2e}"
            )
        except Exception as e:
            print(f"  {name:<10} FAILED: {type(e).__name__}: {str(e)[:80]}")

    def make_loss(fn):
        def loss(*args):
            y, s = fn(*args)
            return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s**2)

        return jax.jit(jax.grad(loss, argnums=tuple(range(5))))

    g_ref = make_loss(wkv6_reference)(*f32_inputs)
    g_disp = make_loss(wkv6)(*f32_inputs)
    errs = "  ".join(
        f"d{n} {rel_err(gd, gr):.1e}"
        for n, gr, gd in zip(["r", "w", "k", "v", "u"], g_ref, g_disp)
    )
    print(f"  dispatch grads vs golden: {errs}")


def main(argv=None):
    p = argparse.ArgumentParser("visualrwkv_tpu.ops.kernel_bench")
    p.add_argument("kernel", nargs="?", default="wkv7", choices=["wkv7", "wkv6", "all"])
    p.add_argument("--B", default=8, type=int)
    p.add_argument("--T", default=512, type=int)
    p.add_argument("--H", default=32, type=int)
    p.add_argument("--N", default=64, type=int)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)
    dtype = jnp.dtype(args.dtype)
    if args.kernel in ("wkv7", "all"):
        bench_wkv7(args.B, args.T, args.H, args.N, dtype)
    if args.kernel in ("wkv6", "all"):
        bench_wkv6(args.B, args.T, args.H, args.N, dtype)


if __name__ == "__main__":
    main()
