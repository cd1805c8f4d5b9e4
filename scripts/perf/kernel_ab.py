"""Packed-lane vs head-layout WKV7 kernel A/B on real hardware.

Times the forward, fwd_res (residual-saving forward) and backward Pallas
kernels in both lane layouts at training shapes. The packed layout folds
adjacent head pairs onto the 128-lane minor to undo the measured 2.0x
lane-padding HBM tax on every [.., 64]-minor kernel stream (PROGRESS.md
round-2 packed-lane section); this script produces the numbers that decide
the dispatch default.

Usage: python scripts/perf/kernel_ab.py [--B 8 --T 2048 --H 16 --chunk 16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def make_inputs(B, T, H, N, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    shape = (B, T, H, N)
    r, k, v = (jax.random.normal(ks[i], shape, dtype) * 0.5 for i in range(3))
    kk = jax.random.normal(ks[3], shape)
    kk = (kk / jnp.linalg.norm(kk, axis=-1, keepdims=True)).astype(dtype)
    a = -kk
    b = kk * jax.nn.sigmoid(jax.random.normal(ks[4], shape)).astype(dtype)
    w = (-0.5 - jax.nn.softplus(-jax.random.normal(ks[5], shape))).astype(dtype)
    return r, w, k, v, a, b


def timeit(f, *args, reps=20, warmup=3):
    """Time a chained in-program loop, differencing two lengths.

    The axon tunnel's ``block_until_ready`` acks the dispatch without waiting
    for execution; only a host fetch syncs, and that fetch costs a fixed
    ~30 ms RTT. So: run ONE jitted program that scans the kernel ``n`` times
    with a carry dependence (no hoisting/overlap), fetch a scalar, and report
    (t(2n) - t(n)) / n — the RTT and dispatch cost cancel in the difference.
    """
    import functools

    import jax.lax as lax

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(args0, n):
        def body(c, _):
            out = f(c, *args0[1:])
            # every output leaf feeds the reduction, so no kernel is dead
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            # the next rep's first operand depends on this rep's output, so
            # XLA cannot hoist the kernel out of the loop (1e-30*tot ~ 0)
            c = c + (1e-30 * tot).astype(c.dtype)
            return c, tot

        _, ys = lax.scan(body, args0[0], None, length=n)
        return jnp.sum(ys)

    def run(n):
        float(chained(args, n))  # warm
        best = float("inf")
        for _ in range(max(1, warmup)):
            t0 = time.perf_counter()
            float(chained(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(reps), run(2 * reps)
    return (t2 - t1) / reps * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--T", type=int, default=2048)
    p.add_argument("--H", type=int, default=16)
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    from visualrwkv_tpu.ops import wkv7_pallas as wp

    B, T, H, N, chunk = args.B, args.T, args.H, args.N, args.chunk
    inputs = make_inputs(B, T, H, N)
    print(f"shapes B={B} T={T} H={H} N={N} chunk={chunk} "
          f"backend={jax.default_backend()}")

    # --- forward only ---
    head_fwd = jax.jit(lambda *x: wp.wkv7_pallas(*x, chunk=chunk))
    packed_fwd = jax.jit(lambda *x: wp.wkv7_pallas_packed(*x, chunk=chunk))
    t_h = timeit(head_fwd, *inputs, reps=args.reps)
    t_p = timeit(packed_fwd, *inputs, reps=args.reps)
    print(f"fwd      head {t_h:8.3f} ms   packed {t_p:8.3f} ms   "
          f"packed/head {t_p/t_h:.3f}")

    # parity check (bit-identical expected)
    yh, sh = head_fwd(*inputs)
    yp, sp = packed_fwd(*inputs)
    print(f"  parity: y max|d|={float(jnp.max(jnp.abs(yh.astype(jnp.float32)-yp.astype(jnp.float32)))):.2e} "
          f"s max|d|={float(jnp.max(jnp.abs(sh-sp))):.2e}")

    # --- fwd_res ---
    head_fr = jax.jit(lambda *x: wp.wkv7_pallas_fwd_res(*x, chunk=chunk))
    packed_fr = jax.jit(lambda *x: wp.wkv7_pallas_fwd_res_packed(*x, chunk=chunk))
    t_h = timeit(head_fr, *inputs, reps=args.reps)
    t_p = timeit(packed_fr, *inputs, reps=args.reps)
    print(f"fwd_res  head {t_h:8.3f} ms   packed {t_p:8.3f} ms   "
          f"packed/head {t_p/t_h:.3f}")

    # --- backward (via the custom_vjp chain: grad of sum(y^2)+sum(s^2)) ---
    import importlib

    w7 = importlib.import_module("visualrwkv_tpu.ops.wkv7")

    def chain(impl):
        def loss(*x):
            w7.set_wkv_impl(impl)
            try:
                y, s = w7.wkv7(*x, chunk=chunk)
            finally:
                w7.set_wkv_impl("auto")
            return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s ** 2)
        return jax.jit(jax.grad(loss, argnums=tuple(range(6))))

    g_head = chain("pallas")
    g_packed = chain("packed")
    t_h = timeit(g_head, *inputs, reps=args.reps)
    t_p = timeit(g_packed, *inputs, reps=args.reps)
    print(f"fwd+bwd  head {t_h:8.3f} ms   packed {t_p:8.3f} ms   "
          f"packed/head {t_p/t_h:.3f}")
    gh = g_head(*inputs)
    gp = g_packed(*inputs)
    md = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
             for a, b in zip(gh, gp))
    print(f"  grad parity: max|d|={md:.2e}")


if __name__ == "__main__":
    main()
