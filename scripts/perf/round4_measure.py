"""Round-4 hardware measurements (run sequentially on the ONE real chip).

Legs (select with --legs, comma-separated; default all):
  wkv6_ab     — fused WKV6 fwd / fwd+bwd chain at kernel chunk 16/32/64/128
                (no triangular solve in the v6 math, so no stability barrier;
                VERDICT r3 next-1)
  wkv7_kchunk — WKV7 two-level kernel-chunk ceiling 32 vs 64 (solve stays 16)
  v6_train    — x060 training tok/s at 0B4 geometry, microbatch sweep
  sr_train    — x070 0B4 with optim_precision=bf16_sr vs master_fp32
  train_1b5   — 1B5 x070 bf16_sr training throughput (fits one chip's HBM)
  decode_7b   — 7B x060 int8 B16 decode (BASELINE configs[3] serving path)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/round4_measure.py
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, flush=True)


# --- WKV6 kernel chunk A/B ---------------------------------------------------


def leg_wkv6_ab(reps=20):
    import importlib

    from scripts.perf.kernel_ab import timeit

    w6 = importlib.import_module("visualrwkv_tpu.ops.wkv6")
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas

    B, T, H, N = 8, 2048, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    bf = jnp.bfloat16
    shape = (B, T, H, N)
    r, k, v = (jax.random.normal(ks[i], shape, bf) * 0.5 for i in range(3))
    # v6 decay input regime: w_raw with exp(-exp(w)) in (0, 1)
    w = (jax.random.normal(ks[3], shape) * 0.5 - 0.5).astype(bf)
    u = jax.random.normal(ks[4], (H, N), jnp.float32) * 0.3

    y_ref = None
    for chunk in (16, 32, 64, 128):
        try:
            fwd = jax.jit(lambda r, w, k, v: wkv6_pallas(r, w, k, v, u, chunk=chunk))
            t_f = timeit(fwd, r, w, k, v, reps=reps)

            def loss(r, w, k, v, chunk=chunk):
                y, s = w6._wkv6_cv_pallas(chunk, r, w, k, v, u, None)
                return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s**2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            t_g = timeit(g, r, w, k, v, reps=reps)
            y, s = fwd(r, w, k, v)
            if y_ref is None:
                y_ref = y.astype(jnp.float32)
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref)))
            log(f"wkv6 chunk {chunk:>3}: fwd {t_f:7.3f} ms  fwd+bwd {t_g:7.3f} ms"
                f"  max|y-y16|={err:.2e}")
        except Exception as e:
            log(f"wkv6 chunk {chunk:>3}: FAIL {type(e).__name__}: {str(e)[:120]}")


# --- WKV7 kernel-chunk ceiling 32 vs 64 -------------------------------------


def leg_wkv7_kchunk(reps=20):
    import importlib

    from scripts.perf.kernel_ab import make_inputs, timeit

    w7 = importlib.import_module("visualrwkv_tpu.ops.wkv7")

    B, T, H, N = 8, 2048, 16, 64
    inputs = make_inputs(B, T, H, N)
    prev = None
    for kchunk in (32, 64, 128):
        try:
            w7.set_wkv_kernel_chunk(kchunk)

            def loss(*x):
                y, s = w7.wkv7(*x, chunk=16)
                return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s**2)

            g = jax.jit(jax.grad(loss, argnums=tuple(range(6))))
            t_g = timeit(g, *inputs, reps=reps)
            gr = g(*inputs)[0].astype(jnp.float32)
            err = 0.0 if prev is None else float(jnp.max(jnp.abs(gr - prev)))
            prev = gr if prev is None else prev
            log(f"wkv7 kchunk {kchunk:>3} (solve 16): fwd+bwd {t_g:7.3f} ms"
                f"  max|dr-dr32|={err:.2e}")
        except Exception as e:
            log(f"wkv7 kchunk {kchunk:>3}: FAIL {type(e).__name__}: {str(e)[:120]}")
        finally:
            w7.set_wkv_kernel_chunk(32)


# --- training throughput legs ------------------------------------------------


def leg_v6_train():
    import bench

    for mb, ac in ((2, 4), (8, 1), (4, 2)):
        try:
            t = bench.measure_train_step_0b4(
                x=8, rounds=2, micro_bsz=mb, accum=ac, version="x060",
                stacked=False,
            )
            log(f"x060 0B4 train B{mb}xa{ac}: {t:.1f} tok/s/chip")
        except Exception as e:
            log(f"x060 0B4 train B{mb}xa{ac}: FAIL {type(e).__name__}: {str(e)[:160]}")


def leg_sr_train():
    import bench

    for mb, ac, mode in ((2, 4, "master_fp32"), (2, 4, "bf16_sr"),
                         (1, 8, "master_fp32")):
        try:
            t = bench.measure_train_step_0b4(x=8, rounds=2, micro_bsz=mb,
                                             accum=ac, optim_precision=mode)
            log(f"x070 0B4 train B{mb}xa{ac} {mode}: {t:.1f} tok/s/chip")
        except Exception as e:
            log(f"x070 0B4 train B{mb}xa{ac} {mode}: FAIL "
                f"{type(e).__name__}: {str(e)[:160]}")


def leg_train_1b5():
    import bench

    for mb, ac in ((2, 4), (4, 2)):
        try:
            t = bench.measure_train_step_0b4(
                x=8, rounds=2, n_embd=2048, micro_bsz=mb, accum=ac,
                optim_precision="bf16_sr",
            )
            log(f"x070 1B5 train B{mb}xa{ac} bf16_sr: {t:.1f} tok/s/chip")
        except Exception as e:
            log(f"x070 1B5 train B{mb}xa{ac}: FAIL {type(e).__name__}: {str(e)[:160]}")


# --- 7B x060 int8 decode -----------------------------------------------------


def leg_decode_7b(B=16, T=128):
    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.infer.quant import quantize_lm_params
    from visualrwkv_tpu.models import lm

    cfg = RWKVConfig(n_layer=32, n_embd=4096, vocab_size=65536, head_size=64,
                     compute_dtype="bfloat16", ctx_len=2048, version="x060")

    # init + quantize fused in ONE jit so the 28 GB fp32 init tree never
    # materializes (round-3 protocol)
    @jax.jit
    def init_q(key):
        return quantize_lm_params(lm.init_lm_params(key, cfg))

    t0 = time.time()
    params = init_q(jax.random.PRNGKey(0))
    jax.tree_util.tree_leaves(params)[0].block_until_ready()
    log(f"7B init+quantize: {time.time() - t0:.1f}s")

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
    t0 = time.time()
    reps = 3
    lg, st2 = fl, st
    for _ in range(reps):
        ssum, lg, st2 = decode(params, lg, st2)
    int(ssum)
    dt = (time.time() - t0) / reps
    log(f"7B x060 int8 B{B} decode: {B * T / dt:.1f} tok/s "
        f"({dt / T * 1e3:.2f} ms/step)")


# --- flagship encode throughput + UHD fusion latency + 448 TTFT -------------


def leg_encode():
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.transforms import resize_images
    from visualrwkv_tpu.models.visualrwkv import (
        encode_images,
        init_visualrwkv_params,
    )

    rcfg = RWKVConfig(n_layer=24, n_embd=2048, vocab_size=65536, head_size=64,
                      compute_dtype="bfloat16", ctx_len=2048)

    for tag, uhd, B_img in (("flagship_448_triple", False, 8),
                            ("uhd_5tile", True, 2)):
        try:
            cfg = VLMConfig(rwkv=rcfg, vision=VisionConfig(), proj_type="mlp",
                            num_token_per_image=1024, uhd_fusion=uhd)

            def init_bf16(key):
                p = init_visualrwkv_params(key, cfg)
                return jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), p)

            params = jax.jit(init_bf16)(jax.random.PRNGKey(0))
            tower_sizes = {
                t: (cfg.vision.sam_image_size if t == "sam"
                    else cfg.vision.image_size)
                for t in cfg.vision.towers
            }
            n = B_img * (5 if uhd else 1)
            img = jnp.asarray(np.random.default_rng(0).integers(
                0, 256, (n, 448, 448, 3), np.uint8))

            @jax.jit
            def encode(params, img):
                images = {t: resize_images(img, s)
                          for t, s in tower_sizes.items()}
                f = encode_images(params, cfg, images)
                return jnp.sum(f.astype(jnp.float32)), f

            s, _ = encode(params, img)
            float(s)
            t0 = time.time()
            reps = 5
            for _ in range(reps):
                s, _ = encode(params, img)
            float(s)
            dt = (time.time() - t0) / reps
            log(f"encode {tag}: {B_img / dt:.2f} images/s "
                f"({dt / B_img * 1e3:.1f} ms/image, batch {B_img})")
            del params
        except Exception as e:
            log(f"encode {tag}: FAIL {type(e).__name__}: {str(e)[:160]}")


def leg_vision_suite():
    import bench

    try:
        log(f"vision suite: {bench.measure_vision_suite()}")
    except Exception as e:
        log(f"vision suite: FAIL {type(e).__name__}: {str(e)[:160]}")


LEGS = {
    "vision_suite": leg_vision_suite,
    "encode": leg_encode,
    "wkv6_ab": leg_wkv6_ab,
    "wkv7_kchunk": leg_wkv7_kchunk,
    "v6_train": leg_v6_train,
    "sr_train": leg_sr_train,
    "train_1b5": leg_train_1b5,
    "decode_7b": leg_decode_7b,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--legs", default=",".join(LEGS))
    args = p.parse_args()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    for name in args.legs.split(","):
        log(f"=== {name} ===")
        t0 = time.time()
        try:
            LEGS[name]()
        except Exception as e:
            log(f"{name}: LEG FAIL {type(e).__name__}: {str(e)[:200]}")
        log(f"=== {name} done in {time.time() - t0:.0f}s ===")


if __name__ == "__main__":
    main()
