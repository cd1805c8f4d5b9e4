"""Stability envelope of the chunked WKV7 formulation.

The chunk equations solve u = (I - M)^{-1} rhs with M[t,s] =
-<kk_t, kk_s> * a_gate * decay (strictly lower triangular).  When kk is
near-constant in t the entries are negative and (I-M)^{-1} is tiny; when kk
ALTERNATES sign the entries alternate and (I-M)^{-1} grows ~(1+a)^{(t-s)/2},
amplifying input rounding.  bf16 inputs (~4e-3) survive that amplification at
chunk 8, are marginal at 16, and explode at 32 — which is exactly what killed
real training after ONE optimizer step (sign-like Adam updates leave k highly
correlated over t with decay ~= 1; discovered on-TPU, loss NaN'd at step 1
with the then-default chunk-32 fused path while the chunk-16 jnp path
learned).

These tests lock (a) the dispatcher cap at 16, (b) chunk-8 accuracy on the
adversarial construction, and (c) that a first-optimizer-step-style training
run stays finite through the fused path.

Reference analog: the CUDA kernel (wkv7_cuda.cu) is a strictly sequential
per-token scan — unconditionally stable — so this failure mode is specific to
chunked TPU/matmul formulations and has no reference counterpart.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

w7 = importlib.import_module("visualrwkv_tpu.ops.wkv7")


def _adversarial_inputs(T=256, H=2, N=64, a_gate=0.9, seed=0):
    """Sign-alternating unit kk + slow decay: worst case for the tri-solve."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(H, N))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    sign = ((-1.0) ** np.arange(T))[None, :, None, None]
    kk = np.broadcast_to(u[None, None], (1, T, H, N)) * sign
    r = rng.normal(size=(1, T, H, N)) * 0.5
    v = rng.normal(size=(1, T, H, N)) * 0.5
    k = rng.normal(size=(1, T, H, N)) * 0.05
    w_raw = np.full((1, T, H, N), -7.0)
    return r, w_raw, k, v, -kk, kk * a_gate


def _as(args, dt):
    return [jnp.asarray(x, dt) for x in args]


def test_adversarial_chunk8_is_accurate_and_chunk32_is_not():
    """On real TPU hardware chunk 16/32 explode on this construction (1.6e16 /
    inf relative error, measured); XLA:CPU's different bf16-matmul lowering
    keeps 32 finite but still ~17x worse than 8.  Assert the
    platform-independent facts: 8 is accurate, 32 degrades >= 10x over 8."""
    args = _adversarial_inputs()
    y_ref, _ = w7.wkv7_reference(*_as(args, jnp.float32))
    ref = np.asarray(y_ref, np.float32)
    scale = np.abs(ref).max()
    assert np.isfinite(ref).all() and scale < 100  # the exact math is bounded

    y8, _ = w7.wkv7_chunked(*_as(args, jnp.bfloat16), chunk=8)
    y8 = np.asarray(y8, np.float32)
    assert np.isfinite(y8).all()
    err8 = np.abs(y8 - ref).max() / scale
    assert err8 < 0.05

    y32, _ = w7.wkv7_chunked(*_as(args, jnp.bfloat16), chunk=32)
    y32 = np.asarray(y32, np.float32)
    err32 = np.abs(y32 - ref).max() / scale if np.isfinite(y32).all() else np.inf
    assert err32 > 10 * err8


def test_dispatcher_caps_fused_chunk_at_16(monkeypatch):
    """wkv7(chunk=64) must never hand the fused path a chunk > 16."""
    seen = []
    orig = w7._wkv7_cv_pallas

    def recorder(chunk, *a):
        seen.append(chunk)
        return orig(chunk, *a)

    monkeypatch.setattr(w7, "_wkv7_cv_pallas", recorder)
    w7.set_wkv_impl("pallas")  # force the fused path (interpret-mode on CPU)
    try:
        args = _adversarial_inputs(T=64, H=1)
        w7.wkv7(*_as(args, jnp.bfloat16), chunk=64)
        w7.wkv7(*_as(args, jnp.bfloat16), chunk=8)  # smaller chunk honored
    finally:
        w7.set_wkv_impl("auto")
    assert seen == [16, 8]


def test_first_optimizer_step_regime_stays_finite():
    """k near-constant over t + strong a_gate + slow decay (the post-step-1
    regime that NaN'd real training): the fused path at the capped chunk must
    stay finite and track the fp32 oracle."""
    rng = np.random.default_rng(1)
    T, H, N = 256, 2, 64
    base = rng.normal(size=(H, N))
    # k = dominant shared component + small per-token noise -> kk highly
    # correlated across t after l2-normalization (mixed-sign inner products)
    k_feat = base[None, None] + 0.15 * rng.normal(size=(1, T, H, N))
    kk = k_feat / np.linalg.norm(k_feat, axis=-1, keepdims=True)
    flip = np.where(rng.random((1, T, 1, 1)) < 0.35, -1.0, 1.0)
    kk = kk * flip
    a_gate = 0.85
    r = rng.normal(size=(1, T, H, N)) * 0.5
    v = rng.normal(size=(1, T, H, N)) * 0.5
    k = rng.normal(size=(1, T, H, N)) * 0.05
    w_raw = np.full((1, T, H, N), -6.0)
    args = (r, w_raw, k, v, -kk, kk * a_gate)

    y_ref, _ = w7.wkv7_reference(*_as(args, jnp.float32))
    ref = np.asarray(y_ref, np.float32)
    scale = np.abs(ref).max()

    w7.set_wkv_impl("pallas")
    try:
        y, _ = w7.wkv7(*_as(args, jnp.bfloat16), chunk=16)
    finally:
        w7.set_wkv_impl("auto")
    y = np.asarray(y, np.float32)
    assert np.isfinite(y).all()
    assert np.abs(y - ref).max() / scale < 0.1


def test_first_optimizer_step_regime_gradients_finite():
    """The fused backward shares the forward's tri-solve formulation; the
    training fix is only complete if gradients ALSO stay finite at the capped
    chunk in the post-step-1 regime."""
    rng = np.random.default_rng(2)
    T, H, N = 128, 2, 64
    base = rng.normal(size=(H, N))
    k_feat = base[None, None] + 0.15 * rng.normal(size=(1, T, H, N))
    kk = k_feat / np.linalg.norm(k_feat, axis=-1, keepdims=True)
    kk = kk * np.where(rng.random((1, T, 1, 1)) < 0.35, -1.0, 1.0)
    r = rng.normal(size=(1, T, H, N)) * 0.5
    v = rng.normal(size=(1, T, H, N)) * 0.5
    k = rng.normal(size=(1, T, H, N)) * 0.05
    w_raw = np.full((1, T, H, N), -6.0)
    args = _as((r, w_raw, k, v, -kk, kk * 0.85), jnp.bfloat16)

    def loss(*xs):
        y, s = w7.wkv7(*xs, chunk=16)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s**2)

    w7.set_wkv_impl("pallas")
    try:
        grads = jax.grad(loss, argnums=tuple(range(6)))(*args)
    finally:
        w7.set_wkv_impl("auto")
    for i, g in enumerate(grads):
        ga = np.asarray(g, np.float32)
        assert np.isfinite(ga).all(), f"grad {i} not finite"


def test_two_level_solve_kernel_chunk32_matches_chunk16_envelope():
    """The round-3 kernel-chunk growth: (kernel chunk 32, solve 16) must err
    like plain chunk 16 on the adversarial construction, NOT like the full
    chunk-32 doubling (which explodes).  Locks ops.wkv7_pallas._btri_solve's
    stability claim on the interpret path; the on-TPU check lives in
    scripts/perf (hardware lowering is the harsher environment,
    docs/wkv_chunk_stability.md)."""
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas

    args = _adversarial_inputs()
    y_ref, _ = w7.wkv7_reference(*_as(args, jnp.float32))
    ref = np.asarray(y_ref, np.float32)
    scale = np.abs(ref).max()

    y16, _ = wkv7_pallas(*_as(args, jnp.bfloat16), chunk=16, solve=16)
    err16 = np.abs(np.asarray(y16, np.float32) - ref).max() / scale

    y32, _ = wkv7_pallas(*_as(args, jnp.bfloat16), chunk=32, solve=16)
    y32 = np.asarray(y32, np.float32)
    assert np.isfinite(y32).all()
    err32 = np.abs(y32 - ref).max() / scale
    # same envelope as 16 (identical to first order; allow 2x headroom)
    assert err32 < 2 * max(err16, 1e-3)

    # ... whereas the full-doubling solve at 32 degrades by orders of magnitude
    y32full, _ = wkv7_pallas(*_as(args, jnp.bfloat16), chunk=32, solve=32)
    y32full = np.asarray(y32full, np.float32)
    err32full = (np.abs(y32full - ref).max() / scale
                 if np.isfinite(y32full).all() else np.inf)
    assert err32full > 10 * err32
