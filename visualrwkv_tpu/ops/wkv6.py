"""RWKV-6 (and RWKV-5) WKV recurrence for TPU.

Per head (state ``S`` of shape ``[N_v, N_k]``; bonus ``u`` per channel)::

    y_t  = (S_{t-1} + (u * k_t) outer v_t^T-wise) @ r_t
         = S_{t-1} @ r_t + (sum_j u_j k_tj r_tj) * v_t
    S_t  = S_{t-1} * w_t[None, :] + v_t[:, None] * k_t[None, :]

with ``w_t = exp(-exp(w_raw_t))`` data-dependent (RWKV-6) or per-channel
constant (RWKV-5).  Matches the reference CUDA kernel semantics
(VisualRWKV-v6/v6.0/cuda/wkv6_cuda.cu:7-61: ``y += r[j]*(u[j]*k[j]*v + s)``,
``s = s*w[j] + k[j]*v``), with explicit initial/final state (the reference's
fla `fused_recurrent_rwkv6(initial_state=...)` path, v6.xx/src/model.py:35-43).

Chunked form is plain gated linear attention:

    g_t  = cumsum(log w);  p_t = exp(g_t)
    Y    = (R * p_prev) Z + strict_tril((R*p_prev) (K/p)^T) V + (u·(k_t*r_t)) v_t
    Z'   = p_L * Z + (K * p_L/p)^T V
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_CHUNK = 16


def wkv6_step(
    state: Array, r: Array, w_raw: Array, k: Array, v: Array, u: Array
) -> Tuple[Array, Array]:
    """Single-token WKV6 update (O(1) decode step).

    state: ``[..., H, N_v, N_k]`` fp32; r/w_raw/k/v: ``[..., H, N]``; u: ``[H, N]``.
    """
    f32 = jnp.float32
    r, k, v = (x.astype(f32) for x in (r, k, v))
    u = u.astype(f32)
    w = jnp.exp(-jnp.exp(w_raw.astype(f32)))
    bonus = jnp.sum(u * k * r, axis=-1, keepdims=True)  # [..., H, 1]
    y = jnp.einsum("...ij,...j->...i", state, r) + bonus * v
    state = state * w[..., None, :] + v[..., :, None] * k[..., None, :]
    return state, y


def wkv6_step_flat(
    state: Array, r: Array, w_raw: Array, k: Array, v: Array, u: Array
) -> Tuple[Array, Array]:
    """Single-token WKV6 update on the lane-flat state layout
    ``[B, N_v, H*N_k]`` (see ops.wkv7.wkv7_step_flat for the rationale: the
    canonical [B,H,64,64] buffer lane-pads 64->128, doubling the dominant
    decode HBM-traffic term). Same math as :func:`wkv6_step`."""
    B, N, HN = state.shape
    H = HN // N
    f32 = jnp.float32
    out_dtype = r.dtype
    r, k, v = (x.astype(f32) for x in (r, k, v))  # [B, H, N]
    u = u.astype(f32)  # [H, N]
    w = jnp.exp(-jnp.exp(w_raw.astype(f32)))
    s4 = state.astype(f32).reshape(B, N, H, N)  # [B, i, H, j] fused view
    bonus = jnp.sum(u * k * r, axis=-1)  # [B, H]
    y = jnp.swapaxes((s4 * r[:, None]).sum(-1), 1, 2) + bonus[..., None] * v
    s4 = s4 * w[:, None] + jnp.swapaxes(v, 1, 2)[..., None] * k[:, None]
    return s4.reshape(B, N, HN).astype(state.dtype), y.astype(out_dtype)


def wkv6_scan_states(
    r: Array, w_raw: Array, k: Array, v: Array, u: Array,
    initial_state: Optional[Array] = None, chunk: Optional[int] = None,
) -> Tuple[Array, Array]:
    """WKV6 over a short token window with the state at every position
    (speculative-decoding verify; see ops.wkv7.wkv7_scan_states).

    Returns (y [B, T, H, N], states [B, T, H, N, N] fp32)."""
    B, T, H, N = r.shape
    s0 = (
        jnp.zeros((B, H, N, N), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )

    def body(state, xs):
        state, y = wkv6_step(state, *xs, u)
        return state, (y, state)

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w_raw, k, v))
    _, (y, states) = jax.lax.scan(body, s0, xs)
    return jnp.moveaxis(y, 0, 1), jnp.moveaxis(states, 0, 1)


def wkv6_step_auto(state, r, w_raw, k, v, u):
    """Decode-step dispatch; policy in ops.wkv7.set_wkv_step_impl (measured:
    the fused step kernel wins in isolation but loses end-to-end — default
    jnp). Same contract as :func:`wkv6_step` (u is per-head [H, N]); a 3-D
    state selects the lane-flat layout (:func:`wkv6_step_flat`)."""
    from visualrwkv_tpu.ops.wkv7 import _STEP_IMPL

    if state.ndim == 3:
        return wkv6_step_flat(state, r, w_raw, k, v, u)
    if (
        _STEP_IMPL == "pallas"
        and jax.default_backend() == "tpu"
        and state.ndim == 4
        and u.ndim == 2
    ):
        from visualrwkv_tpu.ops.wkv6_pallas import wkv6_step_pallas

        return wkv6_step_pallas(state, r, w_raw, k, v, u)
    return wkv6_step(state, r, w_raw, k, v, u)


def wkv6_reference(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    u: Array,
    initial_state: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Step-by-step fp32 scan; golden reference.

    r, w_raw, k, v: ``[B, T, H, N]``; u: ``[H, N]``.
    """
    B, T, H, N = r.shape
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)

    def step(state, inputs):
        rt, wt, kt, vt = inputs
        state, y = wkv6_step(state, rt, wt, kt, vt, u)
        return state, y

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w_raw, k, v))
    final_state, ys = jax.lax.scan(step, initial_state, xs)
    return jnp.moveaxis(ys, 0, 1).astype(r.dtype), final_state


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv6_chunked(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    u: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[Array, Array]:
    """Chunked matmul-dominant WKV6. Requires T % chunk == 0."""
    B, T, H, N = r.shape
    if T % chunk != 0:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    L = chunk
    nc = T // L
    f32 = jnp.float32

    if initial_state is None:
        z0 = jnp.zeros((B, H, N, N), f32)
    else:
        z0 = jnp.swapaxes(initial_state.astype(f32), -1, -2)  # Z = S^T

    def chunked(x):
        x = x.astype(f32)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, H, nc, L, N)

    rc, wc, kc, vc = (chunked(x) for x in (r, w_raw, k, v))

    logw = -jnp.exp(wc)
    # per-step decay floor: v6 decay is unclamped upstream, and the factored
    # exp(+-g) would overflow for |g| > ~88 per chunk; a channel decaying
    # faster than e^{-80/L} per step has zeroed its state within the chunk
    # anyway, so flooring is semantically negligible
    logw = jnp.maximum(logw, -80.0 / L)
    g = jnp.cumsum(logw, axis=-2)
    g_prev = g - logw
    g_last = g[..., -1:, :]

    r_t = rc * jnp.exp(g_prev)  # query sees state BEFORE this step's decay
    k_h = kc * jnp.exp(-g)
    k_bar = kc * jnp.exp(g_last - g)

    mm = functools.partial(jnp.matmul, preferred_element_type=f32)
    tt = lambda x: jnp.swapaxes(x, -1, -2)
    strict = jnp.tril(jnp.ones((L, L), f32), -1)

    sk = mm(r_t, tt(k_h)) * strict  # [.., L, L]
    bonus = jnp.sum(u.astype(f32)[None, :, None, None, :] * kc * rc, axis=-1, keepdims=True)
    y_loc = mm(sk, vc) + bonus * vc  # [.., L, Nv]
    h_loc = mm(tt(k_bar), vc)  # [.., Nk, Nv]
    p_last = jnp.exp(g_last)

    def scan_chunk(z, inputs):
        q_c, yl_c, hl_c, pl_c = inputs
        y_c = mm(q_c, z) + yl_c
        z = pl_c.reshape(B, H, N, 1) * z + hl_c
        return z, y_c

    xs = tuple(jnp.moveaxis(x, 2, 0) for x in (r_t, y_loc, h_loc, p_last))
    z_final, ys = jax.lax.scan(scan_chunk, z0, xs)

    ys = jnp.moveaxis(ys, 0, 2)
    y = jnp.transpose(ys.reshape(B, H, T, N), (0, 2, 1, 3))
    return y.astype(r.dtype), jnp.swapaxes(z_final, -1, -2)


# ---------------------------------------------------------------------------
# Dispatching entry point: fused Pallas forward on TPU, jnp-chunked gradients
# (same structure as ops.wkv7)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wkv6_cv_chunked(chunk, r, w_raw, k, v, u, initial_state):
    return wkv6_chunked(r, w_raw, k, v, u, initial_state, chunk=chunk)


def _cv6_chunked_fwd(chunk, r, w_raw, k, v, u, initial_state):
    out = wkv6_chunked(r, w_raw, k, v, u, initial_state, chunk=chunk)
    return out, (r, w_raw, k, v, u, initial_state)


def _cv6_chunked_bwd(chunk, residuals, cotangents):
    _, vjp = jax.vjp(
        lambda r, w, k, v, u, s: wkv6_chunked(r, w, k, v, u, s, chunk=chunk),
        *residuals,
    )
    return vjp(cotangents)


_wkv6_cv_chunked.defvjp(_cv6_chunked_fwd, _cv6_chunked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wkv6_cv_pallas(chunk, r, w_raw, k, v, u, initial_state):
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas

    return wkv6_pallas(r, w_raw, k, v, u, initial_state, chunk=chunk)


def _cv6_pallas_fwd(chunk, r, w_raw, k, v, u, initial_state):
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas_fwd_res

    y, s, zin = wkv6_pallas_fwd_res(r, w_raw, k, v, u, initial_state, chunk=chunk)
    return (y, s), (r, w_raw, k, v, u, zin, initial_state)


def _cv6_pallas_bwd(chunk, residuals, cotangents):
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas_bwd

    r, w_raw, k, v, u, zin, initial_state = residuals
    dy, dstate = cotangents
    grads = wkv6_pallas_bwd(r, w_raw, k, v, u, zin, dy, dstate, chunk=chunk)
    d_init = None if initial_state is None else grads[5].astype(initial_state.dtype)
    return (*grads[:5], d_init)


_wkv6_cv_pallas.defvjp(_cv6_pallas_fwd, _cv6_pallas_bwd)


def wkv6(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    u: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[Array, Array]:
    """Entry point used by the models: fully-fused Pallas forward AND backward
    on TPU ("auto"); jnp chunked elsewhere. SPMD-partitioned per (batch, head)
    under a mesh declared via ``ops.wkv7.set_wkv_spmd``. Under a declared
    sequence axis (``ops.wkv7.wkv_seq_axis``, i.e. already INSIDE a shard_map
    with T sharded) it runs the context-parallel ring (ops.wkv_sp)."""
    from visualrwkv_tpu.ops.wkv7 import (
        _IMPL_MODE,
        _SPMD_DECLINED,
        _spmd_axes,
        current_seq_axis,
    )

    seq_axis = current_seq_axis()
    if seq_axis is not None:
        from visualrwkv_tpu.ops.wkv_sp import wkv6_seq_shard

        return wkv6_seq_shard(
            r, w_raw, k, v, u, initial_state=initial_state, chunk=chunk,
            axis=seq_axis,
        )

    T = r.shape[1]
    use_pallas = _IMPL_MODE == "pallas" or (
        _IMPL_MODE == "auto" and jax.default_backend() == "tpu"
    )
    fn_cv, eff_chunk = _wkv6_cv_chunked, chunk
    if use_pallas:
        # 64 measures fastest for the wkv6 kernel (128 loses pipelining)
        for c in (64, 128, 32, 16):
            if T % c == 0:
                fn_cv, eff_chunk = _wkv6_cv_pallas, c
                break

    spmd = _spmd_axes(r.shape[0], r.shape[2])
    if spmd is None:
        return fn_cv(eff_chunk, r, w_raw, k, v, u, initial_state)
    if spmd is _SPMD_DECLINED:
        # mesh declared but axes don't divide batch/heads: use the chunked
        # jnp impl so GSPMD partitions it instead of replicating an opaque
        # Pallas custom call (see ops.wkv7._spmd_axes)
        if fn_cv is _wkv6_cv_pallas:
            import warnings

            warnings.warn(
                "wkv6: declared mesh axes do not divide batch/heads "
                f"(B={r.shape[0]}, H={r.shape[2]}); using the chunked jnp "
                "impl so GSPMD can partition it (the fused Pallas kernel "
                "would be replicated as an opaque custom call)"
            )
        return _wkv6_cv_chunked(chunk, r, w_raw, k, v, u, initial_state)

    from jax.sharding import PartitionSpec as P

    mesh, bs, hs = spmd
    B, _, H, N = r.shape
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)
    xs, ss = P(bs, None, hs, None), P(bs, hs, None, None)
    us = P(hs, None)  # bonus u is per-head [H, N]
    f = jax.shard_map(
        functools.partial(fn_cv, eff_chunk),
        mesh=mesh,
        in_specs=(xs, xs, xs, xs, us, ss),
        out_specs=(xs, ss),
        check_vma=False,
    )
    return f(r, w_raw, k, v, u, initial_state)
