"""Fused Pallas TPU kernels for the chunked WKV7 forward AND backward.

The jnp chunked implementation (wkv7.py) materializes ~6 decay-adjusted
intermediates per chunk in HBM; these kernels fuse the whole per-chunk
pipeline in VMEM.  Per group of G heads the sequence's chunks run as the inner
grid dimension with the fp32 state Z = S^T carried in a VMEM scratch across
grid steps (TPU grid iteration is sequential), so HBM traffic is exactly: read
r/w/k/v/a/b once (bf16), write y once, plus one [N,N] state in/out.  All math
is head-BATCHED dot_generals (~1.6x over an unrolled per-head loop).

The backward is the hand-derived VJP of the chunk equations: the forward
checkpoints each chunk's input state (the TPU analog of the CUDA kernel's
_CHUNK_LEN_ state saves, wkv7_cuda.cu:44-50), and the backward walks chunks in
reverse carrying the state cotangent in VMEM, recomputing per-chunk quantities
and emitting all seven gradients in one kernel.  Wired through
``ops.wkv7.wkv7``'s custom_vjp on TPU; CPU uses the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# 16 is the dispatcher's stability cap for the SOLVE length (ops/wkv7.py):
# longer explicit (I-M)^{-1} inverses amplify bf16 input rounding — 32 NaN'd
# real training (tests/test_wkv7_stability.py). The KERNEL chunk may exceed
# it via the block-substitution solve (`solve` kwarg / _btri_solve); the
# dispatcher defaults to kernel chunk 32 with solve 16.
DEFAULT_CHUNK = 16


def _tri_inverse(m_strict: Array, L: int) -> Array:
    """(I - M)^{-1} for strictly-lower-triangular M via the nilpotent doubling
    identity — all full-size matmuls, which Mosaic schedules better than a
    block-recursive inversion (measured: recursion's concats/slices lose more
    to lane shuffles than they save in FLOPs)."""
    eye = jnp.eye(L, dtype=jnp.float32)
    t = eye + m_strict
    p = m_strict
    steps = max(0, (L - 1).bit_length() - 1)
    for _ in range(steps):
        p = jnp.dot(p, p, preferred_element_type=jnp.float32)
        t = jnp.dot(t, eye + p, preferred_element_type=jnp.float32)
    return t


def _bdot(a: Array, b: Array) -> Array:
    """Batched matmul over a leading G dim (one MXU stream per program; the
    batched form measures ~15% faster than an unrolled per-head loop)."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _btr(x: Array) -> Array:
    return x.transpose(0, 2, 1)


def _btri_inverse(m_strict: Array, L: int) -> Array:
    """Batched (I - M)^{-1} (doubling) over [G, L, L]."""
    eye = jnp.eye(L, dtype=jnp.float32)
    t = eye + m_strict
    p = m_strict
    steps = max(0, (L - 1).bit_length() - 1)
    for _ in range(steps):
        p = _bdot(p, p)
        t = _bdot(t, eye + p)
    return t


def _btri_solve(m_strict: Array, rhs: Array, L: int, S: int) -> Array:
    """u = (I - M)^{-1} rhs via BLOCK forward substitution with length-``S``
    diagonal solves: u_i = T_ii (rhs_i + sum_{j<i} M_ij u_j).

    The explicit inverse is only ever materialized for the S x S diagonal
    blocks, whose entries stay within fp32's cancellation budget — the
    cross-block terms go through the BOUNDED u_j instead of through the
    combinatorially-growing entries of the full T. Measured on the
    adversarial sign-alternating construction (docs/wkv_chunk_stability.md):
    L=32 full doubling errs 3.5e4, L=32/64 with S=16 block substitution errs
    2.9e-3 — IDENTICAL to the plain chunk-16 path. This is what lets the
    kernel chunk grow past the stability cap: the cap applies to the SOLVE
    length, not the chunk length."""
    if S >= L:
        return _bdot(_btri_inverse(m_strict, L), rhs)
    n = L // S
    us = []
    for i in range(n):
        q = rhs[:, i * S:(i + 1) * S]
        for j in range(i):
            q = q + _bdot(m_strict[:, i * S:(i + 1) * S, j * S:(j + 1) * S], us[j])
        t_ii = _btri_inverse(m_strict[:, i * S:(i + 1) * S, i * S:(i + 1) * S], S)
        us.append(_bdot(t_ii, q))
    return jnp.concatenate(us, axis=1)


def _btri_solve_t(m_strict: Array, du: Array, L: int, S: int) -> Array:
    """dq = (I - M)^{-T} du — the transposed solve for the backward, by the
    same block substitution run in reverse block order (strictly UPPER
    triangular system): dq_i = T_ii^T (du_i + sum_{j>i} M_ji^T dq_j)."""
    if S >= L:
        return _bdot(_btr(_btri_inverse(m_strict, L)), du)
    n = L // S
    dqs = [None] * n
    for i in reversed(range(n)):
        q = du[:, i * S:(i + 1) * S]
        for j in range(i + 1, n):
            q = q + _bdot(_btr(m_strict[:, j * S:(j + 1) * S, i * S:(i + 1) * S]),
                          dqs[j])
        t_ii = _btri_inverse(m_strict[:, i * S:(i + 1) * S, i * S:(i + 1) * S], S)
        dqs[i] = _bdot(_btr(t_ii), q)
    return jnp.concatenate(dqs, axis=1)


def _wkv7_chunk_math(z, r, w, k, v, a, b, *, L: int, mxu_dtype,
                     solve: int = 0):
    """One chunk of the fused forward on VALUES (all [G, L, N] fp32 except v
    [G, L, N] in mxu_dtype; z [G, N_k, N_v] fp32).  Returns (y fp32-ish, z).
    Shared by the head-layout and packed-lane kernels.

    ``solve`` (default min(L, 16)) is the length of the stable diagonal
    solves inside the (I - M)^{-1} block substitution — the stability
    envelope is set by ``solve``, NOT by ``L`` (see _btri_solve), so the
    chunk can be 32+ for MXU/bandwidth efficiency while keeping the
    envelope of the capped solve."""
    f32 = jnp.float32
    bf = mxu_dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    cum = (cols <= rows).astype(f32)  # cumsum-as-matmul (no Mosaic cumsum)
    strict = (cols < rows).astype(f32)
    incl = cum

    logw = -jnp.exp(w)  # [G, L, N]
    g = jnp.einsum("ts,gsn->gtn", cum, logw, preferred_element_type=f32)
    g_prev = g - logw
    g_last = g[:, -1:, :]

    a_t = (a * jnp.exp(g_prev)).astype(bf)
    b_h = (b * jnp.exp(-g)).astype(bf)
    k_h = (k * jnp.exp(-g)).astype(bf)
    r_t = (r * jnp.exp(g)).astype(bf)
    decay_to_end = jnp.exp(g_last - g)
    b_bar = (b * decay_to_end).astype(bf)
    k_bar = (k * decay_to_end).astype(bf)

    # NOTE: merging paired dots into wider [L,2L] dots via concat was measured
    # SLOWER (3.17 vs 2.34 ms) — Mosaic's concat copies outweigh the MXU fill.
    #
    # STABILITY: the forward-substitution pipeline (M -> T=(I-M)^{-1} -> U) is
    # cancellation-sensitive: rounding in M is amplified ~prod(1+|m|) over the
    # chunk. M/T/U therefore stay fp32 (a_t32/bk from pre-cast values); only
    # the bounded output/state dots use bf16 operands. Even in fp32, explicit
    # inverses beyond 16 amplify bf16 INPUT rounding into garbage when k is
    # near-constant over the chunk (|m| ~= a_gate, decay ~= 1 — exactly the
    # post-first-optimizer-step regime) — hence the block-substitution solve
    # below with the dispatcher-capped S.
    a_t32 = a * jnp.exp(g_prev)
    b_h32 = b * jnp.exp(-g)
    k_h32 = k * jnp.exp(-g)
    m_mat = _bdot(a_t32, _btr(b_h32)) * strict
    n_mat = _bdot(a_t32, _btr(k_h32)) * strict

    zb = z.astype(bf)
    S = solve if solve else min(L, 16)
    u = _btri_solve(m_mat, _bdot(n_mat, v.astype(f32)) + _bdot(a_t32, z), L, S)
    sb = (_bdot(r_t, _btr(b_h)) * incl).astype(bf)
    sk = (_bdot(r_t, _btr(k_h)) * incl).astype(bf)
    ub = u.astype(bf)
    y = _bdot(r_t, zb) + _bdot(sb, ub) + _bdot(sk, v)
    z = _btr(jnp.exp(g_last)) * z + _bdot(_btr(b_bar), ub) + _bdot(_btr(k_bar), v)
    return y, z


def _wkv7_kernel(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                 y_ref, s_out_ref, z_scratch, *, L: int, nc: int, G: int,
                 mxu_dtype, block: int = 1, zin_ref=None, solve: int = 0):
    """One grid step processes ``block`` consecutive length-``L`` chunks.

    The sub-chunks run the EXACT chunk-L math sequentially (state threaded
    through the contractive S-update), so outputs are bit-identical to
    block=1 at the same L — the stability envelope is that of L, not L*block
    (docs/wkv_chunk_stability.md) — while grid steps (per-program fixed work,
    DMA setup) shrink by the block factor.

    When ``zin_ref`` is given (fwd_res), every sub-chunk's INPUT state is
    checkpointed — the residual stream is identical to block=1, so the
    backward never recomputes (measured: a recompute-based backward lost
    more to the extra chunk math than blocking saved)."""
    c = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(c == 0)
    def _():
        z_scratch[:] = init_ref[:]

    # All G heads processed as BATCHED dots (one program = G heads).
    # For bf16 inputs, MXU dots take bf16 operands with fp32 accumulation (the
    # reference CUDA kernel's precision model); fp32 inputs keep fp32 dots.
    z = z_scratch[...]
    for i in range(block):
        if zin_ref is not None:
            zin_ref[:, i] = z
        sl = slice(i * L, (i + 1) * L)
        y, z = _wkv7_chunk_math(
            z,
            r_ref[:, sl].astype(f32), w_ref[:, sl].astype(f32),
            k_ref[:, sl].astype(f32), v_ref[:, sl].astype(mxu_dtype),
            a_ref[:, sl].astype(f32), b_ref[:, sl].astype(f32),
            L=L, mxu_dtype=mxu_dtype, solve=solve,
        )
        y_ref[:, sl] = y.astype(y_ref.dtype)
    z_scratch[...] = z

    @pl.when(c == nc - 1)
    def _():
        s_out_ref[...] = z


@functools.partial(jax.jit, static_argnames=("chunk", "block", "solve"))
def wkv7_pallas(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    a: Array,
    b: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
    block: int = 1,
    solve: int = 0,
) -> Tuple[Array, Array]:
    """Fused forward. Same semantics as wkv7_chunked; T % (chunk*block) == 0.

    ``block`` packs that many length-``chunk`` solves into one grid step —
    bit-identical outputs, fewer grid steps (see _wkv7_kernel)."""
    B, T, H, N = r.shape
    if T % (chunk * block) != 0:
        raise ValueError(f"T={T} must be a multiple of chunk*block={chunk * block}")
    L = chunk
    Lo = chunk * block
    nc = T // Lo
    BH = B * H

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf, af, bf = (flat(x) for x in (r, w_raw, k, v, a, b))
    if initial_state is None:
        z0 = jnp.zeros((BH, N, N), jnp.float32)
    else:
        z0 = jnp.swapaxes(initial_state.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    G = _pick_g(BH, L, N, fp32_bufs=12, io_L=Lo)

    in_spec = pl.BlockSpec((G, Lo, N), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)

    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32
    y, s_out = pl.pallas_call(
        functools.partial(_wkv7_kernel, L=L, nc=nc, G=G, mxu_dtype=mxu_dtype,
                          block=block, solve=solve),
        grid=(BH // G, nc),
        in_specs=[state_spec] + [in_spec] * 6,
        out_specs=(in_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, N), r.dtype),
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, rf, wf, kf, vf, af, bf)

    y = jnp.transpose(y.reshape(B, H, T, N), (0, 2, 1, 3))
    final_state = jnp.swapaxes(s_out.reshape(B, H, N, N), -1, -2)
    return y, final_state


# ---------------------------------------------------------------------------
# Packed-lane forward: head pairs share the 128-lane minor dim
# ---------------------------------------------------------------------------


def _wkv7_kernel_packed(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                        y_ref, s_out_ref, z_scratch, *, L: int, nc: int,
                        G2: int, mxu_dtype):
    """Same math as _wkv7_kernel for 2*G2 heads, with all HBM streams packed
    [G2, L, 2N]: the 64-lane minor of the head layout pads to 128 on TPU (a
    measured 2.0x tax on every kernel stream); packing adjacent head pairs
    side-by-side on the lane dim makes every DMA full-width.  The
    elementwise decay pipeline runs packed; only the MXU dots split into
    per-head [.., N] halves (aligned lane slices + axis-0 concat, which
    Mosaic lowers — unlike the [G, L/2, 128] -> [G, L, 64] bitcast relayout
    recorded as a negative result in PROGRESS round 2)."""
    c = pl.program_id(1)
    f32 = jnp.float32
    N = r_ref.shape[-1] // 2

    @pl.when(c == 0)
    def _():
        z_scratch[:] = init_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    cum = (cols <= rows).astype(f32)
    strict = (cols < rows).astype(f32)
    incl = cum

    bf = mxu_dtype

    def split(x):  # [G2, S, 2N] -> [2*G2, S, N]
        return jnp.concatenate([x[:, :, :N], x[:, :, N:]], axis=0)

    def unsplit(x):  # [2*G2, S, N] -> [G2, S, 2N]
        return jnp.concatenate([x[:G2], x[G2:]], axis=2)

    r = r_ref[...].astype(f32)
    w = w_ref[...].astype(f32)
    k = k_ref[...].astype(f32)
    vp = v_ref[...].astype(bf)
    a = a_ref[...].astype(f32)
    b = b_ref[...].astype(f32)

    # packed elementwise pipeline ([G2, L, 2N]; lanes are independent)
    logw = -jnp.exp(w)
    g = jnp.einsum("ts,gsn->gtn", cum, logw, preferred_element_type=f32)
    g_prev = g - logw
    g_last = g[:, -1:, :]
    eg, eng = jnp.exp(g), jnp.exp(-g)
    a_t32 = a * jnp.exp(g_prev)
    b_h32 = b * eng
    k_h32 = k * eng
    decay_to_end = jnp.exp(g_last - g)

    # per-head splits for the contraction-over-N dots
    a_ts = split(a_t32)
    b_hs = split(b_h32)
    k_hs = split(k_h32)
    r_ts = split((r * eg)).astype(bf)
    b_bars = split(b * decay_to_end).astype(bf)
    k_bars = split(k * decay_to_end).astype(bf)
    v = split(vp)

    m_mat = _bdot(a_ts, _btr(b_hs)) * strict
    n_mat = _bdot(a_ts, _btr(k_hs)) * strict
    t_inv = _btri_inverse(m_mat, L)

    z = split(z_scratch[...])  # [2*G2, N_k, N_v] fp32
    zb = z.astype(bf)
    u = _bdot(t_inv, _bdot(n_mat, v.astype(f32)) + _bdot(a_ts, z))
    sb = (_bdot(r_ts, _btr(b_hs.astype(bf))) * incl).astype(bf)
    sk = (_bdot(r_ts, _btr(k_hs.astype(bf))) * incl).astype(bf)
    ub = u.astype(bf)
    y = _bdot(r_ts, zb) + _bdot(sb, ub) + _bdot(sk, v)
    y_ref[...] = unsplit(y).astype(y_ref.dtype)

    z = _btr(split(jnp.exp(g_last))) * z + _bdot(_btr(b_bars), ub) + _bdot(_btr(k_bars), v)
    zp = unsplit(z)
    z_scratch[...] = zp

    @pl.when(c == nc - 1)
    def _():
        s_out_ref[...] = zp


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv7_pallas_packed(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    a: Array,
    b: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[Array, Array]:
    """Packed-lane fused forward (head pairs on the 128-lane minor).  Same
    semantics as :func:`wkv7_pallas`; requires an even head count."""
    B, T, H, N = r.shape
    if H % 2:
        raise ValueError(f"packed layout needs an even head count, got H={H}")
    if T % chunk != 0:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    L = chunk
    nc = T // L
    BH2 = B * H // 2

    def pack(x):
        # [B,T,H,N] -> [B,T,H/2,2N] is free (lane-contiguous); then the same
        # transpose the head layout pays
        x = x.reshape(B, T, H // 2, 2 * N)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH2, T, 2 * N)

    rf, wf, kf, vf, af, bf = (pack(x) for x in (r, w_raw, k, v, a, b))
    if initial_state is None:
        z0 = jnp.zeros((BH2, N, 2 * N), jnp.float32)
    else:
        # [B,H,Nv,Nk] -> Z=S^T [B,H,Nk,Nv] -> pair heads on the Nv lanes
        z = jnp.swapaxes(initial_state.astype(jnp.float32), -1, -2)
        z = z.reshape(B, H // 2, 2, N, N)
        z0 = jnp.transpose(z, (0, 1, 3, 2, 4)).reshape(BH2, N, 2 * N)

    G2 = max(1, _pick_g(BH2 * 2, L, N, fp32_bufs=12) // 2)
    while BH2 % G2:
        G2 //= 2

    in_spec = pl.BlockSpec((G2, L, 2 * N), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G2, N, 2 * N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)

    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32
    y, s_out = pl.pallas_call(
        functools.partial(_wkv7_kernel_packed, L=L, nc=nc, G2=G2, mxu_dtype=mxu_dtype),
        grid=(BH2 // G2, nc),
        in_specs=[state_spec] + [in_spec] * 6,
        out_specs=(in_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH2, T, 2 * N), r.dtype),
            jax.ShapeDtypeStruct((BH2, N, 2 * N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G2, N, 2 * N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, rf, wf, kf, vf, af, bf)

    y = jnp.transpose(y.reshape(B, H // 2, T, 2 * N), (0, 2, 1, 3)).reshape(B, T, H, N)
    s = s_out.reshape(B, H // 2, N, 2, N)
    final_state = jnp.swapaxes(
        jnp.transpose(s, (0, 1, 3, 2, 4)).reshape(B, H, N, N), -1, -2
    )
    return y, final_state


def _pack_stream(x, B, T, H, N):
    """[B,T,H,N] -> [B*H/2, T, 2N] (head pairs on the lane minor)."""
    x = x.reshape(B, T, H // 2, 2 * N)
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H // 2, T, 2 * N)


def _unpack_stream(x, B, T, H, N):
    return jnp.transpose(x.reshape(B, H // 2, T, 2 * N), (0, 2, 1, 3)).reshape(B, T, H, N)


def _pack_state_z(s, B, H, N):
    """S [B,H,Nv,Nk] -> packed Z=S^T [B*H/2, Nk, 2*Nv]."""
    z = jnp.swapaxes(s.astype(jnp.float32), -1, -2).reshape(B, H // 2, 2, N, N)
    return jnp.transpose(z, (0, 1, 3, 2, 4)).reshape(B * H // 2, N, 2 * N)


def _unpack_state_z(z, B, H, N):
    z = z.reshape(B, H // 2, N, 2, N)
    return jnp.swapaxes(jnp.transpose(z, (0, 1, 3, 2, 4)).reshape(B, H, N, N), -1, -2)


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv7_pallas_fwd_res_packed(r, w_raw, k, v, a, b, initial_state=None,
                               chunk: int = DEFAULT_CHUNK):
    """Packed-lane fwd_res: (y, final_state, PACKED chunk-input states
    [B*H/2, nc, N, 2N]) — feed zin straight into wkv7_pallas_bwd_packed."""
    B, T, H, N = r.shape
    if H % 2:
        raise ValueError(f"packed layout needs an even head count, got H={H}")
    if T % chunk != 0:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    L = chunk
    nc = T // L
    BH2 = B * H // 2

    rf, wf, kf, vf, af, bf = (_pack_stream(x, B, T, H, N) for x in (r, w_raw, k, v, a, b))
    if initial_state is None:
        z0 = jnp.zeros((BH2, N, 2 * N), jnp.float32)
    else:
        z0 = _pack_state_z(initial_state, B, H, N)

    G2 = max(1, _pick_g(BH2 * 2, L, N, fp32_bufs=12) // 2)
    while BH2 % G2:
        G2 //= 2

    in_spec = pl.BlockSpec((G2, L, 2 * N), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G2, N, 2 * N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    zin_spec = pl.BlockSpec((G2, 1, N, 2 * N), lambda bh, c: (bh, c, 0, 0), memory_space=pltpu.VMEM)
    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32

    def kernel(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
               y_ref, s_out_ref, zin_ref, z_scratch):
        c = pl.program_id(1)
        for gi in range(G2):
            @pl.when(c == 0)
            def _(gi=gi):
                zin_ref[gi, 0] = init_ref[gi]

            @pl.when(c != 0)
            def _(gi=gi):
                zin_ref[gi, 0] = z_scratch[gi]

        _wkv7_kernel_packed(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                            y_ref, s_out_ref, z_scratch, L=L, nc=nc, G2=G2,
                            mxu_dtype=mxu_dtype)

    y, s_out, zin = pl.pallas_call(
        kernel,
        grid=(BH2 // G2, nc),
        in_specs=[state_spec] + [in_spec] * 6,
        out_specs=(in_spec, state_spec, zin_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH2, T, 2 * N), r.dtype),
            jax.ShapeDtypeStruct((BH2, N, 2 * N), jnp.float32),
            jax.ShapeDtypeStruct((BH2, nc, N, 2 * N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G2, N, 2 * N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, rf, wf, kf, vf, af, bf)

    return (_unpack_stream(y, B, T, H, N), _unpack_state_z(s_out, B, H, N), zin)


def _wkv7_bwd_kernel_packed(zin_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                            dy_ref, dzf_ref,
                            dr_ref, dw_ref, dk_ref, dv_ref, da_ref, db_ref,
                            dz0_ref, dz_scratch, *, L: int, nc: int, G2: int):
    """Packed-lane backward: all 9 input + 7 output streams full-width; the
    shared fp32 VJP math (_wkv7_bwd_math) runs on per-head splits."""
    c = pl.program_id(1)
    f32 = jnp.float32
    N = r_ref.shape[-1] // 2

    @pl.when(c == 0)
    def _():
        dz_scratch[...] = dzf_ref[...]

    def split(x):
        return jnp.concatenate([x[:, :, :N], x[:, :, N:]], axis=0)

    def unsplit(x):
        return jnp.concatenate([x[:G2], x[G2:]], axis=2)

    dr, dw, dk, dv, da, db, dZ0 = _wkv7_bwd_math(
        split(zin_ref[:, 0]), split(dz_scratch[...]),
        split(r_ref[...].astype(f32)), split(w_ref[...].astype(f32)),
        split(k_ref[...].astype(f32)), split(v_ref[...].astype(f32)),
        split(a_ref[...].astype(f32)), split(b_ref[...].astype(f32)),
        split(dy_ref[...].astype(f32)), L=L,
    )

    dr_ref[...] = unsplit(dr).astype(dr_ref.dtype)
    dw_ref[...] = unsplit(dw).astype(dw_ref.dtype)
    dk_ref[...] = unsplit(dk).astype(dk_ref.dtype)
    dv_ref[...] = unsplit(dv).astype(dv_ref.dtype)
    da_ref[...] = unsplit(da).astype(da_ref.dtype)
    db_ref[...] = unsplit(db).astype(db_ref.dtype)
    dZ0p = unsplit(dZ0)
    dz_scratch[...] = dZ0p

    @pl.when(c == nc - 1)
    def _():
        dz0_ref[...] = dZ0p


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv7_pallas_bwd_packed(r, w_raw, k, v, a, b, zin, dy, dzfinal,
                           chunk: int = DEFAULT_CHUNK):
    """Packed-lane backward. ``zin`` must be the PACKED chunk-input states
    from :func:`wkv7_pallas_fwd_res_packed`. Returns grads for
    (r, w_raw, k, v, a, b, initial_state)."""
    B, T, H, N = r.shape
    if H % 2:
        raise ValueError(f"packed layout needs an even head count, got H={H}")
    if T % chunk != 0:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    L = chunk
    nc = T // L
    BH2 = B * H // 2

    rf, wf, kf, vf, af, bf, dyf = (
        _pack_stream(x, B, T, H, N) for x in (r, w_raw, k, v, a, b, dy)
    )
    dzf = _pack_state_z(dzfinal, B, H, N)

    G2 = max(1, _pick_g(BH2 * 2, L, N, fp32_bufs=36) // 2)
    while BH2 % G2:
        G2 //= 2

    in_spec = pl.BlockSpec((G2, L, 2 * N), lambda bh, c: (bh, nc - 1 - c, 0),
                           memory_space=pltpu.VMEM)
    zin_spec = pl.BlockSpec((G2, 1, N, 2 * N), lambda bh, c: (bh, nc - 1 - c, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G2, N, 2 * N), lambda bh, c: (bh, 0, 0),
                              memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_wkv7_bwd_kernel_packed, L=L, nc=nc, G2=G2),
        grid=(BH2 // G2, nc),
        in_specs=[zin_spec] + [in_spec] * 7 + [state_spec],
        out_specs=tuple([in_spec] * 6 + [state_spec]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((BH2, T, 2 * N), r.dtype)] * 6
            + [jax.ShapeDtypeStruct((BH2, N, 2 * N), jnp.float32)]
        ),
        scratch_shapes=[pltpu.VMEM((G2, N, 2 * N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(zin, rf, wf, kf, vf, af, bf, dyf, dzf)

    dr, dw, dk, dv, da, db, dz0 = outs
    return tuple(
        _unpack_stream(x, B, T, H, N) for x in (dr, dw, dk, dv, da, db)
    ) + (_unpack_state_z(dz0, B, H, N),)


# ---------------------------------------------------------------------------
# Fused decode step (T=1)
# ---------------------------------------------------------------------------


def _wkv7_step_kernel(s_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                      s_out_ref, y_ref):
    """One recurrence step for G heads; the [N,N] state is read ONCE and
    written ONCE (the jnp step costs 4 state passes: sa-reduce, update,
    y-reduce each re-read it). All math fp32; pure VPU work."""
    f32 = jnp.float32
    s = s_ref[...].astype(f32)  # [G, Nv, Nk] (carry may be bf16; math fp32)
    r = r_ref[...].astype(f32)[:, None, :]
    w = jnp.exp(-jnp.exp(w_ref[...].astype(f32)))[:, None, :]
    k = k_ref[...].astype(f32)
    v = v_ref[...].astype(f32)
    a = a_ref[...].astype(f32)[:, None, :]
    b = b_ref[...].astype(f32)[:, None, :]
    sa = jnp.sum(s * a, axis=2, keepdims=True)  # [G, Nv, 1]
    s = s * w + sa * b + v[:, :, None] * k[:, None, :]
    s_out_ref[...] = s.astype(s_out_ref.dtype)
    y_ref[...] = jnp.sum(s * r, axis=2).astype(y_ref.dtype)


def wkv7_step_pallas(state: Array, r: Array, w_raw: Array, k: Array,
                     v: Array, a: Array, b: Array) -> Tuple[Array, Array]:
    """Fused single-token WKV7 update. state [B,H,Nv,Nk] fp32; vectors [B,H,N].

    Same semantics as ops.wkv7.wkv7_step. Decode at batch is HBM-bound on the
    state (B32 H32 N64 fp32 = 16.8 MB/layer); this kernel's traffic is the
    2-pass minimum.
    """
    B, H, Nv, Nk = state.shape
    BH = B * H
    sf = state.reshape(BH, Nv, Nk)
    vecs = [x.reshape(BH, Nk) for x in (r, w_raw, k, v, a, b)]

    G = 8
    while BH % G:
        G //= 2
    state_spec = pl.BlockSpec((G, Nv, Nk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((G, Nk), lambda i: (i, 0), memory_space=pltpu.VMEM)

    s_out, y = pl.pallas_call(
        _wkv7_step_kernel,
        grid=(BH // G,),
        in_specs=[state_spec] + [vec_spec] * 6,
        out_specs=(state_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Nv, Nk), state.dtype),
            jax.ShapeDtypeStruct((BH, Nv), r.dtype),
        ),
        interpret=jax.default_backend() == "cpu",
    )(sf, *vecs)
    return s_out.reshape(B, H, Nv, Nk), y.reshape(B, H, Nv)


def _head_segment_mask(rows: int, cols: int, N: int, transpose: bool):
    """fp32 [rows, cols] block mask. Normal: rows index the flat (h, j)
    lanes, cols index heads — mask[(h, j), h'] = (h == h'). Transposed:
    mask[h', (h, j)]. Built from range compares (no integer div, which has
    no reliable Mosaic lowering)."""
    f32 = jnp.float32
    if transpose:
        h = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        hj = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    else:
        hj = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        h = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    lo = h * N
    return ((hj >= lo) & (hj < lo + N)).astype(f32)


def _wkv7_step_flat_kernel(s_ref, a_ref, wr_ref, w_ref, b_ref, k_ref,
                           vt_ref, br_ref, kr_ref, s_out_ref, yt_ref,
                           *, Gb: int, H: int, N: int):
    """Fused step on the lane-flat state [Gb, Nv, H*N] (zero lane padding).

    The per-head reductions become MXU dots against one-hot block masks:
      sa[i, h]  = s @ (a_flat * mask)        [Nv, H]
      swr[i, h] = s @ ((w*r)_flat * mask)
      s_new     = s * w_flat + sa @ (maskT * b_flat) + vT @ (maskT * k_flat)
      y[i, h]   = swr + sa * (b.r)[h] + vT * (k.r)[h]   (old-state expansion)
    One read + one write of the state; the jnp flat step loses to the head
    layout because XLA materializes PADDED [B, N, H, N] fp32 intermediates —
    here every intermediate is [Nv, H] or [Nv, H*N] flat in VMEM."""
    f32 = jnp.float32
    HN = H * N
    mask = _head_segment_mask(HN, H, N, transpose=False)  # [HN, H]
    maskT = _head_segment_mask(H, HN, N, transpose=True)  # [H, HN]
    dn = (((1,), (0,)), ((), ()))
    for g in range(Gb):
        s = s_ref[g].astype(f32)  # [Nv, HN]
        A = a_ref[g][:, None] * mask
        WR = wr_ref[g][:, None] * mask
        sa = jax.lax.dot_general(s, A, dn, preferred_element_type=f32)
        swr = jax.lax.dot_general(s, WR, dn, preferred_element_type=f32)
        vt = vt_ref[g].astype(f32)  # [Nv, H]
        yt = swr + sa * br_ref[g][None, :] + vt * kr_ref[g][None, :]
        Bexp = maskT * b_ref[g][None, :]
        Kexp = maskT * k_ref[g][None, :]
        s_new = (
            s * w_ref[g][None, :]
            + jax.lax.dot_general(sa, Bexp, dn, preferred_element_type=f32)
            + jax.lax.dot_general(vt, Kexp, dn, preferred_element_type=f32)
        )
        s_out_ref[g] = s_new.astype(s_out_ref.dtype)
        yt_ref[g] = yt


def wkv7_step_flat_pallas(state: Array, r: Array, w_raw: Array, k: Array,
                          v: Array, a: Array, b: Array) -> Tuple[Array, Array]:
    """Fused single-token WKV7 update on the lane-flat state ``[B, Nv, H*N]``.

    Combines the two measured-but-separately-losing decode options: the flat
    layout (no 64->128 lane padding: HALF the head-layout state bytes) and
    the fused kernel (one read + one write vs the jnp step's ~4 passes).
    Each lost alone — flat-jnp to XLA's padded intermediates, head-pallas to
    the custom-call fusion boundary — but the combination minimizes the HBM
    state traffic that dominates decode at large batch. Same math as
    ops.wkv7.wkv7_step_flat; carried dtype preserved; parity-tested.
    """
    B, Nv, HN = state.shape
    _, H, N = r.shape
    f32 = jnp.float32
    out_dtype = r.dtype
    rf, kf, vf, af, bf = (x.astype(f32) for x in (r, k, v, a, b))
    w = jnp.exp(-jnp.exp(w_raw.astype(f32)))
    flat = lambda x: x.reshape(B, HN)
    vt = jnp.swapaxes(vf, 1, 2)  # [B, Nv, H]
    br = jnp.sum(bf * rf, axis=-1)  # [B, H]
    kr = jnp.sum(kf * rf, axis=-1)

    Gb = 4
    while B % Gb:
        Gb //= 2
    mat_spec = pl.BlockSpec((Gb, Nv, HN), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((Gb, HN), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vt_spec = pl.BlockSpec((Gb, Nv, H), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((Gb, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s_out, yt = pl.pallas_call(
        functools.partial(_wkv7_step_flat_kernel, Gb=Gb, H=H, N=N),
        grid=(B // Gb,),
        in_specs=[mat_spec] + [vec_spec] * 5 + [vt_spec, h_spec, h_spec],
        out_specs=(mat_spec, vt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, Nv, HN), state.dtype),
            jax.ShapeDtypeStruct((B, Nv, H), f32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(state, flat(af), flat(w * rf), flat(w), flat(bf), flat(kf), vt, br, kr)
    y = jnp.swapaxes(yt, 1, 2).astype(out_dtype)  # [B, H, Nv]
    return s_out, y


# ---------------------------------------------------------------------------
# Fused backward (hand-derived VJP of the chunk equations)
# ---------------------------------------------------------------------------


def _pick_g(BH: int, L: int = 64, N: int = 64, fp32_bufs: int = 12,
            budget: int = 11 * 2**20, io_L: int = 0) -> int:
    """Heads per program, bounded by a VMEM estimate (double-buffered input
    blocks + fp32 intermediates; the backward kernel holds ~3x the forward's
    live set, so it passes a larger fp32_bufs). ``io_L`` is the tokens-per-
    grid-step IO block length when it differs from the math chunk ``L``
    (blocked kernels: io_L = L * block).

    MEASURED (v5e, B8 T2048 H16 N64 chunk 32): G=16 is 25% faster than G=8
    on the backward (3.56 vs 4.72 ms/layer, bit-identical outputs) and ~14%
    on the forward — fewer grid programs amortize the per-program fixed work
    (mask iotas, scratch IO, DMA setup). G=32 fails to compile for the
    backward (VMEM), and measures as noise vs 16 on the forward. Re-swept at
    chunk 16 round 3: {8,16,32,64} within 3% — the choice is flat there."""
    per_g = fp32_bufs * max(L * L, L * N) * 4 + 8 * max(io_L, L) * N * 2
    for cand in (16, 8, 4, 2):
        if BH % cand == 0 and cand * per_g <= budget:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("chunk", "block", "solve"))
def wkv7_pallas_fwd_res(r, w_raw, k, v, a, b, initial_state=None,
                        chunk: int = DEFAULT_CHUNK, block: int = 1,
                        solve: int = 0):
    """Forward emitting (y, final_state, chunk-input states) for the backward.

    ``block`` only re-blocks the grid: the checkpoint stream stays one state
    per CHUNK ([BH, T//chunk, N, N], identical to block=1), so the backward
    reads states instead of recomputing them."""
    B, T, H, N = r.shape
    if T % (chunk * block) != 0:
        raise ValueError(f"T={T} must be a multiple of chunk*block={chunk * block}")
    L = chunk
    Lo = chunk * block
    nc = T // Lo
    BH = B * H

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf, af, bf = (flat(x) for x in (r, w_raw, k, v, a, b))
    if initial_state is None:
        z0 = jnp.zeros((BH, N, N), jnp.float32)
    else:
        z0 = jnp.swapaxes(initial_state.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    G = _pick_g(BH, L, N, fp32_bufs=12, io_L=Lo)
    in_spec = pl.BlockSpec((G, Lo, N), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    zin_spec = pl.BlockSpec((G, block, N, N), lambda bh, c: (bh, c, 0, 0),
                            memory_space=pltpu.VMEM)
    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32

    def kernel(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
               y_ref, s_out_ref, zin_ref, z_scratch):
        _wkv7_kernel(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                     y_ref, s_out_ref, z_scratch, L=L, nc=nc, G=G,
                     mxu_dtype=mxu_dtype, block=block, zin_ref=zin_ref,
                     solve=solve)

    y, s_out, zin = pl.pallas_call(
        kernel,
        grid=(BH // G, nc),
        in_specs=[state_spec] + [in_spec] * 6,
        out_specs=(in_spec, state_spec, zin_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, N), r.dtype),
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
            jax.ShapeDtypeStruct((BH, T // L, N, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, rf, wf, kf, vf, af, bf)

    y = jnp.transpose(y.reshape(B, H, T, N), (0, 2, 1, 3))
    final_state = jnp.swapaxes(s_out.reshape(B, H, N, N), -1, -2)
    return y, final_state, zin


def _wkv7_bwd_math(Z0, dZ1, r, w, k, v, a, b, dY, *, L: int, solve: int = 0):
    """One chunk of the hand-derived VJP on VALUES (all fp32).  Returns
    (dr, dw, dk, dv, da, db, dZ0).  Shared by the head-layout and
    packed-lane backward kernels.  ``solve`` as in _wkv7_chunk_math: the
    forward and transposed (I-M) solves run as length-``solve`` block
    substitutions, keeping the backward's stability envelope equal to the
    forward's at any chunk length."""
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    cum = (cols <= rows).astype(f32)
    strict = (cols < rows).astype(f32)
    il = cum

    # ---- recompute forward chunk quantities (batched over G) ----
    logw = -jnp.exp(w)
    g = jnp.einsum("ts,gsn->gtn", cum, logw, preferred_element_type=f32)
    g_prev = g - logw
    g_last = g[:, -1:, :]
    e_gp = jnp.exp(g_prev)
    e_ng = jnp.exp(-g)
    e_g = jnp.exp(g)
    e_tail = jnp.exp(g_last - g)
    e_gl = jnp.exp(g_last)  # [G, 1, N]

    at = a * e_gp
    bh_ = b * e_ng
    kh = k * e_ng
    rt = r * e_g
    bbar = b * e_tail
    kbar = k * e_tail

    S = solve if solve else min(L, 16)
    m_mat = _bdot(at, _btr(bh_)) * strict
    n_mat = _bdot(at, _btr(kh)) * strict
    w_pre = _bdot(n_mat, v) + _bdot(at, Z0)
    u = _btri_solve(m_mat, w_pre, L, S)
    sb = _bdot(rt, _btr(bh_)) * il
    sk = _bdot(rt, _btr(kh)) * il

    # ---- VJP ----
    # For u = A^{-1} w (A = I - M): dw = A^{-T} du and dM = -dA = dw u^T —
    # two solves total; the earlier T^T (du w^T) T^T route costs two extra
    # LxL matmuls AND materializes the ill-conditioned explicit T.
    dU = _bdot(_btr(sb), dY) + _bdot(bbar, dZ1)
    dWpre = _btri_solve_t(m_mat, dU, L, S)
    dM = _bdot(dWpre, _btr(u)) * strict
    dN = _bdot(dWpre, _btr(v)) * strict
    dV = _bdot(_btr(sk), dY) + _bdot(kbar, dZ1) + _bdot(_btr(n_mat), dWpre)
    dAt = _bdot(dWpre, _btr(Z0)) + _bdot(dM, bh_) + _bdot(dN, kh)
    dBh = _bdot(_btr(dM), at)
    dKh = _bdot(_btr(dN), at)
    dSB = _bdot(dY, _btr(u)) * il
    dSK = _bdot(dY, _btr(v)) * il
    dRt = _bdot(dY, _btr(Z0)) + _bdot(dSB, bh_) + _bdot(dSK, kh)
    dBh = dBh + _bdot(_btr(dSB), rt)
    dKh = dKh + _bdot(_btr(dSK), rt)
    dBbar = _bdot(u, _btr(dZ1))
    dKbar = _bdot(v, _btr(dZ1))
    dZ0 = _bdot(_btr(rt), dY) + _btr(e_gl) * dZ1 + _bdot(_btr(at), dWpre)

    # ---- raw-input grads ----
    da = dAt * e_gp
    db = dBh * e_ng + dBbar * e_tail
    dk = dKh * e_ng + dKbar * e_tail
    dr = dRt * e_g
    dv = dV

    dg = rt * dRt - bh_ * dBh - kh * dKh - bbar * dBbar - kbar * dKbar
    dg_prev = at * dAt
    dgl = jnp.sum(bbar * dBbar + kbar * dKbar, axis=1, keepdims=True) + (
        e_gl * _btr(jnp.sum(dZ1 * Z0, axis=2, keepdims=True))
    )
    # dlogw_s = sum_{t>=s} dg_t + sum_{t>s} dg_prev_t + dgl
    dlw = (
        jnp.einsum("ts,gtn->gsn", cum, dg, preferred_element_type=f32)
        + jnp.einsum("ts,gtn->gsn", strict, dg_prev, preferred_element_type=f32)
        + dgl
    )
    dw = dlw * (-jnp.exp(w))  # d logw / d w_raw = -e^{w_raw}
    return dr, dw, dk, dv, da, db, dZ0


def _wkv7_bwd_kernel(zin_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                     dy_ref, dzf_ref,
                     dr_ref, dw_ref, dk_ref, dv_ref, da_ref, db_ref, dz0_ref,
                     dz_scratch, *, L: int, nc: int, G: int,
                     block: int = 1, solve: int = 0):
    """Reverse-chunk-order VJP. Grid step c processes chunk nc-1-c; the state
    cotangent dZ is carried in VMEM scratch. All math fp32 (gradients are
    precision-sensitive; the CUDA backward also accumulates in fp32).

    With ``block`` > 1 the grid step covers ``block`` chunks; every chunk's
    input state is in the checkpoint stream (fwd_res saves them densely), so
    the kernel just walks the sub-chunks in reverse carrying dZ — no
    recompute (a recompute-based variant measured SLOWER than block=1: the
    extra chunk math outweighed the grid-overhead saving)."""
    c = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(c == 0)  # grid step 0 = LAST chunk: seed with d(final state)
    def _():
        dz_scratch[...] = dzf_ref[...]

    dZ = dz_scratch[...]
    for i in reversed(range(block)):
        sl = slice(i * L, (i + 1) * L)
        dr, dw, dk, dv, da, db, dZ = _wkv7_bwd_math(
            zin_ref[:, i], dZ,
            r_ref[:, sl].astype(f32), w_ref[:, sl].astype(f32),
            k_ref[:, sl].astype(f32), v_ref[:, sl].astype(f32),
            a_ref[:, sl].astype(f32), b_ref[:, sl].astype(f32),
            dy_ref[:, sl].astype(f32), L=L, solve=solve,
        )
        dr_ref[:, sl] = dr.astype(dr_ref.dtype)
        dw_ref[:, sl] = dw.astype(dw_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)
        da_ref[:, sl] = da.astype(da_ref.dtype)
        db_ref[:, sl] = db.astype(db_ref.dtype)
    dz_scratch[...] = dZ

    @pl.when(c == nc - 1)  # grid last = FIRST chunk: d(initial state)
    def _():
        dz0_ref[...] = dZ


@functools.partial(jax.jit, static_argnames=("chunk", "block", "solve"))
def wkv7_pallas_bwd(r, w_raw, k, v, a, b, zin, dy, dzfinal,
                    chunk: int = DEFAULT_CHUNK, block: int = 1,
                    solve: int = 0):
    """Backward from the dense per-chunk saved states ([BH, T//chunk, N, N],
    as emitted by fwd_res at any block factor). Returns grads for
    (r, w_raw, k, v, a, b, initial_state)."""
    B, T, H, N = r.shape
    if T % (chunk * block) != 0:
        raise ValueError(f"T={T} must be a multiple of chunk*block={chunk * block}")
    L = chunk
    Lo = chunk * block
    nc = T // Lo
    BH = B * H

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf, af, bf, dyf = (flat(x) for x in (r, w_raw, k, v, a, b, dy))
    dzf = jnp.swapaxes(dzfinal.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    G = _pick_g(BH, L, N, fp32_bufs=36, io_L=Lo)
    # reversed chunk order: grid step c reads/writes chunk nc-1-c
    in_spec = pl.BlockSpec((G, Lo, N), lambda bh, c: (bh, nc - 1 - c, 0),
                           memory_space=pltpu.VMEM)
    zin_spec = pl.BlockSpec((G, block, N, N), lambda bh, c: (bh, nc - 1 - c, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, c: (bh, 0, 0),
                              memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        # no mxu_dtype: the backward is all-fp32 (gradients are precision-
        # sensitive; the CUDA backward accumulates fp32 too)
        functools.partial(_wkv7_bwd_kernel, L=L, nc=nc, G=G, block=block,
                          solve=solve),
        grid=(BH // G, nc),
        in_specs=[zin_spec] + [in_spec] * 7 + [state_spec],
        out_specs=tuple([in_spec] * 6 + [state_spec]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((BH, T, N), r.dtype)] * 6
            + [jax.ShapeDtypeStruct((BH, N, N), jnp.float32)]
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(zin, rf, wf, kf, vf, af, bf, dyf, dzf)

    dr, dw, dk, dv, da, db, dz0 = outs

    def unflat(x):
        return jnp.transpose(x.reshape(B, H, T, N), (0, 2, 1, 3))

    d_initial = jnp.swapaxes(dz0.reshape(B, H, N, N), -1, -2)
    return (unflat(dr), unflat(dw), unflat(dk), unflat(dv), unflat(da),
            unflat(db), d_initial)


# ---------------------------------------------------------------------------
# v2 forward: chunk-local work batched across chunks (serving prefill)
# ---------------------------------------------------------------------------
#
# The v1 kernel runs one grid program per (head-group, chunk); each program
# issues ~30 small ops on [L,N] tiles, and Mosaic executes grid programs
# sequentially -- suspected op-granularity bound (G sweeps 4..64 move it ~3%).
# v2 processes a whole T-block (nb chunks) per program: every chunk-LOCAL
# quantity (decay adjustments, M/N matrices, T-inverse, local outputs) is
# computed with dots batched over [G*nb], leaving only the boundary
# recurrence sequential.
#
# MEASURED (v5e, B8 T512 H32 N64, scan-chained): v1 1.78 ms/layer; v2 best
# 1.62 ms/layer (t_block=512, g_heads=4) -- only ~9%: the sequential per-chunk
# boundary tail (VMEM-scratch round-trips + reshapes) absorbs most of what
# the batched local phase saves. NOT dispatched by default; kept as the
# measured record of this design point for future kernel work.


def _wkv7_v2_kernel(init_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                    y_ref, s_out_ref, z_scratch, *, L: int, nb: int, nt: int,
                    G: int, mxu_dtype):
    t = pl.program_id(1)
    f32 = jnp.float32
    bf = mxu_dtype
    GB = G * nb

    @pl.when(t == 0)
    def _():
        z_scratch[:] = init_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    cum = (cols <= rows).astype(f32)
    strict = (cols < rows).astype(f32)
    incl = cum

    def chunked(ref, dt):
        x = ref[...].astype(dt)  # [G, Tblk, N]
        return x.reshape(GB, L, -1)

    r = chunked(r_ref, f32)
    w = chunked(w_ref, f32)
    k = chunked(k_ref, f32)
    v = chunked(v_ref, bf)
    a = chunked(a_ref, f32)
    b = chunked(b_ref, f32)
    N = r.shape[-1]

    logw = -jnp.exp(w)  # [GB, L, N]
    g = jnp.einsum("ts,gsn->gtn", cum, logw, preferred_element_type=f32)
    g_prev = g - logw
    g_last = g[:, -1:, :]

    e_g = jnp.exp(g)
    e_ng = jnp.exp(-g)
    e_tail = jnp.exp(g_last - g)

    a_t32 = a * jnp.exp(g_prev)
    b_h32 = b * e_ng
    k_h32 = k * e_ng
    r_t = (r * e_g).astype(bf)
    b_bar = (b * e_tail).astype(bf)
    k_bar = (k * e_tail).astype(bf)
    b_h = b_h32.astype(bf)
    k_h = k_h32.astype(bf)
    a_tb = a_t32.astype(bf)

    # batched over GB: the op count is O(1) in nb instead of O(nb)
    m_mat = _bdot(a_t32, _btr(b_h32)) * strict
    n_mat = _bdot(a_t32, _btr(k_h32)) * strict
    t_inv = _btri_inverse(m_mat, L).astype(bf)

    nv = _bdot(n_mat.astype(bf), v).astype(bf)
    sb = (_bdot(r_t, _btr(b_h)) * incl).astype(bf)
    sk = (_bdot(r_t, _btr(k_h)) * incl).astype(bf)
    ta = _bdot(t_inv, a_tb).astype(bf)      # [GB, L, N]
    tu = _bdot(t_inv, nv).astype(bf)        # [GB, L, Nv] local part of U
    y_loc = (_bdot(sb, tu) + _bdot(sk, v)).astype(bf)
    q_eff = (r_t.astype(f32) + _bdot(sb, ta)).astype(bf)
    bta = _bdot(_btr(b_bar), ta).astype(bf)  # [GB, N, N]
    h_loc = (_bdot(_btr(b_bar), tu) + _bdot(_btr(k_bar), v)).astype(bf)
    p_last = jnp.exp(g_last)  # [GB, 1, N]

    # sequential boundary recurrence: 2 dots + 1 dot per chunk
    for c in range(nb):
        z = z_scratch[...]  # [G, N, N] fp32
        sl = lambda x: x.reshape(G, nb, L, -1)[:, c]
        y_c = _bdot(sl(q_eff), z.astype(bf)) + sl(y_loc)
        y_ref[:, c * L : (c + 1) * L, :] = y_c.astype(y_ref.dtype)
        zn = (
            p_last.reshape(G, nb, 1, N)[:, c].transpose(0, 2, 1) * z
            + _bdot(bta.reshape(G, nb, N, N)[:, c].astype(bf), z.astype(bf))
            + h_loc.reshape(G, nb, N, -1)[:, c]
        )
        z_scratch[...] = zn

    @pl.when(t == nt - 1)
    def _():
        s_out_ref[...] = z_scratch[...]


@functools.partial(jax.jit, static_argnames=("chunk", "t_block", "g_heads"))
def wkv7_pallas_v2(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    a: Array,
    b: Array,
    initial_state: Optional[Array] = None,
    chunk: int = 32,
    t_block: int = 256,
    g_heads: int = 4,
) -> Tuple[Array, Array]:
    """Chunk-batched fused forward. Same semantics as wkv7_pallas.
    Requires T % t_block == 0 and t_block % chunk == 0."""
    B, T, H, N = r.shape
    L = chunk
    if T % t_block or t_block % L:
        raise ValueError(f"T={T} must tile by t_block={t_block} (chunk {L})")
    nb = t_block // L
    nt = T // t_block
    BH = B * H
    G = g_heads
    while BH % G:
        G //= 2

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf, af, bf_ = (flat(x) for x in (r, w_raw, k, v, a, b))
    if initial_state is None:
        z0 = jnp.zeros((BH, N, N), jnp.float32)
    else:
        z0 = jnp.swapaxes(initial_state.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    in_spec = pl.BlockSpec((G, t_block, N), lambda bh, t: (bh, t, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, t: (bh, 0, 0), memory_space=pltpu.VMEM)
    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32

    y, s_out = pl.pallas_call(
        functools.partial(_wkv7_v2_kernel, L=L, nb=nb, nt=nt, G=G, mxu_dtype=mxu_dtype),
        grid=(BH // G, nt),
        in_specs=[state_spec] + [in_spec] * 6,
        out_specs=(in_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, N), r.dtype),
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, rf, wf, kf, vf, af, bf_)

    y = jnp.transpose(y.reshape(B, H, T, N), (0, 2, 1, 3))
    final_state = jnp.swapaxes(s_out.reshape(B, H, N, N), -1, -2)
    return y, final_state
