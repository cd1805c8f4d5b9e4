"""Fused Pallas TPU kernel for the chunked WKV6 forward.

Same architecture as the WKV7 kernel (wkv7_pallas.py) with the simpler
diagonal-decay recurrence: grid (BH/G, nc) with chunks as the inner dim, fp32
state Z = S^T in VMEM scratch, cumsum-as-matmul, bf16 MXU dots with fp32
accumulation for bf16 inputs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_CHUNK = 64


def _wkv6_kernel(init_ref, u_ref, r_ref, w_ref, k_ref, v_ref,
                 y_ref, s_out_ref, z_scratch, *, L: int, nc: int, G: int,
                 mxu_dtype):
    c = pl.program_id(1)
    f32 = jnp.float32
    bf = mxu_dtype

    @pl.when(c == 0)
    def _():
        z_scratch[:] = init_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    cum = (cols <= rows).astype(f32)
    strict = (cols < rows).astype(f32)
    from visualrwkv_tpu.ops.wkv7_pallas import _bdot, _btr

    # batched over the G heads of this program (see wkv7_pallas)
    r = r_ref[...].astype(f32)
    w = w_ref[...].astype(f32)
    k = k_ref[...].astype(f32)
    v = v_ref[...].astype(bf)
    u = u_ref[...].astype(f32)  # [G, 1, N] per-head bonus

    logw = jnp.maximum(-jnp.exp(w), -80.0 / L)  # decay floor (see ops.wkv6)
    g = jnp.einsum("ts,gsn->gtn", cum, logw, preferred_element_type=f32)
    g_prev = g - logw
    g_last = g[:, -1:, :]

    r_t = (r * jnp.exp(g_prev)).astype(bf)  # query sees pre-decay state
    k_h = (k * jnp.exp(-g)).astype(bf)
    k_bar = (k * jnp.exp(g_last - g)).astype(bf)

    z = z_scratch[...]
    sk = (_bdot(r_t, _btr(k_h)) * strict).astype(bf)
    bonus = jnp.sum(u * k * r, axis=2, keepdims=True)  # [G, L, 1]
    y = _bdot(r_t, z.astype(bf)) + _bdot(sk, v) + bonus * v.astype(f32)
    y_ref[...] = y.astype(y_ref.dtype)

    z = _btr(jnp.exp(g_last)) * z + _bdot(_btr(k_bar), v)
    z_scratch[...] = z

    @pl.when(c == nc - 1)
    def _():
        s_out_ref[...] = z


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv6_pallas(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    u: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[Array, Array]:
    """Fused forward. Same semantics as wkv6_chunked; T % chunk == 0."""
    B, T, H, N = r.shape
    if T % chunk != 0:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    L = chunk
    nc = T // L
    BH = B * H

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf = (flat(x) for x in (r, w_raw, k, v))
    uf = jnp.broadcast_to(u[None], (B, H, N)).reshape(BH, 1, N)
    if initial_state is None:
        z0 = jnp.zeros((BH, N, N), jnp.float32)
    else:
        z0 = jnp.swapaxes(initial_state.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    G = 1
    for cand in (16, 8, 4, 2):  # larger groups amortize per-program fixed work
        if BH % cand == 0:
            G = cand
            break

    in_spec = pl.BlockSpec((G, L, N), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((G, 1, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32

    y, s_out = pl.pallas_call(
        functools.partial(_wkv6_kernel, L=L, nc=nc, G=G, mxu_dtype=mxu_dtype),
        grid=(BH // G, nc),
        in_specs=[state_spec, u_spec] + [in_spec] * 4,
        out_specs=(in_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, N), r.dtype),
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, uf, rf, wf, kf, vf)

    y = jnp.transpose(y.reshape(B, H, T, N), (0, 2, 1, 3))
    final_state = jnp.swapaxes(s_out.reshape(B, H, N, N), -1, -2)
    return y, final_state


# ---------------------------------------------------------------------------
# Fused backward (hand-derived VJP; structure mirrors wkv7_pallas)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv6_pallas_fwd_res(r, w_raw, k, v, u, initial_state=None,
                        chunk: int = DEFAULT_CHUNK):
    """Forward emitting (y, final_state, chunk-input states)."""
    from visualrwkv_tpu.ops.wkv7_pallas import _pick_g

    B, T, H, N = r.shape
    L = chunk
    nc = T // L
    BH = B * H

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf = (flat(x) for x in (r, w_raw, k, v))
    uf = jnp.broadcast_to(u[None], (B, H, N)).reshape(BH, 1, N)
    if initial_state is None:
        z0 = jnp.zeros((BH, N, N), jnp.float32)
    else:
        z0 = jnp.swapaxes(initial_state.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    G = _pick_g(BH, L, N, fp32_bufs=10)
    in_spec = pl.BlockSpec((G, L, N), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((G, 1, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    zin_spec = pl.BlockSpec((G, 1, N, N), lambda bh, c: (bh, c, 0, 0), memory_space=pltpu.VMEM)
    mxu_dtype = jnp.bfloat16 if r.dtype == jnp.bfloat16 else jnp.float32

    def kernel(init_ref, u_ref, r_ref, w_ref, k_ref, v_ref,
               y_ref, s_out_ref, zin_ref, z_scratch):
        c = pl.program_id(1)
        for gi in range(G):
            @pl.when(c == 0)
            def _(gi=gi):
                zin_ref[gi, 0] = init_ref[gi]

            @pl.when(c != 0)
            def _(gi=gi):
                zin_ref[gi, 0] = z_scratch[gi]

        _wkv6_kernel(init_ref, u_ref, r_ref, w_ref, k_ref, v_ref,
                     y_ref, s_out_ref, z_scratch, L=L, nc=nc, G=G,
                     mxu_dtype=mxu_dtype)

    y, s_out, zin = pl.pallas_call(
        kernel,
        grid=(BH // G, nc),
        in_specs=[state_spec, u_spec] + [in_spec] * 4,
        out_specs=(in_spec, state_spec, zin_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, N), r.dtype),
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
            jax.ShapeDtypeStruct((BH, nc, N, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(z0, uf, rf, wf, kf, vf)

    y = jnp.transpose(y.reshape(B, H, T, N), (0, 2, 1, 3))
    final_state = jnp.swapaxes(s_out.reshape(B, H, N, N), -1, -2)
    return y, final_state, zin


def _wkv6_bwd_kernel(zin_ref, u_ref, r_ref, w_ref, k_ref, v_ref, dy_ref, dzf_ref,
                     dr_ref, dw_ref, dk_ref, dv_ref, du_ref,
                     dz_scratch, du_scratch, *, L: int, nc: int, G: int):
    """Reverse-chunk VJP of the WKV6 chunk equations (all fp32)."""
    from visualrwkv_tpu.ops.wkv7_pallas import _bdot, _btr

    c = pl.program_id(1)
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    cum = (cols <= rows).astype(f32)
    strict = (cols < rows).astype(f32)

    @pl.when(c == 0)
    def _():
        dz_scratch[...] = dzf_ref[...]
        du_scratch[...] = jnp.zeros_like(du_scratch)

    r = r_ref[...].astype(f32)
    w = w_ref[...].astype(f32)
    k = k_ref[...].astype(f32)
    v = v_ref[...].astype(f32)
    u = u_ref[...].astype(f32)  # [G, 1, N]
    dY = dy_ref[...].astype(f32)
    Z0 = zin_ref[:, 0]
    dZ1 = dz_scratch[...]

    logw = jnp.maximum(-jnp.exp(w), -80.0 / L)  # decay floor (see ops.wkv6)
    g = jnp.einsum("ts,gsn->gtn", cum, logw, preferred_element_type=f32)
    g_prev = g - logw
    g_last = g[:, -1:, :]
    e_gp = jnp.exp(g_prev)
    e_ng = jnp.exp(-g)
    e_tail = jnp.exp(g_last - g)
    e_gl = jnp.exp(g_last)

    rt = r * e_gp
    kh = k * e_ng
    kbar = k * e_tail

    sk = _bdot(rt, _btr(kh)) * strict

    # ---- VJP ----
    dSK = _bdot(dY, _btr(v)) * strict
    dRt = _bdot(dY, _btr(Z0)) + _bdot(dSK, kh)
    dKh = _bdot(_btr(dSK), rt)
    bonus_ct = jnp.sum(dY * v, axis=2, keepdims=True)  # [G, L, 1]
    dV = _bdot(_btr(sk), dY) + _bdot(kbar, dZ1) + (
        jnp.sum(u * k * r, axis=2, keepdims=True) * dY
    )
    dKbar = _bdot(v, _btr(dZ1))
    dZ0 = _bdot(_btr(rt), dY) + _btr(e_gl) * dZ1

    dr = dRt * e_gp + bonus_ct * u * k
    dk = dKh * e_ng + dKbar * e_tail + bonus_ct * u * r
    du_scratch[...] = du_scratch[...] + jnp.sum(
        bonus_ct * k * r, axis=1, keepdims=True
    )

    dg = -kh * dKh - kbar * dKbar
    dg_prev = rt * dRt
    dgl = jnp.sum(kbar * dKbar, axis=1, keepdims=True) + (
        e_gl * _btr(jnp.sum(dZ1 * Z0, axis=2, keepdims=True))
    )
    dlw = (
        jnp.einsum("ts,gtn->gsn", cum, dg, preferred_element_type=f32)
        + jnp.einsum("ts,gtn->gsn", strict, dg_prev, preferred_element_type=f32)
        + dgl
    )
    # decay-floor boundary: d logw / d w_raw is 0 where the floor clamps
    active = (-jnp.exp(w)) > (-80.0 / L)
    dw = jnp.where(active, dlw * (-jnp.exp(w)), 0.0)

    dr_ref[...] = dr.astype(dr_ref.dtype)
    dw_ref[...] = dw.astype(dw_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dV.astype(dv_ref.dtype)
    dz_scratch[...] = dZ0

    @pl.when(c == nc - 1)
    def _():
        du_ref[...] = du_scratch[...]


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv6_pallas_bwd(r, w_raw, k, v, u, zin, dy, dzfinal,
                    chunk: int = DEFAULT_CHUNK):
    """Returns grads for (r, w_raw, k, v, u, initial_state)."""
    from visualrwkv_tpu.ops.wkv7_pallas import _pick_g

    B, T, H, N = r.shape
    L = chunk
    nc = T // L
    BH = B * H

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(BH, T, N)

    rf, wf, kf, vf, dyf = (flat(x) for x in (r, w_raw, k, v, dy))
    uf = jnp.broadcast_to(u[None], (B, H, N)).reshape(BH, 1, N)
    dzf = jnp.swapaxes(dzfinal.astype(jnp.float32), -1, -2).reshape(BH, N, N)

    G = _pick_g(BH, L, N, fp32_bufs=26)
    in_spec = pl.BlockSpec((G, L, N), lambda bh, c: (bh, nc - 1 - c, 0),
                           memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((G, 1, N), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM)
    zin_spec = pl.BlockSpec((G, 1, N, N), lambda bh, c: (bh, nc - 1 - c, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((G, N, N), lambda bh, c: (bh, 0, 0),
                              memory_space=pltpu.VMEM)

    # the initial-state grad is the final dZ carried in scratch; emit it by
    # treating it as an extra state-spec output written at the last grid step
    def kernel(zin_ref, u_ref, r_ref, w_ref, k_ref, v_ref, dy_ref, dzf_ref,
               dr_ref, dw_ref, dk_ref, dv_ref, du_ref, dz0_ref,
               dz_scratch, du_scratch):
        _wkv6_bwd_kernel(zin_ref, u_ref, r_ref, w_ref, k_ref, v_ref, dy_ref,
                         dzf_ref, dr_ref, dw_ref, dk_ref, dv_ref, du_ref,
                         dz_scratch, du_scratch, L=L, nc=nc, G=G)

        @pl.when(pl.program_id(1) == nc - 1)
        def _():
            dz0_ref[...] = dz_scratch[...]

    outs = pl.pallas_call(
        kernel,
        grid=(BH // G, nc),
        in_specs=[zin_spec, u_spec] + [in_spec] * 5 + [state_spec],
        out_specs=tuple([in_spec] * 4 + [u_spec, state_spec]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((BH, T, N), r.dtype)] * 4
            + [jax.ShapeDtypeStruct((BH, 1, N), jnp.float32)]
            + [jax.ShapeDtypeStruct((BH, N, N), jnp.float32)]
        ),
        scratch_shapes=[
            pltpu.VMEM((G, N, N), jnp.float32),
            pltpu.VMEM((G, 1, N), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(zin, uf, rf, wf, kf, vf, dyf, dzf)

    dr, dw, dk, dv, du_bh, dz0 = outs

    def unflat(x):
        return jnp.transpose(x.reshape(B, H, T, N), (0, 2, 1, 3))

    du = du_bh.reshape(B, H, N).sum(axis=0).astype(u.dtype)
    d_initial = jnp.swapaxes(dz0.reshape(B, H, N, N), -1, -2)
    return unflat(dr), unflat(dw), unflat(dk), unflat(dv), du, d_initial


# ---------------------------------------------------------------------------
# Fused decode step (T=1)
# ---------------------------------------------------------------------------


def _wkv6_step_kernel(s_ref, u_ref, r_ref, w_ref, k_ref, v_ref,
                      s_out_ref, y_ref):
    """One WKV6 step for G heads; the [N,N] state is read ONCE and written
    ONCE (y uses the OLD state: y = S@r + (u.(k*r)) v; then S' = S*w + v k^T,
    reference app/cuda/rwkv6.cu:9-50 semantics). All math fp32."""
    f32 = jnp.float32
    s = s_ref[...].astype(f32)  # [G, Nv, Nk] (carry may be bf16; math fp32)
    u = u_ref[...].astype(f32)
    r = r_ref[...].astype(f32)
    w = jnp.exp(-jnp.exp(w_ref[...].astype(f32)))[:, None, :]
    k = k_ref[...].astype(f32)
    v = v_ref[...].astype(f32)
    bonus = jnp.sum(u * k * r, axis=1, keepdims=True)  # [G, 1]
    y = jnp.sum(s * r[:, None, :], axis=2) + bonus * v
    y_ref[...] = y.astype(y_ref.dtype)
    s_out_ref[...] = (s * w + v[:, :, None] * k[:, None, :]).astype(s_out_ref.dtype)


def wkv6_step_pallas(state, r, w_raw, k, v, u):
    """Fused single-token WKV6 update. state [B,H,Nv,Nk] fp32; r/w/k/v [B,H,N];
    u [H,N] (per-head bonus). Same semantics as ops.wkv6.wkv6_step."""
    B, H, Nv, Nk = state.shape
    BH = B * H
    sf = state.reshape(BH, Nv, Nk)
    u_full = jnp.broadcast_to(u[None], (B, H, Nk)).reshape(BH, Nk)
    vecs = [x.reshape(BH, Nk) for x in (r, w_raw, k, v)]

    G = 8
    while BH % G:
        G //= 2
    state_spec = pl.BlockSpec((G, Nv, Nk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((G, Nk), lambda i: (i, 0), memory_space=pltpu.VMEM)

    s_out, y = pl.pallas_call(
        _wkv6_step_kernel,
        grid=(BH // G,),
        in_specs=[state_spec] + [vec_spec] * 5,
        out_specs=(state_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Nv, Nk), state.dtype),
            jax.ShapeDtypeStruct((BH, Nv), r.dtype),
        ),
        interpret=jax.default_backend() == "cpu",
    )(sf, u_full, *vecs)
    return s_out.reshape(B, H, Nv, Nk), y.reshape(B, H, Nv)
