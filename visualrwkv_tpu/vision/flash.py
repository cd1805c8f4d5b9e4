"""Pallas flash attention for the vision towers (BASELINE north star: "the
ViT encoder forwards run with Pallas flash-attention").

Two entry points:

- :func:`flash_mha` — bidirectional, bias-free MHA for the plain ViT towers
  (DINOv2 / SigLIP / CLIP; reference ``src/vision.py:76-134``). Wraps the
  stock TPU Pallas flash-attention kernel (fwd AND bwd are fused Pallas);
  sequences are right-padded to a 128 multiple with segment-id masking so
  real queries never attend to pad keys (DINOv2 at 448px has 1029 tokens).

- :func:`sam_flash_attention` — custom flash kernel for SAM's GLOBAL
  attention blocks (reference ``src/sam.py:149-238``): an online-softmax
  stream over key blocks where the decomposed relative-position bias
  ``bias[q, k=(kh,kw)] = rel_h[q, kh] + rel_w[q, kw]`` is reconstructed
  ON THE FLY inside the kernel from the small per-query tables — the
  [N, N] bias/logit matrix (12 heads x 4096^2 at SAM-1024, the encode's
  dominant HBM term) is never materialized. Backward is a fused two-pass
  flash kernel (FlashAttention-2 style: saved lse + recomputed p; dq +
  rel-pos-table grads per query block, dk/dv per key block), so
  trainable-vision configs (reference v7.10 stage) run at full speed too.

Dispatch: :func:`flash_enabled` — "auto" uses flash on TPU backends only;
override with env ``VISUALRWKV_VISION_FLASH={auto,on,off}`` or the
:func:`vision_flash` context manager (tests force "on" + interpret mode).
"""

from __future__ import annotations

import functools
import os
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MODE: Optional[str] = None  # context override: "auto" | "on" | "off"


def set_vision_flash(mode: Optional[str]) -> None:
    global _MODE
    if mode not in (None, "auto", "on", "off"):
        raise ValueError(mode)
    _MODE = mode


@contextmanager
def vision_flash(mode: Optional[str]):
    global _MODE
    prev = _MODE
    set_vision_flash(mode)
    try:
        yield
    finally:
        _MODE = prev


def flash_enabled() -> bool:
    mode = _MODE or os.environ.get("VISUALRWKV_VISION_FLASH", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _sam_blocks(N: int, W: int):
    """(bq, bk) for the SAM kernel, or None if the geometry doesn't fit:
    N must be a 128 multiple and the key block must cover whole grid rows."""
    if N % 128:
        return None
    bq = bk = _pick_block(N)
    while bk % W and bk > 1:
        bk //= 2
    if bk < W or bk % W or N % bk:
        return None
    return bq, bk


def sam_flash_supported(N: int, W: int) -> bool:
    return _sam_blocks(N, W) is not None


def _pick_block(n: int) -> int:
    """Largest 128-multiple block <= 512 dividing n (n is a 128 multiple)."""
    for b in (512, 384, 256, 128):
        if n % b == 0:
            return b
    raise ValueError(f"sequence length {n} is not a multiple of 128")


def flash_mha(q: Array, k: Array, v: Array) -> Array:
    """Bidirectional no-bias MHA, [B, N, h, hd] -> [B, N, h, hd].

    Same semantics as ``jax.nn.dot_product_attention(q, k, v)`` (1/sqrt(hd)
    scaling, fp32 softmax), computed by the stock TPU Pallas flash kernel.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, N, h, hd = q.shape
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))  # [B, h, N, hd]

    Np = -(-N // 128) * 128
    segment_ids = None
    if Np != N:
        pad = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
        qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))
        ids = jnp.where(jnp.arange(Np) < N, 1, 2).astype(jnp.int32)
        ids = jnp.broadcast_to(ids, (B, Np))
        segment_ids = SegmentIds(q=ids, kv=ids)

    b = _pick_block(Np)
    blocks = BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )

    def call():
        return flash_attention(
            qt, kt, vt, segment_ids=segment_ids,
            sm_scale=float(hd) ** -0.5, block_sizes=blocks,
        )

    if _interpret():
        with pltpu.force_tpu_interpret_mode():
            out = call()
    else:
        out = call()
    return out[:, :, :N].transpose(0, 2, 1, 3).astype(q.dtype)


# ---------------------------------------------------------------------------
# SAM global attention: flash with on-the-fly decomposed rel-pos bias
# ---------------------------------------------------------------------------


def _relpos_onehots(c, rows, W, Hk):
    """One-hot selector matrices reconstructing the decomposed rel-pos bias
    for key block ``c``: key m of the block is grid position
    (kh = c*rows + m//W, kw = m%W), so
        bias[q, m] = rel_h[q, c*rows + m//W] + rel_w[q, m%W]
    computed as TWO one-hot MXU dots (Mosaic's TC path lowers neither
    dynamic_slice nor the [bq, rows, W] -> [bq, bk] shape cast; iota
    compares + dots are the native formulation)."""
    bk = rows * W
    m_h = jax.lax.broadcasted_iota(jnp.int32, (Hk, bk), 1)
    h_i = jax.lax.broadcasted_iota(jnp.int32, (Hk, bk), 0)
    se = (h_i == c * rows + m_h // W).astype(jnp.float32)       # [Hk, bk]
    m_w = jax.lax.broadcasted_iota(jnp.int32, (W, bk), 1)
    w_i = jax.lax.broadcasted_iota(jnp.int32, (W, bk), 0)
    tw = (w_i == m_w % W).astype(jnp.float32)                   # [W, bk]
    return se, tw


def _sam_flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                      m_ref, l_ref, acc_ref, *, scale, rows, W, nk,
                      lse_ref=None):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale                    # [bq, hd]
    s = jax.lax.dot_general(
        q.astype(q_ref.dtype), k_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                           # [bq, bk]
    bq = s.shape[0]

    Hk = rh_ref.shape[-1]
    se, tw = _relpos_onehots(c, rows, W, Hk)
    s = s + jax.lax.dot(rh_ref[0].astype(jnp.float32), se,
                        preferred_element_type=jnp.float32)
    s = s + jax.lax.dot(rw_ref[0].astype(jnp.float32), tw,
                        preferred_element_type=jnp.float32)

    m_prev = m_ref[...][:, :1]
    l_prev = l_ref[...][:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                                      # <= 1
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(c == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...][:, :1]).astype(o_ref.dtype)
        if lse_ref is not None:
            # m/l scratch are lane-replicated [bq, 128]; emit lse the same
            # way (Mosaic rejects 1-lane (1, bq) output blocks — the lse
            # residual layout must keep the 128-lane minor dim).
            lse_ref[0] = (m_ref[...] + jnp.log(l_ref[...])).astype(
                lse_ref.dtype
            )


def _sam_flash_fwd_impl(q, k, v, rel_h, rel_w, scale, with_lse: bool = False):
    G, N, hd = q.shape
    W = rel_w.shape[-1]
    blocks = _sam_blocks(N, W)
    if blocks is None:
        raise ValueError(f"unsupported SAM flash geometry: N={N}, W={W}")
    bq, bk = blocks
    rows = bk // W
    nq, nk = N // bq, N // bk

    if with_lse:
        def kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref,
                   m_ref, l_ref, acc_ref):
            _sam_flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                              m_ref, l_ref, acc_ref, scale=scale, rows=rows,
                              W=W, nk=nk, lse_ref=lse_ref)

        out_specs = (
            pl.BlockSpec((1, bq, hd), lambda g, i, c: (g, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda g, i, c: (g, i, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((G, N, hd), q.dtype),
            jax.ShapeDtypeStruct((G, N, 128), jnp.float32),
        )
    else:
        kernel = functools.partial(
            _sam_flash_kernel, scale=scale, rows=rows, W=W, nk=nk
        )
        out_specs = pl.BlockSpec((1, bq, hd), lambda g, i, c: (g, i, 0))
        out_shape = jax.ShapeDtypeStruct((G, N, hd), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(G, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda g, i, c: (g, i, 0)),
            pl.BlockSpec((1, bk, hd), lambda g, i, c: (g, c, 0)),
            pl.BlockSpec((1, bk, hd), lambda g, i, c: (g, c, 0)),
            pl.BlockSpec((1, bq, rel_h.shape[-1]), lambda g, i, c: (g, i, 0)),
            pl.BlockSpec((1, bq, W), lambda g, i, c: (g, i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, rel_h, rel_w)


def sam_attend_reference(q, k, v, rel_h, rel_w, scale, block: int = 1024):
    """Chunked jnp reference of SAM global attention (differentiable; scan
    over q blocks). Mirrors ``sam.attention_relpos``'s block_attend math."""
    G, N, hd = q.shape
    if N % block:
        block = N
    dt = q.dtype

    def attend(q_blk, rh_blk, rw_blk):
        logits = jnp.einsum(
            "gmd,gnd->gmn", (q_blk.astype(jnp.float32) * scale).astype(dt), k,
            preferred_element_type=jnp.float32,
        )
        M = q_blk.shape[1]
        bias = (rh_blk[..., :, None] + rw_blk[..., None, :]).reshape(G, M, N)
        attn = jax.nn.softmax(logits + bias, axis=-1)
        return jnp.einsum("gmn,gnd->gmd", attn.astype(dt), v,
                          preferred_element_type=jnp.float32)

    if block == N:
        return attend(q, rel_h, rel_w).astype(dt)

    nb = N // block
    qs = q.reshape(G, nb, block, hd).transpose(1, 0, 2, 3)
    rhs = rel_h.reshape(G, nb, block, -1).transpose(1, 0, 2, 3)
    rws = rel_w.reshape(G, nb, block, -1).transpose(1, 0, 2, 3)
    outs = jax.lax.map(lambda args: attend(*args), (qs, rhs, rws))
    return outs.transpose(1, 0, 2, 3).reshape(G, N, hd).astype(dt)


# --- fused flash backward (two-pass, FlashAttention-2 style) ----------------
#
# Residuals: inputs + O + lse (= m + log l). delta[q] = rowsum(dO * O) is
# precomputed in jnp. Pass 1 streams key blocks per query block and emits
# dq plus the rel-pos table grads (d_rel_h[q, h] = sum over keys in grid row
# h of dS[q, m]; one more one-hot MXU dot). Pass 2 streams query blocks per
# key block and emits dk/dv. All softmax/dS math fp32.


def _sam_flash_bwd_dq_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref,
                             lse_ref, delta_ref, dq_ref, drh_ref, drw_ref,
                             dq_acc, drh_acc, drw_acc, *, scale, rows, W, nk):
    c = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(c == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        drh_acc[...] = jnp.zeros_like(drh_acc)
        drw_acc[...] = jnp.zeros_like(drw_acc)

    # dots run in the INPUT dtype with fp32 accumulation (fp32 operands on
    # the MXU are ~8x slower; measured 206 ms -> bf16-operand target is the
    # fwd kernel's rate). exp/rescale math stays fp32 on the VPU.
    dt = q_ref.dtype
    qs = (q_ref[0].astype(f32) * scale).astype(dt)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    Hk = rh_ref.shape[-1]
    se, tw = _relpos_onehots(c, rows, W, Hk)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)
    s = s + jax.lax.dot(rh_ref[0].astype(f32), se, preferred_element_type=f32)
    s = s + jax.lax.dot(rw_ref[0].astype(f32), tw, preferred_element_type=f32)
    p = jnp.exp(s - lse_ref[0].astype(f32)[:, :1])              # [bq, bk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    ds = (p * (dp - delta_ref[0].astype(f32)[:, :1])).astype(dt)  # [bq, bk]
    dq_acc[...] = dq_acc[...] + jax.lax.dot(ds, k, preferred_element_type=f32) * scale
    drh_acc[...] = drh_acc[...] + jax.lax.dot_general(
        ds, se.astype(dt), (((1,), (1,)), ((), ())), preferred_element_type=f32)
    drw_acc[...] = drw_acc[...] + jax.lax.dot_general(
        ds, tw.astype(dt), (((1,), (1,)), ((), ())), preferred_element_type=f32)

    @pl.when(c == nk - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)
        drh_ref[0] = drh_acc[...].astype(drh_ref.dtype)
        drw_ref[0] = drw_acc[...].astype(drw_ref.dtype)


def _sam_flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref,
                              lse_ref, delta_ref, dk_ref, dv_ref,
                              dk_acc, dv_acc, *, scale, rows, W, nq):
    c = pl.program_id(1)   # key-block index (parallel)
    j = pl.program_id(2)   # streamed query-block index
    f32 = jnp.float32

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dt = q_ref.dtype
    qs = (q_ref[0].astype(f32) * scale).astype(dt)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    Hk = rh_ref.shape[-1]
    se, tw = _relpos_onehots(c, rows, W, Hk)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)
    s = s + jax.lax.dot(rh_ref[0].astype(f32), se, preferred_element_type=f32)
    s = s + jax.lax.dot(rw_ref[0].astype(f32), tw, preferred_element_type=f32)
    p = jnp.exp(s - lse_ref[0].astype(f32)[:, :1])              # [bq, bk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    ds = (p * (dp - delta_ref[0].astype(f32)[:, :1])).astype(dt)
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        p.astype(dt), do, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
        ds, q_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=f32) * scale

    @pl.when(j == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _sam_flash_bwd_impl(q, k, v, rel_h, rel_w, o, lse, do, scale):
    G, N, hd = q.shape
    W = rel_w.shape[-1]
    Hk = rel_h.shape[-1]
    bq, bk = _sam_blocks(N, W)
    rows = bk // W
    nq, nk = N // bq, N // bk

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    # lse/delta ride as lane-replicated [G, N, 128] (Mosaic's minimum minor
    # dim for an input block; matches jax's own TPU flash-attention residual
    # layout) — ~25 MB at SAM-1024 shapes, negligible next to q/k/v traffic.
    lse = jnp.broadcast_to(lse[..., None], (G, N, 128))
    delta = jnp.broadcast_to(delta[..., None], (G, N, 128))

    qb = lambda d: pl.BlockSpec((1, bq, d), lambda g, i, c: (g, i, 0))
    kb = lambda d: pl.BlockSpec((1, bk, d), lambda g, i, c: (g, c, 0))
    qvec = pl.BlockSpec((1, bq, 128), lambda g, i, c: (g, i, 0))
    common = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )

    dq, drh, drw = pl.pallas_call(
        functools.partial(_sam_flash_bwd_dq_kernel, scale=scale, rows=rows,
                          W=W, nk=nk),
        grid=(G, nq, nk),
        in_specs=[qb(hd), kb(hd), kb(hd), qb(Hk), qb(W), qb(hd), qvec, qvec],
        out_specs=(qb(hd), qb(Hk), qb(W)),
        out_shape=(
            jax.ShapeDtypeStruct((G, N, hd), q.dtype),
            jax.ShapeDtypeStruct((G, N, Hk), rel_h.dtype),
            jax.ShapeDtypeStruct((G, N, W), rel_w.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, Hk), jnp.float32),
            pltpu.VMEM((bq, W), jnp.float32),
        ],
        **common,
    )(q, k, v, rel_h, rel_w, do, lse, delta)

    # pass 2: key blocks parallel, query blocks streamed
    qs = lambda d: pl.BlockSpec((1, bq, d), lambda g, c, j: (g, j, 0))
    ks = lambda d: pl.BlockSpec((1, bk, d), lambda g, c, j: (g, c, 0))
    qvec2 = pl.BlockSpec((1, bq, 128), lambda g, c, j: (g, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_sam_flash_bwd_dkv_kernel, scale=scale, rows=rows,
                          W=W, nq=nq),
        grid=(G, nk, nq),
        in_specs=[qs(hd), ks(hd), ks(hd), qs(Hk), qs(W), qs(hd), qvec2, qvec2],
        out_specs=(ks(hd), ks(hd)),
        out_shape=(
            jax.ShapeDtypeStruct((G, N, hd), k.dtype),
            jax.ShapeDtypeStruct((G, N, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hd), jnp.float32),
        ],
        **common,
    )(q, k, v, rel_h, rel_w, do, lse, delta)
    return dq, dk, dv, drh, drw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sam_flash_attention(q, k, v, rel_h, rel_w, scale):
    """SAM global attention via the custom flash kernel.

    q/k/v: [G, N, hd] (G = B*heads, N = Hk*Wk grid tokens, row-major);
    rel_h: [G, N, Hk] and rel_w: [G, N, Wk] are the precomputed per-query
    decomposed rel-pos terms (q . R_h / q . R_w). Returns [G, N, hd].
    Backward is the fused two-pass flash kernel above (trainable-vision
    configs, reference v7.10/src/model.py:438-443, run at full speed).
    """
    return _sam_flash_fwd_impl(q, k, v, rel_h, rel_w, scale)


def _sam_flash_vjp_fwd(q, k, v, rel_h, rel_w, scale):
    o, lse = _sam_flash_fwd_impl(q, k, v, rel_h, rel_w, scale, with_lse=True)
    # keep only lane 0 of the replicated [G, N, 128] lse as the residual
    return o, (q, k, v, rel_h, rel_w, o, lse[..., 0])


def _sam_flash_vjp_bwd(scale, res, g):
    q, k, v, rel_h, rel_w, o, lse = res
    return _sam_flash_bwd_impl(q, k, v, rel_h, rel_w, o, lse, g, scale)


sam_flash_attention.defvjp(_sam_flash_vjp_fwd, _sam_flash_vjp_bwd)
