"""RWKV-7 ("x070") WKV recurrence for TPU.

The recurrence (per head, head size N; fp32 state ``S`` of shape ``[N_v, N_k]``)::

    sa_t  = S_{t-1} @ a_t                          # [N_v]
    S_t   = S_{t-1} * w_t[None, :] + sa_t[:, None] * b_t[None, :] + v_t[:, None] * k_t[None, :]
    y_t   = S_t @ r_t                              # [N_v]

where ``w_t = exp(-exp(w_raw_t))`` and, in RWKV-7, ``a_t = -kappa_t`` (L2-normalized
key) and ``b_t = kappa_t * alpha_t``.  This matches the semantics of the reference
CUDA "wind backstepping" kernel (reference: VisualRWKV-v7/v7.00/cuda/wkv7_cuda.cu:17-51
and the einsum spec in VisualRWKV-v6/v6.xx/RWKV-v7_simple.py:20-32), extended with an
explicit initial/final state so the same op powers state-tuning, image-as-state
training, and streaming prefill.

Two implementations:

* :func:`wkv7_reference` — step-by-step ``lax.scan`` in fp32.  The golden model for
  parity tests and the T=1 decode path.
* :func:`wkv7_chunked` — a chunked, matmul-dominant reformulation (diagonal-plus-
  low-rank / generalized delta rule).  All O(T * N^2) work becomes batched matmuls
  on the MXU; only a T/L-step scan over chunk-boundary states remains sequential.

Chunked math (derived from scratch; per chunk of length L, carrying Z = S^T):

    g_t      = cumsum(log w)                        (log w = -exp(w_raw), given)
    a~_t     = a_t * exp(g_{t-1})                   (decay-adjusted a)
    b^_t     = b_t * exp(-g_t),  k^_t = k_t * exp(-g_t)
    r~_t     = r_t * exp(g_t)
    b-_t     = b_t * exp(g_L - g_t), k-_t = k_t * exp(g_L - g_t)

    M        = strict_tril(A~ B^T),  Nm = strict_tril(A~ K^T)     [L, L]
    T        = (I - M)^{-1}          (M nilpotent: 4 matmuls via doubling)
    U        = T (A~ Z + Nm V)       ("sa" rows)
    Y        = R~ Z + tril(R~ B^T) U + tril(R~ K^T) V
    Z'       = diag(exp(g_L)) Z + B-^T U + K-^T V

Folding chunk-local pieces gives a 2-matmul scan step:
    Y_c = Qeff_c Z + Yloc_c ;   Z <- Geff-form: exp(g_L) * Z + BTA_c Z + Hloc_c

Ratios exp(g_s - g_r) are <= 1; the factored exp(-g) intermediates are bounded by
exp(L * exp(-0.5)) (w_raw is soft-clamped to <= -0.5 upstream), safely inside fp32
range for L <= 64.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Array = jax.Array

DEFAULT_CHUNK = 16  # matches the reference kernel's _CHUNK_LEN_ (wkv7_cuda.cu:44)


def _validate(r, w, k, v, a, b):
    shape = r.shape
    for x in (w, k, v, a, b):
        if x.shape != shape:
            raise ValueError(f"wkv7 inputs must share shape; got {x.shape} vs {shape}")
    if len(shape) != 4:
        raise ValueError(f"wkv7 inputs must be [B, T, H, N]; got {shape}")


def wkv7_step(
    state: Array, r: Array, w_raw: Array, k: Array, v: Array, a: Array, b: Array
) -> Tuple[Array, Array]:
    """Single-token WKV7 update (the O(1) decode step).

    Args:
      state: ``[..., H, N_v, N_k]`` fp32.
      r, w_raw, k, v, a, b: ``[..., H, N]``.
    Returns:
      (new_state fp32, y) with y of r's dtype.
    """
    f32 = jnp.float32
    r, k, v, a, b = (x.astype(f32) for x in (r, k, v, a, b))
    w = jnp.exp(-jnp.exp(w_raw.astype(f32)))
    # y expanded against the OLD state:
    #   y = S'r = (S diag(w) + (Sa) b^T + v k^T) r
    #     = S(w*r) + (Sa)(b.r) + v(k.r)
    # so both matvecs batch into ONE contraction over S — decode at batch is
    # state-bandwidth-bound and this saves one of the naive form's passes
    probes = jnp.stack([a, w * r], axis=-1)  # [..., H, N, 2]
    two = jnp.einsum("...ij,...jc->...ic", state, probes)
    sa, swr = two[..., 0], two[..., 1]
    y = (
        swr
        + sa * jnp.sum(b * r, axis=-1, keepdims=True)
        + v * jnp.sum(k * r, axis=-1, keepdims=True)
    )
    state = (
        state * w[..., None, :]
        + sa[..., :, None] * b[..., None, :]
        + v[..., :, None] * k[..., None, :]
    )
    return state, y


def wkv7_step_flat(
    state: Array, r: Array, w_raw: Array, k: Array, v: Array, a: Array, b: Array
) -> Tuple[Array, Array]:
    """Single-token WKV7 update on the lane-flat state layout ``[B, N_v, H*N_k]``.

    TPU arrays pad their minor dimension to 128 lanes, so the canonical
    ``[B, H, 64, 64]`` state buffer occupies — and streams, every decode step —
    2x its logical bytes. Decode at large batch is state-bandwidth-bound
    (carrying the state bf16 alone was +50% throughput at 1B5/B32), so the
    flat layout folds (head, key) into one ``H*64``-lane minor dimension with
    zero padding. Same math as :func:`wkv7_step`, carried dtype preserved.

    MEASURED (v5e, 1B5 int8, B=32, tok/s; y-from-old-state formulation):
    flat+fp32 5276 vs head+fp32 5232 (parity), flat+bf16 5458 vs head+bf16
    7209 (-24%): XLA does not fuse the reshaped [B, N, H, N] view's update +
    reductions into the flat carry — the padded fp32 intermediates it
    materializes outweigh the padding saved. The serving default therefore
    stays the canonical layout with the bf16 carry ("s16"); "flat" remains a
    config option. Negative result kept documented (PROGRESS.md ledger).
    """
    B, N, HN = state.shape
    H = HN // N
    f32 = jnp.float32
    out_dtype = r.dtype
    r, k, v, a, b = (x.astype(f32) for x in (r, k, v, a, b))  # [B, H, N]
    w = jnp.exp(-jnp.exp(w_raw.astype(f32)))
    s4 = state.astype(f32).reshape(B, N, H, N)  # [B, i, H, j] fused view
    # y from the OLD state (see wkv7_step): both reductions share one pass
    sa = (s4 * a[:, None]).sum(-1)  # [B, i, H]
    swr = (s4 * (w * r)[:, None]).sum(-1)
    y = (
        swr
        + sa * jnp.sum(b * r, axis=-1)[:, None]
        + jnp.swapaxes(v, 1, 2) * jnp.sum(k * r, axis=-1)[:, None]
    )
    y = jnp.swapaxes(y, 1, 2)  # [B, H, i]
    s4 = (
        s4 * w[:, None]
        + sa[..., None] * b[:, None]
        + jnp.swapaxes(v, 1, 2)[..., None] * k[:, None]
    )
    return s4.reshape(B, N, HN).astype(state.dtype), y.astype(out_dtype)


def wkv7_scan_states(
    r: Array, w_raw: Array, k: Array, v: Array, a: Array, b: Array,
    initial_state: Optional[Array] = None, chunk: Optional[int] = None,
) -> Tuple[Array, Array]:
    """WKV7 over a SHORT token window, returning the state at EVERY position.

    Speculative-decoding verify needs to roll the recurrence back to the
    last accepted token, so the chunked kernels (final state only) don't
    fit; a ``lax.scan`` of the O(1) decode update over the ≤(k+1)-token
    window emits the full state trail. The window's elementwise scan is
    negligible next to the T-parallel projections around it, which read the
    weights ONCE for all positions — that single weight read is the whole
    point of speculative verification. ``chunk`` is accepted (and ignored)
    so this slots into ``tmix_x070(wkv_fn=...)``.

    Returns (y [B, T, H, N], states [B, T, H, N, N] fp32) where
    ``states[:, i]`` is the state AFTER consuming position i.
    """
    B, T, H, N = r.shape
    s0 = (
        jnp.zeros((B, H, N, N), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )

    def body(state, xs):
        state, y = wkv7_step(state, *xs)
        return state, (y, state)

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w_raw, k, v, a, b))
    _, (y, states) = jax.lax.scan(body, s0, xs)
    return jnp.moveaxis(y, 0, 1), jnp.moveaxis(states, 0, 1)


def state_to_flat(state: Array) -> Array:
    """``[B, H, N_v, N_k]`` -> lane-flat ``[B, N_v, H*N_k]`` (decode carry)."""
    B, H, Nv, Nk = state.shape
    return jnp.swapaxes(state, 1, 2).reshape(B, Nv, H * Nk)


def state_from_flat(state: Array, n_head: int) -> Array:
    """Lane-flat ``[B, N_v, H*N_k]`` -> canonical ``[B, H, N_v, N_k]``."""
    B, Nv, HN = state.shape
    return jnp.swapaxes(state.reshape(B, Nv, n_head, HN // n_head), 1, 2)


_STEP_IMPL = "jnp"  # "jnp" | "pallas"


def set_wkv_step_impl(mode: str) -> None:
    """Select the decode-step implementation.

    MEASURED (v5e, 1B5 geometry, B=32): the fused Pallas step is 3.8x faster
    than the jnp step in ISOLATION (0.141 vs 0.531 ms/layer — the jnp step
    makes 4 HBM passes over the [N,N] state vs the kernel's 2), but in the
    FULL decode graph it LOSES ~8% end-to-end (4093 vs 4444 tok/s int8):
    the custom-call boundary blocks XLA from fusing the surrounding bf16
    projections/norms and from overlapping the state traffic with the
    weight-bound matmuls. Same verdict with bf16-carried states (5.65 vs
    4.79 ms/step). Default therefore stays "jnp"; the kernel remains
    available for state-dominated regimes (very large B, shallow models).
    """
    global _STEP_IMPL
    assert mode in ("jnp", "pallas"), mode
    _STEP_IMPL = mode


def wkv7_step_auto(
    state: Array, r: Array, w_raw: Array, k: Array, v: Array, a: Array, b: Array
) -> Tuple[Array, Array]:
    """Decode-step dispatch; see :func:`set_wkv_step_impl` for the policy.

    A 3-D state selects the lane-flat layout (:func:`wkv7_step_flat`;
    fused Pallas variant under ``set_wkv_step_impl("pallas")``). NOTE:
    3-D here means the lane-flat wkv7 state [B, N_v, H*N_k] specifically —
    x040's aa/bb/pp triple is also 3-D ([B, C, 3]) but must never reach
    this function (it dispatches to wkv4_step); the shape assertion below
    catches any such mis-routing loudly."""
    if state.ndim == 3:
        H, N = r.shape[-2], r.shape[-1]
        assert state.shape[-2:] == (N, H * N), (
            f"wkv7_step_auto: 3-D state {state.shape} is not the lane-flat "
            f"[B, {N}, {H * N}] wkv7 layout (x040 aa/bb/pp states do not "
            "belong here)"
        )
        if _STEP_IMPL == "pallas" and jax.default_backend() == "tpu":
            from visualrwkv_tpu.ops.wkv7_pallas import wkv7_step_flat_pallas

            return wkv7_step_flat_pallas(state, r, w_raw, k, v, a, b)
        return wkv7_step_flat(state, r, w_raw, k, v, a, b)
    if (
        _STEP_IMPL == "pallas"
        and jax.default_backend() == "tpu"
        and state.ndim == 4
    ):
        from visualrwkv_tpu.ops.wkv7_pallas import wkv7_step_pallas

        return wkv7_step_pallas(state, r, w_raw, k, v, a, b)
    return wkv7_step(state, r, w_raw, k, v, a, b)


def wkv7_reference(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    a: Array,
    b: Array,
    initial_state: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Step-by-step fp32 scan. Golden reference; O(T) sequential.

    Args:
      r, w_raw, k, v, a, b: ``[B, T, H, N]`` (any float dtype).
      initial_state: optional ``[B, H, N_v, N_k]`` fp32.
    Returns:
      (y ``[B, T, H, N]`` in r.dtype, final_state fp32).
    """
    _validate(r, w_raw, k, v, a, b)
    B, T, H, N = r.shape
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)

    def step(state, inputs):
        rt, wt, kt, vt, at, bt = inputs
        state, y = wkv7_step(state, rt, wt, kt, vt, at, bt)
        return state, y

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w_raw, k, v, a, b))
    final_state, ys = jax.lax.scan(step, initial_state, xs)
    return jnp.moveaxis(ys, 0, 1).astype(r.dtype), final_state


def _tri_inverse_unit_lower(m_strict: Array) -> Array:
    """(I - M)^{-1} for strictly-lower-triangular M over the last two dims.

    Uses the nilpotent doubling identity (I-M)^{-1} = (I+M)(I+M^2)(I+M^4)... —
    exact for L <= 2^ceil(log2(L)) and all-matmul (MXU-friendly).
    """
    L = m_strict.shape[-1]
    eye = jnp.eye(L, dtype=m_strict.dtype)
    t = eye + m_strict
    p = m_strict
    steps = max(0, (L - 1).bit_length() - 1)
    for _ in range(steps):
        p = jnp.matmul(p, p, preferred_element_type=jnp.float32)
        t = jnp.matmul(t, eye + p, preferred_element_type=jnp.float32)
    return t


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv7_chunked(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    a: Array,
    b: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[Array, Array]:
    """Chunked matmul-dominant WKV7. Requires T % chunk == 0.

    Same signature/semantics as :func:`wkv7_reference`; differentiable via JAX
    autodiff (the whole graph is jnp matmuls + a short scan over chunk states).

    STABILITY: chunks > 16 amplify input rounding through the (I-M)^{-1}
    solve and can NaN on realistic activations (k near-constant over t with
    a_gate ~ 1 — the post-first-optimizer-step regime; see
    tests/test_wkv7_stability.py). The :func:`wkv7` dispatcher caps at 16;
    direct callers passing larger chunks opt into the risk (test sweeps only).

    The op is HBM-bound on its decay-adjusted intermediates; they are stored in
    the input dtype (bf16 in production) — the MXU computes in bf16 anyway —
    while cumulative-decay exponentials and the carried state stay fp32.
    """
    _validate(r, w_raw, k, v, a, b)
    B, T, H, N = r.shape
    if T % chunk != 0:
        raise ValueError(f"T={T} must be a multiple of chunk={chunk}")
    L = chunk
    nc = T // L
    f32 = jnp.float32
    # intermediate storage dtype: inputs' dtype (bf16 halves HBM traffic)
    idt = r.dtype if r.dtype in (jnp.bfloat16, jnp.float32) else f32

    if initial_state is None:
        z0 = jnp.zeros((B, H, N, N), f32)
    else:
        # carry Z = S^T ([N_k, N_v])
        z0 = jnp.swapaxes(initial_state.astype(f32), -1, -2)

    # [B, T, H, N] -> [B, H, nc, L, N]
    def chunked(x, dt=f32):
        x = x.astype(dt)
        x = jnp.transpose(x, (0, 2, 1, 3))  # B H T N
        return x.reshape(B, H, nc, L, N)

    rc, kc, ac, bc = (chunked(x, idt) for x in (r, k, a, b))
    vc = chunked(v, idt)
    wc = chunked(w_raw, f32)

    logw = -jnp.exp(wc)  # log of per-step decay, <= 0
    g = jnp.cumsum(logw, axis=-2)  # inclusive cumsum over L (fp32)
    g_prev = g - logw  # exclusive cumsum
    g_last = g[..., -1:, :]  # [B,H,nc,1,N]

    cast = lambda x: x.astype(idt)
    a_t = cast(ac * jnp.exp(g_prev).astype(idt))
    b_h = cast(bc * jnp.exp(-g).astype(idt))
    k_h = cast(kc * jnp.exp(-g).astype(idt))
    r_t = cast(rc * jnp.exp(g).astype(idt))
    b_bar = cast(bc * jnp.exp(g_last - g).astype(idt))
    k_bar = cast(kc * jnp.exp(g_last - g).astype(idt))

    mm = functools.partial(jnp.matmul, preferred_element_type=f32)
    tt = lambda x: jnp.swapaxes(x, -1, -2)

    strict = jnp.tril(jnp.ones((L, L), f32), -1)
    incl = jnp.tril(jnp.ones((L, L), f32))

    m_mat = mm(a_t, tt(b_h)) * strict  # [.., L, L] fp32
    n_mat = mm(a_t, tt(k_h)) * strict
    t_inv = _tri_inverse_unit_lower(m_mat).astype(idt)

    u0 = mm(t_inv, mm(n_mat.astype(idt), vc).astype(idt)).astype(idt)  # [.., L, Nv]
    ta = mm(t_inv, a_t).astype(idt)  # [.., L, Nk]
    sb = (mm(r_t, tt(b_h)) * incl).astype(idt)  # [.., L, L]
    sk = (mm(r_t, tt(k_h)) * incl).astype(idt)

    q_eff = (r_t.astype(f32) + mm(sb, ta)).astype(idt)  # [.., L, Nk]
    y_loc = (mm(sb, u0) + mm(sk, vc)).astype(idt)  # [.., L, Nv]
    bta = mm(tt(b_bar), ta).astype(idt)  # [.., Nk, Nk]
    h_loc = (mm(tt(b_bar), u0) + mm(tt(k_bar), vc)).astype(idt)  # [.., Nk, Nv]
    p_last = jnp.exp(g_last)  # [.., 1, N] fp32

    # scan over chunks: Y_c = q_eff_c @ Z + y_loc_c ; Z <- pL*Z + bta_c @ Z + h_loc_c
    def scan_chunk(z, inputs):
        q_c, yl_c, bta_c, hl_c, pl_c = inputs
        y_c = (mm(q_c, z) + yl_c).astype(idt)
        z = pl_c.reshape(B, H, N, 1) * z + mm(bta_c, z) + hl_c
        return z, y_c

    xs = tuple(
        jnp.moveaxis(x, 2, 0) for x in (q_eff, y_loc, bta, h_loc, p_last)
    )
    z_final, ys = jax.lax.scan(scan_chunk, z0, xs)

    ys = jnp.moveaxis(ys, 0, 2)  # [B, H, nc, L, N]
    y = jnp.transpose(ys.reshape(B, H, T, N), (0, 2, 1, 3))
    return y.astype(r.dtype), jnp.swapaxes(z_final, -1, -2)


# ---------------------------------------------------------------------------
# Dispatching entry point: fused Pallas forward on TPU, jnp-chunked gradients
# ---------------------------------------------------------------------------

_IMPL_MODE = "auto"  # "auto" | "pallas" | "chunked"

# chunks per Pallas grid step for the fused path (pure scheduling: outputs
# are bit-identical at any block factor; the stability envelope is set by
# the SOLVE length alone). >1 shrinks grid fixed work.
_WKV_BLOCK = 1

# kernel-chunk ceiling for the fused path: the stability-capped length (16)
# becomes the block-substitution SOLVE length and the kernel chunk grows to
# this ceiling when T divides. MEASURED (v5e, 0B4 train shapes, chunk 16 ->
# 32): fwd 2.65 -> 2.00 ms, fwd_res 3.51 -> 2.08, bwd 5.92 -> 3.58 per layer
# (chain -37%) with the adversarial-construction error IDENTICAL to plain
# chunk 16 (2.9e-3; the full-doubling chunk 32 errs 3.5e4).
_WKV_KCHUNK = 32


def set_wkv_block(block: int) -> None:
    """Chunks per grid step for the fused Pallas path (1, 2, 4, ...)."""
    global _WKV_BLOCK
    assert block >= 1, block
    _WKV_BLOCK = block


def set_wkv_kernel_chunk(kchunk: int) -> None:
    """Kernel-chunk ceiling for the fused path (the SOLVE length stays at
    the dispatcher's stability cap; this only re-blocks the dots/checkpoint
    granularity)."""
    global _WKV_KCHUNK
    assert kchunk >= 1, kchunk
    _WKV_KCHUNK = kchunk


def set_wkv_impl(mode: str) -> None:
    """Select the forward implementation ("auto" uses Pallas on TPU;
    "packed" opts into the packed-lane kernels, falling back to the
    head-layout fused pair for odd head counts)."""
    global _IMPL_MODE
    assert mode in ("auto", "pallas", "chunked", "packed"), mode
    _IMPL_MODE = mode


# -- SPMD partitioning --------------------------------------------------------
#
# The WKV recurrence is independent per (batch, head): it partitions over a
# device mesh with ZERO communication.  XLA cannot infer that for a Pallas
# custom call (it would all-gather the operands), so when a mesh is declared
# here the dispatchers wrap the kernel in `jax.shard_map` with batch mapped to
# the data axis and heads mapped to the model (tensor-parallel) axis.  This is
# what lets tensor-parallel training keep the fused kernels (the reference has
# no TP at all — SURVEY §2.4; this is our optional extension done TPU-natively).

_WKV_SPMD: Optional[Tuple] = None  # (mesh, batch_axis, head_axis)


def set_wkv_spmd(mesh, batch_axis: str = "data", head_axis: str = "model") -> None:
    """Declare the mesh over which WKV operands arrive sharded.

    Pass ``mesh=None`` to restore single-device dispatch. Shapes that don't
    divide the mesh axes fall back to unwrapped (GSPMD-replicated) calls.
    """
    global _WKV_SPMD
    _WKV_SPMD = None if mesh is None else (mesh, batch_axis, head_axis)


@contextlib.contextmanager
def wkv_spmd(mesh, batch_axis: str = "data", head_axis: str = "model"):
    """Scoped version of :func:`set_wkv_spmd` (affects traces begun inside)."""
    global _WKV_SPMD
    prev = _WKV_SPMD
    set_wkv_spmd(mesh, batch_axis, head_axis)
    try:
        yield
    finally:
        _WKV_SPMD = prev


_WKV_SEQ_AXIS: Optional[str] = None


def current_seq_axis() -> Optional[str]:
    """The sequence-shard axis declared by :func:`wkv_seq_axis` (None when
    not under one). Accessor for sibling op modules: ``ops.__init__``
    re-exports the ``wkv7`` FUNCTION under the package attribute, so
    ``import visualrwkv_tpu.ops.wkv7 as m`` resolves to the function, not
    this module."""
    return _WKV_SEQ_AXIS


@contextlib.contextmanager
def wkv_seq_axis(axis: Optional[str]):
    """Declare that WKV calls traced inside are ALREADY under a shard_map
    with the T axis sharded over ``axis``: dispatch to the context-parallel
    ring (ops.wkv_sp) instead of a single-shard recurrence."""
    global _WKV_SEQ_AXIS
    prev = _WKV_SEQ_AXIS
    _WKV_SEQ_AXIS = axis
    try:
        yield
    finally:
        _WKV_SEQ_AXIS = prev


_SPMD_DECLINED = "declined"


def _spmd_axes(B: int, H: int):
    """Returns (mesh, batch_axis|None, head_axis|None) if SPMD wrapping
    applies, None when no multi-device mesh is declared, or the sentinel
    ``_SPMD_DECLINED`` when a mesh IS declared but the shapes don't divide
    its axes (callers must then avoid opaque custom calls: an unwrapped
    Pallas kernel under sharded operands forces GSPMD to gather/replicate
    them — a silent perf cliff — whereas the chunked jnp path partitions
    natively)."""
    if _WKV_SPMD is None:
        return None
    mesh, baxis, haxis = _WKV_SPMD
    nb = mesh.shape.get(baxis, 1)
    nh = mesh.shape.get(haxis, 1)
    if nb * nh == 1:
        return None
    if (nb > 1 and B % nb) or (nh > 1 and H % nh):
        return _SPMD_DECLINED
    return mesh, (baxis if nb > 1 else None), (haxis if nh > 1 else None)


# -- jnp-chunked custom_vjp (CPU / fallback) --------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wkv7_cv_chunked(chunk, r, w_raw, k, v, a, b, initial_state):
    return wkv7_chunked(r, w_raw, k, v, a, b, initial_state, chunk=chunk)


def _cv_chunked_fwd(chunk, r, w_raw, k, v, a, b, initial_state):
    y, s = wkv7_chunked(r, w_raw, k, v, a, b, initial_state, chunk=chunk)
    # named for the grad_cp="wkv" selective-remat policy (see _cv_pallas_fwd);
    # the chunked path keeps raw inputs as residuals, so only the output needs
    # a name for the policy to skip the downstream re-forward on CPU tests.
    y = checkpoint_name(y, "wkv_y")
    return (y, s), (r, w_raw, k, v, a, b, initial_state)


def _cv_chunked_bwd(chunk, residuals, cotangents):
    _, vjp = jax.vjp(
        lambda r, w, k, v, a, b, s: wkv7_chunked(r, w, k, v, a, b, s, chunk=chunk),
        *residuals,
    )
    return vjp(cotangents)


_wkv7_cv_chunked.defvjp(_cv_chunked_fwd, _cv_chunked_bwd)


# -- fully-fused Pallas custom_vjp (TPU) -------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _wkv7_cv_pallas_blocked(chunk, block, solve, r, w_raw, k, v, a, b,
                            initial_state):
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas

    return wkv7_pallas(r, w_raw, k, v, a, b, initial_state, chunk=chunk,
                       block=block, solve=solve)


def _cv_pallas_fwd(chunk, block, solve, r, w_raw, k, v, a, b, initial_state):
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_fwd_res

    y, s, zin = wkv7_pallas_fwd_res(r, w_raw, k, v, a, b, initial_state,
                                    chunk=chunk, block=block, solve=solve)
    # checkpoint_name lets a `save_only_these_names` remat policy (trainer
    # grad_cp="wkv") keep the kernel output + boundary-state stream across
    # the block remat so the backward pass never re-runs the WKV kernel
    # (reference grad-cp re-forwards everything, src/model.py:318-319).
    y = checkpoint_name(y, "wkv_y")
    zin = checkpoint_name(zin, "wkv_res")
    return (y, s), (r, w_raw, k, v, a, b, zin, initial_state)


def _cv_pallas_bwd(chunk, block, solve, residuals, cotangents):
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_bwd

    r, w_raw, k, v, a, b, zin, initial_state = residuals
    dy, dstate = cotangents
    grads = wkv7_pallas_bwd(r, w_raw, k, v, a, b, zin, dy, dstate, chunk=chunk,
                            block=block, solve=solve)
    d_init = None if initial_state is None else grads[6].astype(initial_state.dtype)
    return (*grads[:6], d_init)


_wkv7_cv_pallas_blocked.defvjp(_cv_pallas_fwd, _cv_pallas_bwd)


def _wkv7_cv_pallas(chunk, r, w_raw, k, v, a, b, initial_state):
    """Head-layout fused path.

    ``chunk`` here is the STABILITY length (what the dispatcher capped at
    16): it becomes the block-substitution SOLVE length, while the kernel
    chunk grows to ``chunk * f <= _WKV_KCHUNK`` when T divides — larger
    chunks halve the checkpoint stream and batch the MXU dots without
    touching the stability envelope (ops.wkv7_pallas._btri_solve).
    ``_WKV_BLOCK`` additionally packs kernel chunks per grid step (pure
    scheduling, bit-identical)."""
    T = r.shape[1]
    kchunk = chunk
    f = _WKV_KCHUNK // chunk
    while f > 1:  # largest kernel chunk <= _WKV_KCHUNK that divides T
        if T % (chunk * f) == 0:
            kchunk = chunk * f
            break
        f //= 2
    block = 1
    cand = _WKV_BLOCK
    while cand > 1:  # largest feasible grid-block factor <= _WKV_BLOCK
        if T % (kchunk * cand) == 0:
            block = cand
            break
        cand //= 2
    return _wkv7_cv_pallas_blocked(kchunk, block, chunk, r, w_raw, k, v, a, b,
                                   initial_state)


# -- packed-lane Pallas custom_vjp (opt-in via set_wkv_impl("packed")) -------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wkv7_cv_packed(chunk, r, w_raw, k, v, a, b, initial_state):
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_packed

    return wkv7_pallas_packed(r, w_raw, k, v, a, b, initial_state, chunk=chunk)


def _cv_packed_fwd(chunk, r, w_raw, k, v, a, b, initial_state):
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_fwd_res_packed

    y, s, zin = wkv7_pallas_fwd_res_packed(
        r, w_raw, k, v, a, b, initial_state, chunk=chunk
    )
    # same names as _cv_pallas_fwd so grad_cp="wkv" saves this path too
    y = checkpoint_name(y, "wkv_y")
    zin = checkpoint_name(zin, "wkv_res")
    return (y, s), (r, w_raw, k, v, a, b, zin, initial_state)


def _cv_packed_bwd(chunk, residuals, cotangents):
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_bwd_packed

    r, w_raw, k, v, a, b, zin, initial_state = residuals
    dy, dstate = cotangents
    grads = wkv7_pallas_bwd_packed(
        r, w_raw, k, v, a, b, zin, dy, dstate, chunk=chunk
    )
    d_init = None if initial_state is None else grads[6].astype(initial_state.dtype)
    return (*grads[:6], d_init)


_wkv7_cv_packed.defvjp(_cv_packed_fwd, _cv_packed_bwd)


def wkv7(
    r: Array,
    w_raw: Array,
    k: Array,
    v: Array,
    a: Array,
    b: Array,
    initial_state: Optional[Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[Array, Array]:
    """Entry point used by the models: fully-fused Pallas forward AND backward
    on TPU ("auto"); jnp chunked elsewhere. The implementation choice is made
    at trace time. Under a declared mesh (:func:`set_wkv_spmd`) the call is
    shard_map-partitioned per (batch, head) with no collectives. Under a
    declared sequence axis (:func:`wkv_seq_axis`, i.e. already INSIDE a
    shard_map with T sharded) it runs the context-parallel ring
    (ops.wkv_sp)."""
    if _WKV_SEQ_AXIS is not None:
        from visualrwkv_tpu.ops.wkv_sp import wkv7_seq_shard

        return wkv7_seq_shard(
            r, w_raw, k, v, a, b, initial_state=initial_state, chunk=chunk,
            axis=_WKV_SEQ_AXIS,
        )
    T = r.shape[1]
    use_pallas = _IMPL_MODE in ("pallas", "packed") or (
        _IMPL_MODE == "auto" and jax.default_backend() == "tpu"
    )
    fused_cv = (
        _wkv7_cv_packed
        if _IMPL_MODE == "packed" and r.shape[2] % 2 == 0
        else _wkv7_cv_pallas
    )
    fn_cv, eff_chunk = _wkv7_cv_chunked, chunk
    if use_pallas:
        # chunk capped at 16: the forward-substitution matrix amplifies input
        # rounding ~prod(1+|m|) over the chunk. 32 survived random-init and
        # real trained-checkpoint activations, but NaN'd after ONE Adam step
        # (sign-like updates leave k near-constant over t, so |m| ~= a_gate
        # with decay ~= 1 and the explicit (I-M)^{-1} entries reach
        # ~(1+a)^(L-1); the fp32 cancellation error then compounds chunk over
        # chunk to inf by T~1.5k). 16 is ~10x the bf16 input-rounding floor on
        # that worst case and trains stably; see tests/test_wkv7_stability.py.
        # A SMALLER caller chunk is honored: cfg.chunk_len=8 hardens against
        # the remaining (adversarial sign-alternating-kk) envelope at a
        # measured ~16% train-step cost.
        for c in (16, 8, 4):
            if c <= chunk and T % c == 0:
                fn_cv, eff_chunk = fused_cv, c
                break

    spmd = _spmd_axes(r.shape[0], r.shape[2])
    if spmd is None:
        return fn_cv(eff_chunk, r, w_raw, k, v, a, b, initial_state)
    if spmd is _SPMD_DECLINED:
        import warnings

        if fn_cv in (_wkv7_cv_pallas, _wkv7_cv_packed):
            warnings.warn(
                "wkv7: declared mesh axes do not divide batch/heads "
                f"(B={r.shape[0]}, H={r.shape[2]}); using the chunked jnp "
                "impl so GSPMD can partition it (the fused Pallas kernel "
                "would run replicated)."
            )
        return _wkv7_cv_chunked(chunk, r, w_raw, k, v, a, b, initial_state)

    from jax.sharding import PartitionSpec as P

    mesh, bs, hs = spmd
    B, _, H, N = r.shape
    if fn_cv is _wkv7_cv_packed and hs is not None:
        # packed pairs need an even PER-SHARD head count
        if (H // mesh.shape[hs]) % 2:
            fn_cv = _wkv7_cv_pallas
    if initial_state is None:
        initial_state = jnp.zeros((B, H, N, N), jnp.float32)
    xs, ss = P(bs, None, hs, None), P(bs, hs, None, None)
    f = jax.shard_map(
        functools.partial(fn_cv, eff_chunk),
        mesh=mesh,
        in_specs=(xs,) * 6 + (ss,),
        out_specs=(xs, ss),
        check_vma=False,
    )
    return f(r, w_raw, k, v, a, b, initial_state)
