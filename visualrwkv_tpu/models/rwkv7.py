"""RWKV-7 ("x070") language model — pure-functional JAX.

Parameters are nested dict pytrees whose leaf names mirror the reference
checkpoint keys (reference: VisualRWKV-v7/v7.00/src/model.py:76-325) so that
``convert.pth_import`` is a near-identity mapping.  Linear weights are stored
``[in, out]`` (transposed from PyTorch's ``[out, in]``) so forward is ``x @ W``.

Compute policy (TPU-first): matmuls run in ``cfg.compute_dtype`` (bf16) with
fp32 accumulation; token-shift deltas, LoRA nonlinearities, norms, and the WKV
state run in fp32.  The WKV recurrence is the chunked MXU kernel in
``visualrwkv_tpu.ops.wkv7``.

Every forward supports an optional recurrent state (per layer: token-shift
carries + WKV matrix state), which powers O(1) decode, streaming prefill,
state tuning, and image-as-state training.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.ops.wkv7 import wkv7, wkv7_step, wkv7_step_auto

Array = jax.Array
Params = Dict[str, Any]

STOP_TOKEN_INDEX = 261  # "\n\n" in the RWKV World vocab (reference dataset.py:20)


# ---------------------------------------------------------------------------
# Init (replicates reference init formulas, src/model.py:89-160, 200-219)
# ---------------------------------------------------------------------------


def _ortho(key: Array, shape: Tuple[int, ...], scale: float) -> Array:
    """Orthogonal init with the reference's gain convention (src/model.py:103-115)."""
    rows, cols = shape
    gain = math.sqrt(rows / cols) if rows > cols else 1.0
    mat = jax.nn.initializers.orthogonal(scale=gain * scale)(key, shape, jnp.float32)
    return mat


def _uniform(key: Array, shape, lo: float, hi: float) -> Array:
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def init_tmix_x070(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C, H, N = cfg.n_embd, cfg.n_head, cfg.head_size
    L = cfg.n_layer
    ratio_0_to_1 = layer_id / max(1, L - 1)
    ratio_1_to_almost0 = 1.0 - layer_id / L
    ddd = jnp.arange(C, dtype=jnp.float32) / C

    ks = jax.random.split(key, 8)
    decay_speed = jnp.array(
        [
            -7 + 5 * (n / max(1, C - 1)) ** (0.85 + 1.0 * ratio_0_to_1**0.5)
            for n in range(C)
        ],
        jnp.float32,
    )
    p: Params = {
        "x_r": 1.0 - ddd ** (0.2 * ratio_1_to_almost0),
        "x_w": 1.0 - ddd ** (0.9 * ratio_1_to_almost0),
        "x_k": 1.0 - (ddd ** (0.9 * ratio_1_to_almost0) + 0.4 * ratio_0_to_1),
        "x_v": 1.0 - (ddd ** (0.4 * ratio_1_to_almost0) + 0.6 * ratio_0_to_1),
        "x_a": 1.0 - ddd ** (0.9 * ratio_1_to_almost0),
        "x_g": 1.0 - ddd ** (0.2 * ratio_1_to_almost0),
        "w0": decay_speed + 0.5,  # +0.5 from the softplus soft-clamp
        "w1": jnp.zeros((C, cfg.d_decay_lora), jnp.float32),
        "w2": _ortho(ks[0], (cfg.d_decay_lora, C), 0.1),
        "a0": jnp.zeros((C,), jnp.float32),
        "a1": jnp.zeros((C, cfg.d_aaa_lora), jnp.float32),
        "a2": _ortho(ks[1], (cfg.d_aaa_lora, C), 0.1),
        "g1": jnp.zeros((C, cfg.d_gate_lora), jnp.float32),
        "g2": _ortho(ks[2], (cfg.d_gate_lora, C), 0.1),
        "k_k": jnp.full((C,), 0.85, jnp.float32),
        "k_a": jnp.ones((C,), jnp.float32),
        "r_k": jnp.zeros((H, N), jnp.float32),
        # [in, out] layout
        "receptance": {"weight": _uniform(ks[3], (C, C), -0.5 / C**0.5, 0.5 / C**0.5)},
        "key": {"weight": _uniform(ks[4], (C, C), -0.05 / C**0.5, 0.05 / C**0.5)},
        "value": {"weight": _uniform(ks[5], (C, C), -0.5 / C**0.5, 0.5 / C**0.5)},
        "output": {"weight": jnp.zeros((C, C), jnp.float32)},
        "ln_x": {"weight": jnp.ones((C,), jnp.float32), "bias": jnp.zeros((C,), jnp.float32)},
    }
    if layer_id != 0:
        p["v0"] = jnp.ones((C,), jnp.float32)
        p["v1"] = jnp.zeros((C, cfg.d_mv_lora), jnp.float32)
        p["v2"] = _ortho(ks[6], (cfg.d_mv_lora, C), 0.1)
    return p


def init_cmix_x070(key: Array, cfg: RWKVConfig, layer_id: int) -> Params:
    C = cfg.n_embd
    ratio_1_to_almost0 = 1.0 - layer_id / cfg.n_layer
    ddd = jnp.arange(C, dtype=jnp.float32) / C
    return {
        "x_k": 1.0 - ddd ** (ratio_1_to_almost0**4),
        "key": {"weight": _uniform(key, (C, cfg.dim_ffn), -0.5 / C**0.5, 0.5 / C**0.5)},
        "value": {"weight": jnp.zeros((cfg.dim_ffn, C), jnp.float32)},
    }


def _ln_init(C: int) -> Params:
    return {"weight": jnp.ones((C,), jnp.float32), "bias": jnp.zeros((C,), jnp.float32)}


def init_rwkv7_params(key: Array, cfg: RWKVConfig, dtype=None) -> Params:
    """dtype: optional storage dtype for all leaves (e.g. bf16 for serving
    7B-scale models whose fp32 init would not fit in HBM)."""
    C = cfg.n_embd
    keys = jax.random.split(key, cfg.n_layer * 2 + 2)
    blocks: List[Params] = []
    for i in range(cfg.n_layer):
        blk = {
            "ln1": _ln_init(C),
            "ln2": _ln_init(C),
            "att": init_tmix_x070(keys[2 * i], cfg, i),
            "ffn": init_cmix_x070(keys[2 * i + 1], cfg, i),
        }
        if i == 0:
            blk["ln0"] = _ln_init(C)
        blocks.append(blk)
    # RWKV convention: tiny-uniform embedding (normalized by ln0 at layer 0)
    emb = _uniform(keys[-2], (cfg.vocab_size, C), -1e-4, 1e-4)
    # RWKV convention is an orthogonal head (gain ~0.5); a QR at 65536xC is
    # prohibitively slow, and for C << vocab a scaled gaussian has the same
    # row-isometry statistics, so use it beyond a size cutoff.
    if C * cfg.vocab_size <= 16 * 2**20:
        head = _ortho(keys[-1], (C, cfg.vocab_size), 0.5)
    else:
        head = jax.random.normal(keys[-1], (C, cfg.vocab_size), jnp.float32) * (
            0.5 * C**-0.5
        )
    params = {
        "emb": {"weight": emb},
        "blocks": blocks,
        "ln_out": _ln_init(C),
        "head": {"weight": head},
    }
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    return params


# ---------------------------------------------------------------------------
# Layer state
# ---------------------------------------------------------------------------


class LayerState(NamedTuple):
    """Recurrent state of one block: token-shift carries + WKV matrix state."""

    att_shift: Array  # [B, C] last input to Tmix
    wkv: Array  # [B, H, N, N] fp32
    ffn_shift: Array  # [B, C] last input to CMix


def init_state(cfg: RWKVConfig, batch: int) -> List[LayerState]:
    C, H, N = cfg.n_embd, cfg.n_head, cfg.head_size
    return [
        LayerState(
            att_shift=jnp.zeros((batch, C), jnp.float32),
            wkv=jnp.zeros((batch, H, N, N), jnp.float32),
            ffn_shift=jnp.zeros((batch, C), jnp.float32),
        )
        for _ in range(cfg.n_layer)
    ]


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def layer_norm(p: Params, x: Array, eps: float = 1e-5) -> Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]
    return out.astype(x.dtype)


def group_norm(p: Params, x: Array, num_groups: int, eps: float) -> Array:
    """GroupNorm over the last dim split into `num_groups` (per-head ln_x)."""
    *lead, C = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, num_groups, C // num_groups)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf.reshape(*lead, C) * p["weight"] + p["bias"]
    return out.astype(x.dtype)


def linear(p: Params, x: Array, dtype: jnp.dtype) -> Array:
    if "weight_q" in p:  # int8 weight-only quantization (infer.quant)
        w = (p["weight_q"].astype(jnp.float32) * p["scale"]).astype(dtype)
    else:
        w = p["weight"].astype(dtype)
    return jnp.matmul(x.astype(dtype), w, preferred_element_type=jnp.float32)


def _token_shift(x: Array, shift_state: Optional[Array]) -> Array:
    """Previous-token stream: zeros (or the carried last token) at position 0."""
    if shift_state is None:
        prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    else:
        prev = jnp.concatenate([shift_state[:, None, :].astype(x.dtype), x[:, :-1]], axis=1)
    return prev


def _l2norm_heads(x: Array, H: int) -> Array:
    B, T, C = x.shape
    xh = x.reshape(B, T, H, C // H).astype(jnp.float32)
    # clamp BEFORE the sqrt: sqrt'(0) is inf, so x/max(||x||, eps) has NaN
    # gradient at exactly-zero rows (e.g. zero-vector pad embeddings in the
    # v6.0 leftpad insertion); rsqrt(max(n2, eps^2)) is the same forward
    # value with a finite gradient everywhere
    n2 = jnp.sum(xh * xh, axis=-1, keepdims=True)
    xh = xh * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    return xh.reshape(B, T, C).astype(x.dtype)


# ---------------------------------------------------------------------------
# TimeMix / ChannelMix / Block (sequence mode, optional state)
# ---------------------------------------------------------------------------


def tmix_x070(
    p: Params,
    cfg: RWKVConfig,
    layer_id: int,
    x: Array,
    v_first: Optional[Array],
    shift_state: Optional[Array] = None,
    wkv_state: Optional[Array] = None,
    wkv_fn=None,
) -> Tuple[Array, Array, Array, Array]:
    """Returns (out, v_first, new_shift_state, new_wkv_state).

    ``wkv_fn`` overrides the WKV recurrence op (same call signature as
    ops.wkv7.wkv7) — the speculative-decoding verify pass substitutes
    ops.wkv7.wkv7_scan_states to get the state at every position, in which
    case the returned new_wkv_state carries a [B, T, H, N, N] trail."""
    B, T, C = x.shape
    H = cfg.n_head
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    xx = _token_shift(xf, shift_state) - xf

    xr = (xf + xx * p["x_r"]).astype(dt)
    xw = (xf + xx * p["x_w"]).astype(dt)
    xk = (xf + xx * p["x_k"]).astype(dt)
    xv = (xf + xx * p["x_v"]).astype(dt)
    xa = (xf + xx * p["x_a"]).astype(dt)
    xg = (xf + xx * p["x_g"]).astype(dt)

    r = linear(p["receptance"], xr, dt)
    w_lora = jnp.tanh(jnp.matmul(xw, p["w1"].astype(dt), preferred_element_type=jnp.float32))
    w_lora = jnp.matmul(w_lora.astype(dt), p["w2"].astype(dt), preferred_element_type=jnp.float32)
    # soft-clamp to (-inf, -0.5): -softplus(-(w0 + lora)) - 0.5
    w_raw = -jax.nn.softplus(-(p["w0"] + w_lora)) - 0.5
    k = linear(p["key"], xk, dt)
    v = linear(p["value"], xv, dt)

    if layer_id == 0:
        v_first = v
    else:
        v_lora = jnp.matmul(xv, p["v1"].astype(dt), preferred_element_type=jnp.float32)
        v_lora = jnp.matmul(v_lora.astype(dt), p["v2"].astype(dt), preferred_element_type=jnp.float32)
        v = v + (v_first - v) * jax.nn.sigmoid(p["v0"] + v_lora)

    a_lora = jnp.matmul(xa, p["a1"].astype(dt), preferred_element_type=jnp.float32)
    a_lora = jnp.matmul(a_lora.astype(dt), p["a2"].astype(dt), preferred_element_type=jnp.float32)
    a = jax.nn.sigmoid(p["a0"] + a_lora)
    g_lora = jax.nn.sigmoid(
        jnp.matmul(xg, p["g1"].astype(dt), preferred_element_type=jnp.float32)
    )
    g = jnp.matmul(g_lora.astype(dt), p["g2"].astype(dt), preferred_element_type=jnp.float32)

    kk = _l2norm_heads(k * p["k_k"], H)
    k = k * (1 + (a - 1) * p["k_a"])

    shp = (B, T, H, C // H)
    y, new_wkv = (wkv_fn or wkv7)(
        r.astype(dt).reshape(shp),
        w_raw.astype(dt).reshape(shp),
        k.astype(dt).reshape(shp),
        v.astype(dt).reshape(shp),
        (-kk).astype(dt).reshape(shp),
        (kk * a).astype(dt).reshape(shp),
        initial_state=wkv_state,
        chunk=cfg.chunk_len,
    )
    y = y.reshape(B, T, C)

    eps = 1e-5 * cfg.head_size_divisor**2
    y = group_norm(p["ln_x"], y, H, eps)

    rk = (r * k).astype(jnp.float32).reshape(B, T, H, -1) * p["r_k"]
    bonus = rk.sum(-1, keepdims=True) * v.astype(jnp.float32).reshape(B, T, H, -1)
    y = y.astype(jnp.float32) + bonus.reshape(B, T, C)
    out = linear(p["output"], (y * g.astype(jnp.float32)).astype(dt), dt)
    new_shift = xf[:, -1]
    return out, v_first, new_shift, new_wkv


def cmix_x070(
    p: Params, cfg: RWKVConfig, x: Array, shift_state: Optional[Array] = None
) -> Tuple[Array, Array]:
    dt = jnp.dtype(cfg.compute_dtype)
    xf = x.astype(jnp.float32)
    xx = _token_shift(xf, shift_state) - xf
    kx = (xf + xx * p["x_k"]).astype(dt)
    # relu^2 in compute dtype (matmul still accumulates fp32): the 4x-wide
    # key activation is the single largest residual, and the reference's
    # torch autocast computes this activation in bf16 too
    k = jnp.square(jax.nn.relu(linear(p["key"], kx, dt).astype(dt)))
    out = linear(p["value"], k, dt)
    return out, xf[:, -1]


def block_x070(
    p: Params,
    cfg: RWKVConfig,
    layer_id: int,
    x: Array,
    v_first: Optional[Array],
    state: Optional[LayerState] = None,
) -> Tuple[Array, Array, LayerState]:
    if layer_id == 0:
        x = layer_norm(p["ln0"], x)
    att_shift = state.att_shift if state is not None else None
    wkv_state = state.wkv if state is not None else None
    ffn_shift = state.ffn_shift if state is not None else None

    xx, v_first, new_att_shift, new_wkv = tmix_x070(
        p["att"], cfg, layer_id, layer_norm(p["ln1"], x), v_first, att_shift, wkv_state
    )
    x = x + xx
    ff, new_ffn_shift = cmix_x070(p["ffn"], cfg, layer_norm(p["ln2"], x), ffn_shift)
    x = x + ff
    return x, v_first, LayerState(new_att_shift, new_wkv, new_ffn_shift)


# ---------------------------------------------------------------------------
# Full LM forward
# ---------------------------------------------------------------------------


def embed(params: Params, tokens: Array) -> Array:
    return params["emb"]["weight"][tokens]


def _remat_policy(grad_cp):
    """grad_cp: False | True ("full" per-block remat) | "dots" (save MXU
    outputs, recompute only elementwise/norms — trades ~2x activation memory
    for skipping the projection recompute in the backward) | "wkv" (save only
    the WKV kernel output + boundary-state stream, named in ops.wkv7's
    custom_vjp fwd — the backward re-forwards the cheap projections/norms but
    never re-runs the WKV kernel, the block's most expensive single op)."""
    if grad_cp == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if grad_cp == "wkv":
        return jax.checkpoint_policies.save_only_these_names(
            "wkv_y", "wkv_res"
        )
    return None


def rwkv7_forward(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    states: Optional[List[LayerState]] = None,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Tuple[Array, List[LayerState]]:
    """Full forward over input embeddings ``x`` [B, T, C].

    Pads LEFT with EOS-token embeddings to a multiple of ``cfg.chunk_len`` when
    no state is given (reference RWKV.forward, src/model.py:286-325); with a
    carried state the caller must supply T % chunk_len == 0 (streaming prefill
    handles remainders at the engine level).

    Returns (logits [B, T, vocab] — or hidden [B, T, C] if return_hidden —
    and the per-layer final states).
    """
    B, T, C = x.shape
    pad = (-T) % cfg.chunk_len
    if pad:
        if states is not None:
            raise ValueError("stateful forward requires T % chunk_len == 0")
        eos = embed(params, jnp.full((B, pad), STOP_TOKEN_INDEX, jnp.int32))
        x = jnp.concatenate([eos.astype(x.dtype), x], axis=1)

    v_first = None
    new_states: List[LayerState] = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i] if states is not None else None
        if grad_cp:
            fn = jax.checkpoint(
                lambda p, xx, vf, ss, i=i: block_x070(p, cfg, i, xx, vf, ss),
                policy=_remat_policy(grad_cp),
            )
            x, v_first, ns = fn(blk, x, v_first, st)
        else:
            x, v_first, ns = block_x070(blk, cfg, i, x, v_first, st)
        new_states.append(ns)

    x = layer_norm(params["ln_out"], x)
    if pad:
        x = x[:, pad:]
    if return_hidden:
        return x, new_states
    logits = linear(params["head"], x, jnp.dtype(cfg.compute_dtype))
    return logits, new_states


def rwkv7_forward_tokens(
    params: Params,
    cfg: RWKVConfig,
    tokens: Array,
    states: Optional[List[LayerState]] = None,
    grad_cp: bool = False,
) -> Tuple[Array, List[LayerState]]:
    return rwkv7_forward(params, cfg, embed(params, tokens), states, grad_cp)


def rwkv7_forward_seq(
    params: Params,
    cfg: RWKVConfig,
    x: Array,
    axis: str = "seq",
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Array:
    """Context-parallel forward: run INSIDE shard_map with the TOKEN axis
    sharded over ``axis`` (long-context training; no reference analog).

    Everything in a block is per-token except two couplings across the shard
    boundary, both handled here: the 1-token shift (a halo exchange of each
    shard's last post-ln token) and the WKV recurrence (the ring-scan state
    composition of ops.wkv_sp, dispatched via ops.wkv7.wkv_seq_axis).
    ``x``: [B, T_local, C] with T_local % chunk_len == 0 (shard boundaries
    must fall on chunk boundaries). Returns this shard's logits (or hidden).
    """
    from visualrwkv_tpu.ops.wkv7 import wkv_seq_axis

    B, T, C = x.shape
    if T % cfg.chunk_len:
        raise ValueError(
            f"seq-parallel shards must be chunk-aligned: T_local={T}, "
            f"chunk_len={cfg.chunk_len}"
        )
    D = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    def halo_last(t):
        """Left neighbor's last position (the token-shift carry); zeros on
        shard 0 — identical to the stateless single-device shift."""
        recv = jax.lax.ppermute(
            t[:, -1], axis, [(s, (s + 1) % D) for s in range(D)]
        )
        return jnp.where(idx == 0, jnp.zeros_like(recv), recv)

    def body(p, xx, vf, i):
        if i == 0:
            xx = layer_norm(p["ln0"], xx)
        xin = layer_norm(p["ln1"], xx)
        att_shift = halo_last(xin.astype(jnp.float32))
        yy, vf, _, _ = tmix_x070(p["att"], cfg, i, xin, vf, att_shift, None)
        xx = xx + yy
        xin2 = layer_norm(p["ln2"], xx)
        ffn_shift = halo_last(xin2.astype(jnp.float32))
        ff, _ = cmix_x070(p["ffn"], cfg, xin2, ffn_shift)
        return xx + ff, vf

    v_first = None
    with wkv_seq_axis(axis):
        for i, blk in enumerate(params["blocks"]):
            fn = body
            if grad_cp:
                fn = jax.checkpoint(
                    lambda p, xx, vf, i=i: body(p, xx, vf, i),
                    policy=_remat_policy(grad_cp),
                )
                x, v_first = fn(blk, x, v_first)
            else:
                x, v_first = body(blk, x, v_first, i)

    x = layer_norm(params["ln_out"], x)
    if return_hidden:
        return x
    return linear(params["head"], x, jnp.dtype(cfg.compute_dtype))


# ---------------------------------------------------------------------------
# Stacked-layer scan forward (compile-time scaling for deep models)
# ---------------------------------------------------------------------------


def stack_blocks(params: Params) -> Params:
    """Stack blocks 1..L-1 into leading-axis pytrees for ``lax.scan``.

    Layer 0 stays separate (it carries ln0 and defines v_first, and has no
    v0/v1/v2). Do this ONCE outside jit; the stacked tree is what you feed to
    :func:`rwkv7_forward_stacked`.
    """
    rest = params["blocks"][1:]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rest)
    return {
        "emb": params["emb"],
        "block0": params["blocks"][0],
        "blocks_stacked": stacked,
        "ln_out": params["ln_out"],
        "head": params["head"],
    }


def unstack_blocks(sparams: Params) -> Params:
    """Inverse of :func:`stack_blocks`: back to the canonical list-of-blocks
    tree (the checkpoint format). Do this outside jit."""
    stacked = sparams["blocks_stacked"]
    n_rest = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    rest = [
        jax.tree_util.tree_map(lambda x, i=i: x[i], stacked) for i in range(n_rest)
    ]
    return {
        "emb": sparams["emb"],
        "blocks": [sparams["block0"], *rest],
        "ln_out": sparams["ln_out"],
        "head": sparams["head"],
    }


def is_stacked(params: Params) -> bool:
    return "blocks_stacked" in params


def rwkv7_forward_stacked(
    sparams: Params,
    cfg: RWKVConfig,
    x: Array,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Array:
    """Forward over ``stack_blocks`` output: the layer loop is ONE traced
    ``lax.scan`` body instead of n_layer inlined copies — compile time is
    O(1) in depth. Stateless path (training/prefill without carried state)."""
    B, T, C = x.shape
    pad = (-T) % cfg.chunk_len
    if pad:
        eos = sparams["emb"]["weight"][jnp.full((B, pad), STOP_TOKEN_INDEX, jnp.int32)]
        x = jnp.concatenate([eos.astype(x.dtype), x], axis=1)

    x, v_first, _ = block_x070(sparams["block0"], cfg, 0, x, None)

    def body(carry, blk):
        xx, vf = carry
        fn = lambda b, xc, vc: block_x070(b, cfg, 1, xc, vc)[:2]
        if grad_cp:
            fn = jax.checkpoint(fn, policy=_remat_policy(grad_cp))
        xx, vf = fn(blk, xx, vf)
        return (xx, vf), None

    (x, v_first), _ = jax.lax.scan(body, (x, v_first), sparams["blocks_stacked"])
    x = layer_norm(sparams["ln_out"], x)
    if pad:
        x = x[:, pad:]
    if return_hidden:
        return x
    return linear(sparams["head"], x, jnp.dtype(cfg.compute_dtype))


# ---------------------------------------------------------------------------
# O(1) decode step
# ---------------------------------------------------------------------------


def rwkv7_decode_step(
    params: Params, cfg: RWKVConfig, token: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    """One autoregressive step. token: [B] int32 -> (logits [B, vocab], states)."""
    return rwkv7_decode_step_embed(params, cfg, embed(params, token), states)


def rwkv7_decode_step_embed(
    params: Params, cfg: RWKVConfig, x_emb: Array, states: List[LayerState]
) -> Tuple[Array, List[LayerState]]:
    """One step from an input embedding [B, C] (image-as-state prefill path).

    Uses the T=1 WKV step kernel; all per-layer math identical to sequence mode.
    """
    x = x_emb[:, None, :]  # [B, 1, C]
    B = x.shape[0]
    H, N = cfg.n_head, cfg.head_size
    dt = jnp.dtype(cfg.compute_dtype)

    v_first = None
    new_states: List[LayerState] = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i]
        if i == 0:
            x = layer_norm(blk["ln0"], x)
        xin = layer_norm(blk["ln1"], x)

        # Tmix with explicit T=1 path (shares tmix math via wkv7_step)
        p = blk["att"]
        xf = xin.astype(jnp.float32)
        xx = st.att_shift[:, None, :] - xf
        xr, xw, xk, xv, xa, xg = (
            (xf + xx * p[n]).astype(dt) for n in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g")
        )
        r = linear(p["receptance"], xr, dt)
        w_lora = jnp.tanh(jnp.matmul(xw, p["w1"].astype(dt), preferred_element_type=jnp.float32))
        w_raw = -jax.nn.softplus(
            -(p["w0"] + jnp.matmul(w_lora.astype(dt), p["w2"].astype(dt), preferred_element_type=jnp.float32))
        ) - 0.5
        k = linear(p["key"], xk, dt)
        v = linear(p["value"], xv, dt)
        if i == 0:
            v_first = v
        else:
            v_lora = jnp.matmul(xv, p["v1"].astype(dt), preferred_element_type=jnp.float32)
            v_lora = jnp.matmul(v_lora.astype(dt), p["v2"].astype(dt), preferred_element_type=jnp.float32)
            v = v + (v_first - v) * jax.nn.sigmoid(p["v0"] + v_lora)
        a_lora = jnp.matmul(xa, p["a1"].astype(dt), preferred_element_type=jnp.float32)
        a = jax.nn.sigmoid(p["a0"] + jnp.matmul(a_lora.astype(dt), p["a2"].astype(dt), preferred_element_type=jnp.float32))
        g_lr = jax.nn.sigmoid(jnp.matmul(xg, p["g1"].astype(dt), preferred_element_type=jnp.float32))
        g = jnp.matmul(g_lr.astype(dt), p["g2"].astype(dt), preferred_element_type=jnp.float32)
        kk = _l2norm_heads(k * p["k_k"], H)
        k = k * (1 + (a - 1) * p["k_a"])

        shp = (B, H, N)
        new_wkv, y = wkv7_step_auto(
            st.wkv,
            r.reshape(shp),
            w_raw.reshape(shp),
            k.reshape(shp),
            v.reshape(shp),
            (-kk).reshape(shp),
            (kk * a).reshape(shp),
        )
        y = y.reshape(B, 1, -1)
        eps = 1e-5 * cfg.head_size_divisor**2
        y = group_norm(p["ln_x"], y.astype(dt), H, eps)
        rk = (r * k).astype(jnp.float32).reshape(B, 1, H, -1) * p["r_k"]
        bonus = rk.sum(-1, keepdims=True) * v.astype(jnp.float32).reshape(B, 1, H, -1)
        y = y.astype(jnp.float32) + bonus.reshape(B, 1, -1)
        att_out = linear(p["output"], (y * g.astype(jnp.float32)).astype(dt), dt)
        new_att_shift = xf[:, -1]

        x = x + att_out
        xin2 = layer_norm(blk["ln2"], x)
        ff, new_ffn_shift = cmix_x070(blk["ffn"], cfg, xin2, st.ffn_shift)
        x = x + ff
        # carry dtype is preserved: serving may hold the WKV state in bf16
        # (state_dtype option) to halve the dominant decode HBM-traffic term
        new_states.append(
            LayerState(new_att_shift, new_wkv.astype(st.wkv.dtype), new_ffn_shift)
        )

    x = layer_norm(params["ln_out"], x)
    logits = linear(params["head"], x, dt)[:, 0]
    return logits, new_states
