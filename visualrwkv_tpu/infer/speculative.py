"""Speculative decoding: draft proposals + one T-parallel verify pass.

No reference analog (the reference serves one token per weight read,
app/modeling_rwkv.py:1007-1046); this targets the single-stream/low-batch
regime where RWKV decode is weight-bandwidth-bound: a cheap DRAFT model
proposes ``k`` greedy tokens, the TARGET consumes all ``k+1`` in ONE
chunk-parallel forward (one weight read amortized over the window), and the
longest draft prefix matching the target's own greedy choices is committed
plus one bonus token from the verify logits. Greedy outputs are LOSSLESS:
every emitted token equals what plain greedy decode would emit (exact
arithmetic; fp ties at the argmax are the usual caveat).

The RWKV-specific part is state rollback: acceptance can stop anywhere in
the window, so the verify forward must expose the recurrent state at EVERY
position. ``forward_states`` runs the standard T-parallel block stack but
swaps the WKV op for a per-token ``lax.scan`` over the short window
(ops.wkv7.wkv7_scan_states) — the window's elementwise scan is negligible
next to the projections it parallelizes — and records the token-shift
carries per position (they are just the post-ln inputs). The draft's state
trail falls out of its proposal scan for free.

Drafts are anything with the same vocabulary: a smaller RWKV (0B1/0B4 for a
1B5/7B target) or the QUANTIZED target itself (``quantize_self_draft`` —
int8 weight-only self-speculation needs no second checkpoint and agrees
with the bf16 target on most greedy steps).

Everything — draft scan, verify, acceptance, rollback, output packing —
lives inside one jitted ``lax.while_loop``: zero host round-trips per
round, which the remote-TPU tunnel makes mandatory.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visualrwkv_tpu.config import RWKVConfig, VLMConfig
from visualrwkv_tpu.data.conversation import STOP_TOKEN_INDEX
from visualrwkv_tpu.models import lm, rwkv6, rwkv7
from visualrwkv_tpu.models.rwkv7 import LayerState

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Verify forward: logits + per-position state trail
# ---------------------------------------------------------------------------


def _forward_states_x070(params: Params, cfg: RWKVConfig, x: Array, states):
    from visualrwkv_tpu.ops.wkv7 import wkv7_scan_states

    dt = jnp.dtype(cfg.compute_dtype)
    v_first = None
    trail = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i]
        if i == 0:
            x = rwkv7.layer_norm(blk["ln0"], x)
        xin = rwkv7.layer_norm(blk["ln1"], x)
        yy, v_first, _, wkv_trail = rwkv7.tmix_x070(
            blk["att"], cfg, i, xin, v_first, st.att_shift, st.wkv,
            wkv_fn=wkv7_scan_states,
        )
        x = x + yy
        xin2 = rwkv7.layer_norm(blk["ln2"], x)
        ff, _ = rwkv7.cmix_x070(blk["ffn"], cfg, xin2, st.ffn_shift)
        x = x + ff
        # token-shift carries per position ARE the post-ln inputs; state
        # after consuming position i carries xin[:, i]
        trail.append(LayerState(
            att_shift=xin.astype(jnp.float32),
            wkv=wkv_trail,
            ffn_shift=xin2.astype(jnp.float32),
        ))
    x = rwkv7.layer_norm(params["ln_out"], x)
    logits = rwkv7.linear(params["head"], x, dt)
    return logits, trail


def _forward_states_x060(params: Params, cfg: RWKVConfig, x: Array, states):
    from visualrwkv_tpu.ops.wkv6 import wkv6_scan_states

    dt = jnp.dtype(cfg.compute_dtype)
    trail = []
    for i, blk in enumerate(params["blocks"]):
        st = states[i]
        if i == 0:
            x = rwkv6.layer_norm(blk["ln0"], x)
        xin = rwkv6.layer_norm(blk["ln1"], x)
        yy, _, wkv_trail = rwkv6.tmix_x060(
            blk["att"], cfg, xin, st.att_shift, st.wkv, wkv_fn=wkv6_scan_states
        )
        x = x + yy
        xin2 = rwkv6.layer_norm(blk["ln2"], x)
        ff, _ = rwkv6.cmix_x060(blk["ffn"], cfg, xin2, st.ffn_shift)
        x = x + ff
        trail.append(LayerState(
            att_shift=xin.astype(jnp.float32),
            wkv=wkv_trail,
            ffn_shift=xin2.astype(jnp.float32),
        ))
    x = rwkv6.layer_norm(params["ln_out"], x)
    logits = rwkv6.linear(params["head"], x, dt)
    return logits, trail


def forward_states(params: Params, cfg: RWKVConfig, x: Array, states):
    """T-parallel forward over a short window: (logits [B, K, V], trail)
    where the trail is a per-layer LayerState whose fields carry a K-length
    position axis at axis 1 (wkv [B, K, H, N, N]; shifts [B, K, C]) —
    ``trail[l].wkv[:, i]`` is layer l's state AFTER consuming position i."""
    if cfg.version == "x070":
        return _forward_states_x070(params, cfg, x, states)
    if cfg.version == "x060":
        return _forward_states_x060(params, cfg, x, states)
    raise NotImplementedError(
        f"speculative verify supports x070/x060, got {cfg.version!r}"
    )


def _take_pos(arr: Array, m: Array, axis: int = 1) -> Array:
    """arr [B, K, ...] + per-row position m [B] -> [B, ...]."""
    idx = m.reshape((-1,) + (1,) * (arr.ndim - 1)).astype(jnp.int32)
    return jnp.take_along_axis(arr, idx, axis=axis)[:, 0]


def select_states(trail, m: Array):
    """Roll the state trail back to per-row position ``m``."""
    return [
        LayerState(
            att_shift=_take_pos(s.att_shift, m),
            wkv=_take_pos(s.wkv, m),
            ffn_shift=_take_pos(s.ffn_shift, m),
        )
        for s in trail
    ]


# ---------------------------------------------------------------------------
# The speculative loop (one jitted while_loop)
# ---------------------------------------------------------------------------


class SpeculativeResult(NamedTuple):
    tokens: np.ndarray   # [B, max_new_tokens] (STOP-padded)
    lengths: np.ndarray  # [B] generated tokens incl. stop
    rounds: int          # draft/verify rounds executed
    accepted: np.ndarray  # [B] accepted draft tokens (diagnostic; the
    #                       per-round mean acceptance is accepted/rounds)


def _spec_loop(
    tparams, tcfg: RWKVConfig, dparams, dcfg: RWKVConfig,
    first_logits: Array, st_t, st_d,
    k: int, max_new_tokens: int, stop_tokens: Tuple[int, ...],
):
    B = first_logits.shape[0]
    stop = jnp.asarray(stop_tokens, jnp.int32)
    buf_len = max_new_tokens + k + 1  # round-granular slack; sliced on exit

    def argmax32(l):
        return jnp.argmax(l.astype(jnp.float32), axis=-1).astype(jnp.int32)

    def cond(c):
        finished, counts, rounds = c[3], c[4], c[5]
        return jnp.any(~finished) & (rounds < max_new_tokens)

    def body(c):
        Lt, st_t, st_d, finished, counts, rounds, out, acc = c
        t0 = jnp.where(finished, STOP_TOKEN_INDEX, argmax32(Lt))

        # -- draft: consume t0, propose k tokens greedily; one extra step so
        # the draft state trail covers every acceptance point m in 0..k
        def dbody(carry, _):
            tok, st = carry
            logits, st2 = lm.lm_decode_step(dparams, dcfg, tok, st)
            return (argmax32(logits), st2), (argmax32(logits), st2)

        (_, _), (props, dtrail) = jax.lax.scan(
            dbody, (t0, st_d), None, length=k + 1
        )
        e = jnp.concatenate(
            [t0[:, None], jnp.moveaxis(props[:-1], 0, 1)], axis=1
        )  # [B, k+1] tokens the window consumes

        # -- verify: ONE T-parallel target pass over the window
        L_all, trail = forward_states(tparams, tcfg, lm.embed(tparams, e), st_t)
        pred = argmax32(L_all)  # [B, k+1]; pred[:, i] follows e[:, :i+1]

        # longest accepted draft prefix: x_i = e[:, i] accepted iff it equals
        # the target's own choice after the previous tokens, cumulatively
        match = (e[:, 1:] == pred[:, :-1]).astype(jnp.int32)
        m = jnp.cumprod(match, axis=1).sum(axis=1)  # [B] in 0..k

        # -- emit committed tokens (cut at the first stop / budget edge)
        stop_hit = (e[..., None] == stop[None, None, :]).any(-1)
        first_stop = jnp.where(
            stop_hit.any(1), jnp.argmax(stop_hit, axis=1), k + 1
        )
        n_valid = jnp.minimum(m + 1, first_stop + 1)
        n_emit = jnp.where(finished, 0, jnp.minimum(n_valid, max_new_tokens - counts))
        j = jnp.arange(k + 1)[None, :]
        idx = jnp.where(j < n_emit[:, None], counts[:, None] + j, buf_len)
        out = out.at[jnp.arange(B)[:, None], idx].set(e, mode="drop")

        # -- roll both models back to the last consumed committed token and
        # pick up the bonus logits; finished rows freeze
        new_Lt = _take_pos(L_all, m)
        st_t_new = select_states(trail, m)
        dtrail = jax.tree_util.tree_map(lambda s: jnp.moveaxis(s, 0, 1), dtrail)
        st_d_new = jax.tree_util.tree_map(lambda s: _take_pos(s, m), dtrail)

        def keep(old, new):
            mask = finished.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, old, new)

        Lt = keep(Lt, new_Lt.astype(Lt.dtype))
        st_t = jax.tree_util.tree_map(keep, st_t, st_t_new)
        st_d = jax.tree_util.tree_map(keep, st_d, st_d_new)
        acc = acc + jnp.where(finished, 0, m)
        counts = counts + n_emit
        finished = finished | (first_stop <= m) | (counts >= max_new_tokens)
        return (Lt, st_t, st_d, finished, counts, rounds + 1, out, acc)

    init = (
        first_logits.astype(jnp.float32),
        st_t,
        st_d,
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.full((B, buf_len), STOP_TOKEN_INDEX, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    _, _, _, _, counts, rounds, out, acc = jax.lax.while_loop(cond, body, init)
    return out[:, :max_new_tokens], counts, rounds, acc


class SpeculativeEngine:
    """Greedy speculative generation around two InferenceEngines.

    ``params/cfg`` and ``draft_params/draft_cfg`` are full VLM trees sharing
    one vocabulary; the backbones may differ in size, precision, and even
    version (x070 target with an x060 draft is fine — only token ids cross
    the boundary). ``k`` is the proposal window (draft tokens per round)."""

    def __init__(self, params: Params, cfg: VLMConfig,
                 draft_params: Params, draft_cfg: VLMConfig, k: int = 8):
        from visualrwkv_tpu.infer.engine import InferenceEngine

        if cfg.rwkv.version not in ("x070", "x060"):
            raise NotImplementedError(
                f"speculative target supports x070/x060, got {cfg.rwkv.version!r}"
            )
        self.k = int(k)
        self.cfg = cfg
        self.draft_cfg = draft_cfg
        self._target = InferenceEngine(params, cfg)
        self._draft = InferenceEngine(draft_params, draft_cfg)
        self._loop = jax.jit(
            lambda tp, dp, fl, st, sd, k, mnt, stop: _spec_loop(
                tp, cfg.rwkv, dp, draft_cfg.rwkv, fl, st, sd, k, mnt, stop
            ),
            static_argnames=("k", "mnt", "stop"),
        )

    def generate(
        self,
        input_ids,
        images: Optional[Dict[str, Any]] = None,
        max_new_tokens: int = 128,
        stop_tokens: Tuple[int, ...] = (0, STOP_TOKEN_INDEX),
    ) -> SpeculativeResult:
        first_logits, st_t = self._target.prefill_ids(input_ids, images)
        draft_images = images if self.draft_cfg.vision.towers else None
        _, st_d = self._draft.prefill_ids(input_ids, draft_images)
        tokens, lengths, rounds, acc = self._loop(
            self._target.params["rwkv"], self._draft.params["rwkv"],
            first_logits, st_t, st_d,
            k=self.k, mnt=int(max_new_tokens), stop=tuple(stop_tokens),
        )
        return SpeculativeResult(
            np.asarray(tokens), np.asarray(lengths), int(rounds), np.asarray(acc)
        )


def quantize_self_draft(params: Params) -> Params:
    """int8 weight-only SELF-draft: the quantized target proposes for the
    full-precision target — no second checkpoint, high greedy agreement."""
    from visualrwkv_tpu.infer.quant import quantize_lm_params

    return quantize_lm_params(params)
