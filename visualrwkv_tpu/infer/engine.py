"""O(1)-state RNN inference engine.

The reference only has true state-based decode for v5/v6 in its serving stack
(app/modeling_rwkv.py:1007-1248); its v7 eval path re-runs the FULL prefix per
token (O(T^2), evaluate.py call stack, SURVEY §3.2 "perf cliff").  Here decode
is prefill -> per-layer recurrent state -> one jitted ``lax.scan`` over decode
steps, so cost per token is O(1) and the whole generation loop is a single
device program (per-op host round-trips are fatal over remote-TPU links).

Capabilities: batched greedy/top-p sampling with presence/frequency penalties,
stop-token early masking, image-as-state prefill and a base64/bytes-keyed image
state cache (app/app_gpu.py:134-151 semantics), multi-round chat by chaining
states.
"""

from __future__ import annotations

import functools
import hashlib
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visualrwkv_tpu.config import VLMConfig
from visualrwkv_tpu.data.conversation import STOP_TOKEN_INDEX
from visualrwkv_tpu.infer.sampling import (
    SamplingParams,
    apply_penalties,
    sample_logits,
    update_occurrence,
)
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.models.visualrwkv import prepare_embeddings

Array = jax.Array
Params = Dict[str, Any]


class GenerateResult(NamedTuple):
    tokens: np.ndarray  # [B, max_new_tokens] (padded with stop token)
    lengths: np.ndarray  # [B] number of generated tokens incl. stop
    logits: np.ndarray  # [B, max_new_tokens] logit of each sampled token
    probs: np.ndarray  # [B, max_new_tokens] softmax prob of each sampled token


def _prefill(params, cfg: VLMConfig, x_emb, states):
    """Run embeddings through the LM; returns (last_logits, states).

    Stateless: one chunked forward with EOS left-padding (training semantics).
    Stateful: bulk chunked part + per-step scan for the sub-chunk tail.
    """
    rcfg = cfg.rwkv
    if states is None:
        logits, states = lm.lm_forward(params["rwkv"], rcfg, x_emb)
        return logits[:, -1], states

    T = x_emb.shape[1]
    bulk = T - T % rcfg.chunk_len
    last_logits = None
    if bulk:
        logits, states = lm.lm_forward(
            params["rwkv"], rcfg, x_emb[:, :bulk], states=states
        )
        last_logits = logits[:, -1]
    if T - bulk:
        xs = jnp.moveaxis(x_emb[:, bulk:], 1, 0)

        def body(st, x):
            logits, st = lm.lm_decode_step_embed(params["rwkv"], rcfg, x, st)
            return st, logits

        states, step_logits = jax.lax.scan(body, states, xs)
        last_logits = step_logits[-1]
    return last_logits, states


def _decode_loop(params, cfg: VLMConfig, first_logits, states, key, sp: SamplingParams,
                 max_new_tokens: int, stop_tokens):
    """One jitted scan producing up to max_new_tokens tokens with stop masking."""
    rcfg = cfg.rwkv
    B = first_logits.shape[0]
    V = first_logits.shape[-1]
    occurrence = jnp.zeros((B, V), jnp.float32)
    finished = jnp.zeros((B,), bool)
    stop = jnp.asarray(stop_tokens, jnp.int32)

    def body(carry, key_t):
        logits, states, occurrence, finished = carry
        penalized = apply_penalties(logits.astype(jnp.float32), occurrence, sp)
        token = sample_logits(key_t, penalized, sp)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        tok_logit = jnp.take_along_axis(
            logits.astype(jnp.float32), token[:, None], axis=-1
        )[:, 0]
        tok_prob = jnp.take_along_axis(probs, token[:, None], axis=-1)[:, 0]
        token = jnp.where(finished, STOP_TOKEN_INDEX, token)
        occurrence = update_occurrence(occurrence, token, sp)
        now_stopped = jnp.any(token[:, None] == stop[None, :], axis=-1)
        new_finished = finished | now_stopped
        next_logits, new_states = lm.lm_decode_step(
            params["rwkv"], rcfg, token, states
        )
        # freeze state for finished rows
        def keep(old, new):
            mask = new_finished.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, old, new)

        new_states = jax.tree_util.tree_map(keep, states, new_states)
        out = (token, tok_logit, tok_prob, finished)
        return (next_logits, new_states, occurrence, new_finished), out

    keys = jax.random.split(key, max_new_tokens)
    (_, states, _, _), (tokens, tls, tps, was_finished) = jax.lax.scan(
        body, (first_logits, states, occurrence, finished), keys
    )
    tokens = jnp.moveaxis(tokens, 0, 1)
    lengths = (~jnp.moveaxis(was_finished, 0, 1)).sum(axis=1)
    return tokens, lengths, jnp.moveaxis(tls, 0, 1), jnp.moveaxis(tps, 0, 1), states


class InferenceEngine:
    """Stateful convenience wrapper holding params + jitted paths + state cache."""

    def __init__(self, params: Params, cfg: VLMConfig, state_dtype: str = "float32",
                 state_layout: str = "head"):
        """state_dtype: dtype the recurrent WKV state is CARRIED in during
        decode ("float32" default = reference precision; "bfloat16" halves
        the dominant decode HBM-traffic term at 1B5/B32 — step math still
        runs fp32, only the carried state is rounded). Token-shift carries
        stay fp32 (negligible size, norm-sensitive).

        state_layout: "head" carries the canonical [B, H, 64, 64] WKV state
        (lane-padded 64->128 by TPU tiling, 2x its logical bytes every step);
        "flat" carries [B, 64, H*64] with no padding (ops.wkv7.wkv7_step_flat)
        — identical math, prefill states are converted once before decode."""
        if state_layout not in ("head", "flat"):
            raise ValueError(f"unknown state_layout {state_layout!r}")
        if cfg.rwkv.version == "x040":
            # x040 carries a [B, C, 3] aa/bb/pp triple, not a matrix WKV
            # state: the flat [B, Nv, H*Nk] relayout is shape-incompatible,
            # and bf16 is unsafe for the log-domain max-tracked pp carry.
            if state_layout != "head":
                raise ValueError(
                    "state_layout='flat' requires a matrix-state RWKV version "
                    "(x052/x060/x070); x040 carries an aa/bb/pp triple"
                )
            if jnp.dtype(state_dtype) != jnp.float32:
                raise ValueError(
                    "x040 requires state_dtype='float32' (the log-domain "
                    "pp carry is max-tracked and unsafe in bf16)"
                )
        self.params = params
        self.cfg = cfg
        self.state_dtype = jnp.dtype(state_dtype)
        self.state_layout = state_layout
        self._state_cache: Dict[str, Any] = {}
        self._sample_counter = 0  # default-key entropy across generate() calls
        # params flow as explicit jit arguments (closure capture would bake
        # them into the executable as multi-GB constants)
        self._prefill_p = jax.jit(lambda p, x, st: _prefill(p, cfg, x, st))
        self._decode_p = jax.jit(
            lambda p, fl, st, key, sp, max_new_tokens, stop_tokens: _decode_loop(
                p, cfg, fl, st, key, sp, max_new_tokens, stop_tokens
            ),
            static_argnames=("sp", "max_new_tokens", "stop_tokens"),
        )
        self._prepare = jax.jit(
            lambda p, ids, images: prepare_embeddings(p, cfg, ids, images)
        )
        self._prepare_text = jax.jit(lambda p, ids: prepare_embeddings(p, cfg, ids))
        self._prefill = lambda x, st: self._prefill_p(self.params, x, st)
        self._decode = lambda fl, st, key, **kw: self._decode_p(
            self.params, fl, st, key, **kw
        )

    # -- state construction -------------------------------------------------

    def prefill_ids(self, input_ids, images=None, states=None):
        ids = jnp.asarray(input_ids)
        if images is not None:
            x = self._prepare(self.params, ids, images)
        else:
            x = self._prepare_text(self.params, ids)
        return self._prefill(x, states)

    def compute_image_state(self, images: Dict[str, np.ndarray], cache_key: Optional[str] = None):
        """Image -> RNN state (prefill on projected image embeddings only),
        cached by content hash (app_gpu.py:134-151 image-state caching)."""
        if cache_key is None:
            h = hashlib.sha256()
            for t in sorted(images):
                h.update(np.asarray(images[t]).tobytes())
            cache_key = h.hexdigest()
        if cache_key in self._state_cache:
            return self._state_cache[cache_key]
        from visualrwkv_tpu.models.visualrwkv import encode_images

        feats = encode_images(self.params, self.cfg, {
            t: jnp.asarray(v) for t, v in images.items()
        })  # [N_img, L, C]
        x = feats.reshape(1, -1, feats.shape[-1])
        _, states = _prefill(self.params, self.cfg, x, lm.init_lm_state(self.cfg.rwkv, 1))
        self._state_cache[cache_key] = states
        return states

    # -- generation ----------------------------------------------------------

    def generate(
        self,
        input_ids,
        images: Optional[Dict[str, Any]] = None,
        states=None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        alpha_presence: float = 0.0,
        alpha_frequency: float = 0.0,
        stop_tokens: Tuple[int, ...] = (0, STOP_TOKEN_INDEX),
        key: Optional[Array] = None,
    ) -> GenerateResult:
        sp = SamplingParams(
            temperature=temperature if do_sample else 0.0,
            top_p=top_p,
            alpha_presence=alpha_presence,
            alpha_frequency=alpha_frequency,
        )
        if key is None:
            # vary sampling across calls (a fixed default key would make every
            # sampled generation from the same state identical)
            self._sample_counter += 1
            key = jax.random.PRNGKey(self._sample_counter)
        first_logits, states = self.prefill_ids(input_ids, images, states)
        if self.state_layout == "flat":
            from visualrwkv_tpu.ops.wkv7 import state_to_flat

            states = [st._replace(wkv=state_to_flat(st.wkv)) for st in states]
        if self.state_dtype != jnp.float32:
            states = [st._replace(wkv=st.wkv.astype(self.state_dtype)) for st in states]
        tokens, lengths, tls, tps, _ = self._decode(
            first_logits, states, key, sp=sp, max_new_tokens=max_new_tokens,
            stop_tokens=tuple(stop_tokens),
        )
        return GenerateResult(
            np.asarray(tokens), np.asarray(lengths), np.asarray(tls), np.asarray(tps)
        )

    def decode_text(self, result: GenerateResult, tokenizer, strip_stop: bool = True):
        outs = []
        for row, n in zip(result.tokens, result.lengths):
            ids = [int(t) for t in row[: int(n)]]
            if strip_stop and ids and ids[-1] in (0, STOP_TOKEN_INDEX):
                ids = ids[:-1]
            outs.append(tokenizer.decode(ids))
        return outs
