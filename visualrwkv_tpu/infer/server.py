"""Continuous-batching serving loop (beyond the reference's demo serving).

The reference serves one request at a time from a cached state
(app/app_gpu.py); production TPU serving wants the chip's batch dimension
full at all times. This server keeps a fixed-shape decode batch of
``max_batch`` slots resident on device — fixed shapes mean ONE compiled step
executable — and runs slot-level continuous batching around it:

  * requests prefill individually (prefill cost is per-request anyway) and
    their RNN states are inserted into a free slot of the batched state;
  * one jitted step advances every active slot one token;
  * slots that emit a stop token (or hit their token budget) retire
    immediately and are refilled from the queue — no head-of-line blocking
    on the longest generation in a batch, unlike static batched decode.

An RNN makes this cheap: a slot's whole sequence context is O(1) state
([H, 64, 64] per layer), so admission is a state scatter, not a KV-cache
re-layout. Greedy outputs are bit-identical to ``InferenceEngine.generate``
per request (per-row recurrences are independent; regression-tested).

Sampling configuration (temperature/top-p/penalties) is per-SERVER, not
per-request: the jitted step specializes on it (the sampler branches on
temperature at trace time), and one executable is the point.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visualrwkv_tpu.data.conversation import STOP_TOKEN_INDEX
from visualrwkv_tpu.infer.sampling import (
    SamplingParams,
    apply_penalties,
    sample_logits,
    update_occurrence,
)
from visualrwkv_tpu.models import lm


@dataclass
class _Request:
    request_id: int
    input_ids: np.ndarray
    images: Optional[Dict[str, Any]]
    max_new_tokens: int
    tokens: List[int] = field(default_factory=list)


class BatchedServer:
    """Slot-based continuous batching around an :class:`InferenceEngine`.

    Usage::

        server = BatchedServer(engine, max_batch=8)
        rid = server.submit(ids, max_new_tokens=64)
        results = server.run()          # drain everything
        text = tokenizer.decode(results[rid])
    """

    def __init__(self, engine, max_batch: int = 8,
                 sp: SamplingParams = SamplingParams(temperature=0.0),
                 stop_tokens: Tuple[int, ...] = (0, STOP_TOKEN_INDEX),
                 key=None):
        self.engine = engine
        self.cfg = engine.cfg
        self.max_batch = max_batch
        self.sp = sp
        self.stop_tokens = tuple(stop_tokens)
        self._queue: deque = deque()
        self._slots: List[Optional[_Request]] = [None] * max_batch
        self._results: Dict[int, List[int]] = {}
        self._next_id = 0
        self._key = key if key is not None else jax.random.PRNGKey(0)

        B = max_batch
        rcfg = self.cfg.rwkv
        V = rcfg.vocab_size
        self._states = self._to_carry(lm.init_lm_state(rcfg, B))
        self._logits = jnp.zeros((B, V), jnp.float32)
        self._occurrence = jnp.zeros((B, V), jnp.float32)
        # inactive slots decode garbage into a masked lane; active flags are
        # host-side (admission control is host logic, the step is pure device)
        self._active = np.zeros((B,), bool)

        stop = jnp.asarray(self.stop_tokens, jnp.int32)

        def step(params, logits, states, occurrence, step_key):
            pen = apply_penalties(logits, occurrence, sp)
            token = sample_logits(step_key, pen, sp)
            occurrence = update_occurrence(occurrence, token, sp)
            stopped = jnp.any(token[:, None] == stop[None, :], axis=-1)
            next_logits, new_states = lm.lm_decode_step(
                params["rwkv"], rcfg, token, states
            )
            return token, stopped, next_logits.astype(jnp.float32), new_states, occurrence

        self._step = jax.jit(step)

        def insert(states, logits, occurrence, new_state, new_logits, slot):
            states = jax.tree_util.tree_map(
                lambda s, n: jax.lax.dynamic_update_index_in_dim(
                    s, n[0].astype(s.dtype), slot, 0
                ),
                states, new_state,
            )
            logits = jax.lax.dynamic_update_index_in_dim(
                logits, new_logits[0].astype(jnp.float32), slot, 0
            )
            occurrence = jax.lax.dynamic_update_index_in_dim(
                occurrence, jnp.zeros_like(occurrence[0]), slot, 0
            )
            return states, logits, occurrence

        self._insert = jax.jit(insert)

    def _to_carry(self, states):
        """Apply the engine's serving state config (bf16 carry / flat layout)
        to a freshly built or prefilled state list — the engine only does
        this inside its own generate(), so the server mirrors it here."""
        if self.engine.state_layout == "flat":
            from visualrwkv_tpu.ops.wkv7 import state_to_flat

            states = [s._replace(wkv=state_to_flat(s.wkv)) for s in states]
        if self.engine.state_dtype != jnp.float32:
            states = [
                s._replace(wkv=s.wkv.astype(self.engine.state_dtype))
                for s in states
            ]
        return states

    # -- client API ----------------------------------------------------------

    def submit(self, input_ids, images: Optional[Any] = None,
               max_new_tokens: int = 128) -> int:
        """Queue one request. ``images`` may be a per-tower dict or a
        ZERO-ARG CALLABLE returning one (lazy loading: large request files
        should not pin every decoded image in host memory — the loader runs
        at slot admission, bounding live images to ~max_batch)."""
        ids = np.asarray(input_ids)
        if ids.ndim == 2 and ids.shape[0] != 1:
            raise ValueError(
                f"submit() takes ONE request (got batch shape {ids.shape}); "
                "call it once per request — batching is the server's job"
            )
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Request(
            request_id=rid, input_ids=ids.reshape(1, -1),
            images=images, max_new_tokens=max_new_tokens,
        ))
        return rid

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(r is not None for r in self._slots)

    # -- scheduling ----------------------------------------------------------

    def _admit(self) -> None:
        """Prefill queued requests into free slots (state scatter)."""
        for slot in range(self.max_batch):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.popleft()
            images = req.images() if callable(req.images) else req.images
            first_logits, states = self.engine.prefill_ids(
                req.input_ids, images
            )
            states = self._to_carry(states)
            self._states, self._logits, self._occurrence = self._insert(
                self._states, self._logits, self._occurrence,
                states, first_logits, jnp.asarray(slot),
            )
            self._slots[slot] = req
            self._active[slot] = True

    def step(self) -> None:
        """Advance every active slot one token; retire finished slots."""
        self._admit()
        if not self._active.any():
            return
        self._key, step_key = jax.random.split(self._key)
        token, stopped, self._logits, self._states, self._occurrence = self._step(
            self.engine.params, self._logits, self._states,
            self._occurrence, step_key,
        )
        token = np.asarray(token)
        stopped = np.asarray(stopped)
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            req.tokens.append(int(token[slot]))
            if stopped[slot] or len(req.tokens) >= req.max_new_tokens:
                self._results[req.request_id] = req.tokens
                self._slots[slot] = None
                self._active[slot] = False

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue + all active slots; returns {request_id: tokens}."""
        while self.pending:
            self.step()
        out, self._results = self._results, {}
        return out
