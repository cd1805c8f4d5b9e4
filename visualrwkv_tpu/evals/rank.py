"""Answer ranking evaluation (MMBench-style, reference v6.0/rank_answer.py:131-210).

Protocol: score every candidate's FIRST token probability at the prompt's last
position, take the top-k candidates, then re-rank those k by their full
sequence CE loss under the model.  The reference re-runs the whole prefix per
candidate; here the prompt is prefilled once into an RNN state and candidates
continue from replicated states — O(prompt + k * candidate) instead of
O(k * (prompt + candidate)).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visualrwkv_tpu.infer.engine import InferenceEngine
from visualrwkv_tpu.models import lm


def normalize_candidates(candidates: Sequence[str]) -> List[str]:
    """Leading space avoids tokenization boundary issues (rank_answer.py:133)."""
    return [" " + c.strip().capitalize() for c in candidates]


def rank_candidates(
    engine: InferenceEngine,
    tokenizer,
    input_ids: np.ndarray,
    images: Optional[Dict] = None,
    candidates: Sequence[str] = (),
    k: int = 5,
) -> Tuple[str, List[Tuple[str, float, float]]]:
    """Returns (best candidate, [(candidate, first_token_prob, ce_loss)] for
    the top-k)."""
    cfg = engine.cfg
    cands = normalize_candidates(candidates)
    cand_ids = [tokenizer.encode(c) for c in cands]
    max_len = max(len(c) for c in cand_ids)
    cand_mat = np.zeros((len(cand_ids), max_len), np.int32)
    for i, c in enumerate(cand_ids):
        cand_mat[i, : len(c)] = c
    first_tokens = cand_mat[:, 0]

    first_logits, states = engine.prefill_ids(input_ids, images)
    probs = np.asarray(jax.nn.softmax(first_logits[0].astype(jnp.float32)))
    first_probs = probs[first_tokens]
    k = min(k, len(cands))
    topk = np.argsort(-first_probs)[:k]

    # continue the k candidates from k replicas of the prompt state
    rep = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0) if hasattr(x, "shape") else x, states
    )
    cand_batch = jnp.asarray(cand_mat[topk])  # [k, max_len]
    x_emb = lm.embed(engine.params["rwkv"], cand_batch)
    # per-position logits continued from the prompt state (first candidate
    # token is scored from the prompt's last logits above)
    logits_seq = _stateful_logits(engine, x_emb, rep)

    results = []
    for row, ci in enumerate(topk):
        ids = cand_ids[ci]
        n = len(ids)
        # CE: position j predicted by prompt-last (j=0) or candidate pos j-1
        lp_first = float(np.log(max(first_probs[ci], 1e-30)))
        ce = -lp_first
        lg = np.asarray(logits_seq[row], np.float32)  # [max_len, V]
        for j in range(1, n):
            p = jax.nn.log_softmax(jnp.asarray(lg[j - 1]))[ids[j]]
            ce += -float(p)
        ce /= n
        results.append((candidates[ci], float(first_probs[ci]), ce))

    best = min(results, key=lambda r: r[2])[0]
    return best, results


def _stateful_logits(engine: InferenceEngine, x_emb, states):
    """Per-position logits of embeddings continued from states: [B, T, V]."""
    rcfg = engine.cfg.rwkv

    @jax.jit
    def run(params, x_emb, states):
        xs = jnp.moveaxis(x_emb, 1, 0)

        def body(st, x):
            logits, st = lm.lm_decode_step_embed(params["rwkv"], rcfg, x, st)
            return st, logits

        _, logits = jax.lax.scan(body, states, xs)
        return jnp.moveaxis(logits, 0, 1)

    return run(engine.params, x_emb, states)
