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


# ---------------------------------------------------------------------------
# CLI (reference v6.0/rank_answer.py __main__): candidates are a shared json
# list; each question is prefilled once and the top-k candidates re-scored by
# per-candidate CE from replicated states.
# ---------------------------------------------------------------------------


def main(argv=None):
    import json
    import logging
    from pathlib import Path

    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.evals.cli import build_argparser, build_engine
    from visualrwkv_tpu.evals.loaders import get_chunk, get_question_id, load_questions
    from visualrwkv_tpu.evals.runner import (
        build_image_dict,
        bucket_pad_ids,
        prepare_question,
    )

    logging.basicConfig(level=logging.INFO)
    p = build_argparser()
    p.add_argument("--candidates_file", required=True,
                   help="json list of candidate answers (shared across questions)")
    p.add_argument("--topk", default=5, type=int)
    args = p.parse_args(argv)

    with open(args.candidates_file) as f:
        candidates = json.load(f)
    engine, cfg = build_engine(args)
    tok = get_tokenizer()
    questions = get_chunk(load_questions(args.question_file), args.num_chunks, args.chunk_idx)
    sizes = {
        t: (cfg.vision.sam_image_size if t == "sam" else cfg.vision.image_size)
        for t in cfg.vision.towers
    }
    out_path = Path(args.output_file)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        for line in questions:
            item = prepare_question(line, tok, cfg, 1, args.dataset_name)
            ids = bucket_pad_ids(item["input_ids"], args.length_bucket)[None, :]
            images = build_image_dict(line, Path(args.image_folder), sizes, args.image_strategy)
            best, ranked = rank_candidates(
                engine, tok, ids, images=images, candidates=candidates, k=args.topk
            )
            f.write(json.dumps({
                "question_id": get_question_id(line),
                "prompt": item["input_text"],
                "text": best,
                "candidates": [
                    {"text": c, "first_prob": p_, "ce": ce} for c, p_, ce in ranked
                ],
                "model_id": "visualrwkv_tpu",
            }, ensure_ascii=False) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
