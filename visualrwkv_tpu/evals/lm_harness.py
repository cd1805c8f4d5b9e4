"""Text-LM evaluation: loglikelihood API + perplexity CLI.

The reference adapts the text LM to lm-eval-harness (eval/run_lm_eval.py).
``lm_eval`` is not part of the baked image, so this module provides:

- :class:`RWKVLoglikelihood` — the loglikelihood/greedy API surface that an
  lm-eval-harness adapter needs (and a thin ``make_lm_eval_adapter`` that
  registers it when lm_eval IS importable);
- a perplexity CLI over a text file, as the dependency-free regression signal.
"""

from __future__ import annotations

import argparse
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import lm


class RWKVLoglikelihood:
    def __init__(self, params, cfg: RWKVConfig, tokenizer):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self._forward = jax.jit(
            lambda p, ids: lm.lm_forward_tokens(p, cfg, ids)[0]
        )

    def loglikelihood_tokens(self, context: List[int], continuation: List[int]) -> Tuple[float, bool]:
        """(sum log p(continuation | context), is_greedy)."""
        ids = jnp.asarray([context + continuation], jnp.int32)
        logits = np.asarray(self._forward(self.params, ids)[0], np.float32)
        total = 0.0
        greedy = True
        for j, tok in enumerate(continuation):
            pos = len(context) + j - 1
            logp = jax.nn.log_softmax(jnp.asarray(logits[pos]))
            total += float(logp[tok])
            greedy &= int(np.argmax(logits[pos])) == tok
        return total, greedy

    def loglikelihood(self, context: str, continuation: str) -> Tuple[float, bool]:
        ctx = self.tok.encode(context) if context else [0]
        cont = self.tok.encode(continuation)
        return self.loglikelihood_tokens(ctx, cont)


def make_lm_eval_adapter(params, cfg, tokenizer):
    """Returns an lm-eval-harness LM instance when lm_eval is importable."""
    try:
        from lm_eval.api.model import LM
    except ImportError as e:  # pragma: no cover - dependency not baked
        raise ImportError("lm_eval is not installed in this image") from e

    scorer = RWKVLoglikelihood(params, cfg, tokenizer)

    class VisualRWKVEvalLM(LM):
        def loglikelihood(self, requests):
            return [scorer.loglikelihood(r.args[0], r.args[1]) for r in requests]

        def loglikelihood_rolling(self, requests):
            out = []
            for r in requests:
                toks = tokenizer.encode(r.args[0])
                ll, _ = scorer.loglikelihood_tokens([0], toks)
                out.append((ll,))
            return out

        def generate_until(self, requests):  # greedy continuation
            from visualrwkv_tpu.infer.engine import InferenceEngine
            raise NotImplementedError("use visualrwkv_tpu.evals.runner for generation tasks")

    return VisualRWKVEvalLM()


def perplexity(params, cfg: RWKVConfig, tokenizer, text: str, stride: int = 1024) -> float:
    ids = [0] + tokenizer.encode(text)
    fwd = jax.jit(lambda p, t: lm.lm_forward_tokens(p, cfg, t)[0])
    nll, count = 0.0, 0
    for start in range(0, len(ids) - 1, stride):
        chunk = ids[start : start + stride + 1]
        if len(chunk) < 2:
            break
        logits = fwd(params, jnp.asarray([chunk[:-1]], jnp.int32))[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.asarray(chunk[1:])
        nll -= float(jnp.take_along_axis(logp, tgt[:, None], axis=-1).sum())
        count += len(chunk) - 1
    return math.exp(nll / max(count, 1))


def main(argv=None):
    p = argparse.ArgumentParser("visualrwkv_tpu.evals.lm_harness")
    p.add_argument("--model_path", default="", type=str)
    p.add_argument("--text_file", required=True, type=str)
    p.add_argument("--n_layer", default=12, type=int)
    p.add_argument("--n_embd", default=768, type=int)
    args = p.parse_args(argv)

    from visualrwkv_tpu.data.tokenizer import get_tokenizer

    cfg = RWKVConfig(n_layer=args.n_layer, n_embd=args.n_embd)
    params = lm.init_lm_params(jax.random.PRNGKey(0), cfg)
    if args.model_path:
        from visualrwkv_tpu.convert.pth_import import import_rwkv_state_dict, load_pth

        params = import_rwkv_state_dict(load_pth(args.model_path))
    text = open(args.text_file).read()
    ppl = perplexity(params, cfg, get_tokenizer(), text)
    print({"perplexity": round(ppl, 3), "chars": len(text)})


if __name__ == "__main__":
    main()
