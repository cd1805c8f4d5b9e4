"""Tests: answer ranking, converters, data tools, lm loglikelihood/perplexity."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
from visualrwkv_tpu.data.tools import (
    cauldron_to_llava,
    check_duplicates,
    merge_and_shuffle,
    split_multiround_to_single,
    videomme_to_questions,
)
from visualrwkv_tpu.evals.converters import (
    convert_gqa_for_eval,
    convert_mmvet_for_eval,
    convert_vqav2_for_submission,
)
from visualrwkv_tpu.vision.vit import ViTConfig


@pytest.fixture(scope="module")
def engine_setup():
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params

    tiny_vit = ViTConfig(img_size=16, patch_size=8, width=32, depth=1, heads=2,
                         mlp_dim=64, use_cls=False, num_reg=0, layerscale=False)
    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
                        compute_dtype="float32", ctx_len=256),
        vision=VisionConfig(towers=("dino",), image_size=16, dino_dim=32,
                            tower_config_overrides={"dino": tiny_vit}),
        proj_type="linear", num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    return cfg, params, InferenceEngine(params, cfg)


def test_rank_candidates(engine_setup):
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.evals.rank import rank_candidates

    cfg, params, engine = engine_setup
    tok = get_tokenizer()
    ids = np.asarray([tok.encode("User: which animal?\n\nAssistant:")])
    best, results = rank_candidates(
        engine, tok, ids, candidates=["cat", "dog", "bird", "fish"], k=3
    )
    assert best in ("cat", "dog", "bird", "fish")
    assert len(results) == 3
    for cand, p, ce in results:
        assert 0 <= p <= 1 and np.isfinite(ce)
    # ranking is deterministic
    best2, _ = rank_candidates(engine, tok, ids, candidates=["cat", "dog", "bird", "fish"], k=3)
    assert best2 == best


def test_loglikelihood_and_perplexity(engine_setup):
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.evals.lm_harness import RWKVLoglikelihood, perplexity

    cfg, params, _ = engine_setup
    tok = get_tokenizer()
    scorer = RWKVLoglikelihood(params["rwkv"], cfg.rwkv, tok)
    ll, greedy = scorer.loglikelihood("The capital of France is", " Paris")
    assert np.isfinite(ll) and ll < 0
    ppl = perplexity(params["rwkv"], cfg.rwkv, tok, "hello world, this is a test.", stride=8)
    assert np.isfinite(ppl) and ppl > 1


def test_converters(tmp_path):
    answers = [
        {"question_id": 1, "text": "yes"},
        {"question_id": 2, "text": "two dogs"},
    ]
    src = tmp_path / "answers.jsonl"
    src.write_text("\n".join(json.dumps(a) for a in answers))
    out = tmp_path / "vqav2.json"
    convert_vqav2_for_submission(src, out)
    assert json.load(open(out)) == [
        {"question_id": 1, "answer": "yes"},
        {"question_id": 2, "answer": "two dogs"},
    ]
    out2 = tmp_path / "gqa.json"
    convert_gqa_for_eval(src, out2)
    assert json.load(open(out2))[0] == {"questionId": "1", "prediction": "yes"}
    out3 = tmp_path / "mmvet.json"
    convert_mmvet_for_eval(src, out3)
    assert json.load(open(out3)) == {"1": "yes", "2": "two dogs"}


def test_data_tools(tmp_path):
    recs = [
        {"id": "a", "image": "x.jpg", "conversations": [
            {"from": "human", "value": "<image>\nq1"}, {"from": "gpt", "value": "a1"},
            {"from": "human", "value": "q2"}, {"from": "gpt", "value": "a2"}]},
        {"id": "a", "conversations": []},
    ]
    f1 = tmp_path / "a.json"
    f1.write_text(json.dumps(recs))
    dups = check_duplicates(str(f1))
    assert dups == {"a": 2}

    singles = split_multiround_to_single([recs[0]])
    assert len(singles) == 2
    assert "image" in singles[0] and "image" not in singles[1]
    assert "<image>" not in singles[1]["conversations"][0]["value"]

    n = merge_and_shuffle([str(f1), str(f1)], str(tmp_path / "m.json"))
    assert n == 4

    llava = cauldron_to_llava([
        {"id": "c1", "image": "i.jpg", "texts": [{"user": "what?", "assistant": "that"}]}
    ])
    assert llava[0]["conversations"][0]["value"].startswith("<image>")

    qs = videomme_to_questions.__wrapped__ if hasattr(videomme_to_questions, "__wrapped__") else None
    vm = tmp_path / "vm.json"
    vm.write_text(json.dumps([
        {"video_id": "v1", "questions": [
            {"question_id": "q1", "question": "What?", "options": ["A. x", "B. y"],
             "answer": "A"}]}
    ]))
    out = videomme_to_questions(str(vm), num_frames=2)
    assert out[0]["video"] == "v1"
    assert out[0]["text"].count("<image>") == 2
