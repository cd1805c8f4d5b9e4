"""Tests: answer ranking, converters, data tools, lm loglikelihood/perplexity."""

import json
from pathlib import Path

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


def test_correct_conversation_format():
    from visualrwkv_tpu.data.tools import correct_conversation_format

    recs = [
        # odd trailing turn dropped; gpt <image> stripped; tag count matches
        {"id": "ok", "image": "d/x.jpg", "conversations": [
            {"from": "user", "value": "<image>\nq"},
            {"from": "bot", "value": "<image> a"},
            {"from": "human", "value": "dangling"}]},
        # zero tags for 2 images -> both prepended
        {"id": "pad", "image": ["d/x.jpg", "d/y.jpg"], "conversations": [
            {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]},
        # 2 tags for 1 image -> unfixable, dropped
        {"id": "bad", "image": "d/x.jpg", "conversations": [
            {"from": "human", "value": "<image><image>q"},
            {"from": "gpt", "value": "a"}]},
        {"id": "noimg", "conversations": [{"from": "human", "value": "q"}]},
    ]
    out = correct_conversation_format(recs)
    ids = [r.get("id") for r in out]
    assert ids == ["ok", "pad", "noimg"]
    ok = out[0]["conversations"]
    assert [t["from"] for t in ok] == ["human", "gpt"]
    assert ok[1]["value"] == "a"
    assert out[1]["conversations"][0]["value"].count("<image>") == 2


def test_extract_and_image_dir_format():
    from visualrwkv_tpu.data.tools import (
        extract_by_image_set,
        image_set_distribution,
        to_image_dir_format,
    )

    recs = [
        {"id": 1, "image": "coco/a.jpg", "conversations": [
            {"from": "human", "value": "<image>\nq"}, {"from": "gpt", "value": "a"}]},
        {"id": 2, "image": "gqa/sub/b.jpg", "conversations": [
            {"from": "human", "value": "<image>\nq"}, {"from": "gpt", "value": "a"}]},
        {"id": 3, "conversations": []},
    ]
    dist = image_set_distribution(recs)
    assert dist == {"coco": 1, "gqa": 1}
    assert [r["id"] for r in extract_by_image_set(recs, ["gqa"])] == [2]

    conv = to_image_dir_format(recs)
    assert conv[0]["image_dir"] == "coco"
    assert conv[0]["conversations"][0]["image"] == ["a.jpg"]
    assert conv[1]["conversations"][0]["image"] == ["sub/b.jpg"]
    assert "image_dir" not in conv[2]


def test_reformat_split_and_suffix_carry():
    from visualrwkv_tpu.data.tools import (
        clean_missing_responses,
        split_long_conversations,
    )

    suffix = "Answer the question using a single word or phrase."
    convs = []
    for i in range(5):
        v = f"q{i}" + (f"\n{suffix}" if i == 0 else "")
        if i == 0:
            v = "<image>\n" + v
        convs.append({"from": "human", "value": v})
        convs.append({"from": "gpt", "value": f"a{i}" if i != 3 else ""})
    recs = clean_missing_responses([{"id": "r", "image": "x.jpg",
                                     "conversations": convs}])
    assert len(recs[0]["conversations"]) == 8  # empty-gpt pair dropped
    out = split_long_conversations(recs, max_rounds=2)
    assert len(out) == 2
    # every split starts with an <image> tag; later splits re-gain the suffix
    for rec in out:
        assert rec["conversations"][0]["value"].count("<image>") == 1
    assert suffix in out[1]["conversations"][0]["value"]


def test_merge_to_multi_round_dedupes():
    from visualrwkv_tpu.data.tools import merge_to_multi_round

    single = {"id": "s0", "image": "x.jpg", "conversations": [
        {"from": "human", "value": "<image>\nq0"}, {"from": "gpt", "value": "a0"}]}
    other = {"id": "s1", "image": "x.jpg", "conversations": [
        {"from": "human", "value": "<image>\nq1"}, {"from": "gpt", "value": "a1"}]}
    out = merge_to_multi_round([single, dict(single), other], max_rounds=10)
    assert len(out) == 1
    convs = out[0]["conversations"]
    assert len(convs) == 4  # exact duplicate removed
    assert convs[0]["value"].count("<image>") == 1
    assert "<image>" not in convs[2]["value"]


def test_check_image_folder(tmp_path):
    from PIL import Image

    from visualrwkv_tpu.data.tools import check_image_folder, dataset_stats

    root = tmp_path / "imgs"
    (root / "coco").mkdir(parents=True)
    Image.new("RGB", (8, 8)).save(root / "coco" / "a.jpg")
    Image.new("RGB", (8, 8)).save(root / "coco" / "unused.jpg")
    recs = [
        {"id": 1, "image_dir": "coco", "conversations": [
            {"from": "human", "value": "<image>\nq", "image": ["a.jpg"]},
            {"from": "gpt", "value": "a"}]},
        {"id": 2, "image_dir": "coco", "conversations": [
            {"from": "human", "value": "<image>\nq", "image": ["missing.jpg"]},
            {"from": "gpt", "value": "a"}]},
    ]
    f = tmp_path / "d.json"
    f.write_text(json.dumps(recs))
    report = check_image_folder(str(f), str(root), try_open=True)
    assert len(report["missing"]) == 1
    assert report["unused_by_set"] == {"coco": 1}
    assert [r["id"] for r in report["valid_records"]] == [1]

    f2 = tmp_path / "flat.json"
    f2.write_text(json.dumps([{"id": 1, "image": "coco/a.jpg"},
                              {"id": 2, "image": "coco/a.jpg"}]))
    st = dataset_stats([str(f2)])
    assert st[0]["total"] == 2 and st[0]["unique"] == 1


def test_tools_cli(tmp_path, capsys):
    from visualrwkv_tpu.data.tools import _cli

    recs = [{"id": "a", "image": "coco/x.jpg", "conversations": [
        {"from": "human", "value": "<image>\nq"}, {"from": "gpt", "value": "a"}]}]
    f = tmp_path / "d.json"
    f.write_text(json.dumps(recs))
    out = tmp_path / "c.json"
    _cli(["correct-format", str(f), str(out)])
    assert json.load(open(out))[0]["id"] == "a"
    _cli(["reformat", str(f)])
    assert (tmp_path / "d_20rounds.json").exists()
    _cli(["stats", str(f)])
    assert "total" in capsys.readouterr().out


def test_merge_and_split_handle_imageless_records():
    """Regressions: to-multi-round must pass text-only records through (was
    KeyError) and tolerate list-valued images (was unhashable); reformat's
    split must not add <image> tags to imageless conversations."""
    from visualrwkv_tpu.data.tools import merge_to_multi_round, split_long_conversations

    img = {"id": "a", "image": ["d/x.jpg"], "conversations": [
        {"from": "human", "value": "<image>\nq"}, {"from": "gpt", "value": "a"}]}
    noimg = {"id": "t", "conversations": [
        {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]}
    out = merge_to_multi_round([img, noimg], max_rounds=10)
    assert {r["id"] for r in out} == {"a", "t"}

    long_noimg = {"id": "t2", "conversations": [
        t for i in range(4) for t in (
            {"from": "human", "value": f"q{i}"}, {"from": "gpt", "value": f"a{i}"})]}
    splits = split_long_conversations([long_noimg], max_rounds=2)
    assert len(splits) == 2
    assert all("<image>" not in s["conversations"][0]["value"] for s in splits)


def test_zip_subdirs(tmp_path):
    from visualrwkv_tpu.data.tools import zip_subdirs

    import zipfile

    (tmp_path / "src" / "coco").mkdir(parents=True)
    (tmp_path / "src" / "coco" / "a.txt").write_text("x")
    (tmp_path / "src" / "gqa").mkdir()
    (tmp_path / "src" / "gqa" / "b.txt").write_text("y")
    outs = zip_subdirs(str(tmp_path / "src"), str(tmp_path / "out"))
    assert sorted(Path(o).name for o in outs) == ["coco.zip", "gqa.zip"]
    with zipfile.ZipFile(outs[0]) as z:
        assert len(z.namelist()) == 1
