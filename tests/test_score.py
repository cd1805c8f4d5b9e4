"""Golden-file locks for the benchmark scorers and the unified score CLI.

Each test feeds a synthetic fixture with a HAND-COMPUTED expected score so
protocol regressions (normalization rules, soft-score math, join logic) are
caught exactly, mirroring the reference's scorer semantics
(eval/m4c_evaluator.py, eval/eval_pope.py, eval/eval_science_qa.py, the MME
calculation tool).
"""

import json

import pytest

from visualrwkv_tpu.evals.metrics.m4c import (
    evalai_process,
    eval_textvqa_file,
    prompt_to_question,
    stvqa_accuracy,
    stvqa_anls,
    textvqa_soft_accuracy,
    _edit_distance,
)
from visualrwkv_tpu.evals import score


# -- EvalAI answer processor -------------------------------------------------


@pytest.mark.parametrize("raw,expected", [
    ("The cat's bowl?", "cat 's bowl"),  # possessive split + article + '?'
    ("Two, please.", "2 please"),  # number map + comma + period strip
    ("dont know", "don't know"),  # contraction (second pass)
    ("a an the", ""),  # articles only
    ("3,000", "3000"),  # comma inside digits
    ("yes.", "yes"),
    ("  Mixed CASE  ", "mixed case"),
])
def test_evalai_process(raw, expected):
    assert evalai_process(raw) == expected


def test_evalai_differs_from_vqa_normalizer():
    # the possessive split is the EvalAI-only step that moves TextVQA scores
    from visualrwkv_tpu.evals.metrics.vqa import normalize_answer

    assert evalai_process("cat's") == "cat 's"
    assert normalize_answer("cat's") == "cat's"


# -- TextVQA soft accuracy ---------------------------------------------------


def test_textvqa_soft_accuracy_golden():
    # 10 humans: 4 say "yes", 6 say "no".
    # score("yes") = mean over 10 leave-one-out of min(1, matches/3):
    #   leaving out a "yes": 3 matches -> 1.0 (x4); leaving out a "no":
    #   4 matches -> 1.0 (x6) => 1.0;   score("no"): leave-yes 6/3->1 (x4),
    #   leave-no 5/3->1 (x6) => 1.0; an unseen answer scores 0.
    gt = ["yes"] * 4 + ["no"] * 6
    assert textvqa_soft_accuracy([{"pred_answer": "yes", "gt_answers": gt}]) == 1.0
    assert textvqa_soft_accuracy([{"pred_answer": "maybe", "gt_answers": gt}]) == 0.0
    # 1 of 10 says "cat": leave-out-the-cat gives 0 matches (0.0), the other
    # nine leave-outs each see 1 match -> 1/3; mean = 9 * (1/3) / 10 = 0.3
    gt2 = ["cat"] + ["dog"] * 9
    assert textvqa_soft_accuracy(
        [{"pred_answer": "cat", "gt_answers": gt2}]
    ) == pytest.approx(0.3)


def test_textvqa_requires_ten_answers():
    with pytest.raises(AssertionError):
        textvqa_soft_accuracy([{"pred_answer": "x", "gt_answers": ["a"] * 3}])


def test_stvqa_accuracy_and_anls():
    preds = [
        {"pred_answer": "The Cat", "gt_answers": ["cat", "dog"]},
        {"pred_answer": "bird", "gt_answers": ["cat", "dog"]},
    ]
    assert stvqa_accuracy(preds) == 0.5
    assert _edit_distance("kitten", "sitting") == 3
    # anls("hello", "hallo") = 1 - 1/5 = 0.8 ; anls("hello","world") = 1-4/5
    # = 0.2 < 0.5 -> 0
    anls_preds = [
        {"pred_answer": "hello", "gt_answers": ["hallo"]},
        {"pred_answer": "hello", "gt_answers": ["world"]},
    ]
    assert stvqa_anls(anls_preds) == pytest.approx((0.8 + 0.0) / 2)


def test_prompt_to_question_formats():
    assert prompt_to_question(
        "OCR tokens: abc\nQuestion: What is shown? Short answer:"
    ) == "what is shown?"
    assert prompt_to_question(
        "User: <image>\nWhat color?\n\nAssistant:"
    ) == "what color?"
    assert prompt_to_question(
        "User: What size?\n<image>\n\nAssistant:"
    ) == "what size?"
    assert prompt_to_question(
        "User: Context here\n<image>\nWhat shape?\n\nAssistant:"
    ) == "what shape?"
    with pytest.raises(ValueError):
        prompt_to_question("???")


# -- file-level scoring through the CLI --------------------------------------


def _write_jsonl(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_eval_textvqa_file(tmp_path):
    ann = {"data": [
        {"image_id": "q1", "question": "What color?",
         "answers": ["red"] * 10},
        {"image_id": "q2", "question": "What animal?",
         "answers": ["cat"] * 5 + ["dog"] * 5},
    ]}
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    _write_jsonl(tmp_path / "res.jsonl", [
        {"question_id": "q1", "prompt": "User: <image>\nWhat color?\n\nAssistant:",
         "text": "Red."},
        {"question_id": "q2", "prompt": "User: <image>\nWhat animal?\n\nAssistant:",
         "text": "bird"},
    ])
    m = eval_textvqa_file(str(tmp_path / "ann.json"), str(tmp_path / "res.jsonl"))
    assert m["n"] == 2
    assert m["accuracy"] == pytest.approx(50.0)  # q1 = 1.0, q2 = 0.0


def test_score_cli_pope(tmp_path, capsys):
    _write_jsonl(tmp_path / "q.jsonl", [
        {"question_id": i, "category": "popular", "text": "is there a cat?"}
        for i in range(4)
    ])
    _write_jsonl(tmp_path / "r.jsonl", [
        {"question_id": 0, "text": "Yes, there is."},
        {"question_id": 1, "text": "No."},
        {"question_id": 2, "text": "Yes."},
        {"question_id": 3, "text": "Yes it is."},
    ])
    ann_dir = tmp_path / "coco"
    ann_dir.mkdir()
    _write_jsonl(ann_dir / "coco_pope_popular.json", [
        {"label": "yes"}, {"label": "no"}, {"label": "no"}, {"label": "yes"},
    ])
    score.main([
        "pope", "--result-file", str(tmp_path / "r.jsonl"),
        "--question-file", str(tmp_path / "q.jsonl"),
        "--annotation-dir", str(ann_dir),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    m = json.loads(out[-1])
    # TP=2 (q0,q3), TN=1 (q1), FP=1 (q2), FN=0 -> P=2/3 R=1 F1=0.8
    assert m["per_category"]["popular"]["f1"] == pytest.approx(80.0)
    assert m["per_category"]["popular"]["accuracy"] == pytest.approx(75.0)


def test_score_cli_scienceqa_base_dir(tmp_path, capsys):
    base = tmp_path
    (base / "pid_splits.json").write_text(json.dumps({"test": ["p1", "p2"]}))
    (base / "problems.json").write_text(json.dumps({
        "p1": {"answer": 0, "choices": ["cat", "dog"]},
        "p2": {"answer": 1, "choices": ["red", "blue"]},
    }))
    _write_jsonl(base / "r.jsonl", [
        {"question_id": "p1", "text": "A"},
        {"question_id": "p2", "text": "A"},
    ])
    score.main([
        "scienceqa", "--result-file", str(base / "r.jsonl"),
        "--base-dir", str(base), "--split", "test",
    ])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["accuracy"] == pytest.approx(50.0) and m["n"] == 2


def test_score_cli_mme(tmp_path, capsys):
    # one category, two images x two questions; img1 both right (counts for
    # acc+), img2 one right
    _write_jsonl(tmp_path / "q.jsonl", [
        {"question_id": 0, "category": "color", "image": "i1.jpg", "label": "yes"},
        {"question_id": 1, "category": "color", "image": "i1.jpg", "label": "no"},
        {"question_id": 2, "category": "color", "image": "i2.jpg", "label": "yes"},
        {"question_id": 3, "category": "color", "image": "i2.jpg", "label": "no"},
    ])
    _write_jsonl(tmp_path / "r.jsonl", [
        {"question_id": 0, "text": "Yes"},
        {"question_id": 1, "text": "No"},
        {"question_id": 2, "text": "Yes"},
        {"question_id": 3, "text": "Yes"},
    ])
    score.main([
        "mme", "--result-file", str(tmp_path / "r.jsonl"),
        "--question-file", str(tmp_path / "q.jsonl"),
    ])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["color"]["acc"] == pytest.approx(75.0)
    assert m["color"]["acc_plus"] == pytest.approx(50.0)
    assert m["total"]["score"] == pytest.approx(125.0)


def test_score_cli_anls(tmp_path, capsys):
    (tmp_path / "ann.json").write_text(json.dumps({"data": [
        {"questionId": 7, "answers": ["hallo"]},
    ]}))
    _write_jsonl(tmp_path / "r.jsonl", [{"question_id": 7, "text": "hello"}])
    score.main([
        "anls", "--result-file", str(tmp_path / "r.jsonl"),
        "--annotation-file", str(tmp_path / "ann.json"),
    ])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["anls"] == pytest.approx(80.0)


def test_score_cli_exact_with_join(tmp_path, capsys):
    _write_jsonl(tmp_path / "q.jsonl", [
        {"question_id": 1, "answer": "cat"},
        {"question_id": 2, "answer": "dog"},
    ])
    _write_jsonl(tmp_path / "r.jsonl", [
        {"question_id": 1, "text": "Cat"},
        {"question_id": 2, "text": "bird"},
    ])
    score.main([
        "exact", "--result-file", str(tmp_path / "r.jsonl"),
        "--question-file", str(tmp_path / "q.jsonl"),
    ])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["accuracy"] == pytest.approx(50.0)


def test_score_cli_gqa_detailed(tmp_path, capsys):
    (tmp_path / "gqa.json").write_text(json.dumps({
        "g1": {"answer": "yes", "types": {"structural": "verify"},
               "entailed": ["g2"]},
        "g2": {"answer": "cat", "types": {"structural": "query"},
               "entailed": []},
    }))
    _write_jsonl(tmp_path / "r.jsonl", [
        {"question_id": "g1", "text": "yes"},
        {"question_id": "g2", "text": "cat"},
    ])
    score.main([
        "gqa", "--result-file", str(tmp_path / "r.jsonl"),
        "--gqa-questions-json", str(tmp_path / "gqa.json"),
    ])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["accuracy"] == pytest.approx(100.0)


def test_videomme_scorer(tmp_path, capsys):
    """Video-MME results-format scorer (eval_your_results.py analog):
    answer-letter extraction incl. prefix stripping, answered-only
    denominator, per-duration/category/task breakdowns."""
    from visualrwkv_tpu.evals.metrics.videomme import (
        evaluate_videomme,
        extract_answer_letter,
    )

    assert extract_answer_letter("The best answer is C.") == "C"
    assert extract_answer_letter("Answer: (B) the dog") == "B"
    assert extract_answer_letter("word " * 11) == ""  # long, letterless
    assert extract_answer_letter("I cannot tell from this video "
                                 "because it is too blurry to see") == ""

    results = [
        {"duration": "short", "domain": "Knowledge", "sub_category": "Law",
         "questions": [
             {"task_type": "OCR Problems", "answer": "A", "response": "A."},
             {"task_type": "OCR Problems", "answer": "B", "response": "The answer is C"},
             {"task_type": "Counting Problem", "answer": "D",
              "response": "no idea " * 12},  # unanswered -> excluded
         ]},
        {"duration": "long", "domain": "Life Record", "sub_category": "Travel",
         "questions": [
             {"task_type": "Action Reasoning", "answer": "B", "response": "B"},
         ]},
    ]
    m = evaluate_videomme(results)
    assert m["by_duration"]["short"]["answered"] == 2
    assert m["by_duration"]["short"]["overall"] == 50.0
    assert m["by_duration"]["long"]["overall"] == 100.0
    assert m["overall"] == pytest.approx(100 * 2 / 3)
    assert m["by_duration"]["short"]["task_types"]["OCR Problems"] == 50.0

    # CLI path
    import json as _json

    from visualrwkv_tpu.evals.score import main

    f = tmp_path / "res.json"
    f.write_text(_json.dumps(results))
    main(["videomme", "--result-file", str(f)])
    out = capsys.readouterr().out
    # regression: the default run must score ALL durations (a stray --split
    # default once made this 0.0% with zero answered)
    assert "Overall: 66.7%" in out, out
