"""Eval harness tests: loaders/sharding, tiling strategies, metric scorers,
and an end-to-end tiny eval run producing the reference jsonl schema."""

import json
from pathlib import Path

import numpy as np
import pytest

from visualrwkv_tpu.data.tiling import (
    sample_video_frames,
    select_best_resolution,
    single_to_multi_images,
)
from visualrwkv_tpu.evals.loaders import get_chunk, get_input_text, load_questions
from visualrwkv_tpu.evals.metrics.simple import (
    evaluate_gqa,
    evaluate_mme,
    evaluate_pope,
    evaluate_scienceqa,
    parse_option_letter,
)
from visualrwkv_tpu.evals.metrics.vqa import normalize_answer, vqa_accuracy


def test_select_best_resolution():
    assert select_best_resolution((800, 400)) == (896, 448)
    assert select_best_resolution((400, 800)) == (448, 896)
    assert select_best_resolution((500, 500)) == (896, 896)
    assert select_best_resolution((1500, 400)) == (1344, 448)


def test_single_to_multi():
    from PIL import Image

    small = Image.new("RGB", (500, 500))
    assert len(single_to_multi_images(small)) == 1  # small ~1:1 stays single
    big = Image.new("RGB", (1200, 1100))
    assert len(single_to_multi_images(big)) == 5  # full + 2x2
    wide = Image.new("RGB", (1000, 400))
    assert len(single_to_multi_images(wide)) == 3  # full + 1x2


def test_video_sampling():
    frames = list(range(100))
    out = sample_video_frames(frames, 4)
    assert out == [0, 33, 66, 99]
    assert sample_video_frames(frames[:3], 4) == [0, 1, 2]


def test_loaders(tmp_path):
    recs = [{"question_id": i, "text": f"q{i}", "image": "x.jpg"} for i in range(10)]
    p = tmp_path / "q.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs))
    qs = load_questions(p)
    assert len(qs) == 10
    c0, c2 = get_chunk(qs, 3, 0), get_chunk(qs, 3, 2)
    assert len(c0) == 4 and len(c2) == 2
    t = get_input_text({"text": "<image>\nWhat?"}, 2)
    assert t.startswith("<image>\n<image>\n")


def test_vqa_normalize_and_accuracy():
    assert normalize_answer("The TWO dogs.") == "2 dogs"
    assert normalize_answer("isnt") == "isn't"
    gts = ["yes"] * 7 + ["no"] * 3
    assert vqa_accuracy("Yes", gts) == 1.0
    assert 0 < vqa_accuracy("no", gts) < 1.0
    assert vqa_accuracy("maybe", gts) == 0.0


def test_pope():
    recs = [
        {"text": "Yes, it is.", "label": "yes"},
        {"text": "No.", "label": "no"},
        {"text": "Yes.", "label": "no"},
        {"text": "There is not a dog.", "label": "no"},
    ]
    m = evaluate_pope(recs)
    assert m["accuracy"] == 75.0
    assert m["n"] == 4


def test_scienceqa():
    recs = [
        {"text": "B", "answer": 1, "choices": ["x", "y"], "question_id": 1},
        {"text": "The answer is C.", "answer": 2, "choices": ["a", "b", "c"], "question_id": 2},
        {"text": "blue", "answer": 0, "choices": ["blue", "red"], "question_id": 3},
        {"text": "nope", "answer": 0, "choices": ["blue", "red"], "question_id": 4},
    ]
    m = evaluate_scienceqa(recs)
    assert m["accuracy"] == 75.0
    assert m["failures"] == [4]
    assert parse_option_letter("(D)") == "D"


def test_gqa_and_mme():
    assert evaluate_gqa([{"text": "A cat", "answer": "cat"}])["accuracy"] == 100.0
    mme = evaluate_mme([
        {"category": "color", "image": "1.jpg", "text": "yes", "label": "yes"},
        {"category": "color", "image": "1.jpg", "text": "no", "label": "no"},
        {"category": "color", "image": "2.jpg", "text": "yes", "label": "no"},
        {"category": "color", "image": "2.jpg", "text": "no", "label": "no"},
    ])
    assert mme["color"]["acc"] == 75.0
    assert mme["color"]["acc_plus"] == 50.0


def test_end_to_end_eval_jsonl(tmp_path):
    """Tiny engine + 2 questions -> jsonl with the reference schema."""
    import jax
    from PIL import Image

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.evals.runner import run_eval
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.vision.vit import ViTConfig

    tiny_vit = ViTConfig(img_size=32, patch_size=8, width=32, depth=1, heads=2,
                         mlp_dim=64, use_cls=False, num_reg=0, layerscale=False)
    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
                        compute_dtype="float32", ctx_len=256),
        vision=VisionConfig(towers=("dino",), image_size=32, dino_dim=32,
                            tower_config_overrides={"dino": tiny_vit}),
        proj_type="linear", num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(params, cfg)
    tok = get_tokenizer()

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 48), (120, 30, 200)).save(img_dir / "a.jpg")
    questions = [
        {"question_id": 1, "image": "a.jpg", "text": "<image>\nWhat color?"},
        {"question_id": 2, "image": "a.jpg", "text": "<image>\nDescribe."},
    ]
    out = tmp_path / "answers.jsonl"
    recs = run_eval(engine, tok, questions, img_dir, str(out), max_new_tokens=4,
                    progress=False)
    assert len(recs) == 2
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    for rec in lines:
        assert set(rec) == {"question_id", "prompt", "text", "avg_logit",
                            "avg_prob", "model_id", "metadata"}
        float(rec["avg_logit"]); float(rec["avg_prob"])


def test_gqa_detailed():
    from visualrwkv_tpu.evals.metrics.gqa import evaluate_gqa_detailed

    questions = {
        "q1": {"answer": "yes", "types": {"structural": "verify"}, "entailed": ["q2"]},
        "q2": {"answer": "cat", "types": {"structural": "query"}, "entailed": []},
        "q3": {"answer": "no", "types": {"structural": "verify"}, "entailed": []},
    }
    preds = {"q1": "yes", "q2": "cat", "q3": "yes"}
    m = evaluate_gqa_detailed(
        preds, questions,
        valid_answers={"q2": ["cat", "dog"]},
        plausible_answers={"q2": ["cat"]},
    )
    assert m["accuracy"] == pytest.approx(100 * 2 / 3)
    assert m["binary"] == 50.0
    assert m["open"] == 100.0
    assert m["consistency"] == 100.0  # q1 correct and its entailed q2 correct
    assert m["validity"] == 100.0 and m["plausibility"] == 100.0
    assert m["acc_verify"] == 50.0


def test_vqa_breakdowns():
    from visualrwkv_tpu.evals.metrics.vqa import evaluate_vqa

    preds = {"a": "yes", "b": "3"}
    anns = {"a": ["yes"] * 10, "b": ["2"] * 10}
    m = evaluate_vqa(preds, anns, answer_types={"a": "yes/no", "b": "number"})
    assert m["overall"] == 50.0
    assert m["perAnswerType"] == {"number": 0.0, "yes/no": 100.0}


def test_bucket_pad_ids():
    from visualrwkv_tpu.data.conversation import STOP_TOKEN_INDEX
    from visualrwkv_tpu.evals.runner import bucket_pad_ids

    ids = np.arange(1, 71, dtype=np.int64)  # length 70 -> bucket 128
    out = bucket_pad_ids(ids, bucket=64)
    assert out.shape == (128,)
    assert (out[:58] == STOP_TOKEN_INDEX).all()
    assert (out[58:] == ids).all()
    same = bucket_pad_ids(np.arange(64, dtype=np.int64), bucket=64)
    assert same.shape == (64,)


@pytest.mark.slow
def test_batched_eval_matches_single(tmp_path):
    """batch_size=3 (grouped by bucketed length) must produce the same jsonl
    records as batch_size=1, in the original question order."""
    import jax
    from PIL import Image

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.evals.runner import run_eval
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.vision.vit import ViTConfig

    tiny_vit = ViTConfig(img_size=32, patch_size=8, width=32, depth=1, heads=2,
                         mlp_dim=64, use_cls=False, num_reg=0, layerscale=False)
    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
                        compute_dtype="float32", ctx_len=256),
        vision=VisionConfig(towers=("dino",), image_size=32, dino_dim=32,
                            tower_config_overrides={"dino": tiny_vit}),
        proj_type="linear", num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(params, cfg)
    tok = get_tokenizer()

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (64, 48), (120, 30, 200)).save(img_dir / "a.jpg")
    Image.new("RGB", (48, 64), (10, 230, 20)).save(img_dir / "b.jpg")
    questions = [
        {"question_id": 1, "image": "a.jpg", "text": "<image>\nWhat color?"},
        {"question_id": 2, "image": "b.jpg", "text": "<image>\nDescribe this image please."},
        {"question_id": 3, "image": "a.jpg", "text": "<image>\nIs it red?"},
        {"question_id": 4, "image": "b.jpg", "text": "<image>\nCount objects."},
    ]
    outs = {}
    for bs in (1, 3):
        out = tmp_path / f"answers_b{bs}.jsonl"
        run_eval(engine, tok, questions, img_dir, str(out), max_new_tokens=4,
                 progress=False, batch_size=bs)
        outs[bs] = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["question_id"] for r in outs[1]] == [1, 2, 3, 4]
    assert outs[1] == outs[3]


@pytest.mark.slow
def test_hfds_eval(tmp_path):
    """evaluate_hfds.py equivalent over a datasets.Dataset with in-line PIL
    images (reference evaluate_hfds.py:64-186)."""
    datasets = pytest.importorskip("datasets")
    import jax
    from PIL import Image

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.evals.hfds import run_hfds_eval
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.vision.vit import ViTConfig

    tiny_vit = ViTConfig(img_size=32, patch_size=8, width=32, depth=1, heads=2,
                         mlp_dim=64, use_cls=False, num_reg=0, layerscale=False)
    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
                        compute_dtype="float32", ctx_len=256),
        vision=VisionConfig(towers=("dino",), image_size=32, dino_dim=32,
                            tower_config_overrides={"dino": tiny_vit}),
        proj_type="linear", num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(params, cfg)

    ds = datasets.Dataset.from_dict({
        "question_id": [0, 1],
        "question": ["What color?", "Describe."],
        "image": [Image.new("RGB", (40, 40), (200, 10, 10)),
                  Image.new("RGB", (40, 40), (10, 200, 10))],
    })
    out = tmp_path / "hfds.jsonl"
    recs = run_hfds_eval(engine, get_tokenizer(), ds, str(out), max_new_tokens=4)
    assert len(recs) == 2
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["question_id"] for r in lines] == [0, 1]
    assert all(set(r) == {"question_id", "prompt", "text", "model_id"} for r in lines)


def test_video_n_images_clamps_to_available_frames(tmp_path):
    """A prompt with more <image> markers than the video has frames must use
    the frame count (sample_video_frames caps there), keeping prompt image
    spans in sync with the pixel batch."""
    from PIL import Image

    from visualrwkv_tpu.evals.runner import n_images_for_strategy

    vdir = tmp_path / "vid"
    vdir.mkdir()
    for i in range(3):
        Image.new("RGB", (16, 16), (i * 50, 0, 0)).save(vdir / f"f{i}.jpg")
    line = {"video": "vid", "text": "<image>" * 8 + "\nWhat happens?"}
    assert n_images_for_strategy(line, tmp_path, "video") == 3
    line2 = {"video": "vid", "text": "<image><image>\nWhat happens?"}
    assert n_images_for_strategy(line2, tmp_path, "video") == 2
