"""Benchmark evaluation runner.

The reference's evaluate.py (SURVEY §3.2) decodes one question at a time and
re-runs the full prefix per generated token.  This runner uses the O(1)-state
engine with a single jitted decode scan; multi-process sharding is the same
``--num_chunks/--chunk_idx`` protocol driven by shell fan-out or
``jax.process_index``.

Output is the reference's self-describing jsonl (question_id / prompt / text /
avg_logit / geometric-mean avg_prob / model_id / metadata, evaluate.py:218-228),
so the reference's downstream scorers and submission converters work unchanged.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from visualrwkv_tpu.config import VLMConfig
from visualrwkv_tpu.data.conversation import (
    DEFAULT_STOP_TOKEN,
    STOP_TOKEN_INDEX,
    preprocess,
    process_image_tokens_in_conversations,
)
from visualrwkv_tpu.data.dataset import load_image_uint8
from visualrwkv_tpu.data.tiling import (
    load_video_frame_paths,
    sample_video_frames,
    single_to_multi_images,
)
from visualrwkv_tpu.evals.loaders import get_input_text, get_question_id
from visualrwkv_tpu.infer.engine import InferenceEngine

log = logging.getLogger(__name__)


def _pil_to_tower_arrays(images: List, sizes: Dict[str, int]) -> Dict[str, np.ndarray]:
    from PIL import Image

    out: Dict[str, List[np.ndarray]] = {t: [] for t in sizes}
    for img in images:
        for t, size in sizes.items():
            out[t].append(np.asarray(img.resize((size, size), Image.BICUBIC), np.uint8))
    return {t: np.stack(v) for t, v in out.items()}


def build_image_dict(
    line: Dict,
    image_folder: Optional[Path],
    sizes: Dict[str, int],
    strategy: str = "single",
) -> Dict[str, np.ndarray]:
    """single | multi (tile strategy) | video (uniform frames).

    (reference evaluate.py:80-137)
    """
    from PIL import Image

    if strategy == "video":
        frames = load_video_frame_paths(Path(image_folder) / line["video"])
        n = _video_frame_count(line, frames)
        paths = sample_video_frames(frames, n)
        images = [Image.open(p).convert("RGB") for p in paths]
    elif strategy == "uhd":
        from visualrwkv_tpu.multimodal.uhd import uhd_image_to_tiles

        img = Image.open(Path(image_folder) / line["image"]).convert("RGB")
        images = uhd_image_to_tiles(img)  # [global, tl, tr, bl, br]
    else:
        img = Image.open(Path(image_folder) / line["image"]).convert("RGB")
        images = single_to_multi_images(img) if strategy == "multi" else [img]
    return _pil_to_tower_arrays(images, sizes)


def prepare_question(
    line: Dict,
    tokenizer,
    cfg: VLMConfig,
    num_images: int,
    dataset_name: str = "",
) -> Dict:
    text = get_input_text(line, num_images, dataset_name)
    conversations = [
        {"from": "human", "value": text},
        {"from": "gpt", "value": ""},
    ]
    conversations = process_image_tokens_in_conversations(
        conversations, num_images, cfg.image_position
    )
    return preprocess(
        conversations,
        tokenizer,
        has_image=True,
        ctx_len=cfg.rwkv.ctx_len,
        num_token_per_image=cfg.num_token_per_image,
        do_pad_to_max_length=False,
    )


def bucket_pad_ids(input_ids: np.ndarray, bucket: int = 64) -> np.ndarray:
    """Left-pad prompt ids with EOS to the next length bucket.

    EOS left-padding is the model's own chunk-padding semantics (reference
    RWKV.forward, src/model.py:286-312), so results are unchanged while the
    number of distinct compiled prefill shapes drops to the bucket count —
    per-shape recompiles are expensive, especially over remote-TPU links.
    """
    T = input_ids.shape[-1]
    target = max(bucket, -(-T // bucket) * bucket)
    pad = target - T
    if pad == 0:
        return input_ids
    return np.concatenate(
        [np.full(input_ids.shape[:-1] + (pad,), STOP_TOKEN_INDEX, input_ids.dtype),
         input_ids], axis=-1,
    )


def _video_frame_count(line: Dict, frames) -> int:
    """Frames to sample for a video question: min(prompt's <image> count,
    available frames). Fails loudly at zero so the prompt and the pixel
    batch can never disagree (they both derive from this function)."""
    count = line["text"].count("<image>")
    if count == 0 or not frames:
        raise ValueError(
            f"video question {line.get('question_id')!r}: "
            f"{count} <image> tags, {len(frames)} frames on disk"
        )
    return min(count, len(frames))


def n_images_for_strategy(line: Dict, image_folder: Optional[Path], strategy: str) -> int:
    """Images-per-sample for a question WITHOUT decoding pixels (PIL.open is
    header-lazy), so batching keys can be derived cheaply."""
    if strategy == "video":
        from visualrwkv_tpu.data.tiling import load_video_frame_paths

        frames = load_video_frame_paths(Path(image_folder) / line["video"])
        return _video_frame_count(line, frames)
    if strategy == "uhd":
        return 5  # global + 2x2 tiles
    if strategy == "multi":
        from PIL import Image

        from visualrwkv_tpu.data.tiling import n_tiles_for_size

        with Image.open(Path(image_folder) / line["image"]) as img:
            return n_tiles_for_size(img.size)
    return 1


def run_eval(
    engine: InferenceEngine,
    tokenizer,
    questions: List[Dict],
    image_folder: Optional[str],
    output_file: str,
    dataset_name: str = "",
    image_strategy: str = "single",
    max_new_tokens: int = 128,
    model_id: str = "visualrwkv_tpu",
    tower_sizes: Optional[Dict[str, int]] = None,
    progress: bool = True,
    length_bucket: int = 16,
    batch_size: int = 1,
) -> List[Dict]:
    """Evaluate questions, write the jsonl, return the result records.

    ``batch_size > 1`` groups questions whose (bucketed prompt length,
    images-per-sample) match and decodes them together — batched decode is
    the TPU answer to the reference's one-process-per-GPU fan-out (B=32
    decode gives ~25x the single-stream tokens/s). Records are written in
    the original question order either way.
    """
    cfg = engine.cfg
    sizes = tower_sizes or {
        t: (cfg.vision.sam_image_size if t == "sam" else cfg.vision.image_size)
        for t in cfg.vision.towers
    }
    out_path = Path(output_file)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    # pass 1: tokenize (cheap, no pixel decode) to derive grouping keys
    prepared = []
    for i, line in enumerate(questions):
        if "image" not in line and "video" not in line:
            continue
        n_img = n_images_for_strategy(line, Path(image_folder), image_strategy)
        item = prepare_question(line, tokenizer, cfg, n_img, dataset_name)
        ids = bucket_pad_ids(item["input_ids"], length_bucket)
        prepared.append(
            {"order": i, "line": line, "item": item, "ids": np.asarray(ids), "n_img": n_img}
        )

    groups: Dict[tuple, List[dict]] = {}
    for q in prepared:
        groups.setdefault((q["ids"].shape[-1], q["n_img"]), []).append(q)

    # records stream to disk as each batch completes (crash/preemption keeps
    # the finished answers, like the old per-question flush); on success the
    # file is rewritten in the original question order
    records: Dict[int, Dict] = {}
    done = 0
    bs = max(1, batch_size)
    partial = open(out_path, "w")
    try:
        for key in groups:
            queue = groups[key]
            for start in range(0, len(queue), bs):
                chunk = queue[start : start + bs]
                ids = np.stack([q["ids"] for q in chunk])
                per_tower: Dict[str, List[np.ndarray]] = {}
                for q in chunk:
                    imgs = build_image_dict(q["line"], Path(image_folder), sizes, image_strategy)
                    for t, v in imgs.items():
                        per_tower.setdefault(t, []).append(v)
                images = {t: np.concatenate(v, axis=0) for t, v in per_tower.items()}
                res = engine.generate(
                    ids,
                    images=images,
                    max_new_tokens=max_new_tokens,
                    do_sample=False,
                    stop_tokens=(0, STOP_TOKEN_INDEX),
                )
                for row, q in enumerate(chunk):
                    n = int(res.lengths[row])
                    out_ids = [int(t) for t in res.tokens[row][:n]]
                    text = tokenizer.decode(out_ids).split(DEFAULT_STOP_TOKEN)[0].strip()
                    logits = res.logits[row][: max(n, 1)]
                    probs = res.probs[row][: max(n, 1)]
                    avg_logit = float(np.mean(logits))
                    avg_prob = float(np.prod(probs) ** (1.0 / len(probs)))
                    records[q["order"]] = {
                        "question_id": get_question_id(q["line"]),
                        "prompt": q["item"]["input_text"],
                        "text": text,
                        "avg_logit": str(round(avg_logit, 3)),
                        "avg_prob": str(round(avg_prob, 3)),
                        "model_id": model_id,
                        "metadata": {
                            **q["line"].get("metadata", {}),
                            "image_file": q["line"].get("image"),
                        },
                    }
                for q in chunk:
                    partial.write(json.dumps(records[q["order"]], ensure_ascii=False) + "\n")
                partial.flush()
                done += len(chunk)
                if progress:
                    log.info("eval %d/%d", done, len(prepared))

    finally:
        partial.close()
    results = [records[k] for k in sorted(records)]
    with open(out_path, "w") as f:
        for rec in results:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    return results
