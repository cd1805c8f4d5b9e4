"""HF-datasets evaluation (reference evaluate_hfds.py:64-186): the same eval
flow over a ``datasets.load_from_disk`` dataset whose records carry in-line
PIL images instead of image paths."""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def record_to_images(rec: Dict, sizes: Dict[str, int]) -> Dict[str, np.ndarray]:
    img = rec["image"]
    if hasattr(img, "convert"):
        img = img.convert("RGB")
    else:  # bytes / dict forms
        from io import BytesIO

        from PIL import Image

        data = img["bytes"] if isinstance(img, dict) else img
        img = Image.open(BytesIO(data)).convert("RGB")
    from PIL import Image

    return {
        t: np.asarray(img.resize((s, s), Image.BICUBIC), np.uint8)[None]
        for t, s in sizes.items()
    }


def run_hfds_eval(engine, tokenizer, dataset, output_file: str,
                  question_key: str = "question", id_key: str = "question_id",
                  dataset_name: str = "", max_new_tokens: int = 128,
                  model_id: str = "visualrwkv_tpu") -> list:
    from visualrwkv_tpu.data.conversation import DEFAULT_STOP_TOKEN, STOP_TOKEN_INDEX
    from visualrwkv_tpu.evals.runner import prepare_question

    cfg = engine.cfg
    sizes = {
        t: (cfg.vision.sam_image_size if t == "sam" else cfg.vision.image_size)
        for t in cfg.vision.towers
    }
    out_path = Path(output_file)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    results = []
    with open(out_path, "w") as f:
        for i, rec in enumerate(dataset):
            images = record_to_images(rec, sizes)
            line = {"text": "<image>\n" + rec[question_key]}
            item = prepare_question(line, tokenizer, cfg, 1, dataset_name)
            res = engine.generate(
                item["input_ids"][None, :], images=images,
                max_new_tokens=max_new_tokens, do_sample=False,
                stop_tokens=(0, STOP_TOKEN_INDEX),
            )
            n = int(res.lengths[0])
            text = tokenizer.decode([int(t) for t in res.tokens[0][:n]])
            text = text.split(DEFAULT_STOP_TOKEN)[0].strip()
            out = {
                "question_id": rec.get(id_key, i),
                "prompt": item["input_text"],
                "text": text,
                "model_id": model_id,
            }
            f.write(json.dumps(out, ensure_ascii=False) + "\n")
            results.append(out)
    return results


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("visualrwkv_tpu.evals.hfds")
    p.add_argument("--dataset_path", required=True, help="datasets.load_from_disk dir")
    p.add_argument("--split", default="test")
    p.add_argument("--output_file", required=True)
    p.add_argument("--model_path", default="")
    p.add_argument("--n_layer", default=12, type=int)
    p.add_argument("--n_embd", default=768, type=int)
    p.add_argument("--max_new_tokens", default=128, type=int)
    args = p.parse_args(argv)

    import datasets
    import jax

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.infer.engine import InferenceEngine
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params

    ds = datasets.load_from_disk(args.dataset_path)
    if args.split in getattr(ds, "keys", lambda: [])():
        ds = ds[args.split]
    cfg = VLMConfig(rwkv=RWKVConfig(n_layer=args.n_layer, n_embd=args.n_embd),
                    vision=VisionConfig())
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    if args.model_path:
        from visualrwkv_tpu.convert.pth_import import import_rwkv_state_dict, load_pth

        params["rwkv"] = import_rwkv_state_dict(load_pth(args.model_path))
    engine = InferenceEngine(params, cfg)
    run_hfds_eval(engine, get_tokenizer(), ds, args.output_file,
                  max_new_tokens=args.max_new_tokens)


if __name__ == "__main__":
    main()
