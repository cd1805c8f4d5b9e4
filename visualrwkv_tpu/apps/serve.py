"""Batch-serving CLI over the continuous-batching server (infer/server.py).

Reads requests from a jsonl file ({"id": ..., "text": ..., "image": optional
path, "max_new_tokens": optional}) and writes {"id", "text"} jsonl out, with
the decode batch kept full by slot-level continuous batching. This is the
production-shaped counterpart of the reference's one-request-at-a-time demo
serving (app/app_gpu.py).

    python -m visualrwkv_tpu.apps.serve --model_path m.pth \
        --input requests.jsonl --output answers.jsonl --max_batch 16
"""

from __future__ import annotations

import argparse
import json
import logging


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("visualrwkv_tpu.apps.serve")
    p.add_argument("--input", required=True, type=str)
    p.add_argument("--output", required=True, type=str)
    p.add_argument("--image_folder", default="", type=str)
    p.add_argument("--max_batch", default=16, type=int)
    p.add_argument("--max_new_tokens", default=128, type=int)
    p.add_argument("--temperature", default=0.0, type=float,
                   help="0 = greedy (server-level; one compiled step)")
    p.add_argument("--top_p", default=0.3, type=float)
    # engine construction flags shared with the demo app
    from visualrwkv_tpu.apps.demo import build_engine

    p.add_argument("--model_path", default="", type=str)
    p.add_argument("--n_layer", default=12, type=int)
    p.add_argument("--n_embd", default=768, type=int)
    p.add_argument("--ctx_len", default=2048, type=int)
    p.add_argument("--proj_type", default="mlp")
    p.add_argument("--num_token_per_image", default=1024, type=int)
    p.add_argument("--vision_towers", default="dino,siglip,sam")
    p.add_argument("--quant", default="none", choices=["none", "int8"])
    p.add_argument("--strategy", default="", type=str)
    p.add_argument("--state_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--state_layout", default="head", choices=["head", "flat"])
    args = p.parse_args(argv)

    import numpy as np

    from visualrwkv_tpu.apps.demo import GEN_PROMPT
    from visualrwkv_tpu.data.dataset import load_image_uint8
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.infer.sampling import SamplingParams
    from visualrwkv_tpu.infer.server import BatchedServer

    engine, cfg = build_engine(args)
    tok = get_tokenizer()
    sp = SamplingParams(temperature=args.temperature, top_p=args.top_p)
    server = BatchedServer(engine, max_batch=args.max_batch, sp=sp)

    id_by_rid = {}
    with open(args.input) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            images = None
            if rec.get("image"):
                from pathlib import Path

                sizes = {
                    t: (cfg.vision.sam_image_size if t == "sam"
                        else cfg.vision.image_size)
                    for t in cfg.vision.towers
                }
                path = str(Path(args.image_folder) / rec["image"])

                # lazy: the server loads at slot admission, so a huge request
                # file never pins more than ~max_batch decoded images
                def images(path=path, sizes=sizes):
                    img = load_image_uint8(path, sizes)
                    return {t: v[None] for t, v in img.items()}
            prompt = GEN_PROMPT.format(instruction=rec["text"].strip())
            ids = np.asarray([tok.encode(prompt)])
            rid = server.submit(
                ids, images=images,
                max_new_tokens=rec.get("max_new_tokens", args.max_new_tokens),
            )
            id_by_rid[rid] = rec.get("id", rid)

    results = server.run()
    with open(args.output, "w") as out:
        for rid, tokens in sorted(results.items()):
            if tokens and tokens[-1] in server.stop_tokens:
                tokens = tokens[:-1]
            out.write(json.dumps(
                {"id": id_by_rid[rid], "text": tok.decode(tokens)},
                ensure_ascii=False) + "\n")
    logging.info("wrote %d results to %s", len(results), args.output)


if __name__ == "__main__":
    main()
