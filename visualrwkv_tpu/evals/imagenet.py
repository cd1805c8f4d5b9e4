"""ImageNet classification evaluation for the VRWKV branch
(reference v7.10/evaluate_imagenet.py:1-262)."""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Iterable, Tuple

import numpy as np


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, ks=(1, 5)) -> dict:
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hits = (order[:, :k] == labels[:, None]).any(axis=1)
        out[f"top{k}"] = float(hits.mean()) * 100.0
    return out


def iter_imagefolder(root: str, image_size: int) -> Iterable[Tuple[np.ndarray, int, str]]:
    """Standard class-per-directory layout -> (uint8 image, class index, path)."""
    from PIL import Image

    root = Path(root)
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    cls_to_idx = {c: i for i, c in enumerate(classes)}
    for cls in classes:
        for p in sorted((root / cls).glob("*")):
            try:
                img = Image.open(p).convert("RGB").resize(
                    (image_size, image_size), Image.BICUBIC
                )
            except Exception:
                continue
            yield np.asarray(img, np.uint8), cls_to_idx[cls], str(p)


def evaluate_imagenet(params, cfg, data_root: str, image_size: int = 224,
                      patch_size: int = 14, batch_size: int = 32,
                      max_samples: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from visualrwkv_tpu.data.transforms import normalize_uint8
    from visualrwkv_tpu.models.vrwkv import vrwkv_forward

    @jax.jit
    def forward(params, pixels_uint8):
        x = normalize_uint8(pixels_uint8, "dino", jnp.dtype(cfg.compute_dtype))
        _, logits = vrwkv_forward(params, cfg, x, patch_size=patch_size)
        return logits

    all_logits, all_labels = [], []
    batch_imgs, batch_lbls = [], []

    def flush():
        if not batch_imgs:
            return
        pixels = jnp.asarray(np.stack(batch_imgs))
        logits = np.asarray(forward(params, pixels), np.float32)
        all_logits.append(logits)
        all_labels.extend(batch_lbls)
        batch_imgs.clear()
        batch_lbls.clear()

    n = 0
    for img, label, _ in iter_imagefolder(data_root, image_size):
        batch_imgs.append(img)
        batch_lbls.append(label)
        n += 1
        if len(batch_imgs) == batch_size:
            flush()
        if max_samples and n >= max_samples:
            break
    flush()
    logits = np.concatenate(all_logits) if all_logits else np.zeros((0, 1000))
    labels = np.asarray(all_labels)
    metrics = topk_accuracy(logits, labels) if len(labels) else {}
    metrics["n"] = len(labels)
    return metrics


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("visualrwkv_tpu.evals.imagenet")
    p.add_argument("--data_root", required=True)
    p.add_argument("--model_path", default="")
    p.add_argument("--n_layer", default=12, type=int)
    p.add_argument("--n_embd", default=768, type=int)
    p.add_argument("--image_size", default=224, type=int)
    p.add_argument("--patch_size", default=14, type=int)
    p.add_argument("--max_samples", default=0, type=int)
    args = p.parse_args(argv)

    import jax

    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models.vrwkv import init_vrwkv_params

    cfg = RWKVConfig(n_layer=args.n_layer, n_embd=args.n_embd)
    params = init_vrwkv_params(jax.random.PRNGKey(0), cfg, args.patch_size)
    metrics = evaluate_imagenet(
        params, cfg, args.data_root, args.image_size, args.patch_size,
        max_samples=args.max_samples,
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
