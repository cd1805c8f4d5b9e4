"""UHD high/low-resolution tile fusion + offline feature extraction.

Reference VisualRWKV-UHD/src/vision.py:179-224: per image, tower features of
[global, tl, tr, bl, br] tiles; the global features of the 3 towers concat on
the channel dim; the 4 tiles are avg-pooled 32->16 per tower and spatially
reassembled into one 32x32 map per tower; all concat on the channel dim
-> [B, 1024, 2 * (D_dino + D_siglip + D_sam)].

Offline extraction (vision.py:225-255, extract_feature.py) saves per-image
fp16 ``.npz`` feature files for feature-from-disk training.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _pool_half(tile: Array) -> Array:
    """[B, L, D] on a sqrt(L) grid -> avg-pooled to half resolution [B, L/4, D]
    kept as [B, h, w, D] for reassembly."""
    B, L, D = tile.shape
    hw = int(round(L**0.5))
    out = hw // 2
    x = tile.astype(jnp.float32).reshape(B, out, 2, out, 2, D).mean(axis=(2, 4))
    return x  # [B, out, out, D]


def fuse_image_features(per_tower_tiles: Sequence[Array]) -> Array:
    """per_tower_tiles: list over towers of [B, 5, L, D_tower] (global + 2x2
    tiles, row-major tl,tr,bl,br). Returns [B, L, 2 * sum(D_tower)]."""
    global_feats = jnp.concatenate([t[:, 0] for t in per_tower_tiles], axis=-1)
    locals_ = []
    for t in per_tower_tiles:
        tl, tr, bl, br = (_pool_half(t[:, i]) for i in range(1, 5))
        top = jnp.concatenate([tl, tr], axis=2)
        bottom = jnp.concatenate([bl, br], axis=2)
        full = jnp.concatenate([top, bottom], axis=1)  # [B, hw, hw, D]
        B, H, W, D = full.shape
        locals_.append(full.reshape(B, H * W, D))
    return jnp.concatenate([global_feats] + locals_, axis=-1).astype(
        per_tower_tiles[0].dtype
    )


def uhd_image_to_tiles(image) -> List:
    """PIL image -> [global, tl, tr, bl, br] crops (2x2 grid over the image)."""
    from visualrwkv_tpu.data.tiling import split_into_tiles

    return [image] + split_into_tiles(image, 2, 2)


def extract_features_to_disk(
    encode_fn,
    image_files: Sequence[str],
    image_folder: str,
    feature_folder: str,
    tower_sizes: Dict[str, int],
    batch_size: int = 4,
) -> List[Path]:
    """Offline UHD feature extraction: per-image fp16 .npz files.

    encode_fn: callable(images_dict) -> [N, L, D] fused features (jitted).
    """
    from PIL import Image

    out_paths = []
    folder = Path(feature_folder)
    for start in range(0, len(image_files), batch_size):
        chunk = image_files[start : start + batch_size]
        arrays: Dict[str, List[np.ndarray]] = {t: [] for t in tower_sizes}
        for name in chunk:
            img = Image.open(Path(image_folder) / name).convert("RGB")
            for tile in uhd_image_to_tiles(img):
                for t, size in tower_sizes.items():
                    arrays[t].append(
                        np.asarray(tile.resize((size, size), Image.BICUBIC), np.uint8)
                    )
        images = {t: np.stack(v) for t, v in arrays.items()}
        feats = np.asarray(encode_fn(images), np.float16)  # [len(chunk), L, D]
        for i, name in enumerate(chunk):
            path = (folder / name).with_suffix(".npz")
            path.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(path, features=feats[i])
            out_paths.append(path)
    return out_paths
