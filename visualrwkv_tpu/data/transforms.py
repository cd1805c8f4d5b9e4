"""Device-side image preprocessing (fused into XLA).

The host decodes+resizes to uint8 per tower (bicubic, matching the reference's
torchvision ``Resize``); normalization/casting runs on device inside the same
jit as the vision towers so XLA fuses it with the first conv/patchify.

Normalization matches the reference transforms (VisualRWKV-v7/v7.00/src/vision.py:95-120):
DINOv2 and SAM use the timm-DINOv2 (ImageNet) stats; SigLIP uses 0.5/0.5.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)

TOWER_STATS = {
    "dino": (IMAGENET_MEAN, IMAGENET_STD),
    "siglip": (SIGLIP_MEAN, SIGLIP_STD),
    "sam": (IMAGENET_MEAN, IMAGENET_STD),
    "clip": ((0.48145466, 0.4578275, 0.40821073), (0.26862954, 0.26130258, 0.27577711)),
}


def normalize_uint8(pixels: jnp.ndarray, tower: str, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, H, W, 3] uint8 -> normalized [N, H, W, 3] in `dtype`."""
    mean, std = TOWER_STATS[tower]
    x = pixels.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(dtype)


def normalize_tower_dict(
    images: Dict[str, jnp.ndarray], dtype=jnp.bfloat16
) -> Dict[str, jnp.ndarray]:
    return {t: normalize_uint8(v, t, dtype) for t, v in images.items()}


def letterbox_pad(img, fill=(127, 127, 127)):
    """Pad a PIL image to square with a neutral border (v6.11's LetterboxPad
    transform, v6.11/src/vision.py:39-198) instead of aspect-distorting resize."""
    from PIL import Image

    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    canvas = Image.new("RGB", (side, side), fill)
    canvas.paste(img, ((side - w) // 2, (side - h) // 2))
    return canvas


def resize_images(x: jnp.ndarray, size: int, method: str = "bicubic") -> jnp.ndarray:
    """Device-side antialiased resize to [N, size, size, 3] (for tiling paths)."""
    import jax.image

    n, h, w, c = x.shape
    return jax.image.resize(
        x.astype(jnp.float32), (n, size, size, c), method=method, antialias=True
    )
