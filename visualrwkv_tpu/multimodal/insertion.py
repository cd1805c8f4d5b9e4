"""v6.0 variable image-token-count embedding insertion with left-pad
span alignment.

Reference semantics (VisualRWKV-v6/v6.0/src/model.py:487-570): each sample
carries at most ONE un-expanded image token. The batch's image spans are
aligned by LEFT-padding every sample's pre-image text so all images start at
``max_image_token_indice`` (the max image-token position over the batch);
the projected image features (any length L — no fixed num_token_per_image)
are inserted at embedding level; sequences are truncated to ctx_len keeping
the head unless the head has no valid labels (then the tail) and right-padded
to the batch max. Samples without an image get a zeroed feature block.

TPU-native design: the reference builds each sample with Python list
concatenation under eager torch. Here the whole rearrangement is ONE gather
with static shapes: for every output position we compute (vectorized over
[B, T_out]) which raw segment it falls in — left-pad / image span / text —
and the source text index, then combine an embedding gather with a
dynamic-slice-free masked feature insert. Only two scalars (`max_idx`,
`T_out`) are batch-data-dependent; they are computed host-side by
:func:`leftpad_plan` and baked as static ints (bucketed to the WKV chunk
multiple to bound recompiles), exactly as XLA wants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX

Array = jax.Array


@dataclass(frozen=True)
class LeftpadPlan:
    """Static (host-computed) geometry of one batch's insertion."""

    max_idx: int  # aligned image start = max image-token position
    T_out: int  # padded output length (multiple of `bucket`)
    img_len: int  # inserted feature count L
    flip_len: int  # bidirectional flip span: L-1 (reference img_end excludes
    # the trailing cls feature, v6.0/src/model.py:526-527)
    ctx_len: int  # truncation limit (reference truncate_input)


def leftpad_plan(
    input_ids: np.ndarray, img_len: int, ctx_len: int, bucket: int = 16
) -> LeftpadPlan:
    """Compute the batch-static geometry on host.

    Raises on >1 image per sample (reference raises ValueError too,
    v6.0/src/model.py:536-537).
    """
    ids = np.asarray(input_ids)
    T_in = ids.shape[1]
    n_img = (ids == IMAGE_TOKEN_INDEX).sum(axis=1)
    if (n_img > 1).any():
        raise ValueError(
            f"Too many images in one sample: {int(n_img.max())}, should be 0 or 1."
        )
    has = n_img == 1
    max_idx = int(np.where(has, np.argmax(ids == IMAGE_TOKEN_INDEX, axis=1), 0).max())
    # raw per-sample length: pad-to-max_idx + L + post-image text (or the
    # whole text for image-free samples, idx treated as -1)
    idx = np.where(has, np.argmax(ids == IMAGE_TOKEN_INDEX, axis=1), -1)
    raw_len = max_idx + img_len + (T_in - idx - 1)
    T_out = int(min(ctx_len, raw_len.max()))
    T_out = -(-T_out // bucket) * bucket  # WKV chunk multiple
    return LeftpadPlan(max_idx=max_idx, T_out=T_out, img_len=img_len,
                       flip_len=max(1, img_len - 1), ctx_len=ctx_len)


def leftpad_insert(
    embed_table: Array,
    input_ids: Array,
    labels: Array,
    image_features: Array,
    plan: LeftpadPlan,
) -> Tuple[Array, Array, Array]:
    """Build aligned (embeds [B, T_out, C], labels [B, T_out], off [B]).

    ``image_features``: [B, L, C] projected features (zeroed for image-free
    samples, matching the reference's explicit zeroing).
    ``off`` is the per-sample tail-keep truncation offset: the image span of
    row b sits at output slots [max_idx - off[b], max_idx - off[b] + L) —
    consumers that address the span (bidirectional flip) must subtract it.
    All shapes static given ``plan``; pure gather/where — jit/pjit friendly.
    """
    B, T_in = input_ids.shape
    L, max_idx, T_out = plan.img_len, plan.max_idx, plan.T_out
    assert image_features.shape[1] == L, (image_features.shape, L)

    img_mask_in = input_ids == IMAGE_TOKEN_INDEX
    has_img = img_mask_in.any(axis=1)  # [B]
    idx = jnp.where(has_img, jnp.argmax(img_mask_in, axis=1), -1)  # [B]
    raw_len = max_idx + L + (T_in - idx - 1)  # [B]

    # reference truncate_input (v6.0/src/model.py:499-510): keep the first
    # ctx_len raw positions unless they carry no valid labels, then keep the
    # last ctx_len. A text token j sits at raw position rawpos(j).
    ctx = plan.ctx_len
    j_in = jnp.arange(T_in)[None, :]  # [1, T_in]
    rawpos = jnp.where(
        j_in < idx[:, None],
        max_idx - idx[:, None] + j_in,  # pre-image text (left-padded)
        max_idx + L + j_in - idx[:, None] - 1,  # post-image text
    )
    rawpos = jnp.where(j_in == idx[:, None], -1, rawpos)  # the image token itself
    head_valid = ((labels != IGNORE_INDEX) & (rawpos >= 0) & (rawpos < ctx)).any(axis=1)
    off = jnp.where((raw_len > ctx) & ~head_valid, raw_len - ctx, 0)  # [B]
    keep_len = jnp.minimum(raw_len, ctx)  # [B] truncated length

    t = jnp.arange(T_out)[None, :]  # [1, T_out]
    p = t + off[:, None]  # raw position served by each output slot
    in_img = (p >= max_idx) & (p < max_idx + L) & (t < keep_len[:, None])
    j = jnp.where(
        p < max_idx,
        p - (max_idx - idx[:, None]),  # invert the pre-image mapping
        p - (max_idx + L) + idx[:, None] + 1,  # invert the post-image mapping
    )
    text_ok = (
        (~in_img) & (j >= 0) & (j < T_in)
        & (p < raw_len[:, None]) & (t < keep_len[:, None])
    )
    j_safe = jnp.clip(j, 0, T_in - 1)

    # left-pad slots carry the TOKEN-0 embedding (reference builds the prefix
    # from torch.zeros ids and embeds it, v6.0/src/model.py:527-528); the
    # final right padding beyond raw_len is zero VECTORS (torch.zeros embeds,
    # :563-566)
    src_ids = jnp.take_along_axis(input_ids, j_safe, axis=1)
    src_ids = jnp.where(text_ok, src_ids, 0)
    emb = jnp.take(embed_table, jnp.clip(src_ids, 0, embed_table.shape[0] - 1), axis=0)
    right_pad = (p >= raw_len[:, None]) | (t >= keep_len[:, None])
    emb = emb * (1.0 - right_pad[..., None].astype(emb.dtype))

    feats = image_features * has_img[:, None, None].astype(image_features.dtype)
    # place feats at output slots where in_img: slot t holds feature p - max_idx
    f_idx = jnp.clip(p - max_idx, 0, L - 1)
    feat_at = jnp.take_along_axis(feats.astype(emb.dtype), f_idx[..., None], axis=1)
    emb = jnp.where(in_img[..., None], feat_at, emb)

    new_labels = jnp.take_along_axis(labels, j_safe, axis=1)
    new_labels = jnp.where(text_ok, new_labels, IGNORE_INDEX)
    return emb, new_labels, off
