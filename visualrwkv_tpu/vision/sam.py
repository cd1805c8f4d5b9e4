"""SAM ViT-B image encoder (from scratch, JAX).

Implements the Segment-Anything image encoder used as the third tower
(reference vendors it at VisualRWKV-v7/v7.00/src/sam.py:47-506): 1024px /
patch 16 ViT-B with windowed attention (window 14, global attention at blocks
{2,5,8,11}), decomposed relative position embeddings, a conv "neck" to 256
channels, and the reference's lossless space-to-depth downsampler
64x64x256 -> 32x32x1024 (sam.py:47-74), yielding 1024 tokens of dim 1024.

Layout is NHWC throughout; the neck convs use ``lax.conv_general_dilated``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


@dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    ln_eps: float = 1e-6
    downsample_factor: int = 2
    compute_dtype: str = "bfloat16"

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def output_dim(self) -> int:
        return self.out_chans * self.downsample_factor**2


SAM_VIT_B = SAMConfig()


def _ln_init(C):
    return {"weight": jnp.ones((C,), jnp.float32), "bias": jnp.zeros((C,), jnp.float32)}


def _linear_init(key, din, dout, std=0.02):
    return {
        "weight": jax.random.normal(key, (din, dout), jnp.float32) * std,
        "bias": jnp.zeros((dout,), jnp.float32),
    }


def init_sam_params(key: Array, cfg: SAMConfig) -> Params:
    keys = jax.random.split(key, cfg.depth * 6 + 6)
    C, hd = cfg.width, cfg.head_dim
    p: Params = {
        "patch_embed": {
            "weight": jax.random.normal(
                keys[0], (cfg.patch_size * cfg.patch_size * 3, C), jnp.float32
            )
            * 0.02,
            "bias": jnp.zeros((C,), jnp.float32),
        },
        "pos_embed": jax.random.normal(keys[1], (cfg.grid, cfg.grid, C), jnp.float32)
        * 0.02,
        "blocks": [],
        "neck": {
            "conv1": {"weight": jax.random.normal(keys[2], (1, 1, C, cfg.out_chans)) * 0.02},
            "ln1": _ln_init(cfg.out_chans),
            "conv2": {
                "weight": jax.random.normal(keys[3], (3, 3, cfg.out_chans, cfg.out_chans))
                * 0.02
            },
            "ln2": _ln_init(cfg.out_chans),
        },
    }
    for i in range(cfg.depth):
        k = jax.random.split(keys[6 + i], 6)
        size = cfg.grid if i in cfg.global_attn_indexes else cfg.window_size
        p["blocks"].append(
            {
                "ln1": _ln_init(C),
                "ln2": _ln_init(C),
                "attn": {
                    "qkv": _linear_init(k[0], C, 3 * C),
                    "proj": _linear_init(k[1], C, C),
                    "rel_pos_h": jnp.zeros((2 * size - 1, hd), jnp.float32),
                    "rel_pos_w": jnp.zeros((2 * size - 1, hd), jnp.float32),
                },
                "mlp": {
                    "fc1": _linear_init(k[2], C, cfg.mlp_dim),
                    "fc2": _linear_init(k[3], cfg.mlp_dim, C),
                },
            }
        )
    return p


def layer_norm(p: Params, x: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]).astype(x.dtype)


def _dense(p: Params, x: Array, dt) -> Array:
    y = jnp.matmul(x.astype(dt), p["weight"].astype(dt), preferred_element_type=jnp.float32)
    return y + p["bias"]


def window_partition(x: Array, window: int) -> Tuple[Array, Tuple[int, int]]:
    """[B, H, W, C] -> [B*nW, win, win, C], padding bottom/right to multiples."""
    B, H, W, C = x.shape
    pad_h = (-H) % window
    pad_w = (-W) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(x: Array, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]) -> Array:
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // (Hp // window * Wp // window)
    x = x.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _rel_pos_table(size: int, rel_pos: Array) -> Array:
    """[2*size-1, hd] -> [size, size, hd] via relative-coordinate gather.

    Assumes q_size == k_size and an exactly-sized table (true for SAM-B at its
    native resolution); interpolation for other sizes happens at convert time.
    """
    coords = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    return rel_pos[coords]


_MAX_DENSE_TOKENS = 2048  # above this, flash kernel / exact q-chunked attention


def _flash_ok(N: int, W: int) -> bool:
    from visualrwkv_tpu.vision.flash import flash_enabled, sam_flash_supported

    return flash_enabled() and sam_flash_supported(N, W)


def attention_relpos(p: Params, x: Array, heads: int, dt) -> Array:
    """Attention over [B, H, W, C] tokens with decomposed relative positions.

    Global layers at 1024px have 64x64 = 4096 tokens; materializing the
    [B, h, 4096, 4096] logits costs gigabytes, so large inputs run an EXACT
    q-chunked softmax (per-block logits + decomposed rel-pos bias), bounding
    memory at [B, h, block, N].
    """
    B, H, W, C = x.shape
    hd = C // heads
    N = H * W
    qkv = _dense(p["qkv"], x.reshape(B, N, C), dt).reshape(B, N, 3, heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [B,h,N,hd]
    scale = hd**-0.5

    rh = _rel_pos_table(H, p["rel_pos_h"]).astype(jnp.float32)  # [Hq,Hk,hd]
    rw = _rel_pos_table(W, p["rel_pos_w"]).astype(jnp.float32)
    qs = q.astype(jnp.float32).reshape(B, heads, H, W, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", qs, rh)  # [B,h,H,W,Hk]
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", qs, rw)  # [B,h,H,W,Wk]
    # bias[q=(qh,qw), k=(kh,kw)] = rel_h[qh,qw,kh] + rel_w[qh,qw,kw]
    rel_h = rel_h.reshape(B, heads, N, H)
    rel_w = rel_w.reshape(B, heads, N, W)

    def block_attend(q_blk, rh_blk, rw_blk):
        # q_blk [B,h,M,hd]; rh_blk [B,h,M,H]; rw_blk [B,h,M,W] -> [B,h,M,hd]
        logits = jnp.matmul(
            (q_blk * scale).astype(dt), k.astype(dt).transpose(0, 1, 3, 2),
            preferred_element_type=jnp.float32,
        )
        M = q_blk.shape[2]
        bias = (rh_blk[..., :, None] + rw_blk[..., None, :]).reshape(B, heads, M, N)
        attn = jax.nn.softmax(logits + bias, axis=-1)
        return jnp.matmul(attn.astype(dt), v.astype(dt), preferred_element_type=jnp.float32)

    if N <= _MAX_DENSE_TOKENS:
        out = block_attend(q, rel_h, rel_w)
    elif _flash_ok(N, W):
        # global blocks at SAM-1024 (N=4096): custom flash kernel streams key
        # blocks with the decomposed bias rebuilt in VMEM — the [N, N] logit
        # matrix never touches HBM (vision/flash.py)
        from visualrwkv_tpu.vision.flash import sam_flash_attention

        G = B * heads
        out = sam_flash_attention(
            q.reshape(G, N, hd).astype(dt), k.reshape(G, N, hd).astype(dt),
            v.reshape(G, N, hd).astype(dt), rel_h.reshape(G, N, H),
            rel_w.reshape(G, N, W), scale,
        ).reshape(B, heads, N, hd).astype(jnp.float32)
    else:
        block = _MAX_DENSE_TOKENS // 2
        assert N % block == 0, (N, block)
        nb = N // block

        def body(i, acc):
            q_blk = jax.lax.dynamic_slice_in_dim(q, i * block, block, axis=2)
            rh_blk = jax.lax.dynamic_slice_in_dim(rel_h, i * block, block, axis=2)
            rw_blk = jax.lax.dynamic_slice_in_dim(rel_w, i * block, block, axis=2)
            o = block_attend(q_blk, rh_blk, rw_blk)
            return jax.lax.dynamic_update_slice_in_dim(acc, o, i * block, axis=2)

        out = jax.lax.fori_loop(
            0, nb, body, jnp.zeros((B, heads, N, hd), jnp.float32)
        )

    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return _dense(p["proj"], out, dt).reshape(B, H, W, C)


def sam_block(p: Params, cfg: SAMConfig, x: Array, layer_id: int, dt) -> Array:
    shortcut = x
    x = layer_norm(p["ln1"], x, cfg.ln_eps)
    windowed = layer_id not in cfg.global_attn_indexes
    if windowed:
        hw = x.shape[1:3]
        x, pad_hw = window_partition(x, cfg.window_size)
    x = attention_relpos(p["attn"], x, cfg.heads, dt)
    if windowed:
        x = window_unpartition(x, cfg.window_size, pad_hw, hw)
    x = shortcut + x.astype(shortcut.dtype)
    h = _dense(
        p["mlp"]["fc2"],
        jax.nn.gelu(_dense(p["mlp"]["fc1"], layer_norm(p["ln2"], x, cfg.ln_eps), dt), approximate=False).astype(dt),
        dt,
    )
    return x + h.astype(x.dtype)


def _layer_norm_2d(p: Params, x: Array, eps: float = 1e-6) -> Array:
    """Channel LayerNorm on NHWC (reference LayerNorm2d on NCHW, sam.py:33-45)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]).astype(x.dtype)


def _conv(p: Params, x: Array, dt) -> Array:
    kh, kw, cin, cout = p["weight"].shape
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x.astype(dt),
        p["weight"].astype(dt),
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def sam_features(params: Params, cfg: SAMConfig, pixels: Array) -> Array:
    """[B, 1024, 1024, 3] -> [B, (grid/2)^2, out_chans*4] token features."""
    dt = jnp.dtype(cfg.compute_dtype)
    B, H, W, _ = pixels.shape
    g = cfg.grid
    ph = cfg.patch_size
    x = pixels.reshape(B, g, ph, g, ph, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, g * g, ph * ph * 3)
    x = _dense(params["patch_embed"], x, dt).reshape(B, g, g, cfg.width)
    x = x + params["pos_embed"].astype(x.dtype)
    for i, blk in enumerate(params["blocks"]):
        x = sam_block(blk, cfg, x, i, dt)
    # neck
    x = _conv(params["neck"]["conv1"], x, dt)
    x = _layer_norm_2d(params["neck"]["ln1"], x)
    x = _conv(params["neck"]["conv2"], x, dt)
    x = _layer_norm_2d(params["neck"]["ln2"], x)  # [B, g, g, out_chans]
    # lossless space-to-depth (feature order: c*f^2 + dh*f + dw, sam.py:57-74)
    f = cfg.downsample_factor
    gh = g // f
    x = x.reshape(B, gh, f, gh, f, cfg.out_chans)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, gh, gh, cfg.out_chans * f * f)
    return x.reshape(B, gh * gh, cfg.output_dim)
