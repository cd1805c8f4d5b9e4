"""Image patch scanning strategies (v5.1) and tiny attention (v5.2).

v5.1 registers index buffers reordering the 32x32 patch grid before feeding
image tokens to the recurrent LM (v5.1/src/model.py:348-416): unidirection
(raster), bidirection (raster + reversed), multidirection (4 rotations),
rotation (90-degree), spiral (outside-in), snake (boustrophedon), zigzag
(anti-diagonals).  All are precomputed permutations — gathers on device.

v5.2 tiny attention: one small softmax-attention layer injected at
``tiny_att_layer`` whose K/V come from the image-embedding residual
(v5.2/src/model.py:212-283).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Any]


def raster_order(n: int) -> np.ndarray:
    return np.arange(n * n)


def snake_order(n: int) -> np.ndarray:
    grid = np.arange(n * n).reshape(n, n)
    rows = [grid[i] if i % 2 == 0 else grid[i][::-1] for i in range(n)]
    return np.concatenate(rows)


def zigzag_order(n: int) -> np.ndarray:
    """Anti-diagonal traversal (JPEG-style zigzag)."""
    order = []
    for s in range(2 * n - 1):
        diag = [(i, s - i) for i in range(max(0, s - n + 1), min(n, s + 1))]
        if s % 2 == 1:
            diag.reverse()
        order.extend(i * n + j for i, j in diag)
    return np.asarray(order)


def spiral_order(n: int) -> np.ndarray:
    """Outside-in clockwise spiral."""
    grid = np.arange(n * n).reshape(n, n)
    out: List[int] = []
    top, bottom, left, right = 0, n - 1, 0, n - 1
    while top <= bottom and left <= right:
        out.extend(grid[top, left : right + 1])
        for i in range(top + 1, bottom + 1):
            out.append(grid[i, right])
        if top < bottom:
            out.extend(grid[bottom, left:right][::-1])
        if left < right:
            for i in range(bottom - 1, top, -1):
                out.append(grid[i, left])
        top, bottom, left, right = top + 1, bottom - 1, left + 1, right - 1
    return np.asarray(out)


def rotation_order(n: int, quarter_turns: int = 1) -> np.ndarray:
    grid = np.arange(n * n).reshape(n, n)
    return np.rot90(grid, k=quarter_turns).reshape(-1)


def scan_orders(n: int, strategy: str) -> List[np.ndarray]:
    """Strategy -> one or more index permutations of the n x n grid; multiple
    permutations mean the image tokens are concatenated in each order."""
    if strategy == "unidirection":
        return [raster_order(n)]
    if strategy == "bidirection":
        return [raster_order(n), raster_order(n)[::-1]]
    if strategy == "multidirection":
        return [rotation_order(n, k) for k in range(4)]
    if strategy == "rotation":
        return [rotation_order(n, 1)]
    if strategy == "spiral":
        return [spiral_order(n)]
    if strategy == "snake":
        return [snake_order(n)]
    if strategy == "zigzag":
        return [zigzag_order(n)]
    raise ValueError(f"unknown scanning strategy {strategy}")


def apply_scanning(image_features: Array, strategy: str) -> Array:
    """[N_img, L, D] -> [N_img, L * n_orders, D] reordered/concatenated."""
    L = image_features.shape[1]
    n = int(round(math.sqrt(L)))
    assert n * n == L, f"patch count {L} is not square"
    orders = scan_orders(n, strategy)
    parts = [image_features[:, jnp.asarray(o.copy())] for o in orders]
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# v5.2 tiny attention
# ---------------------------------------------------------------------------


def init_tiny_attention_params(key: Array, n_embd: int, tiny_att_dim: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    std = n_embd**-0.5
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -std, std)
    return {
        "ln": {"weight": jnp.ones((n_embd,)), "bias": jnp.zeros((n_embd,))},
        "q": {"weight": u(k1, (n_embd, tiny_att_dim))},
        "k": {"weight": u(k2, (n_embd, tiny_att_dim))},
        "v": {"weight": u(k3, (n_embd, n_embd))},
        "out": {"weight": jnp.zeros((n_embd, n_embd), jnp.float32)},
    }


def tiny_attention(
    p: Params, x: Array, x_emb: Array, causal: bool = True, dtype=jnp.bfloat16
) -> Array:
    """Single-head tiny attention with the image-embedding residual as K/V
    memory (v5.2: out = x + attn(ln(x)) @ v(x_emb))."""
    from visualrwkv_tpu.models.rwkv7 import layer_norm, linear

    dt = jnp.dtype(dtype)
    B, T, C = x.shape
    h = layer_norm(p["ln"], x)
    q = linear(p["q"], h, dt)
    k = linear(p["k"], x_emb, dt)
    v = linear(p["v"], x_emb, dt)
    d = q.shape[-1]
    scores = jnp.matmul(q.astype(dt), k.astype(dt).transpose(0, 2, 1),
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    if causal and x_emb.shape[1] == T:
        mask = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.matmul(attn.astype(dt), v.astype(dt), preferred_element_type=jnp.float32)
    return x + linear(p["out"], out.astype(dt), dt).astype(x.dtype)
