"""A/B: fused tmix input projection vs the stock per-input path (0B4 train).

Every tmix input is ``x_i = xf + xx * c_i`` (per-channel mix of the current
and previous token streams), so ``x_i @ W = xf @ W + xx @ (c_i * W)``:
stacking the column blocks ``[Wr | Wk | Wv | w1 | a1 | g1 | (v1)]`` and their
``c_i``-scaled copies turns 6-7 separate C-contraction dots plus six fp32
[B,T,C] elementwise mix streams into ONE [B,T,2C] x [2C, ~3.3C] MXU matmul.
Cost: the doubled contraction adds ~13% layer matmul FLOPs; this script
measures whether the stream/dispatch savings beat that at 0B4 train shapes.

The fused variant is monkeypatched over models.rwkv7.tmix_x070, so the
measurement uses the production train step end to end (stacked layout,
remat, fused WKV kernels). A parity check (loss match) runs first.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/tmix_fused_ab.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_fused_tmix():
    from visualrwkv_tpu.models import rwkv7 as m

    def tmix_fused(p, cfg, layer_id, x, v_first, shift_state=None, wkv_state=None):
        B, T, C = x.shape
        H = cfg.n_head
        dt = jnp.dtype(cfg.compute_dtype)
        xf = x.astype(jnp.float32)
        xx = m._token_shift(xf, shift_state) - xf

        has_v = "v1" in p
        cols = [
            ("x_r", p["receptance"]["weight"]),
            ("x_k", p["key"]["weight"]),
            ("x_v", p["value"]["weight"]),
            ("x_w", p["w1"]),
            ("x_a", p["a1"]),
            ("x_g", p["g1"]),
        ] + ([("x_v", p["v1"])] if has_v else [])
        top = jnp.concatenate([w for _, w in cols], axis=1)
        bot = jnp.concatenate([p[c][:, None] * w for c, w in cols], axis=1)
        W = jnp.concatenate([top, bot], axis=0).astype(dt)
        X = jnp.concatenate([xf, xx], axis=-1).astype(dt)
        Y = jnp.matmul(X, W, preferred_element_type=jnp.float32)

        sizes = [w.shape[1] for _, w in cols]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        r, k, v, w_in, a_in, g_in = (
            Y[..., offs[i]:offs[i + 1]] for i in range(6)
        )

        w_lora = jnp.matmul(jnp.tanh(w_in).astype(dt), p["w2"].astype(dt),
                            preferred_element_type=jnp.float32)
        w_raw = -jax.nn.softplus(-(p["w0"] + w_lora)) - 0.5

        if layer_id == 0:
            v_first = v
        else:
            v_in = Y[..., offs[6]:offs[7]]
            v_lora = jnp.matmul(v_in.astype(dt), p["v2"].astype(dt),
                                preferred_element_type=jnp.float32)
            v = v + (v_first - v) * jax.nn.sigmoid(p["v0"] + v_lora)

        a_lora = jnp.matmul(a_in.astype(dt), p["a2"].astype(dt),
                            preferred_element_type=jnp.float32)
        a = jax.nn.sigmoid(p["a0"] + a_lora)
        g = jnp.matmul(jax.nn.sigmoid(g_in).astype(dt), p["g2"].astype(dt),
                       preferred_element_type=jnp.float32)

        kk = m._l2norm_heads(k * p["k_k"], H)
        k = k * (1 + (a - 1) * p["k_a"])

        shp = (B, T, H, C // H)
        y, new_wkv = m.wkv7(
            r.astype(dt).reshape(shp),
            w_raw.astype(dt).reshape(shp),
            k.astype(dt).reshape(shp),
            v.astype(dt).reshape(shp),
            (-kk).astype(dt).reshape(shp),
            (kk * a).astype(dt).reshape(shp),
            initial_state=wkv_state,
            chunk=cfg.chunk_len,
        )
        y = y.reshape(B, T, C)
        eps = 1e-5 * cfg.head_size_divisor**2
        y = m.group_norm(p["ln_x"], y, H, eps)
        rk = (r * k).astype(jnp.float32).reshape(B, T, H, -1) * p["r_k"]
        bonus = rk.sum(-1, keepdims=True) * v.astype(jnp.float32).reshape(B, T, H, -1)
        y = y.astype(jnp.float32) + bonus.reshape(B, T, C)
        out = m.linear(p["output"], (y * g.astype(jnp.float32)).astype(dt), dt)
        return out, v_first, xf[:, -1], new_wkv

    return tmix_fused


def main():
    import bench
    from visualrwkv_tpu.models import rwkv7 as m

    stock = m.tmix_x070
    fused = make_fused_tmix()

    # parity first (tiny, fp32 compute): losses must match closely
    from visualrwkv_tpu.config import RWKVConfig
    cfg = RWKVConfig(n_layer=2, n_embd=128, vocab_size=512, head_size=64,
                     compute_dtype="float32", ctx_len=64)
    params = m.init_rwkv7_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 512)
    x = m.embed(params, ids)
    y0, _ = m.rwkv7_forward(params, cfg, x)
    m.tmix_x070 = fused
    try:
        y1, _ = m.rwkv7_forward(params, cfg, x)
    finally:
        m.tmix_x070 = stock
    err = float(jnp.max(jnp.abs(y0 - y1)))
    print(f"parity max|logit diff| = {err:.3e}", flush=True)
    assert err < 1e-3, "fused projection does not match the stock path"

    for name, fn in (("stock", stock), ("fused", fused)):
        m.tmix_x070 = fn
        try:
            t = bench.measure_train_step_0b4(x=8, rounds=2)
        finally:
            m.tmix_x070 = stock
        print(f"0B4 train B2xa4 {name}: {t:.1f} tok/s/chip", flush=True)


if __name__ == "__main__":
    main()
