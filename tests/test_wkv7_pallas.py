"""Pallas WKV7 forward parity (interpret mode on CPU) vs the golden scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.ops.wkv7 import wkv7_reference
from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas

from test_wkv7 import make_inputs, rel_err  # noqa: E402


@pytest.mark.parametrize("chunk", [16, 32])
def test_pallas_matches_reference(chunk):
    inputs = make_inputs(jax.random.PRNGKey(0), B=2, T=64, H=3, N=16)
    y_ref, s_ref = wkv7_reference(*inputs)
    y_pal, s_pal = wkv7_pallas(*inputs, chunk=chunk)
    assert rel_err(y_pal, y_ref) < 1e-5
    assert rel_err(s_pal, s_ref) < 1e-5


def test_pallas_with_initial_state():
    inputs = make_inputs(jax.random.PRNGKey(1), B=1, T=32, H=2, N=8)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 8, 8), jnp.float32)
    y_ref, s_ref = wkv7_reference(*inputs, initial_state=s0)
    y_pal, s_pal = wkv7_pallas(*inputs, initial_state=s0, chunk=16)
    assert rel_err(y_pal, y_ref) < 1e-5
    assert rel_err(s_pal, s_ref) < 1e-5


@pytest.mark.slow
def test_pallas_backward_matches_autodiff():
    """Hand-derived fused VJP vs jax.grad of the chunked formulation."""
    from visualrwkv_tpu.ops.wkv7 import wkv7_chunked
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_bwd, wkv7_pallas_fwd_res

    inputs = make_inputs(jax.random.PRNGKey(2), B=2, T=64, H=3, N=16)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 16, 16), jnp.float32)
    y, s_fin, zin = wkv7_pallas_fwd_res(*inputs, initial_state=s0, chunk=16)
    dy = jax.random.normal(jax.random.PRNGKey(9), y.shape, jnp.float32)
    dzf = jax.random.normal(jax.random.PRNGKey(10), s_fin.shape, jnp.float32)

    def loss(*args):
        yy, ss = wkv7_chunked(*args[:6], initial_state=args[6], chunk=16)
        return jnp.sum(yy * dy) + jnp.sum(ss * dzf)

    grads_ref = jax.grad(loss, argnums=tuple(range(7)))(*inputs, s0)
    grads_pal = wkv7_pallas_bwd(*inputs, zin, dy, dzf, chunk=16)
    for name, gr, gp in zip("rwkvab" + "s", grads_ref, grads_pal):
        assert rel_err(gp, gr) < 1e-5, f"d{name}"


@pytest.mark.slow
def test_bf16_stability_adversarial():
    """Regression for the chunk-length stability limit: with bf16 inputs whose
    in-context-lr a ~ 0.5 and mixed decay rates (the post-init regime that
    produced NaN at chunk 128 / garbage at chunk 64 on real activations),
    chunk <= 32 must stay accurate. Guards the dispatch cap."""
    key = jax.random.PRNGKey(0)
    B, T, H, N = 2, 256, 4, 64
    ks = jax.random.split(key, 6)
    bf = jnp.bfloat16
    r = (jax.random.normal(ks[0], (B, T, H, N)) * 0.7).astype(bf)
    k = (jax.random.normal(ks[1], (B, T, H, N)) * 0.04).astype(bf)
    v = (jax.random.normal(ks[2], (B, T, H, N)) * 0.8).astype(bf)
    kk = jax.random.normal(ks[3], (B, T, H, N))
    kk = (kk / jnp.linalg.norm(kk, axis=-1, keepdims=True)).astype(bf)
    a = (-kk).astype(bf)
    b = (kk * 0.5).astype(bf)  # sigmoid(a0=0) = 0.5 everywhere (init regime)
    w = jax.random.uniform(ks[5], (B, T, H, N), minval=-7.0, maxval=-0.5).astype(bf)

    from visualrwkv_tpu.ops.wkv7 import wkv7_reference
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas

    y_ref, s_ref = wkv7_reference(*(x.astype(jnp.float32) for x in (r, w, k, v, a, b)))
    for chunk in (16, 32):
        y, s = wkv7_pallas(r, w, k, v, a, b, chunk=chunk)
        assert np.isfinite(np.asarray(y, np.float32)).all(), chunk
        assert rel_err(y.astype(jnp.float32), y_ref) < 0.05, chunk
        assert rel_err(s, s_ref) < 0.05, chunk


def test_dispatch_chunk_is_capped():
    """The auto dispatcher must not select chunks > 16: 32 NaN'd real training
    after one optimizer step (see tests/test_wkv7_stability.py, which also
    asserts the cap behaviorally)."""
    import importlib
    import inspect

    mod = importlib.import_module("visualrwkv_tpu.ops.wkv7")
    src = inspect.getsource(mod.wkv7)
    assert "(16, 8, 4)" in src


def test_step_kernel_matches_jnp_step():
    """Fused decode-step kernel (interpret mode on CPU) vs the jnp step."""
    from visualrwkv_tpu.ops.wkv7 import wkv7_step
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_step_pallas

    B, H, N = 2, 3, 16
    r, w, k, v, a, b = (x[:, 0] for x in make_inputs(jax.random.PRNGKey(2), B=B, T=1, H=H, N=N))
    st = jax.random.normal(jax.random.PRNGKey(3), (B, H, N, N), jnp.float32)
    s_ref, y_ref = wkv7_step(st, r, w, k, v, a, b)
    s_pal, y_pal = wkv7_step_pallas(st, r, w, k, v, a, b)
    assert rel_err(s_pal, s_ref) < 1e-6
    assert rel_err(y_pal, y_ref) < 1e-6


def test_flat_step_kernel_matches_head_step():
    """Fused lane-flat decode-step kernel (one-hot MXU reductions) vs the
    canonical head-layout jnp step; fp32 and bf16 carries."""
    from visualrwkv_tpu.ops.wkv7 import state_from_flat, state_to_flat, wkv7_step
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_step_flat_pallas

    B, H, N = 3, 4, 16  # B=3 exercises the Gb fallback (4 -> 1)
    r, w, k, v, a, b = (
        x[:, 0] for x in make_inputs(jax.random.PRNGKey(6), B=B, T=1, H=H, N=N)
    )
    st = jax.random.normal(jax.random.PRNGKey(7), (B, H, N, N), jnp.float32)
    s_ref, y_ref = wkv7_step(st, r, w, k, v, a, b)
    s_pal, y_pal = wkv7_step_flat_pallas(state_to_flat(st), r, w, k, v, a, b)
    assert s_pal.shape == (B, N, H * N)
    assert rel_err(state_from_flat(s_pal, H), s_ref) < 1e-6
    assert rel_err(y_pal, y_ref) < 1e-6
    # bf16 carry: dtype preserved, math fp32 (rounding-level error only)
    s16, y16 = wkv7_step_flat_pallas(
        state_to_flat(st).astype(jnp.bfloat16), r.astype(jnp.bfloat16),
        w, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
    )
    assert s16.dtype == jnp.bfloat16
    assert rel_err(y16.astype(jnp.float32), y_ref) < 2e-2


def test_wkv6_step_kernel_matches_jnp_step():
    from visualrwkv_tpu.ops.wkv6 import wkv6_step
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_step_pallas

    B, H, N = 2, 3, 16
    r, w, k, v, _, _ = (x[:, 0] for x in make_inputs(jax.random.PRNGKey(4), B=B, T=1, H=H, N=N))
    u = jax.random.normal(jax.random.PRNGKey(5), (H, N), jnp.float32) * 0.3
    st = jax.random.normal(jax.random.PRNGKey(6), (B, H, N, N), jnp.float32)
    s_ref, y_ref = wkv6_step(st, r, w, k, v, u)
    s_pal, y_pal = wkv6_step_pallas(st, r, w, k, v, u)
    assert rel_err(s_pal, s_ref) < 1e-6
    assert rel_err(y_pal, y_ref) < 1e-6


@pytest.mark.parametrize("t_block,g_heads", [(64, 2), (128, 4)])
@pytest.mark.slow
def test_pallas_v2_matches_reference(t_block, g_heads):
    """Chunk-batched v2 forward (interpret mode on CPU) vs the golden scan."""
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_v2

    inputs = make_inputs(jax.random.PRNGKey(3), B=2, T=256, H=4, N=16)
    s0 = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 16, 16), jnp.float32)
    y_ref, s_ref = wkv7_reference(*inputs, initial_state=s0)
    y_v2, s_v2 = wkv7_pallas_v2(*inputs, initial_state=s0, chunk=32,
                                t_block=t_block, g_heads=g_heads)
    assert rel_err(y_v2, y_ref) < 1e-5
    assert rel_err(s_v2, s_ref) < 1e-5


def test_packed_matches_head_layout():
    """Packed-lane forward (head pairs on the 128-lane minor) must be
    BIT-identical to the head-layout kernel: same per-head math, only the
    HBM stream layout differs."""
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_packed

    inputs = make_inputs(jax.random.PRNGKey(11), B=2, T=64, H=4, N=64)
    inputs = tuple(x.astype(jnp.bfloat16) for x in inputs)
    s0 = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 64, 64), jnp.float32) * 0.1
    y0, sf0 = wkv7_pallas(*inputs, initial_state=s0, chunk=16)
    y1, sf1 = wkv7_pallas_packed(*inputs, initial_state=s0, chunk=16)
    assert np.array_equal(
        np.asarray(y0, np.float32), np.asarray(y1, np.float32)
    )
    assert np.array_equal(np.asarray(sf0), np.asarray(sf1))

    y_ref, s_ref = wkv7_reference(*(x.astype(jnp.float32) for x in inputs), initial_state=s0)
    assert rel_err(y1.astype(jnp.float32), y_ref) < 5e-3
    assert rel_err(sf1, s_ref) < 5e-3


def test_packed_rejects_odd_heads():
    from visualrwkv_tpu.ops.wkv7_pallas import wkv7_pallas_packed

    inputs = make_inputs(jax.random.PRNGKey(13), B=1, T=32, H=3, N=64)
    with pytest.raises(ValueError, match="even head count"):
        wkv7_pallas_packed(*inputs, chunk=16)


@pytest.mark.slow
def test_packed_fwd_res_and_bwd_match_head_layout():
    """Packed residual-forward and backward must match the head-layout pair
    bit-for-bit (same math, different stream layout)."""
    from visualrwkv_tpu.ops.wkv7_pallas import (
        wkv7_pallas_bwd,
        wkv7_pallas_bwd_packed,
        wkv7_pallas_fwd_res,
        wkv7_pallas_fwd_res_packed,
    )

    inputs = make_inputs(jax.random.PRNGKey(14), B=2, T=64, H=4, N=64)
    inputs = tuple(x.astype(jnp.bfloat16) for x in inputs)
    s0 = jax.random.normal(jax.random.PRNGKey(15), (2, 4, 64, 64), jnp.float32) * 0.1
    y0, sf0, zin0 = wkv7_pallas_fwd_res(*inputs, initial_state=s0, chunk=16)
    y1, sf1, zin1 = wkv7_pallas_fwd_res_packed(*inputs, initial_state=s0, chunk=16)
    assert np.array_equal(np.asarray(y0, np.float32), np.asarray(y1, np.float32))
    assert np.array_equal(np.asarray(sf0), np.asarray(sf1))

    dy = jax.random.normal(jax.random.PRNGKey(16), y0.shape, jnp.float32).astype(jnp.bfloat16)
    dzf = jax.random.normal(jax.random.PRNGKey(17), s0.shape, jnp.float32)
    g0 = wkv7_pallas_bwd(*inputs, zin0, dy, dzf, chunk=16)
    g1 = wkv7_pallas_bwd_packed(*inputs, zin1, dy, dzf, chunk=16)
    for name, a_, b_ in zip("rwkvab" + "s", g0, g1):
        assert np.array_equal(
            np.asarray(a_, np.float32), np.asarray(b_, np.float32)
        ), f"d{name}"


@pytest.mark.slow
def test_impl_packed_dispatch_matches_pallas():
    """set_wkv_impl("packed") must route wkv7() through the packed pair with
    identical values AND gradients; odd head counts fall back to head layout.
    Slow: packed is opt-in (lost the round-3 A/B, PROGRESS.md) and the fwd
    parity stays fast in test_packed_matches_head_layout."""
    import importlib

    w7 = importlib.import_module("visualrwkv_tpu.ops.wkv7")

    inputs = make_inputs(jax.random.PRNGKey(18), B=1, T=32, H=2, N=64)
    inputs = tuple(x.astype(jnp.bfloat16) for x in inputs)

    def loss(*xs):
        y, s = w7.wkv7(*xs, chunk=16)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s**2)

    outs = {}
    # pin the kernel chunk to 16: the packed kernels have no two-level solve,
    # so bit-exactness with the head layout only holds at equal chunking
    w7.set_wkv_kernel_chunk(16)
    for mode in ("pallas", "packed"):
        w7.set_wkv_impl(mode)
        try:
            outs[mode] = (loss(*inputs), jax.grad(loss, argnums=(0, 2))(*inputs))
        finally:
            w7.set_wkv_impl("auto")
            w7.set_wkv_kernel_chunk(32)
    l0, g0 = outs["pallas"]
    l1, g1 = outs["packed"]
    assert float(l0) == float(l1)
    for a_, b_ in zip(g0, g1):
        assert np.array_equal(np.asarray(a_, np.float32), np.asarray(b_, np.float32))

    # odd heads: packed mode must still work (head-layout fallback)
    odd = tuple(x.astype(jnp.bfloat16) for x in
                make_inputs(jax.random.PRNGKey(19), B=1, T=32, H=3, N=64))
    w7.set_wkv_impl("packed")
    try:
        l_odd = loss(*odd)
    finally:
        w7.set_wkv_impl("auto")
    assert np.isfinite(float(l_odd))


@pytest.mark.parametrize(
    "block", [2, pytest.param(4, marks=pytest.mark.slow)]
)
def test_blocked_kernels_bit_match_block1(block):
    """block>1 packs N chunks per grid step — pure scheduling, so forward,
    fwd_res (incl. the thinned checkpoint stream) and every backward gradient
    must be BIT-identical to block=1 (stability envelope stays that of the
    chunk length; docs/wkv_chunk_stability.md)."""
    from visualrwkv_tpu.ops.wkv7_pallas import (
        wkv7_pallas_bwd,
        wkv7_pallas_fwd_res,
    )

    inputs = make_inputs(jax.random.PRNGKey(3), B=2, T=128, H=2, N=16)
    inputs = tuple(x.astype(jnp.bfloat16) for x in inputs)
    y1, s1 = wkv7_pallas(*inputs, chunk=16, block=1)
    y2, s2 = wkv7_pallas(*inputs, chunk=16, block=block)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    yr1, sr1, zin1 = wkv7_pallas_fwd_res(*inputs, chunk=16, block=1)
    yr2, sr2, zin2 = wkv7_pallas_fwd_res(*inputs, chunk=16, block=block)
    np.testing.assert_array_equal(np.asarray(yr1), np.asarray(yr2))
    # the checkpoint stream is DENSE (one state per chunk) at any block
    assert zin2.shape == zin1.shape
    np.testing.assert_array_equal(np.asarray(zin1), np.asarray(zin2))

    dy = jax.random.normal(jax.random.PRNGKey(9), y1.shape, jnp.float32).astype(y1.dtype)
    dzf = jax.random.normal(jax.random.PRNGKey(10), s1.shape, jnp.float32)
    g1 = wkv7_pallas_bwd(*inputs, zin1, dy, dzf, chunk=16, block=1)
    g2 = wkv7_pallas_bwd(*inputs, zin2, dy, dzf, chunk=16, block=block)
    for name, a, b in zip("rwkvabs", g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"d{name}")


def test_dispatcher_block_selection():
    """set_wkv_block picks the largest feasible factor; T not divisible by
    chunk*block falls back to smaller factors / block=1."""
    import importlib

    # ops/__init__ re-exports the wkv7 FUNCTION, which shadows the module
    # under plain `import ... as`; fetch the module itself
    w7mod = importlib.import_module("visualrwkv_tpu.ops.wkv7")

    inputs = make_inputs(jax.random.PRNGKey(4), B=1, T=48, H=2, N=16)
    w7mod.set_wkv_impl("pallas")
    w7mod.set_wkv_block(4)
    try:
        # T=48, chunk 16 -> nc=3: block 4 and 2 don't divide, falls to 1
        y_blk, s_blk = w7mod.wkv7(*inputs, chunk=16)
        w7mod.set_wkv_block(1)
        y_1, s_1 = w7mod.wkv7(*inputs, chunk=16)
        np.testing.assert_array_equal(np.asarray(y_blk), np.asarray(y_1))

        # T=128 -> nc=8: block 4 applies; still bit-identical
        inputs2 = make_inputs(jax.random.PRNGKey(5), B=1, T=128, H=2, N=16)
        w7mod.set_wkv_block(4)
        y4, _ = w7mod.wkv7(*inputs2, chunk=16)
        w7mod.set_wkv_block(1)
        y1, _ = w7mod.wkv7(*inputs2, chunk=16)
        np.testing.assert_array_equal(np.asarray(y4), np.asarray(y1))
    finally:
        w7mod.set_wkv_impl("auto")
        w7mod.set_wkv_block(1)
