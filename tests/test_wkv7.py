"""WKV7 kernel parity tests (methodology after the reference's v6.xx/test_kernel.py:
fp32 sequential recurrence as golden, chunked implementations compared via relative
RMS error on outputs and all input gradients; plus initial-state gradient flow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.ops import wkv7_chunked, wkv7_reference, wkv7_step


def make_inputs(key, B=2, T=64, H=3, N=16, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    shape = (B, T, H, N)
    r = jax.random.normal(ks[0], shape, dtype)
    # w_raw soft-clamped to <= -0.5 as in the model (decay in [0.545, 1))
    w = -0.5 - jax.nn.softplus(-jax.random.normal(ks[1], shape, dtype))
    k = jax.random.normal(ks[2], shape, dtype)
    v = jax.random.normal(ks[3], shape, dtype)
    kk = jax.random.normal(ks[4], shape, dtype)
    kk = kk / jnp.linalg.norm(kk.reshape(B, T, H, N), axis=-1, keepdims=True)
    alpha = jax.nn.sigmoid(jax.random.normal(ks[5], shape, dtype))
    a = -kk
    b = kk * alpha
    return r, w, k, v, a, b


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


@pytest.mark.parametrize("chunk", [16, 32])
def test_chunked_matches_reference_fwd(chunk):
    inputs = make_inputs(jax.random.PRNGKey(0))
    y_ref, s_ref = wkv7_reference(*inputs)
    y_chk, s_chk = wkv7_chunked(*inputs, chunk=chunk)
    assert rel_err(y_chk, y_ref) < 1e-5
    assert rel_err(s_chk, s_ref) < 1e-5


def test_chunked_with_initial_state():
    key = jax.random.PRNGKey(1)
    inputs = make_inputs(key, B=1, T=32, H=2, N=8)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 8, 8), jnp.float32)
    y_ref, s_ref = wkv7_reference(*inputs, initial_state=s0)
    y_chk, s_chk = wkv7_chunked(*inputs, initial_state=s0, chunk=16)
    assert rel_err(y_chk, y_ref) < 1e-5
    assert rel_err(s_chk, s_ref) < 1e-5


def test_state_chaining_equals_full_sequence():
    """Running two halves with state passing == running the full sequence."""
    inputs = make_inputs(jax.random.PRNGKey(2), B=1, T=64, H=2, N=8)
    y_full, s_full = wkv7_chunked(*inputs, chunk=16)
    first = tuple(x[:, :32] for x in inputs)
    second = tuple(x[:, 32:] for x in inputs)
    y1, s1 = wkv7_chunked(*first, chunk=16)
    y2, s2 = wkv7_chunked(*second, initial_state=s1, chunk=16)
    assert rel_err(jnp.concatenate([y1, y2], axis=1), y_full) < 1e-5
    assert rel_err(s2, s_full) < 1e-5


def test_step_matches_reference():
    inputs = make_inputs(jax.random.PRNGKey(3), B=1, T=8, H=2, N=8)
    y_ref, s_ref = wkv7_reference(*inputs)
    state = jnp.zeros((1, 2, 8, 8), jnp.float32)
    ys = []
    for t in range(8):
        step_in = tuple(x[:, t] for x in inputs)
        state, y = wkv7_step(state, *step_in)
        ys.append(y)
    ys = jnp.stack(ys, axis=1)
    assert rel_err(ys, y_ref) < 1e-6
    assert rel_err(state, s_ref) < 1e-6


def test_gradients_match_reference():
    inputs = make_inputs(jax.random.PRNGKey(4), B=1, T=32, H=2, N=8)

    def loss_ref(*args):
        y, s = wkv7_reference(*args)
        return (y**2).sum() + (s**2).sum()

    def loss_chk(*args):
        y, s = wkv7_chunked(*args, chunk=16)
        return (y**2).sum() + (s**2).sum()

    grads_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*inputs)
    grads_chk = jax.grad(loss_chk, argnums=tuple(range(6)))(*inputs)
    for name, gr, gc in zip("rwkvab", grads_ref, grads_chk):
        assert rel_err(gc, gr) < 1e-4, f"grad mismatch for {name}"


def test_gradient_flows_through_initial_state():
    """State-tuning / image-as-state requires d loss / d initial_state."""
    inputs = make_inputs(jax.random.PRNGKey(5), B=1, T=16, H=2, N=8)
    s0 = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 8, 8), jnp.float32)

    def loss(fn, s):
        y, _ = fn(*inputs, initial_state=s)
        return (y**2).sum()

    g_ref = jax.grad(lambda s: loss(wkv7_reference, s))(s0)
    g_chk = jax.grad(lambda s: loss(wkv7_chunked, s))(s0)
    assert rel_err(g_chk, g_ref) < 1e-4
    assert float(jnp.abs(g_chk).max()) > 0


def test_bf16_inputs_fp32_state():
    inputs = make_inputs(jax.random.PRNGKey(8), dtype=jnp.float32)
    bf = tuple(x.astype(jnp.bfloat16) for x in inputs)
    y_ref, s_ref = wkv7_reference(*inputs)
    y_chk, s_chk = wkv7_chunked(*bf, chunk=16)
    assert y_chk.dtype == jnp.bfloat16
    assert s_chk.dtype == jnp.float32
    assert rel_err(y_chk.astype(jnp.float32), y_ref) < 0.03


def test_step_flat_matches_step():
    """Lane-flat decode state layout ([B, Nv, H*Nk], no 64->128 TPU lane
    padding) must compute the same update/output as the canonical step."""
    from visualrwkv_tpu.ops.wkv7 import (
        state_from_flat,
        state_to_flat,
        wkv7_step,
        wkv7_step_flat,
    )

    B, H, N = 3, 4, 16
    key = jax.random.PRNGKey(5)
    r, w, k, v, a, b = (x[:, 0] for x in make_inputs(key, B=B, T=1, H=H, N=N))
    s0 = jax.random.normal(jax.random.PRNGKey(9), (B, H, N, N), jnp.float32)
    s_ref, y_ref = wkv7_step(s0, r, w, k, v, a, b)
    s_flat, y_flat = wkv7_step_flat(state_to_flat(s0), r, w, k, v, a, b)
    assert s_flat.shape == (B, N, H * N)
    assert rel_err(y_flat, y_ref) < 1e-6
    assert rel_err(state_from_flat(s_flat, H), s_ref) < 1e-6
    # bf16 carry preserved
    s16, _ = wkv7_step_flat(state_to_flat(s0).astype(jnp.bfloat16), r, w, k, v, a, b)
    assert s16.dtype == jnp.bfloat16

    # dispatch: 3-D state routes to the flat step
    from visualrwkv_tpu.ops.wkv7 import wkv7_step_auto

    s_auto, y_auto = wkv7_step_auto(state_to_flat(s0), r, w, k, v, a, b)
    assert rel_err(y_auto, y_ref) < 1e-6
