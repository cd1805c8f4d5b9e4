"""WKV6 kernel parity tests (same methodology as test_wkv7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.ops.wkv6 import wkv6_chunked, wkv6_reference, wkv6_step


def make_inputs(key, B=2, T=64, H=3, N=16):
    ks = jax.random.split(key, 5)
    shape = (B, T, H, N)
    r = jax.random.normal(ks[0], shape)
    w = -0.3 - jax.nn.softplus(-jax.random.normal(ks[1], shape))
    k = jax.random.normal(ks[2], shape)
    v = jax.random.normal(ks[3], shape)
    u = jax.random.normal(ks[4], (H, N))
    return r, w, k, v, u


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


@pytest.mark.parametrize("chunk", [16, 32])
def test_chunked_matches_reference(chunk):
    inputs = make_inputs(jax.random.PRNGKey(0))
    y_ref, s_ref = wkv6_reference(*inputs)
    y_chk, s_chk = wkv6_chunked(*inputs, chunk=chunk)
    assert rel_err(y_chk, y_ref) < 1e-5
    assert rel_err(s_chk, s_ref) < 1e-5


def test_initial_state_and_chaining():
    inputs = make_inputs(jax.random.PRNGKey(1), B=1, T=64, H=2, N=8)
    y_full, s_full = wkv6_chunked(*inputs, chunk=16)
    first = tuple(x[:, :32] for x in inputs[:4]) + (inputs[4],)
    second = tuple(x[:, 32:] for x in inputs[:4]) + (inputs[4],)
    y1, s1 = wkv6_chunked(*first, chunk=16)
    y2, s2 = wkv6_chunked(*second, initial_state=s1, chunk=16)
    assert rel_err(jnp.concatenate([y1, y2], axis=1), y_full) < 1e-5
    assert rel_err(s2, s_full) < 1e-5


def test_step_matches_reference():
    inputs = make_inputs(jax.random.PRNGKey(2), B=1, T=8, H=2, N=8)
    y_ref, s_ref = wkv6_reference(*inputs)
    state = jnp.zeros((1, 2, 8, 8), jnp.float32)
    ys = []
    for t in range(8):
        state, y = wkv6_step(state, *(x[:, t] for x in inputs[:4]), inputs[4])
        ys.append(y)
    assert rel_err(jnp.stack(ys, axis=1), y_ref) < 1e-6
    assert rel_err(state, s_ref) < 1e-6


@pytest.mark.slow
def test_gradients_match_reference():
    inputs = make_inputs(jax.random.PRNGKey(3), B=1, T=32, H=2, N=8)
    s0 = jax.random.normal(jax.random.PRNGKey(9), (1, 2, 8, 8), jnp.float32)

    def loss(fn):
        def inner(*args):
            y, s = fn(*args[:5], initial_state=args[5])
            return (y**2).sum() + (s**2).sum()
        return inner

    g_ref = jax.grad(loss(wkv6_reference), argnums=tuple(range(6)))(*inputs, s0)
    g_chk = jax.grad(loss(wkv6_chunked), argnums=tuple(range(6)))(*inputs, s0)
    for name, gr, gc in zip(["r", "w", "k", "v", "u", "s0"], g_ref, g_chk):
        assert rel_err(gc, gr) < 1e-4, f"grad mismatch for {name}"


def test_pallas_matches_reference():
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas

    inputs = make_inputs(jax.random.PRNGKey(5), B=2, T=64, H=4, N=16)
    y_ref, s_ref = wkv6_reference(*inputs)
    y_pal, s_pal = wkv6_pallas(*inputs, chunk=16)
    assert rel_err(y_pal, y_ref) < 1e-5
    assert rel_err(s_pal, s_ref) < 1e-5
    s0 = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 16, 16), jnp.float32)
    y_ref, s_ref = wkv6_reference(*inputs, initial_state=s0)
    y_pal, s_pal = wkv6_pallas(*inputs, initial_state=s0, chunk=32)
    assert rel_err(y_pal, y_ref) < 1e-5
    assert rel_err(s_pal, s_ref) < 1e-5


@pytest.mark.slow
def test_pallas_backward_matches_autodiff():
    from visualrwkv_tpu.ops.wkv6_pallas import wkv6_pallas_bwd, wkv6_pallas_fwd_res

    inputs = make_inputs(jax.random.PRNGKey(6), B=2, T=64, H=4, N=16)
    s0 = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 16, 16), jnp.float32)
    y, s_fin, zin = wkv6_pallas_fwd_res(*inputs, initial_state=s0, chunk=16)
    dy = jax.random.normal(jax.random.PRNGKey(12), y.shape, jnp.float32)
    dzf = jax.random.normal(jax.random.PRNGKey(13), s_fin.shape, jnp.float32)

    def loss(*args):
        yy, ss = wkv6_chunked(*args[:5], initial_state=args[5], chunk=16)
        return jnp.sum(yy * dy) + jnp.sum(ss * dzf)

    grads_ref = jax.grad(loss, argnums=tuple(range(6)))(*inputs, s0)
    grads_pal = wkv6_pallas_bwd(*inputs, zin, dy, dzf, chunk=16)
    for name, gr, gp in zip(["r", "w", "k", "v", "u", "s0"], grads_ref, grads_pal):
        assert rel_err(gp, gr) < 1e-5, f"d{name}: {rel_err(gp, gr)}"


def test_step_flat_matches_step():
    """Lane-flat WKV6 decode step parity (see wkv7 analog)."""
    from visualrwkv_tpu.ops.wkv6 import wkv6_step, wkv6_step_auto, wkv6_step_flat
    from visualrwkv_tpu.ops.wkv7 import state_from_flat, state_to_flat

    B, H, N = 3, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    r, k, v = (jax.random.normal(ks[i], (B, H, N)) for i in range(3))
    w = -0.5 - jax.nn.softplus(-jax.random.normal(ks[3], (B, H, N)))
    u = jax.random.normal(ks[4], (H, N)) * 0.3
    s0 = jax.random.normal(jax.random.PRNGKey(8), (B, H, N, N), jnp.float32)
    s_ref, y_ref = wkv6_step(s0, r, w, k, v, u)
    s_flat, y_flat = wkv6_step_flat(state_to_flat(s0), r, w, k, v, u)
    assert np.allclose(np.asarray(y_flat), np.asarray(y_ref), atol=1e-5)
    assert np.allclose(np.asarray(state_from_flat(s_flat, H)), np.asarray(s_ref), atol=1e-5)
    s_auto, y_auto = wkv6_step_auto(state_to_flat(s0), r, w, k, v, u)
    assert np.allclose(np.asarray(y_auto), np.asarray(y_ref), atol=1e-5)
