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
