"""SPMD partitioning of the WKV ops (ops.wkv7.wkv_spmd / set_wkv_spmd).

The recurrence is independent per (batch, head); under a declared mesh the
dispatchers shard_map the kernel with batch on the data axis and heads on the
model (tensor-parallel) axis — zero collectives. These tests validate that the
wrapped dispatch is numerically identical (fwd + grads) to the unwrapped path
on the 8-device virtual CPU mesh, including non-divisible-shape fallback.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_wkv7 import make_inputs, rel_err
from visualrwkv_tpu.parallel.mesh import make_mesh

wkv7_mod = importlib.import_module("visualrwkv_tpu.ops.wkv7")
wkv6_mod = importlib.import_module("visualrwkv_tpu.ops.wkv6")


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_wkv7_spmd_matches_reference(mesh_shape):
    n_data, n_model = mesh_shape
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    inputs = make_inputs(jax.random.PRNGKey(0), B=8, T=64, H=4, N=16)
    y_ref, s_ref = wkv7_mod.wkv7_reference(*inputs)
    with wkv7_mod.wkv_spmd(mesh):
        y, s = jax.jit(wkv7_mod.wkv7)(*inputs)
    assert rel_err(y, y_ref) < 1e-5
    assert rel_err(s, s_ref) < 1e-5


@pytest.mark.slow
def test_wkv7_spmd_gradients_match_unwrapped():
    mesh = make_mesh(n_data=4, n_model=2)
    inputs = make_inputs(jax.random.PRNGKey(1), B=4, T=64, H=4, N=16)

    def loss(*args):
        y, s = wkv7_mod.wkv7(*args)
        return jnp.sum(y * y) + jnp.sum(s * s)

    g_plain = jax.grad(loss, argnums=tuple(range(6)))(*inputs)
    with wkv7_mod.wkv_spmd(mesh):
        g_spmd = jax.jit(jax.grad(loss, argnums=tuple(range(6))))(*inputs)
    for gp, gs in zip(g_plain, g_spmd):
        assert rel_err(gs, gp) < 1e-5


@pytest.mark.slow
def test_wkv7_spmd_initial_state_grad():
    mesh = make_mesh(n_data=2, n_model=2)
    B, H, N = 2, 4, 16
    inputs = make_inputs(jax.random.PRNGKey(2), B=B, T=32, H=H, N=N)
    s0 = jax.random.normal(jax.random.PRNGKey(3), (B, H, N, N), jnp.float32)

    def loss(s0):
        y, s = wkv7_mod.wkv7(*inputs, initial_state=s0)
        return jnp.sum(y * y) + jnp.sum(s * s)

    g_plain = jax.grad(loss)(s0)
    with wkv7_mod.wkv_spmd(mesh):
        g_spmd = jax.jit(jax.grad(loss))(s0)
    assert rel_err(g_spmd, g_plain) < 1e-5


@pytest.mark.slow
def test_wkv6_spmd_matches_reference():
    mesh = make_mesh(n_data=4, n_model=2)
    r, w, k, v, _, _ = make_inputs(jax.random.PRNGKey(4), B=4, T=64, H=4, N=16)
    u = jax.random.normal(jax.random.PRNGKey(5), (4, 16), jnp.float32) * 0.3
    y_ref, s_ref = wkv6_mod.wkv6_reference(r, w, k, v, u)

    def loss(r, w, k, v, u):
        y, s = wkv6_mod.wkv6(r, w, k, v, u)
        return jnp.sum(y * y) + jnp.sum(s * s)

    g_plain = jax.grad(loss, argnums=(0, 2, 3, 4))(r, w, k, v, u)
    with wkv7_mod.wkv_spmd(mesh):
        y, s = jax.jit(wkv6_mod.wkv6)(r, w, k, v, u)
        g_spmd = jax.jit(jax.grad(loss, argnums=(0, 2, 3, 4)))(r, w, k, v, u)
    assert rel_err(y, y_ref) < 1e-5
    assert rel_err(s, s_ref) < 1e-5
    for gp, gs in zip(g_plain, g_spmd):
        assert rel_err(gs, gp) < 1e-5


def test_spmd_fallback_on_indivisible_shapes():
    # H=3 does not divide the model axis; dispatch must fall back (and match).
    mesh = make_mesh(n_data=4, n_model=2)
    inputs = make_inputs(jax.random.PRNGKey(6), B=4, T=32, H=3, N=16)
    y_ref, s_ref = wkv7_mod.wkv7_reference(*inputs)
    with wkv7_mod.wkv_spmd(mesh):
        y, s = jax.jit(wkv7_mod.wkv7)(*inputs)
    assert rel_err(y, y_ref) < 1e-5
    assert rel_err(s, s_ref) < 1e-5


def test_spmd_scope_restores():
    mesh = make_mesh(n_data=8, n_model=1)
    assert wkv7_mod._WKV_SPMD is None
    with wkv7_mod.wkv_spmd(mesh):
        assert wkv7_mod._WKV_SPMD is not None
    assert wkv7_mod._WKV_SPMD is None


# ---------------------------------------------------------------------------
# Sequence (context) parallelism: ops.wkv_sp
# ---------------------------------------------------------------------------


def _seq_mesh(n_seq=8):
    return make_mesh(n_data=1, n_model=1, n_seq=n_seq)


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_wkv7_seq_parallel_matches_reference(n_seq):
    """T sharded over the seq axis: per-shard outputs + replicated final
    state must match the single-device recurrence exactly."""
    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.ops.wkv_sp import wkv7_seq_shard

    mesh = _seq_mesh(n_seq)
    inputs = make_inputs(jax.random.PRNGKey(0), B=2, T=128, H=4, N=16)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 16, 16), jnp.float32)
    y_ref, s_ref = wkv7_mod.wkv7_reference(*inputs, initial_state=s0)

    xs = P(None, "seq", None, None)
    f = jax.jit(jax.shard_map(
        lambda *a: wkv7_seq_shard(*a, chunk=16),
        mesh=mesh, in_specs=(xs,) * 6 + (P(),), out_specs=(xs, P()),
    ))
    y, s = f(*inputs, s0)
    assert rel_err(y, y_ref) < 1e-5
    assert rel_err(s, s_ref) < 1e-5


def test_wkv6_seq_parallel_matches_reference():
    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.ops.wkv_sp import wkv6_seq_shard

    mesh = _seq_mesh(4)
    r, w, k, v, _, _ = make_inputs(jax.random.PRNGKey(1), B=2, T=64, H=2, N=16)
    u = jax.random.normal(jax.random.PRNGKey(5), (2, 16)) * 0.3
    y_ref, s_ref = wkv6_mod.wkv6_reference(r, w, k, v, u)

    xs = P(None, "seq", None, None)
    f = jax.jit(jax.shard_map(
        lambda *a: wkv6_seq_shard(*a, chunk=16),
        mesh=mesh, in_specs=(xs,) * 4 + (P(),), out_specs=(xs, P()),
    ))
    y, s = f(r, w, k, v, u)
    assert rel_err(y, y_ref) < 1e-5
    assert rel_err(s, s_ref) < 1e-5


@pytest.mark.slow
def test_wkv7_seq_parallel_gradients_match():
    """Gradients flow through the ring scan (3 local op calls + ppermute):
    input grads under seq sharding match the single-device op."""
    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.ops.wkv_sp import wkv7_seq_shard

    mesh = _seq_mesh(4)
    inputs = make_inputs(jax.random.PRNGKey(2), B=2, T=64, H=2, N=16)

    def loss_ref(args):
        y, s = wkv7_mod.wkv7_chunked(*args, chunk=16)
        return (y.astype(jnp.float32) ** 2).sum() + (
            s.astype(jnp.float32) ** 2).sum()

    xs = P(None, "seq", None, None)
    smapped = jax.shard_map(
        lambda *a: wkv7_seq_shard(*a, chunk=16),
        mesh=mesh, in_specs=(xs,) * 6, out_specs=(xs, P()),
    )

    def loss_sp(args):
        y, s = smapped(*args)
        return (y.astype(jnp.float32) ** 2).sum() + (
            s.astype(jnp.float32) ** 2).sum()

    g_ref = jax.jit(jax.grad(loss_ref))(inputs)
    g_sp = jax.jit(jax.grad(loss_sp))(inputs)
    for i, (a, b) in enumerate(zip(g_sp, g_ref)):
        assert rel_err(a, b) < 1e-4, (i, rel_err(a, b))


@pytest.mark.parametrize(
    "grad_cp", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_rwkv7_forward_seq_matches_full(grad_cp):
    """Model-level context parallelism: logits of the seq-sharded forward
    (token-shift halos + WKV ring) match the single-device forward."""
    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models import rwkv7

    cfg = RWKVConfig(n_layer=2, n_embd=64, vocab_size=512, head_size=16,
                     compute_dtype="float32", ctx_len=64, chunk_len=16)
    params = rwkv7.init_rwkv7_params(jax.random.PRNGKey(0), cfg)
    mesh = _seq_mesh(4)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 500)
    x = rwkv7.embed(params, tokens)

    logits_ref, _ = rwkv7.rwkv7_forward(params, cfg, x, grad_cp=grad_cp)

    f = jax.jit(jax.shard_map(
        lambda p, xx: rwkv7.rwkv7_forward_seq(p, cfg, xx, grad_cp=grad_cp),
        mesh=mesh, in_specs=(P(), P(None, "seq", None)),
        out_specs=P(None, "seq", None),
    ))
    logits = f(params, x)
    assert rel_err(logits, logits_ref) < 1e-5


def test_rwkv6_forward_seq_matches_full():
    """x060 model-level context parallelism: logits of the seq-sharded
    forward (token-shift halos + WKV6 ring via the wkv_seq_axis dispatch in
    ops.wkv6.wkv6) match the single-device forward."""
    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models import rwkv6

    cfg = RWKVConfig(version="x060", n_layer=2, n_embd=64, vocab_size=512,
                     head_size=16, compute_dtype="float32", ctx_len=64,
                     chunk_len=16)
    params = rwkv6.init_rwkv6_params(jax.random.PRNGKey(0), cfg)
    mesh = _seq_mesh(4)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 500)
    x = rwkv6.embed(params, tokens)

    logits_ref, _ = rwkv6.rwkv6_forward(params, cfg, x)

    f = jax.jit(jax.shard_map(
        lambda p, xx: rwkv6.rwkv6_forward_seq(p, cfg, xx),
        mesh=mesh, in_specs=(P(), P(None, "seq", None)),
        out_specs=P(None, "seq", None),
    ))
    logits = f(params, x)
    assert rel_err(logits, logits_ref) < 1e-5


@pytest.mark.slow
def test_rwkv7_forward_seq_gradients_match():
    """Loss gradients through the context-parallel forward (CE psum'd over
    shards) match the single-device forward's."""
    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models import rwkv7

    cfg = RWKVConfig(n_layer=2, n_embd=64, vocab_size=512, head_size=16,
                     compute_dtype="float32", ctx_len=64, chunk_len=16)
    params = rwkv7.init_rwkv7_params(jax.random.PRNGKey(0), cfg)
    mesh = _seq_mesh(4)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 500)

    def loss_ref(p):
        logits, _ = rwkv7.rwkv7_forward_tokens(p, cfg, tokens, grad_cp=True)
        return (jax.nn.log_softmax(logits.astype(jnp.float32)) ** 2).mean()

    def shard_loss(p, toks):
        logits = rwkv7.rwkv7_forward_seq(
            p, cfg, rwkv7.embed(p, toks), grad_cp=True
        )
        # mean over the GLOBAL token axis = psum of shard sums / global count
        val = (jax.nn.log_softmax(logits.astype(jnp.float32)) ** 2).sum()
        n = logits.size * jax.lax.axis_size("seq")
        return jax.lax.psum(val, "seq") / n

    smapped = jax.shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(), P(None, "seq")), out_specs=P(),
    )
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_sp = jax.jit(jax.grad(lambda p: smapped(p, tokens)))(params)

    def check(path, a, b):
        assert rel_err(a, b) < 1e-4, (path, rel_err(a, b))

    jax.tree_util.tree_map_with_path(check, g_sp, g_ref)
