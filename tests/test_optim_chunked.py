"""Row-chunked big-leaf updates in PartitionedOptimizer.

The chunked path exists because the whole-leaf fp32 update of a 268-536 MB
embedding/head leaf (~5 fp32 copies; 2.6 GB measured at 1B5 via compiled
memory_analysis) stopped fitting next to the grad program's arena when the
serving runtime began keeping both executables' temp arenas resident
(2026-08-20). It must compute the SAME per-element math as the unchunked
group path — EMA moments bitwise equal, parameters within one stochastic
rounding step — across multiple steps (schedule counts must tick
identically). Reference stake: the optimizer math is the analog of the
reference's DeepSpeed Adam config (v7.00/src/trainer.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import TrainConfig
from visualrwkv_tpu.train.optim import PartitionedOptimizer


def _mk(cfg, params, chunk_leaf_bytes, monkeypatch):
    monkeypatch.setattr(
        PartitionedOptimizer, "_CHUNK_LEAF_BYTES", chunk_leaf_bytes
    )
    monkeypatch.setattr(
        PartitionedOptimizer, "_CHUNK_TARGET_BYTES", 1024
    )
    return PartitionedOptimizer(
        cfg, params, total_steps=10, n_layer=2,
        max_partition_bytes=2048,
    )


@pytest.fixture
def setup():
    cfg = TrainConfig(
        optim_precision="bf16_sr", param_dtype="bfloat16", grad_clip=1.0,
        lr_init=1e-2, lr_final=1e-3, warmup_steps=2, weight_decay=0.01,
        epoch_steps=10, epoch_count=1,
    )
    k = jax.random.PRNGKey(0)
    params = {
        "rwkv": {
            "emb": {"weight": jax.random.normal(k, (64, 32), jnp.bfloat16)},
            "head": {"weight": jax.random.normal(
                jax.random.fold_in(k, 1), (8, 8), jnp.bfloat16)},
        }
    }
    grads = jax.tree.map(
        lambda p: jax.random.normal(
            jax.random.fold_in(k, 2), p.shape, p.dtype) * 0.1,
        params,
    )
    return cfg, params, grads


def test_chunked_leaf_matches_unchunked_group(setup, monkeypatch):
    cfg, params, grads = setup
    # the 4 KiB emb leaf chunks in A (threshold 1 KiB), stays whole in B
    opt_a = _mk(cfg, params, 1024, monkeypatch)
    opt_b = _mk(cfg, params, 1 << 40, monkeypatch)
    assert opt_a._chunked and not opt_b._chunked
    # multi-row chunking actually engaged
    (k_chunks, wd_on), = opt_a._chunked.values()
    assert k_chunks >= 2 and wd_on

    pa, pb = params, params
    sa, sb = opt_a.init(params), opt_b.init(params)
    step = jnp.zeros((), jnp.int32)
    for s in range(3):
        pa, sa = opt_a.update_and_apply(grads, sa, pa, step + s)
        pb, sb = opt_b.update_and_apply(grads, sb, pb, step + s)
        # moments are SR-free fp32 math cast to bf16: bitwise equal
        emb_a = next(st for st in sa if hasattr(st, "mu"))
        np.testing.assert_array_equal(
            np.asarray(emb_a.mu, np.float32),
            _emb_moments(opt_b, sb, params, "mu"),
        )
        np.testing.assert_array_equal(
            np.asarray(emb_a.nu, np.float32),
            _emb_moments(opt_b, sb, params, "nu"),
        )
        # params: at step 0 the fp32 pre-rounding values are identical, so
        # the two paths differ only by which SR neighbor was taken (<= 1
        # bf16 ulp). Later steps compound that first divergence through
        # wd*p and p32+u, so only a loose closeness claim holds.
        a = np.asarray(pa["rwkv"]["emb"]["weight"], np.float32)
        b = np.asarray(pb["rwkv"]["emb"]["weight"], np.float32)
        if s == 0:
            ulp = np.maximum(np.abs(b) * 2.0 ** -7, 2.0 ** -133)
            assert np.all(np.abs(a - b) <= ulp), (
                f"step {s}: max diff {np.abs(a - b).max()}"
            )
        else:
            np.testing.assert_allclose(a, b, rtol=0.1, atol=0.05)
        # the non-chunked (head) leaf must be bitwise identical
        np.testing.assert_array_equal(
            np.asarray(pa["rwkv"]["head"]["weight"], np.float32),
            np.asarray(pb["rwkv"]["head"]["weight"], np.float32),
        )


def _emb_moments(opt_b, sb, params, which):
    """Extract the emb leaf's moment tensor from the optax group state
    (mu flattens before nu in the scale_by_adam_lowmem state)."""
    leaves = [
        x for x in jax.tree_util.tree_leaves(sb)
        if hasattr(x, "shape") and x.shape == (64, 32)
        and x.dtype == jnp.bfloat16
    ]
    assert len(leaves) == 2, "expected exactly mu and nu for the emb leaf"
    return np.asarray(leaves[0 if which == "mu" else 1], np.float32)


def test_chunked_state_resumes(setup, monkeypatch):
    """A chunked group's state round-trips through flatten/unflatten (what
    orbax checkpointing does) and keeps stepping."""
    cfg, params, grads = setup
    opt = _mk(cfg, params, 1024, monkeypatch)
    st = opt.init(params)
    p1, st1 = opt.update_and_apply(grads, st, params, jnp.zeros((), jnp.int32))
    flat, treedef = jax.tree_util.tree_flatten(st1)
    st1b = jax.tree_util.tree_unflatten(treedef, flat)
    p2, st2 = opt.update_and_apply(grads, st1b, p1, jnp.ones((), jnp.int32))
    assert jnp.isfinite(
        np.asarray(p2["rwkv"]["emb"]["weight"], np.float32)
    ).all()
    emb = next(s for s in st2 if hasattr(s, "sched_count"))
    assert int(emb.sched_count) == 2 and int(emb.count) == 2
