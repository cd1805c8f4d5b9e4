"""v6.0 left-pad variable image-token-count insertion vs an eager oracle.

The oracle re-implements the reference algorithm literally (per-sample
Python list building, v6.0/src/model.py:487-570): zero-id left pad to the
batch max image position, embedding-level feature insert, head-preferring
ctx_len truncation, right-pad with zero vectors. The vectorized
leftpad_insert must match it exactly on mixed batches.
"""

import numpy as np
import pytest

from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visualrwkv_tpu.multimodal.insertion import (
    LeftpadPlan,
    leftpad_insert,
    leftpad_plan,
)

V, C = 50, 8


def oracle(ids, labels, feats, table, ctx_len):
    """Eager reference-semantics insertion (numpy, per sample)."""
    B, T_in = ids.shape
    L = feats.shape[1]
    has = [(row == IMAGE_TOKEN_INDEX).sum() for row in ids]
    assert all(n <= 1 for n in has)
    max_idx = 0
    for row, n in zip(ids, has):
        if n == 1:
            max_idx = max(max_idx, int(np.where(row == IMAGE_TOKEN_INDEX)[0][0]))
    embs, labs = [], []
    for i in range(B):
        row, lab, f = ids[i], labels[i], feats[i].copy()
        pre_ids = np.zeros(max_idx, dtype=row.dtype)
        pre_lab = np.full(max_idx, IGNORE_INDEX, dtype=lab.dtype)
        if has[i] == 0:
            f[:] = 0.0
            tail_ids, tail_lab = row, lab
        else:
            p = int(np.where(row == IMAGE_TOKEN_INDEX)[0][0])
            if p > 0:
                pre_ids[-p:] = row[:p]
                pre_lab[-p:] = lab[:p]
            tail_ids, tail_lab = row[p + 1 :], lab[p + 1 :]
        e = np.concatenate([table[pre_ids], f, table[tail_ids]], axis=0)
        y = np.concatenate(
            [pre_lab, np.full(L, IGNORE_INDEX, lab.dtype), tail_lab]
        )
        # truncate_input: head-first, tail when the head has no valid labels
        if (y[:ctx_len] != IGNORE_INDEX).any():
            e, y = e[:ctx_len], y[:ctx_len]
        else:
            e, y = e[-ctx_len:], y[-ctx_len:]
        embs.append(e)
        labs.append(y)
    max_len = max(x.shape[0] for x in embs)
    E = np.zeros((B, max_len, C), np.float32)
    Y = np.full((B, max_len), IGNORE_INDEX, labels.dtype)
    for i, (e, y) in enumerate(zip(embs, labs)):
        E[i, : e.shape[0]] = e
        Y[i, : y.shape[0]] = y
    return E, Y, max_idx


def run_both(ids, labels, feats, ctx_len):
    rng = np.random.default_rng(1)
    table = rng.normal(size=(V, C)).astype(np.float32)
    E_ref, Y_ref, max_idx = oracle(ids, labels, feats, table, ctx_len)
    plan = leftpad_plan(ids, feats.shape[1], ctx_len)
    assert plan.max_idx == max_idx
    E, Y, _ = leftpad_insert(table, ids, labels, feats, plan)
    E, Y = np.asarray(E), np.asarray(Y)
    # ours buckets T_out up to a chunk multiple; extra slots must be pure pad
    assert E.shape[1] >= E_ref.shape[1]
    np.testing.assert_allclose(E[:, : E_ref.shape[1]], E_ref, atol=1e-6)
    assert (E[:, E_ref.shape[1] :] == 0).all()
    np.testing.assert_array_equal(Y[:, : Y_ref.shape[1]], Y_ref)
    assert (Y[:, Y_ref.shape[1] :] == IGNORE_INDEX).all()
    return plan


def make_batch(positions, T_in=12, L=5, seed=0):
    """positions: per-sample image-token index or None (no image)."""
    rng = np.random.default_rng(seed)
    B = len(positions)
    ids = rng.integers(1, V, (B, T_in)).astype(np.int64)
    labels = ids.copy()
    labels[:, : T_in // 3] = IGNORE_INDEX  # mask a human-turn prefix
    for i, p in enumerate(positions):
        if p is not None:
            ids[i, p] = IMAGE_TOKEN_INDEX
            labels[i, p] = IGNORE_INDEX
    feats = rng.normal(size=(B, L, C)).astype(np.float32)
    return ids, labels, feats


def test_mixed_positions_match_oracle():
    ids, labels, feats = make_batch([3, 7, None, 0])
    plan = run_both(ids, labels, feats, ctx_len=64)
    assert plan.img_len == 5 and plan.flip_len == 4


def test_truncation_head_keep():
    # raw = max_idx + L + tail > ctx_len, head has valid labels
    ids, labels, feats = make_batch([2, 10], T_in=40, L=16)
    run_both(ids, labels, feats, ctx_len=32)


def test_truncation_tail_keep():
    ids, labels, feats = make_batch([10], T_in=40, L=16)
    # no valid labels in the first ctx_len raw positions -> keep the tail
    labels[0, :30] = IGNORE_INDEX
    run_both(ids, labels, feats, ctx_len=32)


def test_two_images_rejected():
    ids, labels, feats = make_batch([3])
    ids[0, 5] = IMAGE_TOKEN_INDEX
    with pytest.raises(ValueError, match="Too many images"):
        leftpad_plan(ids, feats.shape[1], 64)


@pytest.mark.slow
def test_vlm_forward_leftpad_end_to_end():
    """Leftpad loss path: finite loss + grads through a tiny text-only LM
    with directly-provided image features, under jit with a static plan."""
    import jax
    import jax.numpy as jnp

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.visualrwkv import (
        init_visualrwkv_params,
        training_loss_leftpad,
        vlm_forward_leftpad,
    )

    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=V, head_size=16,
                        ctx_len=64, compute_dtype="float32"),
        vision=VisionConfig(towers=()),
        insertion_mode="leftpad",
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids, labels, feats = make_batch([3, 7, None], T_in=12, L=5, seed=3)
    feats = np.broadcast_to(feats[..., :1], feats.shape[:2] + (64,)).copy()
    plan = leftpad_plan(ids, 5, cfg.rwkv.ctx_len)

    logits, new_labels, _ = vlm_forward_leftpad(
        params, cfg, jnp.asarray(ids), jnp.asarray(labels),
        image_features=jnp.asarray(feats), plan=plan,
    )
    assert logits.shape[:2] == (3, plan.T_out)

    def loss_fn(p):
        return training_loss_leftpad(
            p, cfg, jnp.asarray(ids), jnp.asarray(labels),
            images=None, plan=plan, grad_cp=False,
        )

    # image_features path is required when images is None
    with pytest.raises(ValueError):
        jax.jit(loss_fn)(params)


@pytest.mark.slow
def test_training_loss_leftpad_with_features():
    import jax
    import jax.numpy as jnp

    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.visualrwkv import (
        _dense_ce_l2wrap,
        init_visualrwkv_params,
        vlm_forward_leftpad,
    )

    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=V, head_size=16,
                        ctx_len=64, compute_dtype="float32"),
        vision=VisionConfig(towers=()),
        insertion_mode="leftpad",
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids, labels, feats = make_batch([3, 7, None], T_in=12, L=5, seed=3)
    feats = np.broadcast_to(feats[..., :1], feats.shape[:2] + (64,)).copy()
    plan = leftpad_plan(ids, 5, cfg.rwkv.ctx_len)

    def loss_fn(p, f):
        logits, new_labels, _ = vlm_forward_leftpad(
            p, cfg, jnp.asarray(ids), jnp.asarray(labels),
            image_features=f, plan=plan,
        )
        return _dense_ce_l2wrap(logits, new_labels)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(
        params, jnp.asarray(feats)
    )
    assert np.isfinite(float(loss))
    gf = np.asarray(grads[1])
    assert np.isfinite(gf).all()
    # gradients flow into the inserted features of image-bearing samples only
    assert np.abs(gf[0]).sum() > 0 and np.abs(gf[1]).sum() > 0
    assert np.abs(gf[2]).sum() == 0  # image-free sample: features zeroed


def test_bidirectional_flip_tracks_truncation_offset():
    """Regression: a tail-keep-truncated row's image span sits at output
    slots [max_idx - off, ...); the bidirectional flip must follow it
    (previously the batch-wide max_idx was flipped, reversing text
    embeddings for truncated rows)."""
    import jax.numpy as jnp

    from visualrwkv_tpu.models.visualrwkv import _flip_span

    rng = np.random.default_rng(0)
    table = rng.normal(size=(V, C)).astype(np.float32)
    L, ctx, T_in = 4, 19, 16
    # row 0: raw_len == ctx, head labels valid -> off=0.
    # row 1: early image + long tail whose only valid labels fall beyond the
    # head window -> tail-keep truncation (off > 0), image span survives
    # (off <= max_idx).
    ids = np.full((2, T_in), 7, dtype=np.int64)
    labels = np.full((2, T_in), IGNORE_INDEX, dtype=np.int64)
    ids[0, 10] = IMAGE_TOKEN_INDEX
    labels[0, 11:13] = 5  # head window valid -> off=0
    ids[1, 2] = IMAGE_TOKEN_INDEX
    labels[1, T_in - 2 :] = 5  # raw positions beyond ctx -> head_valid False
    feats = rng.normal(size=(2, L, C)).astype(np.float32)

    plan = leftpad_plan(ids, L, ctx)
    E, Y, off = leftpad_insert(table, ids, labels, feats, plan)
    off = np.asarray(off)
    assert off[0] == 0 and off[1] > 0
    # the features really do sit at max_idx - off per row
    for b in range(2):
        s = plan.max_idx - off[b]
        np.testing.assert_allclose(
            np.asarray(E)[b, s : s + L], feats[b], atol=1e-6
        )
    # per-row flip reverses exactly the image span of each row
    flipped = np.asarray(
        _flip_span(jnp.asarray(E), jnp.asarray(plan.max_idx - off), L)
    )
    for b in range(2):
        s = plan.max_idx - off[b]
        np.testing.assert_allclose(flipped[b, s : s + L], feats[b][::-1], atol=1e-6)
