"""Tests: v4 adapter losses, interleave scoring, observability, imagenet eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.evals.imagenet import topk_accuracy
from visualrwkv_tpu.evals.metrics.interleave import (
    evaluate_interleave,
    rouge_l,
    summarize_results,
)
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.multimodal.adapter_v4 import (
    AdapterConfig,
    adapter_pretrain_losses,
    adapter_queries,
    init_adapter_params,
)


@pytest.mark.slow
def test_adapter_losses():
    cfg = RWKVConfig(n_layer=2, n_embd=64, vocab_size=512, head_size=32,
                     compute_dtype="float32")
    acfg = AdapterConfig(num_task_embeddings=8, feature_size=32, n_adapter_layers=1)
    lm_params = lm.init_lm_params(jax.random.PRNGKey(0), cfg)
    params = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg)
    # make adapter cross-attn visible (zero-init outputs otherwise)
    params["blocks"][0]["att"]["output"]["weight"] = (
        jax.random.normal(jax.random.PRNGKey(2), (64, 64)) * 0.1
    )
    vit_feats = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64))
    q = adapter_queries(params, cfg, vit_feats)
    assert q.shape == (2, 8, 64)

    caption = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 1, 500)
    mask = jnp.ones((2, 8), bool)
    total, parts = adapter_pretrain_losses(params, lm_params, cfg, vit_feats, caption, mask)
    assert jnp.isfinite(total)
    for name in ("loss_itc", "loss_itm", "loss_lm"):
        assert jnp.isfinite(parts[name]), name

    # LM stays frozen: grads flow to the adapter, not the LM
    def loss_fn(ap):
        t, _ = adapter_pretrain_losses(ap, lm_params, cfg, vit_feats, caption, mask)
        return t

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["task_embs"]).sum()) > 0


def test_rouge_and_interleave():
    assert rouge_l("the cat sat", "the cat sat") == pytest.approx(1.0)
    assert rouge_l("a dog", "the cat sat") == 0.0
    recs = [
        {"task": "multi-choice", "text": "B", "answer": "B"},
        {"task": "multi-choice", "text": "A", "answer": "B"},
        {"task": "caption", "text": "a cat on a mat", "answer": "a cat sitting on the mat"},
    ]
    m = evaluate_interleave(recs)
    assert m["multi-choice"] == 50.0
    assert 0 < m["caption"] <= 100
    table = summarize_results({"pope": {"f1": 85.0, "n": 100}})
    assert "pope" in table and "85.00" in table


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    m = topk_accuracy(logits, labels, ks=(1, 2))
    assert m["top1"] == 50.0
    assert m["top2"] == 50.0


def test_observability(tmp_path):
    from visualrwkv_tpu.utils.observability import ThroughputMeter, TrainLogWriter

    meter = ThroughputMeter()
    m = meter.step(4, 1024)
    assert m["Ksamples"] == 0.004 and m["token/s"] > 0
    w = TrainLogWriter(str(tmp_path), {"lr": 1e-4})
    w.log_epoch(0, 2.0, 1e-4)
    content = (tmp_path / "train_log.txt").read_text()
    assert "NEW RUN" in content and "2.000000" in content
