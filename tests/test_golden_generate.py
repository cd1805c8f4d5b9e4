"""Generate-level golden locks across the serving strategy matrix.

The logit goldens (test_golden_logits.py) lock the converter + forward; these
lock the PATHS REAL USERS HIT: greedy token ids produced by the inference
engine for tiny fixed-seed x070 AND x060 models through each serving
configuration — fp32, int8 weight-only, bf16-carried state (s16), lane-flat
state layout, and the continuous-batching server. A sampling/state-layout/
quantization regression changes the emitted ids and trips the lock even when
per-token logits stay within test tolerances.

Reference protocol analog: app/modeling_rwkv.py:1007-1046 (strategy-driven
generate) + app/app_gpu.py:48-101 (serving entry).

Regenerate after an INTENTIONAL numerics change with:
    python tests/test_golden_generate.py --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "generate_ids.npz")

PROMPT = np.array([[11, 22, 33, 44, 55, 66, 77, 88]], np.int32)
N_NEW = 12
PATHS = ("fp32", "int8", "s16", "flat", "server")


def _build(version: str):
    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params

    cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=4096, head_size=32,
                        compute_dtype="float32", ctx_len=128, version=version),
        vision=VisionConfig(towers=()),
        proj_type="linear",
        num_token_per_image=4,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(4321), cfg)
    # randomize zero-init leaves so every projection is load-bearing
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(17), len(leaves))
    leaves = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ]
    return cfg, jax.tree_util.tree_unflatten(treedef, leaves)


def _generate(cfg, params, path: str):
    from visualrwkv_tpu.infer.engine import InferenceEngine

    kw = {}
    eng_params = params
    if path == "int8":
        from visualrwkv_tpu.infer.quant import quantize_lm_params

        eng_params = dict(params)
        eng_params["rwkv"] = quantize_lm_params(params["rwkv"], min_size=64 * 64)
    elif path == "s16":
        kw["state_dtype"] = "bfloat16"
    elif path == "flat":
        kw["state_layout"] = "flat"
    engine = InferenceEngine(eng_params, cfg, **kw)
    if path == "server":
        from visualrwkv_tpu.infer.server import BatchedServer

        server = BatchedServer(engine, max_batch=2, stop_tokens=(-1,))
        server.submit(PROMPT[0].tolist(), max_new_tokens=N_NEW)
        server.submit(PROMPT[0][::-1].tolist(), max_new_tokens=N_NEW)
        outs = server.run()
        return np.asarray(outs[0], np.int32)
    res = engine.generate(PROMPT, max_new_tokens=N_NEW, stop_tokens=(-1,))
    return np.asarray(res.tokens[0][:N_NEW], np.int32)


def _compute_all():
    out = {}
    for version in ("x070", "x060"):
        cfg, params = _build(version)
        for path in PATHS:
            out[f"{version}_{path}"] = _generate(cfg, params, path)
    return out


@pytest.fixture(scope="module")
def goldens():
    assert os.path.exists(GOLDEN), (
        f"missing {GOLDEN}; regenerate with python {__file__} --regen"
    )
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("version", ("x070", "x060"))
@pytest.mark.parametrize("path", PATHS)
def test_generate_ids_match_golden(goldens, version, path):
    cfg, params = _build(version)
    got = _generate(cfg, params, path)
    key = f"{version}_{path}"
    np.testing.assert_array_equal(got, goldens[key], err_msg=key)


def test_paths_are_distinctly_exercised(goldens):
    """Sanity on the fixture itself: the fp32/flat/server paths agree (same
    numerics, different plumbing) and every golden is a full-length row."""
    for version in ("x070", "x060"):
        base = goldens[f"{version}_fp32"]
        assert base.shape == (N_NEW,)
        np.testing.assert_array_equal(goldens[f"{version}_flat"], base)
        np.testing.assert_array_equal(goldens[f"{version}_server"], base)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        vals = _compute_all()
        np.savez(GOLDEN, **vals)
        print(f"wrote {GOLDEN}:")
        for k, v in vals.items():
            print(f"  {k}: {v.tolist()}")
    else:
        print(__doc__)
