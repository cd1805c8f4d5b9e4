"""Round-5 step composition: jax.profiler trace of the 0B4 train step,
attributed per HLO op/category (VERDICT r4 next-4: three composition-backed
negatives earned the profiler; no more guessing).

Captures N steady-state steps of EXACTLY the bench train leg
(bench.measure_train_step_0b4 geometry), parses the trace's device-op
events (vm.trace.json.gz: name, hlo_category, device_duration_ps,
bytes_accessed), and prints:

- a category rollup (WKV kernels / matmul fusions / other fusions / copies /
  reduces / host) with time share and achieved HBM GB/s;
- the top-K individual ops by total time with shapes from long_name;
- derived step time, tok/s, and MFU (bf16 peak 197 TFLOP/s on v5e).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/round5_profile.py \
      [--steps 2] [--out /tmp/r5trace] [--top 30] [--geometry 0B4|1B5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import time


def build_step(geometry: str, ce_chunk_t: int = 128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.train.trainer import Trainer

    n_embd = {"0B4": 1024, "1B5": 2048}[geometry]
    T, micro_bsz, accum = 2048, 2, 4
    vlm_cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=24, n_embd=n_embd, ctx_len=T,
                        vocab_size=65536, version="x070"),
        vision=VisionConfig(towers=()),
    )
    cfg = TrainConfig(
        micro_bsz=micro_bsz, accumulate_grad_batches=accum,
        param_dtype="bfloat16", stacked_layers=(geometry == "0B4"),
        grad_cp=True,
        optim_precision={"0B4": "master_fp32", "1B5": "bf16_sr"}[geometry],
        ce_chunk_t=ce_chunk_t,
        epoch_steps=100, epoch_count=1,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), vlm_cfg)
    tr = Trainer(vlm_cfg, cfg, params, proj_dir="/tmp/r5prof", log_every=10**9)
    del params

    rng = np.random.default_rng(0)
    eff = micro_bsz * accum
    ids = jnp.asarray(rng.integers(0, 65536, (eff, T)), jnp.int32)
    batch = {"input_ids": ids, "labels": ids, "images": None}
    p_, o_, s_ = tr.state.params, tr.state.opt_state, tr.state.step
    step_fn = tr.train_step
    tr.state = None
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(p_)
        if hasattr(x, "shape")
    )
    return step_fn, (p_, o_, s_), batch, eff * T, n_params


_CATS = (
    ("wkv", re.compile(r"wkv|tpu_custom_call|custom-call", re.I)),
    ("matmul", re.compile(r"convolution|dot", re.I)),
    ("copy", re.compile(r"^copy|copy-start|copy-done|all-reduce|reshape", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("dynamic-slice", re.compile(r"dynamic", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
)


def classify(name: str, category: str, long_name: str) -> str:
    txt = f"{name} {category} {long_name[:160]}"
    for tag, pat in _CATS:
        if pat.search(txt):
            return tag
    return "other"


def parse_trace(out_dir: str, n_steps: int, tokens_per_step: int,
                n_params: int, top: int, peak_tflops: float = 197.0):
    runs = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*")))
    trace = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))[0]
    with gzip.open(trace) as f:
        d = json.load(f)
    # SELF time per op: trace events nest (jit program > while loops > ops);
    # walk each thread's events in start order with a stack and subtract
    # child durations from the enclosing parent, so categories sum to the
    # true device-busy time instead of triple-counting loop bodies.
    by_tid = collections.defaultdict(list)
    for e in d.get("traceEvents", []):
        a = e.get("args") or {}
        if e.get("ph") != "X" or "device_duration_ps" not in a:
            continue
        ts = int(a.get("device_offset_ps", int(e.get("ts", 0) * 1e6)))
        dur = int(a["device_duration_ps"])
        by_tid[(e.get("pid"), e.get("tid"))].append((ts, dur, e))

    per_op = collections.defaultdict(lambda: [0.0, 0, 0.0, "", ""])
    total_us = 0.0
    for _, evs in by_tid.items():
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # (end_ps, child_ps_accum_index into selfs)
        selfs = []
        for ts, dur, e in evs:
            while stack and ts >= stack[-1][0]:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] -= dur  # subtract from parent's self
            selfs.append([e, dur])
            stack.append((ts + dur, len(selfs) - 1))
        for e, self_ps in selfs:
            a = e.get("args") or {}
            dur_us = max(0, self_ps) / 1e6
            name = e.get("name", "?")
            rec = per_op[name]
            rec[0] += dur_us
            rec[1] += 1
            rec[2] += float(a.get("bytes_accessed", 0) or 0)
            rec[3] = a.get("hlo_category", "?")
            rec[4] = a.get("long_name", "")
            total_us += dur_us

    step_us = total_us / n_steps
    rollup = collections.defaultdict(lambda: [0.0, 0.0])
    for name, (us, n, by, cat, ln) in per_op.items():
        tag = classify(name, cat, ln)
        rollup[tag][0] += us
        rollup[tag][1] += by

    print(f"\n== device time: {step_us/1e3:.2f} ms/step over {n_steps} steps "
          f"({total_us/1e3:.1f} ms total) ==")
    tok_s = tokens_per_step / (step_us / 1e6)
    # fwd+bwd = 6 FLOPs/param/token; full remat re-forward adds ~2
    mfu = 8 * n_params * tok_s / (peak_tflops * 1e12)
    hw_mfu = 6 * n_params * tok_s / (peak_tflops * 1e12)
    print(f"device-only tok/s: {tok_s:,.0f}  "
          f"MFU(8NP remat): {mfu*100:.1f}%  MFU(6NP hw): {hw_mfu*100:.1f}%  "
          f"(N={n_params/1e6:.0f}M params)")
    print("\n-- category rollup --")
    for tag, (us, by) in sorted(rollup.items(), key=lambda kv: -kv[1][0]):
        gbs = by / (us / 1e6) / 1e9 if us else 0.0
        print(f"{tag:>14}: {us/n_steps/1e3:8.2f} ms/step "
              f"{us/total_us*100:5.1f}%   {gbs:7.1f} GB/s")
    print(f"\n-- top {top} ops --")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]
    for name, (us, n, by, cat, ln) in rows:
        shape = ln.split("=", 1)[-1].strip()[:80] if ln else ""
        gbs = by / (us / 1e6) / 1e9 if us else 0.0
        print(f"{us/n_steps/1e3:8.3f} ms {us/total_us*100:5.1f}% x{n//n_steps:<4d}"
              f" {gbs:7.1f} GB/s  {name[:40]:<40} | {cat[:18]:<18} | {shape}")
    return step_us, per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--out", default="/tmp/r5trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--geometry", default="0B4", choices=["0B4", "1B5"])
    ap.add_argument("--ce_chunk", type=int, default=128)
    args = ap.parse_args()

    import jax

    step_fn, (p_, o_, s_), batch, tokens_per_step, n_params = build_step(
        args.geometry, args.ce_chunk
    )
    t0 = time.time()
    for _ in range(args.warmup):
        p_, o_, s_, loss = step_fn(p_, o_, s_, batch)
    print(f"warmup loss={float(loss):.3f} ({time.time()-t0:.1f}s incl compile)")

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        p_, o_, s_, loss = step_fn(p_, o_, s_, batch)
    float(loss)
    jax.profiler.stop_trace()

    parse_trace(args.out, args.steps, tokens_per_step, n_params, args.top)


if __name__ == "__main__":
    main()
