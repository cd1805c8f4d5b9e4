"""Round-5 MFU A/B runner: each config in its OWN subprocess with a hard
timeout (the 2026-08-20 in-process run hung >35 min on the tunnel with no
output; a fresh process per config bounds the blast radius the same way
bench.py's per-leg subprocesses do).

Configs target the two profiler-identified levers from round5_profile.py
(852.4 ms/step self-time composition at 0B4 B2a4):
- ce_chunk_t 128->512: the fp32 [C,vocab] head-wgrad accumulator is
  re-read/written every CE chunk (convolution_add_fusion.13: 51.1 ms/step,
  6.0%, x64); 512 quarters the accumulator traffic.
- grad_cp "wkv": the remat re-forward runs wkv7_pallas_fwd_res TWICE
  (2 x ~44.5 ms/step self-time); saving WKV outputs skips one.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/r5_ab_runner.py
"""

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time
import bench
kw = json.loads(sys.argv[1])
t0 = time.time()
v = bench.measure_train_step_0b4(**kw)
print(json.dumps({"tok_s": v, "wall_s": round(time.time() - t0, 1)}), flush=True)
"""

CONFIGS = [
    ("base_gcTrue_ce128", dict(grad_cp=True, ce_chunk_t=128)),
    ("ce512", dict(grad_cp=True, ce_chunk_t=512)),
    ("wkv_remat_ce128", dict(grad_cp="wkv", ce_chunk_t=128)),
    ("wkv_remat_ce512", dict(grad_cp="wkv", ce_chunk_t=512)),
]


def main() -> None:
    common = dict(x=12, rounds=2)
    results = {}
    for tag, kw in CONFIGS:
        kw = {**common, **kw}
        print(f"[{time.strftime('%H:%M:%S')}] start {tag} {kw}", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, json.dumps(kw)],
                timeout=1500, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and line:
                results[tag] = json.loads(line[-1])
                print(f"[{time.strftime('%H:%M:%S')}] {tag}: "
                      f"{results[tag]['tok_s']} tok/s "
                      f"({time.time()-t0:.0f}s)", flush=True)
            else:
                results[tag] = {"error": f"rc={p.returncode}",
                                "tail": (p.stderr or p.stdout)[-500:]}
                print(f"[{time.strftime('%H:%M:%S')}] {tag} FAILED rc="
                      f"{p.returncode}\n{(p.stderr or '')[-500:]}", flush=True)
        except subprocess.TimeoutExpired:
            results[tag] = {"error": "timeout_1500s"}
            print(f"[{time.strftime('%H:%M:%S')}] {tag} TIMEOUT", flush=True)
    print("== SUMMARY ==", flush=True)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
