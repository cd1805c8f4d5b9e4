"""Driver-artifact contract tests (VERDICT r2 item 1).

The round-2 official record was two rc=124 artifacts caused by the axon
remote-TPU plugin dialing a dead tunnel. These tests lock the fixes:
- bench.wait_for_tpu emits ONE parseable JSON error line before raising;
- dryrun_multichip's re-exec child env has every axon guard var cleared
  (so /root/.axon_site/sitecustomize.py never registers the plugin) and the
  re-exec happens unconditionally without touching jax backends in the parent.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_ROOT, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_tunnel_down_emits_parseable_json(monkeypatch, capsys):
    bench = _load("bench_under_test", "bench.py")

    def fail(*a, **k):
        raise subprocess.CalledProcessError(1, a[0])

    monkeypatch.setattr(bench.subprocess, "run", fail)
    with pytest.raises(RuntimeError, match="tunnel unavailable"):
        bench.wait_for_tpu(max_wait_s=0.0, interval_s=0.0)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["error"] == "tpu_tunnel_down"
    assert rec["value"] is None
    assert "waited_s" in rec and "metric" in rec


def test_bench_max_wait_env_tunable(monkeypatch):
    bench = _load("bench_under_test2", "bench.py")
    monkeypatch.setenv("BENCH_MAX_WAIT_S", "0")

    def fail(*a, **k):
        raise subprocess.CalledProcessError(1, a[0])

    monkeypatch.setattr(bench.subprocess, "run", fail)
    with pytest.raises(RuntimeError):
        bench.wait_for_tpu(interval_s=0.0)  # default path reads the env var


def test_dryrun_child_env_is_axon_free(monkeypatch):
    graft = _load("graft_under_test", "__graft_entry__.py")
    captured = {}

    class FakeProc:
        returncode = 0

    def fake_run(cmd, env=None, cwd=None, **k):
        captured["cmd"], captured["env"], captured["cwd"] = cmd, env, cwd
        return FakeProc()

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("AXON_LOOPBACK_RELAY", "1")
    monkeypatch.delenv("_VRWKV_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    graft.dryrun_multichip(8)

    env = captured["env"]
    for var in ("PALLAS_AXON_POOL_IPS", "AXON_POOL_SVC_OVERRIDE",
                "AXON_LOOPBACK_RELAY", "PALLAS_AXON_REMOTE_COMPILE",
                "TPU_WORKER_HOSTNAMES"):
        assert var not in env, var
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_VRWKV_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert captured["cwd"] == _ROOT
    # child code must force the CPU platform before touching any backend
    assert "jax.config.update('jax_platforms', 'cpu')" in captured["cmd"][-1]


def test_dryrun_reexec_fails_loudly_on_child_error(monkeypatch):
    graft = _load("graft_under_test2", "__graft_entry__.py")

    class FakeProc:
        returncode = 3

    monkeypatch.delenv("_VRWKV_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeProc())
    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(4)


def test_bench_vision_suite_smoke():
    """measure_vision_suite (the driver's BENCH_TTFT leg) flows end to end on
    a tiny triple-tower config: device resize -> encode -> scatter -> prefill
    -> argmax first token at 336 AND 448px, plus the batched encode leg."""
    bench = _load("bench_under_test3", "bench.py")
    graft = _load("graft_for_cfg", "__graft_entry__.py")
    cfg = graft._tiny_vlm_cfg(triple=True)
    out = bench.measure_vision_suite(cfg=cfg, reps=2, drop=0, enc_batch=2,
                                     enc_reps=1)
    for k in ("ttft_p50_ms_336px", "ttft_p50_ms_448px",
              "images_per_sec_encode_448"):
        assert k in out and out[k] > 0, (k, out)


def test_bench_train_step_flow_tiny():
    """bench.measure_train_step_0b4 end-to-end on a tiny CPU config (the
    driver runs the real 0B4 geometry on the chip; this locks the flow)."""
    import bench

    v = bench.measure_train_step_0b4(
        x=1, rounds=1, n_layer=1, n_embd=64, micro_bsz=1, accum=2, T=32,
        vocab_size=512,  # flow-only: the 65536 head dominated CPU compile
    )
    assert v > 0


def test_bench_leg_subprocess_roundtrip(monkeypatch):
    """Each bench leg runs in a FRESH process (round-4 BENCH had three legs
    die RESOURCE_EXHAUSTED from in-process HBM residue). The fake-leg hook
    exercises the real child spawn + tagged-JSON parse path."""
    bench = _load("bench_leg_rt", "bench.py")
    monkeypatch.setenv("BENCH_FAKE_LEG_JSON", '{"spec_speedup_B1": 1.2}')
    out, err = bench._spawn_leg("spec_decode", timeout_s=120.0)
    assert err is None
    assert out == {"spec_speedup_B1": 1.2}


def test_bench_leg_subprocess_crash_is_contained(monkeypatch):
    """A leg dying by signal (the OOM/SIGABRT shape) must come back as an
    error string, not an exception — the headline line must survive."""
    bench = _load("bench_leg_crash", "bench.py")
    monkeypatch.setenv("BENCH_FAKE_LEG_JSON", "{}")
    monkeypatch.setenv("BENCH_FAKE_LEG_SIGNAL", "6")  # SIGABRT
    out, err = bench._spawn_leg("decode", timeout_s=120.0)
    assert out is None
    assert "rc=-6" in err


def test_bench_1b5_leg_retries_then_falls_back(monkeypatch, capsys):
    """The HBM-edge 1B5 leg gets one fresh-subprocess retry, then the
    documented half-T fallback leg; the record must carry BOTH the full
    geometry's error and the fallback's numeric key (2026-08-20 runtime
    regression: the full geometry fits with ~300 MB slack and can fail
    nondeterministically)."""
    bench = _load("bench_leg_retry", "bench.py")
    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")
    calls = []

    def fake_spawn(name, timeout_s):
        calls.append(name)
        if name == "decode":
            return {"metric": bench.METRIC, "value": 7000.0,
                    "unit": "tokens/s/chip", "vs_baseline": 3.5,
                    "extra": {}}, None
        if name == "train_tok_per_s_1B5_bf16sr":
            return None, "rc=1: RESOURCE_EXHAUSTED"
        if name == "train_tok_per_s_1B5_bf16sr_T1024":
            return {"train_tok_per_s_1B5_bf16sr_T1024": 9000.0}, None
        return 1.0, None

    monkeypatch.setattr(bench, "_spawn_leg", fake_spawn)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls.count("train_tok_per_s_1B5_bf16sr") == 2  # initial + retry
    assert calls.count("train_tok_per_s_1B5_bf16sr_T1024") == 1
    assert "RESOURCE_EXHAUSTED" in rec["extra"]["train_tok_per_s_1B5_bf16sr_error"]
    assert rec["extra"]["train_tok_per_s_1B5_bf16sr_T1024"] == 9000.0


def test_bench_main_merges_and_prints_one_line(monkeypatch, capsys):
    """bench.py main() orchestrates subprocess legs and still prints exactly
    ONE JSON line with the headline metric key."""
    bench = _load("bench_leg_main", "bench.py")
    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")

    def fake_spawn(name, timeout_s):
        if name == "decode":
            return {"metric": bench.METRIC, "value": 7000.0,
                    "unit": "tokens/s/chip", "vs_baseline": 3.5,
                    "extra": {}}, None
        if name == "vision":
            return {"ttft_p50_ms_336px": 100.0}, None
        if name == "spec_decode":
            return None, "rc=-6: boom"
        return 123.0, None

    monkeypatch.setattr(bench, "_spawn_leg", fake_spawn)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == bench.METRIC and rec["value"] == 7000.0
    assert rec["extra"]["ttft_p50_ms_336px"] == 100.0
    assert rec["extra"]["spec_decode_error"] == "rc=-6: boom"
    assert rec["extra"]["train_tok_per_s_1B5_bf16sr"] == 123.0
    assert "bench_total_s" in rec["extra"]


def test_bench_headline_failure_still_parseable(monkeypatch, capsys):
    """If even the headline decode leg dies, main() must emit one parseable
    line carrying the SAME metric key plus the error."""
    bench = _load("bench_leg_headfail", "bench.py")
    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")
    monkeypatch.setattr(bench, "_spawn_leg", lambda n, t: (None, "rc=-9: oom"))
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["metric"] == bench.METRIC and rec["value"] is None
    assert rec["error"] == "rc=-9: oom"
    for name in bench._LEG_ENV:
        assert f"{name}_error" in rec["extra"]


def test_dryrun_signal_death_wipes_cache_and_retries(monkeypatch, tmp_path):
    """A child SIGABRT (poisoned AOT cache shape) triggers ONE wipe+retry."""
    graft = _load("graft_retry", "__graft_entry__.py")
    from visualrwkv_tpu.utils import jax_cache

    calls = {"run": 0, "wiped": []}

    class FakeProc:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(cmd, env=None, cwd=None, **k):
        calls["run"] += 1
        return FakeProc(-6 if calls["run"] == 1 else 0)

    monkeypatch.delenv("_VRWKV_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        jax_cache, "_run_canary", lambda d, t: 0
    )
    # route the cache dir into tmp so the wipe cannot touch the real cache
    import visualrwkv_tpu.utils.jax_cache as jc
    monkeypatch.setattr(
        jc, "machine_cache_dir", lambda root=None: str(tmp_path)
    )
    monkeypatch.setattr(
        jc, "wipe_cache_dir", lambda d: calls["wiped"].append(d)
    )
    graft.dryrun_multichip(8)
    assert calls["run"] == 2
    assert calls["wiped"] == [str(tmp_path)]
