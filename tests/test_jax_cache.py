"""The persistent-cache directory must be keyed by host CPU identity and
fail soft when keying is not enough.

Loading another machine's XLA:CPU AOT cache entries is not just slow — it
crashed compilation outright (SIGABRT in CpuCompiler::RunHloPasses) when the
round-4 CI box was swapped for one with a different AVX-512 feature set, and
the round-4 flag-based fingerprint still admitted entries compiled with
LLVM pseudo-features (+prefer-no-gather/+prefer-no-scatter) derived from
microcode/errata rather than cpuinfo flags; see
visualrwkv_tpu/utils/jax_cache.py.
"""

import os

import pytest

from visualrwkv_tpu.utils import jax_cache
from visualrwkv_tpu.utils.jax_cache import (
    _cpu_fingerprint,
    ensure_validated,
    machine_cache_dir,
    wipe_cache_dir,
)


def test_fingerprint_stable_and_short():
    a, b = _cpu_fingerprint(), _cpu_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex


def test_fingerprint_covers_microcode_and_errata(tmp_path, monkeypatch):
    """Two hosts identical except in microcode revision or the CPU-bug list
    (what LLVM derives prefer-no-gather/-scatter from) must not share a
    cache directory."""
    base = (
        "processor : 0\n"
        "model name : Fake CPU 9000\n"
        "cpu family : 6\n"
        "model : 143\n"
        "stepping : 8\n"
        "microcode : 0x2b000571\n"
        "cpu MHz : 2400.0\n"
        "flags : fpu avx avx2 avx512f\n"
        "bugs : spectre_v1 spectre_v2\n"
    )
    variants = {
        "microcode": base.replace("0x2b000571", "0x2b0005c0"),
        "bugs": base.replace(
            "spectre_v1 spectre_v2", "spectre_v1 spectre_v2 gather_data_sampling"
        ),
        "stepping": base.replace("stepping : 8", "stepping : 9"),
        "flags": base.replace("avx512f", "avx512f avx512vl"),
    }

    def fake_read(text):
        p = tmp_path / "cpuinfo"
        p.write_text(text)

        real_open = open

        def _open(path, *a, **k):
            if path == "/proc/cpuinfo":
                return real_open(p, *a, **k)
            return real_open(path, *a, **k)

        return _open

    import builtins

    monkeypatch.setattr(builtins, "open", fake_read(base))
    fp_base = _cpu_fingerprint()
    for name, text in variants.items():
        monkeypatch.setattr(builtins, "open", fake_read(text))
        assert _cpu_fingerprint() != fp_base, f"{name} change must re-key"
    # volatile lines must NOT re-key (warm cache survives reboots)
    monkeypatch.setattr(
        builtins, "open", fake_read(base.replace("2400.0", "1200.0"))
    )
    assert _cpu_fingerprint() == fp_base


def test_fingerprint_exotic_arch_fallback(tmp_path, monkeypatch):
    """Hosts whose cpuinfo has none of the x86/ARM identity keys (ppc64le,
    s390x) must still be distinguished by the remaining content."""
    a = "processor : 0\ncpu : POWER9\nclock : 2166.000000MHz\nrevision : 2.2\n"
    b = a.replace("POWER9", "POWER10")
    import builtins

    real_open = open

    def opener(text):
        p = tmp_path / "cpuinfo"
        p.write_text(text)
        return lambda path, *x, **k: real_open(
            p if path == "/proc/cpuinfo" else path, *x, **k
        )

    monkeypatch.setattr(builtins, "open", opener(a))
    fp_a = _cpu_fingerprint()
    monkeypatch.setattr(builtins, "open", opener(b))
    assert _cpu_fingerprint() != fp_a


def test_machine_cache_dir_layout(tmp_path):
    d = machine_cache_dir(str(tmp_path))
    assert os.path.isdir(d)
    assert os.path.dirname(d) == str(tmp_path / ".jax_cache")
    assert os.path.basename(d) == "m-" + _cpu_fingerprint()
    # idempotent
    assert machine_cache_dir(str(tmp_path)) == d


def test_conftest_uses_machine_keyed_dir():
    import jax

    if os.environ.get("VISUALRWKV_TEST_CACHE_DIR"):
        pytest.skip("cache dir explicitly overridden for this run")
    cfg_dir = jax.config.jax_compilation_cache_dir
    assert cfg_dir and os.path.basename(cfg_dir).startswith("m-")


def test_ensure_validated_wipes_poisoned_dir(tmp_path):
    """Feature-mismatch simulation: the canary dies with a signal (as a
    SIGILL from foreign AOT code would) while the dir holds entries; the
    dir must be wiped and revalidated, and the stamp must short-circuit
    subsequent calls."""
    d = str(tmp_path)
    poisoned = tmp_path / "xla_cache_entry_deadbeef"
    poisoned.write_bytes(b"\x7fELF not for this machine")
    calls = []

    def fake_canary(cache_dir, timeout):
        calls.append(os.listdir(cache_dir))
        # dies by signal while the poisoned entry is present, succeeds after
        return -4 if os.path.exists(poisoned) else 0

    out = ensure_validated(d, _canary=fake_canary)
    assert out == d
    assert not poisoned.exists(), "poisoned entry must be wiped"
    assert len(calls) == 2  # failed once, passed after wipe
    assert os.path.exists(os.path.join(d, jax_cache._STAMP))
    # stamped: no more canary runs
    ensure_validated(d, _canary=fake_canary)
    assert len(calls) == 2


def test_ensure_validated_leaves_dir_usable_on_persistent_failure(tmp_path):
    """If even an empty dir fails the canary (not a poisoning problem), the
    dir is returned unstamped rather than blocking the caller."""
    d = str(tmp_path)
    (tmp_path / "entry").write_bytes(b"x")
    out = ensure_validated(d, _canary=lambda *a: -6)
    assert out == d
    assert not os.path.exists(os.path.join(d, jax_cache._STAMP))


def test_real_canary_roundtrip(tmp_path):
    """The actual canary subprocess compiles+loads through a fresh dir."""
    d = str(tmp_path)
    out = ensure_validated(d, timeout=300.0)
    assert os.path.exists(os.path.join(d, jax_cache._STAMP))
    assert out == d
