"""The persistent-cache directory must be keyed by host CPU features.

Loading another machine's XLA:CPU AOT cache entries is not just slow — it
crashed compilation outright (SIGABRT in CpuCompiler::RunHloPasses) when the
round-4 CI box was swapped for one with a different AVX-512 feature set; see
visualrwkv_tpu/utils/jax_cache.py."""

import os

from visualrwkv_tpu.utils.jax_cache import _cpu_fingerprint, machine_cache_dir


def test_fingerprint_stable_and_short():
    a, b = _cpu_fingerprint(), _cpu_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex


def test_machine_cache_dir_layout(tmp_path):
    d = machine_cache_dir(str(tmp_path))
    assert os.path.isdir(d)
    assert os.path.dirname(d) == str(tmp_path / ".jax_cache")
    assert os.path.basename(d) == "m-" + _cpu_fingerprint()
    # idempotent
    assert machine_cache_dir(str(tmp_path)) == d


def test_conftest_uses_machine_keyed_dir():
    import jax

    cfg_dir = jax.config.jax_compilation_cache_dir
    assert cfg_dir and os.path.basename(cfg_dir).startswith("m-")
