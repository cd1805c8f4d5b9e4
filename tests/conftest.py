"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated against XLA's host-platform device emulation instead (the same
compiled collectives, different backend).

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin in every interpreter and forces ``jax_platforms=axon``; the config
update below must run before any backend is touched to keep tests on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# silence the benign per-load cpu_aot_loader "machine feature" E-logs the
# persistent compilation cache triggers (see the cache note below); Python
# exceptions still surface real failures
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated on the
# 1-core CI box (~200 jitted programs), so executables are cached on disk
# keyed by HLO — the first run pays full compile, re-runs load AOT results
# (measured: full fast suite 12:00 cold -> ~3x faster warm). Repo-local and
# gitignored; delete .jax_cache/ to force cold compiles. The directory is
# keyed by a CPU-feature fingerprint (utils/jax_cache.py): the AOT code is
# machine-specific and loading another machine's cache crashed XLA when the
# CI box was swapped mid-round.
from visualrwkv_tpu.utils.jax_cache import (  # noqa: E402
    ensure_validated,
    machine_cache_dir,
)

_repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
# VISUALRWKV_TEST_CACHE_DIR overrides the cache location (cold-run timing
# without touching the warm cache; point it at a scratch dir)
_cache_dir = os.environ.get("VISUALRWKV_TEST_CACHE_DIR") or machine_cache_dir(
    _repo_root
)
jax.config.update("jax_compilation_cache_dir", ensure_validated(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
