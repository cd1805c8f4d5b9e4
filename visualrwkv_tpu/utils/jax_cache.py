"""Machine-keyed persistent XLA compilation-cache directory.

The XLA:CPU persistent cache stores AOT-compiled executables whose code is
specialized to the *compiling* host's CPU features. JAX's cache key does NOT
include those features, so a cache written on one machine is silently loaded
on another: `cpu_aot_loader` logs per-entry "machine feature ... not
supported on the host machine" errors and compilation can crash outright
(observed: SIGABRT inside ``CpuCompiler::RunHloPasses`` when a round-4 CI
box was swapped for one without several AVX-512 extensions, with the
previous box's cache on the shared disk).

Fix: key the cache *directory* by a fingerprint of the host's CPU flags, so
each distinct machine gets its own warm cache and never loads another
machine's code. Import-light on purpose (no jax import) — tests/conftest.py
calls this before configuring jax.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    """Stable per-microarchitecture tag: hash of the CPU flag set (+ model
    name + ISA), NOT of hostname — identical replacement boxes share a
    warm cache, feature-different ones never collide."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break_after = line.startswith(("flags", "Features"))
                    if break_after:
                        break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def machine_cache_dir(repo_root: str | None = None) -> str:
    """``<repo>/.jax_cache/m-<cpu-fingerprint>`` (created if absent)."""
    if repo_root is None:
        repo_root = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir, os.pardir)
        )
    d = os.path.join(repo_root, ".jax_cache", "m-" + _cpu_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d
