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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
