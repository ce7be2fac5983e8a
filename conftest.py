import os

# Tests run the multi-device sharding paths on a virtual 8-device CPU mesh
# (real TPU hardware is exercised by bench.py / __graft_entry__.py).
# Note: the environment's sitecustomize registers the TPU PJRT plugin at
# interpreter start, so the platform must be overridden via jax.config.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
