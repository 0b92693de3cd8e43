"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware has a single chip in this environment; multi-chip sharding
is validated on XLA's host-platform virtual devices, the TPU-world stand-in
recommended for CI (SURVEY.md §4).

Note: the environment's TPU plugin forces ``jax_platforms`` programmatically
at interpreter start, so the env var alone is not enough — we override the
config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# persistent compile cache: CPU test compiles dominate suite time
from pose_transfer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
