"""Test configuration: run everything on a fake 8-device CPU mesh.

Multi-device sharding tests exercise halo exchange / psum-CG on virtual CPU
devices (SURVEY.md §4 point 3) — no TPU pod needed.
"""

import os

# Must be set before jax initializes.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
