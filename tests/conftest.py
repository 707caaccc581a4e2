"""Test configuration: run everything on a fake 8-device CPU mesh.

Multi-device sharding tests exercise halo exchange / psum-CG on virtual CPU
devices (SURVEY.md §4 point 3) — no TPU pod needed.

NOTE: on this image the axon TPU plugin ignores ``JAX_PLATFORMS``; forcing
CPU requires ``JAX_PLATFORM_NAME`` *and* ``jax.config.update('jax_platforms')``.
"""

import os

# Must be set before jax initializes.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
