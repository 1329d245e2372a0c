"""Test configuration: run everything on a virtual 8-device CPU mesh.

Only one physical TPU chip exists on this machine (SURVEY.md §2.4), so all
multi-device (data-parallel / halo-exchange) paths are validated on CPU with
``xla_force_host_platform_device_count=8``. This must happen before jax is
imported anywhere.
"""

import os

# NOTE: this machine ships with JAX_PLATFORMS=axon pre-set; plain env override
# before import is not honored, so we also force it via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI mains call utils.enable_compilation_cache(); empty string = explicitly
# disabled, so in-process CLI tests don't write persistent cache files.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
