"""Test configuration: force the CPU backend (the sandbox's sitecustomize
registers the axon TPU plugin and pins JAX_PLATFORMS=axon at interpreter
startup, so plain env vars are too late) with an 8-device virtual mesh, and
enable x64 so oracle comparisons run in double precision."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import margin_tpu as _mt  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  (_mt.JAX_CACHE_DIR or "/tmp/margin_tpu_jax_cache")
                  + "_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE, *parts)
