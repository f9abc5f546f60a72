"""Test config: force CPU with an 8-device virtual mesh.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a remote TPU tunnel), so env vars set here are too late —
use jax.config.update, which takes effect until the backend initializes.
Multi-device tests then run anywhere (the reference has no multi-device tests
at all; SURVEY.md §4).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# This machine has a single CPU core; persist compiled executables so repeated
# pytest runs don't pay XLA compile time again.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
