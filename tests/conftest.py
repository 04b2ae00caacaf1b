"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags BEFORE jax initializes (SURVEY.md §4: multi-device tests
via xla_force_host_platform_device_count, no real TPU needed).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-CPU-compile-bound (tiny tensors, big graphs); backend
# optimization passes only speed up execution we don't need. Level 0 cuts
# wall-clock roughly in half with identical semantics (no fast-math).
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU through the config
# API so tests run on the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is XLA-compile-bound on one CPU
# core (~17 min cold); cached re-runs roughly halve it. The cache works on
# the CPU backend (unlike the axon remote AOT compiler). Default location
# is <repo>/.jax_test_cache (gitignored); override via JAX_TEST_CACHE_DIR.
_cache = os.environ.get("JAX_TEST_CACHE_DIR",
                        os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_test_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
