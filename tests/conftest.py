import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
# without TPU hardware; the real-TPU path is exercised by bench.py).
# Set the env var (not just the config) so that boxtree_tpu.config's
# env-restoration logic agrees.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import boxtree_tpu  # noqa: E402, F401  (enables x64)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    # The full suite compiles hundreds of XLA CPU executables; without
    # freeing them the CPU compiler has been observed to segfault late in
    # the run.  Dropping caches between modules keeps the process lean.
    yield
    jax.clear_caches()
    gc.collect()
