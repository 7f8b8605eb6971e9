"""Test environment setup.

Tests run on the CPU backend by default (config 1 "CPU-runnable",
BASELINE.json:7) with 8 virtual devices so the distributed paths
(SURVEY.md §4 "Distributed" row) exercise real shard_map/pjit sharding
without a pod. Set TPUJPEG_TEST_TPU=1 to run on real TPU hardware.
"""

import os

if not os.environ.get("TPUJPEG_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU plugin's sitecustomize forces jax_platforms=axon via
    # jax.config (which beats the JAX_PLATFORMS env var), so the CPU
    # override must also go through jax.config.
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Per-machine CPU cache namespace: XLA:CPU AOT executables embed the
    # compile host's feature set and won't load across rigs.
    import tpujpeg

    tpujpeg.use_cpu_cache_namespace()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)
