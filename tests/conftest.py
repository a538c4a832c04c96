"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py; unit/integration tests use the
CPU backend with 8 virtual devices so sharding paths are covered without
chips (SURVEY.md §4 note on multi-host testing).
"""

import os

# Force CPU for tests. The environment preloads jax (sitecustomize) with
# JAX_PLATFORMS pointed at the TPU tunnel, where (a) every process start
# pays TPU init and (b) f32 matmuls default to bf16 MXU precision, breaking
# unit-test tolerances. Env vars are read at jax import time — too late to
# set here — so use jax.config.update instead. Tests are about semantics,
# not hardware; bench.py exercises the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def loop1_map():
    from slam_tpu.maps import read_map_file
    return read_map_file(f"{REFERENCE_DATA}/example_loop1.mat")


@pytest.fixture(scope="session")
def webmap_map():
    from slam_tpu.maps import read_map_file
    return read_map_file(f"{REFERENCE_DATA}/example_webmap.mat")


@pytest.fixture(scope="session")
def loop1_config():
    from slam_tpu.config import SlamConfig
    return SlamConfig.from_ini(f"{REFERENCE_DATA}/example_loop1.ini")


@pytest.fixture(scope="session")
def webmap_config():
    from slam_tpu.config import SlamConfig
    return SlamConfig.from_ini(f"{REFERENCE_DATA}/example_webmap.ini")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
