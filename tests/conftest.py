"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py; unit/integration tests use the
CPU backend with 8 virtual devices so sharding paths are covered without
chips (SURVEY.md §4 note on multi-host testing).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
