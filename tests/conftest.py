import os

# Virtual 8-device CPU mesh for sharding tests; must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def ref_data():
    if not REF_DATA.exists():
        pytest.skip("reference test_data not available")
    return REF_DATA
