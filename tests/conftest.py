import os

# Virtual 8-device CPU mesh for sharding tests; must be set before jax import.
# NOTE: the axon TPU sitecustomize force-registers the TPU platform via
# jax.config (overriding the JAX_PLATFORMS env var), and running unit tests
# through the TPU tunnel is slow and contends for the chip grant - so override
# the config back to cpu here, before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

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
