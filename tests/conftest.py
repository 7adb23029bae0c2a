"""Test configuration: CPU backend with 8 virtual devices.

SURVEY.md §4: all tests run on the XLA CPU backend (config 1 is required
to be CPU-runnable); distribution tests use 8 fake host-platform devices;
Pallas kernels run under interpret mode on CPU.
"""

import os

# must be set before jax is imported anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def judged_code():
    from tpu_ldpc.codes import LdpcCode

    return LdpcCode.judged()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
