"""Test configuration: CPU backend with 8 virtual devices.

SURVEY.md §4: all tests run on the XLA CPU backend (config 1 is required
to be CPU-runnable); distribution tests use 8 fake host-platform devices;
Pallas kernels run under interpret mode on CPU.
"""

import os

# XLA_FLAGS must be set before the CPU backend initializes
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# this environment force-registers a TPU ("axon") PJRT plugin via
# sitecustomize and prepends it to jax_platforms; override it so tests
# run on the CPU backend with 8 virtual devices regardless
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def judged_code():
    from tpu_ldpc.codes import LdpcCode

    return LdpcCode.judged()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
