"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers an experimental single-chip TPU backend
("axon") whenever PALLAS_AXON_POOL_IPS is set; tests instead run on a virtual
8-device CPU platform so multi-chip sharding (DP/TP/EP amax sync, pjit train
steps) is exercised without hardware. This must happen before jax is imported.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (sitecustomize imports jax eagerly; backends are lazy)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    """A 2x4 (data, tensor) mesh over the 8 virtual CPU devices."""
    import numpy as np
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "tensor"))
