"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the real-chip path is covered by bench.py /
__graft_entry__.py on the driver side).
"""

import os

# Must be set before jax initializes. Force (not setdefault): the driver
# environment pre-sets JAX_PLATFORMS=axon (the real-TPU tunnel), but tests
# run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import random  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The driver image's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already in the environment, which bakes the platform
# into jax.config before this conftest runs — override via config too.
try:  # noqa: SIM105
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
except Exception:  # noqa: BLE001
    pass


@pytest.fixture(scope="session")
def corpus():
    from tests.corpus import make_corpus
    return make_corpus()


@pytest.fixture()
def rng():
    return random.Random(1234)
