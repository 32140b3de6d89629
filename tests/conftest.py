"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver validates the real
multi-chip path separately via ``__graft_entry__.dryrun_multichip``). The
environment must be set before jax is imported anywhere, so this executes at
conftest import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin registration
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize pre-imports jax at interpreter start with
# JAX_PLATFORMS=axon baked in, so the env vars above are too late for it —
# force the platform through the live config instead (no backend has been
# initialized yet at conftest time).
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2021)


@pytest.fixture(scope="session")
def small_rig():
    from mvdetr_tpu.geometry import make_synthetic_rig

    return make_synthetic_rig(num_cam=3, img_shape=(96, 160), worldgrid_shape=(48, 96))


@pytest.fixture(scope="session")
def wildtrack_like_rig():
    from mvdetr_tpu.geometry import make_wildtrack_like_rig

    return make_wildtrack_like_rig(num_cam=3, img_shape=(96, 160), worldgrid_shape=(48, 96))
