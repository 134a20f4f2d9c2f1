"""Test harness config: force a virtual 8-device CPU mesh before jax loads.

Sharding/data-parallel paths are tested without TPUs via
``xla_force_host_platform_device_count`` (SURVEY.md §4 recommendation).
This must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is not enough in environments where a TPU PJRT plugin
# (axon) is pre-registered — force the platform through the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mini_coco(tmp_path_factory):
    """A tiny synthetic COCO instance-seg dataset on disk (images + JSON)."""
    from tests.fixtures import make_mini_coco

    root = tmp_path_factory.mktemp("mini_coco")
    return make_mini_coco(root, n_images=6, seed=0)
