"""Test rig: 8 virtual CPU devices so mesh/sharding/collective logic is
exercised without a TPU pod — the JAX analog of the reference's
localhost multi-process cluster simulation (run_dist.sh / dist_mode=1;
SURVEY.md §4 item 3).

Must set the env BEFORE jax initializes a backend, hence module level.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize registers that backend at interpreter start, so the env var
# alone is not enough — jax.config must be updated before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tf_repos_tpu.config import Config  # noqa: E402


@pytest.fixture
def tiny_cfg() -> Config:
    return Config(
        feature_size=200,
        field_size=13,
        embedding_size=8,
        deep_layers="16,8",
        dropout="0.5,0.5",
        batch_size=32,
        learning_rate=0.01,
    )


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
