"""Test config: run everything on a virtual 8-device CPU mesh.

This simulates a v5e-8 topology without TPU hardware (SURVEY.md §4's
implication section): XLA_FLAGS host device count must be set before jax
initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's TPU plugin (sitecustomize) force-sets
# jax_platforms="axon,cpu" at import time, overriding the env var — pin it
# back so the suite really runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
