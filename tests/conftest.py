"""Test config: run everything on a virtual 8-device CPU mesh.

This simulates a v5e-8 topology without TPU hardware (SURVEY.md §4's
implication section): XLA_FLAGS host device count must be set before jax
initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The suite gets its OWN persistent compile cache, separate from the
# pipeline's ~/.cache/deflicker_tpu/xla: (a) warm reruns drop from ~19 min
# of fresh CPU compiles to minutes; (b) a cache write into the shared dir
# (which accumulates TPU + cross-machine AOT entries across rounds)
# segfaulted two full runs in round 5 (faulthandler trace into
# compilation_cache.put_executable_and_time) — the dedicated dir isolates
# the suite from that state.  DEFLICKER_NO_COMPILE_CACHE=1 still disables
# caching entirely.
if (os.environ.get("DEFLICKER_NO_COMPILE_CACHE") != "1"
        and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.expanduser("~"), ".cache", "deflicker_tpu", "xla_tests")
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
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
