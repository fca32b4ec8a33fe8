"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference library's tests run single-process on the host CPU
(/root/reference/meson.build:41-54).  Our equivalent test environment is a
virtual multi-device CPU platform so that every sharding/mesh code path is
exercised without TPU hardware, per the multi-chip test strategy in
SURVEY.md §4.  Real-chip runs happen via bench.py / tools/ on TPU.
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize in this image) force-sets
# jax_platforms="axon,cpu" at interpreter start, overriding the env var —
# override it back: the test suite must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

import numpy as np
import pytest

from libzseek_tpu.testing.corpus import mixed_corpus as _mixed_corpus


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)


@pytest.fixture(scope="session")
def corpus(rng):
    return _mixed_corpus(rng, 1 << 18)  # 256 KiB
