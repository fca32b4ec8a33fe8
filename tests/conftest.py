"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference library's tests run single-process on the host CPU
(/root/reference/meson.build:41-54).  Our equivalent test environment is a
virtual multi-device CPU platform so that every sharding/mesh code path is
exercised without TPU hardware, per the multi-chip test strategy in
SURVEY.md §4.  Real-chip runs happen via bench.py / tools/ on TPU.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)


def _mixed_corpus(rng, n):
    """Test corpus with the regimes that matter for an LZ codec: compressible
    text-like data, short-period repeats, long zero runs, and incompressible
    noise."""
    parts = []
    # text-like: small alphabet with skewed distribution
    alpha = np.frombuffer(b"abcdefgh THEramble", dtype=np.uint8)
    probs = np.arange(len(alpha), 0, -1, dtype=np.float64)
    probs /= probs.sum()
    parts.append(rng.choice(alpha, size=n // 4, p=probs).astype(np.uint8))
    # repeated block (long matches, period 337)
    block = rng.integers(0, 256, size=337, dtype=np.uint8)
    parts.append(np.tile(block, n // 4 // 337 + 1)[: n // 4])
    # zero run (RLE regime)
    parts.append(np.zeros(n // 4, dtype=np.uint8))
    # incompressible noise
    parts.append(rng.integers(0, 256, size=n - 3 * (n // 4), dtype=np.uint8))
    return np.concatenate(parts)


@pytest.fixture(scope="session")
def corpus(rng):
    return _mixed_corpus(rng, 1 << 18)  # 256 KiB
