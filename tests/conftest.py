"""Test harness setup: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count=8), per the project's TPU-design-but-
CPU-test strategy. Real-TPU runs happen via bench.py / the driver.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic tests: never attempt HuggingFace weight loads (the fallback
# ladders' hash/DSP rungs are what run in CI anyway).
os.environ.setdefault("ULTRAFND_DISABLE_HF", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Persistent compilation cache: jit compiles dominate test wall-time here.
from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache("/tmp/ultrafnd_jax_cache")

# The env var alone is not enough when a PJRT plugin sitecustomize pins
# jax_platforms (this machine's TPU tunnel does) — override the config
# directly so tests never compile over the tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def fixture_data_root() -> str:
    """Path to the checked-in tiny synthetic FakeSV fixture."""
    return str(REPO_ROOT / "tests" / "fixtures" / "fakesv_tiny")


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
