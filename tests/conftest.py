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
# The REFERENCE models (test_parity.py) call from_pretrained WITHOUT
# local_files_only; on a zero-egress box each attempt hangs to the HTTP
# timeout (~4 min of the suite's wall time). Offline mode fails them
# fast into their fallback ladders instead.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-second end-to-end/mesh tests; `-m 'not slow'` is the "
        "fast inner loop (~2 min), the full suite stays the merge gate",
    )


@pytest.fixture(scope="session")
def fixture_data_root() -> str:
    """Path to the checked-in tiny synthetic FakeSV fixture."""
    return str(REPO_ROOT / "tests" / "fixtures" / "fakesv_tiny")


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
