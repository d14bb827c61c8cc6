"""Persistent compile-cache namespace rule (VERDICT r4 item 4).

XLA:CPU AOT executables encode the compiling machine's CPU features;
loading them on a different machine is undefined behavior (the
`cpu_aot_loader.cc` machine-mismatch warnings in MULTICHIP_r04.json).
The rule under test: CPU-backend runs namespace the cache dir by a
host-feature fingerprint; accelerator runs keep the flat dir.
"""
import os

import jax

from ultrafnd_git_tpu.utils.jaxcache import (
    cache_dir_for,
    enable_persistent_cache,
    host_cpu_fingerprint,
)


def test_fingerprint_stable_and_hexlike():
    a, b = host_cpu_fingerprint(), host_cpu_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex digest


def test_cpu_platform_namespaces_accelerators_do_not():
    base = "/tmp/x"
    fp = host_cpu_fingerprint()
    assert cache_dir_for(base, "cpu") == os.path.join(base, f"cpu-{fp}")
    # any list containing cpu can emit CPU executables -> namespace
    assert cache_dir_for(base, "cpu,tpu") == os.path.join(base, f"cpu-{fp}")
    assert cache_dir_for(base, " cpu ") == os.path.join(base, f"cpu-{fp}")
    # accelerator-only and unpinned runs keep the flat (cross-host) dir
    assert cache_dir_for(base, "tpu") == base
    assert cache_dir_for(base, None) == base
    assert cache_dir_for(base, "") == base


def test_enable_applies_namespace_under_pinned_cpu(tmp_path):
    # conftest pins jax_platforms=cpu before any test runs, so enabling
    # against a fresh base must land in the fingerprinted subdir
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_persistent_cache(str(tmp_path))
        got = jax.config.jax_compilation_cache_dir
        want = os.path.join(
            str(tmp_path), f"cpu-{host_cpu_fingerprint()}"
        )
        assert got == want
        assert os.path.isdir(want)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
