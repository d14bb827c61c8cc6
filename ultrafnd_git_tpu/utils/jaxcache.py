"""Persistent XLA compilation cache setup.

First-time compiles through the TPU tunnel are expensive (tens of seconds);
every entry point (CLI, bench, graft entry, tests) enables a persistent
on-disk cache so repeated runs reuse compiled executables.

CPU-backend entries are namespaced by a host-feature hash: XLA:CPU AOT
executables encode the compiling machine's CPU feature set, and loading one
on a host with a different feature set is undefined behavior (jax warns via
`cpu_aot_loader.cc: "Machine type used for XLA:CPU compilation doesn't
match..."` and the result can be SIGILL). A cache dir shared across
heterogeneous hosts (e.g. a persistent /tmp reused by driver machines of
different generations) must therefore never serve one host's CPU
executables to another. TPU executables have no such host dependence, so
accelerator-backend runs keep the flat dir and stay warm across hosts.
"""
from __future__ import annotations

import hashlib
import os
import platform


def host_cpu_fingerprint() -> str:
    """Stable 12-hex digest of this host's CPU architecture + feature set.

    Reads the /proc/cpuinfo flags line (x86: `flags`, arm: `Features`);
    identical machines produce identical tags, machines that differ in any
    ISA extension produce different ones — exactly the property the XLA:CPU
    AOT loader checks at load time.
    """
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(
                        sorted(line.split(":", 1)[1].split())
                    )
                    break
    except OSError:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def cache_dir_for(base: str, platforms: str | None) -> str:
    """Pure namespace rule (unit-tested): CPU-backend runs get a
    host-fingerprint subdirectory of `base`; accelerator runs get `base`.

    `platforms` is the resolved jax_platforms string ("cpu", "tpu",
    "cpu,tpu", ... or None when unpinned). Any run that can compile CPU
    executables namespaces — mixed-platform lists included, because the
    flat dir must never receive a CPU entry.
    """
    plats = [p.strip() for p in (platforms or "").split(",") if p.strip()]
    if "cpu" in plats:
        return os.path.join(base, f"cpu-{host_cpu_fingerprint()}")
    return base


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    base = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/ultrafnd_jax")
    )
    platforms = None
    try:
        platforms = jax.config.jax_platforms
    except AttributeError:  # very old jax; treat as unpinned
        platforms = None
    cache_dir = cache_dir_for(base, platforms)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
