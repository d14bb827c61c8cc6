"""Device selection, workload-scale presets, memory cleanup.

Parity target: reference `src/training/run_train_eval.py:139-195` —
`get_m1_optimized_device` (always returns CPU with advice prints),
`get_optimized_config` (per-device batch/frames/ensemble presets) and
`m1_memory_cleanup` (mps cache drop). TPU equivalents:
  * `pick_device()` returns the best JAX backend, honoring `--cpu`-style
    forcing (config override — the env var is not enough when a PJRT
    sitecustomize pins the platform);
  * `optimized_config(backend, debug_mode)` scales the same knobs to the
    accelerator actually present;
  * `memory_cleanup()` drops live compiled executables + device buffers.
"""
from __future__ import annotations

from typing import Any, Dict

import jax


def pick_device(force_cpu: bool = False) -> str:
    """Return the backend name that work should target ('tpu'/'gpu'/'cpu').

    Returns the backend that will ACTUALLY serve new work — if JAX's
    backends were already initialized before a force_cpu call, the
    platform override cannot take effect and pretending 'cpu' would let
    CPU-scale presets drive accelerator execution silently.
    """
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
        actual = jax.default_backend()
        if actual != "cpu":
            print(
                "⚠️  force_cpu requested after the JAX backend was already "
                f"initialized — work will run on '{actual}'. Force CPU "
                "before any JAX device use (run_train_eval.py --cpu does)."
            )
        return actual
    return jax.default_backend()


def optimized_config(
    backend: str | None = None, debug_mode: bool = False
) -> Dict[str, Any]:
    """Workload-scale preset per backend (reference ref :150-185 shape)."""
    backend = backend or jax.default_backend()
    if debug_mode:
        return {
            "max_samples": 5,
            "batch_size": 4,
            "val_batch_size": 4,
            "max_frames": 8,
            "frame_size": 128,
            "ensemble_size": 1,
            "max_epochs": 10,
        }
    if backend == "tpu":
        # MXU-friendly: large batches, full frames, bigger ensembles
        return {
            "max_samples": None,  # whole dataset
            "batch_size": 512,
            "val_batch_size": 512,
            "max_frames": 30,
            "frame_size": 256,
            "ensemble_size": 4,
            "max_epochs": 100,
        }
    return {
        "max_samples": None,
        "batch_size": 16,
        "val_batch_size": 16,
        "max_frames": 30,
        "frame_size": 256,
        "ensemble_size": 2,
        "max_epochs": 100,
    }


def memory_cleanup() -> None:
    """Drop compiled executables and staged buffers.

    The reference's analogue empties the MPS allocator cache
    (ref :187-195) — it frees UNUSED memory, never live tensors; the JAX
    equivalent is clearing the compilation/dispatch caches. Live arrays
    are left alone.
    """
    try:
        jax.clear_caches()
    except Exception:
        pass
