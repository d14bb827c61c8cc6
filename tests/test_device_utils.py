"""Device utility shims (reference run_train_eval.py:139-195 parity)."""
from ultrafnd_git_tpu.utils.device import (
    memory_cleanup,
    optimized_config,
    pick_device,
)


def test_pick_device_reports_backend():
    assert pick_device() in ("cpu", "gpu", "tpu")
    assert pick_device(force_cpu=True) == "cpu"


def test_optimized_config_presets():
    dbg = optimized_config(debug_mode=True)
    assert dbg["batch_size"] == 4 and dbg["max_frames"] == 8
    tpu = optimized_config("tpu")
    cpu = optimized_config("cpu")
    assert tpu["batch_size"] > cpu["batch_size"]
    assert tpu["ensemble_size"] >= cpu["ensemble_size"]
    for cfg in (dbg, tpu, cpu):
        assert set(cfg) == {
            "max_samples", "batch_size", "val_batch_size", "max_frames",
            "frame_size", "ensemble_size", "max_epochs",
        }


def test_memory_cleanup_preserves_live_arrays():
    import numpy as np
    import jax.numpy as jnp

    x = jnp.ones((8, 8)) * 2
    memory_cleanup()  # must not raise and must not touch live arrays
    assert float(np.asarray(x).sum()) == 128.0
