"""Mesh construction, axis-spec hook, and multi-host helpers (8 CPU devs)."""
import jax
import numpy as np
import pytest

from ultrafnd_git_tpu.parallel import mesh as meshlib


def test_make_mesh_default_axes():
    m = meshlib.make_mesh(dp=4, tp=2, devices=jax.devices("cpu"))
    assert m.axis_names == ("data", "model")
    assert m.shape == {"data": 4, "model": 2}


def test_make_mesh_extra_axis_size_one():
    """SURVEY §2.9 PP hook: a named extra axis is a config change only."""
    m = meshlib.make_mesh(
        dp=4, tp=2, devices=jax.devices("cpu"), extra_axes=(("pipe", 1),)
    )
    assert m.axis_names == ("data", "model", "pipe")
    assert m.shape == {"data": 4, "model": 2, "pipe": 1}
    # sharding rules address axes by name — unaffected by the extra axis
    params = {"fuse0": {"kernel": np.zeros((8, 8))}}
    sh = meshlib.param_shardings(params, m)
    assert sh["fuse0"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model"
    )


def test_make_mesh_extra_axis_populated():
    m = meshlib.make_mesh(
        dp=2, tp=2, devices=jax.devices("cpu"), extra_axes=(("sequence", 2),)
    )
    assert m.shape == {"data": 2, "model": 2, "sequence": 2}


def test_make_mesh_infers_dp_with_extra_axes():
    m = meshlib.make_mesh(
        tp=2, devices=jax.devices("cpu"), extra_axes=(("pipe", 2),)
    )
    assert m.shape["data"] == 2  # 8 // (2*2)


def test_make_mesh_dcn_axis():
    """Multi-slice data parallelism: dcn prepends an OUTER data axis."""
    m = meshlib.make_mesh(dp=2, tp=2, dcn=2, devices=jax.devices("cpu"))
    assert m.axis_names == ("dcn", "data", "model")
    assert m.shape == {"dcn": 2, "data": 2, "model": 2}
    assert meshlib.data_axes(m) == ("dcn", "data")
    assert meshlib.data_parallel_size(m) == 4
    # the batch dim shards jointly over both data axes
    assert meshlib.batch_sharding(m).spec == jax.sharding.PartitionSpec(
        ("dcn", "data")
    )
    # dp inference accounts for the dcn factor: 8 // (tp=1 * dcn=2) = 4
    m2 = meshlib.make_mesh(dcn=2, devices=jax.devices("cpu"))
    assert m2.shape == {"dcn": 2, "data": 4, "model": 1}
    # single-slice meshes keep the exact pre-dcn specs (compile-cache
    # and checkpoint-layout stability)
    flat = meshlib.make_mesh(dp=4, tp=2, devices=jax.devices("cpu"))
    assert meshlib.batch_sharding(flat).spec == jax.sharding.PartitionSpec(
        "data"
    )
    assert meshlib.data_parallel_size(flat) == 4


def test_put_global_batch_dcn_mesh():
    """Batch placement and round-trip on the multi-slice layout."""
    m = meshlib.make_mesh(dp=4, dcn=2, devices=jax.devices("cpu"))
    arr = np.arange(16, dtype=np.int32)
    out = meshlib.put_global_batch(arr, m)
    np.testing.assert_array_equal(np.asarray(out), arr)
    # every one of the 8 data-parallel shards holds 2 rows
    assert {s.data.shape for s in out.addressable_shards} == {(2,)}


def test_maybe_initialize_distributed_noop(monkeypatch):
    """No coordinator configured -> graceful single-process no-op."""
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    assert meshlib.maybe_initialize_distributed() is False
    # explicit single-process args are also a no-op
    assert (
        meshlib.maybe_initialize_distributed(
            coordinator="localhost:1234", num_processes=1, process_id=0
        )
        is False
    )


def test_put_global_batch_single_process():
    m = meshlib.make_mesh(dp=4, tp=2, devices=jax.devices("cpu"))
    arr = np.arange(16, dtype=np.int32)
    out = meshlib.put_global_batch(arr, m)
    np.testing.assert_array_equal(np.asarray(out), arr)
    assert out.sharding.spec == jax.sharding.PartitionSpec("data")


def test_put_replicated_global_single_process():
    m = meshlib.make_mesh(dp=4, tp=2, devices=jax.devices("cpu"))
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = meshlib.put_replicated_global(arr, m)
    np.testing.assert_array_equal(np.asarray(out), arr)
    assert out.sharding.spec == jax.sharding.PartitionSpec()


class _SliceDev:
    """Real CPU device + a fake slice_index (multi-slice hardware stand-in)."""

    def __init__(self, dev, slice_index):
        self._dev = dev
        self.slice_index = slice_index

    def __getattr__(self, name):
        return getattr(self._dev, name)

    def __repr__(self):
        return f"slice{self.slice_index}:{self._dev!r}"


def test_make_mesh_dcn_slice_mismatch_warns():
    """ADVICE r4: when devices carry slice_index but don't cover exactly
    dcn equal slices, the contiguous fallback must WARN — that layout
    puts slice-crossing hops on the ICI axes."""
    devs = [
        _SliceDev(d, s)
        for d, s in zip(jax.devices("cpu"), [0, 0, 0, 0, 1, 1, 2, 2])
    ]
    with pytest.warns(UserWarning, match="slice boundaries"):
        m = meshlib.make_mesh(dp=2, tp=2, dcn=2, devices=devs)
    assert m.shape == {"dcn": 2, "data": 2, "model": 2}


def test_make_mesh_dcn_hybrid_path_on_even_slices():
    """Exactly dcn slices with equal counts -> hybrid mesh, no warning,
    and each dcn row holds one slice's devices."""
    devs = [
        _SliceDev(d, s)
        for d, s in zip(jax.devices("cpu"), [0, 0, 0, 0, 1, 1, 1, 1])
    ]
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        m = meshlib.make_mesh(dp=2, tp=2, dcn=2, devices=devs)
    assert m.shape == {"dcn": 2, "data": 2, "model": 2}
    grid = np.asarray(m.devices)
    for row in range(2):
        assert {d.slice_index for d in grid[row].ravel()} == {row}


def test_multihost_init_retries_transient_then_diagnoses(
    monkeypatch, capsys
):
    """VERDICT r4 item 6: the transient Gloo-handshake deadline retries
    in the PRODUCT (after a full shutdown), and the terminal error is an
    actionable RuntimeError naming coordinator/process/env knobs — not
    the transport's raw stack. The transport is injected: jax's real
    client LOG(FATAL)s the process on a dead coordinator, so the logic
    is what's unit-testable (the 2-process tests in test_multihost*.py
    exercise the real transport end-to-end, now without their own
    retry)."""
    calls = []
    shutdowns = []

    def fake_init(**kw):
        calls.append(kw)
        raise RuntimeError(
            "DEADLINE_EXCEEDED: Gloo context initialization timed out"
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(
        jax.distributed, "shutdown", lambda: shutdowns.append(1)
    )
    with pytest.raises(
        RuntimeError, match="multi-host initialization failed"
    ) as ei:
        meshlib.maybe_initialize_distributed(
            "localhost:1234", 2, 1, timeout_s=7, retries=2
        )
    assert len(calls) == 3  # first attempt + 2 retries
    assert len(shutdowns) == 3  # full shutdown before each retry + final
    assert calls[0]["initialization_timeout"] == 7
    msg = str(ei.value)
    assert "localhost:1234" in msg
    assert "process 1 of 2" in msg
    assert "ULTRAFND_DIST_INIT_TIMEOUT_S" in msg
    assert "transient" in msg
    out = capsys.readouterr().out
    assert "retry 1/2" in out and "retry 2/2" in out

    # terminal (non-transient) failures do NOT retry
    calls.clear()

    def fake_init_terminal(**kw):
        calls.append(kw)
        raise RuntimeError("INVALID_ARGUMENT: something structural")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init_terminal)
    with pytest.raises(RuntimeError, match="terminal"):
        meshlib.maybe_initialize_distributed(
            "localhost:1234", 2, 0, timeout_s=7, retries=2
        )
    assert len(calls) == 1


def test_multihost_init_noop_without_coordinator(monkeypatch):
    """Single-process launches (no env contract) stay a graceful no-op."""
    for var in (
        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"
    ):
        monkeypatch.delenv(var, raising=False)
    assert meshlib.maybe_initialize_distributed() is False
