"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY §2.9); this module is the
TPU-native scaling story: a 2-D `Mesh(('data', 'model'))` over which
  * batches shard on 'data' (pure data parallelism; gradient psum over ICI
    is inserted by XLA from the jit sharding annotations),
  * the fusion/classifier MLP pairs shard Megatron-style on 'model'
    (column-parallel first Dense, row-parallel second Dense) — optional at
    this model scale but exercised by the multichip dry run,
  * a 'sequence'/pipeline axis is left unpopulated by design: per SURVEY
    §5.7 the workload's sequences are tiny, so CP/PP are config hooks only.
"""
from __future__ import annotations

import os
import warnings
from collections import Counter
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Multi-slice axis (make_mesh(dcn=...)): OUTER data-parallel axis whose
# groups are TPU slices connected by DCN (data-center network) rather
# than ICI. Keeping it outermost — slowest-varying — is the standard
# layout rule: XLA lowers the gradient all-reduce hierarchically, so
# the per-step cross-slice traffic is one reduced gradient per slice
# pair, not per chip ("How to Scale Your Model", multi-slice recipe).
DCN_AXIS = "dcn"


def data_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the BATCH dimension shards over.

    ('dcn', 'data') on a multi-slice mesh — batches shard jointly over
    both data-parallel axes — ('data',) otherwise. Every helper that
    places batch-dim arrays resolves the axis set through this, so the
    single-slice layout is byte-identical to before the dcn axis existed.
    """
    return (
        (DCN_AXIS, DATA_AXIS)
        if DCN_AXIS in mesh.axis_names
        else (DATA_AXIS,)
    )


def data_parallel_size(mesh: Mesh) -> int:
    """Total data-parallel ways (product over `data_axes`)."""
    return int(np.prod([mesh.shape[a] for a in data_axes(mesh)]))


def _data_spec_entry(mesh: Mesh):
    """The PartitionSpec ENTRY for a batch dimension: the bare axis name
    on single-slice meshes (so specs stay byte-identical to the
    pre-dcn layout) and the ('dcn', 'data') tuple on multi-slice ones."""
    axes = data_axes(mesh)
    return axes if len(axes) > 1 else axes[0]


#: exception-text signatures of the known-transient communicator-startup
#: failures (retried by maybe_initialize_distributed)
_TRANSIENT_INIT_SIGNATURES = (
    "Gloo context initialization",
    "DEADLINE_EXCEEDED",
)


def _is_transient_init_error(exc: BaseException) -> bool:
    text = f"{type(exc).__name__}: {exc}"
    return any(sig in text for sig in _TRANSIENT_INIT_SIGNATURES)


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    timeout_s: Optional[float] = None,
    retries: Optional[int] = None,
) -> bool:
    """Multi-host hook (SURVEY §5.8): `jax.distributed.initialize()`.

    Reads the standard env contract when args are omitted
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, the
    names `jax.distributed` itself documents). A single-process run — no
    coordinator configured, or num_processes <= 1 — is a graceful no-op
    returning False, so the same entrypoint works on one chip and on a
    multi-host slice. Must run before first device use.

    Robustness (VERDICT r4 item 6 — previously this logic lived in the
    2-process TEST, so a real pod launch hitting the same flake just
    died with Gloo's raw error):
      * `timeout_s` bounds coordinator connection
        (jax.distributed's initialization_timeout; default 300 s, env
        override ULTRAFND_DIST_INIT_TIMEOUT_S);
      * the startup barrier (which builds the global communicator while
        all processes are still in lock-step — the CPU backend's Gloo
        context handshake has a hard 30 s deadline, and the first
        collective otherwise lands after minutes of possibly-skewed
        compiles) retries once on the known-transient Gloo/deadline
        signatures after a full jax.distributed.shutdown (env override
        ULTRAFND_DIST_INIT_RETRIES);
      * terminal failures raise RuntimeError naming the coordinator,
        this process's id, and the knobs to turn — not a bare stack
        trace from inside the transport.
    """
    coord = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_str = os.environ.get("JAX_NUM_PROCESSES", "")
    n = num_processes if num_processes is not None else (
        int(n_str) if n_str.isdigit() else 0
    )
    pid_str = os.environ.get("JAX_PROCESS_ID", "")
    pid = process_id if process_id is not None else (
        int(pid_str) if pid_str.isdigit() else None
    )
    if not coord or n <= 1 or pid is None:
        return False
    if timeout_s is None:
        timeout_s = float(
            os.environ.get("ULTRAFND_DIST_INIT_TIMEOUT_S", "300")
        )
    if retries is None:
        retries = int(os.environ.get("ULTRAFND_DIST_INIT_RETRIES", "1"))

    diagnostic = (
        f"(coordinator={coord}, process {pid} of {n}; "
        f"timeout_s={timeout_s:g} via ULTRAFND_DIST_INIT_TIMEOUT_S, "
        f"retries via ULTRAFND_DIST_INIT_RETRIES). Check that every "
        f"process can reach the coordinator address, that all {n} "
        f"processes launched with distinct JAX_PROCESS_ID in [0, {n}), "
        f"and that process 0's port is free."
    )
    attempt = 0
    while True:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=n,
                process_id=pid,
                initialization_timeout=max(1, int(timeout_s)),
            )
            # build the global communicator NOW (see docstring); once
            # created it is cached for the run
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                f"ultrafnd-distributed-startup-{attempt}"
            )
            return True
        except Exception as exc:  # noqa: BLE001 — transport errors vary
            transient = _is_transient_init_error(exc)
            try:
                jax.distributed.shutdown()
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
            if transient and attempt < retries:
                attempt += 1
                print(
                    "multi-host init: transient communicator-startup "
                    f"failure ({type(exc).__name__}), retry "
                    f"{attempt}/{retries} {diagnostic}",
                    flush=True,
                )
                continue
            kind = "transient" if transient else "terminal"
            raise RuntimeError(
                f"multi-host initialization failed ({kind}: "
                f"{type(exc).__name__}: {exc}) {diagnostic}"
            ) from exc


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
    extra_axes: Sequence[Tuple[str, int]] = (),
    dcn: int = 1,
) -> Mesh:
    """Build a ([dcn,] dp, tp, *extra) mesh over available (or given)
    devices.

    `extra_axes` is the SURVEY §2.9 PP/SP config hook: additional named
    axes (e.g. `(("pipe", 1),)` or `(("sequence", 1),)`) appended after
    ('data', 'model'). They default to empty — populating one later is a
    config change, not a code change; all sharding rules below address
    axes by NAME so size-1 extra axes don't disturb them.

    `dcn > 1` prepends an OUTER 'dcn' data-parallel axis for multi-slice
    runs: batches shard over (dcn, data) jointly (see `data_axes`), tp/
    sp/pipe stay within a slice. On real multi-slice hardware (devices
    carry distinct `slice_index`es) the grid is built with
    `mesh_utils.create_hybrid_device_mesh` so the dcn axis maps exactly
    onto slice boundaries — ICI collectives never cross DCN; on
    single-slice or host-CPU device sets (tests, the driver dry run) it
    falls back to a plain contiguous split, which exercises the same
    program and shardings.
    """
    devices = list(devices if devices is not None else jax.devices())
    extra = [(str(name), int(size)) for name, size in extra_axes]
    extra_total = int(np.prod([s for _, s in extra])) if extra else 1
    dcn = int(dcn)
    if dp is None:
        if len(devices) % (tp * extra_total * dcn) != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"tp*extra*dcn={tp * extra_total * dcn}"
            )
        dp = len(devices) // (tp * extra_total * dcn)
    shape = (dp, tp, *[s for _, s in extra])
    names = (DATA_AXIS, MODEL_AXIS, *[n for n, _ in extra])
    if dcn > 1:
        shape = (dcn, *shape)
        names = (DCN_AXIS, *names)
    n_used = int(np.prod(shape))
    devices = devices[:n_used]
    if dcn > 1:
        slice_ids = [getattr(d, "slice_index", None) for d in devices]
        if None not in slice_ids:
            # real multi-slice hardware: take the hybrid path only when
            # the selected devices cover EXACTLY dcn slices with equal
            # per-slice counts (create_hybrid_device_mesh's contract —
            # uneven counts raise an opaque reshape error from inside
            # mesh_utils). Anything else falls back to the contiguous
            # split WITH A WARNING: that layout puts slice-crossing hops
            # on the intra-slice axes, the exact traffic pattern the
            # 'dcn' axis exists to prevent (ADVICE r4).
            counts = Counter(slice_ids)
            per_slice = n_used // dcn
            if len(counts) == dcn and all(
                c == per_slice for c in counts.values()
            ):
                grid = mesh_utils.create_hybrid_device_mesh(
                    (1, *shape[1:]),
                    dcn_mesh_shape=(dcn, *(1 for _ in shape[1:])),
                    devices=devices,
                )
                return Mesh(grid, names)
            warnings.warn(
                f"dcn={dcn} requested but the {n_used} selected devices "
                f"span {len(counts)} slice(s) with per-slice counts "
                f"{dict(counts)} — falling back to a contiguous split, "
                "so the 'dcn' mesh axis will NOT align with slice "
                "boundaries and ICI-axis collectives may cross DCN. "
                f"Pass a device list covering exactly {dcn} slices with "
                f"{per_slice} devices each.",
                stacklevel=2,
            )
    grid = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(grid, names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    # the batch dim shards jointly over ('dcn', 'data') on a multi-slice
    # mesh — a single compound spec entry, so XLA sees one partitioned
    # dimension and lowers the gradient psum hierarchically (ICI within
    # a slice, DCN across)
    return NamedSharding(mesh, P(_data_spec_entry(mesh)))


def epoch_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a whole epoch's (steps, B) index/mask matrices.

    The scan axis (steps) stays unsharded; the batch axis shards over
    'data', so every `lax.scan` slice is exactly the (B,) batch-sharded
    array the per-step path would have built with `put_global_batch` —
    this is what lets scan-epoch run under a mesh (VERDICT r2 item 2).
    """
    return NamedSharding(mesh, P(None, _data_spec_entry(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_path(path: str, leaf) -> P:
    """Megatron-style specs for the large fusion/classifier MLPs."""
    if leaf.ndim == 2:
        # column-parallel first Dense of each MLP pair
        if any(k in path for k in ("fuse0", "pre0")):
            return P(None, MODEL_AXIS)
        # row-parallel second Dense (contracting dim sharded)
        if any(k in path for k in ("fuse1", "pre1")):
            return P(MODEL_AXIS, None)
    if leaf.ndim == 1 and any(k in path for k in ("fuse0", "pre0")):
        return P(MODEL_AXIS)
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh):
    """NamedSharding pytree for the model params under `mesh`."""

    def assign(path, leaf):
        keys = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        return NamedSharding(mesh, _spec_for_path(keys, leaf))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with its sharding rules."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def put_global_batch(
    arr: np.ndarray, mesh: Mesh, sharding: Optional[NamedSharding] = None
):
    """Place a host batch onto the mesh, multi-host aware.

    Single-process: a plain sharded device_put. Multi-host (after
    `maybe_initialize_distributed`): every process computes the same
    global batch from the same seeded index stream, and this constructs
    the global jax.Array from each process's LOCAL rows via
    `jax.make_array_from_process_local_data` — the per-host input sharding
    SURVEY §2.9 prescribes (hosts never materialize remote shards on
    device).
    """
    sharding = sharding or batch_sharding(mesh)
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(
        sharding, _local_rows(arr, sharding), arr.shape
    )


def _local_rows(arr: np.ndarray, sharding: NamedSharding) -> np.ndarray:
    """Rows of the (globally identical) host batch owned by this process."""
    n_proc = jax.process_count()
    if arr.shape[0] % n_proc:
        # silently flooring here would hand make_array_from_process_local_data
        # fewer rows than the declared global shape — fail with the remedy
        raise ValueError(
            f"global batch rows ({arr.shape[0]}) must divide evenly over "
            f"{n_proc} processes — pad with mesh.pad_to_multiple first"
        )
    per = arr.shape[0] // n_proc
    start = jax.process_index() * per
    return arr[start : start + per]


def put_epoch_batches(
    chunks: np.ndarray, masks: np.ndarray, mesh: Mesh
) -> Tuple[Any, Any]:
    """Place a whole epoch's (steps, B) index/mask matrices on the mesh.

    The scan axis (steps) stays unsharded; the batch axis shards over
    'data' (epoch_batch_sharding). Multi-host aware: every process
    computes the same global matrices from the same seeded index stream
    (the trainers' contract), and each contributes its LOCAL batch
    COLUMNS via `jax.make_array_from_process_local_data` — this is what
    keeps the scan-epoch fast path alive under true multi-process runs
    (VERDICT r3 item 2: it used to fall back to per-step dispatch there,
    multiplying the ~90 ms/dispatch link tax across the epoch).
    """
    es = epoch_batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(chunks, es), jax.device_put(masks, es)

    n_proc = jax.process_count()
    if chunks.shape[1] % n_proc:
        raise ValueError(
            f"batch axis ({chunks.shape[1]}) must divide evenly over "
            f"{n_proc} processes"
        )
    per = chunks.shape[1] // n_proc
    s = jax.process_index() * per

    def put(arr):
        return jax.make_array_from_process_local_data(
            es, np.ascontiguousarray(arr[:, s : s + per]), arr.shape
        )

    return put(chunks), put(masks)


def put_replicated_global(arr, mesh: Mesh):
    """Replicate a host array over the mesh, multi-host aware."""
    sharding = replicated(mesh)
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    # every process holds the full array; the "local data" of a fully
    # replicated sharding is the array itself
    return jax.make_array_from_process_local_data(sharding, arr, arr.shape)


def pad_to_multiple(idx: np.ndarray, multiple: int) -> np.ndarray:
    """Pad a 1-D index array by repeating the last element."""
    r = len(idx) % multiple
    if r == 0:
        return idx
    pad = np.full(multiple - r, idx[-1] if len(idx) else 0, idx.dtype)
    return np.concatenate([idx, pad])
