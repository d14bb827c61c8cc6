"""Subprocess worker for the 2-process multi-host test (not a test module).

Executes the REAL multi-process branch of parallel/mesh.py — the code
SURVEY §5.8 prescribes and the single-process dryrun can never reach:
`maybe_initialize_distributed` -> `jax.distributed.initialize`, then
`put_global_batch` (per-process local rows via
`jax.make_array_from_process_local_data`) and `put_replicated_global`,
followed by two SPMD optimizer steps whose gradients psum over the global
mesh. Prints per-step losses for the parent test to compare across
processes and against a single-process replay.
"""
import sys


def main() -> None:
    port, pid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.parallel import mesh as meshlib

    ok = meshlib.maybe_initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=n, process_id=pid
    )
    assert ok, "maybe_initialize_distributed must take the multi-process path"
    assert jax.process_count() == n

    import numpy as np
    import optax

    mesh = meshlib.make_mesh(tp=1)  # dp = all global devices

    # identical seeded data on every process (the trainer's index-stream
    # contract): put_global_batch slices out this process's local rows
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 16)).astype(np.float32)
    y = (rng.normal(size=(64,)) > 0).astype(np.int32)
    W0 = (rng.normal(size=(16, 2)) * 0.1).astype(np.float32)

    Xg = meshlib.put_global_batch(X, mesh)
    yg = meshlib.put_global_batch(y, mesh)
    W = meshlib.put_replicated_global(W0, mesh)

    @jax.jit
    def step(w, xb, yb):
        def loss_fn(w):
            logits = xb @ w
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    W, l1 = step(W, Xg, yg)
    W, l2 = step(W, Xg, yg)

    # Round-4 --dcn x multi-process: the compound ('dcn', 'data') batch
    # layout must place each process's local rows at the right GLOBAL
    # offsets. A position-weighted checksum (computed on device, fully
    # reduced -> replicated and readable on every process) detects any
    # row permutation a shape-only check would miss; it must match the
    # host-computed value for both put_global_batch and the scan-epoch
    # matrices (put_epoch_batches).
    mesh_d = meshlib.make_mesh(dcn=2, tp=1)
    assert mesh_d.axis_names == ("dcn", "data", "model")

    def checksum(arr_g, r, c, m):
        rg = meshlib.put_replicated_global(r, m)
        cg = meshlib.put_replicated_global(c, m)
        return float(jax.jit(lambda a, rr, cc: rr @ (a @ cc))(arr_g, rg, cg))

    wr = rng.normal(size=X.shape[0]).astype(np.float32)
    wc = rng.normal(size=X.shape[1]).astype(np.float32)
    got = checksum(meshlib.put_global_batch(X, mesh_d), wr, wc, mesh_d)
    want = float(wr @ X @ wc)
    assert abs(got - want) < 1e-3 * max(1.0, abs(want)), (got, want)

    ch = rng.integers(0, 64, size=(3, 16)).astype(np.int32)
    mk = rng.normal(size=(3, 16)).astype(np.float32)
    chd, mkd = meshlib.put_epoch_batches(ch, mk, mesh_d)
    ws = rng.normal(size=(3,)).astype(np.float32)
    wb = rng.normal(size=(16,)).astype(np.float32)
    got_m = checksum(mkd, ws, wb, mesh_d)
    want_m = float(ws @ mk @ wb)
    assert abs(got_m - want_m) < 1e-3 * max(1.0, abs(want_m))
    got_c = checksum(chd.astype(np.float32), ws, wb, mesh_d)
    want_c = float(ws @ ch.astype(np.float32) @ wb)
    assert abs(got_c - want_c) < 1e-3 * max(1.0, abs(want_c))

    # losses are fully replicated -> addressable on every process
    print(f"MHLOSS pid={pid} l1={float(l1):.10f} l2={float(l2):.10f}", flush=True)


if __name__ == "__main__":
    main()
