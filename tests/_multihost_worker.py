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
    # losses are fully replicated -> addressable on every process
    print(f"MHLOSS pid={pid} l1={float(l1):.10f} l2={float(l2):.10f}", flush=True)


if __name__ == "__main__":
    main()
