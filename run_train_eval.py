#!/usr/bin/env python3
"""Train/eval entrypoint for ultrafnd_git_tpu (the v2 canonical path).

CLI-parity target: reference `run_train_eval.py:28-47` — identical flags.
The `--cpu` flag forces the JAX CPU backend (the reference's analogue
forces CPU over MPS).

Examples:
  python run_train_eval.py --data_root /data/FakeSV --out_dir outputs_v2 \
      --epochs 12 --batch_size 16
  python run_train_eval.py --eval_only --data_root /data/FakeSV \
      --out_dir outputs_v2
"""
import argparse
import os
from pathlib import Path


def parse_args():
    p = argparse.ArgumentParser(description="ultrafnd_git_tpu v2 — train/test")
    p.add_argument("--data_root", type=str, default="data/FakeSV",
                   help="Root with videos/, video_comment/, data_complete.json")
    p.add_argument("--ocr_phrase_pkl", type=str,
                   default="fakesv/preprocess_ocr/ocr_phrase_fea.pkl",
                   help="OCR phrase cache from scripts/generate_ocr_phrase_features.py "
                        "(optional; whitespace tokenization is used if missing).")
    p.add_argument("--out_dir", type=str, default="outputs_v2",
                   help="Where to save checkpoints & logs")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--gnn_dim", type=int, default=128)
    p.add_argument("--gnn_overlap_thresh", type=float, default=0.12,
                   help="OCR Jaccard threshold for graph edges")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend even if a TPU is available")
    p.add_argument("--no_gnn", action="store_true", help="Disable GNN features")
    p.add_argument("--use_evidence", action="store_true",
                   help="Feed real evidence-scorer outputs (semantic gap, "
                        "emotion intensity, temporal delay) into the fusion "
                        "evidence gates instead of the internal proxies")
    p.add_argument("--eval_only", action="store_true",
                   help="Skip training; load best and test")
    p.add_argument("--trainer", choices=("v2", "integrated"), default="v2",
                   help="v2 = canonical cache trainer (transductive GCN); "
                        "integrated = per-batch annealed OCR graphs, cosine "
                        "LR, label smoothing (the reference's orphan "
                        "variant, wired in)")
    # TPU-native extras (not in the reference CLI)
    p.add_argument("--dp", type=int, default=None,
                   help="Data-parallel mesh size (default: no mesh)")
    p.add_argument("--tp", type=int, default=1, help="Tensor-parallel mesh size")
    p.add_argument("--dcn", type=int, default=1,
                   help="Multi-slice data parallelism: OUTER mesh axis "
                        "whose groups are TPU slices joined by DCN; "
                        "batches shard over (dcn, data) jointly and the "
                        "gradient all-reduce crosses slices once per "
                        "step (composes with --dp/--tp)")
    p.add_argument("--sp", type=int, default=1,
                   help="Sequence-parallel mesh size: ring attention over "
                        "the --train_text_tower sequence axis (the (L, L) "
                        "score matrix never materializes; composes with "
                        "--dp/--tp on one mesh)")
    p.add_argument("--pp", type=int, default=1,
                   help="Pipeline-parallel mesh size: GPipe schedule over "
                        "the --train_text_tower block stack (depth shards "
                        "by stage; composes with --dp/--tp)")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="GPipe microbatches per step (default: --pp)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul activations with f32 master params "
                        "(single MXU pass; numerics within the bf16 "
                        "envelope)")
    p.add_argument("--shard_corpus", action="store_true",
                   help="Shard the HBM-resident feature corpus rows over "
                        "the 'data' mesh axis (for corpora beyond one "
                        "chip's HBM; see docs/SCALING.md)")
    p.add_argument("--train_text_tower", action="store_true",
                   help="Joint text-tower fine-tune: a trainable on-device "
                        "TextTransformer over the cache's stable-hash token "
                        "ids replaces the frozen cached text features "
                        "(gradients flow through the tower in-step)")
    p.add_argument("--text_tower_depth", type=int, default=2,
                   help="Transformer blocks in the --train_text_tower tower")
    p.add_argument("--text_tower_heads", type=int, default=6,
                   help="Attention heads in the --train_text_tower tower "
                        "(default 6x128-dim: measured 2x cheaper than "
                        "BERT's 12x64 at S=64, identical FLOPs)")
    p.add_argument("--tower_gelu", choices=("tanh", "exact"),
                   default="tanh",
                   help="Tower MLP activation: tanh-approx GELU (default; "
                        "fuses into the TPU matmul pipeline) or exact erf "
                        "(measured +2.6 ms/step at the tower_512 protocol). "
                        "Recorded in checkpoint meta and adopted on "
                        "restore, so eval/serving always match training")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="Swap the --train_text_tower MLPs for a switch "
                        "(top-1) mixture-of-experts FFN with this many "
                        "experts; Switch aux losses fold into the loss "
                        "(--moe_aux_weight), expert arrays shard over an "
                        "'ep' mesh axis (docs/SCALING.md)")
    p.add_argument("--moe_aux_weight", type=float, default=1e-2,
                   help="Weight of the Switch load-balance + z aux loss")
    p.add_argument("--remat_tower", action="store_true",
                   help="Rematerialize tower blocks on the backward pass "
                        "(jax.checkpoint): measured 2.4x less live HBM "
                        "for 1.9x step time at depth-4/L-512 — fits "
                        "deeper towers and longer contexts (BASELINE.md "
                        "'Memory levers')")
    p.add_argument("--freeze_gnn", action="store_true",
                   help="Keep the GCN frozen after its degree-recon "
                        "pretrain (the reference's effective semantics); "
                        "default trains it end-to-end in the step")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="Microbatches summed per optimizer step: the "
                        "update equals one step at effective batch = "
                        "batch_size * grad_accum, at the HBM footprint "
                        "of one microbatch (memory lever for effective "
                        "batches past one chip)")
    p.add_argument("--no_scan_epoch", action="store_true",
                   help="Dispatch one device call per batch instead of "
                        "one jitted scan per epoch (debugging aid; the "
                        "scan is numerically identical and ~2x faster "
                        "wall-clock on a tunneled chip)")
    p.add_argument("--fused_adamw", action="store_true",
                   help="AdamW as one fused Pallas elementwise pass "
                        "(bit-identical math; measured at parity with "
                        "the XLA chain on this chip — both sit at the "
                        "~250 GB/s practical streaming ceiling)")
    p.add_argument("--no_fast_dropout_rng", action="store_true",
                   help="Generate in-step dropout masks with threefry "
                        "instead of the rbg PRNG (bit-exact replays "
                        "across compiler versions; rbg is -14% joint "
                        "tower step time)")
    p.add_argument("--shard_graph", action="store_true",
                   help="Shard the (N, N) GCN adjacency rows over the "
                        "'data' mesh axis — the O(N^2) object is the "
                        "first to outgrow one chip (docs/SCALING.md)")
    p.add_argument("--sparse_graph", action="store_true",
                   help="Padded-neighbor-list GCN propagation instead "
                        "of the dense (N, N) a_norm: O(N*K) storage, "
                        "O(B*K) per-step work, no N^2 object anywhere "
                        "(the scale regime where even sharded dense "
                        "rows no longer fit; docs/SCALING.md)")
    p.add_argument("--multihost", action="store_true",
                   help="Call jax.distributed.initialize() before any "
                        "device use (reads JAX_COORDINATOR_ADDRESS / "
                        "JAX_NUM_PROCESSES / JAX_PROCESS_ID; no-op when "
                        "unset or single-process)")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in out_dir")
    p.add_argument("--save_every_steps", type=int, default=0,
                   help="Also write the `latest` checkpoint (async) every "
                        "K optimizer steps, so a mid-epoch preemption "
                        "resumes from the last K-step boundary instead of "
                        "replaying the whole epoch; --resume then lands "
                        "bit-identical to an uninterrupted run (the "
                        "mid-epoch meta records step cursor, batch order "
                        "and shuffle stream). 0 = per-epoch only")
    p.add_argument("--select_metric", default="auc",
                   choices=("auc", "acc", "f1", "precision", "recall"),
                   help="Validation metric for best-checkpoint selection "
                        "and early stop. auc = reference rule (default); "
                        "acc/f1 avoid the measured epoch-1 'boundary "
                        "collapse' lock-in (BASELINE.md accuracy-parity "
                        "notes) when thresholded predictions matter")
    p.add_argument("--hash_salt", type=str, default="",
                   help="Salt for every stable-hash featurization (offline "
                        "hash embeddings, proxies, tower token ids). The "
                        "hash features are a random projection whose "
                        "collision draw measurably moves acc/F1 "
                        "(BASELINE.md accuracy-parity notes); the salt "
                        "makes the draw tunable like a seed. Recorded in "
                        "the cache fingerprint + checkpoint; eval/serving "
                        "adopt it automatically")
    p.add_argument("--auto_salt", type=str, default=None,
                   help="Comma-separated candidate hash salts: train one "
                        "full run per candidate (plus the unsalted "
                        "baseline), select the winner by best VALIDATION "
                        "--select_metric, and adopt its checkpoints/cache "
                        "into out_dir (BASELINE.md 'Tuning the draw': the "
                        "val-selected draw generalizes, +6.8 pt acc on "
                        "held-out seeds). v2 trainer only")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="Write a jax.profiler trace here during fit()")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        # Env var alone is not enough: a PJRT plugin loaded via
        # sitecustomize may have already pinned jax_platforms, so override
        # the config before the backend initializes on first device use.
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # after backend selection

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.multihost:
        from ultrafnd_git_tpu.parallel.mesh import (
            maybe_initialize_distributed,
        )

        if maybe_initialize_distributed():
            print(
                f"multi-host: process {jax.process_index()} of "
                f"{jax.process_count()}"
            )
        else:
            print("multi-host: no coordinator configured — single process")

    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig
    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    data_root = Path(args.data_root).expanduser()
    out_dir = Path(args.out_dir).expanduser()
    ocr_pkl = Path(args.ocr_phrase_pkl).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)

    print("==== ultrafnd_git_tpu v2 ====")
    print(f"Backend:         {jax.default_backend()} ({len(jax.devices())} device(s))")
    print(f"Data root:       {data_root}")
    print(f"OCR phrase pkl:  {ocr_pkl}  (exists: {ocr_pkl.exists()})")
    print(f"Output dir:      {out_dir}")
    print(f"Epochs:          {args.epochs}")
    print(f"Batch size:      {args.batch_size}")
    print(f"Use GNN:         {not args.no_gnn}")
    print(f"GNN overlap thr: {args.gnn_overlap_thresh}")
    print("=============================")

    if args.trainer == "integrated":
        from ultrafnd_git_tpu.training.trainer_integrated import (
            IntegratedForensicTrainer,
            IntegratedTrainConfig,
        )

        ignored = [
            name
            for name, on in (
                ("--train_text_tower", args.train_text_tower),
                ("--dp", args.dp is not None),
                ("--tp", args.tp > 1),
                ("--dcn", args.dcn > 1),
                ("--shard_corpus", args.shard_corpus),
                ("--shard_graph", args.shard_graph),
                ("--sparse_graph", args.sparse_graph),
                ("--freeze_gnn", args.freeze_gnn),
                ("--no_fast_dropout_rng", args.no_fast_dropout_rng),
                ("--select_metric", args.select_metric != "auc"),
                ("--auto_salt", bool(args.auto_salt)),
                ("--grad_accum", args.grad_accum > 1),
                ("--sp", args.sp > 1),
                ("--pp", args.pp > 1),
                ("--moe_experts", args.moe_experts > 0),
            )
            if on
        ]
        if ignored:
            print(
                f"⚠️  {' '.join(ignored)} apply to the v2 trainer only; "
                "the integrated trainer ignores them"
            )
        icfg = IntegratedTrainConfig(
            data_root=str(data_root),
            ocr_phrase_pkl=str(ocr_pkl) if ocr_pkl.exists() else None,
            out_dir=str(out_dir),
            batch_size=args.batch_size,
            epochs=args.epochs,
            lr=args.lr,
            weight_decay=args.weight_decay,
            gnn_dim=args.gnn_dim,
            gnn_overlap_thresh=args.gnn_overlap_thresh,
            seed=args.seed,
            use_gnn=(not args.no_gnn),
            use_evidence=args.use_evidence,
            profile_dir=args.profile_dir,
            scan_epoch=not args.no_scan_epoch,
            bf16_compute=args.bf16,
            resume=args.resume,
            hash_salt=args.hash_salt,
        )
        itrainer = IntegratedForensicTrainer(icfg)
        results = (
            itrainer.test() if args.eval_only else itrainer.train()
        )
        print("\n==== Final Results ====")
        for k, v in results.items():
            print(f"{k.replace('test_', 'Test ').title()}: {v:.4f}")
        return

    cfg = TrainConfig(
        data_root=str(data_root),
        ocr_phrase_pkl=str(ocr_pkl) if ocr_pkl.exists() else None,
        out_dir=str(out_dir),
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        gnn_dim=args.gnn_dim,
        gnn_overlap_thresh=args.gnn_overlap_thresh,
        seed=args.seed,
        use_gnn=(not args.no_gnn),
        use_evidence=args.use_evidence,
        save_best=True,
        dp=args.dp,
        tp=args.tp,
        dcn=args.dcn,
        sp=args.sp,
        pp=args.pp,
        pp_microbatches=args.pp_microbatches,
        shard_corpus=args.shard_corpus,
        shard_graph=args.shard_graph,
        sparse_graph=args.sparse_graph,
        scan_epoch=not args.no_scan_epoch,
        grad_accum=args.grad_accum,
        fused_adamw=args.fused_adamw,
        fast_dropout_rng=not args.no_fast_dropout_rng,
        select_metric=args.select_metric,
        hash_salt=args.hash_salt,
        bf16_compute=args.bf16,
        resume=args.resume,
        save_every_steps=args.save_every_steps,
        eval_only=args.eval_only,
        profile_dir=args.profile_dir,
        train_text_tower=args.train_text_tower,
        text_tower_depth=args.text_tower_depth,
        text_tower_heads=args.text_tower_heads,
        tower_gelu=args.tower_gelu,
        moe_experts=args.moe_experts,
        moe_aux_weight=args.moe_aux_weight,
        remat_tower=args.remat_tower,
        train_gnn=not args.freeze_gnn,
    )

    if args.auto_salt:
        if args.eval_only or args.resume:
            raise SystemExit(
                "--auto_salt trains fresh candidate runs; it cannot be "
                "combined with --eval_only or --resume"
            )
        import dataclasses

        from ultrafnd_git_tpu.training.salt_search import (
            parse_salt_list,
            search_hash_salt,
        )

        # an explicit --hash_salt is a candidate too, not silently dropped
        candidates = parse_salt_list(args.auto_salt)
        if args.hash_salt and args.hash_salt not in candidates:
            candidates.insert(0, args.hash_salt)
        winner, _scores = search_hash_salt(cfg, candidates)
        # out_dir now holds the winner's artifacts — score its best slot
        # exactly as a direct `--hash_salt <winner> --eval_only` run would
        cfg = dataclasses.replace(cfg, hash_salt=winner, eval_only=True)
        trainer = ForensicTrainer(cfg)
        print("\n>>> Testing best checkpoint (auto_salt winner)...")
        results = trainer.test()
        _print_results(results, extra=f"Selected hash_salt: {winner!r}")
        return

    trainer = ForensicTrainer(cfg)

    if not args.eval_only:
        print("\n>>> Training...")
        trainer.fit()

    print("\n>>> Testing best checkpoint...")
    results = trainer.test()
    _print_results(results)


def _print_results(results, extra=None):
    print("\n==== Final Results ====")
    if extra:
        print(extra)
    print(f"Test Loss: {results['test_loss']:.4f}")
    print(f"Test Acc : {results['test_acc']:.4f}")
    print(f"Test AUC : {results['test_auc']:.4f}")
    for k in ("test_precision", "test_recall", "test_f1", "test_cmcs", "test_dfdr"):
        if k in results:
            print(f"{k.replace('test_', 'Test ').title()}: {results[k]:.4f}")


if __name__ == "__main__":
    main()
