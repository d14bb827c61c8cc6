"""The canonical cache-based trainer (v2 path), TPU-native.

Parity target: reference `src/training/forensic_trainer.py` (`TrainConfig`,
`ForensicTrainer.fit/.test`): feature cache -> transductive OCR-Jaccard
graph + GCN -> fusion + NODE classifier, AdamW with epoch-staircase LR
decay, grad-clip, CE loss, early stop on val AUC (patience 3, min delta
1e-4), best-checkpoint save/load, test with extended metrics
(acc/AUC/P/R/F1/CMCS/DFDR).

TPU-first design (the reasons this is not a port):
  * the whole feature cache lives in HBM; a train step receives only a
    (B,) index vector and gathers on device — zero per-step host->device
    feature traffic (the reference round-trips every batch + every metric,
    SURVEY §3.1 "process/device boundaries").
  * one jitted step fuses: full-graph GCN -> gather -> fusion -> classifier
    -> masked CE -> backward -> AdamW update. Fixed shapes everywhere; the
    ragged last batch is padded + masked instead of recompiled.
  * GCN node embeddings are recomputed differentiably inside the step (the
    reference trains against a frozen no-grad cache — SURVEY §2.2 quirk,
    resolved deliberately as recommended).
  * optional (dp, tp) mesh: batch indices shard over 'data', the big MLPs
    shard Megatron-style over 'model'; XLA inserts the ICI collectives.
  * full-state Orbax checkpoints: `best` (val-AUC improvement, reference
    semantics) and `latest` (every epoch, restart-from-latest recovery).
  * optional jax.profiler trace + per-epoch JSONL metrics log.
"""
from __future__ import annotations

import math
import os
import time
from dataclasses import asdict, dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ultrafnd_git_tpu.data.cache import bootstrap_cache
from ultrafnd_git_tpu.ops.hashing import set_hash_salt
from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
from ultrafnd_git_tpu.models.fusion import CrossModalTransformer
from ultrafnd_git_tpu.models.gnn import SimpleGCN
from ultrafnd_git_tpu.parallel import mesh as meshlib
from ultrafnd_git_tpu.training import checkpoint as ckpt
from ultrafnd_git_tpu.training.loop import (
    ImprovementTracker,
    flatten_epoch_rows,
    iter_padded_batches,
    load_checkpoint_guarded,
    log_jsonl,
    np_random_state_payload,
    profiler_trace,
    restore_np_random_state,
)
from ultrafnd_git_tpu.training.metrics import aggregate_epoch_metrics, pretty_print
from ultrafnd_git_tpu.training.state import (
    TrainState,
    create_train_state,
    make_optimizer,
)


@dataclass
class TrainConfig:
    """Train-run configuration (CLI flags map 1:1 onto these fields).

    NOTE: ForensicTrainer.__init__ ADOPTS checkpoint-bound fields from
    the slot it will restore (``--resume`` -> latest, ``--eval_only`` ->
    best): train_text_tower/depth/heads, train_gnn, hash_salt. The
    instance you pass in is updated in place so that everything you
    inspect afterwards reflects the run that actually executed; pass a
    fresh instance (or dataclasses.replace copy) if you need the
    original values preserved.
    """

    data_root: str
    ocr_phrase_pkl: Optional[str] = None
    out_dir: str = "outputs"
    batch_size: int = 16
    epochs: int = 8
    lr: float = 2e-4
    weight_decay: float = 1e-4
    gnn_dim: int = 128
    gnn_overlap_thresh: float = 0.12
    seed: int = 42
    use_gnn: bool = True
    # Train the GCN end-to-end inside the step (True, the deliberate
    # TPU-native default per SURVEY §2.2's recommendation) or keep it
    # frozen after the degree-recon pretrain (False — the reference's
    # effective semantics: its GCN params get no gradient during main
    # training). Measured on the hard parity fixture the two are within
    # noise of each other, so the flag exists for semantics parity, not
    # accuracy; frozen mode also skips the graph backward pass.
    train_gnn: bool = True
    use_evidence: bool = False  # feed real evidence-scorer outputs to fusion
    # Joint text-tower fine-tune: replace the cached text features with a
    # trainable on-device TextTransformer (models/transformer.py) over the
    # cache's stable-hash token ids — gradients flow through the tower in
    # the same jitted step. Something the reference architecture (frozen
    # host encoders -> cached features) could never do.
    train_text_tower: bool = False
    text_tower_depth: int = 2
    # 6 heads x 128-dim, not BERT's 12 x 64: at the tower's S=64 the
    # (S, S) attention matmuls are batched 64^3 dots whose cost halves
    # when the head dim fills the chip's 128-wide lanes — measured
    # fwd+bwd 2.46 ms/block at 6x128 vs 4.29 at 12x64, identical FLOPs
    # (BASELINE.md round-3). Checkpoints record the value; restores
    # adopt it, so old 12-head towers keep serving unchanged.
    text_tower_heads: int = 6
    # Tower MLP activation: "tanh" (default — fuses into the matmul
    # pipeline; exact erf measured +2.6 ms/step at tower_512 bf16, see
    # BASELINE.md round-3 op ablation) or "exact". Recorded in checkpoint
    # meta; restores adopt the trained value ("exact" when the meta
    # predates the field, so old checkpoints score bit-identically).
    tower_gelu: str = "tanh"
    # moe_experts > 0 swaps the tower's dense MLPs for the switch-MoE
    # FFN (models/moe.py): top-1 routed experts, Switch aux losses
    # (load balance + z-loss) folded into the training loss with weight
    # moe_aux_weight. Expert arrays shard over an 'ep' mesh axis (see
    # docs/SCALING.md; the driver dryrun executes EP-sharded training).
    moe_experts: int = 0
    moe_aux_weight: float = 1e-2
    # sp > 1 runs the joint tower with its SEQUENCE axis sharded over an
    # 'sp' mesh axis as ring attention (parallel/sequence.py): the
    # (L, L) score matrix never materializes, context length scales
    # linearly with the ring. Composes with dp/tp on one mesh (batch on
    # 'data', sequence on 'sp'). Tower dropout runs via the COORD scheme
    # (masks keyed on global row/position, models/transformer.
    # coord_dropout) so training is dropout-exact against the
    # coord-keyed plain tower and invariant to the ring size; it differs
    # from the default flax mask stream only in mask derivation (same
    # rate/distribution). Tower token length must divide sp.
    sp: int = 1
    # pp > 1 runs the joint tower's block stack under a GPipe pipeline
    # over a 'pipe' mesh axis (parallel/pipeline.py): depth shards by
    # stage, activations hop stage->stage via ppermute, the batch stays
    # sharded on 'data'. Same coord-dropout note as sp (per-block keys
    # fold on global block index; masks key on global batch rows);
    # tower depth must divide pp; pp_microbatches defaults to pp.
    pp: int = 1
    pp_microbatches: Optional[int] = None
    # jax.checkpoint each tower block on the backward pass: recompute
    # the (B, L, 4W) MLP activations instead of storing them. Measured
    # (depth 4, L 512, batch 256, bf16, 1x v5-lite): 13.1 -> 5.5 GB temp
    # HBM (2.40x) for 1.86x step time — see BASELINE.md "Memory levers"
    # and scripts/bench_memory_levers.py. Exact (same dropout rngs
    # replay); the lever for deep towers / long contexts.
    remat_tower: bool = False
    save_best: bool = True
    grad_clip: float = 5.0
    early_stop_patience: int = 3
    # Validation metric driving best-checkpoint selection + early stop.
    # "auc" is the reference rule (forensic_trainer.py:350-366) and the
    # parity default. Measured caveat with it (BASELINE.md "Accuracy
    # parity"): val AUC often peaks at epoch 1-2 while the decision
    # boundary is still unsettled, so the selected checkpoint can rank
    # well yet predict near-constant labels ("boundary collapse") —
    # "acc" or "f1" select for thresholded behavior instead.
    select_metric: str = "auc"
    # Featurization salt for every stable-hash-derived feature (offline
    # hash embeddings, unit-score proxies, tower token ids). "" is the
    # canonical FNV draw. The hash features are a random projection whose
    # collision pattern is a DRAW, and the draw measurably moves acc/F1
    # on hash-featurized corpora (BASELINE.md "Accuracy parity,
    # attributed") — the salt makes the draw a tunable seed. Recorded in
    # the cache fingerprint and checkpoint cfg; serving and eval adopt it
    # automatically. OCR token sets (and so the Jaccard graph) never move.
    hash_salt: str = ""
    # --- TPU-native extras (absent in the reference) ---
    cache_to_disk: bool = True  # persist feature cache; eval-only reuses it
    resume: bool = False  # restart from the `latest` checkpoint if present
    # Step-granular preemption safety (VERDICT r4 item 3): > 0 writes an
    # async `latest` checkpoint every K optimizer steps IN ADDITION to
    # the per-epoch write — under scan_epoch the epoch scan is chunked
    # into ceil(steps/K) scans so there is a host boundary to save at
    # (numerically identical: same step sequence, same RNG folds; the
    # chunking is asserted against the single-scan epoch by
    # tests/test_trainer_resume.py). The mid-epoch meta records the
    # step cursor, the epoch's batch order, and the np.random shuffle
    # stream, so `--resume` after a mid-epoch SIGKILL replays the
    # remaining steps and lands BIT-IDENTICAL to an uninterrupted run
    # (the resumed epoch's console/JSONL train metrics cover only the
    # replayed tail; val/test metrics are full and identical). 0 = epoch
    # granularity only (a preemption replays the whole epoch).
    save_every_steps: int = 0
    eval_only: bool = False  # no fit(); test() restores `best` (CLI hint)
    dp: Optional[int] = None  # data-parallel mesh size (None = no mesh)
    tp: int = 1  # tensor-parallel mesh size
    # dcn > 1 adds an OUTER data-parallel axis for MULTI-SLICE pods:
    # batches shard jointly over ('dcn', 'data') — mesh.data_axes — so
    # each slice takes a contiguous batch block and XLA lowers the
    # gradient all-reduce hierarchically (ICI within a slice, one
    # cross-slice hop over DCN per step). tp stays within a slice. On
    # real multi-slice device sets make_mesh maps the axis exactly onto
    # slice boundaries (create_hybrid_device_mesh); sp/pp keep their
    # single-data-axis shard_map bodies and are excluded.
    dcn: int = 1
    shard_corpus: bool = False  # shard (N, D) corpus rows over 'data'
    shard_graph: bool = False  # shard the (N, N) adjacency rows over 'data'
    # Padded-neighbor-list graph instead of the dense (N, N) a_norm: the
    # per-step propagation gathers K neighbor slots per batch row
    # (O(B·K·H)) and NO O(N^2) object exists anywhere — host build is
    # the native O(E) edge lister, device storage is O(N·K). Same GCN
    # params/math (f32-close, not bit-identical: different summation
    # order; tests/test_sparse_graph.py). This is the scale lever SURVEY
    # §7 asks for past dense-shardable N (dense at N=100k is 40 GB;
    # sparse at K~100 is ~80 MB). Composes with shard_graph (neighbor
    # rows shard over 'data'). Default off: at FakeSV N=5376 the dense
    # matmul is faster than gathers on the MXU.
    sparse_graph: bool = False
    mesh_backend: Optional[str] = None  # e.g. "cpu" to mesh over host devices
    bf16_compute: bool = False  # bf16 matmuls with f32 master params
    # Run each epoch as ONE jitted lax.scan over its (steps, B) index
    # matrix instead of one dispatch per batch. On a tunneled chip every
    # host->device call carries ~90 ms of fixed latency (BASELINE.md
    # "transfer degradation"), so per-step dispatch dominates wall time
    # at FakeSV batch counts; the scan ships the whole epoch's indices in
    # one upload. Works with or without a mesh: single-process shards
    # the (steps, B) matrices on the batch axis; true multi-PROCESS runs
    # assemble them from per-host local batch columns
    # (meshlib.put_epoch_batches) — every process computes the same
    # seeded index stream, so the global matrices agree by construction.
    # Executed 2-process for real by tests/test_multihost.py.
    scan_epoch: bool = True
    # Gradient accumulation: each optimizer step accumulates summed
    # gradients over `grad_accum` microbatches of `batch_size` rows and
    # normalizes by the TOTAL valid-row count, so the update equals one
    # step at effective batch = batch_size * grad_accum (bit-level up to
    # f32 summation order; asserted by tests/test_trainer.py). The
    # reference has no analogue (its MPS box simply OOMs past its batch);
    # here it is the memory lever for effective batches past one chip's
    # HBM — microbatch activations are freed between scan slices, only
    # the grad-sum pytree persists.
    grad_accum: int = 1
    # AdamW as one fused Pallas elementwise pass (kernels/adamw.py)
    # instead of XLA's optax chain. Bit-identical under jit (asserted,
    # tests/test_fused_adamw.py). Measured on this 1x v5-lite: PARITY,
    # not a win (1.10 vs 1.04 ms/update on the 13M-param tree) — the
    # chip's practical elementwise-stream rate is ~230-260 GB/s
    # (measured with a bare scale+add pass) and XLA's chain already
    # sits at it, so default OFF; the kernel is the lever for hardware
    # where XLA's optimizer fusion is below the streaming ceiling. On
    # non-TPU backends the same math runs as plain jnp. The fused
    # opt_state is a {count, mu, nu} dict — recorded in checkpoint meta
    # and adopted on resume/eval.
    fused_adamw: bool = False
    # In-step dropout masks via the rbg PRNG instead of threefry: -14%
    # joint tower_512 step time measured (44.7 -> 38.4 ms); see
    # _make_train_step. False = threefry everywhere (bit-exact replays
    # across compiler versions).
    fast_dropout_rng: bool = True
    profile_dir: Optional[str] = None  # jax.profiler trace output
    debug_nans: bool = False
    log_metrics_jsonl: bool = True
    fusion_config: str = "configs/model_configs/fusion.yaml"
    classifier_config: str = "configs/model_configs/classifier.yaml"


class ForensicTrainer:
    """Cache-based multimodal trainer with a transductive GCN channel."""

    def __init__(self, cfg: TrainConfig, cache: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        os.makedirs(cfg.out_dir, exist_ok=True)
        # Adopt train_text_tower from the checkpoint that will actually
        # be RESTORED (resume -> latest, eval_only -> best): without it
        # the restore template lacks the tower pytree, the guarded load
        # fails, and --eval_only would silently score random weights.
        # A fresh training run (neither flag) keeps the user's requested
        # architecture — its checkpoints overwrite the old ones anyway.
        adopt_slot = (
            "latest" if cfg.resume else ("best" if cfg.eval_only else None)
        )
        if adopt_slot:
            import json as _json

            meta_p = os.path.join(cfg.out_dir, adopt_slot, "meta.json")
            saved = {}
            if os.path.exists(meta_p):
                try:
                    with open(meta_p, "r", encoding="utf-8") as fh:
                        saved = _json.load(fh).get("cfg", {})
                except Exception:
                    saved = {}
            if saved.get("train_text_tower") and not cfg.train_text_tower:
                print(
                    "note: checkpoint was trained with "
                    "--train_text_tower; adopting it"
                )
                cfg.train_text_tower = True
            if saved.get("train_text_tower"):
                # The tower ARCHITECTURE is part of the trained function
                # — adopt it even when --train_text_tower was passed
                # explicitly. heads is the silent one: attention params
                # (qkv/out Dense) are shape-identical for ANY head
                # count, so a mismatched restore would succeed and
                # compute attention with the wrong head partition (a
                # depth mismatch at least fails the guarded restore
                # loudly). gelu defaults to "exact" for metas that
                # predate the field.
                for field, default in (
                    ("text_tower_depth", 2),
                    ("text_tower_heads", 12),
                    ("moe_experts", 0),
                ):
                    saved_v = int(saved.get(field, default))
                    if saved_v != getattr(cfg, field):
                        print(
                            f"note: checkpoint tower was trained with "
                            f"{field}={saved_v}; adopting it"
                        )
                        setattr(cfg, field, saved_v)
                saved_gelu = str(saved.get("tower_gelu", "exact"))
                if saved_gelu != cfg.tower_gelu:
                    print(
                        "note: checkpoint tower was trained with "
                        f"tower_gelu={saved_gelu}; adopting it"
                    )
                    cfg.tower_gelu = saved_gelu
            if saved and bool(saved.get("train_gnn", True)) != cfg.train_gnn:
                # the frozen-GNN optimizer wraps the chain in
                # multi_transform — opt_state structure must match the
                # checkpoint or the guarded restore fails and eval/resume
                # would silently run fresh params
                print(
                    "note: checkpoint was trained with "
                    f"train_gnn={saved.get('train_gnn', True)}; adopting it"
                )
                cfg.train_gnn = bool(saved.get("train_gnn", True))
            if saved and bool(
                saved.get("fused_adamw", False)
            ) != cfg.fused_adamw:
                # fused opt_state is a {count, mu, nu} dict, the optax
                # chain a tuple-of-states — the restore template must
                # match the slot or the guarded load falls back to fresh
                # params (old checkpoints lack the key -> optax chain)
                print(
                    "note: checkpoint was trained with "
                    f"fused_adamw={saved.get('fused_adamw', False)}; "
                    "adopting it"
                )
                cfg.fused_adamw = bool(saved.get("fused_adamw", False))
            if saved and saved.get("hash_salt", "") != cfg.hash_salt:
                # the salt IS the featurization draw — evaluating/resuming
                # a checkpoint under a different draw silently scores it
                # on features it never saw (a rebuilt cache, new records)
                print(
                    "note: checkpoint was trained with hash_salt="
                    f"{saved.get('hash_salt', '')!r}; adopting it"
                )
                cfg.hash_salt = str(saved.get("hash_salt", ""))
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self.rng = jax.random.PRNGKey(cfg.seed)
        np.random.seed(cfg.seed)

        # the salt must be live BEFORE any featurization (cache build,
        # fingerprint, tower tokenization) — see ops/hashing.set_hash_salt
        set_hash_salt(cfg.hash_salt)

        # ---- 1) feature cache (injected > on-disk > rebuilt) --------------
        self.cache = bootstrap_cache(
            cfg.data_root,
            cfg.out_dir,
            ocr_phrase_pkl=cfg.ocr_phrase_pkl,
            seed=cfg.seed,
            cache_to_disk=cfg.cache_to_disk,
            cache=cache,
            # a restored checkpoint was trained on the on-disk cache's
            # feature map — keep it even across a feature-code bump
            reuse_stale_features=bool(cfg.eval_only or cfg.resume),
        )
        self.tr_idx, self.va_idx, self.te_idx = (
            np.asarray(s) for s in self.cache["split"]
        )
        self.n_total = int(self.cache["labels"].shape[0])

        # ---- 2) mesh (optional) ------------------------------------------
        self.mesh = None
        for flag, val in (("--sp", cfg.sp), ("--pp", cfg.pp)):
            if val > 1:
                if not cfg.train_text_tower:
                    raise ValueError(
                        f"{flag} transforms the text tower; it requires "
                        "--train_text_tower"
                    )
                if cfg.moe_experts > 0:
                    raise ValueError(
                        f"{flag} and --moe_experts are mutually exclusive "
                        "(the transformed tower has a dense MLP body)"
                    )
        if cfg.sp > 1 and cfg.pp > 1:
            raise ValueError(
                "--sp and --pp are mutually exclusive (one tower "
                "transform at a time; they compose with --dp/--tp)"
            )
        if cfg.pp > 1 and cfg.text_tower_depth % cfg.pp:
            raise ValueError(
                f"tower depth {cfg.text_tower_depth} not divisible by "
                f"pp={cfg.pp}"
            )
        if cfg.dcn > 1 and (cfg.sp > 1 or cfg.pp > 1):
            raise ValueError(
                "--dcn composes with --dp/--tp only: the sp/pp shard_map "
                "bodies address the batch by the single 'data' axis (ring "
                "and pipeline stay within a slice by design)"
            )
        if (
            cfg.dp is not None or cfg.tp > 1 or cfg.sp > 1 or cfg.pp > 1
            or cfg.dcn > 1
        ):
            devices = (
                jax.devices(cfg.mesh_backend) if cfg.mesh_backend else None
            )
            extra = []
            if cfg.sp > 1:
                extra.append(("sp", cfg.sp))
            if cfg.pp > 1:
                extra.append(("pipe", cfg.pp))
            self.mesh = meshlib.make_mesh(
                dp=cfg.dp, tp=cfg.tp, devices=devices,
                extra_axes=tuple(extra), dcn=cfg.dcn,
            )

        # ---- 3) device-resident corpus + graph ---------------------------
        # shard_corpus distributes the (N, D) feature rows over the 'data'
        # axis (the SCALING.md growth path for corpora beyond one chip's
        # HBM); XLA turns the per-step gathers into collectives. Default
        # off: at FakeSV scale replication avoids the gather traffic.
        put = (
            self._put_row_sharded
            if (cfg.shard_corpus and self.mesh is not None)
            else self._put_replicated
        )
        # tower mode never reads the cached text rows on device — only
        # their width; uploading them would pin dead HBM for the run
        self.text_width = int(self.cache["text"].shape[1])
        self.TEXT = (
            None if cfg.train_text_tower else put(self.cache["text"])
        )
        self.AUD = put(self.cache["audio"])
        self.VIS = put(self.cache["visual"])
        self.TEMP = put(self.cache["temporal"])
        self.AUX = put(self.cache["aux"])
        self.LABELS = put(self.cache["labels"].astype(np.int32))
        self.EVID = None
        if cfg.use_evidence and "evidence" in self.cache:
            self.EVID = put(self.cache["evidence"].astype(np.float32))

        # Graph context (compact node features + normalized adjacency +
        # constant first propagation) — shared with serving so both build
        # the identical graph (ops/graphctx.py). XG/AX stay replicated
        # (O(N·F), small); the (N, N) adjacency — the corpus's O(N^2)
        # object and the first thing to outgrow one chip's HBM — can be
        # row-sharded over 'data' with `shard_graph`: the per-step
        # A[out_rows] gather and the pretrain reductions then run on
        # shards, with XLA inserting the cross-device exchanges. Default
        # off: at FakeSV scale (5376^2 f32 = 116 MB) replication avoids
        # the gather traffic.
        from ultrafnd_git_tpu.ops.graphctx import (
            build_graph_context,
            build_sparse_graph_context,
        )

        rep = self._put_replicated
        put_graph = (
            self._put_row_sharded
            if (cfg.shard_graph and self.mesh is not None)
            else rep
        )
        if cfg.sparse_graph and cfg.use_gnn:
            # padded neighbor lists — no (N, N) object built at all
            # (see the sparse_graph config comment); the (N, K) rows
            # take the same 'data' row sharding the dense a_norm would
            gctx = build_sparse_graph_context(
                self.cache, cfg.gnn_overlap_thresh
            )
            self.A_NORM = None
            self.NBR_IDX = put_graph(gctx.nbr_idx)
            self.NBR_W = put_graph(gctx.nbr_w)
        else:
            gctx = build_graph_context(self.cache, cfg.gnn_overlap_thresh)
            self.A_NORM = put_graph(gctx.a_norm)
            self.NBR_IDX = self.NBR_W = None
        self.XG = rep(gctx.xg)
        self.AX = rep(gctx.ax)

        # The HBM-resident arrays travel through every jitted step as ONE
        # pytree ARGUMENT. Capturing them in the step closure instead
        # ships them inside the remote-compile payload, which blows the
        # tunnel's request limit once the (N, N) adjacency passes ~400 MB
        # (HTTP 413 measured at N=10752) — as arguments they stay in HBM.
        self.corpus = {
            "audio": self.AUD,
            "visual": self.VIS,
            "temporal": self.TEMP,
            "aux": self.AUX,
            "labels": self.LABELS,
            "xg": self.XG,
            "ax": self.AX,
        }
        if self.A_NORM is not None:
            self.corpus["a_norm"] = self.A_NORM
        if self.NBR_IDX is not None:
            self.corpus["nbr_idx"] = self.NBR_IDX
            self.corpus["nbr_w"] = self.NBR_W
        if self.EVID is not None:
            self.corpus["evidence"] = self.EVID
        if cfg.train_text_tower:
            if float(np.asarray(self.cache["text_mask"]).sum()) == 0.0:
                raise ValueError(
                    "--train_text_tower needs token ids, but this cache "
                    "has none (a pre-v3 cache loads with zero-filled "
                    "ids) — delete feature_cache.npz in the out_dir to "
                    "rebuild it"
                )
            # the cached text rows are unused with the tower — carrying
            # them through every step would be dead HBM/argument traffic
            self.corpus["text_ids"] = rep(
                self.cache["text_ids"].astype(np.int32)
            )
            self.corpus["text_mask"] = rep(
                self.cache["text_mask"].astype(np.float32)
            )
        else:
            self.corpus["text"] = self.TEXT

        # ---- 4) models ----------------------------------------------------
        self.fusion = CrossModalTransformer.from_config(cfg.fusion_config)
        if not cfg.use_gnn:
            self.fusion = self.fusion.clone(use_gnn=False)
        self.clf = DeepTruthClassifier.from_config(cfg.classifier_config)
        if cfg.bf16_compute:
            # bf16-compute / f32-master: params (and the optimizer state,
            # checkpoints, parity surface) stay float32; only the fusion/
            # classifier matmul activations run bf16 — one MXU pass
            # instead of XLA's 3-pass bf16 decomposition of f32.
            self.fusion = self.fusion.clone(dtype=jnp.bfloat16)
            self.clf = self.clf.clone(dtype=jnp.bfloat16)
        self.gnn = SimpleGCN(
            hid=2 * cfg.gnn_dim, out_dim=cfg.gnn_dim, dropout=0.2
        )

        self.rng, k_f, k_c, k_g, k_state = jax.random.split(self.rng, 5)
        B = cfg.batch_size
        dummy_feats = {
            "text_features": jnp.zeros((B, self.text_width)),
            "audio_features": jnp.zeros((B, self.AUD.shape[1])),
            "visual_features": jnp.zeros((B, self.VIS.shape[1])),
            "temporal_features": jnp.zeros((B, self.TEMP.shape[1])),
        }
        if cfg.use_gnn:
            dummy_feats["gnn_feat"] = jnp.zeros((B, cfg.gnn_dim))
        params = {
            "fusion": self.fusion.init(k_f, dummy_feats)["params"],
            "clf": self.clf.init(
                k_c, jnp.zeros((B, self.fusion.hidden)), jnp.zeros((B, 2))
            )["params"],
            # sparse mode initializes through the neighbor-list branch;
            # both branches create identical param shapes (lin1 from
            # ax's width, lin2 from hid), so checkpoints interchange
            "gnn": self.gnn.init(
                k_g, self.XG, self.A_NORM, normalize=False,
                **self._gnn_graph_kwargs(),
            )["params"],
        }

        self.text_tower = None
        if cfg.train_text_tower:
            from ultrafnd_git_tpu.data.cache import TOWER_VOCAB
            from ultrafnd_git_tpu.models.transformer import TextTransformer

            if cfg.tower_gelu not in ("tanh", "exact"):
                # validated HERE (after checkpoint adoption) so a typo'd
                # flag or a hand-edited meta errors instead of silently
                # training tanh via the `!= "exact"` comparison
                raise ValueError(
                    "tower_gelu must be 'tanh' or 'exact', got "
                    f"{cfg.tower_gelu!r}"
                )

            L = int(self.cache["text_ids"].shape[1])
            if cfg.sp > 1 and L % cfg.sp:
                raise ValueError(
                    f"tower token length {L} not divisible by sp={cfg.sp}"
                )
            self.text_tower = TextTransformer(
                width=self.text_width,
                depth=cfg.text_tower_depth,
                heads=cfg.text_tower_heads,
                vocab_size=TOWER_VOCAB,
                max_len=L,
                # the tower dominates the joint step (~60 ms vs 2.3 ms
                # frozen) — it gets the same bf16-compute lever
                dtype=jnp.bfloat16 if cfg.bf16_compute else None,
                remat=cfg.remat_tower,
                moe_experts=cfg.moe_experts,
                gelu=cfg.tower_gelu,
            )
            self.rng, k_t = jax.random.split(self.rng)
            params["text_tower"] = self.text_tower.init(
                k_t,
                jnp.zeros((B, L), jnp.int32),
                jnp.ones((B, L), jnp.float32),
                deterministic=True,
            )["params"]

        if cfg.use_gnn and not (
            cfg.eval_only and ckpt.checkpoint_exists(cfg.out_dir, "best")
        ):
            # degree-recon warm start; skipped when eval-only is about to
            # restore `best` wholesale (two full-graph steps of pure
            # waste, O(N^2) on the graph-scaling path)
            params["gnn"] = self._pretrain_gnn(params["gnn"])

        # ---- 5) optimizer + state ----------------------------------------
        # grad_accum: the LR staircase counts OPTIMIZER steps, and one
        # optimizer step now consumes batch_size * grad_accum rows
        steps_per_epoch = max(
            1, math.ceil(len(self.tr_idx) / (B * max(1, cfg.grad_accum)))
        )
        self.tx = make_optimizer(
            cfg.lr, cfg.weight_decay, cfg.grad_clip, steps_per_epoch,
            frozen_subtrees=() if cfg.train_gnn else ("gnn",),
            fused=cfg.fused_adamw,
        )
        state = create_train_state(params, self.tx, k_state)
        if self.mesh is not None:
            state = state.replace(
                params=meshlib.shard_params(state.params, self.mesh)
            )
        self.state = state

        self.start_epoch = 1
        self.best_val_auc = -1.0
        self.no_improve = 0
        # mid-epoch resume cursor (save_every_steps checkpoints): the
        # number of optimizer steps of `start_epoch` already executed,
        # plus that epoch's full (already shuffled) batch order
        self._resume_cursor = 0
        self._resume_order: Optional[np.ndarray] = None
        if cfg.resume:
            restored = load_checkpoint_guarded(
                cfg.out_dir, "latest", self.state, "v2", "starting fresh"
            )
            if restored is not None:
                self.state, meta = restored
                if self.mesh is not None:
                    # restore returns host-placed arrays — re-apply the
                    # mesh shardings or resumed training silently loses TP
                    self.state = self.state.replace(
                        params=meshlib.shard_params(
                            self.state.params, self.mesh
                        )
                    )
                if meta.get("in_epoch"):
                    # mid-epoch slot: re-enter the SAME epoch at the
                    # recorded step cursor with the recorded batch order
                    self.start_epoch = int(meta.get("epoch", 1))
                    self._resume_cursor = int(meta.get("step_cursor", 0))
                    self._resume_order = np.asarray(
                        meta["epoch_order"], np.int32
                    )
                else:
                    self.start_epoch = int(meta.get("epoch", 0)) + 1
                self.best_val_auc = float(meta.get("best_val_auc", -1.0))
                self.no_improve = int(meta.get("no_improve", 0))
                # restore the shuffle stream so the remaining epochs'
                # batch orders match the uninterrupted run bit-exactly
                # (older checkpoints without the field keep the legacy
                # fresh-seed behavior)
                rs = meta.get("np_random_state")
                if rs is not None:
                    restore_np_random_state(rs)

        self._train_step = jax.jit(self._make_train_step(), donate_argnums=0)
        self._eval_step = jax.jit(self._make_eval_step())
        self._train_epoch = jax.jit(
            self._make_train_epoch(), donate_argnums=0
        )
        self._eval_epoch = jax.jit(self._make_eval_epoch())

    # ------------------------------------------------------------------
    def _put_replicated(self, x: np.ndarray) -> jax.Array:
        if self.mesh is not None:
            # multi-host aware: device_put with a sharding spanning
            # non-addressable devices fails on multi-process slices; the
            # mesh helper assembles from per-process local data there
            # (single-process takes the plain device_put path inside)
            return meshlib.put_replicated_global(np.asarray(x), self.mesh)
        return jax.device_put(jnp.asarray(x))

    def _put_row_sharded(self, x: np.ndarray) -> jax.Array:
        """Shard leading (node) axis over the data axes; replicate if
        not divisible."""
        arr = np.asarray(x)
        dp = meshlib.data_parallel_size(self.mesh)
        if arr.shape[0] % dp or (
            jax.process_count() > 1
            and arr.shape[0] % jax.process_count()
        ):
            return self._put_replicated(arr)
        return meshlib.put_global_batch(arr, self.mesh)

    def _batch_arrays(self, idx: np.ndarray, mask: np.ndarray):
        if self.mesh is not None:
            # multi-host aware: per-host local rows assembled into the
            # global batch array (single-process = plain sharded put)
            i = meshlib.put_global_batch(
                np.asarray(idx, np.int32), self.mesh
            )
            m = meshlib.put_global_batch(
                np.asarray(mask, np.float32), self.mesh
            )
            return i, m
        return jnp.asarray(idx, jnp.int32), jnp.asarray(mask, jnp.float32)

    # ------------------------------------------------------------------
    def _gnn_graph_kwargs(self) -> Dict[str, Any]:
        """Sparse-graph kwargs for host-side gnn.init/apply calls (the
        jitted _forward reads the same arrays from `corpus` instead)."""
        if self.NBR_IDX is None:
            return {}
        return {
            "ax": self.AX, "nbr_idx": self.NBR_IDX, "nbr_w": self.NBR_W
        }

    def _pretrain_gnn(self, gnn_params, epochs: int = 2):
        """Degree-reconstruction warm start (fixed random readout head)."""
        self.rng, k_head, k_drop = jax.random.split(self.rng, 3)
        head_w = (
            jax.random.normal(k_head, (self.cfg.gnn_dim, 1))
            / self.cfg.gnn_dim**0.5
        )
        # normalized-degree target; the sparse rows hold exactly the
        # dense row's nonzeros, so their sum is the same value (up to
        # f32 summation order)
        if self.NBR_IDX is not None:
            deg = self.NBR_W.sum(axis=-1, keepdims=True)
        else:
            deg = self.A_NORM.sum(axis=-1, keepdims=True)
        target = deg / jnp.maximum(1.0, float(self.n_total))

        opt = optax.adamw(1e-3, weight_decay=1e-4)
        opt_state = opt.init(gnn_params)

        # Graph arrays are ARGUMENTS, not closure constants: a captured
        # array is shipped inside the compile payload, and the (N, N)
        # adjacency blows the tunnel's remote-compile request limit
        # (HTTP 413 at N~10k). As arguments they stay in HBM.
        @jax.jit
        def step(p, o, key, xg, graph, ax, head, tgt):
            def loss_fn(p):
                z = self.gnn.apply(
                    {"params": p},
                    xg,
                    graph.get("a_norm"),
                    deterministic=False,
                    normalize=False,
                    ax=ax,
                    nbr_idx=graph.get("nbr_idx"),
                    nbr_w=graph.get("nbr_w"),
                    rngs={"dropout": key},
                )
                pred = jax.nn.sigmoid(z @ head)
                return jnp.mean((pred - tgt) ** 2)

            g = jax.grad(loss_fn)(p)
            updates, o = opt.update(g, o, p)
            return optax.apply_updates(p, updates), o

        graph = (
            {"nbr_idx": self.NBR_IDX, "nbr_w": self.NBR_W}
            if self.NBR_IDX is not None
            else {"a_norm": self.A_NORM}
        )
        for e in range(epochs):
            gnn_params, opt_state = step(
                gnn_params,
                opt_state,
                jax.random.fold_in(k_drop, e),
                self.XG,
                graph,
                self.AX,
                head_w,
                target,
            )
        return gnn_params

    # ------------------------------------------------------------------
    def _forward(self, params, idx, corpus, deterministic: bool, rng=None):
        """Shared forward: graph -> gather -> fusion -> classifier.

        `corpus` is the HBM-resident array pytree (self.corpus), passed
        as a traced argument — see the construction note in __init__.
        """
        rngs_f = rngs_c = rngs_g = rngs_t = None
        k_t = None
        if not deterministic:
            k_g, k_f, k_c, k_t = jax.random.split(rng, 4)
            rngs_g = {"dropout": k_g}
            rngs_f = {"dropout": k_f}
            rngs_c = {"dropout": k_c}
            rngs_t = {"dropout": k_t}

        moe_aux = None
        if self.text_tower is not None and self.cfg.sp > 1:
            # ring-attention tower: sequence axis sharded over 'sp',
            # batch over 'data' on the same mesh; grads flow through the
            # ppermute ring. Training mode runs tower dropout via the
            # coord scheme (masks keyed on global row/position — see
            # TrainConfig.sp), so --sp training is dropout-exact against
            # the coord-keyed plain tower.
            from ultrafnd_git_tpu.parallel.sequence import (
                sequence_parallel_tower_apply,
            )

            text_feats = sequence_parallel_tower_apply(
                self.text_tower,
                params["text_tower"],
                corpus["text_ids"][idx],
                corpus["text_mask"][idx].astype(jnp.float32),
                self.mesh,
                batch_axis=meshlib.DATA_AXIS,
                dropout_key=k_t,
            )
        elif self.text_tower is not None and self.cfg.pp > 1:
            # GPipe tower: depth sharded by stage over 'pipe', batch on
            # 'data'; grads flow through the schedule. Training mode
            # runs tower dropout via the coord scheme (per-block keys
            # folded on GLOBAL block index, masks keyed on global batch
            # rows — see TrainConfig.pp), so --pp training is
            # dropout-exact against the coord-keyed plain tower.
            from ultrafnd_git_tpu.parallel.pipeline import (
                pipelined_tower_apply,
            )

            text_feats = pipelined_tower_apply(
                self.text_tower,
                params["text_tower"],
                corpus["text_ids"][idx],
                corpus["text_mask"][idx].astype(jnp.float32),
                self.mesh,
                microbatches=self.cfg.pp_microbatches,
                batch_axis=meshlib.DATA_AXIS,
                dropout_key=k_t,
            )
        elif self.text_tower is not None:
            # joint fine-tune: text features come from the trainable
            # on-device tower; gradients flow through it in this step
            tower_out = self.text_tower.apply(
                {"params": params["text_tower"]},
                corpus["text_ids"][idx],
                corpus["text_mask"][idx],
                deterministic=deterministic,
                rngs=rngs_t,
                return_aux=self.cfg.moe_experts > 0,
            )
            if self.cfg.moe_experts > 0:
                text_feats, moe_aux = tower_out
            else:
                text_feats = tower_out
        else:
            text_feats = corpus["text"][idx]

        feats = {
            "text_features": text_feats,
            "audio_features": corpus["audio"][idx],
            "visual_features": corpus["visual"][idx],
            "temporal_features": corpus["temporal"][idx],
        }
        if "evidence" in corpus:
            feats["evidence"] = corpus["evidence"][idx]
        if self.cfg.use_gnn:
            gnn_params = params["gnn"]
            if not self.cfg.train_gnn:
                # frozen-GNN mode: no backward through the graph channel
                # (and the optimizer masks its updates, so no wd drift)
                gnn_params = jax.lax.stop_gradient(gnn_params)
            feats["gnn_feat"] = self.gnn.apply(
                {"params": gnn_params},
                corpus["xg"],
                corpus.get("a_norm"),  # None under --sparse_graph
                deterministic=deterministic,
                normalize=False,
                ax=corpus["ax"],
                out_rows=idx,  # exact batch-rows shortcut, see SimpleGCN
                nbr_idx=corpus.get("nbr_idx"),
                nbr_w=corpus.get("nbr_w"),
                rngs=rngs_g,
            )

        fo = self.fusion.apply(
            {"params": params["fusion"]},
            feats,
            deterministic=deterministic,
            rngs=rngs_f,
        )
        co = self.clf.apply(
            {"params": params["clf"]},
            fo["fused"],
            corpus["aux"][idx],
            deterministic=deterministic,
            rngs=rngs_c,
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(
            co["logits"], corpus["labels"][idx]
        )
        if moe_aux is not None:
            # Switch aux (load balance + z) folded per-row: the masked
            # mean of a constant is the constant, so the loss gains
            # exactly moe_aux_weight * aux once per step
            ce = ce + jnp.float32(self.cfg.moe_aux_weight) * moe_aux
        forensic = jnp.stack(
            [
                fo["forensic"]["semantic_conflict"],
                fo["forensic"]["temporal_delay"],
                fo["forensic"]["emotion_intensity"],
            ]
        )  # (3, B)
        return ce, co["probs"][:, 1], forensic

    def _make_grad_fn(self):
        """(state, idx, mask, corpus) -> (loss, grads, (p1, forensic)).

        Split from _make_train_step so tests can compare the grad_accum
        accumulation against the single-big-batch gradient directly —
        post-AdamW params can't be compared (a first Adam step moves
        near-zero grads by ±lr on sign alone, so f32 rounding noise in
        dead pathways flips update signs).
        """
        accum = max(1, int(self.cfg.grad_accum))

        def wrap_rng(rng):
            if self.cfg.fast_dropout_rng:
                # Dropout-mask bits via the rbg PRNG: threefry mask
                # generation for the (B, L, W)-scale tower masks costs
                # 6.3 ms/step at the tower_512 protocol (44.7 -> 38.4 ms
                # measured, -14%). Only the IN-STEP dropout stream is
                # converted — init/shuffling stay threefry, and the
                # checkpointed state.rng is unchanged. Deterministic for
                # a given seed, but the rbg bitstream is not guaranteed
                # stable across compiler versions (set
                # fast_dropout_rng=False for bit-exact replays).
                return jax.random.wrap_key_data(
                    jnp.concatenate([rng, rng]), impl="rbg"
                )
            return rng

        def grads_of(state: TrainState, idx, mask, corpus):
            rng = jax.random.fold_in(state.rng, state.step)

            if accum == 1:
                def loss_fn(params):
                    ce, p1, forensic = self._forward(
                        params, idx, corpus,
                        deterministic=False, rng=wrap_rng(rng),
                    )
                    loss = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
                    return loss, (p1, forensic)

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                return loss, grads, aux

            # Gradient accumulation: scan `accum` microbatches, summing
            # UNNORMALIZED (masked-sum) loss gradients, then divide once
            # by the step's total valid-row count — grad is linear, so
            # this equals the single big-batch masked-mean gradient (up
            # to f32 summation order). Microbatch activations die at each
            # scan slice boundary; only the grad-sum pytree (params-sized)
            # persists, which is the whole point of the lever.
            idx_m = idx.reshape(accum, -1)
            mask_m = mask.reshape(accum, -1)

            def loss_sum_fn(params, i, m, r):
                ce, p1, forensic = self._forward(
                    params, i, corpus, deterministic=False, rng=r
                )
                return (ce * m).sum(), (p1, forensic)

            grad_fn = jax.value_and_grad(loss_sum_fn, has_aux=True)

            def body(carry, xs):
                gsum, lsum = carry
                i, m, k = xs
                # independent dropout stream per microbatch (folded from
                # the threefry step key; rbg-wrapped only at the leaf)
                r = wrap_rng(jax.random.fold_in(rng, k))
                (ls, aux), g = grad_fn(state.params, i, m, r)
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (gsum, lsum + ls), aux

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, lsum), aux = jax.lax.scan(
                body,
                (zeros, jnp.zeros((), jnp.float32)),
                (idx_m, mask_m, jnp.arange(accum)),
            )
            denom = jnp.maximum(mask.sum(), 1.0)
            grads = jax.tree.map(lambda g: g / denom, gsum)
            loss = lsum / denom
            p1 = aux[0].reshape(-1)  # (accum, B) -> (accum*B,)
            forensic = aux[1].transpose(1, 0, 2).reshape(3, -1)
            return loss, grads, (p1, forensic)

        return grads_of

    def _replicate_outs(self, out):
        """Host-visible step outputs (p1/forensic) are batch-sharded; on
        a MULTI-PROCESS mesh that makes them non-fully-addressable, so
        np.asarray on the metrics path would fail — constrain them to
        replicated (one small all-gather per step) so every host can
        read the full epoch's predictions. Single-process placements are
        already addressable; skip the constraint there."""
        if self.mesh is None or jax.process_count() == 1:
            return out
        rep = meshlib.replicated(self.mesh)
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, rep), out
        )

    def _make_train_step(self):
        grads_of = self._make_grad_fn()

        def step(state: TrainState, idx, mask, corpus):
            loss, grads, (p1, forensic) = grads_of(state, idx, mask, corpus)
            state = state.apply_gradients(grads, self.tx)
            return state, self._replicate_outs(
                {"loss": loss, "p1": p1, "forensic": forensic}
            )

        return step

    def _make_eval_step(self):
        def step(params, idx, mask, corpus):
            ce, p1, forensic = self._forward(
                params, idx, corpus, deterministic=True
            )
            loss = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            return self._replicate_outs(
                {"loss": loss, "p1": p1, "forensic": forensic}
            )

        return step

    def _make_train_epoch(self):
        """Whole epoch as one lax.scan of the train step (see scan_epoch)."""
        step_fn = self._make_train_step()

        def run(state, idx_mat, mask_mat, corpus):
            def body(state, xm):
                idx, m = xm
                state, out = step_fn(state, idx, m, corpus)
                return state, (out["loss"], out["p1"], out["forensic"])

            return jax.lax.scan(body, state, (idx_mat, mask_mat))

        return run

    def _make_eval_epoch(self):
        step_fn = self._make_eval_step()

        def run(params, idx_mat, mask_mat, corpus):
            def body(_, xm):
                idx, m = xm
                out = step_fn(params, idx, m, corpus)
                return None, (out["loss"], out["p1"], out["forensic"])

            return jax.lax.scan(body, None, (idx_mat, mask_mat))[1]

        return run

    # ------------------------------------------------------------------
    def _save_step_checkpoint(
        self, epoch: int, cursor: int, order: np.ndarray
    ) -> None:
        """Async mid-epoch `latest` save (save_every_steps cadence).

        The meta's `in_epoch` marker plus (step_cursor, epoch_order,
        np_random_state) is everything --resume needs to replay the
        remaining steps bit-exactly: the full TrainState already carries
        params/opt/step/rng, the order pins which rows each remaining
        step consumes, and the shuffle-stream snapshot pins every LATER
        epoch's order. Multi-process: deterministic cadence (same K,
        same batch count on every process), so the collective Orbax
        save stays in lock-step."""
        meta = {
            "trainer": "v2",
            "epoch": int(epoch),
            "best_val_auc": self.best_val_auc,
            "no_improve": self.no_improve,
            "cfg": asdict(self.cfg),
            "in_epoch": True,
            "step_cursor": int(cursor),
            "epoch_order": np.asarray(order).tolist(),
            "np_random_state": np_random_state_payload(),
        }
        ckpt.save_checkpoint(self.cfg.out_dir, "latest", self.state, meta)

    # ------------------------------------------------------------------
    def _epoch_loop(
        self, split_idx: np.ndarray, split: str, params=None,
        epoch: Optional[int] = None,
    ) -> Tuple[float, Dict[str, float]]:
        cfg = self.cfg
        is_train = split == "train"
        eval_params = params if params is not None else self.state.params

        # training consumes batch_size * grad_accum rows per optimizer
        # step (the step reshapes to (accum, B) microbatches internally);
        # eval has no backward pass, so it keeps plain batch_size chunks
        eff_batch = cfg.batch_size * (
            max(1, cfg.grad_accum) if is_train else 1
        )
        # step-granular saves are live only inside fit() (epoch known);
        # direct _epoch_loop callers (bench, dryrun, tests) keep the
        # plain path
        save_k = (
            int(cfg.save_every_steps)
            if (is_train and epoch is not None and cfg.save_every_steps)
            else 0
        )
        skip = 0
        if is_train and self._resume_order is not None:
            # mid-epoch resume: replay THIS epoch from the checkpointed
            # batch order at the checkpointed cursor (one-shot)
            order, skip = self._resume_order, self._resume_cursor
            self._resume_order, self._resume_cursor = None, 0
            batches = list(
                iter_padded_batches(order, eff_batch, shuffle=False)
            )[skip:]
        else:
            if is_train:
                # shuffle hoisted out of iter_padded_batches (identical
                # np.random stream consumption) so the order can be
                # checkpointed by the step-granular saves below
                order = np.array(split_idx, dtype=np.int32)
                np.random.shuffle(order)
            else:
                order = split_idx
            batches = list(
                iter_padded_batches(order, eff_batch, shuffle=False)
            )
        if not batches:
            return 0.0, aggregate_epoch_metrics(
                np.array([], dtype=int), np.array([], dtype=float),
                threshold=0.5, include_cm=False,
            )

        if cfg.scan_epoch:
            # one device dispatch per epoch: scan the jitted step over
            # the (steps, B) index/mask matrices — numerically identical
            # to the per-step loop (same step fn, same RNG stream).
            # Under a mesh the matrices shard on the batch axis so each
            # scan slice matches the per-step placement; multi-PROCESS
            # runs assemble them from per-host local columns
            # (meshlib.put_epoch_batches), keeping the one-dispatch
            # epoch alive exactly where per-step dispatch latency would
            # multiply (VERDICT r3 item 2). With save_every_steps the
            # epoch runs as ceil(steps/K) scans instead of one — same
            # step sequence, a host boundary every K steps to save at.
            chunks = np.stack([c for c, _, _ in batches]).astype(np.int32)
            masks = np.stack([m for _, m, _ in batches]).astype(np.float32)
            n_steps = len(chunks)
            seg = save_k if save_k > 0 else n_steps
            parts = []
            for s in range(0, n_steps, seg):
                ch, ms = chunks[s : s + seg], masks[s : s + seg]
                if self.mesh is not None:
                    ch_d, ms_d = meshlib.put_epoch_batches(
                        ch, ms, self.mesh
                    )
                else:
                    ch_d = jnp.asarray(ch)
                    ms_d = jnp.asarray(ms)
                if is_train:
                    self.state, part = self._train_epoch(
                        self.state, ch_d, ms_d, self.corpus,
                    )
                else:
                    part = self._eval_epoch(
                        eval_params, ch_d, ms_d, self.corpus,
                    )
                parts.append(part)
                if save_k > 0 and s + seg < n_steps:
                    self._save_step_checkpoint(
                        epoch, skip + s + seg, order
                    )
            if len(parts) == 1:
                loss_arr, p1_mat, f_mat = parts[0]
            else:
                loss_arr = np.concatenate(
                    [np.asarray(p[0]) for p in parts]
                )
                p1_mat = np.concatenate(
                    [np.asarray(p[1]) for p in parts]
                )
                f_mat = np.concatenate(
                    [np.asarray(p[2]) for p in parts]
                )
        else:
            outs = []
            for bi, (chunk, mask, _valid) in enumerate(batches):
                i, m = self._batch_arrays(chunk, mask)
                if is_train:
                    self.state, out = self._train_step(
                        self.state, i, m, self.corpus
                    )
                else:
                    out = self._eval_step(eval_params, i, m, self.corpus)
                # keep device arrays (async futures) — converting here
                # would serialize batch prep against device compute; one
                # sync at epoch end instead
                outs.append((out["loss"], out["p1"], out["forensic"]))
                if (
                    save_k > 0
                    and (bi + 1) % save_k == 0
                    and bi + 1 < len(batches)
                ):
                    self._save_step_checkpoint(
                        epoch, skip + bi + 1, order
                    )
            loss_arr = np.asarray([np.asarray(l) for l, _, _ in outs])
            p1_mat = np.stack([np.asarray(p) for _, p, _ in outs])
            f_mat = np.stack([np.asarray(f) for _, _, f in outs])

        y, p1_flat, f_cat = flatten_epoch_rows(
            batches, self.cache["labels"], p1_mat, f_mat
        )
        metrics = aggregate_epoch_metrics(
            y,
            p1_flat,
            forensic={
                "semantic_conflict": f_cat[0],
                "temporal_delay": f_cat[1],
                "emotion_intensity": f_cat[2],
            },
            threshold=0.5,
            include_cm=False,
        )
        return float(np.mean(np.asarray(loss_arr))), metrics

    def fit(self) -> float:
        cfg = self.cfg
        sel = {"acc": "accuracy"}.get(cfg.select_metric, cfg.select_metric)
        if sel not in ("auc", "accuracy", "f1", "precision", "recall"):
            raise ValueError(
                f"select_metric={cfg.select_metric!r} — use one of "
                "auc/acc/f1/precision/recall"
            )
        tracker = ImprovementTracker(
            cfg.out_dir,
            "v2",
            cfg.save_best,
            cfg.early_stop_patience,
            best=self.best_val_auc,
            no_improve=self.no_improve,
        )
        with profiler_trace(cfg.profile_dir):
            for epoch in range(self.start_epoch, cfg.epochs + 1):
                t0 = time.time()
                tr_loss, tr_metrics = self._epoch_loop(
                    self.tr_idx, "train", epoch=epoch
                )
                va_loss, va_metrics = self._epoch_loop(self.va_idx, "val")
                dt = time.time() - t0

                print(f"[Epoch {epoch:02d}] train_loss={tr_loss:.4f} | ", end="")
                pretty_print("train", tr_metrics)
                print(f"           val_loss={va_loss:.4f} | ", end="")
                pretty_print("val", va_metrics)
                log_jsonl(
                    cfg.out_dir,
                    cfg.log_metrics_jsonl,
                    {
                        "epoch": epoch,
                        "seconds": dt,
                        "train_loss": tr_loss,
                        "val_loss": va_loss,
                        **{f"train_{k}": v for k, v in tr_metrics.items()},
                        **{f"val_{k}": v for k, v in va_metrics.items()},
                    },
                )

                tracker.update(
                    float(va_metrics.get(sel, 0.5)),
                    self.state,
                    epoch,
                    asdict(cfg),
                )
                self.best_val_auc = tracker.best
                self.no_improve = tracker.no_improve
                # `latest` every epoch: restart-from-latest fault
                # recovery. The shuffle-stream snapshot makes the resumed
                # run's remaining epochs draw the same batch orders as an
                # uninterrupted run (trajectory-exact resume; older
                # checkpoints without the field keep legacy behavior).
                boundary_meta = tracker.meta(epoch, asdict(cfg))
                boundary_meta["np_random_state"] = np_random_state_payload()
                ckpt.save_checkpoint(
                    cfg.out_dir, "latest", self.state, boundary_meta
                )

                if tracker.should_stop:
                    tracker.announce_stop()
                    break
        ckpt.wait_for_writes()  # async saves must land before we return
        return self.best_val_auc

    def test(self) -> Dict[str, float]:
        params = self.state.params
        restored = load_checkpoint_guarded(
            self.cfg.out_dir, "best", self.state, "v2",
            "testing current params",
        )
        if restored is not None:
            params = restored[0].params
            if self.mesh is not None:
                params = meshlib.shard_params(params, self.mesh)

        ts_loss, ts_metrics = self._epoch_loop(self.te_idx, "test", params=params)
        print(f"[Test] loss={ts_loss:.4f} | ", end="")
        pretty_print("test", ts_metrics)
        return {
            "test_loss": ts_loss,
            "test_acc": ts_metrics.get("accuracy", 0.0),
            "test_auc": ts_metrics.get("auc", 0.5),
            "test_precision": ts_metrics.get("precision", 0.0),
            "test_recall": ts_metrics.get("recall", 0.0),
            "test_f1": ts_metrics.get("f1", 0.0),
            "test_cmcs": ts_metrics.get("cmcs", 0.0),
            "test_dfdr": ts_metrics.get("dfdr", 0.0),
        }
