"""Serving: score new records against a trained checkpoint.

The reference stops at `predict/predict_proba` helpers on in-memory
tensors (`src/models/fusion/deep_truth_classifier.py:176-184`) — there is
no path from "a trained out_dir" + "new records" to predictions. This
module provides it:

    predictor = Predictor(out_dir)          # best checkpoint + cache
    results = predictor.predict(records)    # list of dicts -> probs

Inductive graph extension: the v2 model is transductive (node embeddings
come from the training graph), so a new record is attached to the corpus
by its OCR-Jaccard adjacency row `a_new` against the N training nodes,
with the self-loop handled exactly as training does (A_hat self weight 2,
see _new_node_rows): layer 1 gets `a_new @ X + self_w * x_new`, layer 2
propagates `a_new @ h_corpus + self_w * h_new`. This matches training-node
GCN semantics exactly for edges into the corpus; the only approximation
is that new nodes don't see each other.

One jitted scoring function serves fixed-size batches (padded + masked),
so repeated calls never recompile.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ultrafnd_git_tpu.data.cache import load_cache, make_encoders
from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
from ultrafnd_git_tpu.models.fusion import CrossModalTransformer
from ultrafnd_git_tpu.models.gnn import SimpleGCN
from ultrafnd_git_tpu.ops.graphctx import (
    build_graph_context,
    build_sparse_graph_context,
    compact_node_features,
)
from ultrafnd_git_tpu.training import checkpoint as ckpt
from ultrafnd_git_tpu.training.state import TrainState, create_train_state


class Predictor:
    """Loads a trained out_dir and scores new FakeSV-style records."""

    # True when the scoring program exists at exactly one batch shape
    # (AOT artifacts); _pipeline then never chunks past batch_size
    _fixed_shape_dispatch = False
    # class-level default: ExportedPredictor skips __init__ (serve_dp
    # does not apply to frozen AOT artifacts)
    _serve_mesh = None

    def __init__(
        self,
        out_dir: str,
        batch_size: int = 64,
        checkpoint_name: str = "best",
        bf16: bool = False,
        quantize: bool = False,
        fused_align: Optional[bool] = None,
        serve_dp: Optional[int] = None,
        serve_backend: Optional[str] = None,
        sparse_graph: Optional[bool] = None,
    ):
        """bf16=True runs fusion/classifier/tower matmul activations in
        bfloat16 (restored params stay f32) — the serving analogue of the
        trainer's --bf16 lever. One MXU pass instead of three on TPU;
        scores move within the bf16 envelope (|d prob| ~ 1e-2), so the
        default stays bit-faithful f32. On CPU backends bf16 is emulated
        and SLOWER — only worth enabling on an accelerator.

        quantize=True stores the big weight matrices (Dense kernels,
        tower embedding) as int8 with per-channel scales and dequantizes
        INSIDE the scoring program (ops/quant.py) — 4x less HBM weight
        traffic on the memory-bound small-batch path; scores move within
        the weight-rounding envelope (|d prob| ~ 1e-2 on the fixture).
        Composes with bf16 (dequantizes straight to bf16). explain()
        attributions always use the full-precision weights.

        fused_align (default True) moves the featurizer's temporal
        alignment MLP INSIDE the scoring program: featurize() becomes
        pure host work and a request batch costs ONE device round trip
        instead of two. On the tunneled chip the two dispatches were
        36.8 + 36.3 ms at batch 64 — each round trip IS the floor, so
        fusing them nearly halves serving latency. The alignment math
        is identical (same MLP, same params, one 2B-row application);
        rows drift only by XLA tiling (~1e-7) vs the two-dispatch
        build. fused_align=False restores the round-3 split paths."""
        from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

        # serving entry points (scripts/serve.py, scripts/predict.py,
        # library embedders) must reuse compiled executables across
        # process restarts like the train CLI does — without this every
        # dispatch-chunk bucket recompiles over the tunnel (tens of
        # seconds each) on every cold start
        enable_persistent_cache()

        self.out_dir = Path(out_dir)
        self.batch_size = int(batch_size)
        self.bf16 = bool(bf16)
        self.quantize = bool(quantize)

        cache_path = self.out_dir / "feature_cache.npz"
        # "reuse": the corpus cache is the feature map the checkpoint was
        # trained on; a feature-code version mismatch warns loudly (new
        # request records ARE featurized with current code)
        self.cache = load_cache(str(cache_path), stale_features="reuse")
        if self.cache is None:
            raise FileNotFoundError(
                f"no feature cache at {cache_path} — train first (the "
                "trainer persists it when cache_to_disk=True)"
            )

        meta_path = self.out_dir / checkpoint_name / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(
                f"no '{checkpoint_name}' checkpoint under {self.out_dir}"
            )
        with open(meta_path, "r", encoding="utf-8") as fh:
            meta = json.load(fh)
        saved_cfg = meta.get("cfg", {})
        trainer_kind = meta.get("trainer", "v2")
        if trainer_kind != "v2":
            # GNNModel (integrated) and SimpleGCN (v2) checkpoints have
            # coincidentally identical param shapes at default gnn_dim —
            # restoring across trainer kinds silently serves wrong scores.
            raise ValueError(
                f"checkpoint was written by the '{trainer_kind}' trainer; "
                "Predictor serves v2 checkpoints only"
            )
        self.use_gnn = bool(saved_cfg.get("use_gnn", True))
        self.use_evidence = bool(saved_cfg.get("use_evidence", False))
        # Featurize requests under the SAME hash draw the checkpoint was
        # trained with (TrainConfig.hash_salt) — a different salt would
        # silently score new records on a different random projection.
        # The salt is process-wide, so featurize() re-asserts it per call
        # (two Predictors with different salts in one process stay
        # correct; their featurize calls must not interleave mid-batch,
        # which the per-call set covers for the whole-batch granularity).
        from ultrafnd_git_tpu.ops.hashing import set_hash_salt

        self._hash_salt = str(saved_cfg.get("hash_salt", ""))
        set_hash_salt(self._hash_salt)
        gnn_dim = int(saved_cfg.get("gnn_dim", 128))
        # Tower checkpoints (--train_text_tower): text features come from
        # the trained on-device TextTransformer over token ids, exactly
        # as in training — the cached/hash text features would be a
        # silently different distribution than the fusion saw.
        self.text_tower = None
        if bool(saved_cfg.get("train_text_tower", False)):
            from ultrafnd_git_tpu.data.cache import TOWER_VOCAB
            from ultrafnd_git_tpu.models.transformer import TextTransformer

            self._tower_len = int(self.cache["text_ids"].shape[1])
            self.text_tower = TextTransformer(
                width=int(self.cache["text"].shape[1]),
                depth=int(saved_cfg.get("text_tower_depth", 2)),
                heads=int(saved_cfg.get("text_tower_heads", 12)),
                vocab_size=TOWER_VOCAB,
                max_len=self._tower_len,
                moe_experts=int(saved_cfg.get("moe_experts", 0)),
                # metas that predate the field were trained exact-erf
                gelu=str(saved_cfg.get("tower_gelu", "exact")),
            )
            import sys

            print(
                "note: serving a --train_text_tower checkpoint — tokens "
                "unseen in training hit untrained embedding rows (CJK is "
                "tokenized per character to keep vocabularies overlapping)",
                file=sys.stderr,  # predict.py emits JSONL on stdout
            )
        # When training consumed the OCR phrase pickle, the corpus token
        # sets use its regex tokenization — unseen records must be
        # tokenized the same way or the Jaccard vocabularies barely
        # intersect and every new node silently isolates (self-loop only).
        self._ocr_clean = saved_cfg.get("ocr_phrase_pkl") is not None

        # Rebuild the module set + a state template, then restore weights.
        self.fusion = CrossModalTransformer.from_config(
            saved_cfg.get("fusion_config", "configs/model_configs/fusion.yaml")
        )
        if not self.use_gnn:
            self.fusion = self.fusion.clone(use_gnn=False)
        self.clf = DeepTruthClassifier.from_config(
            saved_cfg.get(
                "classifier_config", "configs/model_configs/classifier.yaml"
            )
        )
        if self.bf16:
            self.fusion = self.fusion.clone(dtype=jnp.bfloat16)
            self.clf = self.clf.clone(dtype=jnp.bfloat16)
            if self.text_tower is not None:
                self.text_tower = self.text_tower.clone(dtype=jnp.bfloat16)
        self.gnn = SimpleGCN(hid=2 * gnn_dim, out_dim=gnn_dim, dropout=0.2)

        # Device-resident corpus context for the inductive graph extension
        # (SAME construction as the trainer's graph — shared helper).
        # A checkpoint trained with --sparse_graph serves sparse too
        # (recorded in its cfg meta): the corpus-side context builds as
        # (N, K) neighbor lists and NO (N, N) object exists at serving
        # init either — the per-request path only ever needed H_CORPUS
        # and the new-node link rows, both N-linear. `sparse_graph=...`
        # overrides the checkpoint's choice (either direction; the GCN
        # params are layout-independent).
        self.thresh = float(saved_cfg.get("gnn_overlap_thresh", 0.12))
        if sparse_graph is None:
            sparse_graph = bool(saved_cfg.get("sparse_graph", False))
        self.sparse_graph = bool(sparse_graph)
        if self.sparse_graph and self.use_gnn:
            sctx = build_sparse_graph_context(self.cache, self.thresh)
            self.A_NORM = None
            self.NBR_IDX = jnp.asarray(sctx.nbr_idx)
            self.NBR_W = jnp.asarray(sctx.nbr_w)
            gctx = sctx
        else:
            gctx = build_graph_context(self.cache, self.thresh)
            self.A_NORM = jnp.asarray(gctx.a_norm)
            self.NBR_IDX = self.NBR_W = None
        self.XG = jnp.asarray(gctx.xg)
        self.AX = jnp.asarray(gctx.ax)
        self.corpus_deg = gctx.deg

        # Inverted index token -> corpus doc ids: new-node Jaccard rows
        # become a handful of posting-list accumulations per record
        # instead of an O(B*N) Python set loop.
        postings: Dict[str, list] = {}
        for j, s in enumerate(self.cache["ocr_sets"]):
            for tok in s:
                postings.setdefault(tok, []).append(j)
        self._postings = {
            tok: np.asarray(js, dtype=np.int64)
            for tok, js in postings.items()
        }
        self._corpus_sizes = np.asarray(
            [len(s) for s in self.cache["ocr_sets"]], dtype=np.float32
        )

        template = self._state_template(gnn_dim, saved_cfg)
        restored = ckpt.load_checkpoint(str(self.out_dir), checkpoint_name,
                                        template)
        if restored is None:
            raise FileNotFoundError(
                f"failed to restore '{checkpoint_name}' from {self.out_dir}"
            )
        # Checkpoint restore yields host arrays — put weights on device
        # once so _score calls don't re-upload them per batch.
        self.params = jax.device_put(
            jax.tree.map(jnp.asarray, restored[0].params)
        )

        # int8 serving weights: the scoring program reads these; the f32
        # tree stays resident for explain()/background paths. The GNN
        # corpus context below is built from the DEQUANTIZED weights so
        # corpus rows and new-node rows flow through identical numerics.
        self._score_params = self.params
        if self.quantize:
            from ultrafnd_git_tpu.ops.quant import quantize_tree

            qparams, qstats = quantize_tree(self.params)
            self._score_params = jax.device_put(qparams)
            print(
                f"int8 serving weights: {qstats['quantized']} matrices "
                f"quantized, {qstats['kept']} small leaves kept f32"
            )

        # Corpus layer-1 activation is fixed at serving time (params and
        # AX are constant) — compute it once.
        if self.use_gnn:
            p = self._effective_params()["gnn"]
            self.H_CORPUS = jax.nn.gelu(
                self.AX @ p["lin1"]["kernel"] + p["lin1"]["bias"],
                approximate=False,
            )
        else:
            self.H_CORPUS = None

        # Featurizer built ONCE (encoder objects carry jitted lambdas that
        # would re-trace per construction). Evidence scorers are only
        # constructed/run when this checkpoint actually consumes evidence.
        self._seed = int(saved_cfg.get("seed", 42))
        self._encoders = make_encoders(
            seed=self._seed, with_evidence=self.use_evidence
        )

        # Fused-align scoring (see class docstring): the align MLP's
        # module + deterministic params ride into the score program as
        # an ARGUMENT (like the corpus context — closure-captured arrays
        # bloat the remote-compile payload).
        self.fused_align = True if fused_align is None else bool(fused_align)
        tsync = self._encoders["tsync"]
        self._align_module = tsync.module
        self._align_params = jax.device_put(
            jax.tree.map(jnp.asarray, tsync.params)
        )
        # Multi-device serving dispatch (VERDICT r4 item 7): with
        # serve_dp > 1 the scoring batch row-shards over a 1-D 'data'
        # mesh — replicated params + corpus context, sharded request
        # rows, exactly the training shardings' serving mirror. Each
        # device computes full contractions for its row block against
        # the replicated weights; measured agreement with single-device
        # is 1 f32 ulp — XLA tiles per-shard row blocks differently
        # than the full batch, the same envelope as the request bucket
        # ladder (asserted, tests/test_serving_mesh.py). Dispatch
        # buckets that don't divide dp fall back to the replicated
        # placement for that call (still exact).
        self._serve_mesh = None
        if serve_dp is not None and int(serve_dp) > 1:
            from jax.sharding import (
                Mesh,
                NamedSharding,
                PartitionSpec as SP,
            )

            # serve_backend pins the mesh platform (e.g. "cpu" for the
            # driver dryrun's virtual devices when another backend was
            # already initialized in-process); None = default platform
            devs = jax.devices(serve_backend) if serve_backend else jax.devices()
            if len(devs) < int(serve_dp):
                raise ValueError(
                    f"serve_dp={serve_dp} but only {len(devs)} device(s) "
                    "visible"
                )
            self._serve_mesh = Mesh(
                np.array(devs[: int(serve_dp)]), ("data",)
            )
            rep = NamedSharding(self._serve_mesh, SP())
            self.params = jax.device_put(self.params, rep)
            if not self.quantize:
                self._score_params = self.params
            else:
                self._score_params = jax.device_put(
                    self._score_params, rep
                )
            self._align_params = jax.device_put(self._align_params, rep)
            self.XG = jax.device_put(self.XG, rep)
            if self.H_CORPUS is not None:
                self.H_CORPUS = jax.device_put(self.H_CORPUS, rep)
        self._score_is_fused = self.fused_align
        self._score = jax.jit(self._make_score(fused=self.fused_align))

    def _effective_params(self):
        """The weights the scoring program actually sees (dequantized
        view under quantize=True, the restored f32 tree otherwise)."""
        if not self.quantize:
            return self.params
        from ultrafnd_git_tpu.ops.quant import dequantize_tree

        return dequantize_tree(self._score_params)

    # ------------------------------------------------------------------
    def _state_template(self, gnn_dim: int, saved_cfg: Dict) -> TrainState:
        # The restore target must match the SAVED pytree structure exactly,
        # including the optimizer chain the trainer built.
        from ultrafnd_git_tpu.training.state import make_optimizer

        b = 2
        feats = {
            "text_features": jnp.zeros((b, self.cache["text"].shape[1])),
            "audio_features": jnp.zeros((b, self.cache["audio"].shape[1])),
            "visual_features": jnp.zeros((b, self.cache["visual"].shape[1])),
            "temporal_features": jnp.zeros(
                (b, self.cache["temporal"].shape[1])
            ),
        }
        if self.use_gnn:
            feats["gnn_feat"] = jnp.zeros((b, gnn_dim))
        key = jax.random.PRNGKey(0)
        params = {
            "fusion": self.fusion.init(key, feats)["params"],
            "clf": self.clf.init(
                key, jnp.zeros((b, self.fusion.hidden)), jnp.zeros((b, 2))
            )["params"],
            "gnn": self.gnn.init(
                key, self.XG, self.A_NORM, normalize=False,
                **(
                    {"ax": self.AX, "nbr_idx": self.NBR_IDX,
                     "nbr_w": self.NBR_W}
                    if self.NBR_IDX is not None else {}
                ),
            )["params"],
        }
        if self.text_tower is not None:
            params["text_tower"] = self.text_tower.init(
                key,
                jnp.zeros((b, self._tower_len), jnp.int32),
                jnp.ones((b, self._tower_len), jnp.float32),
                deterministic=True,
            )["params"]
        tx = make_optimizer(
            float(saved_cfg.get("lr", 2e-4)),
            float(saved_cfg.get("weight_decay", 1e-4)),
            float(saved_cfg.get("grad_clip", 5.0)),
            steps_per_epoch=1,  # schedule state shape is step-count only
            # a frozen-GNN trainer wraps the chain in multi_transform —
            # the opt_state structure must match to restore
            frozen_subtrees=(
                () if saved_cfg.get("train_gnn", True) else ("gnn",)
            ),
            # fused opt_state is a {count, mu, nu} dict; old checkpoints
            # (no key) were written by the optax chain
            fused=bool(saved_cfg.get("fused_adamw", False)),
        )
        return create_train_state(params, tx, key)

    # ------------------------------------------------------------------
    def _make_score(self, fused: bool = False):
        # xg_corpus/h_corpus are ARGUMENTS: closure-captured device arrays
        # are embedded in the remote-compile payload, which the tunnel
        # rejects at large corpus N (see trainer.py's corpus note)
        if fused:
            return self._make_score_fused()

        def score(params, feats, aux, a_rows, self_w, xg_new, xg_corpus,
                  h_corpus, text_ids, text_mask):
            if self.quantize:
                # int8 -> compute dtype right before use; XLA fuses the
                # convert+scale into each consuming matmul, so the HBM-
                # resident weights stay int8 (ops/quant.py)
                from ultrafnd_git_tpu.ops.quant import dequantize_tree

                params = dequantize_tree(
                    params, jnp.bfloat16 if self.bf16 else None
                )
            if self.text_tower is not None:
                feats = {
                    **feats,
                    "text_features": self.text_tower.apply(
                        {"params": params["text_tower"]},
                        text_ids,
                        text_mask,
                        deterministic=True,
                    ),
                }
            if self.use_gnn:
                # Exact GCN extension for new nodes. A training node i has
                #   z_i = lin2( sum_j A_hat_ij * gelu(lin1((A_hat x)_j)) )
                # with A_hat including a self-loop of weight 2/deg. For a
                # new node: its layer-1 input is a_rows @ XG + self_w *
                # x_new (self term!), and its layer-2 propagation is
                # a_rows @ h_corpus + self_w * h_new.
                p = params["gnn"]
                ax_new = a_rows @ xg_corpus + self_w[:, None] * xg_new
                h_new = jax.nn.gelu(
                    ax_new @ p["lin1"]["kernel"] + p["lin1"]["bias"],
                    approximate=False,
                )
                prop = a_rows @ h_corpus + self_w[:, None] * h_new
                z = prop @ p["lin2"]["kernel"] + p["lin2"]["bias"]
                feats = {**feats, "gnn_feat": z}
            fo = self.fusion.apply(
                {"params": params["fusion"]}, feats, deterministic=True
            )
            co = self.clf.apply(
                {"params": params["clf"]},
                fo["fused"],
                aux,
                deterministic=True,
            )
            # fused rides along for explain(); predict() never transfers
            # it off-device, so the extra output is free on the hot path
            return co["probs"], fo["forensic"], fo["fused"]

        return score

    def _make_score_fused(self):
        """Scoring program that ALSO computes the temporal alignment.

        Inputs are the host-only featurize contract (data/cache.py
        with_align=False): raw text/audio/visual features plus the host
        aux half ("emo") and, for evidence checkpoints, the two host
        evidence columns. The program derives temporal_features, the
        delay proxy, aux and the evidence delay column itself — the
        exact math of TemporalSyncNet.align_batch_pair +
        data.cache.alignment_delay, one 2B-row MLP application — so a
        request batch is ONE dispatch end-to-end. The align params are
        an argument (deterministic seeded tree, never trained, never
        quantized)."""
        from ultrafnd_git_tpu.models.temporal import _pad_or_trunc
        from ultrafnd_git_tpu.ops.graphctx import SLICES

        def score(params, align_params, t_raw, audio, visual, emo,
                  ev_host, a_rows, self_w, xg_corpus, h_corpus,
                  text_ids, text_mask):
            if self.quantize:
                from ultrafnd_git_tpu.ops.quant import dequantize_tree

                params = dequantize_tree(
                    params, jnp.bfloat16 if self.bf16 else None
                )
            b = t_raw.shape[0]
            both = self._align_module.apply(
                align_params,
                jnp.concatenate([t_raw, t_raw], axis=0),
                jnp.concatenate(
                    [_pad_or_trunc(visual, t_raw.shape[1]), t_raw], axis=0
                ),
                deterministic=True,
            )
            u, u_tt = both[:b], both[b:]
            # alignment_delay, in-program (same eps/clip as the host copy)
            an = jnp.linalg.norm(u_tt, axis=-1) + 1e-9
            bn = jnp.linalg.norm(u, axis=-1) + 1e-9
            delay = jnp.clip(
                1.0 - jnp.sum(u_tt * u, axis=-1) / (an * bn), 0.0, 1.0
            )
            aux = jnp.stack([delay, emo], axis=1)
            feats = {
                "audio_features": audio,
                "visual_features": visual,
                "temporal_features": u,
            }
            if self.text_tower is not None:
                feats["text_features"] = self.text_tower.apply(
                    {"params": params["text_tower"]},
                    text_ids,
                    text_mask,
                    deterministic=True,
                )
            else:
                feats["text_features"] = t_raw
            if self.use_evidence:
                feats["evidence"] = jnp.concatenate(
                    [ev_host, delay[:, None]], axis=1
                )
            if self.use_gnn:
                # compact_node_features (ops/graphctx.py), in-program:
                # temporal is computed here, so the host can't build it
                by_key = {
                    "text": t_raw, "audio": audio,
                    "visual": visual, "temporal": u,
                }
                xg_new = jnp.concatenate(
                    [by_key[k][:, :w] for k, w in SLICES], axis=1
                )
                xg_new = xg_new / (
                    jnp.linalg.norm(xg_new, axis=1, keepdims=True) + 1e-9
                )
                p = params["gnn"]
                ax_new = a_rows @ xg_corpus + self_w[:, None] * xg_new
                h_new = jax.nn.gelu(
                    ax_new @ p["lin1"]["kernel"] + p["lin1"]["bias"],
                    approximate=False,
                )
                prop = a_rows @ h_corpus + self_w[:, None] * h_new
                z = prop @ p["lin2"]["kernel"] + p["lin2"]["bias"]
                feats = {**feats, "gnn_feat": z}
            fo = self.fusion.apply(
                {"params": params["fusion"]}, feats, deterministic=True
            )
            co = self.clf.apply(
                {"params": params["clf"]},
                fo["fused"],
                aux,
                deterministic=True,
            )
            # aux is a device product here — returned for explain();
            # predict() fetches only probs+forensic, so it stays free
            return co["probs"], fo["forensic"], fo["fused"], aux

        return score

    def _get_score(self, fused: bool):
        """The jitted program matching a featurize contract (the default
        one is prebuilt; the other variant jits lazily on first use —
        e.g. a full persisted cache handed to predict_featurized)."""
        if fused == self._score_is_fused:
            return self._score
        alt = getattr(self, "_score_alt", None)
        if alt is None:
            alt = self._score_alt = jax.jit(self._make_score(fused=fused))
        return alt

    # ------------------------------------------------------------------
    def _new_node_rows(self, ocr_sets: Sequence[set]) -> np.ndarray:
        """Normalized adjacency rows of new nodes against the corpus.

        inter[j] accumulates over the new doc's tokens via the inverted
        index; jaccard = inter / (|s| + |corpus_j| - inter + eps) with the
        same epsilon/threshold semantics as ops.jaccard.build_adj_from_ocr.
        """
        n = len(self._corpus_sizes)
        rows = np.zeros((len(ocr_sets), n), dtype=np.float32)
        for i, s in enumerate(ocr_sets):
            if not s:
                continue
            inter = np.zeros(n, dtype=np.float32)
            for tok in s:
                js = self._postings.get(tok)
                if js is not None:
                    inter[js] += 1.0
            union = len(s) + self._corpus_sizes - inter
            jac = inter / (union + 1e-9)
            rows[i] = (jac >= self.thresh).astype(np.float32)
        # D^{-1/2} (A+I) D^{-1/2} extension. A corpus node's self weight in
        # A_hat is 2 (adjacency diag 1 from build_adj_from_ocr PLUS the I
        # added by normalize_adjacency), so the new node mirrors that:
        # degree = links + 2, self coefficient = 2 / deg_new.
        deg_new = rows.sum(axis=1) + 2.0
        self_w = (2.0 / deg_new).astype(np.float32)
        rows = (
            rows / np.sqrt(deg_new)[:, None] / np.sqrt(self.corpus_deg)[None, :]
        )
        return rows, self_w

    def featurize(
        self, records: Sequence[Dict[str, Any]], id_offset: int = 0
    ) -> Dict[str, Any]:
        """records with title/ocr/comments -> trainer-contract features.

        `id_offset` keeps fallback ids request-global when predict()
        featurizes per chunk — without it every chunk would restart at
        q_0 and multi-chunk requests would return colliding ids for
        records that carry no video_id/id of their own.

        The record list pads up to a power-of-two bucket (>= 8) with
        empty records before featurization: the featurizer's jitted
        passes (the alignment MLP) otherwise compile ONE PROGRAM PER
        DISTINCT BATCH SIZE, and on the tunneled chip each novel size
        costs ~0.7-1 s — exactly what variable-size dynamic-batching
        windows produce (measured: window=0 ms HTTP serving ran at
        7.6 records/s from per-size compiles vs ~100 at a fixed 16).
        Downstream consumers slice [:count] everywhere, so pad rows
        never reach a score.
        """
        from ultrafnd_git_tpu.data.cache import build_feature_cache
        from ultrafnd_git_tpu.ops.hashing import set_hash_salt

        set_hash_salt(self._hash_salt)  # see __init__ (process-wide state)

        records = list(records)
        bucket = 8
        while bucket < len(records):
            bucket *= 2
        if len(records) and bucket > len(records):
            records = records + [{}] * (bucket - len(records))

        class _Raw:  # minimal FakeSVRawDataset-shaped adapter
            def __init__(self, recs):
                self._recs = [
                    {
                        "id": r.get("video_id")
                        or r.get("id")
                        or f"q_{id_offset + i}",
                        "title": r.get("title") or "",
                        "ocr": r.get("ocr") or "",
                        "comments": list(r.get("comments") or []),
                        "label": 0,
                    }
                    for i, r in enumerate(recs)
                ]

            def __len__(self):
                return len(self._recs)

            def get_item(self, i):
                return self._recs[i]

        return build_feature_cache(
            _Raw(records),
            seed=self._seed,
            encoders=self._encoders,
            ocr_clean_fallback=self._ocr_clean,
            # only featurize what this checkpoint reads: evidence-scorer
            # forwards and tower tokenization are hot-path waste otherwise
            with_evidence=self.use_evidence,
            with_tower_tokens=self.text_tower is not None,
            # fused-align serving: featurize is pure host work; the
            # scoring program computes temporal/aux/evidence-delay itself
            with_align=not self.fused_align,
        )

    # ------------------------------------------------------------------
    def predict(
        self, records: Sequence[Dict[str, Any]]
    ) -> List[Dict[str, Any]]:
        """Score records; returns [{id, prob_fake, label, forensic...}].

        Pipelined: chunk N+1 featurizes on a worker thread while the
        device scores chunk N (same prefetch pattern as the v1 feature
        stage) — featurization is host-bound, scoring device-bound, so
        serialization between them was the serving wall-clock (VERDICT
        r2 item 6). Single-chunk requests degenerate to the serial path.
        """
        return self._pipeline(records, collect_fused=False)[0]

    def predict_featurized(
        self, feats_cache: Dict[str, Any], count: int
    ) -> List[Dict[str, Any]]:
        """Score ONE already-featurized window (all `count` rows of
        `feats_cache`, a featurize() output).

        This is the scoring half of the split the HTTP DynamicBatcher
        pipelines around its device lock: featurize(window N+1) runs
        OUTSIDE the lock, overlapping the in-flight dispatch of window N
        (VERDICT r3 item 5 — per-call featurization used to serialize
        with the coalesced dispatch). Rows are bit-identical to
        predict(records) for windows that fit one dispatch chunk
        (asserted by tests/test_server.py)."""
        return self._score_chunk(feats_cache, count, collect_fused=False)

    def warmup(self, max_records: int = 64) -> int:
        """Precompile the featurize + score bucket ladder up to the
        first power-of-two bucket >= max_records.

        Dynamic-batching windows produce variable record counts; both
        featurize() and _score_chunk pad to power-of-two buckets so the
        jitted programs are shared across counts — but the FIRST request
        at each bucket still pays its compile (~0.7-1 s per program over
        the tunneled chip; persistent-cache misses on a fresh machine).
        Serving entry points call this at startup (scripts/serve.py
        --warmup) so that cost lands before the socket opens instead of
        on a live request. Runs real predict() calls on synthetic
        records — the same code path a request takes, so everything on
        it (featurizer dispatch shapes, score buckets, alignment MLP)
        is compiled after this returns. Returns the number of bucket
        sizes exercised."""
        sizes = []
        s = 8  # featurize()'s minimum bucket
        while s < int(max_records):
            sizes.append(s)
            s *= 2
        sizes.append(s)
        for n in sizes:
            self.predict(
                [{"title": "warmup", "ocr": "", "comments": []}] * n
            )
        return len(sizes)

    def _pipeline(self, records: Sequence[Dict[str, Any]],
                  collect_fused: bool):
        """Shared featurize->score loop (prefetch + backend-aware
        chunking) behind predict() and explain(). Returns (rows, fused,
        aux); the latter two are None unless collect_fused."""
        if not records:
            return [], None, None
        records = list(records)
        n = len(records)
        # Chunk size is backend-aware. Accelerators: one dispatch per
        # <= max_rows chunk (the score fn is batch-agnostic) — on a
        # tunneled chip every call carries ~90 ms fixed latency and
        # per-small-batch dispatch capped TPU serving at 192 records/s;
        # the big-bucket path measures 578 (3x). Host CPU: small batches
        # win (742 vs 1030 records/s measured big-vs-small), so the
        # configured batch_size stays the chunk there. Rows pad up to
        # the bucket ladder b, 2b, 4b, ... so jit shapes are reused;
        # max_rows sits ON the ladder (<= 4096) so full chunks never
        # overshoot into a half-empty bucket.
        b = max(1, self.batch_size)  # <= 0 would loop forever below
        if jax.default_backend() == "cpu" or self._fixed_shape_dispatch:
            # _fixed_shape_dispatch (ExportedPredictor): the AOT artifact
            # exists at exactly ONE batch shape, so chunks must never
            # exceed batch_size — expanding to the 4096 ladder would ask
            # the deserialized program for a shape it was never exported
            # with (ADVICE r4: startup warmup deterministically failed
            # for artifacts exported with batch_size < 64)
            max_rows = b
        else:
            max_rows = b
            while max_rows * 2 <= 4096:
                max_rows *= 2
        bounds = [
            (s, min(s + max_rows, n)) for s in range(0, n, max_rows)
        ]

        out: List[Dict[str, Any]] = []
        fused_parts: List[np.ndarray] = []
        aux_parts: List[np.ndarray] = []
        pool = self._featurize_pool()
        fut = pool.submit(
            self.featurize, records[bounds[0][0] : bounds[0][1]], 0
        )
        for ci, (s, e) in enumerate(bounds):
            chunk_cache = fut.result()
            if ci + 1 < len(bounds):
                ns, ne = bounds[ci + 1]
                fut = pool.submit(self.featurize, records[ns:ne], ns)
            res = self._score_chunk(
                chunk_cache, e - s, collect_fused=collect_fused
            )
            if collect_fused:
                rows, f, a = res
                fused_parts.append(f)
                aux_parts.append(a)
            else:
                rows = res
            out.extend(rows)
        if collect_fused:
            return (
                out,
                np.concatenate(fused_parts).astype(np.float32),
                np.concatenate(aux_parts).astype(np.float32),
            )
        return out, None, None

    def _featurize_pool(self):
        """One long-lived prefetch worker (thread creation per predict()
        call was on the latency path; same reasoning as pipeline_v1's
        _cv_pool)."""
        pool = getattr(self, "_featurize_pool_obj", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="featurize"
            )
            self._featurize_pool_obj = pool
        return pool

    def _score_chunk(
        self,
        feats_cache: Dict[str, Any],
        count: int,
        collect_fused: bool = False,
    ):
        """Score one featurized chunk (all rows of `feats_cache`).

        With collect_fused=True, returns (rows, fused (count, H), aux
        (count, 2)) for the explain() path; otherwise just the rows —
        the fused output then never leaves the device.
        """
        b = max(1, self.batch_size)
        bucket = b
        while bucket < count:
            bucket *= 2
        pad = bucket - count

        # multi-device serving: request rows shard over the 'data' mesh
        # (weights/corpus replicated at init); buckets not divisible by
        # dp keep the default (replicated-equivalent) placement
        mesh = self._serve_mesh
        shard_rows = mesh is not None and bucket % mesh.devices.size == 0

        def place_rows(arr):
            if shard_rows and getattr(arr, "ndim", 0) >= 1 and (
                arr.shape[0] == bucket
            ):
                from jax.sharding import NamedSharding, PartitionSpec

                return jax.device_put(
                    arr,
                    NamedSharding(
                        mesh,
                        PartitionSpec("data", *[None] * (arr.ndim - 1)),
                    ),
                )
            return jnp.asarray(arr)

        def take_raw(key, dtype):
            arr = feats_cache[key][:count].astype(dtype)
            if pad:
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], pad, axis=0)]
                )
            return place_rows(jnp.asarray(arr))

        def take(key):
            return take_raw(key, np.float32)

        # contract detection: host-only caches (featurize under
        # fused_align) carry no "temporal" — the fused program computes
        # it; full caches (persisted trainer caches, fused_align=False)
        # take the legacy two-input path
        is_fused = "temporal" not in feats_cache
        score_fn = self._get_score(is_fused)

        ocr_sets = feats_cache["ocr_sets"][:count]
        a_rows, self_w = self._new_node_rows(ocr_sets)
        if pad:
            a_rows = np.concatenate(
                [a_rows, np.repeat(a_rows[-1:], pad, axis=0)]
            )
            self_w = np.concatenate(
                [self_w, np.repeat(self_w[-1:], pad, axis=0)]
            )
        # use_gnn=False leaves H_CORPUS unset; pass a 0-d filler
        h_corpus = (
            self.H_CORPUS if self.H_CORPUS is not None else jnp.zeros(())
        )
        ids_arg = (
            take_raw("text_ids", np.int32)
            if self.text_tower is not None
            else jnp.zeros(())
        )
        mask_arg = (
            take_raw("text_mask", np.float32)
            if self.text_tower is not None
            else jnp.zeros(())
        )

        if is_fused:
            # ONE dispatch: align + aux + evidence-delay + GNN extension
            # + fusion + classifier (t_raw always rides up — it is the
            # align input even on tower checkpoints)
            probs, forensic, fused, aux = score_fn(
                self._score_params,
                self._align_params,
                take("text"),
                take("audio"),
                take("visual"),
                take_raw("emo", np.float32),
                (
                    take("evidence_host")
                    if self.use_evidence
                    else jnp.zeros(())
                ),
                place_rows(jnp.asarray(a_rows)),
                place_rows(jnp.asarray(self_w)),
                self.XG,
                h_corpus,
                ids_arg,
                mask_arg,
            )
        else:
            feats = {
                "audio_features": take("audio"),
                "visual_features": take("visual"),
                "temporal_features": take("temporal"),
            }
            if self.text_tower is None:
                feats["text_features"] = take("text")
            # (tower path: score() computes text_features from ids —
            # uploading the unused cached rows would be pure tunnel
            # traffic on the exact path this chunking optimizes)
            if self.use_evidence:
                feats["evidence"] = take("evidence")
            aux = take("aux")
            xg_new = compact_node_features(
                {k: feats_cache[k][:count] for k in
                 ("text", "audio", "visual", "temporal")}
            )
            if pad:
                xg_new = np.concatenate(
                    [xg_new, np.repeat(xg_new[-1:], pad, axis=0)]
                )
            probs, forensic, fused = score_fn(
                self._score_params,
                feats,
                aux,
                place_rows(jnp.asarray(a_rows)),
                place_rows(jnp.asarray(self_w)),
                place_rows(jnp.asarray(xg_new)),
                self.XG,
                h_corpus,
                ids_arg,
                mask_arg,
            )
        # ONE host fetch for all outputs: separate np.asarray calls are
        # separate device->host transfers, and on the tunneled chip each
        # costs a ~90 ms round trip — the fetch, not the compute, was
        # the serving dispatch floor (BASELINE.md round-3 serving table)
        if collect_fused:
            # explain() needs fused+aux too; keep it one transfer
            probs, forensic, fused, aux = jax.device_get(
                (probs, forensic, fused, aux)
            )
        else:
            probs, forensic = jax.device_get((probs, forensic))
        probs = np.asarray(probs)[:count]
        forensic = {k: np.asarray(v)[:count] for k, v in forensic.items()}
        rows = [
            {
                "id": str(feats_cache["ids"][i]),
                "prob_fake": float(probs[i, 1]),
                "label": int(probs[i, 1] >= 0.5),
                "semantic_conflict": float(
                    forensic["semantic_conflict"][i]
                ),
                "temporal_delay": float(forensic["temporal_delay"][i]),
                "emotion_intensity": float(
                    forensic["emotion_intensity"][i]
                ),
            }
            for i in range(count)
        ]
        if collect_fused:
            return (
                rows,
                np.asarray(fused)[:count],
                np.asarray(aux)[:count],
            )
        return rows

    def _explain_background(self, k: int) -> np.ndarray:
        """(K, hidden+2) SHAP background from the TRAINING corpus.

        Evenly-spaced corpus rows pushed through the restored fusion
        (with their transductive GCN embeddings, and the trained tower's
        text features on tower checkpoints) — a fixed reference
        distribution, computed once and cached. Using the request batch
        itself (the reference's KernelExplainer call does this, ref
        :252) makes attributions depend on what else was in the request
        and degenerates to all-zeros for single-record requests.
        """
        cached = getattr(self, "_explain_bg", None)
        if cached is not None and cached.shape[0] >= k:
            return cached[:k]
        n = int(self.cache["labels"].shape[0])
        idx = np.unique(
            np.linspace(0, n - 1, num=min(k, n)).astype(np.int64)
        )

        def rows(key, dtype=np.float32):
            return jnp.asarray(self.cache[key][idx].astype(dtype))

        feats = {
            "audio_features": rows("audio"),
            "visual_features": rows("visual"),
            "temporal_features": rows("temporal"),
        }
        if self.text_tower is not None:
            feats["text_features"] = self.text_tower.apply(
                {"params": self.params["text_tower"]},
                rows("text_ids", np.int32),
                rows("text_mask"),
                deterministic=True,
            )
        else:
            feats["text_features"] = rows("text")
        if self.use_evidence:
            feats["evidence"] = rows("evidence")
        if self.use_gnn:
            p = self.params["gnn"]
            if self.NBR_IDX is not None:
                agg = jnp.einsum(
                    "nk,nkh->nh", self.NBR_W, self.H_CORPUS[self.NBR_IDX]
                )
            else:
                agg = self.A_NORM @ self.H_CORPUS
            z = agg @ p["lin2"]["kernel"] + p["lin2"]["bias"]
            feats["gnn_feat"] = z[idx]
        fo = self.fusion.apply(
            {"params": self.params["fusion"]}, feats, deterministic=True
        )
        bg = np.concatenate(
            [
                np.asarray(fo["fused"], np.float32),
                self.cache["aux"][idx].astype(np.float32),
            ],
            axis=1,
        )
        self._explain_bg = bg
        return bg

    def explain(
        self,
        records: Sequence[Dict[str, Any]],
        method: str = "grad",
        top_k: int = 8,
        n_coalitions: Optional[int] = None,
        background_size: int = 32,
    ) -> List[Dict[str, Any]]:
        """Score records AND attach classifier attributions per record.

        The reference exposes interpretability only as methods on the
        classifier (`deep_truth_classifier.py:189-272`) with no serving
        path to reach them; here the same attributions ride the serving
        featurize->score pipeline. `method`:
          * "grad" — Gradient x Input on the class-1 logit (one backward
            per batch; cheap enough for the hot path);
          * "shap" — `explain_shap`'s ladder (shap package -> native
            jitted KernelSHAP -> SmoothGrad). For "kernel-shap" results
            the SHAP efficiency axiom ties the attributions to the served
            probability exactly: base + sum(values) == prob_fake.

        Attributions are over the classifier's input — the fused-512
        embedding plus the 2 aux scalars [temporal_delay, emotion] — the
        exact surface the reference explains. Each row gains an "explain"
        dict: {method, aux: {...}, top_fused_dims: [[dim, value], ...],
        fused_attr_l1, and base_value for kernel-shap}.
        """
        if method not in ("grad", "shap"):
            raise ValueError(f"unknown explain method: {method!r}")
        if not records:
            return []
        from ultrafnd_git_tpu.training import interpret

        rows, fused, aux = self._pipeline(list(records), collect_fused=True)

        base_values = None
        if method == "grad":
            # pad to the same power-of-two bucket ladder as scoring so
            # novel request sizes reuse a handful of compiled grad
            # programs (retracing costs seconds over the tunnel)
            n = fused.shape[0]
            bucket = max(1, self.batch_size)
            while bucket < n:
                bucket *= 2
            pad = bucket - n
            fz, az = fused, aux
            if pad:
                fz = np.concatenate([fz, np.repeat(fz[-1:], pad, axis=0)])
                az = np.concatenate([az, np.repeat(az[-1:], pad, axis=0)])
            values, _ = interpret.feature_importance(
                self.clf, self.params["clf"], fz, az
            )
            values = values[:n]
            method_used = "grad_x_input"
        else:
            out = interpret.explain_shap(
                self.clf,
                self.params["clf"],
                fused,
                aux,
                max_samples=len(rows),
                n_coalitions=n_coalitions,
                # a FIXED corpus-derived background: explaining requests
                # against themselves makes attributions batch-dependent
                # and identically zero for single-record requests
                background=self._explain_background(background_size),
            )
            values = out["values"]
            method_used = out["method"]
            base_values = out.get("base_values")

        h = fused.shape[1]
        for i, row in enumerate(rows):
            v = np.asarray(values[i])
            fused_v, aux_v = v[:h], v[h:]
            order = np.argsort(-np.abs(fused_v))[: max(0, int(top_k))]
            info = {
                "method": method_used,
                # aux layout is [temporal_delay, emotion] (cache contract,
                # reference fakesv_dataset.py:179-189)
                "aux": {
                    "temporal_delay": float(aux_v[0]) if aux_v.size else 0.0,
                    "emotion": float(aux_v[1]) if aux_v.size > 1 else 0.0,
                },
                "top_fused_dims": [
                    [int(d), float(fused_v[d])] for d in order
                ],
                "fused_attr_l1": float(np.abs(fused_v).sum()),
                # signed total over ALL fused dims — with kernel-shap,
                # base_value + fused_signed_sum + aux == prob_fake exactly
                "fused_signed_sum": float(fused_v.sum()),
            }
            if base_values is not None:
                info["base_value"] = float(base_values[i])
            row["explain"] = info
        return rows
