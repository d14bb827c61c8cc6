"""AOT serving artifacts: `jax.export` the Predictor's scoring program.

`export_artifact(predictor, path)` freezes the exact scoring program a
live `serving.Predictor` runs — the inductive-GCN extension + fusion +
NODE classifier (+ trained text tower / int8 dequant when the checkpoint
has them) — into a directory of three files:

  scorer.jaxexport   serialized StableHLO (jax.export.Exported bytes),
                     traced ONCE with a symbolic batch dimension so one
                     program serves every request size, and lowered for
                     MULTIPLE platforms (cpu + tpu by default) so the
                     same artifact runs on a dev host and a TPU pod
  arrays.npz         the scoring weights (f32, or int8+scales under
                     --quantize) plus the frozen corpus context the
                     graph extension reads (XG, H_CORPUS, degrees,
                     OCR posting lists)
  meta.json          featurizer contract: seed, hash salt, OCR
                     tokenization mode, evidence/tower flags, Jaccard
                     threshold — everything `featurize()` needs

`ExportedPredictor(path)` serves from that directory alone: no Orbax
checkpoint restore, no Flax module construction, no model-code trace at
startup — deployment cannot drift from the exported numerics because
the program is bytes, not Python. Scores are bit-identical to the live
Predictor on the same backend (asserted in tests/test_serving.py).

The reference has no serving story at all (SURVEY §2.5 stops at
`predict_proba`); this is the TPU-native production analogue of a
TorchScript/SavedModel export, built on jax.export's cross-platform
lowering instead of a tracer of its own.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultrafnd_git_tpu.serving import Predictor

FORMAT = "ultrafnd-serving-artifact/1"
_SCORER = "scorer.jaxexport"
_ARRAYS = "arrays.npz"
_META = "meta.json"

# `text_tower is not None` is the only way Predictor branches on the
# tower, so a sentinel keeps the inherited featurize/_score_chunk paths
# on the tower branch without reconstructing the Flax module.
class _ExportedTower:
    def __repr__(self) -> str:  # pragma: no cover - debugging nicety
        return "<exported text tower (inside scorer.jaxexport)>"


def _flatten_params(tree) -> Dict[str, np.ndarray]:
    """Nested-dict param tree -> {'a/b/c': array} (flax names never
    contain '/'); int8 quantized leaves serialize as-is."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            if not isinstance(p, jax.tree_util.DictKey):
                raise TypeError(
                    f"param tree must be nested dicts, got key {p!r}"
                )
            parts.append(str(p.key))
        out["/".join(parts)] = np.asarray(leaf)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def export_artifact(
    predictor: Predictor,
    path: str,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Path:
    """Write an AOT serving artifact for `predictor` under `path`.

    The scoring function is traced with a symbolic batch dim, so the
    artifact serves any padded-bucket size without re-export. Lowering
    happens for every platform in `platforms` at once (jax.export
    cross-platform lowering — no TPU needed to produce the tpu copy).
    """
    from jax import export as jexport

    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)

    (b,) = jexport.symbolic_shape("b")
    f32, i32 = jnp.float32, jnp.int32

    def spec(shape, dtype=f32):
        return jax.ShapeDtypeStruct(shape, dtype)

    cache = predictor.cache
    fused = bool(getattr(predictor, "fused_align", False))

    n_corpus, g_in = predictor.XG.shape
    params_spec = jax.tree.map(
        lambda a: spec(a.shape, a.dtype), predictor._score_params
    )
    h_spec = (
        spec(predictor.H_CORPUS.shape)
        if predictor.H_CORPUS is not None
        else spec(())
    )
    tower_len = getattr(predictor, "_tower_len", None)
    ids_spec = (
        spec((b, tower_len), i32) if predictor.text_tower is not None
        else spec((), f32)
    )
    mask_spec = (
        spec((b, tower_len)) if predictor.text_tower is not None
        else spec((), f32)
    )

    if fused:
        # fused-align contract (serving.Predictor._make_score_fused):
        # raw text/audio/visual + host aux/evidence halves; the program
        # computes temporal/aux/evidence-delay itself — exported
        # artifacts keep the one-dispatch-per-request property
        align_spec = jax.tree.map(
            lambda a: spec(a.shape, a.dtype), predictor._align_params
        )
        exported = jexport.export(
            jax.jit(predictor._make_score(fused=True)),
            platforms=tuple(platforms),
        )(
            params_spec,
            align_spec,
            spec((b, cache["text"].shape[1])),    # t_raw
            spec((b, cache["audio"].shape[1])),   # audio
            spec((b, cache["visual"].shape[1])),  # visual
            spec((b,)),                            # emo
            spec((b, 2)) if predictor.use_evidence else spec(()),
            spec((b, n_corpus)),    # a_rows
            spec((b,)),             # self_w
            spec((n_corpus, g_in)),  # xg_corpus
            h_spec,
            ids_spec,
            mask_spec,
        )
        feats_keys = ["audio", "emo", "text", "visual"]
        if predictor.use_evidence:
            feats_keys.append("evidence_host")
    else:
        feats_spec: Dict[str, jax.ShapeDtypeStruct] = {
            "audio_features": spec((b, cache["audio"].shape[1])),
            "visual_features": spec((b, cache["visual"].shape[1])),
            "temporal_features": spec((b, cache["temporal"].shape[1])),
        }
        if predictor.text_tower is None:
            feats_spec["text_features"] = spec((b, cache["text"].shape[1]))
        if predictor.use_evidence:
            feats_spec["evidence"] = spec((b, cache["evidence"].shape[1]))

        exported = jexport.export(
            jax.jit(predictor._make_score()), platforms=tuple(platforms)
        )(
            params_spec,
            feats_spec,
            spec((b, 2)),           # aux
            spec((b, n_corpus)),    # a_rows
            spec((b,)),             # self_w
            spec((b, g_in)),        # xg_new
            spec((n_corpus, g_in)),  # xg_corpus
            h_spec,
            ids_spec,
            mask_spec,
        )
        feats_keys = sorted(feats_spec)
    (root / _SCORER).write_bytes(exported.serialize())

    arrays: Dict[str, np.ndarray] = {
        "p:" + k: v for k, v in _flatten_params(predictor._score_params).items()
    }
    if fused:
        arrays.update(
            {
                "ap:" + k: v
                for k, v in _flatten_params(predictor._align_params).items()
            }
        )
    arrays["XG"] = np.asarray(predictor.XG)
    if predictor.H_CORPUS is not None:
        arrays["H_CORPUS"] = np.asarray(predictor.H_CORPUS)
    arrays["corpus_deg"] = np.asarray(predictor.corpus_deg, np.float32)
    arrays["corpus_sizes"] = np.asarray(predictor._corpus_sizes, np.float32)
    # posting lists -> parallel (token, doc) arrays; rebuilt at load
    toks: list = []
    docs: list = []
    for tok, js in predictor._postings.items():
        toks.extend([tok] * len(js))
        docs.extend(js.tolist())
    arrays["ocr_tok"] = np.asarray(toks, dtype=np.str_)
    arrays["ocr_doc"] = np.asarray(docs, dtype=np.int64)
    np.savez_compressed(root / _ARRAYS, **arrays)

    meta = {
        "format": FORMAT,
        "platforms": list(platforms),
        "use_gnn": predictor.use_gnn,
        "use_evidence": predictor.use_evidence,
        "quantize": predictor.quantize,
        "bf16": predictor.bf16,
        "seed": predictor._seed,
        "hash_salt": predictor._hash_salt,
        "ocr_clean": predictor._ocr_clean,
        "thresh": predictor.thresh,
        "tower_len": tower_len,
        "batch_size": predictor.batch_size,
        "n_corpus": int(n_corpus),
        "fused_align": fused,
        "feats_keys": feats_keys,
    }
    (root / _META).write_text(json.dumps(meta, indent=1), encoding="utf-8")
    return root


class ExportedPredictor(Predictor):
    """Serve from an exported artifact directory.

    Inherits Predictor's featurize/chunk/prefetch machinery wholesale
    (bit-identical request handling by construction); only the scoring
    call is replaced by the deserialized AOT program, and __init__ reads
    the artifact instead of restoring a checkpoint. explain() needs the
    full-precision Flax modules and is deliberately unsupported here.
    """

    def __init__(self, artifact_dir: str, batch_size: Optional[int] = None):
        # deliberately NOT calling Predictor.__init__ — no checkpoint,
        # no cache npz, no Flax modules
        from ultrafnd_git_tpu.data.cache import make_encoders
        from ultrafnd_git_tpu.ops.hashing import set_hash_salt
        from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache
        from jax import export as jexport

        enable_persistent_cache()
        root = Path(artifact_dir)
        meta_path = root / _META
        if not meta_path.exists():
            raise FileNotFoundError(
                f"no serving artifact at {root} (missing {_META})"
            )
        meta = json.loads(meta_path.read_text(encoding="utf-8"))
        if meta.get("format") != FORMAT:
            raise ValueError(
                f"unsupported artifact format {meta.get('format')!r} "
                f"(this build reads {FORMAT!r})"
            )
        backend = jax.default_backend()
        if backend not in meta["platforms"]:
            raise ValueError(
                f"artifact was lowered for {meta['platforms']} but this "
                f"process runs on {backend!r} — re-export with "
                f"platforms=(..., {backend!r})"
            )

        self.out_dir = root
        self.batch_size = int(batch_size or meta["batch_size"])
        self.bf16 = bool(meta["bf16"])
        self.quantize = bool(meta["quantize"])
        self.use_gnn = bool(meta["use_gnn"])
        self.use_evidence = bool(meta["use_evidence"])
        self.thresh = float(meta["thresh"])
        self._seed = int(meta["seed"])
        self._hash_salt = str(meta["hash_salt"])
        self._ocr_clean = bool(meta["ocr_clean"])
        self.text_tower = (
            _ExportedTower() if meta["tower_len"] is not None else None
        )
        if meta["tower_len"] is not None:
            self._tower_len = int(meta["tower_len"])
        set_hash_salt(self._hash_salt)

        self.fused_align = bool(meta.get("fused_align", False))
        self._score_is_fused = self.fused_align
        # the artifact holds ONE compiled shape — cap dispatch chunks at
        # batch_size so warmup/live requests above it chunk instead of
        # asking the AOT program for an unexported shape (ADVICE r4)
        self._fixed_shape_dispatch = True

        # Validate the featurizer contract NOW: if current featurization
        # code drifted from the exported spec (feature keys, tower token
        # length), failing here with the cause beats the opaque XLA
        # shape/arity error the first dispatch would raise.
        if self.fused_align:
            expected_keys = {"audio", "emo", "text", "visual"}
            if self.use_evidence:
                expected_keys.add("evidence_host")
        else:
            expected_keys = {
                "audio_features", "visual_features", "temporal_features"
            }
            if self.text_tower is None:
                expected_keys.add("text_features")
            if self.use_evidence:
                expected_keys.add("evidence")
        if sorted(expected_keys) != sorted(meta.get("feats_keys") or []):
            raise ValueError(
                f"artifact feature spec {sorted(meta.get('feats_keys') or [])} "
                f"does not match this build's featurizer output "
                f"{sorted(expected_keys)} — re-export the artifact"
            )
        if self.text_tower is not None:
            from ultrafnd_git_tpu.data.cache import TOWER_IDS_LEN

            if self._tower_len != int(TOWER_IDS_LEN):
                raise ValueError(
                    f"artifact was exported with tower token length "
                    f"{self._tower_len} but this build tokenizes to "
                    f"{int(TOWER_IDS_LEN)} — re-export the artifact"
                )

        z = np.load(root / _ARRAYS, allow_pickle=False)
        flat = {
            k[2:]: z[k] for k in z.files if k.startswith("p:")
        }
        self._score_params = jax.device_put(
            jax.tree.map(jnp.asarray, _unflatten_params(flat))
        )
        self.params = self._score_params  # no separate f32 tree here
        if self.fused_align:
            aflat = {
                k[3:]: z[k] for k in z.files if k.startswith("ap:")
            }
            self._align_params = jax.device_put(
                jax.tree.map(jnp.asarray, _unflatten_params(aflat))
            )
        self.XG = jnp.asarray(z["XG"])
        self.H_CORPUS = (
            jnp.asarray(z["H_CORPUS"]) if "H_CORPUS" in z.files else None
        )
        self.corpus_deg = np.asarray(z["corpus_deg"], np.float32)
        self._corpus_sizes = np.asarray(z["corpus_sizes"], np.float32)
        postings: Dict[str, list] = {}
        for tok, doc in zip(z["ocr_tok"].tolist(), z["ocr_doc"].tolist()):
            postings.setdefault(tok, []).append(doc)
        self._postings = {
            tok: np.asarray(js, dtype=np.int64)
            for tok, js in postings.items()
        }

        exported = jexport.deserialize(
            bytearray((root / _SCORER).read_bytes())
        )
        # jit(exported.call): each padded-bucket shape XLA-compiles once
        # and lands in the persistent compile cache; there is no Python
        # model trace — the program is the serialized StableHLO
        self._score = jax.jit(exported.call)

        self._encoders = make_encoders(
            seed=self._seed, with_evidence=self.use_evidence
        )

    # ------------------------------------------------------------------
    def _get_score(self, fused: bool):
        """An exported artifact carries exactly ONE scoring program —
        there are no Flax modules here to retrace the other variant."""
        if fused != self._score_is_fused:
            raise ValueError(
                "this artifact was exported with "
                f"fused_align={self._score_is_fused} but the feature "
                "cache handed to predict_featurized follows the "
                f"{'fused' if fused else 'legacy'} contract — featurize "
                "with this ExportedPredictor's own featurize()"
            )
        return self._score

    def explain(self, *args, **kwargs):  # pragma: no cover - guard
        raise NotImplementedError(
            "explain() needs the full-precision Flax modules; serve "
            "explanations from serving.Predictor(out_dir), not from an "
            "exported artifact"
        )

    def _explain_background(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError("see explain()")
