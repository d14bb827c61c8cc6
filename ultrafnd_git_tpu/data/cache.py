"""Batched feature-cache builder + on-disk persistence.

Parity target: reference `src/data_pipeline/fakesv_dataset.py:98-253`
(`build_gnn_cache_from_raw_dataset`): one pass over the corpus producing

    ids (N,) | labels (N,) | text (N,768) | audio (N,128) | visual (N,512)
    temporal (N,256) | aux (N,2) | ocr_sets list[set] | split (tr, va, te)

with identical per-field semantics:
  * text = mean of title/OCR/<=10-comment encodings, L2-normed
  * audio = encoding of the text proxy `title + " " + first comment`
  * visual = concat(flow-proxy-256, ELA-proxy-256) fit to 512, L2-normed
  * temporal = TemporalSyncNet.align(text, visual)
  * aux = [1 - cos(align(T,T), align(T,V)) clipped to [0,1],
           0.1 * count of 8 sensational terms, capped at 1]
  * ocr_sets = whitespace tokens (or the richer phrase pickle when given —
    the reference accepted but ignored that argument, SURVEY §2.3)
  * split = stratified 70/15/15

TPU-first differences:
  * everything is batched: encoders run corpus-wide (hot loop #1 from
    SURVEY §3.1 becomes a handful of array ops / model forwards),
  * the cache persists to one .npz so --eval_only never rebuilds
    (fixes the reference gap noted at SURVEY §3.2),
  * temporal alignment runs as a single jitted batch on the accelerator.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset
from ultrafnd_git_tpu.data.ocr import ocr_sets_for_records
from ultrafnd_git_tpu.data.splits import make_split
from ultrafnd_git_tpu.models.audio import SpectralForensics
from ultrafnd_git_tpu.models.temporal import TemporalSyncNet
from ultrafnd_git_tpu.models.text import BERTContextEncoder
from ultrafnd_git_tpu.ops.hashing import get_hash_salt
from ultrafnd_git_tpu.models.visual import DeepForgeryDetector, OpticalFlow3DCNN

# Sensational-term lexicon for the emotion-intensity proxy
# (reference fakesv_dataset.py:184).
EMO_TERMS = ("恐惧", "警告", "危险", "外星", "消失", "危机", "谣言", "假")

CACHE_VERSION = 3  # v3: + text_ids/text_mask (joint text-tower path)
TOWER_IDS_LEN = 64  # tokens kept per record for the trainable tower
TOWER_VOCAB = 32768  # stable-hash vocabulary (models/transformer.py)


def alignment_delay(u_ref: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Per-row delay proxy: clip(1 - cos(align(T,T), align(T,V)), 0, 1).

    The ONE copy of the aux[:, 0] formula (reference
    fakesv_dataset.py:179-182) — used by both the cache builder and the
    v1 raw-media extractor so the two pipelines cannot drift.
    """
    an = np.linalg.norm(u_ref, axis=-1) + 1e-9
    bn = np.linalg.norm(u, axis=-1) + 1e-9
    cos = np.sum(u_ref * u, axis=-1) / (an * bn)
    return np.clip(1.0 - cos, 0.0, 1.0).astype(np.float32)


def _l2n_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return (x / (n + 1e-9)).astype(np.float32)


def _fit_dim_rows(x: np.ndarray, dim: int) -> np.ndarray:
    if x.shape[1] == dim:
        return x
    if x.shape[1] > dim:
        return x[:, :dim]
    out = np.zeros((x.shape[0], dim), dtype=np.float32)
    out[:, : x.shape[1]] = x
    return out


def make_encoders(
    text_dim: int = 768,
    audio_dim: int = 128,
    visual_dim: int = 512,
    temporal_dim: int = 256,
    seed: int = 42,
    with_evidence: bool = True,
) -> Dict[str, Any]:
    """Encoder set for the cache contract, built once and reusable.

    The serving Predictor featurizes every request batch; constructing
    encoders (and their jitted lambdas) per call would re-trace — build
    once, pass to build_feature_cache(encoders=...).

    `with_evidence=False` skips constructing the evidence scorers
    (affective + semantic) — two model loads/forwards a `use_evidence=False`
    checkpoint never reads.
    """
    enc = {
        "text": BERTContextEncoder(dim=text_dim),
        "audio": SpectralForensics(dim=audio_dim),
        "flow": OpticalFlow3DCNN(dim=visual_dim // 2),
        "ela": DeepForgeryDetector(dim=visual_dim // 2),
        "tsync": TemporalSyncNet(
            in_dim=text_dim, out_dim=temporal_dim, seed=seed
        ),
    }
    if with_evidence:
        from ultrafnd_git_tpu.models.affective import AffectiveForensics
        from ultrafnd_git_tpu.models.semantic import SemanticForgeryAnalyzer

        enc["affective"] = AffectiveForensics.from_config()
        enc["semantic"] = SemanticForgeryAnalyzer.from_config(seed=seed)
    return enc


def build_feature_cache(
    raw: FakeSVRawDataset,
    ocr_phrase_pkl: Optional[str] = None,
    text_dim: int = 768,
    audio_dim: int = 128,
    visual_dim: int = 512,
    temporal_dim: int = 256,
    seed: int = 42,
    encoders: Optional[Dict[str, Any]] = None,
    ocr_clean_fallback: Optional[bool] = None,
    with_evidence: bool = True,
    with_tower_tokens: bool = True,
    with_align: bool = True,
) -> Dict[str, Any]:
    """Build the full tensor cache for the trainer + GNN in batched passes.

    Persisted trainer caches keep everything (with_evidence /
    with_tower_tokens True, the defaults) so any later config can reuse
    them. The serving featurizer disables the sections its checkpoint
    never reads — evidence scorer forwards on every request batch were
    pure hot-path waste for use_evidence=False checkpoints (VERDICT r2);
    the corresponding keys are then absent from the returned dict.

    `with_align=False` builds a HOST-ONLY cache: the temporal alignment
    MLP (the featurizer's single device dispatch) is skipped, and the
    keys it feeds — "temporal", "aux", "evidence" — are replaced by
    their host halves: "emo" (N,) and, under with_evidence,
    "evidence_host" (N, 2) = [semantic_conflict, emotion_intensity].
    The serving Predictor's fused scoring program computes the
    alignment, delay, aux and the evidence delay column IN-PROGRAM, so
    a request batch costs ONE device round trip instead of two —
    measured 36.8 ms featurize + 36.3 ms score at batch 64 over the
    tunneled chip, with 32.4 ms of the featurize being this one
    dispatch (BASELINE.md round-4 serving sections).
    """
    rng = np.random.default_rng(seed)
    n = len(raw)
    enc = encoders or make_encoders(
        text_dim, audio_dim, visual_dim, temporal_dim, seed
    )

    records = [raw.get_item(i) for i in range(n)]
    ids = np.array([r["id"] for r in records], dtype=object)
    labels = np.array([r["label"] for r in records], dtype=np.int64)

    # ---- text: corpus-wide field encoding ----------------------------------
    text_enc = enc["text"]
    T = text_enc.encode_fields_batch(records)  # (N, 768)

    # ---- stable-hash token ids (joint text-tower fine-tune path) -----------
    # Fixed (TOWER_IDS_LEN, TOWER_VOCAB) so persisted caches stay
    # compatible with any trainer config; ~N*64*4B, negligible.
    text_ids = text_mask = None
    if with_tower_tokens:
        from ultrafnd_git_tpu.models.transformer import hash_tokenize_batch

        combined = [
            " ".join(
                [r["title"] or "", r["ocr"] or "",
                 *(r["comments"] or [])[:10]]
            ).strip()
            for r in records
        ]
        text_ids, text_mask = hash_tokenize_batch(
            combined, TOWER_IDS_LEN, TOWER_VOCAB
        )

    # ---- audio: text-proxy batch -------------------------------------------
    aud_enc = enc["audio"]
    audio_proxies = [
        (r["title"] or "")
        + " "
        + (" ".join(r["comments"][:1]) if r["comments"] else "")
        for r in records
    ]
    A = aud_enc.extract_text_batch(audio_proxies)  # (N, 128)

    # ---- visual: flow-proxy ++ ELA-proxy, fit to visual_dim, L2 ------------
    vis_proxies = [r["ocr"] or r["title"] or "" for r in records]
    flow = enc["flow"].extract_text_batch(vis_proxies)
    ela = enc["ela"].ela_lbp_text_batch(vis_proxies)
    V = _l2n_rows(_fit_dim_rows(np.concatenate([flow, ela], axis=1), visual_dim))

    # ---- temporal: one jitted corpus-wide alignment pass — BOTH the
    # text-visual and the text-self reference alignments ride a single
    # 2N-row dispatch (row-wise MLP, exact; halves the featurizer's
    # device round trips on the serving hot path) --------------------------
    U = delay = None
    if with_align:
        tsync = enc["tsync"]
        U, U_tt = tsync.align_batch_pair(T, V)  # (N, 256) x2
        delay = alignment_delay(U_tt, U)

    # ---- aux: delay + emotion proxies --------------------------------------
    emo = np.array(
        [
            min(
                1.0,
                0.1
                * sum(
                    term in ((r["title"] or "") + (r["ocr"] or ""))
                    for term in EMO_TERMS
                ),
            )
            for r in records
        ],
        dtype=np.float32,
    )
    AUX = (
        np.stack([delay.astype(np.float32), emo], axis=1)  # (N, 2)
        if with_align
        else None
    )

    # ---- evidence: real scorer outputs (the wiring the reference intended
    # but never completed, SURVEY §2.1) — (N, 3) ordered
    # [semantic_conflict, emotion_intensity, temporal_delay]; the delay
    # column is the aux delay, so host-only caches carry the first two
    # columns as "evidence_host" and the scorer appends delay in-program
    evidence = evidence_host = None
    if with_evidence:
        titles = [r["title"] or "" for r in records]
        ocrs = [r["ocr"] or "" for r in records]
        texts_full = [
            (r["title"] or "") + " " + (r["ocr"] or "") for r in records
        ]
        sem_gap = enc["semantic"].gap_magnitude(titles, ocrs)
        emo_int = enc["affective"].analyze_batch(texts_full)["intensity"]
        if with_align:
            evidence = np.stack(
                [sem_gap, emo_int, delay.astype(np.float32)], axis=1
            ).astype(np.float32)
        else:
            evidence_host = np.stack(
                [sem_gap, emo_int], axis=1
            ).astype(np.float32)

    # ---- OCR token sets + split --------------------------------------------
    ocr_sets = ocr_sets_for_records(
        records, ocr_phrase_pkl, clean_fallback=ocr_clean_fallback
    )
    split = make_split(labels, rng)

    out = {
        "ids": ids,
        "labels": labels,
        "text": T.astype(np.float32),
        "audio": A.astype(np.float32),
        "visual": V.astype(np.float32),
        "ocr_sets": ocr_sets,
        "split": split,
    }
    if with_align:
        out["temporal"] = U.astype(np.float32)
        out["aux"] = AUX
    else:
        out["emo"] = emo
    if evidence is not None:
        out["evidence"] = evidence
    if evidence_host is not None:
        out["evidence_host"] = evidence_host
    if text_ids is not None:
        out["text_ids"] = text_ids
        out["text_mask"] = text_mask
    return out


# Reference-compatible alias
build_gnn_cache_from_raw_dataset = build_feature_cache


# Bump when feature-producing code changes (encoders, temporal MLP init,
# aux recipes): a persisted cache built by older code must rebuild, or
# eval/serving would silently mix old features with new-code expectations.
# v2: round-3 torch-default init in the (untrained) temporal align MLP.
# v3: round-4 fused align_batch_pair — one 2N-row dispatch; rows drift
#     ~1e-7 vs the two-call build (XLA tiles the bigger batch
#     differently), so v2 caches rebuild rather than mix.
FEATURES_VERSION = 3


def cache_fingerprint(
    data_root: str, seed: int, ocr_phrase_pkl: Optional[str]
) -> str:
    """Config identity of a persisted cache (reuse gate).

    Deliberately EXCLUDES the feature-code version: a config mismatch
    always rebuilds, but a version mismatch is policy (`load_cache
    stale_features`) — an out_dir's cache is the exact feature map its
    checkpoint was trained on, so eval/resume/serving reuse it rather
    than silently scoring the old checkpoint on a new feature
    distribution.
    """
    cfg: Dict[str, Any] = {
        "data_root": str(Path(data_root).resolve()),
        "seed": int(seed),
        "ocr_phrase_pkl": (
            str(Path(ocr_phrase_pkl).resolve()) if ocr_phrase_pkl else None
        ),
    }
    # The featurization salt changes every hash-derived feature, so a
    # salted cache must never be reused under a different salt. Included
    # only when set, so unsalted fingerprints stay byte-identical to
    # pre-salt caches (no spurious rebuilds of existing out_dirs).
    salt = get_hash_salt()
    if salt:
        cfg["hash_salt"] = salt
    return json.dumps(cfg, sort_keys=True)


def _parse_fingerprint(fp: str) -> Tuple[Optional[Dict[str, Any]], Optional[int]]:
    """(config dict without 'features', features version) from a stored
    fingerprint; (None, None) for non-JSON fingerprints ('injected',
    pre-fingerprint empty). Fingerprints written before the version was
    split out carry 'features' inside the JSON; absent means v1."""
    try:
        d = json.loads(fp)
        if not isinstance(d, dict):
            return None, None
    except Exception:
        return None, None
    feat = d.pop("features", 1)
    return d, int(feat)


def bootstrap_cache(
    data_root: str,
    out_dir: str,
    ocr_phrase_pkl: Optional[str] = None,
    seed: int = 42,
    cache_to_disk: bool = True,
    cache: Optional[Dict[str, Any]] = None,
    reuse_stale_features: bool = False,
) -> Dict[str, Any]:
    """Trainer cache ladder: injected > on-disk (out_dir) > rebuilt.

    `reuse_stale_features=True` (eval_only/resume) keeps an on-disk cache
    built by an older feature-code version — the checkpoint being
    restored was trained on it (see load_cache).

    Shared by both trainers so their bootstrap behavior cannot drift.
    An on-disk cache is reused only when its fingerprint (data_root,
    seed, ocr_phrase_pkl) matches the requested config — a stale cache
    from a different config would silently serve wrong features/splits.
    """
    cache_path = str(Path(out_dir) / "feature_cache.npz")
    fp = cache_fingerprint(data_root, seed, ocr_phrase_pkl)
    if cache is not None:
        # persist an injected cache so the out_dir can serve later
        # (Predictor loads feature_cache.npz from the out_dir). It is
        # stamped "injected", NOT this call's (data_root, seed, pkl)
        # fingerprint: the injected dict may have been built under
        # different arguments, and stamping the current identity onto it
        # would let a later run with these args silently reuse a cache
        # that was never built from them — that run rebuilds instead.
        if cache_to_disk and not Path(cache_path).exists():
            save_cache(cache, cache_path, fingerprint="injected")
        return cache
    if cache_to_disk:
        cache = load_cache(
            cache_path,
            expected_fingerprint=fp,
            stale_features="reuse" if reuse_stale_features else "rebuild",
        )
    if cache is None:
        raw = FakeSVRawDataset(data_root)
        cache = build_feature_cache(
            raw, ocr_phrase_pkl=ocr_phrase_pkl, seed=seed
        )
        if cache_to_disk:
            save_cache(cache, cache_path, fingerprint=fp)
    return cache


# ----------------------------------------------------------------------
# Persistence: one .npz so eval-only runs don't rebuild (SURVEY §3.2 gap)
# ----------------------------------------------------------------------

def save_cache(
    cache: Dict[str, Any], path: str, fingerprint: str = ""
) -> None:
    """Persist the cache ATOMICALLY (tmp + rename), process 0 only.

    Multi-process trainers (`--multihost`) all call bootstrap_cache with
    the same shared out_dir — every process builds the identical cache
    from the same seeded stream, so one writer suffices and concurrent
    writers would race the same .npz. The rename also means a concurrent
    reader (Predictor on the same out_dir) never sees a partial file.
    """
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(f".{p.name}.tmp-{os.getpid()}.npz")
    tr, va, te = cache["split"]
    np.savez_compressed(
        tmp,
        version=np.int64(CACHE_VERSION),
        features_version=np.int64(FEATURES_VERSION),
        fingerprint=np.str_(fingerprint),
        ids=np.array([str(x) for x in cache["ids"]]),
        labels=cache["labels"],
        text=cache["text"],
        audio=cache["audio"],
        visual=cache["visual"],
        temporal=cache["temporal"],
        aux=cache["aux"],
        evidence=cache.get(
            "evidence", np.zeros((len(cache["labels"]), 3), np.float32)
        ),
        text_ids=cache.get(
            "text_ids",
            np.zeros((len(cache["labels"]), TOWER_IDS_LEN), np.int32),
        ),
        text_mask=cache.get(
            "text_mask",
            np.zeros((len(cache["labels"]), TOWER_IDS_LEN), np.float32),
        ),
        ocr_sets=np.array(
            [json.dumps(sorted(s), ensure_ascii=False) for s in cache["ocr_sets"]]
        ),
        split_train=tr,
        split_val=va,
        split_test=te,
    )
    os.replace(tmp, p)  # atomic: readers see old-or-complete, never partial


def load_cache(
    path: str,
    expected_fingerprint: Optional[str] = None,
    stale_features: str = "rebuild",
) -> Optional[Dict[str, Any]]:
    """Load a persisted cache; None means absent/unusable (caller rebuilds).

    `stale_features` decides what a feature-code version mismatch means:
      * "rebuild" (default, fresh training): return None so the caller
        rebuilds with current feature code;
      * "reuse" (eval_only/resume/serving): return the cache with a loud
        warning — it is the exact feature map the out_dir's checkpoint
        was trained on, and rebuilding would silently score that
        checkpoint on a different feature distribution.
    """
    p = Path(path)
    if not p.exists():
        return None
    try:
        z = np.load(p, allow_pickle=False)
        version = int(z["version"])
        if version not in (2, CACHE_VERSION):
            return None
        if version == 2:
            # v2 lacks text_ids/text_mask only — every other field this
            # loader returns is present, so don't strand existing trained
            # out_dirs (serving would otherwise claim 'no feature cache')
            print(
                f"note: cache at {p} is v2 (no token ids); "
                "--train_text_tower needs a rebuilt cache"
            )
        stored = str(z["fingerprint"]) if "fingerprint" in z else ""
        stored_cfg, stored_feat = _parse_fingerprint(stored)
        if "features_version" in z:
            stored_feat = int(z["features_version"])
        if expected_fingerprint is not None:
            exp_cfg, _ = _parse_fingerprint(expected_fingerprint)
            if stored and stored_cfg != exp_cfg:
                print(
                    f"⚠️  cache at {p} was built under a different config "
                    "(data_root/seed/ocr_phrase_pkl) — rebuilding"
                )
                return None
            if not stored:
                print(
                    f"⚠️  cache at {p} predates config fingerprints; "
                    "reusing — delete it to force a rebuild"
                )
        if stored_feat is not None and stored_feat != FEATURES_VERSION:
            if stale_features == "reuse":
                print(
                    f"⚠️  cache at {p} was built by older feature code "
                    f"(v{stored_feat}, current v{FEATURES_VERSION}); "
                    "reusing it because the checkpoint in this out_dir "
                    "was trained on exactly these features. NOTE: serving "
                    "featurizes NEW records with current code — delete "
                    "feature_cache.npz and retrain to refresh"
                )
            else:
                print(
                    f"note: cache at {p} was built by older feature code "
                    f"(v{stored_feat}); rebuilding with current features"
                )
                return None
        ocr_sets: List[set] = [set(json.loads(s)) for s in z["ocr_sets"]]
        return {
            "ids": np.array(list(z["ids"]), dtype=object),
            "labels": z["labels"],
            "text": z["text"],
            "audio": z["audio"],
            "visual": z["visual"],
            "temporal": z["temporal"],
            "aux": z["aux"],
            "evidence": z["evidence"],
            "text_ids": (
                z["text_ids"]
                if "text_ids" in z
                else np.zeros(
                    (z["labels"].shape[0], TOWER_IDS_LEN), np.int32
                )
            ),
            "text_mask": (
                z["text_mask"]
                if "text_mask" in z
                else np.zeros(
                    (z["labels"].shape[0], TOWER_IDS_LEN), np.float32
                )
            ),
            "ocr_sets": ocr_sets,
            "split": (z["split_train"], z["split_val"], z["split_test"]),
        }
    except Exception:
        return None
