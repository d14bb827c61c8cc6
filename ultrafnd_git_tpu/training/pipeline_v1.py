"""v1 integrated raw-media pipeline: decode -> encode -> ensemble train/eval.

Parity target: reference `src/training/run_train_eval.py` (the 1,323-LoC
self-contained v1 pipeline, SURVEY §2.1): raw video/audio/comment decode,
7-encoder feature extraction per batch, an ENSEMBLE of fusion models,
mixup (ref :1245-1261), focal loss (alpha=1, gamma=2; ref :1263-1281),
train-time augmentation (ref :1165-1215), mean-logit ensemble prediction
(ref :946-1057), early stopping, and a dummy-random-data fallback when no
media is present (ref :1059-1158).

Latent reference bugs fixed, not replicated (SURVEY §2.1):
  * v1 imports `SemanticForgeryDetector` (a name that doesn't exist) so its
    whole model import block always fails and it silently trains dummy
    stand-ins — here the REAL evidence scorers run and feed the fusion
    evidence gates;
  * v1 creates fresh nn.Linear projections per batch (ref :787-788) —
    here all parameters live in one train state from step 0.

TPU-first design:
  * the ensemble is a single stacked-params pytree trained with ONE jitted
    step under `jax.vmap` — every member's matmuls batch together on the
    MXU instead of the reference's sequential Python loop over models;
  * mixup runs inside the compiled step (lam + permutation are step
    inputs); focal loss is a closed-form jnp expression;
  * only codec decode (and ELA's JPEG re-encode) stays on host; dense
    flow + chronos cues run as one jitted device program
    (`kernels/preprocess.py`), with the host cv2 ladder kept as the
    fallback rung (`ULTRAFND_DEVICE_CV=0`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ultrafnd_git_tpu.data.media import (
    AugmentedRawMediaDataset,
    RawMediaDataset,
    multimodal_collate,
)
from ultrafnd_git_tpu.models.chronos import ChronosGuard
from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
from ultrafnd_git_tpu.models.fusion import CrossModalTransformer
from ultrafnd_git_tpu.models.visual import OpticalFlow3DCNN
from ultrafnd_git_tpu.training.metrics import safe_auc


@dataclass
class V1Config:
    data_dir: Optional[str] = None
    epochs: int = 5
    batch_size: int = 4
    lr: float = 1e-4
    weight_decay: float = 1e-4
    ensemble_size: int = 2
    mixup_alpha: float = 0.2
    use_focal: bool = True
    focal_alpha: float = 1.0
    focal_gamma: float = 2.0
    augment: bool = True
    grad_clip: float = 1.0
    early_stop_patience: int = 15
    eval_every: int = 5  # reference evaluates every 5 epochs (ref :896)
    seed: int = 42
    debug_mode: bool = False  # tiny dummy run
    dummy_samples: int = 32


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 1.0,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Per-sample focal loss: alpha * (1 - pt)^gamma * CE (ref :1263-1281)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    pt = jnp.exp(-ce)
    return alpha * (1.0 - pt) ** gamma * ce


def mixup_arrays(
    rng: np.random.Generator, batch_size: int, alpha: float
) -> Tuple[float, np.ndarray]:
    """Host-side mixup draw: (lam, permutation) fed into the jitted step."""
    lam = float(rng.beta(alpha, alpha)) if alpha > 0 else 1.0
    return lam, rng.permutation(batch_size).astype(np.int32)


# ----------------------------------------------------------------------
# Host feature extraction (the "7 encoders" stage)
# ----------------------------------------------------------------------

class BatchFeatureExtractor:
    """Raw collated batch -> fixed-width feature dict + evidence scalars."""

    def __init__(self, seed: int = 42, use_device_cv: Optional[bool] = None):
        import os
        import threading

        from ultrafnd_git_tpu.data.cache import make_encoders

        enc = make_encoders(seed=seed)
        self.text_enc = enc["text"]
        self.audio_enc = enc["audio"]
        self.flow = enc["flow"]
        # cv2 algorithm objects (TV-L1 solvers) are stateful and not safe
        # for concurrent calc() — each pool thread gets its own instance.
        self._tls = threading.local()
        self.ela = enc["ela"]
        self.tsync = enc["tsync"]
        self.affective = enc["affective"]
        self.chronos = ChronosGuard.from_config()
        self.semantic = enc["semantic"]
        # Device CV stage (flow + chronos cues on the accelerator); the
        # host cv2 ladder below remains the fallback rung. Default: on
        # exactly when an accelerator backend is present — on CPU the
        # jitted block-matching loses to the cv2 ladder (measured ~800 vs
        # ~500 ms/sample host), on TPU it wins by >10x.
        if use_device_cv is None:
            env = os.environ.get("ULTRAFND_DEVICE_CV")
            if env is not None:
                use_device_cv = env == "1"
            else:
                import jax

                use_device_cv = jax.default_backend() != "cpu"
        self._device_cv = None
        if use_device_cv:
            from ultrafnd_git_tpu.kernels.preprocess import DeviceCVStage

            self._device_cv = DeviceCVStage(flow_dim=self.flow.dim)

    @staticmethod
    def _gray_host(arr: np.ndarray) -> np.ndarray:
        """uint8 RGB clips -> uint8 gray clips via cv2 (C++, ~0.2 ms/frame).

        Uploading gray instead of RGB cuts the host->device bytes 3x —
        the dominant cost once this environment's transfer path degrades
        (see DeviceCVStage.dispatch). Falls back to RGB (device-side
        gray) when cv2 is absent or the input is float.
        """
        try:
            import cv2
        except Exception:
            return arr
        if arr.dtype != np.uint8:
            return arr
        b, t, h, w, _ = arr.shape
        # one C++ call over the whole batch (cvtColor is per-pixel, so
        # stacking every frame into one tall image is equivalent)
        gray = cv2.cvtColor(
            np.ascontiguousarray(arr).reshape(b * t * h, w, 3),
            cv2.COLOR_RGB2GRAY,
        )
        return gray.reshape(b, t, h, w)

    def _cv_pool(self):
        """One long-lived pool — a fresh executor per batch would spawn
        new threads each time and the thread-local TV-L1 solvers in
        `thread_flow` would never see a cache hit."""
        if getattr(self, "_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=8)
        return self._pool

    def _cv_dispatch(self, batch: Dict[str, Any]):
        """Start the device-CV stage: gray-convert + enqueue the async
        upload/flow. Returns pending device futures, or None when the
        host cv2 ladder should handle this batch."""
        if self._device_cv is None:
            return None
        arr = np.asarray(batch["video_frames"])
        if arr.ndim != 5 or arr.shape[1] < 2 or arr.shape[-1] != 3:
            return None
        try:
            return self._device_cv.dispatch(self._gray_host(arr))
        except Exception as exc:
            print(f"⚠️  device CV stage failed ({exc!r}); host cv2 ladder")
            self._device_cv = None
            return None

    def _device_cv_block(self, frames, pending=None) -> Optional[tuple]:
        """Complete the accelerator CV stage; None routes to the host ladder."""
        arr = np.asarray(frames)
        if pending is None:
            return None
        # ELA needs a JPEG codec — host-side on the middle frame only,
        # overlapped with the async upload + device flow above
        ela_feats = np.stack([self.ela.ela_lbp(clip) for clip in arr])
        try:
            out = self._device_cv.finalize(pending)
        except Exception as exc:
            print(f"⚠️  device CV stage failed ({exc!r}); host cv2 ladder")
            self._device_cv = None
            return None
        return out["flow_feat"], ela_feats, out["tamper"]

    def stream(self, batches_with_meta):
        """Featurize an iterable of (batch, meta) pairs with CROSS-BATCH
        double buffering: batch N+1's device-CV dispatch (gray convert +
        async upload + flow program) is enqueued BEFORE batch N's host
        work (ELA JPEG pass, text/audio/temporal/evidence encoders), so
        the N+1 transfer rides under it. On this environment the upload
        runs at ~45 MB/s (BASELINE.md "transfer degradation") and was
        ~70% of the per-batch wall with only within-batch overlap
        (VERDICT r2 item 5). Yields (features, batch, meta) in order.
        """
        prev = None
        for batch, meta in batches_with_meta:
            cur = (batch, meta, self._cv_dispatch(batch))
            if prev is not None:
                pb, pm, pp = prev
                yield self._extract(pb, pp), pb, pm
            prev = cur
        if prev is not None:
            pb, pm, pp = prev
            yield self._extract(pb, pp), pb, pm

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        return self._extract(batch, self._cv_dispatch(batch))

    def _extract(
        self, batch: Dict[str, Any], cv_pending=None
    ) -> Dict[str, np.ndarray]:
        texts: List[Dict[str, Any]] = batch["text_data"]
        records = [
            {
                "title": t.get("title", ""),
                "ocr": t.get("ocr", "") or t.get("description", ""),
                "comments": t.get("comments", []),
            }
            for t in texts
        ]
        T = self.text_enc.encode_fields_batch(records)  # (B, 768)

        A = self.audio_enc.extract_waveform_batch(
            batch["audio_waveform"]
        )  # (B, 128) — one device forward when the W2V2 rung is live

        # ---- per-clip CV stage: gray + dense flow computed ONCE per clip
        # and shared between the flow features and the chronos cues (the
        # reference ran two independent flow passes); clips fan out over a
        # thread pool — cv2 releases the GIL, so this scales ~linearly.
        frames = batch["video_frames"]  # (B, 30, 256, 256, 3)

        def thread_flow() -> OpticalFlow3DCNN:
            inst = getattr(self._tls, "flow", None)
            if inst is None:
                inst = OpticalFlow3DCNN(dim=self.flow.dim)
                self._tls.flow = inst
            return inst

        def cv_worker(clip):
            from ultrafnd_git_tpu.models.chronos import cut_scores
            from ultrafnd_git_tpu.models.visual import (
                ensure_gray,
                frames_from_input,
                resize,
            )

            flow_enc = thread_flow()
            fr = frames_from_input(clip)
            if not fr or len(fr) < 2:
                zeros = np.zeros(flow_enc.dim, np.float32)
                return zeros, self.ela.ela_lbp(clip), 0.0
            gray = np.stack(
                [ensure_gray(resize(f, (256, 256))) for f in fr]
            )
            flows = flow_enc.flows_for_gray(gray)
            flow_feat = flow_enc.pool_flows(flows)
            tamper = self.chronos.tamper_score_from_cues(
                cut_scores(gray),
                self.chronos.flow_mags_from_flows(flows),
            )
            return flow_feat, self.ela.ela_lbp(clip), tamper

        if cv_pending is None:
            cv_pending = self._cv_dispatch(batch)
        device_out = self._device_cv_block(frames, cv_pending)
        if device_out is not None:
            flow_feats, ela_feats, tamper_list = device_out
        else:
            cv_out = list(self._cv_pool().map(cv_worker, frames))
            flow_feats, ela_feats, tamper_list = zip(*cv_out)
        V = np.concatenate(
            [np.stack(flow_feats), np.stack(ela_feats)], axis=1
        ).astype(np.float32)  # (B, 512)
        V /= np.linalg.norm(V, axis=1, keepdims=True) + 1e-9
        tamper = np.asarray(tamper_list, dtype=np.float32)

        U = self.tsync.align_batch(T, V)  # (B, 256)
        U_tt = self.tsync.align_batch(T, T)

        from ultrafnd_git_tpu.data.cache import alignment_delay

        delay = alignment_delay(U_tt, U)

        # Real evidence scorers, wired in (fixes SURVEY §2.1 latent bug)
        full_text = [
            (r["title"] + " " + r["ocr"]).strip() for r in records
        ]
        aff = self.affective.analyze_batch(
            full_text, list(batch["audio_waveform"])
        )
        # tamper already computed from the shared per-clip flows above
        sem_gap = self.semantic.gap_magnitude(
            [r["title"] for r in records], [r["ocr"] for r in records]
        )
        evidence = np.stack([sem_gap, aff["intensity"], tamper], axis=1)

        aux = np.stack([delay, aff["intensity"]], axis=1).astype(np.float32)
        return {
            "text": T.astype(np.float32),
            "audio": A.astype(np.float32),
            "visual": V,
            "temporal": U.astype(np.float32),
            "aux": aux,
            "evidence": evidence.astype(np.float32),
        }


# ----------------------------------------------------------------------
# Ensemble trainer
# ----------------------------------------------------------------------

class EnsembleTrainer:
    """Vmapped ensemble of (fusion -> classifier) stacks."""

    def __init__(self, cfg: V1Config):
        self.cfg = cfg
        self.fusion = CrossModalTransformer.from_config().clone(use_gnn=False)
        self.clf = DeepTruthClassifier.from_config()

        b = cfg.batch_size
        # Host (numpy) init templates: build_state may re-run under a CPU
        # default device after an accelerator failure, and jnp constants
        # created here would stay committed to the original device.
        dummy = {
            "text_features": np.zeros((b, 768), np.float32),
            "audio_features": np.zeros((b, 128), np.float32),
            "visual_features": np.zeros((b, 512), np.float32),
            "temporal_features": np.zeros((b, 256), np.float32),
        }
        def init_member(key):
            kf, kc = jax.random.split(key)
            return {
                "fusion": self.fusion.init(kf, dummy)["params"],
                "clf": self.clf.init(
                    kc,
                    np.zeros((b, self.fusion.hidden), np.float32),
                    np.zeros((b, 2), np.float32),
                )["params"],
            }

        def build_state():
            # Keys are created here (not captured) so a re-init after an
            # accelerator failure never reads arrays on the dead device.
            keys = jax.random.split(
                jax.random.PRNGKey(cfg.seed), cfg.ensemble_size
            )
            # Stacked pytree: every leaf gains a leading (E,) member axis.
            params = jax.vmap(init_member)(keys)
            return params, self.tx.init(params)

        # NOTE: clipping happens per ensemble member inside the step (a
        # chained clip_by_global_norm here would compute one JOINT norm
        # over the stacked pytree, coupling the supposedly independent
        # members through the optimizer).
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self._build_state = build_state  # reused by the CPU failure ladder
        self.params, self.opt_state = build_state()
        self.step_count = 0
        self._rng = jax.random.PRNGKey(cfg.seed + 1)

        self._train_step = jax.jit(self._make_train_step())
        self._eval_logits = jax.jit(self._make_eval_logits())

        # Whole-pipeline accelerator-failure ladder (reference parity:
        # its v1 catches OOM at model creation and re-initializes
        # everything on CPU, ref src/training/run_train_eval.py:673-714).
        # Here the guarded unit is the jitted step itself: if it dies on
        # a broken accelerator mid-run, the live train state moves to the
        # host CPU device and training continues there.
        self.device_failures = 0
        self._cpu_dev = None  # set on first fallback

    # ------------------------------------------------------------------
    def _fallback_to_cpu(self, exc: BaseException) -> bool:
        """Move the live train state to CPU after an accelerator failure.

        Returns False (caller re-raises) when already on CPU or no CPU
        backend is reachable; otherwise True and the caller retries the
        step with CPU-committed inputs (jit compiles a CPU executable
        for the new placement automatically).
        """
        if self._cpu_dev is not None:
            return False
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except Exception:
            return False  # CPU platform unavailable — nothing to fall to
        print(
            f"⚠️  accelerator step failed ({exc!r}); re-initializing on "
            "CPU and continuing (reference v1 OOM->CPU behavior)"
        )
        self.device_failures += 1
        self._cpu_dev = cpu
        try:
            self.params = jax.device_put(jax.device_get(self.params), cpu)
            self.opt_state = jax.device_put(
                jax.device_get(self.opt_state), cpu
            )
        except Exception:
            # The live state itself is unfetchable (poisoned by the async
            # failure or the device is gone) — the reference's answer is
            # to re-initialize everything on CPU and keep training
            # (ref src/training/run_train_eval.py:673-714); do the same.
            print(
                "⚠️  live train state unrecoverable from the failed "
                "device; re-initializing parameters on CPU"
            )
            with jax.default_device(cpu):
                self.params, self.opt_state = self._build_state()
        try:
            self._rng = jax.device_put(jax.device_get(self._rng), cpu)
        except Exception:
            self._rng = jax.device_put(
                jax.random.PRNGKey(self.cfg.seed + 1), cpu
            )
        return True

    def _place(self, x):
        """Batch-array placement honoring an active CPU fallback."""
        if self._cpu_dev is not None:
            return jax.device_put(np.asarray(x), self._cpu_dev)
        return jnp.asarray(x)

    def _member_logits(self, member_params, feats, aux, evidence, rng):
        det = rng is None
        rngs_f = rngs_c = None
        if not det:
            kf, kc = jax.random.split(rng)
            rngs_f, rngs_c = {"dropout": kf}, {"dropout": kc}
        fo = self.fusion.apply(
            {"params": member_params["fusion"]},
            {
                "text_features": feats["text"],
                "audio_features": feats["audio"],
                "visual_features": feats["visual"],
                "temporal_features": feats["temporal"],
                "evidence": evidence,
            },
            deterministic=det,
            rngs=rngs_f,
        )
        co = self.clf.apply(
            {"params": member_params["clf"]},
            fo["fused"],
            aux,
            deterministic=det,
            rngs=rngs_c,
        )
        return co["logits"]

    def _make_train_step(self):
        cfg = self.cfg

        def member_loss(member_params, feats, aux, evidence, y, lam, perm, rng):
            mixed = {
                k: lam * v + (1.0 - lam) * v[perm] for k, v in feats.items()
            }
            aux_m = lam * aux + (1.0 - lam) * aux[perm]
            ev_m = lam * evidence + (1.0 - lam) * evidence[perm]
            logits = self._member_logits(member_params, mixed, aux_m, ev_m, rng)
            if cfg.use_focal:
                la = focal_loss(logits, y, cfg.focal_alpha, cfg.focal_gamma)
                lb = focal_loss(
                    logits, y[perm], cfg.focal_alpha, cfg.focal_gamma
                )
            else:
                la = optax.softmax_cross_entropy_with_integer_labels(logits, y)
                lb = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y[perm]
                )
            return (lam * la + (1.0 - lam) * lb).mean()

        def step(params, opt_state, feats, aux, evidence, y, lam, perm, rng):
            member_keys = jax.random.split(rng, cfg.ensemble_size)

            def one(member_params, key):
                return jax.value_and_grad(member_loss)(
                    member_params, feats, aux, evidence, y, lam, perm, key
                )

            losses, grads = jax.vmap(one)(params, member_keys)
            if cfg.grad_clip and cfg.grad_clip > 0:
                def clip_member(g):
                    norm = optax.global_norm(g)
                    scale = jnp.minimum(
                        1.0, cfg.grad_clip / (norm + 1e-9)
                    )
                    return jax.tree.map(lambda x: x * scale, g)

                grads = jax.vmap(clip_member)(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses.mean()

        return step

    def _make_eval_logits(self):
        def run(params, feats, aux, evidence):
            logits = jax.vmap(
                lambda p: self._member_logits(p, feats, aux, evidence, None)
            )(params)  # (E, B, 2)
            return logits.mean(axis=0)  # mean-logit ensemble (ref :946-1057)

        return run

    # ------------------------------------------------------------------
    def train_batch(self, feats: Dict[str, np.ndarray], labels: np.ndarray,
                    host_rng: np.random.Generator) -> float:
        cfg = self.cfg
        lam, perm = mixup_arrays(host_rng, labels.shape[0], cfg.mixup_alpha)
        self._rng, key = jax.random.split(self._rng)

        def run():
            return self._train_step(
                self.params,
                self.opt_state,
                {
                    k: self._place(feats[k])
                    for k in ("text", "audio", "visual", "temporal")
                },
                self._place(feats["aux"]),
                self._place(feats["evidence"]),
                self._place(labels.astype(np.int32)),
                self._place(np.asarray(lam, np.float32)),
                self._place(perm),
                key,
            )

        # Materialize the loss INSIDE the try: jitted dispatch is async,
        # so a dying accelerator usually surfaces at the fetch, not the
        # call. self.params/opt_state are only committed after the fetch
        # succeeds, so the ladder retries from the last good state.
        try:
            params, opt_state, loss = run()
            loss = float(loss)
        except Exception as exc:
            if not self._fallback_to_cpu(exc):
                raise
            self._rng, key = jax.random.split(self._rng)  # CPU-placed key
            params, opt_state, loss = run()
            loss = float(loss)
        self.params, self.opt_state = params, opt_state
        self.step_count += 1
        return loss

    def predict_batch(self, feats: Dict[str, np.ndarray]) -> np.ndarray:
        def run():
            return self._eval_logits(
                self.params,
                {
                    k: self._place(feats[k])
                    for k in ("text", "audio", "visual", "temporal")
                },
                self._place(feats["aux"]),
                self._place(feats["evidence"]),
            )

        # np.asarray materializes inside the try — see train_batch.
        try:
            return np.asarray(jax.nn.softmax(run(), axis=-1))
        except Exception as exc:
            if not self._fallback_to_cpu(exc):
                raise
            return np.asarray(jax.nn.softmax(run(), axis=-1))


# ----------------------------------------------------------------------
# Dummy-data fallback (ref :1059-1158)
# ----------------------------------------------------------------------

def _dummy_feature_batches(
    n: int, batch_size: int, seed: int
) -> List[Tuple[Dict[str, np.ndarray], np.ndarray]]:
    rng = np.random.default_rng(seed)
    batches = []
    for s in range(0, n, batch_size):
        b = min(batch_size, n - s)
        if b < batch_size:
            break  # fixed shapes only
        feats = {
            "text": rng.standard_normal((b, 768)).astype(np.float32),
            "audio": rng.standard_normal((b, 128)).astype(np.float32),
            "visual": rng.standard_normal((b, 512)).astype(np.float32),
            "temporal": rng.standard_normal((b, 256)).astype(np.float32),
            "aux": rng.uniform(size=(b, 2)).astype(np.float32),
            "evidence": rng.uniform(size=(b, 3)).astype(np.float32),
        }
        labels = rng.integers(0, 2, size=b).astype(np.int64)
        batches.append((feats, labels))
    return batches


def prefetched(iterator, depth: int = 2):
    """Run `iterator` in a background thread, keeping `depth` items ready.

    The v1 pipeline is host-bound (decode + CV features); prefetching
    overlaps the next batch's host work with the current batch's device
    step — the reference trains strictly serially. Exceptions in the
    producer are re-raised at the consumer.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()  # consumer gone — producer must drain out

    def _put(item) -> bool:
        # bounded put: if the consumer abandoned the generator (raise /
        # GC mid-epoch), a blocking put would pin this thread plus its
        # decoded batches for the life of the process
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(sentinel)
        except BaseException as exc:  # surfaced on the consumer side
            _put(exc)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


# ----------------------------------------------------------------------
# Entry: train_and_evaluate (ref :551-923)
# ----------------------------------------------------------------------

def train_and_evaluate(
    data_dir: Optional[str] = None,
    debug_mode: bool = False,
    cfg: Optional[V1Config] = None,
) -> Dict[str, float]:
    if cfg is None:
        cfg = V1Config(data_dir=data_dir, debug_mode=debug_mode)
    else:
        # positional args must not be silently ignored when cfg is given
        if data_dir is not None and cfg.data_dir is None:
            cfg.data_dir = data_dir
        if debug_mode:
            cfg.debug_mode = True
    host_rng = np.random.default_rng(cfg.seed)
    trainer = EnsembleTrainer(cfg)

    use_dummy = cfg.debug_mode or not cfg.data_dir
    extractor = None
    if not use_dummy:
        try:
            dataset = RawMediaDataset(cfg.data_dir)
            extractor = BatchFeatureExtractor(seed=cfg.seed)
        except FileNotFoundError:
            print("⚠️  No dataset found — training with dummy data")
            use_dummy = True

    if use_dummy:
        batches = _dummy_feature_batches(
            cfg.dummy_samples,
            min(cfg.batch_size, cfg.dummy_samples),  # never zero batches
            cfg.seed,
        )
        k = max(1, int(0.75 * len(batches)))
        train_batches, val_batches = batches[:k], batches[k:] or batches[:1]

        def epoch_train():
            losses = [
                trainer.train_batch(f, y, host_rng) for f, y in train_batches
            ]
            return float(np.mean(losses))

        def evaluate():
            ys, ps = [], []
            for f, y in val_batches:
                probs = trainer.predict_batch(f)
                ys.append(y)
                ps.append(probs[:, 1])
            y = np.concatenate(ys)
            p1 = np.concatenate(ps)
            acc = float(((p1 >= 0.5).astype(int) == y).mean())
            return acc, safe_auc(y, p1)

    else:
        n = len(dataset)
        order = host_rng.permutation(n)
        k = max(1, int(0.75 * n))  # 75/25 split (ref :631-639)
        train_idx, val_idx = order[:k], order[k:]
        train_ds = AugmentedRawMediaDataset(
            dataset, augment=cfg.augment, seed=cfg.seed
        )

        def batch_items(ds, idx_list, pad_last=False):
            for s in range(0, len(idx_list), cfg.batch_size):
                sel = list(idx_list[s : s + cfg.batch_size])
                valid = len(sel)
                if valid < cfg.batch_size:
                    if not pad_last:
                        if valid:
                            print(
                                f"  (dropping trailing {valid}-sample train "
                                "batch; fixed shapes)"
                            )
                        break
                    sel = sel + [sel[-1]] * (cfg.batch_size - valid)
                yield multimodal_collate([ds[int(i)] for i in sel]), valid

        def featurized(ds, idx_list, pad_last=False):
            # extractor.stream double-buffers the device-CV stage across
            # batches (N+1's upload dispatched before N's host work)
            for feats, batch, valid in extractor.stream(
                batch_items(ds, idx_list, pad_last=pad_last)
            ):
                yield (feats, batch["label"]), valid

        def epoch_train():
            losses = []
            for (feats, labels), _valid in prefetched(
                featurized(train_ds, host_rng.permutation(train_idx))
            ):
                losses.append(trainer.train_batch(feats, labels, host_rng))
            return float(np.mean(losses)) if losses else 0.0

        def evaluate():
            ys, ps = [], []
            for (feats, labels), valid in prefetched(
                featurized(dataset, val_idx, pad_last=True)
            ):
                probs = trainer.predict_batch(feats)
                ys.append(labels[:valid])
                ps.append(probs[:valid, 1])
            if not ys:
                return 0.0, 0.5
            y = np.concatenate(ys)
            p1 = np.concatenate(ps)
            acc = float(((p1 >= 0.5).astype(int) == y).mean())
            return acc, safe_auc(y, p1)

    best_acc, best_auc, no_improve = -1.0, 0.5, 0
    loss = 0.0  # stays 0.0 when epochs == 0 (eval-only call)
    last_eval = None  # (acc, auc) of the most recent in-loop evaluation
    for epoch in range(1, cfg.epochs + 1):
        loss = epoch_train()
        line = f"[v1 Epoch {epoch:02d}/{cfg.epochs}] loss={loss:.4f}"
        if epoch % cfg.eval_every == 0 or epoch == cfg.epochs:
            acc, auc = evaluate()
            last_eval = (acc, auc)
            line += f" | val acc={acc:.3f} auc={auc:.3f}"
            if acc > best_acc + 1e-6:
                best_acc, best_auc, no_improve = acc, auc, 0
            else:
                no_improve += 1
        print(line)
        if no_improve >= cfg.early_stop_patience:
            print("↳ Early stopping")
            break

    # the last epoch always evaluates inside the loop — a second full
    # validation pass (decode + flow over the whole split) would just
    # recompute it; only early-stopped/epochs=0 runs still need one
    if last_eval is not None and no_improve < cfg.early_stop_patience:
        acc, auc = last_eval
    else:
        acc, auc = evaluate()
    if acc > best_acc:
        best_acc, best_auc = acc, auc
    return {
        "val_acc": acc,
        "val_auc": auc,
        "best_val_acc": best_acc,
        "best_val_auc": best_auc,
        "loss": loss,
        "ensemble_size": cfg.ensemble_size,
        "steps": trainer.step_count,
    }


def _main() -> None:
    """Standalone v1 entry (the reference runs its v1 pipeline the same
    way: `python src/training/run_train_eval.py`, ref :1283-1324)."""
    import argparse

    p = argparse.ArgumentParser(
        description="ultrafnd_git_tpu v1 — raw-media ensemble train/eval"
    )
    p.add_argument("--data_dir", type=str, default=None,
                   help="FakeSV root with videos/ (dummy data if omitted)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--ensemble_size", type=int, default=2)
    p.add_argument("--no_mixup", action="store_true")
    p.add_argument("--no_focal", action="store_true")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--debug", action="store_true",
                   help="Force the dummy-data path")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()  # the device-CV stage compile is ~50 s cold

    cfg = V1Config(
        data_dir=args.data_dir,
        epochs=args.epochs,
        batch_size=args.batch_size,
        ensemble_size=args.ensemble_size,
        mixup_alpha=0.0 if args.no_mixup else 0.2,
        use_focal=not args.no_focal,
        augment=not args.no_augment,
        eval_every=args.eval_every,
        seed=args.seed,
        debug_mode=args.debug,
    )
    results = train_and_evaluate(cfg=cfg)
    print("\n==== v1 Final Results ====")
    for k, v in results.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    _main()
