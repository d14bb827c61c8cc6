#!/usr/bin/env python3
"""Smoke test: model shape contracts + trainer init/eval, no real data.

Parity target: reference `scripts/smoke_test_v2.py` —
  * test_model_initialization (ref :32-58): GNN 416->128, fusion on random
    B=2 tensors asserting fused == (2, 512), classifier probs == (2, 2);
  * test_trainer_initialization (ref :60-82): full trainer with epochs=0
    then .test(), asserting the result-dict keys. The reference hard-codes
    the author's Mac paths; here the checked-in fixture makes it hermetic.
  * exit-code protocol: 0 ok, 1 test failure, 2 import failure (ref :84-95).
"""
import os
import sys
import tempfile
import unittest
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("ULTRAFND_DISABLE_HF", "1")

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
    from ultrafnd_git_tpu.models.fusion import CrossModalTransformer
    from ultrafnd_git_tpu.models.gnn import GNNModel
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig
except Exception as exc:  # import failure -> exit 2 (reference protocol)
    print(f"IMPORT FAILURE: {exc}")
    sys.exit(2)

FIXTURE = REPO / "tests" / "fixtures" / "fakesv_tiny"


class TestModelInitialization(unittest.TestCase):
    def test_model_initialization(self):
        key = jax.random.PRNGKey(0)
        gnn = GNNModel(hid=256, out_dim=128)
        x = jax.random.normal(key, (4, 416))
        adj = jnp.eye(4)
        z = gnn.apply(gnn.init(key, x, adj), x, adj)
        self.assertEqual(z.shape, (4, 128))

        fusion = CrossModalTransformer.from_config(
            str(REPO / "configs/model_configs/fusion.yaml")
        )
        feats = {
            "text_features": jax.random.normal(key, (2, 768)),
            "audio_features": jax.random.normal(key, (2, 128)),
            "visual_features": jax.random.normal(key, (2, 512)),
            "temporal_features": jax.random.normal(key, (2, 256)),
            "gnn_feat": jax.random.normal(key, (2, 128)),
        }
        fo = fusion.apply(fusion.init(key, feats), feats)
        self.assertEqual(fo["fused"].shape, (2, 512))

        clf = DeepTruthClassifier.from_config(
            str(REPO / "configs/model_configs/classifier.yaml")
        )
        aux = jax.random.uniform(key, (2, 2))
        co = clf.apply(clf.init(key, fo["fused"], aux), fo["fused"], aux)
        self.assertEqual(co["probs"].shape, (2, 2))


class TestTrainerInitialization(unittest.TestCase):
    def test_trainer_initialization(self):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = TrainConfig(
                data_root=str(FIXTURE),
                out_dir=tmp,
                epochs=0,
                batch_size=8,
                cache_to_disk=False,
                save_best=False,
                log_metrics_jsonl=False,
            )
            trainer = ForensicTrainer(cfg)
            results = trainer.test()
            for k in (
                "test_loss",
                "test_acc",
                "test_auc",
                "test_precision",
                "test_recall",
                "test_f1",
                "test_cmcs",
                "test_dfdr",
            ):
                self.assertIn(k, results)


if __name__ == "__main__":
    result = unittest.main(exit=False).result
    sys.exit(0 if result.wasSuccessful() else 1)
