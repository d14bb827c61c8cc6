#!/usr/bin/env python3
"""Ad-hoc sanity checks: trainer forward, metrics, data loading.

Parity target: reference `scripts/sanity_check.py` (print-based checks of
trainer init + one forward batch, metrics on a 4-element hand case, data
loading). The reference's data-loading check references an undefined
variable and crashes (SURVEY §4); fixed here.
"""
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("ULTRAFND_DISABLE_HF", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

FIXTURE = REPO / "tests" / "fixtures" / "fakesv_tiny"


def check_trainer_forward() -> None:
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

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
        loss, metrics = trainer._epoch_loop(trainer.va_idx, "val")
        print(f"[sanity] forward batch ok: val_loss={loss:.4f} "
              f"acc={metrics['accuracy']:.3f}")


def check_metrics() -> None:
    from ultrafnd_git_tpu.training.metrics import compute_classification_metrics

    y = np.array([0, 1, 1, 0])
    p = np.array([0.1, 0.9, 0.8, 0.3])
    m = compute_classification_metrics(y, p)
    print(f"[sanity] metrics ok: acc={m['accuracy']:.3f} auc={m['auc']:.3f}")
    assert m["accuracy"] == 1.0 and m["auc"] == 1.0


def check_data_loading() -> None:
    from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset

    raw = FakeSVRawDataset(str(FIXTURE))
    item = raw.get_item(0)
    print(f"[sanity] data ok: {len(raw)} records, "
          f"first id={item['id']} label={item['label']}")
    assert len(raw) > 0 and set(item) == {"id", "title", "ocr", "comments", "label"}


if __name__ == "__main__":
    check_data_loading()
    check_metrics()
    check_trainer_forward()
    print("[sanity] all checks passed")
