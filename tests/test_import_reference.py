"""Reference-checkpoint migration (`scripts/import_reference_checkpoint.py`).

A `best.pt` written by the reference v2 trainer
(`/root/reference/src/training/forensic_trainer.py:350-361`) is imported
into an Orbax `best` slot, then consumed by the serving `Predictor` — and
the restored weights reproduce the torch modules' logits at fp32
tolerance. This is the end-to-end guarantee behind "switch frameworks
without retraining".
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
REPO = Path(__file__).resolve().parents[1]

pytestmark = [
    pytest.mark.slow,  # subprocess trainer build + Predictor compile
    pytest.mark.skipif(
        not (REFERENCE / "src").exists(), reason="reference tree not mounted"
    ),
]

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref_best_pt(tmp_path_factory):
    """A real reference-format best.pt from the reference's own modules."""
    sys.path.insert(0, str(REFERENCE))
    try:
        import torch

        from src.models.fusion.cross_modal_transformer import (
            CrossModalTransformer as RefFusion,
        )
        from src.models.fusion.deep_truth_classifier import (
            DeepTruthClassifier as RefClassifier,
        )
        from src.training.forensic_trainer import SimpleGCN as RefGCN

        torch.manual_seed(99)
        fusion = RefFusion().eval()
        clf = RefClassifier().eval()
        # reference _build_gnn dims: in 416 (compact concat), hid 2*gnn_dim
        gnn = RefGCN(in_dim=416, hid=256, out_dim=128, dropout=0.2).eval()
        path = tmp_path_factory.mktemp("refckpt") / "best.pt"
        torch.save(
            {
                "fusion": fusion.state_dict(),
                "clf": clf.state_dict(),
                "gnn": gnn.state_dict(),
                # exactly the reference TrainConfig.__dict__ shape,
                # with paths that do NOT exist on this machine (the
                # import CLI must take local paths from its own flags)
                "cfg": {
                    "data_root": "/Users/someone/FakeSV",
                    "ocr_phrase_pkl": "/Users/someone/ocr_phrase_fea.pkl",
                    "out_dir": "outputs",
                    "batch_size": 16,
                    "epochs": 8,
                    "lr": 2e-4,
                    "weight_decay": 1e-4,
                    "gnn_dim": 128,
                    "gnn_overlap_thresh": 0.12,
                    "seed": 42,
                    "use_mps": True,
                    "use_gnn": True,
                    "save_best": True,
                    "grad_clip": 5.0,
                    "early_stop_patience": 3,
                },
            },
            path,
        )
        yield torch, fusion, clf, path
    finally:
        sys.path.remove(str(REFERENCE))


def test_import_then_serve_matches_reference_logits(
    ref_best_pt, fixture_data_root, tmp_path
):
    torch, ref_fusion, ref_clf, best_pt = ref_best_pt
    out_dir = tmp_path / "imported"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(REPO),
        ULTRAFND_DISABLE_HF="1",
        HF_HUB_OFFLINE="1",
        TRANSFORMERS_OFFLINE="1",
    )
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "import_reference_checkpoint.py"),
            str(best_pt),
            "--data_root",
            fixture_data_root,
            "--out_dir",
            str(out_dir),
            "--cpu",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    meta = json.loads((out_dir / "best" / "meta.json").read_text())
    assert meta["trainer"] == "v2"
    assert meta["imported_from"] == str(best_pt.resolve())
    assert meta["cfg"]["data_root"] == fixture_data_root  # not the Mac path
    # `latest` mirrored too: --resume fine-tuning restores THAT slot; epoch
    # 0 makes resume start a fresh schedule (start_epoch = epoch + 1 = 1)
    latest = json.loads((out_dir / "latest" / "meta.json").read_text())
    assert latest["imported_from"] == meta["imported_from"]
    assert latest["epoch"] == 0
    assert (out_dir / "latest" / "state").exists()

    import jax.numpy as jnp

    from ultrafnd_git_tpu.serving import Predictor

    pred = Predictor(str(out_dir))

    # ---- restored weights reproduce the torch modules at fp32 tol ----
    rng = np.random.default_rng(3)
    b = 4
    feats_np = {
        "text_features": rng.standard_normal((b, 768)).astype(np.float32),
        "audio_features": rng.standard_normal((b, 128)).astype(np.float32),
        "visual_features": rng.standard_normal((b, 512)).astype(np.float32),
        "temporal_features": rng.standard_normal((b, 256)).astype(np.float32),
        "gnn_feat": rng.standard_normal((b, 128)).astype(np.float32),
    }
    aux_np = rng.uniform(size=(b, 2)).astype(np.float32)

    with torch.inference_mode():
        ref_f = ref_fusion({k: torch.from_numpy(v) for k, v in feats_np.items()})
        ref_c = ref_clf(ref_f["fused"], torch.from_numpy(aux_np))

    out_f = pred.fusion.apply(
        {"params": pred.params["fusion"]},
        {k: jnp.asarray(v) for k, v in feats_np.items()},
        deterministic=True,
    )
    out_c = pred.clf.apply(
        {"params": pred.params["clf"]},
        out_f["fused"],
        jnp.asarray(aux_np),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["logits"]),
        ref_f["logits"].numpy(),
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(out_c["probs"]), ref_c["probs"].numpy(), atol=ATOL
    )

    # GNN weights came through too (not the local degree-recon init)
    ref_gnn_sd = torch.load(best_pt, map_location="cpu", weights_only=True)[
        "gnn"
    ]
    np.testing.assert_allclose(
        np.asarray(pred.params["gnn"]["lin1"]["kernel"]),
        ref_gnn_sd["lin1.weight"].numpy().T,
        atol=1e-6,
    )

    # ---- end-to-end serving smoke on the imported checkpoint ----
    results = pred.predict(
        [
            {
                "video_id": "new-1",
                "title": "突发 惊人 真相 曝光",
                "ocr": "震惊 全网 传播",
                "comments": ["假的吧", "不可信"],
            },
            {
                "video_id": "new-2",
                "title": "官方 通报 情况 说明",
                "ocr": "新闻 发布会",
                "comments": ["官方确认"],
            },
        ]
    )
    assert len(results) == 2
    for r in results:
        assert 0.0 <= r["prob_fake"] <= 1.0
