"""Checkpoint export (`scripts/export_reference_checkpoint.py`).

The inverse of the import test: a model trained HERE is written as a
reference-layout `best.pt`, strict-loaded by the live reference modules
(`load_state_dict(strict=True)`, the same call the reference trainer's
`test()` makes at `src/training/forensic_trainer.py:373-377`), and
reproduces our logits at fp32 tolerance. Import(export(x)) == x closes
the bidirectional-migration loop.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
REPO = Path(__file__).resolve().parents[1]

pytestmark = [
    pytest.mark.slow,  # trains a tiny checkpoint + torch module builds
    pytest.mark.skipif(
        not (REFERENCE / "src").exists(), reason="reference tree not mounted"
    ),
]

ATOL = 1e-4


@pytest.fixture(scope="module")
def trained_out(fixture_data_root, tmp_path_factory):
    """One tiny trained v2 out_dir shared by the module's tests."""
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    out = tmp_path_factory.mktemp("export_src")
    t = ForensicTrainer(
        TrainConfig(
            data_root=fixture_data_root,
            out_dir=str(out),
            batch_size=8,
            epochs=1,
            seed=7,
            log_metrics_jsonl=False,
        )
    )
    t.fit()
    return {"out": str(out), "trainer": t}


@pytest.fixture(scope="module")
def exported(trained_out, tmp_path_factory):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from export_reference_checkpoint import export_slot
    finally:
        sys.path.remove(str(REPO / "scripts"))
    dest = str(tmp_path_factory.mktemp("export_dst") / "best.pt")
    payload = export_slot(trained_out["out"], "best", dest)
    return {"dest": dest, "payload": payload}


def test_reference_modules_strict_load_and_match_logits(exported):
    """The reference's own strict load accepts the file, and the loaded
    torch modules reproduce our Flax logits on random features."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from export_reference_checkpoint import verify_export
    finally:
        sys.path.remove(str(REPO / "scripts"))
    delta = verify_export(exported["dest"])
    assert delta < ATOL


def test_export_then_import_is_identity(exported, trained_out):
    """v2_params_from_best_pt(export(params)) returns the trained params
    bit-exactly (modulo the f32 round-trip, which is lossless)."""
    import torch

    from ultrafnd_git_tpu.utils.torch_transfer import v2_params_from_best_pt

    payload = torch.load(
        exported["dest"], map_location="cpu", weights_only=False
    )
    roundtrip = v2_params_from_best_pt(payload)
    import jax

    orig = trained_out["trainer"].state.params
    for top in ("fusion", "clf", "gnn"):
        o_leaves = jax.tree.flatten_with_path(orig[top])[0]
        r = roundtrip[top]
        for path, leaf in o_leaves:
            got = r
            for key in path:
                got = got[key.key]
            np.testing.assert_array_equal(
                np.asarray(leaf, dtype=np.float32), got,
                err_msg=f"{top}{jax.tree_util.keystr(path)}",
            )


def test_cfg_payload_speaks_reference_vocabulary(exported):
    cfg = exported["payload"]["cfg"]
    # every field of the reference TrainConfig (forensic_trainer.py:90-107)
    for field in (
        "data_root", "ocr_phrase_pkl", "out_dir", "batch_size", "epochs",
        "lr", "weight_decay", "gnn_dim", "gnn_overlap_thresh", "seed",
        "use_mps", "use_gnn", "save_best", "grad_clip",
        "early_stop_patience",
    ):
        assert field in cfg, field
    assert cfg["use_mps"] is False
    assert cfg["use_gnn"] is True


def test_export_rejects_foreign_trainer_slot(trained_out, tmp_path):
    """An integrated-trainer slot must not be silently exported as v2."""
    import json
    import shutil

    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from export_reference_checkpoint import export_slot
    finally:
        sys.path.remove(str(REPO / "scripts"))

    out = tmp_path / "foreign"
    shutil.copytree(trained_out["out"], out)
    meta_path = out / "best" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["trainer"] = "integrated"
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="trainer"):
        export_slot(str(out), "best", str(tmp_path / "best.pt"))
