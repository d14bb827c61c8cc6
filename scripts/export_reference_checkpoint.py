#!/usr/bin/env python3
"""Export a TPU-native checkpoint slot to a reference-loadable `best.pt`.

The inverse of `scripts/import_reference_checkpoint.py`: a model trained
HERE becomes a `torch.save({"fusion": state_dict, "clf": state_dict,
"gnn": state_dict|None, "cfg": dict})` file in exactly the layout the
reference's v2 trainer writes and strict-loads
(`src/training/forensic_trainer.py:350-377`), so a reference user can
take our weights back into the unmodified reference CLI
(`--eval_only` against the exported out_dir/best.pt). Together the two
scripts make migration bidirectional.

Usage:
  python scripts/export_reference_checkpoint.py --out_dir outputs \
      [--slot best|latest] [--dest /path/best.pt] [--verify]

Notes:
  * Needs only the checkpoint slot — no dataset: the weights are
    restored template-free (`checkpoint.load_checkpoint_raw`).
  * A `--train_text_tower` checkpoint exports its fusion/clf/gnn heads
    but NOT the text tower (the reference has no trainable text tower to
    load it into); a warning is printed because those heads were trained
    against tower-produced text features, not the reference's featurizer.
  * `--verify` (requires the reference tree on disk) strict-loads the
    export into the live reference modules and checks logits against our
    Flax forward on random features at fp32 tolerance.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

REFERENCE = Path("/root/reference")


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(
        description="Export an Orbax slot to a reference best.pt"
    )
    ap.add_argument("--out_dir", type=str, required=True,
                    help="trained out_dir containing the slot")
    ap.add_argument("--slot", type=str, default="best",
                    choices=("best", "latest"))
    ap.add_argument("--dest", type=str, default=None,
                    help="output path (default: <out_dir>/best.pt)")
    ap.add_argument("--verify", action="store_true",
                    help="strict-load into the live reference modules and "
                         "compare logits vs our Flax forward")
    return ap.parse_args()


def export_slot(out_dir: str, slot: str, dest: str) -> dict:
    """Restore `slot` from `out_dir` and write a reference best.pt at
    `dest`. Returns the torch payload that was saved."""
    import torch

    from ultrafnd_git_tpu.training import checkpoint as ckpt
    from ultrafnd_git_tpu.utils.config import ConfigManager
    from ultrafnd_git_tpu.utils.torch_transfer import (
        best_pt_state_dicts_from_v2_params,
    )

    restored = ckpt.load_checkpoint_raw(out_dir, slot)
    if restored is None:
        raise FileNotFoundError(f"no '{slot}' checkpoint under {out_dir}")
    state, meta = restored
    if meta.get("trainer") not in (None, "v2"):
        raise ValueError(
            f"slot was written by trainer {meta.get('trainer')!r}; only v2 "
            "checkpoints map onto the reference's best.pt layout"
        )
    cfg = dict(meta.get("cfg") or {})
    params = state["params"]

    if "text_tower" in params:
        print(
            "warning: checkpoint carries a trained text tower — the "
            "reference has no analogue, so only fusion/clf/gnn are "
            "exported. Those heads were trained against TOWER text "
            "features; paired with the reference's own featurizer they "
            "will underperform their source accuracy."
        )

    # both sides read tau from the same classifier YAML schema
    clf_yaml = cfg.get(
        "classifier_config", "configs/model_configs/classifier.yaml"
    )
    clf_cfg = ConfigManager().load_config(clf_yaml)
    tau = float(clf_cfg.get("node_tau", clf_cfg.get("tau", 10.0)))

    sds = best_pt_state_dicts_from_v2_params(params, tau=tau)
    payload = {
        key: (
            None
            if sd is None
            # as_tensor copies non-contiguous inputs and — unlike
            # np.ascontiguousarray — preserves 0-d shapes (temperature
            # and tau are 0-d in the reference's state dicts)
            else {k: torch.as_tensor(v) for k, v in sd.items()}
        )
        for key, sd in sds.items()
    }
    # cfg in the reference TrainConfig's vocabulary (forensic_trainer.py:90-107)
    payload["cfg"] = {
        "data_root": cfg.get("data_root", ""),
        "ocr_phrase_pkl": cfg.get("ocr_phrase_pkl"),
        "out_dir": str(Path(dest).parent),
        "batch_size": int(cfg.get("batch_size", 16)),
        "epochs": int(cfg.get("epochs", 8)),
        "lr": float(cfg.get("lr", 2e-4)),
        "weight_decay": float(cfg.get("weight_decay", 1e-4)),
        "gnn_dim": int(cfg.get("gnn_dim", 128)),
        "gnn_overlap_thresh": float(cfg.get("gnn_overlap_thresh", 0.12)),
        "seed": int(cfg.get("seed", 42)),
        "use_mps": False,
        "use_gnn": bool(cfg.get("use_gnn", True)),
        "save_best": True,
        "grad_clip": float(cfg.get("grad_clip", 5.0)),
        "early_stop_patience": int(cfg.get("early_stop_patience", 3)),
        # provenance (extra keys are harmless: the reference only reads
        # the state dicts back, forensic_trainer.py:373-377)
        "exported_from": str(Path(out_dir).resolve()),
        "exported_slot": slot,
        "export_tool": "ultrafnd_git_tpu/scripts/export_reference_checkpoint.py",
        "hash_salt": cfg.get("hash_salt"),
    }
    Path(dest).parent.mkdir(parents=True, exist_ok=True)
    torch.save(payload, dest)
    return payload


def verify_export(dest: str) -> float:
    """Strict-load `dest` into the live reference modules; return the max
    |Δlogit| vs our Flax forward on random features."""
    import torch

    sys.path.insert(0, str(REFERENCE))
    try:
        from src.models.fusion.cross_modal_transformer import (
            CrossModalTransformer as RefFusion,
        )
        from src.models.fusion.deep_truth_classifier import (
            DeepTruthClassifier as RefClassifier,
        )

        payload = torch.load(dest, map_location="cpu", weights_only=False)
        use_gnn = bool(payload["cfg"].get("use_gnn", True))
        if not use_gnn:
            # the reference reads use_gnn from its fusion YAML (no
            # constructor arg), and its no-GNN path crashes anyway
            # (PARITY.md) — nothing to verify against
            print("--verify skipped: use_gnn=False exports have no "
                  "working reference-side loader")
            return 0.0
        ref_fusion = RefFusion()
        ref_fusion.load_state_dict(payload["fusion"])  # strict
        ref_clf = RefClassifier()
        ref_clf.load_state_dict(payload["clf"])  # strict
        ref_fusion.eval()
        ref_clf.eval()

        import jax.numpy as jnp

        from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
        from ultrafnd_git_tpu.models.fusion import CrossModalTransformer
        from ultrafnd_git_tpu.utils.torch_transfer import (
            classifier_params_from_state_dict,
            fusion_params_from_state_dict,
        )

        rng = np.random.default_rng(0)
        b = 4
        feats_np = {
            "text_features": rng.standard_normal((b, 768)).astype(np.float32),
            "audio_features": rng.standard_normal((b, 128)).astype(np.float32),
            "visual_features": rng.standard_normal((b, 512)).astype(
                np.float32
            ),
            "temporal_features": rng.standard_normal((b, 256)).astype(
                np.float32
            ),
        }
        if use_gnn:
            gdim = int(payload["cfg"].get("gnn_dim", 128))
            feats_np["gnn_feat"] = rng.standard_normal((b, gdim)).astype(
                np.float32
            )
        aux = rng.uniform(size=(b, 2)).astype(np.float32)

        with torch.no_grad():
            tfeats = {k: torch.from_numpy(v) for k, v in feats_np.items()}
            fused = ref_fusion(tfeats)
            ref_out = ref_clf(fused["fused"], torch.from_numpy(aux))
            ref_logits = fused["logits"].numpy()
            ref_clf_logits = ref_out["logits"].numpy()

        ours_fusion = CrossModalTransformer.from_config(
            "configs/model_configs/fusion.yaml"
        )
        ours_clf = DeepTruthClassifier.from_config(
            "configs/model_configs/classifier.yaml"
        )
        fp = fusion_params_from_state_dict(payload["fusion"])
        cp = classifier_params_from_state_dict(payload["clf"])
        jfeats = {k: jnp.asarray(v) for k, v in feats_np.items()}
        jfused = ours_fusion.apply({"params": fp}, jfeats)
        jout = ours_clf.apply(
            {"params": cp}, jfused["fused"], jnp.asarray(aux)
        )
        d_fusion = float(
            np.max(np.abs(np.asarray(jfused["logits"]) - ref_logits))
        )
        d_clf = float(
            np.max(np.abs(np.asarray(jout["logits"]) - ref_clf_logits))
        )
        return max(d_fusion, d_clf)
    finally:
        sys.path.remove(str(REFERENCE))


def main() -> int:
    args = parse_args()
    dest = args.dest or str(Path(args.out_dir) / "best.pt")
    payload = export_slot(args.out_dir, args.slot, dest)
    n_fusion = len(payload["fusion"])
    n_clf = len(payload["clf"])
    gnn_note = "+gnn" if payload["gnn"] is not None else ""
    print(
        f"exported {args.out_dir}/{args.slot} -> {dest} "
        f"(fusion {n_fusion} tensors, clf {n_clf}{gnn_note})"
    )
    if Path(dest).name == "best.pt":
        print(
            "consume it with the REFERENCE CLI: python run_train_eval.py "
            f"--data_root <data> --out_dir {Path(dest).parent} --eval_only"
        )
    else:
        # the reference's test() only ever loads <out_dir>/best.pt, and
        # when it is absent it SILENTLY evaluates random init weights
        # (forensic_trainer.py:372) — don't let a renamed file walk into
        # that
        print(
            f"note: the reference CLI only loads a file named best.pt — "
            f"rename {Path(dest).name} to best.pt inside the reference "
            "--out_dir before running --eval_only there"
        )
    if args.verify:
        if not (REFERENCE / "src").exists():
            print("--verify skipped: reference tree not mounted")
            return 0
        delta = verify_export(dest)
        print(f"verify: max |logit delta| vs reference modules = {delta:.2e}")
        if delta > 1e-4:
            print("error: exceeds fp32 tolerance 1e-4")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
