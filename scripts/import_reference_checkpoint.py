#!/usr/bin/env python3
"""Import a reference-trained `best.pt` into a TPU-native checkpoint slot.

Migration path for users of the reference (Nuralamsiddik16/Ultrafnd_git):
a checkpoint written by its v2 trainer (`torch.save({"fusion": ...,
"clf": ..., "gnn": ..., "cfg": ...})`, reference
`src/training/forensic_trainer.py:350-361`) becomes a full Orbax `best`
slot that this repo's `--eval_only`, `scripts/predict.py`,
`scripts/serve.py`, and even `--resume` fine-tuning consume directly —
no retraining. The weight mapping is the parity-tested transfer
(`ultrafnd_git_tpu/utils/torch_transfer.py`; fp32 logit + gradient
parity asserted in `tests/test_parity.py`).

Usage:
  python scripts/import_reference_checkpoint.py /path/to/best.pt \
      --data_root data/fakesv --out_dir outputs_imported [--eval]

Notes:
  * `--data_root` points at the LOCAL dataset: the trainer rebuilds its
    feature cache + OCR graph here (the reference checkpoint carries no
    cache). Featurization draws differ between the two repos' offline
    hash fallbacks (BASELINE.md "Accuracy parity, attributed"), so a
    checkpoint trained on reference features is best paired with HF
    encoder rungs, where the featurizations agree.
  * Hyperparameters that shape the parameter pytree (gnn_dim, use_gnn)
    are taken from the checkpoint's embedded cfg; path-like fields
    (data_root, out_dir, ocr_phrase_pkl) come from the CLI.
"""
import argparse
import sys
from dataclasses import asdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(
        description="Import a reference best.pt into an Orbax best slot"
    )
    ap.add_argument("best_pt", type=str, help="path to the reference best.pt")
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--ocr_phrase_pkl", type=str, default=None)
    ap.add_argument(
        "--eval", action="store_true",
        help="run test() on the imported checkpoint and print metrics",
    )
    ap.add_argument(
        "--cpu", action="store_true", help="force the CPU backend"
    )
    return ap.parse_args()


def load_best_pt(path: str):
    import pickle

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except (TypeError, pickle.UnpicklingError) as e:
        # TypeError: torch too old for weights_only; UnpicklingError:
        # payloads with non-tensor leaves the safe unpickler rejects
        # (the reference writes dicts of tensors + a primitive cfg
        # dict). Anything else (corrupt file, IO) propagates — do NOT
        # retry those with the full unpickler. This fallback executes
        # the file's pickle program: only import checkpoints you trust.
        print(
            f"warning: safe (weights_only) load failed ({e}); retrying "
            "with the full unpickler — only do this for trusted files"
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def main() -> int:
    args = parse_args()
    if args.cpu:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    payload = load_best_pt(args.best_pt)
    for key in ("fusion", "clf"):
        if key not in payload:
            print(f"error: {args.best_pt} has no '{key}' state dict — "
                  "not a reference v2 best.pt")
            return 2
    ref_cfg = dict(payload.get("cfg") or {})

    import jax
    import jax.numpy as jnp

    if args.cpu:
        # the env var alone is not enough where a PJRT-plugin
        # sitecustomize pins jax_platforms (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.training import checkpoint as ckpt
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig
    from ultrafnd_git_tpu.utils.torch_transfer import v2_params_from_best_pt

    ocr_pkl = args.ocr_phrase_pkl
    if ocr_pkl is None:
        ref_pkl = ref_cfg.get("ocr_phrase_pkl")
        if ref_pkl and Path(ref_pkl).exists():
            ocr_pkl = ref_pkl
        elif ref_pkl:
            print(f"note: checkpoint's ocr_phrase_pkl {ref_pkl!r} not found "
                  "locally; building OCR sets from the metadata JSON")

    cfg = TrainConfig(
        data_root=args.data_root,
        ocr_phrase_pkl=ocr_pkl,
        out_dir=args.out_dir,
        batch_size=int(ref_cfg.get("batch_size", 16)),
        epochs=0,
        lr=float(ref_cfg.get("lr", 2e-4)),
        weight_decay=float(ref_cfg.get("weight_decay", 1e-4)),
        gnn_dim=int(ref_cfg.get("gnn_dim", 128)),
        gnn_overlap_thresh=float(ref_cfg.get("gnn_overlap_thresh", 0.12)),
        seed=int(ref_cfg.get("seed", 42)),
        use_gnn=bool(ref_cfg.get("use_gnn", True)),
        grad_clip=float(ref_cfg.get("grad_clip", 5.0)),
        early_stop_patience=int(ref_cfg.get("early_stop_patience", 3)),
    )

    print(f"building feature cache + graph from {args.data_root} ...")
    trainer = ForensicTrainer(cfg)

    imported = v2_params_from_best_pt(payload)
    if "gnn" not in imported and cfg.use_gnn:
        # reference stores gnn=None under use_gnn=False only; with
        # use_gnn=True it is always present — but guard anyway
        print("note: checkpoint has no GNN weights; keeping the local "
              "degree-recon pretrained GCN")

    # shape-check against the template before committing anything
    template = trainer.state.params
    for top, sub in imported.items():
        if top not in template:
            print(f"error: imported subtree {top!r} not in the local "
                  f"param pytree {sorted(template)}")
            return 2
        t_leaves = jax.tree.flatten_with_path(template[top])[0]
        i_leaves = jax.tree.flatten_with_path(sub)[0]
        t_shapes = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in t_leaves}
        i_shapes = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in i_leaves}
        if t_shapes != i_shapes:
            only_t = {k: v for k, v in t_shapes.items() if i_shapes.get(k) != v}
            only_i = {k: v for k, v in i_shapes.items() if t_shapes.get(k) != v}
            print(f"error: {top} parameter shapes differ "
                  f"(local {only_t} vs checkpoint {only_i}) — was the "
                  "checkpoint trained with different gnn_dim/use_gnn?")
            return 2

    params = dict(template)
    params.update({k: jax.tree.map(jnp.asarray, v) for k, v in imported.items()})
    state = trainer.state.replace(params=params)
    trainer.state = state

    meta = {
        "trainer": "v2",
        "epoch": 0,
        "best_val_auc": -1.0,  # unknown: the reference stores no metric
        "no_improve": 0,
        "cfg": asdict(cfg),
        "imported_from": str(Path(args.best_pt).resolve()),
    }
    ckpt.save_checkpoint(cfg.out_dir, "best", state, meta)
    # mirror into `latest` too: --resume fine-tuning restores THAT slot
    # (trainer.py adopt_slot) — without it resume would silently start
    # from fresh random params
    # meta epoch=0 -> resume's start_epoch=1, a fresh fine-tune schedule
    ckpt.save_checkpoint(cfg.out_dir, "latest", state, meta)
    ckpt.wait_for_writes()
    print(f"imported {args.best_pt} -> {cfg.out_dir}/{{best,latest}} "
          f"(fusion+clf{'+gnn' if 'gnn' in imported else ''})")
    print("consume it with: run_train_eval.py --eval_only, --resume "
          "fine-tuning, scripts/predict.py, or scripts/serve.py "
          f"--out_dir {cfg.out_dir}")

    if args.eval:
        metrics = trainer.test()
        print({k: round(v, 4) for k, v in metrics.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
