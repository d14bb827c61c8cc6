"""Reference (torch) checkpoint -> Flax parameter transfer.

The reference saves `best.pt` as ``torch.save({"fusion": state_dict,
"clf": state_dict, "gnn": state_dict|None, "cfg": dict})``
(`src/training/forensic_trainer.py:350-361`). These helpers map those
state dicts onto the parameter pytrees our Flax modules
(`models/fusion.py`, `models/classifier.py`, `models/gnn.py`) expect, so
a reference-trained model can be served, evaluated, or fine-tuned here
without retraining. `scripts/import_reference_checkpoint.py` is the CLI;
`tests/test_parity.py` uses the same functions to assert fp32 logit and
gradient parity against the live reference modules.

Every function takes a plain ``name -> tensor`` mapping (a torch
``state_dict()``, or any dict of torch tensors / numpy arrays — gradient
dicts work too, which the gradient-parity test exploits). The only
torch-specific fact encoded here is the layout convention: torch
``nn.Linear.weight`` is ``(out, in)`` while a Flax ``Dense`` kernel is
``(in, out)`` — hence the transposes.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def to_numpy(value: Any) -> np.ndarray:
    """Tensor/array -> float32 numpy COPY.

    The copy matters: ``torch.Tensor.numpy()`` returns a view aliasing
    the live parameter, so a later ``optimizer.step()`` would silently
    mutate any "snapshot" taken through a no-copy ``asarray`` (a real
    bug this round's parity bisect hit — see BASELINE.md).
    """
    if hasattr(value, "detach"):  # torch tensor, no torch import needed
        value = value.detach().cpu().numpy()
    return np.array(value, dtype=np.float32, copy=True)


def linear_params(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    """torch ``nn.Linear`` entry -> Flax ``Dense`` param dict."""
    return {
        "kernel": to_numpy(sd[f"{name}.weight"]).T,
        "bias": to_numpy(sd[f"{name}.bias"]),
    }


def coattn_params(sd: Mapping[str, Any], name: str) -> Dict[str, Any]:
    """Reference ``ForensicCoAttention`` -> our co-attention params.

    Maps q/k/v plus the 2-layer evidence gate MLP
    (`cross_modal_transformer.py:17-55`: ``evidence_proj.0`` and ``.2``
    around a ReLU).
    """
    return {
        "q": linear_params(sd, f"{name}.q"),
        "k": linear_params(sd, f"{name}.k"),
        "v": linear_params(sd, f"{name}.v"),
        "evidence_in": linear_params(sd, f"{name}.evidence_proj.0"),
        "evidence_out": linear_params(sd, f"{name}.evidence_proj.2"),
    }


def fusion_params_from_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``CrossModalTransformer.state_dict()`` -> our fusion params.

    Layout parity map (reference `cross_modal_transformer.py:96-130`):
    four modality projections (+ gnn_proj when trained with the GNN
    channel), three co-attention blocks, the 2-layer fuse MLP
    (``fuse_mlp.0``/``fuse_mlp.3`` around GELU+dropout), and the logits
    head the reference names ``classifier``.
    """
    params: Dict[str, Any] = {
        "text_proj": linear_params(sd, "text_proj"),
        "audio_proj": linear_params(sd, "audio_proj"),
        "visual_proj": linear_params(sd, "visual_proj"),
        "temporal_proj": linear_params(sd, "temporal_proj"),
        "attn_tv": coattn_params(sd, "attn_tv"),
        "attn_ta": coattn_params(sd, "attn_ta"),
        "attn_vu": coattn_params(sd, "attn_vu"),
        "fuse0": linear_params(sd, "fuse_mlp.0"),
        "fuse1": linear_params(sd, "fuse_mlp.3"),
        "head": linear_params(sd, "classifier"),
    }
    if "gnn_proj.weight" in sd:  # absent when trained with use_gnn=False
        params["gnn_proj"] = linear_params(sd, "gnn_proj")
    return params


def node_shape_from_state_dict(sd: Mapping[str, Any]) -> Tuple[int, int]:
    """Infer (trees, depth) from ``node.trees.{t}.gates.{k}`` keys."""
    trees, depth = 0, 0
    for key in sd:
        parts = key.split(".")
        if len(parts) == 5 and parts[:2] == ["node", "trees"] and parts[3] == "gates":
            trees = max(trees, int(parts[2]) + 1)
            depth = max(depth, int(parts[4]) + 1)
    if trees == 0:
        raise KeyError("no node.trees.*.gates.* entries in state dict")
    return trees, depth


def classifier_params_from_state_dict(
    sd: Mapping[str, Any],
    trees: Optional[int] = None,
    depth: Optional[int] = None,
) -> Dict[str, Any]:
    """Reference ``DeepTruthClassifier.state_dict()`` -> our params.

    The reference's NODE ensemble stores per-tree per-depth gate vectors
    and thresholds as parameter lists (`deep_truth_classifier.py:28-90`);
    our `ops/trees.py` forest consumes them stacked: gates ``(T, K, F)``,
    thresholds ``(T, K)``, leaf logits ``(T, 2^K, C)``. ``tau`` is a
    plain float attribute on the reference module (not a parameter), so
    it never appears in a state dict — both sides read it from the same
    classifier YAML (`configs/model_configs/classifier.yaml`).
    """
    if trees is None or depth is None:
        trees, depth = node_shape_from_state_dict(sd)
    gates = np.stack(
        [
            np.stack(
                [to_numpy(sd[f"node.trees.{t}.gates.{k}"]) for k in range(depth)]
            )
            for t in range(trees)
        ]
    )  # (T, K, F)
    thresh = np.stack(
        [
            np.concatenate(
                [to_numpy(sd[f"node.trees.{t}.thresh.{k}"]) for k in range(depth)]
            )
            for t in range(trees)
        ]
    )  # (T, K)
    leaf = np.stack(
        [to_numpy(sd[f"node.trees.{t}.leaf_logits"]) for t in range(trees)]
    )  # (T, 2^K, C)
    return {
        "pre0": linear_params(sd, "pre.0"),
        "pre1": linear_params(sd, "pre.3"),
        "node": {"gates": gates, "thresh": thresh, "leaf_logits": leaf},
        "bypass": linear_params(sd, "bypass"),
        "temperature": to_numpy(sd["temperature"]),
    }


def gcn_params_from_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``SimpleGCN.state_dict()`` (lin1/lin2,
    `forensic_trainer.py:25-53`) -> our `models/gnn.py:SimpleGCN` params."""
    return {
        "lin1": linear_params(sd, "lin1"),
        "lin2": linear_params(sd, "lin2"),
    }


def v2_params_from_best_pt(payload: Mapping[str, Any]) -> Dict[str, Any]:
    """Map a loaded reference ``best.pt`` payload to our v2 param pytree.

    Returns ``{"fusion": ..., "clf": ...}`` plus ``"gnn"`` when the
    checkpoint was trained with the GNN channel (the reference stores
    ``None`` there under ``use_gnn=False``).
    """
    params: Dict[str, Any] = {
        "fusion": fusion_params_from_state_dict(payload["fusion"]),
        "clf": classifier_params_from_state_dict(payload["clf"]),
    }
    if payload.get("gnn") is not None:
        params["gnn"] = gcn_params_from_state_dict(payload["gnn"])
    return params
