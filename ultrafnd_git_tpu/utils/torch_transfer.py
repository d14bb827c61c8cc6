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


# ---------------------------------------------------------------------------
# Inverse direction: Flax params -> reference-shaped torch state dicts.
#
# Together with scripts/export_reference_checkpoint.py these make the
# interop bidirectional: a model trained HERE can be handed back to the
# unmodified reference CLI (`torch.load` + strict `load_state_dict`,
# `src/training/forensic_trainer.py:370-377`). All outputs are plain
# ``{name: np.ndarray}`` maps in the reference's state-dict layout —
# callers torch-ify them (`torch.from_numpy`); this module stays
# torch-free by design.
# ---------------------------------------------------------------------------


def _linear_state(
    out: Dict[str, np.ndarray], name: str, p: Mapping[str, Any]
) -> None:
    """Flax ``Dense`` params -> torch ``nn.Linear`` state entries."""
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"], dtype=np.float32).T
    )
    out[f"{name}.bias"] = np.asarray(p["bias"], dtype=np.float32)


def _coattn_state(
    out: Dict[str, np.ndarray], name: str, p: Mapping[str, Any]
) -> None:
    _linear_state(out, f"{name}.q", p["q"])
    _linear_state(out, f"{name}.k", p["k"])
    _linear_state(out, f"{name}.v", p["v"])
    _linear_state(out, f"{name}.evidence_proj.0", p["evidence_in"])
    _linear_state(out, f"{name}.evidence_proj.2", p["evidence_out"])


def fusion_state_dict_from_params(
    params: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """Our fusion params -> reference ``CrossModalTransformer`` state dict.

    Includes the ``semantic.{text,vision}_proj.0`` entries the reference
    module registers but never uses in its fusion forward
    (`cross_modal_transformer.py:105-107` instantiates the analyzer "for
    potential future use"; its projections are only consumed by the
    analyzer's own forward, which the v2 trainer never calls). We have no
    analogue to export, so they are zero-filled — inert for every v2
    code path, present so the reference's strict ``load_state_dict``
    (`forensic_trainer.py:374`) accepts the file. Caveat: a loading-side
    environment where CLIP downloads succeed would also register
    ``semantic.model.*`` keys — but a checkpoint the reference itself
    saved offline has the same strict-load mismatch there, so this
    matches the reference's own artifact compatibility.
    """
    out: Dict[str, np.ndarray] = {}
    _linear_state(out, "text_proj", params["text_proj"])
    _linear_state(out, "audio_proj", params["audio_proj"])
    _linear_state(out, "visual_proj", params["visual_proj"])
    _linear_state(out, "temporal_proj", params["temporal_proj"])
    if "gnn_proj" in params:
        _linear_state(out, "gnn_proj", params["gnn_proj"])
    # reference SemanticConfig: nn.Linear(512, proj_dim=512) — both dims
    # are CLIP-width constants (`semantic_forgery.py:21-27,73-79`),
    # independent of the fusion hidden_dim, so these must NOT scale with
    # the exported model's width
    for name in ("semantic.text_proj.0", "semantic.vision_proj.0"):
        out[f"{name}.weight"] = np.zeros((512, 512), dtype=np.float32)
        out[f"{name}.bias"] = np.zeros((512,), dtype=np.float32)
    _coattn_state(out, "attn_tv", params["attn_tv"])
    _coattn_state(out, "attn_ta", params["attn_ta"])
    _coattn_state(out, "attn_vu", params["attn_vu"])
    _linear_state(out, "fuse_mlp.0", params["fuse0"])
    _linear_state(out, "fuse_mlp.3", params["fuse1"])
    _linear_state(out, "classifier", params["head"])
    return out


def classifier_state_dict_from_params(
    params: Mapping[str, Any], tau: float = 10.0
) -> Dict[str, np.ndarray]:
    """Our classifier params -> reference ``DeepTruthClassifier`` state dict.

    The reference registers ``tau`` as a per-tree non-trainable Parameter
    (`deep_truth_classifier.py:41`), so strict loads need it in the file;
    our forest takes tau as a config scalar (`ops/trees.py`), so callers
    pass the value from the same classifier YAML both sides read
    (``node_tau``, default 10.0).
    """
    out: Dict[str, np.ndarray] = {}
    out["temperature"] = np.asarray(
        params["temperature"], dtype=np.float32
    ).reshape(())
    _linear_state(out, "pre.0", params["pre0"])
    _linear_state(out, "pre.3", params["pre1"])
    node = params["node"]
    gates = np.asarray(node["gates"], dtype=np.float32)  # (T, K, F)
    thresh = np.asarray(node["thresh"], dtype=np.float32)  # (T, K)
    leaf = np.asarray(node["leaf_logits"], dtype=np.float32)  # (T, L, C)
    trees, depth, _ = gates.shape
    for t in range(trees):
        out[f"node.trees.{t}.tau"] = np.asarray(tau, dtype=np.float32)
        out[f"node.trees.{t}.leaf_logits"] = leaf[t]
        for k in range(depth):
            out[f"node.trees.{t}.gates.{k}"] = gates[t, k]
            out[f"node.trees.{t}.thresh.{k}"] = thresh[t, k : k + 1]
    _linear_state(out, "bypass", params["bypass"])
    return out


def gcn_state_dict_from_params(
    params: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """Our GCN params -> reference ``SimpleGCN`` state dict."""
    out: Dict[str, np.ndarray] = {}
    _linear_state(out, "lin1", params["lin1"])
    _linear_state(out, "lin2", params["lin2"])
    return out


def best_pt_state_dicts_from_v2_params(
    params: Mapping[str, Any], tau: float = 10.0
) -> Dict[str, Optional[Dict[str, np.ndarray]]]:
    """Our v2 param pytree -> the reference ``best.pt`` state-dict trio.

    Returns ``{"fusion": sd, "clf": sd, "gnn": sd|None}`` (``None`` under
    use_gnn=False, matching what the reference itself stores there,
    `forensic_trainer.py:355-361`). The caller adds the ``cfg`` entry and
    torch-ifies.
    """
    return {
        "fusion": fusion_state_dict_from_params(params["fusion"]),
        "clf": classifier_state_dict_from_params(params["clf"], tau=tau),
        "gnn": (
            gcn_state_dict_from_params(params["gnn"])
            if "gnn" in params
            else None
        ),
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
