"""Final calibrated classifier: pre-MLP -> NODE forest + linear bypass.

Parity target: reference `src/models/fusion/deep_truth_classifier.py`:
  * pre-NODE conditioner MLP with xavier-uniform init (ref :121-130),
  * NODE-lite oblivious-tree ensemble + linear bypass, summed logits
    (ref :133-166) — here the forest is a single vectorized einsum program
    (see ops/trees.py) instead of Python loops over trees/depths,
  * learnable temperature clamped to [0.5, 5] for calibrated probabilities
    (ref :115,169-171),
  * predict / predict_proba helpers (ref :176-184).

Interpretability (Grad x Input, SHAP/SmoothGrad) lives in
`ultrafnd_git_tpu/training/interpret.py` as functional jax.grad transforms.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultrafnd_git_tpu.ops.trees import oblivious_forest_logits
from ultrafnd_git_tpu.utils.config import ConfigManager


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=False)


_xavier = nn.initializers.xavier_uniform()


class NODEEnsemble(nn.Module):
    """Forest of soft oblivious trees; mean of per-tree logits."""

    num_classes: int = 2
    num_trees: int = 6
    depth: int = 4
    tau: float = 10.0
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        f = x.shape[-1]
        t, k, c = self.num_trees, self.depth, self.num_classes
        gates = self.param("gates", nn.initializers.zeros, (t, k, f))
        thresh = self.param("thresh", nn.initializers.zeros, (t, k))
        leaf = self.param("leaf_logits", nn.initializers.zeros, (t, 1 << k, c))

        per_tree = oblivious_forest_logits(x, gates, thresh, leaf, self.tau)
        # Reference applies dropout to each tree's logits before averaging.
        per_tree = nn.Dropout(self.dropout)(per_tree, deterministic=deterministic)
        return per_tree.mean(axis=1)  # (B, C)


class DeepTruthClassifier(nn.Module):
    """Binary truth classifier over fused (+aux) features with calibration."""

    hidden: int = 512
    dropout: float = 0.1
    num_classes: int = 2
    use_aux: bool = True
    aux_dim: int = 2
    node_trees: int = 6
    node_depth: int = 4
    node_tau: float = 10.0
    # per-tree logit dropout inside the forest (reference hard-codes 0.3
    # in its _ObliviousTree stack; optional `node_dropout` YAML key makes
    # it configurable without changing the default)
    node_dropout: float = 0.3
    temperature_init: float = 1.0
    dtype: Any = None  # bf16-compute/f32-master when jnp.bfloat16; the
    # NODE forest and the calibrated softmax always run f32

    @classmethod
    def from_config(
        cls, config_path: str = "configs/model_configs/classifier.yaml"
    ) -> "DeepTruthClassifier":
        cfg = ConfigManager().load_config(config_path)
        return cls(
            hidden=int(cfg.get("hidden_dim", 512)),
            dropout=float(cfg.get("dropout", 0.1)),
            num_classes=int(cfg.get("num_classes", 2)),
            use_aux=bool(cfg.get("use_aux", True)),
            aux_dim=int(cfg.get("aux_dim", 2)),
            node_trees=int(cfg.get("node_trees", 6)),
            node_depth=int(cfg.get("node_depth", 4)),
            node_tau=float(cfg.get("node_tau", 10.0)),
            node_dropout=float(cfg.get("node_dropout", 0.3)),
            temperature_init=float(cfg.get("temperature", 1.0)),
        )

    @nn.compact
    def __call__(
        self,
        fused: jnp.ndarray,
        aux: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        x = fused
        if self.use_aux and aux is not None:
            x = jnp.concatenate([x, aux], axis=-1)

        h = nn.Dense(
            self.hidden, dtype=self.dtype, kernel_init=_xavier, name="pre0"
        )(x)
        h = _gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(
            self.hidden, dtype=self.dtype, kernel_init=_xavier, name="pre1"
        )(h)
        h = _gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h.astype(jnp.float32)  # forest routing + logits stay f32

        logits_node = NODEEnsemble(
            num_classes=self.num_classes,
            num_trees=self.node_trees,
            depth=self.node_depth,
            tau=self.node_tau,
            dropout=self.node_dropout,
            name="node",
        )(h, deterministic=deterministic)
        logits_bypass = nn.Dense(
            self.num_classes, kernel_init=_xavier, name="bypass"
        )(h)
        logits = logits_node + logits_bypass

        temperature = self.param(
            "temperature",
            lambda _key: jnp.asarray(self.temperature_init, jnp.float32),
        )
        t = jnp.clip(temperature, 0.5, 5.0)
        probs = jax.nn.softmax(logits / t, axis=-1)
        return {"logits": logits, "probs": probs, "temperature": t}


def predict_proba(
    model: DeepTruthClassifier, params, fused, aux=None
) -> jnp.ndarray:
    return model.apply(params, fused, aux, deterministic=True)["probs"]


def predict(model: DeepTruthClassifier, params, fused, aux=None) -> jnp.ndarray:
    return jnp.argmax(predict_proba(model, params, fused, aux), axis=-1)
