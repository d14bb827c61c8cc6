"""ultrafnd_git_tpu — a TPU-native framework for multimodal short-video fake-news detection.

A from-scratch JAX/Flax/Pallas rebuild with the capabilities of the reference
system (Nuralamsiddik16/Ultrafnd_git): multimodal (text / audio / visual /
temporal / graph) binary real-vs-fake classification for FakeSV-style
short-video datasets.

Design differences from the reference (deliberate, TPU-first):
  * All trainable compute is functional JAX compiled by XLA onto the MXU;
    batched, static-shape, bfloat16-capable.
  * The feature-cache build is batched (one encoder forward over all strings)
    instead of one forward per string.
  * The OCR-Jaccard graph is built with one token-incidence matmul instead of
    an O(N^2) Python set loop.
  * GCN node embeddings are recomputed differentiably inside the jitted train
    step (the reference trains against a frozen no-grad cache).
  * Data/tensor/model parallelism via jax.sharding.Mesh + NamedSharding with
    XLA collectives over ICI; the reference is single-device only.
  * Fallback "hash embeddings" use a stable 64-bit FNV-1a hash, reproducible
    across processes (the reference uses Python's randomized `hash`).

Package layout:
  utils/     config loading (YAML -> dict, same schema as reference
             configs), device presets, HF gating, jax cache
  ops/       pure host/jnp ops (stable hashing, jaccard graphs, NODE trees)
  kernels/   Pallas TPU kernels (fused flash attention)
  native/    C++ host ops (ctypes-bound hash embeddings)
  data/      host pipeline: JSONL parse, feature cache, splits, OCR graphs,
             raw-media decode, augmentation
  models/    Flax modules: fusion, classifier, GNN, per-modality encoders,
             forensic evidence scorers, on-device text transformer
  parallel/  device mesh + sharding rules
  training/  trainers (v2 / integrated / v1 raw-media), train state,
             metrics, checkpointing, interpretability
  serving.py Predictor: score new records against a trained checkpoint
"""

__version__ = "0.1.0"
