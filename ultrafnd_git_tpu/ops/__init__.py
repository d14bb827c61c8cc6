from ultrafnd_git_tpu.ops.hashing import (
    fnv1a_64,
    get_hash_salt,
    hash_embed,
    hash_embed_batch,
    set_hash_salt,
    stable_unit_score,
)
from ultrafnd_git_tpu.ops.jaccard import build_adj_from_ocr, jaccard

__all__ = [
    "fnv1a_64",
    "get_hash_salt",
    "hash_embed",
    "hash_embed_batch",
    "set_hash_salt",
    "stable_unit_score",
    "build_adj_from_ocr",
    "jaccard",
]
