"""Native host-op loader: compiles hashops.cpp once, binds via ctypes.

No pybind11 in this image (see environment notes), so the binding is a
plain C ABI + ctypes. The shared object is built with g++ -O3 on first use
into a cache directory keyed by the source hash — rebuilds happen only
when the .cpp changes; if no toolchain is available everything degrades to
the pure-Python/numpy path in ops/hashing.py.

Set ULTRAFND_NATIVE=0 to disable the native path (hermetic comparisons).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parent / "hashops.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> Path:
    root = os.environ.get("ULTRAFND_NATIVE_CACHE") or os.path.join(
        tempfile.gettempdir(), "ultrafnd_native"
    )
    p = Path(root)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so_path = _cache_dir() / f"hashops_{digest}.so"
    if not so_path.exists():
        tmp = so_path.with_suffix(f".build{os.getpid()}.so")
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(tmp),
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(tmp, so_path)  # atomic: safe under concurrent builds
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None

    lib.ufnd_fnv1a64_basis.restype = ctypes.c_uint64
    lib.ufnd_fnv1a64_basis.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_uint64,
    ]
    lib.ufnd_hash_embed_batch_basis.restype = None
    lib.ufnd_hash_embed_batch_basis.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("ULTRAFND_NATIVE", "1") == "0":
        return None
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def available() -> bool:
    return get_lib() is not None


def reset() -> None:  # test hook
    global _LIB, _TRIED, _GRAPH_LIB, _GRAPH_TRIED
    _LIB, _TRIED = None, False
    _GRAPH_LIB, _GRAPH_TRIED = None, False


# ----------------------------------------------------------------------
# Bindings
# ----------------------------------------------------------------------

def fnv1a_64_native(token: str, basis: Optional[int] = None) -> Optional[int]:
    """Scalar FNV-1a in C++; drop-in for ops.hashing.fnv1a_64 —
    `basis=None` follows the process-wide salt, like the python path."""
    lib = get_lib()
    if lib is None:
        return None
    if basis is None:
        from ultrafnd_git_tpu.ops.hashing import get_hash_basis

        basis = get_hash_basis()
    data = token.encode("utf-8")
    buf = (ctypes.c_uint8 * max(1, len(data))).from_buffer_copy(
        data or b"\x00"
    )
    return int(lib.ufnd_fnv1a64_basis(buf, len(data), ctypes.c_uint64(basis)))


_FNV_OFFSET = 0xCBF29CE484222325


def hash_embed_batch_native(
    texts: Sequence[str],
    dim: int,
    max_tokens: Optional[int] = None,
    basis: int = _FNV_OFFSET,
) -> Optional[np.ndarray]:
    """Batched hash embedding in C++; None if the native lib is absent.

    `basis` is the FNV starting state — FNV_OFFSET for the canonical
    hash, or fnv1a(salt) for a salted featurization draw
    (ops/hashing.set_hash_salt threads it through automatically).
    """
    lib = get_lib()
    if lib is None:
        return None

    encoded = [(t or "").encode("utf-8") for t in texts]
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    buf = np.frombuffer(b"".join(encoded) or b"\x00", dtype=np.uint8).copy()

    out = np.zeros((len(encoded), dim), dtype=np.float32)
    lib.ufnd_hash_embed_batch_basis(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(encoded),
        dim,
        -1 if max_tokens is None else int(max_tokens),
        ctypes.c_uint64(basis),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


# ----------------------------------------------------------------------
# graphops: posting-list OCR-Jaccard adjacency (graphops.cpp)
# ----------------------------------------------------------------------

_GRAPH_SRC = Path(__file__).resolve().parent / "graphops.cpp"
_GRAPH_LIB: Optional[ctypes.CDLL] = None
_GRAPH_TRIED = False


def _build_graph() -> Optional[ctypes.CDLL]:
    if not _GRAPH_SRC.exists():
        return None
    digest = hashlib.sha256(_GRAPH_SRC.read_bytes()).hexdigest()[:16]
    so_path = _cache_dir() / f"graphops_{digest}.so"
    if not so_path.exists():
        tmp = so_path.with_suffix(f".build{os.getpid()}.so")
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            str(_GRAPH_SRC), "-o", str(tmp),
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(tmp, so_path)  # atomic, like the hashops build
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None

    lib.ufnd_jaccard_adj.restype = None
    lib.ufnd_jaccard_adj.argtypes = [
        ctypes.POINTER(ctypes.c_int64),   # row_off (n+1)
        ctypes.POINTER(ctypes.c_int32),   # tok (nnz)
        ctypes.c_int64,                   # n
        ctypes.c_int64,                   # vocab
        ctypes.c_float,                   # thresh
        ctypes.c_int,                     # mode
        ctypes.POINTER(ctypes.c_float),   # out (n*n)
    ]
    lib.ufnd_jaccard_edges.restype = ctypes.c_int64
    lib.ufnd_jaccard_edges.argtypes = [
        ctypes.POINTER(ctypes.c_int64),   # row_off (n+1)
        ctypes.POINTER(ctypes.c_int32),   # tok (nnz)
        ctypes.c_int64,                   # n
        ctypes.c_int64,                   # vocab
        ctypes.c_float,                   # thresh
        ctypes.c_int,                     # mode (0 binary / 1 weighted)
        ctypes.c_int64,                   # cap (entries; 0 = count only)
        ctypes.POINTER(ctypes.c_int32),   # out_i
        ctypes.POINTER(ctypes.c_int32),   # out_j
        ctypes.POINTER(ctypes.c_float),   # out_w
    ]
    return lib


def get_graph_lib() -> Optional[ctypes.CDLL]:
    global _GRAPH_LIB, _GRAPH_TRIED
    if os.environ.get("ULTRAFND_NATIVE", "1") == "0":
        return None
    if not _GRAPH_TRIED:
        _GRAPH_TRIED = True
        _GRAPH_LIB = _build_graph()
    return _GRAPH_LIB


def jaccard_adj_native(
    ocr_sets: Sequence, thresh: float, mode: int
) -> Optional[np.ndarray]:
    """Dense (N, N) f32 OCR-Jaccard adjacency via the C++ posting-list
    builder; None when the native lib is unavailable (callers fall back
    to the numpy incidence-matmul path, which is bit-identical).

    mode: 0 = binary >= thresh (diag 1), 1 = weighted >= thresh (diag 1),
    2 = full pairwise jaccard (thresh ignored, true diagonal).

    mode 0 with thresh <= 0 is refused (returns None): the numpy
    semantics there link even zero-intersection pairs (0 >= 0), which a
    sparsity-exploiting builder cannot reproduce.
    """
    lib = get_graph_lib()
    if lib is None or (mode == 0 and thresh <= 0.0):
        return None
    n = len(ocr_sets)
    out = np.zeros((n, n), dtype=np.float32)
    if n == 0:
        return out
    row_off, tok, vocab_n = _csr_from_sets(ocr_sets)
    lib.ufnd_jaccard_adj(
        row_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        vocab_n,
        ctypes.c_float(float(thresh)),
        int(mode),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def _csr_from_sets(ocr_sets: Sequence):
    """(row_off int64[n+1], tok int32[nnz], vocab_size) from token sets."""
    from ultrafnd_git_tpu.ops.hashing import token_vocabulary

    n = len(ocr_sets)
    vocab = token_vocabulary(ocr_sets)
    row_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in ocr_sets], out=row_off[1:])
    tok = np.empty(int(row_off[-1]), dtype=np.int32)
    pos = 0
    for s in ocr_sets:
        for t in s:
            tok[pos] = vocab[t]
            pos += 1
    return row_off, tok, max(1, len(vocab))


def jaccard_edges_native(
    ocr_sets: Sequence, thresh: float, mode: int = 0
) -> Optional[tuple]:
    """Symmetric COO edge list (src, dst, w) — both directions, no
    diagonal — via the C++ posting-list builder; None when the lib is
    unavailable or the semantics need the dense path (see
    jaccard_adj_native's thresh <= 0 note). This is the O(E) entry the
    sparse graph path uses where the dense (N, N) output itself no
    longer fits (~40 GB at N=100k).

    Two-pass protocol: count, allocate exactly, fill. Output is sorted
    by (src, dst) so the layout is canonical regardless of the
    builder's internal touch order.
    """
    lib = get_graph_lib()
    if lib is None or (mode == 0 and thresh <= 0.0):
        return None
    n = len(ocr_sets)
    if n == 0:
        return (
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.float32),
        )
    row_off, tok, vocab_n = _csr_from_sets(ocr_sets)
    args = (
        row_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        vocab_n,
        ctypes.c_float(float(thresh)),
        int(mode),
    )
    null_i = ctypes.POINTER(ctypes.c_int32)()
    null_w = ctypes.POINTER(ctypes.c_float)()
    total = int(lib.ufnd_jaccard_edges(*args, 0, null_i, null_i, null_w))
    src = np.empty(total, dtype=np.int32)
    dst = np.empty(total, dtype=np.int32)
    w = np.empty(total, dtype=np.float32)
    if total:
        wrote = int(
            lib.ufnd_jaccard_edges(
                *args,
                total,
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        )
        assert wrote == total, (wrote, total)
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
    return src, dst, w
