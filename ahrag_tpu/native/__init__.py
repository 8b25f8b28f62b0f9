"""ctypes bindings for the native C++ runtime library, with Python fallbacks.

Build: ``make -C ahrag_tpu/native`` (or set AHRAG_BUILD_NATIVE=1 to auto-build at
first import). Every entry point degrades to a pure-Python implementation when the
shared library is absent, so the framework is fully functional unbuilt.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libahrag_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.environ.get("AHRAG_BUILD_NATIVE") == "1":
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.ell_max_degree.restype = ctypes.c_int32
        lib.ell_max_degree.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                       ctypes.c_int64, ctypes.c_int32]
        lib.ell_build.restype = None
        lib.ell_build.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                                  ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int32)]
        lib.token_estimate.restype = ctypes.c_int64
        lib.token_estimate.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.hash_features.restype = None
        lib.hash_features.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_int32,
                                      ctypes.POINTER(ctypes.c_float)]
        try:
            # weighted featurizer symbols (ABI v2): a stale .so without them
            # must not silently hash with a different char-gram weight —
            # callers hasattr-guard and fall back to the Python featurizer
            lib.ahrag_native_abi_version.restype = ctypes.c_int32
            lib.ahrag_native_abi_version.argtypes = []
            lib.hash_features_w.restype = None
            lib.hash_features_w.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                            ctypes.c_int32, ctypes.c_float,
                                            ctypes.POINTER(ctypes.c_float)]
            lib.hash_features_coo_batch_w.restype = ctypes.c_int64
            lib.hash_features_coo_batch_w.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        except AttributeError:
            pass
        lib.exact_topk_f32.restype = None
        lib.exact_topk_f32.argtypes = [ctypes.POINTER(ctypes.c_float),
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int32, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_int32,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr_i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _ptr_f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ell_from_edges(src: np.ndarray, dst: np.ndarray, n_nodes: int, n_pad: int,
                   k: int) -> np.ndarray:
    """Padded ELL table from an edge list (insertion order preserved)."""
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    out = np.full((n_pad, k), -1, dtype=np.int32)
    lib = _load()
    if lib is not None and len(src):
        lib.ell_build(_ptr_i32(src), _ptr_i32(dst), np.int64(len(src)),
                      np.int32(n_nodes), np.int32(n_pad), np.int32(k),
                      _ptr_i32(out))
        return out
    fill: Dict[int, int] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        pos = fill.get(s, 0)
        if 0 <= s < n_nodes and pos < k:
            out[s, pos] = d
            fill[s] = pos + 1
    return out


def max_degree(src: np.ndarray, n_nodes: int) -> int:
    src = np.ascontiguousarray(src, dtype=np.int32)
    lib = _load()
    if lib is not None and len(src):
        return int(lib.ell_max_degree(_ptr_i32(src), np.int64(len(src)),
                                      np.int32(n_nodes)))
    if not len(src):
        return 0
    counts = np.bincount(src[(src >= 0) & (src < n_nodes)], minlength=1)
    return int(counts.max()) if counts.size else 0


def token_estimate(text: str) -> int:
    lib = _load()
    if lib is not None:
        raw = text.encode("utf-8")
        return int(lib.token_estimate(raw, np.int64(len(raw))))
    return max(1, len(text) // 4) if text else 0


def hash_features_coo(texts: List[str], buckets: int, n_threads: int = 0,
                      cgram_weight: float = 1.0
                      ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Batched sparse featurization: (rows, cols, vals) COO triplets over
    ``texts`` (doc-major, ascending buckets within a doc), or None if the
    library is unbuilt (or predates the weighted ABI). Threaded in C++; skips
    the dense [n, buckets] counts matrix and the nonzero re-scan entirely (the
    encode hot path at corpus scale — see hash_features_coo_batch_w in
    ahrag_native.cpp). Char 3..5-gram occurrences contribute
    ``cgram_weight`` per hit (words/bigrams 1.0)."""
    lib = _load()
    if lib is None or not hasattr(lib, "hash_features_coo_batch_w"):
        return None
    blobs = [(t or "").encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = b"".join(blobs)
    # features per doc <= ~4*chars (unigrams+bigrams < chars; 3 char-gram
    # scales) + slack; the retry path covers pathological inputs
    cap = max(4 * len(data) + 16 * len(blobs), 1024)
    for _ in range(3):
        rows = np.empty(cap, dtype=np.int32)
        cols = np.empty(cap, dtype=np.int32)
        vals = np.empty(cap, dtype=np.float32)
        nnz = int(lib.hash_features_coo_batch_w(
            data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            np.int32(len(blobs)), np.int32(buckets),
            ctypes.c_float(cgram_weight), np.int32(n_threads),
            _ptr_i32(rows), _ptr_i32(cols), _ptr_f32(vals), np.int64(cap)))
        if nnz >= 0:
            return rows[:nnz], cols[:nnz], vals[:nnz]
        cap = -nnz
    return None


def hash_features_counts(texts: List[str], buckets: int,
                         cgram_weight: float = 1.0) -> Optional[np.ndarray]:
    """[len(texts), buckets] float32 hashed n-gram counts, or None if unbuilt
    (weighted counts need the ABI-v2 symbol)."""
    lib = _load()
    if lib is None:
        return None
    if cgram_weight != 1.0 and not hasattr(lib, "hash_features_w"):
        return None
    out = np.zeros((len(texts), buckets), dtype=np.float32)
    for i, text in enumerate(texts):
        raw = (text or "").encode("utf-8")
        if cgram_weight != 1.0:
            lib.hash_features_w(raw, np.int64(len(raw)), np.int32(buckets),
                                ctypes.c_float(cgram_weight), _ptr_f32(out[i]))
        else:
            lib.hash_features(raw, np.int64(len(raw)), np.int32(buckets),
                              _ptr_f32(out[i]))
    return out


def exact_topk(q: np.ndarray, emb: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Blocked exact top-k on host (the CPU baseline for bench)."""
    q = np.ascontiguousarray(q, dtype=np.float32)
    emb = np.ascontiguousarray(emb, dtype=np.float32)
    b, d = q.shape
    n = emb.shape[0]
    k = min(k, n)
    lib = _load()
    if lib is not None:
        vals = np.empty((b, k), dtype=np.float32)
        idx = np.empty((b, k), dtype=np.int32)
        lib.exact_topk_f32(_ptr_f32(q), _ptr_f32(emb), np.int32(b), np.int64(n),
                           np.int32(d), np.int32(k), _ptr_f32(vals), _ptr_i32(idx))
        return vals, idx
    scores = q @ emb.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k].astype(np.int32)
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx
