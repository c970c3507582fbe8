"""Training-free multivector token pooling.

Technique from the retrieved literature (PAPERS.md: "Visual RAG
Toolkit: Scaling Multi-Vector Visual Retrieval with Training-Free
Pooling and Multi-Stage Search"; also ColBERT token-pooling): mean-pool
groups of consecutive page tokens and re-normalize. Cuts stored tokens
and rerank FLOPs by the pool factor with a small recall cost — page
tokens are row-major patches, so consecutive tokens are spatially
adjacent and redundant.

Queries are never pooled; MaxSim semantics are unchanged (max over a
smaller doc-token set).
"""

from __future__ import annotations

import numpy as np


def pooled_token_count(n_tokens: int, factor: int) -> int:
    """Token count `pool_multivector` produces for an (n_tokens, d) input."""
    if factor <= 1 or n_tokens <= factor:
        return n_tokens
    return -(-n_tokens // factor)


def pool_multivector(mv: np.ndarray, factor: int) -> np.ndarray:
    """(n_tokens, d) -> (ceil(n/factor), d): mean over consecutive groups
    of `factor` tokens, then L2-renormalized (MaxSim expects unit rows)."""
    if factor <= 1 or mv.shape[0] <= factor:
        return mv
    n, d = mv.shape
    pad = (-n) % factor
    if pad:
        mv = np.concatenate([mv, np.zeros((pad, d), mv.dtype)], axis=0)
    counts = np.full(mv.shape[0] // factor, factor, dtype=np.float32)
    if pad:
        counts[-1] = factor - pad
    pooled = mv.reshape(-1, factor, d).sum(axis=1) / counts[:, None]
    norms = np.linalg.norm(pooled, axis=-1, keepdims=True)
    return (pooled / np.maximum(norms, 1e-12)).astype(mv.dtype)
