"""MUVERA Fixed-Dimensional Encoding (FDE) as a pure JAX transform.

Encodes a variable-length multivector (n_tokens x d) into ONE fixed
vector such that <fde(Q), fde(D)> approximates the Chamfer / MaxSim
similarity, enabling a single-vector ANN prefilter before exact rerank.

The reference ships this as a C++/Eigen extension (reference fde/,
source absent from the snapshot; config + call sites at
core/vector_store/fast_multivector_store.py:325-331,448,521). This is a
reimplementation of the MUVERA algorithm (Dhulipala et al., 2024) with
the reference's config semantics:

  dimension=128, num_repetitions=20, num_simhash_projections=5
  (=> 32 partitions), projection_dimension=16, projection_type=AMS_SKETCH
  => FDE dim = 20 * 32 * 16 = 10,240

Per repetition r (independent randomness):
  - SimHash partitioning: bucket(x) = bits of sign(G_r^T x), G_r ~ N(0,1)^{d x P}.
  - Inner projection: AMS sketch S_r in {+-1}^{d x p} / sqrt(p).
  - Query FDE: per-bucket SUM of projected query tokens.
  - Document FDE: per-bucket MEAN (centroid) of projected doc tokens;
    empty buckets are filled with the projection of the nearest token by
    Hamming distance on the SimHash bits (fill_empty_partitions).

Everything is matmul/one-hot friendly and jit/vmap/shard-safe: batched
document encoding is a single XLA program over the mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FDEConfig:
    dimension: int = 128
    num_repetitions: int = 20
    num_simhash_projections: int = 5
    projection_dimension: int = 16
    projection_type: str = "AMS_SKETCH"  # or "IDENTITY"
    seed: int = 42
    fill_empty_partitions: bool = True

    @property
    def num_partitions(self) -> int:
        return 2**self.num_simhash_projections

    @property
    def proj_dim(self) -> int:
        if self.projection_type == "IDENTITY":
            return self.dimension
        return self.projection_dimension

    @property
    def fde_dim(self) -> int:
        return self.num_repetitions * self.num_partitions * self.proj_dim


@functools.lru_cache(maxsize=8)
def _matrices(cfg: FDEConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(R, d, P) gaussian SimHash matrices and (R, d, p) AMS sketch matrices,
    deterministic in cfg.seed. Host numpy so the cache never holds tracers
    (they become jit constants at trace time)."""
    rng = np.random.default_rng(np.random.Philox(cfg.seed))
    g = rng.standard_normal(
        (cfg.num_repetitions, cfg.dimension, cfg.num_simhash_projections)
    ).astype(np.float32)
    if cfg.projection_type == "IDENTITY":
        s = np.broadcast_to(
            np.eye(cfg.dimension, dtype=np.float32)[None],
            (cfg.num_repetitions, cfg.dimension, cfg.dimension),
        ).copy()
    else:
        signs = rng.integers(
            0, 2, (cfg.num_repetitions, cfg.dimension, cfg.projection_dimension)
        ).astype(np.float32) * 2.0 - 1.0
        s = signs / np.sqrt(float(cfg.projection_dimension))
    return g, s


def _partition_bits(x: jax.Array, g: jax.Array) -> jax.Array:
    """x: (N, d), g: (d, P) -> (N, P) float bits in {0, 1}."""
    return (jnp.einsum("nd,dp->np", x, g) > 0).astype(jnp.float32)


def _bucket_ids_onehot(bits: jax.Array, num_partitions: int) -> jax.Array:
    """(N, P) bits -> (N, B) one-hot bucket membership."""
    p = bits.shape[-1]
    weights = jnp.asarray([2**i for i in range(p)], dtype=jnp.float32)
    ids = jnp.einsum("np,p->n", bits, weights).astype(jnp.int32)
    return jax.nn.one_hot(ids, num_partitions, dtype=jnp.float32)


def _encode_one_rep(
    x: jax.Array,
    mask: jax.Array,
    g: jax.Array,
    s: jax.Array,
    num_partitions: int,
    is_query: bool,
    fill_empty: bool,
) -> jax.Array:
    """FDE block for one repetition. x: (N, d), mask: (N,). -> (B * p,)."""
    bits = _partition_bits(x, g)  # (N, P)
    onehot = _bucket_ids_onehot(bits, num_partitions) * mask[:, None]  # (N, B)
    proj = jnp.einsum("nd,dp->np", x, s)  # (N, p)
    sums = jnp.einsum("nb,np->bp", onehot, proj)  # (B, p)
    if is_query:
        return sums.reshape(-1)

    counts = jnp.sum(onehot, axis=0)  # (B,)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    if fill_empty:
        # Hamming distance between each bucket's bit pattern and each
        # token's bit pattern: P - matches (matmul-friendly).
        p_bits = bits.shape[-1]
        bucket_idx = jnp.arange(num_partitions, dtype=jnp.int32)
        bucket_bits = ((bucket_idx[:, None] >> jnp.arange(p_bits)[None, :]) & 1).astype(jnp.float32)
        matches = bucket_bits @ bits.T + (1.0 - bucket_bits) @ (1.0 - bits.T)  # (B, N)
        ham = p_bits - matches
        ham = jnp.where(mask[None, :] > 0, ham, jnp.inf)
        nearest = jnp.argmin(ham, axis=1)  # (B,)
        fill = proj[nearest]  # (B, p)
        any_valid = jnp.sum(mask) > 0
        centroids = jnp.where((counts[:, None] > 0) | (~any_valid), centroids, fill)
    return centroids.reshape(-1)


def _encode(x: jax.Array, mask: Optional[jax.Array], cfg: FDEConfig, is_query: bool) -> jax.Array:
    if x.shape[-1] != cfg.dimension:
        raise ValueError(
            f"multivector dim {x.shape[-1]} != FDEConfig.dimension {cfg.dimension}"
        )
    x = jnp.asarray(x, dtype=jnp.float32)
    if mask is None:
        mask = jnp.ones(x.shape[0], dtype=jnp.float32)
    g, s = (jnp.asarray(m) for m in _matrices(cfg))
    blocks = jax.vmap(
        lambda gr, sr: _encode_one_rep(
            x, mask, gr, sr, cfg.num_partitions, is_query, cfg.fill_empty_partitions
        )
    )(g, s)
    return blocks.reshape(-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fde_query(x: jax.Array, cfg: FDEConfig, mask: Optional[jax.Array] = None) -> jax.Array:
    """Query-side FDE (per-bucket SUM). x: (Nq, d) -> (fde_dim,)."""
    return _encode(x, mask, cfg, is_query=True)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fde_document(x: jax.Array, cfg: FDEConfig, mask: Optional[jax.Array] = None) -> jax.Array:
    """Document-side FDE (per-bucket centroid + empty fill). -> (fde_dim,)."""
    return _encode(x, mask, cfg, is_query=False)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fde_document_batch(x: jax.Array, mask: jax.Array, cfg: FDEConfig) -> jax.Array:
    """Batched document FDE. x: (C, N, d), mask: (C, N) -> (C, fde_dim)."""
    return jax.vmap(lambda xi, mi: _encode(xi, mi, cfg, is_query=False))(x, mask)


def fde_query_np(x: np.ndarray, cfg: FDEConfig) -> np.ndarray:
    return np.asarray(fde_query(jnp.asarray(x), cfg))


def fde_document_np(x: np.ndarray, cfg: FDEConfig) -> np.ndarray:
    return np.asarray(fde_document(jnp.asarray(x), cfg))
