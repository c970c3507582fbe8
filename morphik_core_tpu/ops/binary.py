"""Binary quantization + Hamming MaxSim.

Bit-parity port of the reference's Rust binary ops and Postgres
`max_sim` function (reference morphik_rust/src/binary_ops.rs:30-292,
core/vector_store/multi_vector_store.py:285-345):

  - bit_i = 1 iff x_i > 0
  - packed bytes are MSB-first (128-dim f32 -> 16 bytes, 32x compression)
  - hamming similarity of two token bit-vectors = 1 - popcount(xor)/d
  - binary MaxSim(Q, D) = sum_q max_d (1 - hamming(q, d)/d)

Host-side packing is numpy; scoring is jnp (lax.population_count) so a
binary-quantized index can be scored on-chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def binary_quantize(x: np.ndarray) -> np.ndarray:
    """f32 (..., d) -> uint8 bits in {0,1}: 1 iff value > 0."""
    return (np.asarray(x) > 0).astype(np.uint8)


def binary_quantize_packed(x: np.ndarray) -> np.ndarray:
    """f32 (..., d) -> (..., d//8) uint8, MSB-first within each byte
    (matches the reference's packed layout, binary_ops.rs:67-110)."""
    bits = binary_quantize(x)
    if bits.shape[-1] % 8 != 0:
        raise ValueError("dimension must be a multiple of 8")
    return np.packbits(bits, axis=-1, bitorder="big")


def unpack_bits(packed: np.ndarray, dim: Optional[int] = None) -> np.ndarray:
    bits = np.unpackbits(packed, axis=-1, bitorder="big")
    if dim is not None:
        bits = bits[..., :dim]
    return bits


def hamming_distance_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamming distance between packed bit vectors (broadcasting)."""
    return np.bitwise_count(np.bitwise_xor(a, b)).sum(axis=-1)


def _packed_to_u32(packed: jax.Array) -> jax.Array:
    """(..., n_bytes) uint8 -> (..., ceil(n_bytes/4)) uint32 words.
    Byte counts not divisible by 4 (embedding dims not divisible by 32,
    e.g. tiny dev models) are zero-padded — XOR against zero pads adds
    nothing to the popcount, so Hamming distances are unchanged."""
    pad = (-packed.shape[-1]) % 4
    if pad:
        packed = jnp.pad(packed, [(0, 0)] * (packed.ndim - 1) + [(0, pad)])
    u8 = packed.astype(jnp.uint32)
    shape = u8.shape[:-1] + (u8.shape[-1] // 4, 4)
    w = u8.reshape(shape)
    return (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]


def binary_maxsim_scores(
    query_packed: jax.Array,
    docs_packed: jax.Array,
    doc_mask: Optional[jax.Array] = None,
    dim: int = 128,
) -> jax.Array:
    """Binary MaxSim over packed bit multivectors.

    query_packed: (Nq, d//8) uint8; docs_packed: (C, Nd, d//8) uint8;
    doc_mask: (C, Nd). Returns (C,) f32 — the same quantity the
    reference's SQL max_sim computes over BIT(128)[] columns.
    """
    q = _packed_to_u32(query_packed)  # (Nq, W)
    d = _packed_to_u32(docs_packed)  # (C, Nd, W)
    x = jnp.bitwise_xor(q[None, :, None, :], d[:, None, :, :])  # (C, Nq, Nd, W)
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)  # (C, Nq, Nd)
    sim = 1.0 - ham / float(dim)
    if doc_mask is not None:
        sim = jnp.where(doc_mask[:, None, :] > 0, sim, -jnp.inf)
    per_q = jnp.max(sim, axis=-1)  # (C, Nq)
    per_q = jnp.where(jnp.isfinite(per_q), per_q, 0.0)
    return jnp.sum(per_q, axis=-1)
