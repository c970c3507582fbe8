"""MaxSim late-interaction scoring.

score(Q, D) = sum_{q in Q} max_{d in D} <q, d>

This is the engine's hot retrieval op. The reference computes it
(a) inside Postgres over binary-quantized vectors via a SQL `max_sim`
function (reference core/vector_store/multi_vector_store.py:285-315)
and (b) on CPU/GPU via torch `score_multi_vector`
(reference core/vector_store/fast_multivector_store.py:553-557).

Here it is a tiled Pallas TPU kernel: candidate multivectors stream
through VMEM in (candidate-tile x doc-token-tile) blocks, the
query x doc-token score tile is computed on the MXU, a running
per-query-token max lives in VMEM scratch, and the final reduction
over query tokens happens on-chip. A pure-XLA reference implementation
(`maxsim_scores_ref`) is kept for CPU tests and parity checks.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def default_use_pallas() -> bool:
    """Single source of truth for 'is a TPU Pallas backend available' —
    the axon relay registers as its own platform name."""
    return jax.default_backend() in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def legal_token_tile(n_tokens: int) -> int:
    """Largest legal token tile for the q8 kernel's pre-padded core over
    a (C, n_tokens[, D]) array. Mosaic requires a block's LAST dim to be
    a multiple of 128 or equal to the full array dim — a tile that merely
    divides n_tokens (e.g. 8 into 24, or 16 into 80) fails lowering on
    real TPU. So: the biggest 128-multiple that divides n_tokens, else
    n_tokens itself (one full-width tile)."""
    for t in (512, 384, 256, 128):
        if n_tokens % t == 0:
            return t
    return n_tokens


def pad_multivectors(
    mvs: Sequence[np.ndarray],
    token_bucket: Optional[int] = None,
    dim: Optional[int] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a ragged list of (n_tokens_i, dim) multivectors into a dense
    (C, N_pad, dim) array + validity mask (C, N_pad).

    Ragged token counts are the reference's norm (a page is 700-1300
    ColPali patch tokens); XLA wants static shapes, so we bucket-pad.
    `dtype` lets rerank pools stay 16-bit end to end (the store dtype is
    already fp16 — upcasting before the host->device transfer would
    double the transfer for zero fidelity gain)."""
    if not len(mvs):
        raise ValueError("empty multivector list")
    d = dim or mvs[0].shape[-1]
    max_n = max(int(m.shape[0]) for m in mvs)
    n_pad = token_bucket if token_bucket is not None else _round_up(max_n, 128)
    if n_pad < max_n:
        raise ValueError(f"token_bucket {n_pad} < longest multivector {max_n}")
    c = len(mvs)
    out = np.zeros((c, n_pad, d), dtype=dtype)
    mask = np.zeros((c, n_pad), dtype=np.float32)
    for i, m in enumerate(mvs):
        n = int(m.shape[0])
        out[i, :n] = np.asarray(m, dtype=dtype)
        mask[i, :n] = 1.0
    return out, mask


def maxsim_scores_ref(
    query: jax.Array,
    docs: jax.Array,
    doc_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Pure-XLA MaxSim. query: (Nq, D) — invalid query rows must be zero.
    docs: (C, Nd, D); doc_mask: (C, Nd) with 1 for valid tokens.
    Returns (C,) float32 scores."""
    q = query.astype(jnp.float32)
    d = docs.astype(jnp.float32)
    sim = jnp.einsum("qd,cnd->cqn", q, d, precision=jax.lax.Precision.HIGHEST)  # (C, Nq, Nd)
    if doc_mask is not None:
        sim = jnp.where(doc_mask[:, None, :] > 0, sim, NEG_INF)
    per_q = jnp.max(sim, axis=-1)  # (C, Nq)
    # A zero (padded) query row dots to 0 with every doc token, so its max
    # over valid doc tokens is exactly 0 and contributes nothing.
    return jnp.sum(per_q, axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _maxsim_kernel(q_ref, d_ref, m_ref, out_ref, acc_ref):
    """Grid: (candidate_tiles, doc_token_tiles); token tiles iterate fastest.

    q_ref:   (NQ, D)            resident in VMEM
    d_ref:   (TC, TN, D)        current candidate x token block
    m_ref:   (TC, TN)           doc-token validity
    out_ref: (1, 1, TC)         per-candidate scores (written on last token tile)
    acc_ref: (TC, NQ) f32       running per-(candidate, query-token) max
    """
    j = pl.program_id(1)
    tc, tn, dim = d_ref.shape
    nq = q_ref.shape[0]

    d2 = d_ref[:].reshape(tc * tn, dim)
    # (TC*TN, NQ) score tile on the MXU, fp32 accumulation.
    s = jax.lax.dot_general(
        d2,
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tc, tn, nq)
    s = jnp.where(m_ref[:][:, :, None] > 0, s, NEG_INF)
    part = jnp.max(s, axis=1)  # (TC, NQ)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = jnp.maximum(acc_ref[:], part)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        # Fully-masked (padded) candidates would sum NEG_INF; zero them
        # so padded rows stay finite.
        acc = jnp.where(acc_ref[:] <= NEG_INF * 0.5, 0.0, acc_ref[:])
        out_ref[:] = jnp.sum(acc, axis=1)[None, None, :]


@functools.partial(jax.jit, static_argnames=("candidate_tile", "token_tile"))
def _maxsim_pallas(
    query: jax.Array,
    docs: jax.Array,
    doc_mask: jax.Array,
    candidate_tile: int = 8,
    token_tile: int = 256,
) -> jax.Array:
    c, nd, dim = docs.shape
    nq = query.shape[0]
    tc = min(candidate_tile, c)
    tn = min(token_tile, nd)
    grid = (pl.cdiv(c, tc), pl.cdiv(nd, tn))

    out = pl.pallas_call(
        _maxsim_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, tn, dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1, tc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tc, nq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * c * nd * dim * nq,
            bytes_accessed=docs.size * docs.dtype.itemsize + query.size * 4 + c * 4,
            transcendentals=0,
        ),
    )(query, docs, doc_mask)
    return out.reshape(-1)[:c]


def maxsim_scores(
    query: jax.Array,
    docs: jax.Array,
    doc_mask: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
    candidate_tile: int = 8,
    token_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """MaxSim scores of `query` (Nq, D) against `docs` (C, Nd, D).

    Invalid query rows must be zero-padded; `doc_mask` marks valid doc
    tokens. Dispatches to the Pallas TPU kernel on TPU backends, pure
    XLA elsewhere.
    """
    if use_pallas is None:
        use_pallas = default_use_pallas()
    if doc_mask is None:
        doc_mask = jnp.ones(docs.shape[:2], dtype=jnp.float32)
    if not use_pallas and not interpret:
        return maxsim_scores_ref(query, docs, doc_mask)

    c, nd, dim = docs.shape
    nq = query.shape[0]
    # Pad to hardware-friendly shapes.
    nq_pad = _round_up(max(nq, 8), 8)
    tc = min(candidate_tile, _round_up(c, 8))
    tn = min(token_tile, _round_up(nd, 8))
    c_pad = _round_up(c, tc)
    nd_pad = _round_up(nd, tn)
    q = jnp.pad(query.astype(jnp.float32), ((0, nq_pad - nq), (0, 0)))
    d = jnp.pad(docs, ((0, c_pad - c), (0, nd_pad - nd), (0, 0)))
    m = jnp.pad(doc_mask.astype(jnp.float32), ((0, c_pad - c), (0, nd_pad - nd)))

    if interpret:
        grid = (pl.cdiv(c_pad, tc), pl.cdiv(nd_pad, tn))
        out = pl.pallas_call(
            _maxsim_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nq_pad, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tc, tn, dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tc, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, tc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0], 1, tc), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tc, nq_pad), jnp.float32)],
            interpret=True,
        )(q, d, m)
        return out.reshape(-1)[:c]
    return _maxsim_pallas(q, d, m, candidate_tile=tc, token_tile=tn)[:c]


# ---------------------------------------------------------------------------
# int8 variant: per-token-quantized candidates (halves pool transfers and
# doubles HBM cache capacity; the int8 MXU dot runs at 2x the bf16 rate).
# The reference's own postgres rerank quantizes far harder — to 1 BIT —
# (multi_vector_store.py:329-345), so 8-bit "exact" reranking is well
# inside reference-blessed fidelity.
# ---------------------------------------------------------------------------


def _maxsim_kernel_q8(q_ref, qs_ref, d_ref, ds_ref, m_ref, out_ref, acc_ref):
    """int8 x int8 -> int32 score tile, rescaled by per-doc-token and
    per-query-token scales. Grid/accumulator layout matches
    `_maxsim_kernel`."""
    j = pl.program_id(1)
    tc, tn, dim = d_ref.shape
    nq = q_ref.shape[0]

    d2 = d_ref[:].reshape(tc * tn, dim)
    s32 = jax.lax.dot_general(
        d2, q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(tc, tn, nq)
    s = s32.astype(jnp.float32) * ds_ref[:][:, :, None] * qs_ref[0, :][None, None, :]
    s = jnp.where(m_ref[:][:, :, None] > 0, s, NEG_INF)
    part = jnp.max(s, axis=1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = jnp.maximum(acc_ref[:], part)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc = jnp.where(acc_ref[:] <= NEG_INF * 0.5, 0.0, acc_ref[:])
        out_ref[:] = jnp.sum(acc, axis=1)[None, None, :]


def quantize_pool_int8(mvs: Sequence[np.ndarray], token_bucket: Optional[int] = None):
    """Per-TOKEN symmetric int8 quantization of a ragged candidate pool:
    pad_multivectors packing + quantize_rows_int8 scales (all-zero padded
    rows quantize to scale 1; the mask marks validity).
    Returns (q8 (C, N_pad, D) int8, scales (C, N_pad) f32, mask)."""
    from morphik_core_tpu.parallel.search import quantize_rows_int8

    dense, mask = pad_multivectors(mvs, token_bucket=token_bucket)
    q8, scales = quantize_rows_int8(dense)
    return q8, scales, mask


def quantize_query_q8(query, nq_pad: Optional[int] = None):
    """Row-quantize a query multivector and zero-pad to `nq_pad` rows
    (default: round up to 8). One shared recipe for the cold rerank path
    and the HBM cache path — identical kernel shapes on both.
    Returns (q8 (NQ_pad, D) int8, qs (1, NQ_pad) f32)."""
    from morphik_core_tpu.parallel.search import quantize_rows_int8

    q = np.asarray(query, dtype=np.float32)
    q8_host, qs_host = quantize_rows_int8(q)
    nq = q8_host.shape[0]
    nq_pad = nq_pad or _round_up(max(nq, 8), 8)
    q8 = np.zeros((nq_pad, q.shape[1]), np.int8)
    q8[:nq] = q8_host
    qs = np.zeros((1, nq_pad), np.float32)
    qs[0, :nq] = qs_host
    return q8, qs


def maxsim_scores_q8(
    query: jax.Array,
    docs_q8,
    doc_scales,
    doc_mask,
    *,
    use_pallas: Optional[bool] = None,
    candidate_tile: int = 8,
    token_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """MaxSim over per-token int8-quantized candidates. `query` stays
    float; it is row-quantized here so both dot operands hit the int8
    MXU path."""
    if use_pallas is None:
        use_pallas = default_use_pallas()
    q8, qs = quantize_query_q8(query)

    if not (use_pallas or interpret):
        # dequantize BOTH sides so CPU scores match the TPU kernel's
        # quantization exactly (backend-consistent results)
        deq_d = jnp.asarray(docs_q8, jnp.float32) * jnp.asarray(doc_scales)[:, :, None]
        deq_q = jnp.asarray(q8, jnp.float32) * jnp.asarray(qs)[0][:, None]
        return maxsim_scores_ref(deq_q, deq_d, jnp.asarray(doc_mask))

    c, nd, dim = docs_q8.shape
    # fast path: device-resident, already tile-aligned candidates skip
    # the host pad/copy entirely (fetching a device array back to host
    # to re-pad it would cost 2x the pool transfer)
    if (
        isinstance(docs_q8, jax.Array)
        and c % min(candidate_tile, _round_up(c, 8)) == 0
        and nd % min(token_tile, _round_up(nd, 8)) == 0
    ):
        return _maxsim_pallas_q8(
            jnp.asarray(q8), jnp.asarray(qs), docs_q8, doc_scales, doc_mask,
            candidate_tile=min(candidate_tile, c), token_tile=min(token_tile, nd),
            interpret=interpret,
        )[:c]
    tc = min(candidate_tile, _round_up(c, 8))
    tn = min(token_tile, _round_up(nd, 8))
    c_pad = _round_up(c, tc)
    nd_pad = _round_up(nd, tn)
    d8 = np.zeros((c_pad, nd_pad, dim), np.int8)
    d8[:c, :nd] = np.asarray(docs_q8)
    ds = np.ones((c_pad, nd_pad), np.float32)
    ds[:c, :nd] = np.asarray(doc_scales)
    m = np.zeros((c_pad, nd_pad), np.float32)
    m[:c, :nd] = np.asarray(doc_mask)

    out = _maxsim_pallas_q8(
        jnp.asarray(q8), jnp.asarray(qs), jnp.asarray(d8), jnp.asarray(ds), jnp.asarray(m),
        candidate_tile=tc, token_tile=tn, interpret=interpret,
    )
    return out[:c]


@functools.partial(jax.jit, static_argnames=("candidate_tile", "token_tile", "interpret"))
def _maxsim_pallas_q8(
    q8: jax.Array,  # (NQ_pad, D) int8
    qs: jax.Array,  # (1, NQ_pad) f32
    d8: jax.Array,  # (C_pad, N_pad, D) int8 — C_pad % tc == 0, N_pad % tn == 0
    ds: jax.Array,  # (C_pad, N_pad) f32
    m: jax.Array,  # (C_pad, N_pad) f32
    candidate_tile: int = 8,
    token_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Jitted q8 kernel core over ALREADY-padded (device-resident)
    arrays — the HBM candidate cache scores gathered pools through this
    without a host round trip."""
    c_pad, nd_pad, dim = d8.shape
    nq_pad = q8.shape[0]
    tc, tn = candidate_tile, token_tile
    grid = (pl.cdiv(c_pad, tc), pl.cdiv(nd_pad, tn))
    out = pl.pallas_call(
        _maxsim_kernel_q8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq_pad, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, tn, dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1, tc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tc, nq_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * c_pad * nd_pad * dim * nq_pad,
            bytes_accessed=d8.size + q8.size + (ds.size + m.size + c_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q8, qs, d8, ds, m)
    return out.reshape(-1)


def maxsim_topk(
    query: jax.Array,
    docs: jax.Array,
    doc_mask: Optional[jax.Array] = None,
    k: int = 10,
    **kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k candidates by MaxSim. Returns (scores, indices)."""
    scores = maxsim_scores(query, docs, doc_mask, **kwargs)
    k = min(k, scores.shape[0])
    return jax.lax.top_k(scores, k)
