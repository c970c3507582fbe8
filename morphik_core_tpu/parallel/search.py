"""Mesh-sharded ANN scoring + distributed top-k merge.

Replaces the reference's external Turbopuffer ANN service
(reference core/vector_store/fast_multivector_store.py:296-333,526-532)
with an on-chip design: the FDE matrix lives sharded over the mesh's
"data" axis; a query scores its local shard (one MXU matvec), takes a
LOCAL top-k, and the per-device candidate lists are merged with one
small all-gather — O(devices * k) bytes over ICI instead of an
all-gather of all N scores.

Filtering rides DOCUMENT CODES, not row masks: each row carries an
int32 code for its document (device-cached, immutable per block), and
a filtered query uploads one O(n_docs) float gate vector `allowed`
(the reference pre-filters its ANN with `document_id In [...]`,
fast_multivector_store.py:526-532). An O(n_rows) mask upload per
filtered query would cost ~4 MB per 1M rows through a 50 MB/s relay.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_topk_kernel(f_shard, q, mask_shard, k: int, axis: str):
    """Runs per device under shard_map. f_shard: (n_local, D), q: (D,),
    mask_shard: (n_local,). Returns replicated global top-k."""
    scores = f_shard @ q  # (n_local,)
    scores = jnp.where(mask_shard > 0, scores, -jnp.inf)
    v, i = jax.lax.top_k(scores, k)
    n_local = f_shard.shape[0]
    base = jax.lax.axis_index(axis) * n_local
    gi = i + base
    # (ndev, k) gathered candidate lists — tiny
    v_all = jax.lax.all_gather(v, axis)
    i_all = jax.lax.all_gather(gi, axis)
    v_flat = v_all.reshape(-1)
    i_flat = i_all.reshape(-1)
    vm, im = jax.lax.top_k(v_flat, k)
    return vm, i_flat[im]


@functools.lru_cache(maxsize=32)
def make_sharded_search(mesh: Mesh, k: int, axis: str = "data"):
    """Build a jitted search fn over `mesh`: (F sharded on axis0, q, mask)
    -> replicated (top-k scores, global indices)."""
    fn = jax.shard_map(
        functools.partial(_local_topk_kernel, k=k, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_rows(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))


def shard_rows3(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Row-sharded (rows, tokens, dim) arrays — the mesh pooled tier."""
    return NamedSharding(mesh, P(axis, None, None))


def shard_vec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ------------------------------------------------- single-chip blocked scans

def _scan_body(blocks, masks, codes, allowed, q, k: int, pool: int):
    """Blocked float/bf16 ANN scan core: per-block matvec + local top-k
    + global merge. Returns (scores (pool,) f32, global row ids (pool,)
    int32) — still on device, for composition with the pooled stage."""
    vs, gis = [], []
    for b, (f, m, c) in enumerate(zip(blocks, masks, codes)):
        scores = (f @ q.astype(f.dtype)).astype(jnp.float32)
        gate = m * allowed[c]
        scores = jnp.where(gate > 0, scores, -jnp.inf)
        v, i = jax.lax.top_k(scores, k)
        vs.append(v)
        gis.append(i + b * f.shape[0])
    v = jnp.concatenate(vs)
    gi = jnp.concatenate(gis)
    vm, sel = jax.lax.top_k(v, min(pool, int(v.shape[0])))
    return vm, gi[sel].astype(jnp.int32)


def _scan_body_q(blocks, scales, masks, codes, allowed, qq, q_scale, k: int, pool: int):
    """int8 variant of `_scan_body` (per-row scales; int8 MXU dot)."""
    vs, gis = [], []
    for b, (fq, s, m, c) in enumerate(zip(blocks, scales, masks, codes)):
        s32 = jax.lax.dot_general(
            fq, qq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        scores = s32.astype(jnp.float32) * s * q_scale
        gate = m * allowed[c]
        scores = jnp.where(gate > 0, scores, -jnp.inf)
        v, i = jax.lax.top_k(scores, k)
        vs.append(v)
        gis.append(i + b * fq.shape[0])
    v = jnp.concatenate(vs)
    gi = jnp.concatenate(gis)
    vm, sel = jax.lax.top_k(v, min(pool, int(v.shape[0])))
    return vm, gi[sel].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "pool"))
def scan_blocks_topk(blocks, masks, codes, allowed, q, k: int, pool: int):
    """Fused single-device blocked ANN scan: every block's matvec +
    local top-k AND the global merge run in ONE compiled program (one
    dispatch, one fetch — per-block dispatches pay the host<->device
    RTT n_blocks times on remote-attached TPUs).

    blocks: tuple of (B, D) float/bf16 arrays; masks: tuple of (B,)
    device-cached alive masks; codes: tuple of (B,) int32 per-row doc
    codes (device-cached); allowed: (n_codes_pad,) float32 gate over
    document codes — filtered queries upload only this O(n_docs)
    vector, never an O(n_rows) mask."""
    vm, gi = _scan_body(blocks, masks, codes, allowed, q, k, pool)
    # ONE packed result array: each device->host fetch through a
    # remote-attached relay costs a full RTT, so (scores, indices) ride
    # together — f32 holds row ids exactly up to 2^24 (16.7M rows/chip,
    # far above the 1M-page/chip design point)
    return jnp.concatenate([vm, gi.astype(jnp.float32)])


@functools.partial(jax.jit, static_argnames=("k", "pool"))
def scan_blocks_topk_q(blocks, scales, masks, codes, allowed, qq, q_scale, k: int, pool: int):
    """int8 variant of `scan_blocks_topk` (per-row scales; int8 MXU dot)."""
    vm, gi = _scan_body_q(blocks, scales, masks, codes, allowed, qq, q_scale, k, pool)
    return jnp.concatenate([vm, gi.astype(jnp.float32)])


# ----------------------------------------- fused ANN + pooled-tier rescore
#
# The device-resident pooled-candidate tier: every row's token-POOLED
# int8 multivector lives in HBM blocks with the same row geometry as
# the FDE blocks. The ANN pool is then narrowed to the exact-rescore
# survivors entirely ON DEVICE — a cold query's pooled prefilter pass
# uploads nothing and fetches one tiny packed array. Only the top
# max(2k, 16) survivors pay the full-token host->device upload for the
# exact MaxSim rerank. (The reference's cache-first rerank semantics
# this replaces: core/vector_store/fast_multivector_store.py:713-774.)


def _pooled_stage(vm, gi, pblocks, pscales, q8p, qsp, m: int, n_valid: int,
                  use_pallas: bool, interpret: bool, guard: int = 0):
    """Rescore the ANN pool (vm scores, gi global row ids) by MaxSim over
    the device-resident POOLED int8 tier and keep the top `m`.

    The pool is PADDED to a multiple of 8 for the q8 kernel's candidate
    tile; `n_valid` masks the padding so results match an unpadded pool
    exactly. pblocks: tuple of (B, T, D) int8 pooled tokens; pscales:
    tuple of (B, T) f32 per-token scales with 0 marking padded tokens
    (doubles as the validity mask). q8p/qsp: int8-quantized query
    multivector (quantize_query_q8 layout). Returns packed
    [scores (m,) | ids (m,)] — one device->host fetch.

    `guard` > 0 is the UNION safety floor (round 4): the first `guard`
    pool entries — the ANN (FDE) ordering's head, since vm/gi arrive
    top_k-sorted — survive unconditionally via a finite score bonus, and
    only the remaining m-guard slots are chosen by pooled score. Pooled
    token vectors are lossy; on a trained checkpoint a pure
    pooled-score cut measurably DROPS gold pages the FDE ordering had
    already ranked top-10 (round-4 probe: survivor recall 0.33 pooled-
    only vs 1.00 for the union at factor 32). The exact full-token
    rerank downstream re-sorts survivors, so the bonus never affects
    final scores."""
    from morphik_core_tpu.ops.maxsim import (
        _maxsim_pallas_q8,
        legal_token_tile,
        maxsim_scores_ref,
    )

    B = pblocks[0].shape[0]
    T = pblocks[0].shape[1]
    P_ = gi.shape[0]
    token_tile = legal_token_tile(T)
    total = jnp.zeros((P_,), jnp.float32)
    for b in range(len(pblocks)):
        sel = (gi // B) == b
        idx = jnp.where(sel, gi - b * B, 0)
        g8 = pblocks[b][idx]  # (P, T, D) int8 gather — stays in HBM
        gs = pscales[b][idx]  # (P, T)
        gmask = (gs > 0).astype(jnp.float32) * sel[:, None].astype(jnp.float32)
        if use_pallas:
            s = _maxsim_pallas_q8(
                q8p, qsp, g8, gs, gmask,
                candidate_tile=8, token_tile=token_tile, interpret=interpret,
            )[:P_]
        else:
            deq_d = g8.astype(jnp.float32) * gs[:, :, None]
            deq_q = q8p.astype(jnp.float32) * qsp[0][:, None]
            s = maxsim_scores_ref(deq_q, deq_d, gmask)
            # the ref path scores a fully-masked candidate ~-nq*1e30
            # (per-token max over -1e30 fills), NOT the kernel's exact 0
            # — clamp it, or with 2+ blocks the garbage swamps every
            # real score (and the union-guard bonus) in the sum below
            s = jnp.where(gmask.sum(axis=-1) > 0, s, 0.0)
        # rows outside block b are fully masked -> both paths now map
        # them to exactly 0, so summing across blocks keeps one real score
        total = total + s
    valid = jnp.isfinite(vm) & (jnp.arange(P_) < n_valid)
    if guard > 0:
        # union guard: FDE-head rows outrank every pooled-only score
        # (pooled MaxSim is bounded by the query token count << 1e6)
        total = total + jnp.where(jnp.arange(P_) < guard, 1e6, 0.0)
    total = jnp.where(valid, total, -jnp.inf)
    m = min(m, P_)
    vals, pos = jax.lax.top_k(total, m)
    return jnp.concatenate([vals, gi[pos].astype(jnp.float32)])


@functools.partial(
    jax.jit, static_argnames=("k", "pool", "m", "use_pallas", "interpret", "guard")
)
def scan_blocks_topk_q_pooled(
    blocks, scales, masks, codes, allowed, qq, q_scale,
    pblocks, pscales, q8p, qsp,
    k: int, pool: int, m: int, use_pallas: bool = True, interpret: bool = False,
    guard: int = 0,
):
    """int8 ANN scan + device pooled-tier rescore in ONE compiled
    program: one dispatch, one tiny fetch, zero candidate upload.
    `pool` is the true candidate count; the scan internally pads it to
    the kernel's candidate-tile multiple and masks the padding.
    `guard` forces the FDE-head of the pool to survive (see
    `_pooled_stage`)."""
    pool8 = -(-pool // 8) * 8
    vm, gi = _scan_body_q(blocks, scales, masks, codes, allowed, qq, q_scale, k, pool8)
    return _pooled_stage(
        vm, gi, pblocks, pscales, q8p, qsp, m, pool, use_pallas, interpret, guard
    )


@functools.partial(
    jax.jit, static_argnames=("k", "pool", "m", "use_pallas", "interpret", "guard")
)
def scan_blocks_topk_pooled(
    blocks, masks, codes, allowed, q,
    pblocks, pscales, q8p, qsp,
    k: int, pool: int, m: int, use_pallas: bool = True, interpret: bool = False,
    guard: int = 0,
):
    """float/bf16-ANN twin of `scan_blocks_topk_q_pooled`."""
    pool8 = -(-pool // 8) * 8
    vm, gi = _scan_body(blocks, masks, codes, allowed, q, k, pool8)
    return _pooled_stage(
        vm, gi, pblocks, pscales, q8p, qsp, m, pool, use_pallas, interpret, guard
    )


# --------------------------------------------------------- mesh blocked path

@functools.lru_cache(maxsize=64)
def make_mesh_block_search(
    mesh: Mesh, n_blocks: int, k: int, quantized: bool, axis: str = "data"
):
    """Blocked + sharded ANN search over `mesh`: the corpus lives as
    `n_blocks` immutable row-sharded blocks (the mesh twin of the
    single-chip `_dev_blocks` layout — an ingest re-uploads only the
    tail block per shard, not the corpus). Each device scans its local
    slice of every block, takes a local top-k, and the per-device lists
    merge with one tiny all-gather over ICI.

    Global row mapping: block b is a (B, D) array row-sharded over
    `axis`, so device d holds rows [b*B + d*n_local, b*B + (d+1)*n_local)
    where n_local = B / n_devices.

    Returns a jitted fn:
      quantized: (qq, qs, allowed, blocks_q8, scales, masks, codes)
      float:     (q,      allowed, blocks,            masks, codes)
    -> replicated (top-k scores, global row indices)."""
    block_spec = tuple(P(axis, None) for _ in range(n_blocks))
    vec_spec = tuple(P(axis) for _ in range(n_blocks))

    def merge(vs, gis):
        v = jnp.concatenate(vs)
        gi = jnp.concatenate(gis)
        v, sel = jax.lax.top_k(v, k)
        gi = gi[sel]
        v_all = jax.lax.all_gather(v, axis).reshape(-1)
        i_all = jax.lax.all_gather(gi, axis).reshape(-1)
        vm, im = jax.lax.top_k(v_all, k)
        # packed [scores | row ids as f32] — one device->host fetch
        return jnp.concatenate([vm, i_all[im].astype(jnp.float32)])

    if quantized:

        def kernel(qq, qs, allowed, blocks, scales, masks, codes):
            vs, gis = [], []
            di = jax.lax.axis_index(axis)
            ndev = jax.lax.axis_size(axis)
            for b in range(n_blocks):
                fq = blocks[b]
                s32 = jax.lax.dot_general(
                    fq, qq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                scores = s32.astype(jnp.float32) * scales[b] * qs
                gate = masks[b] * allowed[codes[b]]
                scores = jnp.where(gate > 0, scores, -jnp.inf)
                v, i = jax.lax.top_k(scores, k)
                n_local = fq.shape[0]
                vs.append(v)
                gis.append(i + b * n_local * ndev + di * n_local)
            return merge(vs, gis)

        fn = jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P(), P(), P(), block_spec, vec_spec, vec_spec, vec_spec),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn)

    def kernel_f(q, allowed, blocks, masks, codes):
        vs, gis = [], []
        di = jax.lax.axis_index(axis)
        ndev = jax.lax.axis_size(axis)
        for b in range(n_blocks):
            f = blocks[b]
            scores = (f @ q.astype(f.dtype)).astype(jnp.float32)
            gate = masks[b] * allowed[codes[b]]
            scores = jnp.where(gate > 0, scores, -jnp.inf)
            v, i = jax.lax.top_k(scores, k)
            n_local = f.shape[0]
            vs.append(v)
            gis.append(i + b * n_local * ndev + di * n_local)
        return merge(vs, gis)

    fn = jax.shard_map(
        kernel_f,
        mesh=mesh,
        in_specs=(P(), P(), block_spec, vec_spec, vec_spec),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def make_mesh_block_search_pooled(
    mesh: Mesh, n_blocks: int, pool: int, pool_true: int, m: int, guard: int,
    axis: str = "data"
):
    """Mesh twin of the fused single-chip scan_blocks_topk_q_pooled:
    sharded int8 ANN scan + pooled-tier rescore + union guard in ONE
    compiled program, one tiny replicated fetch, zero candidate upload.

    Each device scans its local row shard of every FDE block, takes its
    local FDE top-`pool`, and rescores exactly those candidates against
    its LOCAL shard of the pooled tier — the candidates are local rows
    by construction, so the pooled gather never crosses ICI. One
    all-gather of (fde score, pooled score, global id) triples merges
    the per-device lists; the replicated tail takes the GLOBAL FDE
    top-`pool_true` — the EXACT configured pool, so candidates ranked
    past it can never displace in-pool rows (identical pool semantics
    to the single-chip `_pooled_stage(n_valid=pool)`; `pool` is the
    padded per-device top-k width) — then keeps the FDE-head `guard`
    unconditionally plus the best m-guard by pooled score (union guard
    — pooled vectors are lossy). Survivors get the exact full-token
    rerank on the host path. int8-ANN blocks only (the index gates the
    mesh tier on ann_dtype=="int8").

    Returns a jitted fn:
      (qq, qs, allowed, blocks_q8, scales, masks, codes,
       pblocks, pscales, q8p, qsp)
    -> replicated packed [scores (m,) | global ids (m,)]."""
    block_spec = tuple(P(axis, None) for _ in range(n_blocks))
    vec_spec = tuple(P(axis) for _ in range(n_blocks))
    p3_spec = tuple(P(axis, None, None) for _ in range(n_blocks))
    p2_spec = tuple(P(axis, None) for _ in range(n_blocks))

    def _pooled_local(pblk, pscl, idx, q8p, qsp):
        """MaxSim of the query multivector against local pooled rows
        `idx` of one block shard (XLA path — fully-masked rows map to
        exactly 0, matching the single-chip kernel semantics)."""
        g8 = pblk[idx]  # (P, T, D) int8
        gs = pscl[idx]  # (P, T) f32, 0 = padded token
        deq_d = g8.astype(jnp.float32) * gs[:, :, None]
        deq_q = q8p.astype(jnp.float32) * qsp[0][:, None]  # (Q, D)
        sims = jnp.einsum("qd,ptd->pqt", deq_q, deq_d)
        sims = jnp.where(gs[:, None, :] > 0, sims, -jnp.inf)
        s = jnp.max(sims, axis=-1)  # (P, Q)
        s = jnp.where(jnp.isfinite(s), s, 0.0).sum(axis=-1)  # (P,)
        has_tok = (gs > 0).any(axis=-1)
        return jnp.where(has_tok, s, 0.0)

    def kernel(qq, qs, allowed, blocks, scales, masks, codes, pblocks, pscales, q8p, qsp):
        di = jax.lax.axis_index(axis)
        ndev = jax.lax.axis_size(axis)
        vs, gis, ps = [], [], []
        for b in range(n_blocks):
            fq = blocks[b]
            s32 = jax.lax.dot_general(
                fq, qq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            scores = s32.astype(jnp.float32) * scales[b] * qs
            gate = masks[b] * allowed[codes[b]]
            scores = jnp.where(gate > 0, scores, -jnp.inf)
            n_local = fq.shape[0]
            kb = min(pool, n_local)
            v, i = jax.lax.top_k(scores, kb)
            vs.append(v)
            gis.append(i + b * n_local * ndev + di * n_local)
            ps.append(_pooled_local(pblocks[b], pscales[b], i, q8p, qsp))
        v = jnp.concatenate(vs)
        gi = jnp.concatenate(gis)
        p = jnp.concatenate(ps)
        kd = min(pool, v.shape[0])
        v, sel = jax.lax.top_k(v, kd)  # local FDE top-pool
        gi, p = gi[sel], p[sel]
        # one all-gather of the per-device candidate triples over ICI
        v_all = jax.lax.all_gather(v, axis).reshape(-1)
        i_all = jax.lax.all_gather(gi, axis).reshape(-1)
        p_all = jax.lax.all_gather(p, axis).reshape(-1)
        kp = min(pool_true, v_all.shape[0])  # EXACT configured pool
        vm, sel = jax.lax.top_k(v_all, kp)  # GLOBAL FDE pool
        im, pm = i_all[sel], p_all[sel]
        total = pm
        if guard > 0:
            total = total + jnp.where(jnp.arange(kp) < guard, 1e6, 0.0)
        total = jnp.where(jnp.isfinite(vm), total, -jnp.inf)
        mm = min(m, kp)
        vals, pos = jax.lax.top_k(total, mm)
        return jnp.concatenate([vals, im[pos].astype(jnp.float32)])

    fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P(), block_spec, vec_spec, vec_spec, vec_spec,
                  p3_spec, p2_spec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


# ------------------------------------------------------------- quantization

@jax.jit
def quantize_vec_int8(qe):
    """Device-side symmetric int8 quantization of one vector. Composed
    with fde_query under a single jit by the index so the encoded query
    never visits the host (saves a round trip per query on
    remote-attached TPUs). Returns (int8 (D,), float32 scalar scale)."""
    s = jnp.max(jnp.abs(qe)) / 127.0
    s = jnp.where(s == 0, 1.0, s).astype(jnp.float32)
    q8 = jnp.clip(jnp.rint(qe / s), -127, 127).astype(jnp.int8)
    return q8, s


def quantize_rows_int8(x) -> Tuple["jax.Array", "jax.Array"]:
    """Symmetric per-row int8 quantization (host-side, numpy).
    Returns (int8 rows, float32 per-row scales)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float32)
    s = np.max(np.abs(x), axis=-1) / 127.0
    s = np.where(s == 0, 1.0, s).astype(np.float32)
    q = np.clip(np.rint(x / s[..., None]), -127, 127).astype(np.int8)
    return q, s
