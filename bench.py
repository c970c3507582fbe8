"""Headline benchmark — run on the real TPU chip.

Measures the two north-star stages (BASELINE.md):
  1. ColPali page-embedding throughput (pages/sec/chip) on the REAL
     ColQwen2.5-3B geometry (random bf16 weights — perf-identical to the
     released checkpoint, which is not downloadable here).
  2. Two-stage retrieval latency on a per-chip shard of a 1M-page index:
     FDE ANN matvec over 125k rows/chip (= 1M pages on a v5e-8 mesh)
     + exact MaxSim rerank of a 75-candidate pool via the Pallas kernel.

Prints ONE JSON line: the embed-throughput headline with the retrieval
p50 in "extra". vs_baseline is measured against the BASELINE.json
target of 10k pages/min on v5e-8 = 20.83 pages/s/chip.

Env knobs: MORPHIK_BENCH_SMALL=1 -> tiny-config smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the 3B-geometry programs take minutes
    # to compile cold; cached runs start in seconds.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/morphik_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without the knob
        pass

    from morphik_core_tpu.models.colqwen.config import ColQwenConfig
    from morphik_core_tpu.models.colqwen.model import colqwen_image_forward, init_colqwen_params
    from morphik_core_tpu.models.colqwen.text import mrope_cos_sin, mrope_position_ids
    from morphik_core_tpu.models.colqwen.vision import vision_rotary_cos_sin
    from morphik_core_tpu.ops.maxsim import maxsim_scores

    small = bool(os.environ.get("MORPHIK_BENCH_SMALL"))
    backend = jax.default_backend()
    dev = jax.devices()[0]

    if small:
        cfg = ColQwenConfig.tiny()
        h_units, w_units, batch = 4, 4, 2
        embed_iters = 64  # tiny steps are ~0.1 ms; need many to beat RTT noise
    else:
        cfg = ColQwenConfig()  # 3B geometry
        # 150-dpi page after smart_resize/max_pixels: ~(20, 28) llm-grid
        h_units, w_units, batch = 20, 28, 8
        embed_iters = 4

    # the int8 measurement mirrors the SHIPPED serving config, including
    # attention precision (model.attention_precision, round 4); bf16
    # parity row always runs the plain-attention tower
    try:
        from morphik_core_tpu.config import load_settings as _ls

        _attn = _ls(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "morphik_tpu.toml")
        ).model.attention_precision
    except Exception:  # noqa: BLE001
        _attn = "bf16"
    if _attn == "int8":
        import dataclasses as _dc

        cfg_int8 = _dc.replace(
            cfg,
            vision=_dc.replace(cfg.vision, qk_int8=True),
            text=_dc.replace(cfg.text, qk_int8=True),
        )
    else:
        cfg_int8 = cfg

    # Host<->device round-trips on this setup go through a relay with a
    # large RTT, so each stage is timed as N data-chained iterations
    # inside ONE jit (single fetch), minus the measured RTT.
    def measure_rtt():
        one = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: jnp.sum(x))
        float(f(one))
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(f(one))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    # One jitted program for the whole init: eager per-tensor random calls
    # would pay the host<->device tunnel RTT hundreds of times.
    t0 = time.time()
    init_fn = jax.jit(lambda k: init_colqwen_params(k, cfg, dtype=jnp.bfloat16))
    params = init_fn(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    init_s = time.time() - t0

    # ---- inputs -----------------------------------------------------------
    s_patches = h_units * w_units * cfg.vision.merge_unit
    patches = jax.random.normal(
        jax.random.PRNGKey(5), (batch, s_patches, cfg.vision.patch_input_dim), jnp.bfloat16
    )
    cos_v, sin_v = vision_rotary_cos_sin(h_units, w_units, cfg.vision)
    n_units = h_units * w_units
    ids = np.array([7, 8, cfg.vision_start_token_id] + [cfg.image_token_id] * n_units
                   + [cfg.vision_end_token_id, 9], dtype=np.int32)
    input_ids = np.tile(ids[None], (batch, 1))
    pos = mrope_position_ids(input_ids, cfg.image_token_id, [(1, h_units, w_units)] * batch)
    cos_t, sin_t = mrope_cos_sin(pos, cfg.text)

    import functools

    fwd = jax.jit(functools.partial(colqwen_image_forward, cfg=cfg, h_units=h_units, w_units=w_units))
    args = dict(
        patches=patches, cos_v=jnp.asarray(cos_v), sin_v=jnp.asarray(sin_v),
        input_ids=jnp.asarray(input_ids), cos_t=jnp.asarray(cos_t), sin_t=jnp.asarray(sin_t),
    )

    rtt_s = measure_rtt()

    # NB: params/args must be EXPLICIT jit arguments — closing over device
    # arrays bakes them into the lowered HLO as constants (7.5 GB of
    # weights -> multi-minute lowering).
    def chained_embed(n):
        @jax.jit
        def g(prm, a):
            def body(i, acc):
                out = fwd(prm, patches=a["patches"] + acc * 1e-30,
                          **{k: v for k, v in a.items() if k != "patches"})
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, 0.0)
        return g

    g1 = chained_embed(1)
    t0 = time.time()
    float(g1(params, args))
    compile_s = time.time() - t0

    # Per-step time via difference of N vs 2N chained iterations: cancels
    # dispatch/fetch overhead exactly instead of subtracting a noisy RTT.
    gN = chained_embed(embed_iters)
    g2N = chained_embed(2 * embed_iters)
    float(gN(params, args))  # compile
    float(g2N(params, args))
    # best-of-3: the tunnel adds sporadic latency; min is the least-
    # interference estimate of the true device step time
    steps = []
    for _ in range(3):
        t0 = time.time()
        float(gN(params, args))
        t_n = time.time() - t0
        t0 = time.time()
        float(g2N(params, args))
        t_2n = time.time() - t0
        steps.append(max((t_2n - t_n) / embed_iters, 1e-9))
    step_s = min(steps)
    pages_per_s = batch / step_s

    # ---- optional W8A8 int8 serving mode (config model.matmul_precision) --
    # Same tower, MXU at its int8 rate. Reported alongside the bf16
    # headline; NOT the headline because end-checkpoint retrieval quality
    # must be validated per-checkpoint (evaluations/) before serving it.
    from morphik_core_tpu.models.colqwen.model import quantize_colqwen_params

    qparams = jax.jit(quantize_colqwen_params)(params)
    jax.block_until_ready(qparams)
    # Static activation scales (config model.static_act_scales): mirror
    # the shipped serving path — capture per-site activation maxes on one
    # batch, attach "as" leaves, and the timed int8 step drops the
    # dynamic per-token max-abs passes (round-5 A/B, AB_STATIC_r05.json).
    # Scale VALUES don't affect step time; the structure change does.
    try:
        _static_scales = _ls(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "morphik_tpu.toml")
        ).model.static_act_scales
    except Exception:  # noqa: BLE001
        _static_scales = False
    if _static_scales:
        from morphik_core_tpu.models.colqwen import layers as _layers
        from morphik_core_tpu.models.colqwen.calibrate import (
            _SITE_COLUMNS,
            attach_vision_act_scales,
        )
        from morphik_core_tpu.models.colqwen.vision import vision_forward as _vf

        @jax.jit
        def _capture(pv, p, cv, sv):
            _layers._ACT_CAPTURE = cap = []
            _layers._QK_CAPTURE = qk_cap = []
            try:
                _vf(pv, p, cv, sv, h_units, w_units, cfg.vision)
            finally:
                _layers._ACT_CAPTURE = None
                _layers._QK_CAPTURE = None
            return jnp.stack(cap), jnp.stack(qk_cap)

        _m, _qk = _capture(qparams["visual"], patches, jnp.asarray(cos_v), jnp.asarray(sin_v))
        _maxes = np.asarray(_m).reshape(cfg.vision.depth, len(_SITE_COLUMNS))
        qparams = dict(qparams)
        qparams["visual"] = attach_vision_act_scales(
            qparams["visual"], _maxes, qk_maxes=np.asarray(_qk)
        )
    if cfg_int8 is not cfg:
        fwd_q8 = jax.jit(functools.partial(
            colqwen_image_forward, cfg=cfg_int8, h_units=h_units, w_units=w_units
        ))

        def chained_embed_q8(n):
            @jax.jit
            def g(prm, a):
                def body(i, acc):
                    out = fwd_q8(prm, patches=a["patches"] + acc * 1e-30,
                                 **{k: v for k, v in a.items() if k != "patches"})
                    return acc + jnp.sum(out.astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, 0.0)
            return g

        gq_n, gq_2n = chained_embed_q8(embed_iters), chained_embed_q8(2 * embed_iters)
    else:
        gq_n, gq_2n = chained_embed(embed_iters), chained_embed(2 * embed_iters)
    float(gq_n(qparams, args)); float(gq_2n(qparams, args))
    q_steps = []
    for _ in range(3):
        t0 = time.time(); float(gq_n(qparams, args)); t_n = time.time() - t0
        t0 = time.time(); float(gq_2n(qparams, args)); t_2n = time.time() - t0
        q_steps.append(max((t_2n - t_n) / embed_iters, 1e-9))
    int8_pages_per_s = batch / min(q_steps)
    for arr in jax.tree_util.tree_leaves(qparams):
        arr.delete()

    # ---- retrieval: per-chip shard of a 1M-page index ---------------------
    # Index generated ON DEVICE: host-side RNG of 1.3B floats + a 2.5 GB
    # transfer over the tunnel costs minutes; one jitted normal() is ~ms.
    fde_dim = 10240
    shard_rows = 2_000 if small else 125_000  # 1M pages / 8 chips
    gen = jax.jit(
        lambda k: jax.random.normal(k, (shard_rows, fde_dim), jnp.bfloat16),
    )
    findex = gen(jax.random.PRNGKey(1))
    qe = jax.random.normal(jax.random.PRNGKey(2), (fde_dim,), jnp.bfloat16)
    jax.block_until_ready(findex)

    @jax.jit
    def ann(f, q):
        scores = jax.lax.dot_general(f, q, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, 75)

    ann_iters = 16

    def make_ann_chain(n):
        @jax.jit
        def chain(f, q0):
            def body(i, acc):
                v, _ = ann(f, q0 + acc * 1e-30)
                return acc + jnp.sum(v)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return chain

    ann_n, ann_2n = make_ann_chain(ann_iters), make_ann_chain(2 * ann_iters)
    float(ann_n(findex, qe)); float(ann_2n(findex, qe))
    t0 = time.time(); float(ann_n(findex, qe)); t_n = time.time() - t0
    t0 = time.time(); float(ann_2n(findex, qe)); t_2n = time.time() - t0
    ann_p50 = max(t_2n - t_n, 0.0) / ann_iters * 1e3

    n_cand, n_tok, q_tok, d = 75, 1024, 32, cfg.embedding_dim
    cand = jax.random.normal(jax.random.PRNGKey(3), (n_cand, n_tok, d), jnp.bfloat16)
    cmask = jnp.ones((n_cand, n_tok), jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(4), (q_tok, d), jnp.float32)
    use_pallas = backend != "cpu"
    rr_iters = 16

    def make_rr_chain(n):
        @jax.jit
        def chain(cd, cm, q0):
            def body(i, acc):
                s = maxsim_scores(q0 + acc * 1e-30, cd, cm, use_pallas=use_pallas)
                return acc + jnp.sum(s)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return chain

    rr_n, rr_2n = make_rr_chain(rr_iters), make_rr_chain(2 * rr_iters)
    float(rr_n(cand, cmask, q)); float(rr_2n(cand, cmask, q))
    t0 = time.time(); float(rr_n(cand, cmask, q)); t_n = time.time() - t0
    t0 = time.time(); float(rr_2n(cand, cmask, q)); t_2n = time.time() - t0
    rerank_p50 = max(t_2n - t_n, 0.0) / rr_iters * 1e3

    # ---- FDE document encode (ingest-side store stage) -------------------
    from morphik_core_tpu.ops.fde import FDEConfig, fde_document_batch

    fde_cfg = FDEConfig(dimension=cfg.embedding_dim)
    fde_batch, fde_tok = 16, 1024
    mvs = jax.random.normal(jax.random.PRNGKey(6), (fde_batch, fde_tok, cfg.embedding_dim), jnp.float32)
    fde_mask = jnp.ones((fde_batch, fde_tok), jnp.float32)
    fde_iters = 8

    def make_fde_chain(n):
        @jax.jit
        def chain(x, m):
            def body(i, acc):
                v = fde_document_batch(x + acc * 1e-30, m, fde_cfg)
                return acc + jnp.sum(v)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return chain

    fde_n, fde_2n = make_fde_chain(fde_iters), make_fde_chain(2 * fde_iters)
    float(fde_n(mvs, fde_mask)); float(fde_2n(mvs, fde_mask))
    t0 = time.time(); float(fde_n(mvs, fde_mask)); t_n = time.time() - t0
    t0 = time.time(); float(fde_2n(mvs, fde_mask)); t_2n = time.time() - t0
    fde_ms_per_page = max(t_2n - t_n, 0.0) / fde_iters / fde_batch * 1e3

    # ---- query encode p50 (reference per-stage 'encode_query' timing,
    # fast_multivector_store.py:513-605): 64-token bucket, batch 1 -------
    from morphik_core_tpu.models.colqwen.model import colqwen_text_forward

    q_seq = 64
    q_ids = jnp.asarray(np.full((1, q_seq), 9, np.int32))
    q_mask = jnp.ones((1, q_seq), jnp.float32)
    pos_q = mrope_position_ids(np.full((1, q_seq), 9, np.int32), -1, [None])
    cos_q, sin_q = mrope_cos_sin(pos_q, cfg.text)
    qe_iters = 16

    def make_qe_chain(n):
        @jax.jit
        def chain(prm, ids, m):
            def body(i, acc):
                # data-chain through the mask so the loop body can't hoist
                out = colqwen_text_forward(
                    prm, cfg, ids, m + acc * 1e-30, jnp.asarray(cos_q), jnp.asarray(sin_q)
                )
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, 0.0)
        return chain

    qe_n, qe_2n = make_qe_chain(qe_iters), make_qe_chain(2 * qe_iters)
    float(qe_n(params, q_ids, q_mask)); float(qe_2n(params, q_ids, q_mask))
    t0 = time.time(); float(qe_n(params, q_ids, q_mask)); t_n = time.time() - t0
    t0 = time.time(); float(qe_2n(params, q_ids, q_mask)); t_2n = time.time() - t0
    query_encode_p50 = max(t_2n - t_n, 0.0) / qe_iters * 1e3

    # ---- END-TO-END retrieval on a 1M-row single-chip index ---------------
    # The full production query path through MultiVectorIndex.query():
    # device FDE-encode+int8-quantize of the query -> blocked int8 ANN scan
    # over 1M x 10,240 rows (10.2 GB HBM) -> device top-k merge (one fetch)
    # -> host mmap gather of the 75-candidate pool -> bucket pad -> 16-bit
    # upload -> Pallas MaxSim rerank. Index rows are device-fabricated
    # (uploading 10 GB of host RNG over the tunnel costs minutes) and the
    # pool gather reads a real on-disk mv.bin via the index's own mmap
    # path; pool rows map modulo into it so gather cost per row matches a
    # full-size file resident in page cache.
    # free the model + stage arrays first: 7.5 GB params + 10.2 GB
    # index exceed one chip's HBM
    for arr in jax.tree_util.tree_leaves((params, args, findex, cand, mvs)):
        arr.delete()
    if True:
        import tempfile

        from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
        from morphik_core_tpu.ops.fde import FDEConfig as _FDECfg

        rows, tok, mv_real = (16_384, 128, 256) if small else (1_000_000, 1024, 2048)
        n_queries = 5 if small else 15
        tier_factor = 32
        tmp = tempfile.mkdtemp(prefix="bench1m_")
        # production default serving config (morphik_tpu.toml): int8 ANN,
        # int8 exact rerank, DEVICE-RESIDENT pooled tier (the pooled
        # prefilter fuses into the ANN scan — zero candidate upload until
        # the max(2k,16)-row exact rescore), HBM candidate cache
        idx = MultiVectorIndex(
            _FDECfg(dimension=cfg.embedding_dim), ann_dtype="int8",
            rerank_dtype="int8", rerank_prefilter_pooling=4,
            pooled_tier_factor=tier_factor, pooled_tier_budget_mb=6144,
            # 2048 int8 slots x (tok x 128 + scales) ~ 277 MB HBM: holds a
            # 64-query working set (64 x max(2k,16,pool/10)=30 rescore
            # rows at the pool-300 default) fully resident — the
            # warm-curve sweep below measures exactly this boundary (256
            # slots thrashed at W>=16, 1536 at W=64: cyclic LRU gives 0%
            # hits the moment the cycle exceeds capacity).
            device_cache_slots=2048, device_cache_token_bucket=tok,
        )
        idx.records = [
            IndexRecord(document_id=f"d{i >> 3}", chunk_number=i & 7, n_tokens=tok)
            for i in range(rows)
        ]
        idx._count = rows
        alive = np.zeros(rows, dtype=bool)
        alive[:] = True
        idx._alive = alive
        # doc-code state (device-gated filtering): 8 chunks per document
        idx._row_code = [i >> 3 for i in range(rows)]
        idx._doc_index = {f"d{d}": d for d in range(rows >> 3)}
        idx._doc_alive = {f"d{d}": 8 for d in range(rows >> 3)}
        idx._persisted = rows
        idx._mv_off = [(i % mv_real) * tok for i in range(rows)]
        mv_path = os.path.join(tmp, "mv.bin")
        rng = np.random.default_rng(0)
        with open(mv_path, "wb") as fh:
            for _ in range(mv_real // 256):
                fh.write(
                    rng.standard_normal((256 * tok, cfg.embedding_dim), dtype=np.float32)
                    .astype(np.float16)
                    .tobytes()
                )
        idx._mv_file_tokens = mv_real * tok
        idx._mv_mm = np.memmap(
            mv_path, dtype=np.float16, mode="r", shape=(mv_real * tok, cfg.embedding_dim)
        )
        # fabricate the int8 device blocks in place of _ensure_device_blocks
        idx._sync_block_size()
        B = idx._active_block
        n_blocks = -(-rows // B)
        gen_q = jax.jit(
            lambda k: jax.random.randint(k, (B, idx._fde_dim), -127, 128, dtype=jnp.int32).astype(
                jnp.int8
            )
        )
        for b in range(n_blocks):
            blk = gen_q(jax.random.PRNGKey(100 + b))
            idx._dev_blocks.append((blk, jnp.ones((B,), jnp.float32)))
            m = np.zeros(B, np.float32)
            m[: max(0, min(B, rows - b * B))] = 1.0
            idx._mask_blocks.append(jnp.asarray(m))
        jax.block_until_ready(idx._dev_blocks)
        idx._dev_rows = rows
        idx._mask_rows = rows
        # fabricate the device-resident pooled tier the same way (the
        # production path builds it tail-incrementally at ingest time)
        idx._max_tokens = tok
        bucket = idx._tier_bucket()
        gen_p = jax.jit(
            lambda k: jax.random.randint(
                k, (B, bucket, cfg.embedding_dim), -127, 128, dtype=jnp.int32
            ).astype(jnp.int8)
        )
        for b in range(n_blocks):
            idx._pooled_blocks.append(gen_p(jax.random.PRNGKey(500 + b)))
            idx._pooled_scales.append(jnp.ones((B, bucket), jnp.float32))
        jax.block_until_ready(idx._pooled_blocks)
        idx._pooled_rows = rows
        idx._pooled_bucket = bucket
        tier_gb = idx.tier_bytes_estimate() / 1e9
        assert idx._tier_active(), "pooled tier must be active for the e2e bench"

        q32 = np.asarray(
            jax.random.normal(jax.random.PRNGKey(7), (32, cfg.embedding_dim)), np.float32
        )
        idx.query(q32, k=10)  # warm: compiles fde_q8 + block scan + merge + rerank
        lat, stage = [], {"encode_ms": [], "ann_ms": [], "rerank_ms": []}
        for qi in range(n_queries):
            qq = np.asarray(
                jax.random.normal(jax.random.PRNGKey(200 + qi), (32, cfg.embedding_dim)),
                np.float32,
            )
            t0 = time.time()
            res = idx.query(qq, k=10, return_timing=True)
            lat.append((time.time() - t0) * 1e3)
            for kk in stage:
                stage[kk].append(idx.last_timing[kk])
            assert len(res) == 10
        # warm-path p50: repeated query -> the HBM candidate LRU serves
        # the pool on device (the analogue of the reference's disk-cache
        # hit path, fast_multivector_store.py:713-774)
        qw = np.asarray(
            jax.random.normal(jax.random.PRNGKey(300), (32, cfg.embedding_dim)), np.float32
        )
        idx.query(qw, k=10)  # cold (fills cache)
        warm = []
        for _ in range(8):
            t0 = time.time()
            idx.query(qw, k=10)
            warm.append((time.time() - t0) * 1e3)

        # warm-path HIT-RATE CURVE vs working-set size (round-3 verdict
        # weak #6: the single-repeated-query warm number is a 100%-hit
        # best case). The HBM cache holds `device_cache_slots` candidate
        # ROWS; each query occupies ~rescore_n of them, so W distinct
        # queries compete for slots. Cycle W queries twice — pass 1
        # fills, pass 2 measures the steady-state warm/cold blend a real
        # working set of size W would see.
        warm_curve = {}
        for W in (1, 4, 16, 64):
            qs = [
                np.asarray(
                    jax.random.normal(
                        jax.random.PRNGKey(10_000 + W * 100 + i), (32, cfg.embedding_dim)
                    ),
                    np.float32,
                )
                for i in range(W)
            ]
            for q_ in qs:
                idx.query(q_, k=10)  # fill
            cache = idx._pool_cache
            h0, m0 = (cache.hits, cache.misses) if cache else (0, 0)
            ts = []
            for q_ in qs[: min(W, 12)]:
                t0 = time.time()
                idx.query(q_, k=10)
                ts.append((time.time() - t0) * 1e3)
            hits = (cache.hits - h0) if cache else 0
            total_rows = hits + ((cache.misses - m0) if cache else 0)
            warm_curve[str(W)] = {
                "p50_ms": round(float(np.median(ts)), 2),
                "row_hit_rate": round(hits / total_rows, 3) if total_rows else None,
            }

        # FILTERED p50: auth-scoped query over a doc subset. The gate
        # rides per-row document codes on device — upload is one
        # O(n_docs) vector, so filtered must land within ~2x of
        # unfiltered (round-3 verdict item 4).
        filt_docs = [f"d{d}" for d in range(0, rows >> 3, 2)]  # half the corpus
        idx.query(q32, k=10, doc_ids=filt_docs)  # compile + code-block upload
        filt = []
        for qi in range(max(3, n_queries // 2)):
            qq = np.asarray(
                jax.random.normal(jax.random.PRNGKey(400 + qi), (32, cfg.embedding_dim)),
                np.float32,
            )
            t0 = time.time()
            res = idx.query(qq, k=10, doc_ids=filt_docs, return_timing=True)
            filt.append((time.time() - t0) * 1e3)
            assert all(int(r.document_id[1:]) % 2 == 0 for r, _ in res)

        # ANN pool-size latency curve (VERDICT r3 item 4): with the
        # device tier the prefilter pass costs no transfer, so bigger
        # pools should be ~free — the recall side of the curve lives in
        # EVAL_r04.json (evaluations/fidelity_eval.py part B).
        pool_curve = {}
        for cap in (75, 150, 300):
            idx.prefilter_cap = cap
            idx.prefilter_multiplier = 100  # pool == cap at k=10
            idx.query(q32, k=10)  # compile this pool size
            ts = []
            for qi in range(3 if small else 5):
                qq = np.asarray(
                    jax.random.normal(
                        jax.random.PRNGKey(600 + 10 * cap + qi), (32, cfg.embedding_dim)
                    ),
                    np.float32,
                )
                t0 = time.time()
                idx.query(qq, k=10)
                ts.append((time.time() - t0) * 1e3)
            pool_curve[str(cap)] = round(float(np.median(ts)), 2)
        idx.prefilter_cap, idx.prefilter_multiplier = 300, 30  # production default

        rescore_rows = 30  # max(2k, 16, pool//10) at k=10, pool 300
        rescore_mb = rescore_rows * tok * (cfg.embedding_dim + 4) / 1e6  # int8 + scales
        e2e = {
            "retrieval_p50_ms_1M_warm": round(float(np.median(warm)), 2),
            "warm_curve_by_working_set": warm_curve,
            "retrieval_p50_ms_1M_e2e": round(float(np.median(lat)), 2),
            "retrieval_p90_ms_1M_e2e": round(float(np.percentile(lat, 90)), 2),
            "retrieval_p50_ms_1M_filtered": round(float(np.median(filt)), 2),
            "e2e_ann_p50_ms": round(float(np.median(stage["ann_ms"])), 2),
            "e2e_rerank_p50_ms": round(float(np.median(stage["rerank_ms"])), 2),
            "e2e_rows": rows,
            "e2e_pool": idx.prefilter_cap,
            "e2e_pool_p50_ms": pool_curve,
            "e2e_rerank_cfg": (
                f"int8 + device pooled tier (factor {tier_factor}, "
                f"{tier_gb:.1f} GB HBM; fused into the ANN scan — zero "
                f"prefilter upload)"
            ),
            "e2e_rescore_upload_mb": round(rescore_mb, 2),
            # On this setup host<->device goes through a network relay
            # (~50 MB/s fresh-data upload + ~30 ms RTT). With the device
            # tier the only per-query bulk transfer left is the
            # max(2k,16)-row exact rescore (~2.6 MB int8). Locally-
            # attached v5e (PCIe DMA) moves that in ~1 ms; the compute
            # floor is the fused scan (10.2 GB int8 FDE + 4.4 GB pooled
            # tier HBM reads ~ 18 ms) + rescore kernel (<1 ms).
        }
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)

        # free the 1M index's device arrays (10.2 GB FDE + pooled tier):
        # the ingest block below re-inits the 3B tower and needs the HBM
        for arr in jax.tree_util.tree_leaves(
            [idx._dev_blocks, idx._mask_blocks, idx._pooled_blocks, idx._pooled_scales]
        ):
            if hasattr(arr, "delete"):
                arr.delete()
        for c in (idx._pool_cache, idx._pooled_cache):
            if c is not None:
                for a in (c._buf, c._sbuf, c._mbuf):
                    if a is not None:
                        a.delete()
        del idx

    # ---- ingest e2e (round-3 verdict item 7): the full production
    # pipeline — pdf -> raster -> JPEG URI -> decode -> preprocess ->
    # embed -> FDE -> store — through IngestionService.process_ingestion_job
    # with the sequential worker model and production batch sizes, plus a
    # per-stage isolation split. Compact corpus here (the full ≥500-page
    # decomposition is scripts/bench_ingest.py -> INGEST_r04.json).
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_ingest import run_bench as _ingest_bench

    ingest = _ingest_bench(2 if small else 6, 4 if small else 16, small)
    ingest_e2e = {
        "ingest_e2e_pages_per_s": ingest["value"],
        "ingest_phase_split_s": ingest["phase_split_s"],
        "ingest_stage_isolation_pages_per_s": ingest["stage_isolation_pages_per_s"],
        "ingest_pages": ingest["pages"],
        # round-5 verdict item 5: the 11-vs-27 pages/s ingest-embed gap,
        # decomposed (host preprocess / patch upload / device step+fetch
        # per batch, with the pipelined bound the prefetch can reach)
        "ingest_embed_attribution": ingest.get("embed_attribution"),
        "ingest_raster_pool_scaling": ingest.get("raster_pool_scaling"),
    }

    target_pages_per_s_per_chip = 10_000 / 60 / 8  # BASELINE.json north star
    # The headline follows the SHIPPED serving precision
    # (morphik_tpu.toml model.matmul_precision): int8 W8A8 is default-on
    # once evaluations/fidelity_eval.py's gate approved it (EVAL_r03).
    try:
        from morphik_core_tpu.config import load_settings

        serving_precision = load_settings(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "morphik_tpu.toml")
        ).model.matmul_precision
    except Exception:  # noqa: BLE001
        serving_precision = "bf16"
    headline = int8_pages_per_s if serving_precision == "int8" else pages_per_s
    print(
        json.dumps(
            {
                "metric": f"colqwen2.5-3b page embed throughput ({serving_precision} serving default)",
                "value": round(headline, 3),
                "unit": "pages/sec/chip",
                "vs_baseline": round(headline / target_pages_per_s_per_chip, 3),
                "extra": {
                    "backend": backend,
                    "grid": [h_units, w_units],
                    "batch": batch,
                    "attention_precision": _attn,
                    "embed_step_ms": round(step_s * 1e3, 2),
                    "bf16_pages_per_s": round(pages_per_s, 3),
                    "int8_pages_per_s": round(int8_pages_per_s, 3),
                    "ann_shard_p50_ms": round(ann_p50, 3),
                    "ann_shard_rows": shard_rows,
                    "maxsim_rerank_p50_ms": round(rerank_p50, 3),
                    "query_encode_p50_ms": round(query_encode_p50, 3),
                    "fde_encode_ms_per_page": round(fde_ms_per_page, 3),
                    "retrieval_p50_ms": round(query_encode_p50 + ann_p50 + rerank_p50, 3),
                    **e2e,
                    **ingest_e2e,
                    "compile_s": round(compile_s, 1),
                    "host_rtt_ms": round(rtt_s * 1e3, 2),
                    "init_s": round(init_s, 1),
                    "small": small,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
