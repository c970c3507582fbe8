#!/usr/bin/env python3
"""Attribute the int8 (W8A8) serving-step residual on the real chip
(round-3 verdict item 2: 26.2 vs 21.4 pages/s is 1.22x, while the v5e
MXU int8 rate is 2x bf16 — where does the rest go?).

Times, via data-chained fori_loop N-vs-2N pairs (the repo's standard
dispatch-cancelling method, see bench.py):
  - the full image step (bf16 / int8)
  - the vision tower alone and the text stack alone (bf16 / int8)
  - attention alone at the model's exact shapes (stays bf16 by design)
  - each matmul family at its true shapes, three ways:
      bf16, q8 (dynamic activation quant), q8_pre (activations
      pre-quantized) — the q8 vs q8_pre gap IS the dynamic-quant cost.

Writes PROFILE_r04.json next to the repo root and prints it.
Run on the real TPU: python scripts/profile_int8.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/morphik_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from morphik_core_tpu.models.colqwen.config import ColQwenConfig
    from morphik_core_tpu.models.colqwen.layers import attention, q8_matmul
    from morphik_core_tpu.models.colqwen.model import (
        colqwen_image_forward,
        init_colqwen_params,
        quantize_colqwen_params,
    )
    from morphik_core_tpu.models.colqwen.text import mrope_cos_sin, mrope_position_ids, text_forward
    from morphik_core_tpu.models.colqwen.vision import vision_forward, vision_rotary_cos_sin

    cfg = ColQwenConfig()
    B, HU, WU = 8, 20, 28
    S_p = HU * WU * cfg.vision.merge_unit  # 2240 patches
    n_units = HU * WU
    S_t = 3 + n_units + 2  # text seq of the image step (= len(ids) below)

    def chain(fn, n, *args):
        """Best-of-3 (t(2N)-t(N))/N step time for fn(*args)->array."""

        def make(m):
            @jax.jit
            def g(*a):
                def body(i, acc):
                    # perturb arg0 IN ITS OWN DTYPE: bf16 + f32 scalar would
                    # silently promote the whole input to f32 and distort perf
                    bump = (acc * 1e-30).astype(a[0].dtype)
                    out = fn(*((a[0] + bump),) + a[1:])
                    return acc + jnp.sum(out.astype(jnp.float32))

                return jax.lax.fori_loop(0, m, body, 0.0)

            return g

        gn, g2n = make(n), make(2 * n)
        float(gn(*args)); float(g2n(*args))
        best = []
        for _ in range(3):
            t0 = time.time(); float(gn(*args)); tn = time.time() - t0
            t0 = time.time(); float(g2n(*args)); t2n = time.time() - t0
            best.append(max((t2n - tn) / n, 1e-9))
        return min(best) * 1e3  # ms

    rep = {"batch": B, "grid": [HU, WU], "s_patches": S_p, "s_text": S_t}

    # ---- params ------------------------------------------------------------
    params = jax.jit(lambda k: init_colqwen_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    qparams = jax.jit(quantize_colqwen_params)(params)
    jax.block_until_ready(qparams)

    # ---- full image step ----------------------------------------------------
    patches = jax.random.normal(jax.random.PRNGKey(5), (B, S_p, cfg.vision.patch_input_dim), jnp.bfloat16)
    cos_v, sin_v = vision_rotary_cos_sin(HU, WU, cfg.vision)
    ids = np.array([7, 8, cfg.vision_start_token_id] + [cfg.image_token_id] * n_units
                   + [cfg.vision_end_token_id, 9], np.int32)
    input_ids = np.tile(ids[None], (B, 1))
    pos = mrope_position_ids(input_ids, cfg.image_token_id, [(1, HU, WU)] * B)
    cos_t, sin_t = mrope_cos_sin(pos, cfg.text)

    def full(p, prm):
        return colqwen_image_forward(
            prm, cfg, p, jnp.asarray(cos_v), jnp.asarray(sin_v),
            jnp.asarray(input_ids), jnp.asarray(cos_t), jnp.asarray(sin_t),
            h_units=HU, w_units=WU,
        )

    rep["full_bf16_ms"] = chain(full, 4, patches, params)
    rep["full_int8_ms"] = chain(full, 4, patches, qparams)

    # ---- vision tower alone --------------------------------------------------
    def vis(p, prm):
        return vision_forward(prm["visual"], p, jnp.asarray(cos_v), jnp.asarray(sin_v), HU, WU, cfg.vision)

    rep["vision_bf16_ms"] = chain(vis, 4, patches, params)
    rep["vision_int8_ms"] = chain(vis, 4, patches, qparams)

    # ---- text stack alone -----------------------------------------------------
    embeds = jax.random.normal(jax.random.PRNGKey(6), (B, S_t, cfg.text.hidden_size), jnp.bfloat16)
    tmask = jnp.ones((B, S_t), jnp.float32)

    def txt(e, prm):
        return text_forward(prm["text"], e, jnp.asarray(cos_t), jnp.asarray(sin_t), tmask, cfg.text)

    rep["text_bf16_ms"] = chain(txt, 4, embeds, params)
    rep["text_int8_ms"] = chain(txt, 4, embeds, qparams)

    # ---- attention alone (bf16 both modes) -----------------------------------
    nhv, hdv = cfg.vision.num_heads, cfg.vision.head_dim
    win = cfg.vision.window_units**2 * cfg.vision.merge_unit
    qv = jax.random.normal(jax.random.PRNGKey(7), (B * S_p // win, win, nhv, hdv), jnp.bfloat16)

    def vattn_win(q):
        return attention(q, q, q)

    per_win = chain(vattn_win, 16, qv)
    qf = jax.random.normal(jax.random.PRNGKey(8), (B, S_p, nhv, hdv), jnp.bfloat16)

    def vattn_full(q):
        return attention(q, q, q)

    per_full = chain(vattn_full, 8, qf)
    n_full = len(cfg.vision.fullatt_block_indexes)
    rep["vision_attn_ms"] = per_win * (cfg.vision.depth - n_full) + per_full * n_full

    nht, nkv, hdt = cfg.text.num_attention_heads, cfg.text.num_key_value_heads, cfg.text.head_dim
    qt = jax.random.normal(jax.random.PRNGKey(9), (B, S_t, nht, hdt), jnp.bfloat16)
    kt = jax.random.normal(jax.random.PRNGKey(10), (B, S_t, nkv, hdt), jnp.bfloat16)
    causal = jnp.tril(jnp.ones((S_t, S_t), bool))
    bias = jnp.where(causal[None, None], 0.0, -1e30).astype(jnp.float32)

    def tattn(q, k):
        return attention(q, k, k, bias=bias)

    rep["text_attn_ms"] = chain(tattn, 8, qt, kt) * cfg.text.num_hidden_layers

    # ---- matmul families: bf16 vs q8 vs q8 with pre-quantized activations ----
    def q8_pre(xq, xs, wq, ws):
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

    fam = {}
    vh, vi = cfg.vision.hidden_size, cfg.vision.intermediate_size
    th, ti = cfg.text.hidden_size, cfg.text.intermediate_size
    shapes = {
        "vis_qkv_proj": (B * S_p, vh, vh, 4 * cfg.vision.depth),
        "vis_gateup": (B * S_p, vh, vi, 2 * cfg.vision.depth),
        "vis_down": (B * S_p, vi, vh, cfg.vision.depth),
        "txt_qo": (B * S_t, th, th, 2 * cfg.text.num_hidden_layers),
        "txt_kv": (B * S_t, th, nkv * hdt, 2 * cfg.text.num_hidden_layers),
        "txt_gateup": (B * S_t, th, ti, 2 * cfg.text.num_hidden_layers),
        "txt_down": (B * S_t, ti, th, cfg.text.num_hidden_layers),
    }
    for name, (m, k_dim, n_dim, count) in shapes.items():
        x = jax.random.normal(jax.random.PRNGKey(11), (m, k_dim), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(12), (k_dim, n_dim), jnp.bfloat16)
        from morphik_core_tpu.models.colqwen.layers import quantize_weight_int8

        wq = jax.jit(quantize_weight_int8)(w)
        xf = x.astype(jnp.float32)
        xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.rint(xf / xs), -127, 127).astype(jnp.int8)

        def mm_bf16(a, ww):
            return a @ ww

        def mm_q8(a, ww, ss):
            return q8_matmul(a, ww, ss)

        iters = 16 if m * k_dim * n_dim < 2e11 else 8
        t_bf16 = chain(mm_bf16, iters, x, w)
        t_q8 = chain(mm_q8, iters, x, wq["q8"], wq["s"])

        def mm_q8p(a, ss, ww, ws):
            return q8_pre(a, ss, ww, ws)

        # chain() perturbs arg0; int8 arg0 breaks the 1e-30 chain trick, so
        # chain on the scales instead
        def mm_q8p_chain(ss, a, ww, ws):
            return q8_pre(a, ss, ww, ws)

        t_q8p = chain(mm_q8p_chain, iters, xs.astype(jnp.float32), xq, wq["q8"], wq["s"])
        fam[name] = {
            "shape": [m, k_dim, n_dim],
            "per_call_bf16_ms": round(t_bf16, 3),
            "per_call_q8_ms": round(t_q8, 3),
            "per_call_q8_prequant_ms": round(t_q8p, 3),
            "count_per_step": count,
            "step_bf16_ms": round(t_bf16 * count, 2),
            "step_q8_ms": round(t_q8 * count, 2),
            "step_q8_prequant_ms": round(t_q8p * count, 2),
            "bf16_tflops": round(2 * m * k_dim * n_dim / (t_bf16 / 1e3) / 1e12, 1),
            "q8_tops": round(2 * m * k_dim * n_dim / (t_q8 / 1e3) / 1e12, 1),
            "q8_prequant_tops": round(2 * m * k_dim * n_dim / (t_q8p / 1e3) / 1e12, 1),
        }
    rep["matmul_families"] = fam
    rep["derived"] = {
        "step_sum_matmul_bf16_ms": round(sum(f["step_bf16_ms"] for f in fam.values()), 1),
        "step_sum_matmul_q8_ms": round(sum(f["step_q8_ms"] for f in fam.values()), 1),
        "step_sum_matmul_q8_prequant_ms": round(
            sum(f["step_q8_prequant_ms"] for f in fam.values()), 1
        ),
        "dyn_quant_cost_ms": round(
            sum(f["step_q8_ms"] - f["step_q8_prequant_ms"] for f in fam.values()), 1
        ),
        "attn_total_ms": round(rep["vision_attn_ms"] + rep["text_attn_ms"], 1),
    }
    for k in ("full_bf16_ms", "full_int8_ms", "vision_bf16_ms", "vision_int8_ms",
              "text_bf16_ms", "text_int8_ms", "vision_attn_ms", "text_attn_ms"):
        rep[k] = round(rep[k], 2)

    out = Path(__file__).resolve().parent.parent / "PROFILE_r04.json"
    out.write_text(json.dumps(rep, indent=1))
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
