#!/usr/bin/env python3
"""Round-4 attention-precision A/B on the real chip.

PROFILE_r04.json: attention is ~57 ms of the 306 ms int8 step (vision
41.6 + text 15.1) and runs bf16 — the largest bf16 block left. This
measures the full image step (serving unit, int8 W8A8 weights) with
QK^T in bf16 vs int8 (layers.attention qk_int8: per-token/head scales,
int32 MXU accumulate), plus output fidelity between the variants
(token-embedding cosine + pairwise MaxSim rank agreement at full 3B
geometry, random bf16 weights — the same-weights drift measurement;
semantic fidelity gates run via evaluations/ on real checkpoints).

Writes AB_ATTN_r04.json. Run: python scripts/ab_attn_int8.py
"""

from __future__ import annotations

import dataclasses
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

    import morphik_core_tpu.models.colqwen.model as M
    from morphik_core_tpu.models.colqwen.config import ColQwenConfig
    from morphik_core_tpu.models.colqwen.model import (
        colqwen_image_forward,
        init_colqwen_params,
    )
    from morphik_core_tpu.models.colqwen.text import mrope_cos_sin, mrope_position_ids
    from morphik_core_tpu.models.colqwen.vision import vision_rotary_cos_sin

    cfg = ColQwenConfig()
    cfg_q8 = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, qk_int8=True),
        text=dataclasses.replace(cfg.text, qk_int8=True),
    )
    B, HU, WU = 8, 20, 28
    S_p = HU * WU * cfg.vision.merge_unit
    n_units = HU * WU

    params = jax.jit(lambda k: init_colqwen_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    qparams = jax.jit(M.quantize_colqwen_params)(params)
    jax.block_until_ready(qparams)

    patches = jax.random.normal(
        jax.random.PRNGKey(5), (B, S_p, cfg.vision.patch_input_dim), jnp.bfloat16
    )
    cos_v, sin_v = vision_rotary_cos_sin(HU, WU, cfg.vision)
    ids = np.array(
        [7, 8, cfg.vision_start_token_id] + [cfg.image_token_id] * n_units
        + [cfg.vision_end_token_id, 9], np.int32,
    )
    input_ids = np.tile(ids[None], (B, 1))
    pos = mrope_position_ids(input_ids, cfg.image_token_id, [(1, HU, WU)] * B)
    cos_t, sin_t = mrope_cos_sin(pos, cfg.text)
    const = (
        jnp.asarray(cos_v), jnp.asarray(sin_v), jnp.asarray(input_ids),
        jnp.asarray(cos_t), jnp.asarray(sin_t),
    )

    def step_ms(prm, c, iters=4):
        def make(n):
            @jax.jit
            def g(prm, p):
                def body(i, acc):
                    out = colqwen_image_forward(
                        prm, c, p + (acc * 1e-30).astype(p.dtype), *const,
                        h_units=HU, w_units=WU,
                    )
                    return acc + jnp.sum(out.astype(jnp.float32))

                return jax.lax.fori_loop(0, n, body, 0.0)

            return g

        gn, g2n = make(iters), make(2 * iters)
        float(gn(prm, patches)); float(g2n(prm, patches))
        best = []
        for _ in range(3):
            t0 = time.time(); float(gn(prm, patches)); tn = time.time() - t0
            t0 = time.time(); float(g2n(prm, patches)); t2n = time.time() - t0
            best.append(max((t2n - tn) / iters, 1e-9))
        return round(min(best) * 1e3, 2)

    rep = {"batch": B, "grid": [HU, WU]}
    rep["int8_attn_bf16_ms"] = step_ms(qparams, cfg)
    rep["int8_attn_int8_ms"] = step_ms(qparams, cfg_q8)
    rep["bf16_attn_int8_ms"] = step_ms(params, cfg_q8)
    for k in list(rep):
        if k.endswith("_ms"):
            rep[k.replace("_ms", "_pages_per_s")] = round(B / (rep[k] / 1e3), 2)

    # fidelity: same weights, attention bf16 vs int8 (full 3B geometry)
    fwd = jax.jit(
        lambda prm, p, c: colqwen_image_forward(
            prm, c, p, *const, h_units=HU, w_units=WU
        ),
        static_argnames=("c",),
    )
    e_ref = np.asarray(fwd(qparams, patches, cfg), np.float32)
    e_q8 = np.asarray(fwd(qparams, patches, cfg_q8), np.float32)
    num = (e_ref * e_q8).sum(-1)
    den = np.linalg.norm(e_ref, axis=-1) * np.linalg.norm(e_q8, axis=-1) + 1e-9
    rep["token_cosine_mean"] = round(float((num / den).mean()), 6)
    rep["token_cosine_p01"] = round(float(np.quantile(num / den, 0.01)), 6)

    def maxsim(qm, dm):
        return float(np.einsum("qd,td->qt", qm, dm).max(axis=1).sum())

    agree = 0
    for i in range(B):
        s_ref = [maxsim(e_ref[i], e_ref[j]) for j in range(B)]
        s_q8 = [maxsim(e_q8[i], e_q8[j]) for j in range(B)]
        agree += int(np.argmax(s_ref)) == int(np.argmax(s_q8))
        pr = np.corrcoef(s_ref, s_q8)[0, 1]
        rep.setdefault("maxsim_pearson_min", 1.0)
        rep["maxsim_pearson_min"] = round(min(rep["maxsim_pearson_min"], float(pr)), 6)
    rep["top1_agree"] = agree / B

    out = Path(__file__).resolve().parent.parent / "AB_ATTN_r04.json"
    out.write_text(json.dumps(rep, indent=1))
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
