#!/usr/bin/env python3
"""Round-4 follow-up A/B: is lax.scan over STACKED INT8 layer weights
eating the vision tower's int8 gains?

PROFILE_r04.json: vision int8 = 200.7 ms vs bf16 214.5 (only 6.4%
faster) while the text stack gets 1.49x. Standalone vision matmuls
measure 2-2.5x in int8, so something tower-structural absorbs the win.
Prime suspect: per-iteration dynamic-slice + relayout of the stacked
(L, K, N) int8 weights inside scan (int8 tiling is pickier than bf16).

Measures the vision tower 4 ways: {scan, unrolled} x {bf16, int8},
chained N-vs-2N. Writes AB_SCAN_r04.json.
"""

from __future__ import annotations

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
    from morphik_core_tpu.models.colqwen.model import init_colqwen_params, quantize_colqwen_params
    from morphik_core_tpu.models.colqwen import vision as V

    cfg = ColQwenConfig()
    B, HU, WU = 8, 20, 28
    S_p = HU * WU * cfg.vision.merge_unit

    params = jax.jit(lambda k: init_colqwen_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    qparams = jax.jit(quantize_colqwen_params)(params)
    jax.block_until_ready(qparams)

    patches = jax.random.normal(
        jax.random.PRNGKey(5), (B, S_p, cfg.vision.patch_input_dim), jnp.bfloat16
    )
    cos_v, sin_v = V.vision_rotary_cos_sin(HU, WU, cfg.vision)
    cos_v, sin_v = jnp.asarray(cos_v), jnp.asarray(sin_v)

    def vis_scan(prm, p):
        return V.vision_forward(prm["visual"], p, cos_v, sin_v, HU, WU, cfg.vision)

    def vis_unrolled(prm, p):
        vp = prm["visual"]
        x = p @ vp["patch_embed_w"]
        x = V.to_window_order(x, HU, WU, cfg.vision.window_units)
        for li in range(cfg.vision.depth):
            layer = jax.tree_util.tree_map(lambda w: w[li], vp["blocks"])
            is_full = li in cfg.vision.fullatt_block_indexes
            x = V._block(x, layer, jnp.asarray(is_full), cos_v, sin_v, cfg.vision)
        b, s, h = x.shape
        m = vp["merger"]
        y = V.rms_norm(x, m["ln_q"], 1e-6).reshape(b, s // cfg.vision.merge_unit,
                                                   cfg.vision.merge_unit * h)
        y = jax.nn.gelu(y @ m["fc1_w"] + m["fc1_b"], approximate=False)
        y = y @ m["fc2_w"] + m["fc2_b"]
        return V.from_window_order(y, HU, WU, cfg.vision.window_units)

    def step_ms(fn, prm, iters=4):
        def make(n):
            @jax.jit
            def g(prm, p):
                def body(i, acc):
                    out = fn(prm, p + (acc * 1e-30).astype(p.dtype))
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
    rep["vision_scan_bf16_ms"] = step_ms(vis_scan, params)
    rep["vision_scan_int8_ms"] = step_ms(vis_scan, qparams)
    rep["vision_unrolled_bf16_ms"] = step_ms(vis_unrolled, params)
    rep["vision_unrolled_int8_ms"] = step_ms(vis_unrolled, qparams)

    out = Path(__file__).resolve().parent.parent / "AB_SCAN_r04.json"
    out.write_text(json.dumps(rep, indent=1))
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
