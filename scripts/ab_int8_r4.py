#!/usr/bin/env python3
"""Round-4 int8 A/B on the real chip (VERDICT r3 item 2 follow-through).

PROFILE_r04.json attributed the int8 residual to (a) dynamic
activation-quant passes repeated per matmul over the same input and
(b) txt_down (K=11008) where W8A8 measured SLOWER than bf16 standalone.
This script measures the full image step (the serving unit) for:

  1. bf16 reference
  2. int8 with quantize-once linear_multi (the code as of this round)
  3. int8 as (2) but with text down_w left in bf16
  4. int8 as (3) but with vision down_w also left in bf16

via the repo-standard chained N-vs-2N fori_loop pairs. Writes
AB_INT8_r04.json. Run: python scripts/ab_int8_r4.py
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

    import morphik_core_tpu.models.colqwen.model as M
    from morphik_core_tpu.models.colqwen.config import ColQwenConfig
    from morphik_core_tpu.models.colqwen.model import colqwen_image_forward, init_colqwen_params
    from morphik_core_tpu.models.colqwen.text import mrope_cos_sin, mrope_position_ids
    from morphik_core_tpu.models.colqwen.vision import vision_rotary_cos_sin

    cfg = ColQwenConfig()
    B, HU, WU = 8, 20, 28
    S_p = HU * WU * cfg.vision.merge_unit
    n_units = HU * WU

    params = jax.jit(lambda k: init_colqwen_params(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)

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

    def step_ms(prm, iters=4):
        def make(n):
            @jax.jit
            def g(prm, p):
                def body(i, acc):
                    out = colqwen_image_forward(
                        prm, cfg, p + (acc * 1e-30).astype(p.dtype), *const,
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

    rep = {"batch": B, "grid": [HU, WU], "baseline_r04_profile_int8_ms": 306.63}

    rep["bf16_ms"] = step_ms(params)

    q_text_full, q_vis_full = M._Q8_TEXT, M._Q8_VISION
    variants = {
        "int8_quant_once": (q_text_full, q_vis_full),
        "int8_qo_txtdown_bf16": (
            tuple(k for k in q_text_full if k != "down_w"), q_vis_full,
        ),
        "int8_qo_bothdown_bf16": (
            tuple(k for k in q_text_full if k != "down_w"),
            tuple(k for k in q_vis_full if k != "down_w"),
        ),
    }
    for name, (qt, qv) in variants.items():
        M._Q8_TEXT, M._Q8_VISION = qt, qv
        qp = jax.jit(M.quantize_colqwen_params)(params)
        jax.block_until_ready(qp)
        rep[name + "_ms"] = step_ms(qp)
        for arr in jax.tree_util.tree_leaves(qp):
            arr.delete()
        M._Q8_TEXT, M._Q8_VISION = q_text_full, q_vis_full

    for k, v in list(rep.items()):
        if k.endswith("_ms") and k != "bf16_ms":
            rep[k.replace("_ms", "_pages_per_s")] = round(B / (v / 1e3), 2)
    rep["bf16_pages_per_s"] = round(B / (rep["bf16_ms"] / 1e3), 2)

    out = Path(__file__).resolve().parent.parent / "AB_INT8_r04.json"
    out.write_text(json.dumps(rep, indent=1))
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
