#!/usr/bin/env python3
"""A/B: calibrated STATIC activation scales for the int8 vision tower
(round-5 verdict item 2).

The round-4 profile attributed 52.9 ms/step to dynamic per-token
activation-quant passes (PROFILE_r04.json `derived.dyn_quant_cost_ms`),
concentrated in the vision tower. This measures, on the real chip with
3B geometry and the production serving step (vision unrolled int8 +
bf16 attention + text int8 scan):

  A. pages/s with dynamic activation quant (shipped round-4 default)
  B. pages/s with calibrated static scales attached (calibration = 4
     rendered page batches, margin 1.05)
  B2. pages/s with static scales AND int8 QK^T attention using static
     q/k scales (the round-4 rejected lever re-opened: dynamic per-token
     qk quant cost more than the MXU saved, AB_ATTN_r04.json — static
     scalars remove those passes)
  C. embedding drift static-vs-dynamic on held-out pages (cosine +
     production top-1 agreement through a small index) — a cheap
     pre-gate before re-running the full fidelity eval.

Writes AB_STATIC_r05.json.
Run (real TPU, ~6 min): python scripts/ab_static_act.py
CPU smoke:              python scripts/ab_static_act.py --small
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB = (
    "alpha bridge casing dynamo ember flux gasket helix ion joule kelvin lumen "
    "motor nacelle orbit piston quartz rotor stator torque valve winding yoke zenith"
).split()


def render_page(seed: int, w=560, h=720):
    from PIL import Image, ImageDraw

    r = np.random.default_rng(seed)
    img = Image.new("RGB", (w, h), "white")
    d = ImageDraw.Draw(img)
    y = 10
    while y < h - 24:
        d.text((int(r.integers(6, 80)), y), " ".join(r.choice(VOCAB, r.integers(3, 10))), fill="black")
        y += int(r.integers(14, 24))
    return img


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--margin", type=float, default=1.05)
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).resolve().parent.parent / "AB_STATIC_r05.json")
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/morphik_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp

    from morphik_core_tpu.models.colqwen import ColQwenConfig, ColQwenModel
    from morphik_core_tpu.models.colqwen.model import init_colqwen_params
    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8

    cfg = ColQwenConfig.tiny() if args.small else ColQwenConfig()
    B = args.batch
    t0 = time.time()
    params = jax.jit(lambda k: init_colqwen_params(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = ColQwenModel(cfg, params, matmul_precision="int8")
    del params
    print(f"model init: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # pages: calibration set disjoint from the timing/holdout set
    calib_imgs = [render_page(1000 + s) for s in range(2 * B)]
    hold_imgs = [render_page(2000 + s) for s in range(2 * B)]
    prepped = [preprocess_image_u8(im) for im in calib_imgs + hold_imgs]
    grid = prepped[0][1]
    assert all(g == grid for _, g in prepped), "one grid bucket expected"
    hu, wu = grid
    u8 = np.stack([p for p, _ in prepped])
    calib_batches = [u8[:B], u8[B : 2 * B]]
    hold = u8[2 * B :]

    def measure(tag: str) -> dict:
        model.embed_image_batch(hold[:B], hu, wu)  # compile
        times = []
        for r in range(args.reps):
            a = hold[:B].copy()
            a[..., r % a.shape[-1]] ^= np.uint8(r + 1)  # fresh bytes per rep
            t0 = time.perf_counter()
            np.asarray(model.embed_image_batch(a, hu, wu, as_device=True)[0])
            times.append(time.perf_counter() - t0)
        step_s = float(np.median(times))
        out = {"step_s": round(step_s, 4), "pages_per_s": round(B / step_s, 2)}
        print(f"{tag}: {out}", file=sys.stderr, flush=True)
        return out

    dyn_emb = [np.asarray(e, np.float32) for e in model.embed_image_batch(hold, hu, wu)]
    res_dyn = measure("dynamic")

    t0 = time.time()
    model.calibrate_static_act_scales(calib_batches, hu, wu, margin=args.margin)
    calib_s = time.time() - t0
    stat_emb = [np.asarray(e, np.float32) for e in model.embed_image_batch(hold, hu, wu)]
    res_stat = measure("static")

    # B2: int8 QK^T with the calibrated static q/k scales (same params —
    # the attn_qk_as leaf is already attached; only the config flips)
    import dataclasses

    qk_cfg = dataclasses.replace(cfg, vision=dataclasses.replace(cfg.vision, qk_int8=True))
    qk_model = ColQwenModel(qk_cfg, model.params, matmul_precision="bf16")
    qk_model.matmul_precision = "int8"  # params already quantized+calibrated
    qk_model._image_fn_cache.clear()
    saved_model, model = model, qk_model
    qk_emb = [np.asarray(e, np.float32) for e in model.embed_image_batch(hold, hu, wu)]
    res_qk = measure("static+int8attn")
    model = saved_model

    # C: drift on held-out pages (cosine per token + retrieval agreement)
    cosines, qk_cosines = [], []
    for a, b, c3 in zip(dyn_emb, stat_emb, qk_emb):
        c = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
        cosines.append(float(np.mean(c)))
        cq = np.sum(a * c3, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(c3, axis=-1) + 1e-9)
        qk_cosines.append(float(np.mean(cq)))
    # top-1 agreement: score every holdout page against every other
    def maxsim_mat(qs, ds):
        s = np.zeros((len(qs), len(ds)), np.float32)
        for i, q in enumerate(qs):
            for j, d in enumerate(ds):
                s[i, j] = np.sum(np.max(q @ d.T, axis=1))
        return s

    agree = float(
        np.mean(
            maxsim_mat(dyn_emb, dyn_emb).argmax(1) == maxsim_mat(stat_emb, stat_emb).argmax(1)
        )
    )

    result = {
        "geometry": "tiny" if args.small else "3b",
        "batch": B,
        "margin": args.margin,
        "calibration_batches": len(calib_batches),
        "calibration_s": round(calib_s, 1),
        "dynamic": res_dyn,
        "static": res_stat,
        "static_int8_attn": res_qk,
        "speedup": round(res_dyn["step_s"] / res_stat["step_s"], 3),
        "speedup_int8_attn": round(res_dyn["step_s"] / res_qk["step_s"], 3),
        "holdout_token_cosine_mean": round(float(np.mean(cosines)), 4),
        "holdout_token_cosine_min": round(float(np.min(cosines)), 4),
        "holdout_token_cosine_int8_attn_mean": round(float(np.mean(qk_cosines)), 4),
        "holdout_token_cosine_int8_attn_min": round(float(np.min(qk_cosines)), 4),
        "holdout_self_top1_agreement": agree,
        "backend": jax.default_backend(),
        "small": args.small,
    }
    print(json.dumps(result), flush=True)
    if not args.small:
        args.out.write_text(json.dumps(result, indent=1))
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
