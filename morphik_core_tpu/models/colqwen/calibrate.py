"""Static activation-scale calibration for the int8 vision tower.

The W8A8 serving mode quantizes activations DYNAMICALLY (per-token
max-abs computed on the fly, layers.quantize_act_int8) — an extra full
read of every activation tensor per matmul site. The round-4 profile
attributed 52.9 ms/step to those passes (PROFILE_r04.json
`derived.dyn_quant_cost_ms`), concentrated in the vision tower, which
gets only 1.07x from W8A8 vs the text tower's 1.49x.

This module calibrates STATIC per-(layer, site) activation scales on a
few representative page batches and attaches them to the quantized
weight leaves as `"as"` — `layers.linear` then skips the max-abs pass
entirely. Vision-only by design: the int8 vision tower runs UNROLLED
(AB_SCAN_r04), so each quantized site is a distinct trace point and the
capture hook sees exactly 4 events per block in deterministic order
(qkv, attn-proj, gate/up, down); the text tower runs under lax.scan
where trace-order capture would leak tracers, and its dynamic quant is
already cheap relative to its matmuls.

Reference precision context: the reference serves ColQwen in bf16
(core/embedding/colpali_embedding_model.py:37-61); both int8 modes are
levers beyond it, gated by evaluations/fidelity_eval.py.
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from morphik_core_tpu.models.colqwen import layers
from morphik_core_tpu.models.colqwen.config import VisionConfig
from morphik_core_tpu.models.colqwen.vision import vision_forward, vision_rotary_cos_sin

#: capture-column -> quantized leaf names sharing that activation
_SITE_COLUMNS = (("q_w", "k_w", "v_w"), ("proj_w",), ("gate_w", "up_w"), ("down_w",))


def capture_vision_act_maxes(
    params_visual: dict,
    u8_batches: List[np.ndarray],
    h_units: int,
    w_units: int,
    cfg: VisionConfig,
) -> tuple:
    """Run calibration batches through the (already int8-quantized,
    unrolled) vision tower with dynamic quantization, capturing per-site
    max|activation| AND per-attention-site (max|q|, max|k|) post-rotary.
    Returns the element-wise max over batches as a pair:
    (act (depth, 4) — columns qkv, proj, gate/up, down; qk (depth, 2))."""
    if not isinstance(params_visual["blocks"].get("q_w"), dict):
        raise ValueError("vision params are not int8-quantized — nothing to calibrate")
    from morphik_core_tpu.models.colqwen.model import expand_patches_u8

    cos, sin = vision_rotary_cos_sin(h_units, w_units, cfg)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    @jax.jit
    def fwd(pv, u8, cos, sin):
        layers._ACT_CAPTURE = cap = []
        layers._QK_CAPTURE = qk_cap = []
        try:
            vision_forward(pv, expand_patches_u8(u8, jnp.bfloat16), cos, sin,
                           h_units, w_units, cfg)
        finally:
            layers._ACT_CAPTURE = None
            layers._QK_CAPTURE = None
        return jnp.stack(cap), jnp.stack(qk_cap)

    overall = overall_qk = None
    for u8 in u8_batches:
        maxes, qk = fwd(params_visual, jnp.asarray(u8), cos, sin)
        maxes, qk = np.asarray(maxes), np.asarray(qk)
        overall = maxes if overall is None else np.maximum(overall, maxes)
        overall_qk = qk if overall_qk is None else np.maximum(overall_qk, qk)
    n_sites = len(_SITE_COLUMNS)
    assert overall.shape[0] == cfg.depth * n_sites, (overall.shape, cfg.depth)
    assert overall_qk.shape == (cfg.depth, 2), overall_qk.shape
    return overall.reshape(cfg.depth, n_sites), overall_qk


def render_calibration_pages(n: int = 16, seed: int = 0, size=(560, 720)) -> list:
    """Deterministic synthetic text pages for startup calibration —
    dense mixed-case technical text covers the activation range real
    document pages hit (white background + black glyphs is the serving
    distribution; the margin + fidelity gate absorb the rest)."""
    from PIL import Image, ImageDraw  # noqa: PLC0415

    vocab = (
        "alpha bridge casing dynamo ember flux gasket helix ion joule kelvin "
        "lumen motor nacelle orbit piston quartz rotor stator torque valve "
        "winding yoke zenith SPEC-9174 Nm kW rpm 61400-25 IEC"
    ).split()
    pages = []
    for s in range(n):
        r = np.random.default_rng(seed * 1000 + s)
        img = Image.new("RGB", size, "white")
        d = ImageDraw.Draw(img)
        y = 8
        while y < size[1] - 24:
            d.text(
                (int(r.integers(6, 80)), y),
                " ".join(r.choice(vocab, r.integers(3, 10))),
                fill="black",
            )
            y += int(r.integers(14, 24))
        pages.append(img)
    return pages


def calibrate_model_from_rendered_pages(
    model, n_pages: int = 16, seed: int = 0, margin: float = 1.05, batch: int = 8
) -> None:
    """Startup-path calibration: render deterministic pages, preprocess
    into the dominant grid bucket, and attach static scales via
    `model.calibrate_static_act_scales`. Scales are per-(layer, site)
    activation ranges — they transfer across grid buckets (the range is
    set by layernorm'd features, not token count), so one bucket's
    calibration serves every bucket."""
    from collections import Counter

    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8

    prepped = [preprocess_image_u8(im) for im in render_calibration_pages(n_pages, seed)]
    grid = Counter(g for _, g in prepped).most_common(1)[0][0]
    u8 = np.stack([p for p, g in prepped if g == grid])
    batches = [u8[s : s + batch] for s in range(0, len(u8), batch) if len(u8[s : s + batch])]
    model.calibrate_static_act_scales(batches, grid[0], grid[1], margin=margin)


def attach_vision_act_scales(
    params_visual: dict, maxes: np.ndarray, margin: float = 1.05, qk_maxes=None
) -> dict:
    """Return a params['visual'] copy whose quantized block leaves carry
    static activation scales: as[l] = margin * max|x|_l / 127 (a (depth,)
    array; the unrolled per-layer slice hands `linear` a scalar).
    `margin` absorbs activations slightly outside the calibration set —
    anything beyond it clips at ±127, which the fidelity gate measures.
    qk_maxes (depth, 2), when given, additionally attaches static qk
    attention scales as the `attn_qk_as` block leaf — inert unless
    cfg.qk_int8 (model.attention_precision='int8') turns the int8 QK^T
    contraction on."""
    out = dict(params_visual)
    blocks = dict(params_visual["blocks"])
    for col, names in enumerate(_SITE_COLUMNS):
        scale = jnp.asarray(
            np.maximum(maxes[:, col] * margin / 127.0, 1e-8), jnp.float32
        )
        for name in names:
            leaf = dict(blocks[name])
            leaf["as"] = scale
            blocks[name] = leaf
    if qk_maxes is not None:
        blocks["attn_qk_as"] = jnp.asarray(
            np.maximum(np.asarray(qk_maxes) * margin / 127.0, 1e-8), jnp.float32
        )
    out["blocks"] = blocks
    return out
