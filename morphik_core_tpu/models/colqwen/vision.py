"""Qwen2.5-VL vision tower, TPU-native.

Behavioral parity with the torch reference implementation
(transformers Qwen2_5_VisionTransformerPretrainedModel; used by the
reference via colpali_engine, reference
core/embedding/colpali_embedding_model.py:47-56) with a TPU-first
execution design:

- The torch implementation concatenates ragged images into one varlen
  sequence and uses flash-attn cu_seqlens. Here every page is resized
  to a STATIC grid bucket whose llm-grid dims are multiples of the
  window size (4 units = 112 px), so:
    * window attention = a pure reshape into (num_windows, 64, d)
      batched attention — no masks, no gathers, MXU-dense;
    * full attention  = one (S, S) attention over the whole page;
    * the window permutation and its inverse are reshape/transposes,
      never dynamic scatter.
- Blocks run under `lax.scan` over stacked layer params with a
  per-layer `is_full_attention` flag (`lax.cond` picks the branch),
  giving one compiled block body for all 32 layers.
- bf16 matmuls, fp32 norms/softmax/rotary.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.colqwen.config import VisionConfig
from morphik_core_tpu.models.colqwen.layers import (
    apply_rotary,
    attention,
    linear,
    linear_multi,
    rms_norm,
    swiglu,
)


# ---------------------------------------------------------------------------
# Host-side precompute (numpy, cached per grid)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def vision_rotary_cos_sin(h_units: int, w_units: int, cfg: VisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(S, head_dim) cos/sin for every patch, in WINDOW order.

    Patch sequence order is (h_unit, w_unit, merge_h, merge_w) — the HF
    processor's flatten order — then permuted to window order
    (h_win, w_win, unit_h, unit_w, merge_h, merge_w).
    """
    m = cfg.spatial_merge_size
    wu = cfg.window_units
    if h_units % wu or w_units % wu or h_units == 0 or w_units == 0:
        raise ValueError(
            f"grid ({h_units},{w_units}) must be positive multiples of window_units={wu} "
            f"(resize images to multiples of {wu * m * cfg.patch_size} px)"
        )
    h, w = h_units * m, w_units * m
    hpos = np.arange(h)[:, None].repeat(w, 1)
    wpos = np.arange(w)[None, :].repeat(h, 0)
    # (h_units, w_units, m, m) patch order
    def unit_order(x):
        return x.reshape(h_units, m, w_units, m).transpose(0, 2, 1, 3)

    hpos, wpos = unit_order(hpos), unit_order(wpos)
    # window order over units
    def win_order(x):
        return (
            x.reshape(h_units // wu, wu, w_units // wu, wu, m, m)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(-1)
        )

    hpos, wpos = win_order(hpos), win_order(wpos)
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, half, 2, dtype=np.float64) / half))
    freqs = np.concatenate(
        [hpos[:, None] * inv_freq[None, :], wpos[:, None] * inv_freq[None, :]], axis=1
    )  # (S, half)
    emb = np.concatenate([freqs, freqs], axis=1)  # (S, head_dim)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def to_window_order(x: jax.Array, h_units: int, w_units: int, wu: int) -> jax.Array:
    """(B, S, ...) patch-order -> window-order (pure reshape/transpose).
    S = h_units * w_units * merge_unit; trailing dims preserved."""
    b, s = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    mu = s // (h_units * w_units)
    x = x.reshape(b, h_units // wu, wu, w_units // wu, wu, mu, *rest)
    x = jnp.moveaxis(x, 3, 2)  # (B, hw, ww, wu, wu, mu, ...)
    return x.reshape(b, s, *rest)


def from_window_order(x: jax.Array, h_units: int, w_units: int, wu: int) -> jax.Array:
    """Inverse of `to_window_order` at MERGED-unit granularity:
    (B, U, ...) window-order units -> original unit order."""
    b, u = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    x = x.reshape(b, h_units // wu, w_units // wu, wu, wu, *rest)
    x = jnp.moveaxis(x, 2, 3)  # (B, hw, wu, ww, wu, ...)
    return x.reshape(b, u, *rest)


# ---------------------------------------------------------------------------
# Parameter init / structure
# ---------------------------------------------------------------------------


def init_vision_params(key: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    h, ih, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    depth = cfg.depth

    def nrm(k, *shape, scale=0.02):
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dtype)

    kq, kk, kv = jax.random.split(ks[0], 3)
    blocks = {
        "norm1": jnp.ones((depth, h), dtype),
        "norm2": jnp.ones((depth, h), dtype),
        "q_w": nrm(kq, depth, h, h),
        "q_b": jnp.zeros((depth, h), dtype),
        "k_w": nrm(kk, depth, h, h),
        "k_b": jnp.zeros((depth, h), dtype),
        "v_w": nrm(kv, depth, h, h),
        "v_b": jnp.zeros((depth, h), dtype),
        "proj_w": nrm(ks[1], depth, h, h),
        "proj_b": jnp.zeros((depth, h), dtype),
        "gate_w": nrm(ks[2], depth, h, ih),
        "gate_b": jnp.zeros((depth, ih), dtype),
        "up_w": nrm(ks[3], depth, h, ih),
        "up_b": jnp.zeros((depth, ih), dtype),
        "down_w": nrm(ks[4], depth, ih, h),
        "down_b": jnp.zeros((depth, h), dtype),
    }
    merger_hidden = h * cfg.merge_unit
    return {
        "patch_embed_w": nrm(ks[5], cfg.patch_input_dim, h),
        "blocks": blocks,
        "merger": {
            "ln_q": jnp.ones((h,), dtype),
            "fc1_w": nrm(ks[6], merger_hidden, merger_hidden),
            "fc1_b": jnp.zeros((merger_hidden,), dtype),
            "fc2_w": nrm(ks[7], merger_hidden, cfg.out_hidden_size),
            "fc2_b": jnp.zeros((cfg.out_hidden_size,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _block(x, layer, is_full, cos, sin, cfg: VisionConfig):
    """One vision block. x: (B, S, H) in window order."""
    b, s, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    win = cfg.window_units**2 * cfg.merge_unit  # patches per window (64)

    res = x
    y = rms_norm(x, layer["norm1"], cfg.rms_norm_eps)
    q, k, v = linear_multi(
        y,
        (layer["q_w"], layer["k_w"], layer["v_w"]),
        (layer["q_b"], layer["k_b"], layer["v_b"]),
    )
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nh, hd)
    v = v.reshape(b, s, nh, hd)
    q, k = apply_rotary(q, k, cos[None, :, None, :], sin[None, :, None, :])

    # calibrated static qk scales (models/colqwen/calibrate.py): a (2,)
    # per-layer leaf attached only on the unrolled int8 tower; absent ->
    # dynamic per-token scales (or pure bf16 when qk_int8 is off)
    qk_as = layer.get("attn_qk_as")
    qk_static = (qk_as[0], qk_as[1]) if qk_as is not None else None

    def full_attn(args):
        q, k, v = args
        return attention(q, k, v, qk_int8=cfg.qk_int8, qk_static=qk_static)

    def window_attn(args):
        q, k, v = args
        def to_win(t):
            return t.reshape(b * s // win, win, nh, hd)
        o = attention(to_win(q), to_win(k), to_win(v), qk_int8=cfg.qk_int8, qk_static=qk_static)
        return o.reshape(b, s, nh, hd)

    if isinstance(is_full, bool):  # static (unrolled int8 path): no cond HLO
        o = full_attn((q, k, v)) if is_full else window_attn((q, k, v))
    else:
        o = jax.lax.cond(is_full, full_attn, window_attn, (q, k, v))
    x = res + linear(o.reshape(b, s, h), layer["proj_w"], layer["proj_b"])

    y = rms_norm(x, layer["norm2"], cfg.rms_norm_eps)
    x = x + swiglu(
        y,
        layer["gate_w"], layer["up_w"], layer["down_w"],
        layer["gate_b"], layer["up_b"], layer["down_b"],
    )
    return x


def vision_forward(
    params: dict,
    patches: jax.Array,  # (B, S, patch_input_dim), S = h_units*w_units*merge_unit
    cos: jax.Array,  # (S, head_dim) — window order
    sin: jax.Array,
    h_units: int,
    w_units: int,
    cfg: VisionConfig,
) -> jax.Array:
    """Returns merged visual embeddings (B, U, out_hidden) in ORIGINAL
    (row-major llm-grid) unit order. Requires h_units % 4 == w_units % 4 == 0."""
    wu = cfg.window_units
    if h_units % wu or w_units % wu:
        raise ValueError(f"grid ({h_units},{w_units}) must be multiples of window_units={wu}")
    x = patches @ params["patch_embed_w"]  # (B, S, H)
    x = to_window_order(x, h_units, w_units, wu)

    if isinstance(params["blocks"].get("q_w"), dict):
        # int8 (W8A8) mode runs UNROLLED with static attention branches:
        # scan's per-iteration dynamic-slice of the stacked int8 weights
        # costs ~10 ms/step on the 3B geometry (AB_SCAN_r04.json:
        # 200.3 ms scan vs 189.6 unrolled), while bf16 scan remains the
        # fast structure (round-2 A/B; unrolled bf16 regresses).
        for li in range(cfg.depth):
            layer = jax.tree_util.tree_map(lambda w: w[li], params["blocks"])
            x = _block(x, layer, li in (cfg.fullatt_block_indexes or ()), cos, sin, cfg)
    else:
        full_flags = np.zeros((cfg.depth,), dtype=bool)
        if cfg.fullatt_block_indexes:
            full_flags[np.asarray(cfg.fullatt_block_indexes)] = True
        full_flags = jnp.asarray(full_flags)

        def body(carry, inp):
            layer, is_full = inp
            return _block(carry, layer, is_full, cos, sin, cfg), None

        x, _ = jax.lax.scan(body, x, (params["blocks"], full_flags))

    # merger: group 4 consecutive patches (one merge unit)
    b, s, h = x.shape
    m = params["merger"]
    y = rms_norm(x, m["ln_q"], 1e-6).reshape(b, s // cfg.merge_unit, cfg.merge_unit * h)
    y = jax.nn.gelu(y @ m["fc1_w"] + m["fc1_b"], approximate=False)
    y = y @ m["fc2_w"] + m["fc2_b"]  # (B, U, out_hidden)
    return from_window_order(y, h_units, w_units, wu)
