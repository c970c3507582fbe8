"""Qwen2.5 text decoder with multimodal RoPE (mrope), TPU-native.

Parity target: transformers Qwen2_5_VLTextModel (the LM the reference
runs under colpali_engine). Design notes:

- 3D (t/h/w) position ids are computed host-side in numpy
  (`mrope_position_ids`) and turned into final per-position cos/sin
  tables (`mrope_cos_sin`), so the jitted decoder applies plain
  rotate-half rotary — no integer gymnastics on device.
- Layers run under one `lax.scan` over stacked params.
- GQA (2 kv heads on the 3B), causal + padding mask, fp32 softmax/norms.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.colqwen.config import TextConfig
from morphik_core_tpu.models.colqwen.layers import (
    apply_rotary,
    attention,
    linear,
    linear_multi,
    rms_norm,
    swiglu,
)


# ---------------------------------------------------------------------------
# Host-side mrope position math (numpy)
# ---------------------------------------------------------------------------


def mrope_position_ids(
    input_ids: np.ndarray,
    image_token_id: int,
    grids: Sequence[Optional[Tuple[int, int, int]]],
    attention_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """3D rope indices, (3, B, S).

    Semantics of Qwen2.5-VL `get_rope_index`: text tokens advance all
    three channels together; an image's tokens share t = start, while
    h/w sweep the llm grid offset by start; the next text token resumes
    at start + max(t_len, h_len, w_len). grids[b] = (t, h_units, w_units)
    for the (single) image in row b, or None for text-only.
    """
    b, s = input_ids.shape
    out = np.zeros((3, b, s), dtype=np.int64)
    for i in range(b):
        ids = input_ids[i]
        valid = np.ones(s, dtype=bool) if attention_mask is None else attention_mask[i].astype(bool)
        pos = 0
        j = 0
        while j < s:
            if not valid[j]:
                out[:, i, j] = 1  # padded positions (value irrelevant, masked out)
                j += 1
                continue
            if ids[j] == image_token_id and grids[i] is not None:
                t, h, w = grids[i]
                n = t * h * w
                tt = np.repeat(np.arange(t), h * w)
                hh = np.tile(np.repeat(np.arange(h), w), t)
                ww = np.tile(np.tile(np.arange(w), h), t)
                out[0, i, j : j + n] = pos + tt
                out[1, i, j : j + n] = pos + hh
                out[2, i, j : j + n] = pos + ww
                pos = pos + max(t, h, w)
                j += n
            else:
                out[:, i, j] = pos
                pos += 1
                j += 1
    return out


def mrope_cos_sin(
    position_ids: np.ndarray, cfg: TextConfig
) -> Tuple[np.ndarray, np.ndarray]:
    """(3, B, S) -> interleaved-section cos/sin of shape (B, S, head_dim)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    freqs = position_ids[..., None].astype(np.float64) * inv_freq  # (3, B, S, hd/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (3, B, S, hd)
    cos3, sin3 = np.cos(emb), np.sin(emb)
    # stitch t/h/w sections along the feature dim: the head_dim axis is
    # split into chunks [*mrope_section, *mrope_section] (each half of the
    # duplicated freqs), chunk i taken from channel i % 3.
    sections = list(cfg.mrope_section) + list(cfg.mrope_section)
    cos_parts, sin_parts = [], []
    start = 0
    for idx, sec in enumerate(sections):
        end = start + sec
        ch = idx % 3
        cos_parts.append(cos3[ch, ..., start:end])
        sin_parts.append(sin3[ch, ..., start:end])
        start = end
    cos = np.concatenate(cos_parts, axis=-1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=-1).astype(np.float32)
    return cos, sin


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_text_params(key: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    h, ih = cfg.hidden_size, cfg.intermediate_size
    nl, nh, nkv, hd = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def nrm(k, *shape, scale=0.02):
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dtype)

    layers = {
        "input_ln": jnp.ones((nl, h), dtype),
        "post_ln": jnp.ones((nl, h), dtype),
        "q_w": nrm(ks[0], nl, h, nh * hd),
        "q_b": jnp.zeros((nl, nh * hd), dtype),
        "k_w": nrm(ks[1], nl, h, nkv * hd),
        "k_b": jnp.zeros((nl, nkv * hd), dtype),
        "v_w": nrm(ks[2], nl, h, nkv * hd),
        "v_b": jnp.zeros((nl, nkv * hd), dtype),
        "o_w": nrm(ks[3], nl, nh * hd, h),
        "gate_w": nrm(ks[4], nl, h, ih),
        "up_w": nrm(ks[5], nl, h, ih),
        "down_w": nrm(ks[6], nl, ih, h),
    }
    return {
        "embed": nrm(ks[7], cfg.vocab_size, h),
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _decoder_block(x, layer, cos, sin, bias, cfg: TextConfig):
    b, s, h = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    res = x
    y = rms_norm(x, layer["input_ln"], cfg.rms_norm_eps)
    q, k, v = linear_multi(
        y,
        (layer["q_w"], layer["k_w"], layer["v_w"]),
        (layer["q_b"], layer["k_b"], layer["v_b"]),
    )
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nkv, hd)
    v = v.reshape(b, s, nkv, hd)
    q, k = apply_rotary(q, k, cos[:, :, None, :], sin[:, :, None, :])
    o = attention(q, k, v, bias=bias, qk_int8=cfg.qk_int8)
    x = res + linear(o.reshape(b, s, nh * hd), layer["o_w"])

    y = rms_norm(x, layer["post_ln"], cfg.rms_norm_eps)
    x = x + swiglu(y, layer["gate_w"], layer["up_w"], layer["down_w"])
    return x


def text_forward(
    params: dict,
    inputs_embeds: jax.Array,  # (B, S, H)
    cos: jax.Array,  # (B, S, head_dim)
    sin: jax.Array,
    attention_mask: jax.Array,  # (B, S) 1 = valid
    cfg: TextConfig,
) -> jax.Array:
    """Returns final-norm hidden states (B, S, H)."""
    b, s, _ = inputs_embeds.shape
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))
    mask = causal[None, None, :, :] & (attention_mask[:, None, None, :] > 0)
    # additive bias computed once; loop-invariant across the layer scan
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)

    def body(carry, layer):
        return _decoder_block(carry, layer, cos, sin, bias, cfg), None

    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return rms_norm(x, params["norm"], cfg.rms_norm_eps)
