"""Shared transformer building blocks (functional JAX).

Numerics follow the Qwen2.5-VL semantics (RMSNorm in fp32, rotary in
fp32, fp32 softmax) so bf16 forwards stay close to the torch reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(x: jax.Array, w, b=None) -> jax.Array:
    """Matmul that dispatches on the weight's form: a plain array runs
    bf16/f32 on the MXU; a quantized leaf ({"q8": int8 (K, N),
    "s": f32 (N,)}) runs the W8A8 path (`q8_matmul`). Lets the same
    tower code serve both precision modes."""
    if isinstance(w, dict):
        return q8_matmul(x, w["q8"], w["s"], b, w.get("as"))
    out = x @ w
    return out if b is None else out + b


# Calibration hook (models/colqwen/calibrate.py): when set to a list,
# every dynamic activation quantization also appends max|x| — trace-order
# capture of per-site activation ranges for STATIC scale calibration.
# Only ever enabled around the UNROLLED int8 vision tower (capturing
# inside a lax.scan body would leak tracers).
_ACT_CAPTURE = None

# Same idea for attention q/k ranges (one [max|q|, max|k|] pair per
# attention site, post-rotary): feeds STATIC qk quantization scales for
# the int8 QK^T path. Round 4 measured dynamic per-token qk quant as a
# net loss (AB_ATTN_r04.json — the quant passes cost more than the MXU
# saves); static scales remove those passes, re-opening the lever.
_QK_CAPTURE = None


def quantize_act_int8(x: jax.Array, a_scale=None):
    """Symmetric int8 quantization of activations.

    a_scale=None — per-token DYNAMIC scales (max|x| computed on the fly;
    an extra full read of the activation tensor per site). a_scale set —
    a calibrated STATIC per-tensor scale: the max-abs pass disappears and
    the epilogue is a pure clip/round (round-5 verdict item 2; the
    round-4 profile attributed 52.9 ms/step to the dynamic passes,
    PROFILE_r04.json). Out-of-range activations clip at ±127 — the
    calibration margin and the fidelity gate own that risk.
    Returns (xq int8, xs f32 scale — per-row column vector or scalar)."""
    xf = x.astype(jnp.float32)
    if _ACT_CAPTURE is not None:
        _ACT_CAPTURE.append(jnp.max(jnp.abs(xf)))
    if a_scale is not None:
        xs = jnp.asarray(a_scale, jnp.float32)
        xq = jnp.clip(jnp.rint(xf / xs), -127, 127).astype(jnp.int8)
        return xq, xs
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(ax == 0, 1.0, ax / 127.0)
    xq = jnp.clip(jnp.rint(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def q8_matmul(x: jax.Array, wq: jax.Array, ws: jax.Array, b=None, a_scale=None) -> jax.Array:
    """W8A8 dynamic-quantized matmul.

    Weights: symmetric per-output-channel int8 (`wq` (K, N), `ws` (N,)).
    Activations: symmetric per-row (per-token) int8 computed on the fly.
    The int8 x int8 -> int32 dot runs on the MXU at 2x the bf16 rate on
    v5e (394 TOPS vs 197 TFLOPS); the requantize epilogue is VPU
    elementwise and fuses. Opt-in serving mode (config
    model.matmul_precision = "int8"): validate retrieval quality on real
    checkpoints with evaluations/ before enabling in production.
    """
    xq, xs = quantize_act_int8(x, a_scale)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * xs * ws
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def linear_multi(x: jax.Array, ws, bs):
    """Several matmuls over the SAME input (q/k/v projections, gate/up)
    with ONE shared dynamic activation quantization in the int8 path.

    The round-4 int8 profile (PROFILE_r04.json) attributed ~17% of the
    W8A8 step to dynamic-quant passes; q/k/v re-quantizing the identical
    layernorm output 3x (and gate/up 2x) is pure waste that XLA's CSE is
    not guaranteed to remove across separate q8_matmul subgraphs.
    Falls back to per-call `linear` in bf16 mode."""
    if all(isinstance(w, dict) for w in ws):
        # the shared input has ONE activation range; the first weight's
        # calibrated static scale (if any) covers the whole group
        xq, xs = quantize_act_int8(x, ws[0].get("as"))
        outs = []
        for w, b in zip(ws, bs):
            acc = jax.lax.dot_general(
                xq, w["q8"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = acc.astype(jnp.float32) * xs * w["s"]
            if b is not None:
                out = out + b.astype(jnp.float32)
            outs.append(out.astype(x.dtype))
        return outs
    return [linear(x, w, b) for w, b in zip(ws, bs)]


def quantize_weight_int8(w: jax.Array) -> dict:
    """Symmetric per-output-channel int8 quantization of a (K, N) or
    (L, K, N) stacked weight. Returns the quantized leaf `linear`
    dispatches on."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=False) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.rint(w.astype(jnp.float32) / s[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q8": q, "s": s.astype(jnp.float32)}


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """q, k: (..., S, H, hd); cos/sin: broadcastable (..., S, 1, hd).

    Split-half formulation: both Qwen rotary tables (vision 2D rope and
    text mrope) duplicate their halves (cos = [c, c], sin = [s, s]), so
      x*cos + rotate_half(x)*sin == [x1*c - x2*s, x2*c + x1*s].
    One pass over x without the rotate_half concat (HBM-bound op; ~5% of
    the vision tower on v5e).

    Compute dtype follows the input: fp32 runs match the HF reference
    bit-for-bit (HF upcasts to fp32 — our fp32 path IS fp32); bf16
    serving runs rotary in bf16 (~1e-3 relative, inside the bf16 noise
    floor of the rest of the tower; another ~4% of the tower saved).
    """
    half = q.shape[-1] // 2

    def rot(x):
        c = cos[..., :half].astype(x.dtype)
        s = sin[..., :half].astype(x.dtype)
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)

    return rot(q), rot(k)


def swiglu(x: jax.Array, gate_w, up_w, down_w, gate_b=None, up_b=None, down_b=None) -> jax.Array:
    g, u = linear_multi(x, (gate_w, up_w), (gate_b, up_b))
    h = jax.nn.silu(g) * u
    return linear(h, down_w, down_b)


def _quantize_rows_q8(t: jax.Array):
    """Symmetric int8 over the LAST axis, per leading-row (here: per
    token per head). Returns (int8 tensor, f32 scale with keepdims)."""
    tf = t.astype(jnp.float32)
    a = jnp.max(jnp.abs(tf), axis=-1, keepdims=True)
    s = jnp.where(a == 0, 1.0, a / 127.0)
    return jnp.clip(jnp.rint(tf / s), -127, 127).astype(jnp.int8), s


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    qk_int8: bool = False,
    qk_static=None,
) -> jax.Array:
    """Plain XLA attention; fp32 softmax.

    q: (..., S, Hq, hd); k/v: (..., S, Hkv, hd). GQA via head repeat.
    mask: broadcastable to (..., Hq, Sq, Sk), True = attend.

    qk_int8=True computes the QK^T contraction in int8 (int32
    accumulate on the MXU at 2x the bf16 rate — the W8A8 counterpart
    for the score matmul; PV stays in the input dtype). qk_static=None
    uses per-token per-head DYNAMIC scales (two extra max-abs passes —
    measured round 4 as a net LOSS, AB_ATTN_r04.json); qk_static=
    (q_scale, k_scale) uses calibrated STATIC scalars: the max-abs
    passes disappear and the epilogue is one scalar multiply. Logit
    error stays well inside softmax's tolerance; gate with the fidelity
    eval before defaulting."""
    hq, hkv = q.shape[-2], k.shape[-2]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=-2)
        v = jnp.repeat(v, hq // hkv, axis=-2)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _QK_CAPTURE is not None:
        _QK_CAPTURE.append(jnp.stack([
            jnp.max(jnp.abs(q.astype(jnp.float32))),
            jnp.max(jnp.abs(k.astype(jnp.float32))),
        ]))
    # Head axis stays where it is — dot_general takes (h) as a batch dim
    # directly, avoiding explicit swapaxes copies of q/k/v/out.
    if qk_int8 and qk_static is not None:
        qs_s = jnp.asarray(qk_static[0], jnp.float32)
        ks_s = jnp.asarray(qk_static[1], jnp.float32)
        qq = jnp.clip(jnp.rint(q.astype(jnp.float32) / qs_s), -127, 127).astype(jnp.int8)
        kq = jnp.clip(jnp.rint(k.astype(jnp.float32) / ks_s), -127, 127).astype(jnp.int8)
        acc = jnp.einsum(
            "...qhd,...khd->...hqk", qq, kq, preferred_element_type=jnp.int32
        )
        scores = acc.astype(jnp.float32) * (qs_s * ks_s * scale)
    elif qk_int8:
        qq, qs = _quantize_rows_q8(q)
        kq, ks = _quantize_rows_q8(k)
        acc = jnp.einsum(
            "...qhd,...khd->...hqk", qq, kq, preferred_element_type=jnp.int32
        )
        # qs: (..., Sq, H, 1) -> (..., H, Sq, 1); ks -> (..., H, 1, Sk)
        qs_t = jnp.swapaxes(qs, -3, -2)
        ks_t = jnp.swapaxes(jnp.swapaxes(ks, -3, -2), -2, -1)
        scores = acc.astype(jnp.float32) * qs_t * ks_t * scale
    else:
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        # additive bias precomputed ONCE by the caller (loop-invariant
        # across a layer scan); adding -1e30 saturates exactly like the
        # where() select for any finite score
        scores = scores + bias
    elif mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)  # (..., S, H, hd)
