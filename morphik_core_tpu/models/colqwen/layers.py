"""Shared transformer building blocks (functional JAX).

Numerics follow the Qwen2.5-VL semantics (RMSNorm in fp32, rotary in
fp32, fp32 softmax) so bf16 forwards stay close to the torch reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


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
    g = x @ gate_w
    u = x @ up_w
    if gate_b is not None:
        g = g + gate_b
    if up_b is not None:
        u = u + up_b
    h = jax.nn.silu(g) * u
    out = h @ down_w
    if down_b is not None:
        out = out + down_b
    return out


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain XLA attention; fp32 softmax.

    q: (..., S, Hq, hd); k/v: (..., S, Hkv, hd). GQA via head repeat.
    mask: broadcastable to (..., Hq, Sq, Sk), True = attend.
    """
    hq, hkv = q.shape[-2], k.shape[-2]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=-2)
        v = jnp.repeat(v, hq // hkv, axis=-2)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # Head axis stays where it is — dot_general takes (h) as a batch dim
    # directly, avoiding explicit swapaxes copies of q/k/v/out.
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
