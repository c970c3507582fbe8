"""Fused windowed self-attention for the Qwen2.5-VL vision tower.

STATUS: measured and NOT wired into the tower. On a real v5e this
kernel runs the standalone window-attention shape in 1.67 ms vs 1.32 ms
for XLA's fused attention, and in-tower it was slower still (252 vs
215 ms for the whole tower) — XLA already compiles the batched-window
einsum to within ~15% of the matmul floor at these shapes, so the
block-diagonal fusion buys nothing (see docs/ARCHITECTURE.md "measured
and rejected" and CLAUDE.md round-2 notes). Kept, with parity tests, as
the starting point if future shapes (bigger windows, more heads) change
the trade-off.

The torch reference runs window attention via flash-attn varlen with
cu_seqlens (transformers Qwen2_5_VisionTransformerPretrainedModel, used
by reference core/embedding/colpali_embedding_model.py:47-56); the
engine's serving path is the batched-window XLA attention in
models/colqwen/vision.py.

Kernel shape: QK^T -> block-diagonal window mask -> softmax -> PV for a
strip of consecutive windows per (strip, head) grid step, entirely in
VMEM; q/k/v arrive as (T, heads, head_dim) with windows contiguous
along T, heads folded into lanes at 128-aligned strides (Mosaic
rejects (N, 80) -> (N, 1, 80) shape casts).

A pure-XLA reference (`window_attention_ref`) serves CPU execution and
parity tests (interpret=True runs the kernel on CPU for CI).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def window_attention_ref(q: jax.Array, k: jax.Array, v: jax.Array, *, window: int) -> jax.Array:
    """Batched-window XLA attention. q/k/v: (T, H, D), T % window == 0."""
    t, h, d = q.shape
    scale = d**-0.5

    def to_win(x):
        return x.reshape(t // window, window, h, d)

    qw, kw, vw = to_win(q), to_win(k), to_win(v)
    scores = jnp.einsum("wqhd,wkhd->whqk", qw, kw).astype(jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("whqk,wkhd->wqhd", probs, vw)
    return out.reshape(t, h, d)


def _window_attn_kernel(q_ref, k_ref, v_ref, out_ref, *, window: int, head_dim: int):
    """One grid step = one (row strip, head) pair. q/k/v/out refs are
    (R, stride) lane-aligned single-head slices; R consecutive rows =
    R//window full windows. The (R, R) fp32 score tile + softmax stay
    in VMEM (never HBM)."""
    r = q_ref.shape[0]
    scale = head_dim**-0.5
    # block-diagonal window mask for the strip: attend iff same window
    row_win = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // window
    col_win = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // window
    s = (
        jax.lax.dot_general(
            q_ref[:], k_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    s = jnp.where(row_win == col_win, s, NEG_INF)
    # fp32 softmax (parity with the XLA path / HF numerics); zero-padded
    # lanes beyond head_dim dot to 0 and do not perturb scores
    p = jax.nn.softmax(s, axis=-1).astype(v_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        p, v_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _pick_block_windows(n_windows: int, target: int) -> int:
    """Largest divisor of n_windows that is <= target."""
    for bw in range(min(target, n_windows), 0, -1):
        if n_windows % bw == 0:
            return bw
    return 1


@functools.partial(jax.jit, static_argnames=("window", "block_windows", "interpret"))
def _window_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    block_windows: int,
    interpret: bool = False,
) -> jax.Array:
    t, h, d = q.shape
    r = window * block_windows
    grid = (t // r, h)  # heads iterate fastest: same rows, hot in HBM cache
    # fold heads into lanes at a 128-aligned stride so every grid step's
    # block is a tile-aligned (R, stride) lane slice (zero-padded
    # features do not perturb dot products)
    stride = ((d + 127) // 128) * 128

    def fold(x):
        if stride != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, stride - d)))
        return x.reshape(t, h * stride)

    kernel = functools.partial(_window_attn_kernel, window=window, head_dim=d)
    spec = pl.BlockSpec((r, stride), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((t, h * stride), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * r * d * h,  # QK^T + PV over (R,R) tiles
            bytes_accessed=4 * t * h * stride * q.dtype.itemsize,
            transcendentals=t * r * h,
        ),
        interpret=interpret,
    )(fold(q), fold(k), fold(v))
    return out.reshape(t, h, stride)[:, :, :d]


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    use_pallas: Optional[bool] = None,
    block_windows: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Windowed self-attention over contiguous `window`-row blocks.

    q/k/v: (T, H, D) with T % window == 0 and every row valid (the
    vision tower's static grid buckets guarantee both). Returns
    (T, H, D) in q.dtype.
    """
    t, h, d = q.shape
    if t % window:
        raise ValueError(f"T={t} not a multiple of window={window}")
    if use_pallas is None:
        from morphik_core_tpu.ops.maxsim import default_use_pallas

        use_pallas = default_use_pallas()
    n_windows = t // window
    if not (use_pallas or interpret):
        return window_attention_ref(q, k, v, window=window)
    bw = _pick_block_windows(n_windows, block_windows)
    return _window_attention_pallas(
        q, k, v, window=window, block_windows=bw, interpret=interpret
    )
