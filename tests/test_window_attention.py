"""Window-attention kernel parity (interpret mode runs the Pallas
kernel on CPU; on-chip numerics verified on the real TPU during
development — max|diff| vs XLA ~2e-3 in bf16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphik_core_tpu.ops.window_attention import (
    _pick_block_windows,
    window_attention,
    window_attention_ref,
)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("t,h,d,win,bw", [(256, 4, 16, 64, 2), (384, 2, 8, 64, 3), (128, 1, 32, 32, 4)])
def test_window_attention_interpret_parity(t, h, d, win, bw):
    q, k, v = (_rand((t, h, d), i) for i in range(3))
    ref = window_attention_ref(q, k, v, window=win)
    pal = window_attention(q, k, v, window=win, interpret=True, block_windows=bw)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_window_attention_matches_per_window_softmax():
    """Glassbox: each window must be an independent softmax attention —
    perturbing tokens of window 1 must not change window 0's output."""
    t, h, d, win = 128, 2, 16, 64
    q, k, v = (_rand((t, h, d), i) for i in range(3))
    base = window_attention_ref(q, k, v, window=win)
    k2 = k.at[win:].set(k[win:] * -3.0 + 1.0)
    v2 = v.at[win:].set(v[win:] * 2.0)
    pert = window_attention_ref(q, k2, v2, window=win)
    np.testing.assert_allclose(np.asarray(pert[:win]), np.asarray(base[:win]), atol=1e-6)
    assert float(jnp.abs(pert[win:] - base[win:]).max()) > 1e-3


def test_window_attention_cpu_dispatch_is_ref():
    """On a CPU backend the public entry must run the XLA reference."""
    q, k, v = (_rand((128, 2, 8), i) for i in range(3))
    out = window_attention(q, k, v, window=64)  # backend under tests = cpu
    ref = window_attention_ref(q, k, v, window=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_window_attention_rejects_ragged():
    q, k, v = (_rand((100, 2, 8), i) for i in range(3))
    with pytest.raises(ValueError):
        window_attention(q, k, v, window=64)


def test_pick_block_windows():
    assert _pick_block_windows(280, 8) == 8
    assert _pick_block_windows(35, 8) == 7
    assert _pick_block_windows(13, 8) == 1
    assert _pick_block_windows(4, 8) == 4
