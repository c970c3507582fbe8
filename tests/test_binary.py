"""Binary quantization bit-parity tests (mirrors reference glassbox tests,
SURVEY.md §4: bit-pattern assertions + MaxSim ordering)."""

import numpy as np
import jax.numpy as jnp

from morphik_core_tpu.ops.binary import (
    binary_maxsim_scores,
    binary_quantize,
    binary_quantize_packed,
    hamming_distance_packed,
    unpack_bits,
)
from morphik_core_tpu.ops.maxsim import pad_multivectors


def test_quantize_bit_pattern():
    x = np.array([1.0, -1.0, 0.0, 0.5, -0.2, 2.0, -3.0, 0.1], dtype=np.float32)
    bits = binary_quantize(x)
    np.testing.assert_array_equal(bits, [1, 0, 0, 1, 0, 1, 0, 1])
    packed = binary_quantize_packed(x)
    # MSB-first: bits 10010101 -> 0x95
    assert packed.tolist() == [0x95]


def test_packed_roundtrip_128d():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 128)).astype(np.float32)
    packed = binary_quantize_packed(x)
    assert packed.shape == (10, 16)  # 32x compression vs f32
    np.testing.assert_array_equal(unpack_bits(packed), binary_quantize(x))


def test_hamming_distance():
    a = np.array([0b10101010], dtype=np.uint8)
    b = np.array([0b01010101], dtype=np.uint8)
    assert hamming_distance_packed(a, b) == 8
    assert hamming_distance_packed(a, a) == 0


def test_binary_maxsim_matches_oracle():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((7, 128)).astype(np.float32)
    mvs = [rng.standard_normal((rng.integers(5, 30), 128)).astype(np.float32) for _ in range(6)]
    dense, mask = pad_multivectors(mvs)

    qp = binary_quantize_packed(q)
    dp = binary_quantize_packed(dense)
    got = np.asarray(binary_maxsim_scores(jnp.asarray(qp), jnp.asarray(dp), jnp.asarray(mask)))

    # Oracle: unpacked-bit hamming similarity, per reference SQL max_sim.
    want = []
    for m in mvs:
        qb = binary_quantize(q).astype(np.int32)
        db = binary_quantize(m).astype(np.int32)
        ham = (qb[:, None, :] != db[None, :, :]).sum(-1)  # (Nq, Nd)
        sim = 1.0 - ham / 128.0
        want.append(sim.max(axis=1).sum())
    np.testing.assert_allclose(got, np.array(want, dtype=np.float32), rtol=1e-5, atol=1e-5)


def test_binary_maxsim_ranking_correlates_with_float():
    """Binary-quantized scores should preserve gross ordering (the point of
    the reference's 32x-compressed store)."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal((20, 128)).astype(np.float32)
    q = base[:8] + 0.1 * rng.standard_normal((8, 128)).astype(np.float32)
    near = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
    far = rng.standard_normal((20, 128)).astype(np.float32) * 1.0
    dense, mask = pad_multivectors([near, far])
    qp = binary_quantize_packed(q)
    dp = binary_quantize_packed(dense)
    s = np.asarray(binary_maxsim_scores(jnp.asarray(qp), jnp.asarray(dp), jnp.asarray(mask)))
    assert s[0] > s[1]
