"""MaxSim op tests: numpy oracle vs XLA reference vs Pallas (interpret) kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from morphik_core_tpu.ops.maxsim import (
    maxsim_scores,
    maxsim_scores_ref,
    maxsim_topk,
    pad_multivectors,
)


def _numpy_maxsim(q, docs):
    """Oracle: plain python/numpy over ragged lists."""
    out = []
    for d in docs:
        sim = q @ d.T  # (Nq, Nd)
        out.append(sim.max(axis=1).sum())
    return np.array(out, dtype=np.float32)


def _rand_mvs(rng, c, dim=128, lo=5, hi=40):
    return [rng.standard_normal((rng.integers(lo, hi), dim)).astype(np.float32) for _ in range(c)]


def test_pad_multivectors_roundtrip():
    rng = np.random.default_rng(0)
    mvs = _rand_mvs(rng, 7)
    dense, mask = pad_multivectors(mvs)
    assert dense.shape[0] == 7 and dense.shape[1] % 128 == 0
    for i, m in enumerate(mvs):
        n = m.shape[0]
        np.testing.assert_array_equal(dense[i, :n], m)
        assert mask[i, :n].all() and not mask[i, n:].any()


def test_ref_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((13, 128)).astype(np.float32)
    mvs = _rand_mvs(rng, 9)
    dense, mask = pad_multivectors(mvs)
    got = np.asarray(maxsim_scores_ref(jnp.asarray(q), jnp.asarray(dense), jnp.asarray(mask)))
    want = _numpy_maxsim(q, mvs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_pallas_interpret_matches_ref():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((16, 128)).astype(np.float32)
    mvs = _rand_mvs(rng, 20, lo=30, hi=300)
    dense, mask = pad_multivectors(mvs)
    want = _numpy_maxsim(q, mvs)
    got = np.asarray(
        maxsim_scores(
            jnp.asarray(q), jnp.asarray(dense), jnp.asarray(mask), interpret=True, candidate_tile=8, token_tile=128
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_interpret_ragged_query_padding():
    """Zero-padded query rows must contribute exactly zero."""
    rng = np.random.default_rng(3)
    q = rng.standard_normal((10, 128)).astype(np.float32)
    q_padded = np.zeros((24, 128), dtype=np.float32)
    q_padded[:10] = q
    mvs = _rand_mvs(rng, 5)
    dense, mask = pad_multivectors(mvs)
    want = _numpy_maxsim(q, mvs)
    got = np.asarray(maxsim_scores(jnp.asarray(q_padded), jnp.asarray(dense), jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_topk_ordering():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((8, 128)).astype(np.float32)
    mvs = _rand_mvs(rng, 30)
    dense, mask = pad_multivectors(mvs)
    scores, idx = maxsim_topk(jnp.asarray(q), jnp.asarray(dense), jnp.asarray(mask), k=5, use_pallas=False)
    all_scores = _numpy_maxsim(q, mvs)
    want_idx = np.argsort(-all_scores)[:5]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    assert np.all(np.diff(np.asarray(scores)) <= 1e-6)


def test_bf16_inputs_close():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((8, 128)).astype(np.float32)
    mvs = _rand_mvs(rng, 6)
    dense, mask = pad_multivectors(mvs)
    got = np.asarray(
        maxsim_scores_ref(jnp.asarray(q).astype(jnp.bfloat16), jnp.asarray(dense).astype(jnp.bfloat16), jnp.asarray(mask))
    )
    want = _numpy_maxsim(q, mvs)
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.5)


def test_legal_token_tile_is_mosaic_legal():
    """Regression: the pooled-tier tile picker chose any divisor down to
    8 (e.g. 8 into bucket 24, 16 into 80) — Mosaic rejects a block whose
    last dim is neither a 128-multiple nor the full array width, so the
    fused pooled scan crashed on real TPU for non-lucky buckets (hit by
    the trained tiny fixture, T=24). Every tile must divide the bucket
    AND be a 128-multiple or the bucket itself."""
    from morphik_core_tpu.ops.maxsim import legal_token_tile

    for n in list(range(8, 1025, 8)) + [24, 40, 80, 136, 312]:
        t = legal_token_tile(n)
        assert n % t == 0, (n, t)
        assert t % 128 == 0 or t == n, (n, t)
    # big pow-2 buckets still get a bounded tile, not a full-width block
    assert legal_token_tile(1024) == 512
    assert legal_token_tile(384) == 384
