"""MUVERA FDE tests: determinism, shapes, and — the property that matters —
FDE dot product approximates Chamfer/MaxSim well enough that ANN recall
over the prefilter pool is high (SURVEY.md §7 'FDE fidelity')."""

import numpy as np
import jax.numpy as jnp

from morphik_core_tpu.ops.fde import FDEConfig, fde_document, fde_document_batch, fde_query

CFG = FDEConfig()  # reference config: 20 reps x 32 partitions x 16 = 10240


def _norm_tokens(rng, n, d=128):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _chamfer(q, d):
    return (q @ d.T).max(axis=1).sum()


def test_fde_dims_match_reference_config():
    assert CFG.fde_dim == 10240


def test_fde_deterministic():
    rng = np.random.default_rng(0)
    x = _norm_tokens(rng, 50)
    a = np.asarray(fde_document(jnp.asarray(x), CFG))
    b = np.asarray(fde_document(jnp.asarray(x), CFG))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (10240,)


def test_fde_query_shape_and_linearity():
    rng = np.random.default_rng(1)
    q = _norm_tokens(rng, 12)
    e = np.asarray(fde_query(jnp.asarray(q), CFG))
    assert e.shape == (10240,)
    # query FDE is a sum over tokens => additive under concatenation
    e1 = np.asarray(fde_query(jnp.asarray(q[:5]), CFG))
    e2 = np.asarray(fde_query(jnp.asarray(q[5:]), CFG))
    np.testing.assert_allclose(e, e1 + e2, rtol=1e-4, atol=1e-4)


def test_fde_mask_equals_truncation():
    rng = np.random.default_rng(2)
    x = _norm_tokens(rng, 40)
    padded = np.zeros((64, 128), dtype=np.float32)
    padded[:40] = x
    mask = np.zeros(64, dtype=np.float32)
    mask[:40] = 1
    a = np.asarray(fde_document(jnp.asarray(x), CFG))
    b = np.asarray(fde_document(jnp.asarray(padded), CFG, mask=jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_batch_matches_single():
    rng = np.random.default_rng(3)
    docs = [_norm_tokens(rng, 30), _norm_tokens(rng, 30)]
    x = np.stack(docs)
    mask = np.ones((2, 30), dtype=np.float32)
    batch = np.asarray(fde_document_batch(jnp.asarray(x), jnp.asarray(mask), CFG))
    for i in range(2):
        single = np.asarray(fde_document(jnp.asarray(docs[i]), CFG))
        np.testing.assert_allclose(batch[i], single, rtol=1e-4, atol=1e-4)


def _clustered_corpus(rng, n_docs, n_concepts=200, d=128, noise=0.15):
    """Token distributions with cluster structure, like real ColPali
    embeddings (iid-random tokens are MUVERA's worst case and do not
    represent semantic embeddings)."""
    concepts = _norm_tokens(rng, n_concepts, d)
    docs, topics = [], []
    for _ in range(n_docs):
        topic = rng.choice(n_concepts, size=4, replace=False)
        n_tok = int(rng.integers(20, 60))
        base = concepts[rng.choice(topic, size=n_tok)]
        x = base + noise * rng.standard_normal((n_tok, d)).astype(np.float32)
        docs.append(x / np.linalg.norm(x, axis=1, keepdims=True))
        topics.append(topic)
    return concepts, docs, topics


def test_fde_recall_against_exact_chamfer():
    """Prefilter fidelity: top-75 by FDE must capture the exact top-10
    (mirrors the reference pool: top min(10k, 75) candidates), and the
    two-stage pipeline (FDE prefilter -> exact rerank) must reproduce the
    exact search's leading results."""
    rng = np.random.default_rng(4)
    n_docs = 300
    concepts, docs, topics = _clustered_corpus(rng, n_docs)
    target = 123
    q = concepts[topics[target]] + 0.15 * rng.standard_normal((4, 128)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)

    exact = np.array([_chamfer(q, d) for d in docs])
    qe = np.asarray(fde_query(jnp.asarray(q), CFG))
    de = np.stack([np.asarray(fde_document(jnp.asarray(d), CFG)) for d in docs])
    approx = de @ qe

    exact_top10 = np.argsort(-exact)[:10]
    pool = np.argsort(-approx)[:75]
    recall = len(set(exact_top10.tolist()) & set(pool.tolist())) / 10
    assert recall >= 0.8, f"FDE recall@75 for exact top-10 = {recall}"
    # the planted target must be found
    assert target in set(pool.tolist())
    # end-to-end two-stage search agrees with exact search at the top
    reranked = pool[np.argsort(-exact[pool])]
    np.testing.assert_array_equal(reranked[:2], exact_top10[:2])
