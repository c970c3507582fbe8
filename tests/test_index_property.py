"""Stateful property test: the MultiVectorIndex under random op
sequences (store / upsert / delete / compact / save+reload) must always
agree with a naive oracle (dict of alive multivectors + brute-force
MaxSim). This is the class of invariant the targeted tests keep missing
(stale device masks, WAL resurrection, lost n_tokens, ...)."""

import numpy as np
import pytest

from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig

CFG = FDEConfig(dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8)


def _brute_maxsim(q, mv):
    sim = q @ mv.T  # (nq, nt)
    return float(sim.max(axis=1).sum())


def _check_agreement(idx, oracle, rng, label):
    """Every alive (doc, chunk) retrievable with the oracle's score; the
    full ranking (k = corpus size) matches brute force."""
    assert len(idx) == len(oracle), (label, len(idx), len(oracle))
    if not oracle:
        assert idx.query(rng.standard_normal((4, 16)).astype(np.float32), k=5) == []
        return
    q = rng.standard_normal((4, 16)).astype(np.float32)
    res = idx.query(q, k=len(oracle))
    got = {(r.document_id, r.chunk_number): s for r, s in res}
    # pool capping can drop tail candidates; every RETURNED score must
    # match brute force and the returned set must be the top of the
    # brute-force ranking
    want = {k: _brute_maxsim(q, mv) for k, mv in oracle.items()}
    for key, score in got.items():
        assert key in want, (label, key)
        assert abs(score - want[key]) < 5e-2 * max(1.0, abs(want[key])), (
            label, key, score, want[key])
    order_want = sorted(want, key=lambda k: -want[k])[: len(got)]
    # allow ties to permute: compare score sequences not identities
    ws = sorted((want[k] for k in order_want), reverse=True)
    gs = sorted(got.values(), reverse=True)
    np.testing.assert_allclose(gs, ws, rtol=5e-2, atol=5e-2, err_msg=label)
    # chunk fetch path agrees too
    some = rng.choice(list(oracle), size=min(3, len(oracle)), replace=False)
    for doc_id, chunk_no in [tuple(s) for s in some]:
        mv = idx.get_multivector(doc_id, int(chunk_no))
        np.testing.assert_allclose(mv, oracle[(doc_id, int(chunk_no))], atol=2e-3,
                                   err_msg=label)


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("persistent", [False, True])
def test_index_random_ops_match_oracle(tmp_path, seed, persistent):
    rng = np.random.default_rng(seed)
    path = (tmp_path / f"ix{seed}") if persistent else None
    kw = dict(
        device_block_rows=16,  # force multi-block early
        compact_min_rows=8,
        compact_dead_fraction=0.3,
        device_cache_slots=32,
        device_cache_token_bucket=16,
        rerank_dtype="int8" if seed % 2 else "bf16",
    )
    idx = MultiVectorIndex(CFG, path=path, **kw)
    oracle = {}

    def rand_mv():
        mv = rng.standard_normal((int(rng.integers(3, 12)), 16)).astype(np.float32)
        return mv / np.linalg.norm(mv, axis=-1, keepdims=True)

    for step in range(40):
        probs = [0.3, 0.15, 0.15, 0.1, 0.3] if persistent else [0.4, 0.15, 0.15, 0.0, 0.3]
        op = rng.choice(["store", "upsert", "delete", "save_reload", "query"], p=probs)
        label = f"seed={seed} persistent={persistent} step={step} op={op}"
        if op == "store":
            n = int(rng.integers(1, 5))
            mvs = [rand_mv() for _ in range(n)]
            recs = []
            for mv in mvs:
                doc = f"d{rng.integers(0, 12)}"
                chunk = int(rng.integers(0, 3))
                recs.append(IndexRecord(document_id=doc, chunk_number=chunk))
                oracle[(doc, chunk)] = mv
            idx.store(mvs, recs)
        elif op == "upsert" and oracle:
            doc, chunk = list(oracle)[int(rng.integers(0, len(oracle)))]
            mv = rand_mv()
            idx.store([mv], [IndexRecord(document_id=doc, chunk_number=chunk)])
            oracle[(doc, chunk)] = mv
        elif op == "delete" and oracle:
            doc = list(oracle)[int(rng.integers(0, len(oracle)))][0]
            idx.delete_document(doc)
            oracle = {k: v for k, v in oracle.items() if k[0] != doc}
        elif op == "save_reload" and persistent:
            idx.save()
            idx = MultiVectorIndex(CFG, path=path, **kw)
        elif op == "query":
            _check_agreement(idx, oracle, rng, label)
    _check_agreement(idx, oracle, rng, f"seed={seed} persistent={persistent} final")
    if persistent:
        idx.save()
        re = MultiVectorIndex(CFG, path=path, **kw)
        _check_agreement(re, oracle, rng, f"seed={seed} reload-final")
