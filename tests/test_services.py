"""End-to-end service tests (the minimum slice of SURVEY.md §7):
ingest text + file -> worker job -> retrieve_chunks -> query, plus
folder scoping, padding, delete, requeue, grouped responses."""

import asyncio

import numpy as np
import pytest
from PIL import Image, ImageDraw

from morphik_core_tpu.config import Settings
from morphik_core_tpu.models.schemas import AuthContext
from morphik_core_tpu.services_init import build_services


# one loop for the whole module: the job-queue worker tasks live on it
_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


AUTH = AuthContext(entity_id="tester", permissions={"read", "write", "admin"})


@pytest.fixture(scope="module")
def services(tmp_path_factory):
    root = tmp_path_factory.mktemp("svc")
    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {
                "index_path": str(root / "index"),
                "fde_num_repetitions": 8,
                "fde_num_simhash_projections": 4,
                "fde_projection_dimension": 8,
            },
            "worker": {"max_jobs": 2},
        }
    )
    svc = build_services(settings)
    run(svc.initialize())
    yield svc
    run(svc.shutdown())


def _page_image_bytes(text: str, color):
    img = Image.new("RGB", (448, 336), (255, 255, 255))
    d = ImageDraw.Draw(img)
    d.rectangle([30, 30, 200, 150], fill=color)
    d.text((40, 200), text, fill=(0, 0, 0))
    import io

    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_ingest_text_and_retrieve(services):
    async def go():
        doc = await services.ingestion_service.ingest_text(
            "The quarterly revenue was 42 million dollars. Expenses were 30 million.",
            "finance.txt",
            {"dept": "finance"},
            AUTH,
            use_colpali=True,
        )
        assert doc.system_metadata["status"] == "completed"
        assert doc.chunk_ids
        results = await services.document_service.retrieve_chunks(
            "quarterly revenue", AUTH, k=3, use_colpali=False
        )
        assert results and results[0].document_id == doc.external_id
        assert "42 million" in results[0].content
        # metadata filter excludes
        none = await services.document_service.retrieve_chunks(
            "quarterly revenue", AUTH, filters={"dept": "hr"}, k=3, use_colpali=False
        )
        assert all(r.document_id != doc.external_id for r in none)
        return doc

    run(go())


def test_ingest_image_file_via_worker_and_colpali_retrieve(services):
    async def go():
        png = _page_image_bytes("invoice total 99", (200, 40, 40))
        doc = await services.ingestion_service.ingest_file_content(
            png, "invoice.png", {"kind": "invoice"}, AUTH, use_colpali=True
        )
        assert doc.system_metadata["status"] == "processing"
        await services.job_queue.enqueue_job(
            "process_ingestion_job", document_id=doc.external_id,
            auth=AUTH.model_dump(mode="json"), use_colpali=True,
        )
        assert await services.job_queue.drain(120)
        got = await services.database.get_document(doc.external_id, AUTH)
        assert got.system_metadata["status"] == "completed"
        assert got.chunk_ids

        results = await services.document_service.retrieve_chunks(
            "invoice total", AUTH, k=2, use_colpali=True, filters={"kind": "invoice"}
        )
        assert results
        assert results[0].content.startswith("data:image/")
        assert results[0].metadata["is_image"] is True
        # url output format returns a download URL instead of payload
        urls = await services.document_service.retrieve_chunks(
            "invoice total", AUTH, k=1, use_colpali=True, output_format="url",
            filters={"kind": "invoice"},
        )
        assert urls and (urls[0].download_url or "").startswith("file://")
        return doc

    run(go())


def test_pdf_ingest_padding_and_grouped(services):
    async def go():
        import sys

        sys.path.insert(0, "tests")
        from test_parser import make_pdf

        pdf = make_pdf([f"Report page {i}. Metric value {100 + i}." for i in range(4)])
        doc = await services.ingestion_service.ingest_file_content(
            pdf, "report.pdf", {"kind": "report"}, AUTH, use_colpali=True
        )
        await services.job_queue.enqueue_job(
            "process_ingestion_job", document_id=doc.external_id,
            auth=AUTH.model_dump(mode="json"), use_colpali=True,
        )
        assert await services.job_queue.drain(240)
        got = await services.database.get_document(doc.external_id, AUTH)
        assert got.system_metadata["status"] == "completed"
        assert got.system_metadata.get("page_count") == 4

        grouped = await services.document_service.retrieve_chunks_grouped(
            "Metric value 102", AUTH, k=1, use_colpali=True, padding=1,
            filters={"kind": "report"},
        )
        assert grouped.chunks
        assert grouped.has_padding
        g = grouped.groups[0]
        assert len(g.padding_chunks) >= 1
        assert all(p.is_padding for p in g.padding_chunks)
        nums = sorted(c.chunk_number for c in g.all_chunks)
        assert nums == list(range(nums[0], nums[0] + len(nums)))
        return doc

    run(go())


def test_query_completion_with_sources(services):
    async def go():
        await services.ingestion_service.ingest_text(
            "Widget Co's CEO is Jane Smith. The company was founded in 2001.",
            "widget.txt", {}, AUTH, use_colpali=False,
        )
        resp = await services.document_service.query(
            "Who is the CEO of Widget Co?", AUTH, k=2, use_colpali=False
        )
        assert "Jane Smith" in str(resp.completion)
        assert resp.sources and resp.sources[0]["document_id"]

    run(go())


def test_folder_scoping(services):
    async def go():
        d1 = await services.ingestion_service.ingest_text(
            "alpha secret document", "a.txt", {}, AUTH, folder_name="TeamA", use_colpali=False
        )
        d2 = await services.ingestion_service.ingest_text(
            "beta secret document", "b.txt", {}, AUTH, folder_name="TeamB", use_colpali=False
        )
        in_a = await services.document_service.retrieve_chunks(
            "secret document", AUTH, k=5, use_colpali=False, folder_name="TeamA"
        )
        assert {r.document_id for r in in_a} == {d1.external_id}

    run(go())


def test_delete_document_removes_everywhere(services):
    async def go():
        doc = await services.ingestion_service.ingest_text(
            "ephemeral content zanzibar", "tmp.txt", {}, AUTH, use_colpali=True
        )
        hits = await services.document_service.retrieve_chunks("zanzibar", AUTH, k=2, use_colpali=True)
        assert any(h.document_id == doc.external_id for h in hits)
        assert await services.document_service.delete_document(doc.external_id, AUTH)
        hits = await services.document_service.retrieve_chunks("zanzibar", AUTH, k=2, use_colpali=True)
        assert all(h.document_id != doc.external_id for h in hits)
        assert await services.database.get_document(doc.external_id, AUTH) is None

    run(go())


def test_job_requeue_failed(services):
    async def go():
        jid = await services.job_queue.enqueue_job(
            "process_ingestion_job", document_id="nonexistent", auth=AUTH.model_dump(mode="json")
        )
        await services.job_queue.drain(60)
        job = services.job_queue.get_job(jid)
        assert job.status == "failed"
        assert await services.job_queue.requeue(jid)
        await services.job_queue.drain(60)
        assert services.job_queue.get_job(jid).status == "failed"  # still fails, but retried

    run(go())


def test_parse_failure_fallback_ladder(tmp_path):
    """Parse failure on a ColPali-native file keeps the job alive
    (image-only searchability); on a text file it fails the document
    (reference ingestion_worker.py:764-902 fallback ladder)."""
    import asyncio

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.models.schemas import AuthContext, EntityType
    from morphik_core_tpu.services_init import build_services

    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(tmp_path / "storage")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "vector_store": {
                "index_path": str(tmp_path / "index"),
                "fde_num_repetitions": 4,
                "fde_num_simhash_projections": 3,
                "fde_projection_dimension": 8,
            },
        }
    )
    loop = asyncio.new_event_loop()
    services = build_services(settings)
    loop.run_until_complete(services.database.initialize())
    auth = AuthContext(
        entity_type=EntityType.DEVELOPER, entity_id="t", permissions={"read", "write", "admin"},
        user_id="t",
    )

    async def boom(*a, **kw):
        raise RuntimeError("synthetic parser crash")

    services.parser.parse_file_to_text = boom

    async def go():
        # a real 1-page PDF-native file: use a tiny PNG image instead (also colpali-native)
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (300, 200), (200, 220, 240)).save(buf, format="PNG")
        doc = await services.ingestion_service.ingest_file_content(
            buf.getvalue(), "page.png", {}, auth, use_colpali=True
        )
        out = await services.ingestion_service.process_ingestion_job(doc.external_id, auth, True)
        assert out.system_metadata["status"] == "completed"
        got = await services.database.get_document(doc.external_id, auth)
        assert got.additional_metadata.get("parse_error")

        # text file: parse failure fails the job
        doc2 = await services.ingestion_service.ingest_file_content(
            b"plain text body", "note.txt", {}, auth, use_colpali=False
        )
        try:
            await services.ingestion_service.process_ingestion_job(doc2.external_id, auth, False)
            raise AssertionError("expected failure")
        except RuntimeError:
            pass
        got2 = await services.database.get_document(doc2.external_id, auth)
        assert got2.system_metadata["status"] == "failed"

    loop.run_until_complete(go())


def test_ingestion_summary_jsonl(tmp_path, monkeypatch):
    """Per-job JSONL summary with throughput (reference
    logs/ingestion_summary.jsonl)."""
    import asyncio
    import json

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.models.schemas import AuthContext, EntityType
    from morphik_core_tpu.services_init import build_services

    monkeypatch.chdir(tmp_path)
    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(tmp_path / "storage")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "vector_store": {
                "index_path": str(tmp_path / "index"),
                "fde_num_repetitions": 4,
                "fde_num_simhash_projections": 3,
                "fde_projection_dimension": 8,
            },
        }
    )
    services = build_services(settings)
    loop = asyncio.new_event_loop()
    loop.run_until_complete(services.database.initialize())
    auth = AuthContext(entity_type=EntityType.DEVELOPER, entity_id="t",
                       permissions={"read", "write", "admin"}, user_id="t")

    async def go():
        doc = await services.ingestion_service.ingest_file_content(
            b"summary log body", "s.txt", {}, auth, use_colpali=False
        )
        await services.ingestion_service.process_ingestion_job(doc.external_id, auth, False)
        return doc

    doc = loop.run_until_complete(go())
    rows = [json.loads(line) for line in
            (tmp_path / "logs" / "ingestion_summary.jsonl").read_text().splitlines()]
    assert rows[-1]["document_id"] == doc.external_id
    assert rows[-1]["status"] == "completed"
    assert "parse" in rows[-1]["phase_times"]


def test_colqwen_reranker_self_ranking():
    """ColQwenReranker: MaxSim self-similarity ranks the exact match first
    and preserves chunk count; scores are finite floats."""
    import asyncio

    import jax

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel
    from morphik_core_tpu.models.schemas import DocumentChunk
    from morphik_core_tpu.reranker.rerankers import ColQwenReranker

    emb = ColpaliEmbeddingModel(Settings())
    rr = ColQwenReranker(emb)
    texts = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    chunks = [DocumentChunk(document_id=f"d{i}", chunk_number=0, content=t,
                            embedding=[], metadata={}) for i, t in enumerate(texts)]
    loop = asyncio.new_event_loop()
    out = loop.run_until_complete(rr.rerank("delta epsilon zeta", chunks))
    assert len(out) == 3
    assert out[0].content == "delta epsilon zeta"  # exact text wins under MaxSim
    assert all(isinstance(c.score, float) for c in out)
    s = loop.run_until_complete(rr.compute_score("alpha", "alpha beta gamma"))
    assert isinstance(s, float)


def test_warmup_compiles_serving_programs(tmp_path):
    import asyncio

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel

    emb = ColpaliEmbeddingModel(Settings())
    dt = emb.warmup(grids=[(4, 4)])
    assert dt >= 0.0
    # bucket (4,4) now cached; a follow-up image embed reuses the program
    import numpy as np

    s = 4 * 4 * emb.model.cfg.vision.merge_unit
    out = emb.model.embed_image_batch(
        np.zeros((1, s, emb.model.cfg.vision.patch_input_dim), np.float32), 4, 4
    )
    assert out.shape[0] == 1


def test_auto_mesh_serving(tmp_path):
    """tpu.auto_mesh=true builds the serving mesh from config at boot:
    ingest + colpali retrieval run dp/tp-sharded end to end (8 virtual
    CPU devices via conftest)."""
    import io as _io

    from PIL import Image, ImageDraw

    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(tmp_path / "st")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "tpu": {"auto_mesh": True, "mesh_shape": [4, 2]},
            "vector_store": {
                "index_path": str(tmp_path / "ix"),
                "fde_num_repetitions": 4,
                "fde_num_simhash_projections": 3,
                "fde_projection_dimension": 8,
            },
        }
    )
    services = build_services(settings)
    assert services.colpali_embedding_model.model.mesh is not None
    assert dict(zip(("data", "model"),
                    services.colpali_embedding_model.model.mesh.devices.shape)) == {
        "data": 4, "model": 2}
    run(services.initialize())
    try:
        img = Image.new("RGB", (448, 336), (255, 255, 255))
        ImageDraw.Draw(img).text((30, 80), "auto mesh page", fill=(0, 0, 0))
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        auth = AuthContext(entity_id="dev_user", permissions=["read", "write", "admin"])
        doc = run(services.ingestion_service.ingest_file_content(
            buf.getvalue(), "m.png", {}, auth, use_colpali=True))
        run(services.job_queue.enqueue_job(
            "process_ingestion_job",
            document_id=doc.external_id, auth=auth.model_dump(mode="json"), use_colpali=True))
        assert run(services.job_queue.drain(120))
        res = run(services.document_service.retrieve_chunks("auto mesh page", auth, k=1))
        assert res and res[0].document_id == doc.external_id
    finally:
        run(services.shutdown())


def test_ingest_text_failure_marks_document_failed(services, monkeypatch):
    """Regression: an embed/store error inside ingest_text must not
    strand the document in status=processing."""
    async def boom(*a, **k):
        raise RuntimeError("embed exploded")

    monkeypatch.setattr(services.ingestion_service, "_embed_and_store", boom)
    with pytest.raises(RuntimeError):
        run(services.ingestion_service.ingest_text(
            "doomed content", "doom.txt", {}, AUTH, use_colpali=False))
    docs = run(services.database.get_documents(
        AUTH, filters={}, system_filters={"status": None}))
    doomed = [d for d in docs if d.filename == "doom.txt"]
    assert doomed and doomed[0].system_metadata["status"] == "failed"
    assert "embed exploded" in doomed[0].system_metadata.get("error", "")


def test_update_file_redetects_content_type(services):
    """Regression: replacing a document's file with different-format
    bytes must re-detect content_type before re-ingestion."""
    doc = run(services.ingestion_service.ingest_text(
        "original plain text", "swap.txt", {}, AUTH, use_colpali=False))
    png = _page_image_bytes("now an image", (90, 20, 20))
    updated = run(services.ingestion_service.update_document(
        doc.external_id, AUTH, file_bytes=png, filename="swap.png", use_colpali=False))
    assert updated.content_type == "image/png", updated.content_type
    assert updated.system_metadata["status"] == "completed"


def test_register_app_idempotent_quota(services):
    """Regression: re-registering the same app_id must not inflate the
    apps quota counter."""
    us = services.user_service
    old_enforce = us.enforce
    us.enforce = True  # free tier caps apps at 1: a non-idempotent
    try:  # register would raise on the second call
        run(us.register_app("appX", "X", "quota_user", "morphik://x@h"))
        run(us.register_app("appX", "X-renamed", "quota_user", "morphik://x@h"))
        usage = run(us.get_user_limits("quota_user"))
        assert usage["usage"]["apps_used"] == 1, usage
        app = run(us.get_app("appX"))
        assert app["name"] == "X-renamed"  # re-register still updates
    finally:
        us.enforce = old_enforce


def test_rerank_oversample_never_below_k(services):
    """Regression: use_reranking with k > the 20-candidate oversample
    cap must still return up to k results."""
    for i in range(25):
        run(services.ingestion_service.ingest_text(
            f"reranked corpus item number {i} about turbines",
            f"rr{i}.txt", {"rrsuite": True}, AUTH, use_colpali=False))
    res = run(services.document_service.retrieve_chunks(
        "turbines corpus item", AUTH, k=24, use_colpali=False, use_reranking=True,
        filters={"rrsuite": True}))
    assert len(res) == 24, len(res)

@pytest.fixture(scope="module", autouse=True)
def _loop_lifecycle():
    """Run pending callbacks (async-generator aclose tasks scheduled at
    GC) and CLOSE the module loop — an abandoned loop turns those into
    'Task was destroyed but it is pending!' at interpreter exit."""
    yield
    try:
        _LOOP.run_until_complete(asyncio.sleep(0.05))
    finally:
        _LOOP.close()


def test_fused_ingest_fde_matches_store_encode(tmp_path):
    """Fused ingest FDE (round 4): the device-side FDE computed in the
    embed step must match the store's own encode_documents bit-for-bit
    at f32, and a store fed fde_vectors must answer queries identically
    to one that encodes for itself (ingest skips the multivector
    re-upload through the relay — INGEST_r04.json fde_store stage)."""
    import asyncio

    import numpy as np
    from PIL import Image, ImageDraw

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel
    from morphik_core_tpu.models.schemas import DocumentChunk
    from morphik_core_tpu.ops.fde import FDEConfig
    from morphik_core_tpu.vector_store.tpu_multivector_store import TPUMultiVectorStore

    emb = ColpaliEmbeddingModel(Settings())
    cfg = FDEConfig(dimension=emb.embedding_dim, num_repetitions=4,
                    num_simhash_projections=3, projection_dimension=8)
    emb.fde_config = cfg

    def page(i):
        img = Image.new("RGB", (448, 336), (255, 255, 255))
        d = ImageDraw.Draw(img)
        d.rectangle([20 + 30 * i, 40, 120 + 30 * i, 140], fill=(i * 40 % 255, 80, 200))
        d.text((30, 200), f"page {i}", fill=(0, 0, 0))
        return img

    import io as _io

    def chunk(i):
        buf = _io.BytesIO()
        page(i).save(buf, format="PNG")
        from morphik_core_tpu.models.schemas import Chunk

        return Chunk(content="", metadata={"is_image": True, "_image_bytes": buf.getvalue()})

    loop = asyncio.new_event_loop()
    chunks = [chunk(i) for i in range(3)]
    embs, fused = loop.run_until_complete(emb.embed_for_ingestion_with_fde(chunks))
    assert all(f is not None for f in fused)
    # query-time embeds must NOT pay the FDE dispatch (round-4 review)
    q_only = emb.embed_images([page(0)])
    assert isinstance(q_only, list) and q_only[0].ndim == 2

    # parity with the store-side batched encode
    from morphik_core_tpu.index import MultiVectorIndex

    idx = MultiVectorIndex(cfg)
    ref = idx.encode_documents([np.asarray(e, np.float32) for e in embs])
    np.testing.assert_allclose(np.stack(fused), ref, rtol=1e-5, atol=1e-5)

    # e2e: precomputed-FDE store answers exactly like a self-encoding one
    def doc_chunks():
        return [
            DocumentChunk(document_id=f"d{i}", chunk_number=0, content="",
                          embedding=np.asarray(e, np.float32),
                          metadata={"is_image": True})
            for i, e in enumerate(embs)
        ]

    sa = TPUMultiVectorStore(fde_config=cfg)
    sb = TPUMultiVectorStore(fde_config=cfg)
    ok, _, ma = loop.run_until_complete(
        sa.store_embeddings(doc_chunks(), fde_vectors=list(fused))
    )
    assert ok and ma.get("fde_precomputed") is True
    ok, _, mb = loop.run_until_complete(sb.store_embeddings(doc_chunks()))
    assert ok and "fde_precomputed" not in mb
    for i, e in enumerate(embs):
        ra = loop.run_until_complete(sa.query_similar(np.asarray(e), k=2))
        rb = loop.run_until_complete(sb.query_similar(np.asarray(e), k=2))
        assert [r.document_id for r in ra] == [r.document_id for r in rb]
        assert ra[0].document_id == f"d{i}"
    loop.close()


def test_pipelined_multibatch_colpali_ingest(tmp_path):
    """colpali_store_batch_size=2 over a 5-page ingest: the prefetch
    pipeline (embed batch k+1 in a worker thread while batch k stores)
    must store every chunk exactly once, in order, with fused FDE rows
    intact — retrieval for each page returns that page."""
    root = tmp_path
    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {
                "index_path": str(root / "index"),
                "fde_num_repetitions": 8,
                "fde_num_simhash_projections": 4,
                "fde_projection_dimension": 8,
            },
            "worker": {"max_jobs": 2, "colpali_store_batch_size": 2},
        }
    )
    svc = build_services(settings)
    run(svc.initialize())
    try:
        assert svc.ingestion_service.colpali_embedding_model.fde_config is not None

        async def go():
            import zipfile  # noqa: F401 (keep import-local pattern)

            pages = [_page_image_bytes(f"page {i}", (40 * i % 255, 90, 160)) for i in range(5)]
            docs = []
            for i, png in enumerate(pages):
                d = await svc.ingestion_service.ingest_file_content(
                    png, f"p{i}.png", {"i": i}, AUTH, use_colpali=True
                )
                await svc.job_queue.enqueue_job(
                    "process_ingestion_job", document_id=d.external_id,
                    auth=AUTH.model_dump(mode="json"), use_colpali=True,
                )
                docs.append(d)
            assert await svc.job_queue.drain(180)
            for i, d in enumerate(docs):
                got = await svc.database.get_document(d.external_id, AUTH)
                assert got.system_metadata["status"] == "completed"
                # one page -> one chunk id per store (text + colpali)
                assert len(set(got.chunk_ids)) == 1

            # one multi-page doc through the batch=2 pipeline: 5 pages,
            # 3 embed batches, chunk numbers must stay 0..4 in order
            from morphik_core_tpu.models.schemas import Chunk

            big = await svc.ingestion_service.ingest_file_content(
                pages[0], "book.png", {}, AUTH, use_colpali=True
            )
            chunks = [
                Chunk(content="", metadata={"is_image": True,
                                            "_image_bytes": pages[i % 5]})
                for i in range(5)
            ]
            await svc.ingestion_service._embed_and_store(big, [], chunks, AUTH, True)
            assert len(big.chunk_ids) == 5
            nums = [int(cid.rsplit("-", 1)[-1]) for cid in big.chunk_ids]
            assert nums == [0, 1, 2, 3, 4]

        run(go())
    finally:
        run(svc.shutdown())


def test_prefetch_pipeline_depth_and_cancellation(services, monkeypatch):
    """The depth-N prefetch in _embed_and_store: embed batches complete
    OUT of dispatch order (batch 0 slowest) yet stores land in chunk
    order; depth larger than the batch count is safe; a store failure
    cancels every in-flight embed future instead of leaking it."""
    import threading
    import time as _time

    from morphik_core_tpu.models.schemas import Chunk, Document

    ing = services.ingestion_service
    calls = []
    release = threading.Event()

    class StubEmbed:
        def embed_for_ingestion_sync(self, sub):
            order = len(calls)
            calls.append([c.metadata["i"] for c in sub])
            if order == 0:  # first batch slowest: later dispatches finish first
                release.wait(10)
            else:
                release.set()
                _time.sleep(0.01)
            return [np.ones((3, 8), np.float32) * c.metadata["i"] for c in sub], []

    stored = []

    class StubStore:
        async def store_embeddings(self, doc_chunks, app_id=None, fde_vectors=None):
            stored.extend(c.chunk_number for c in doc_chunks)
            return True, [f"{c.document_id}-{c.chunk_number}" for c in doc_chunks], {}

    monkeypatch.setattr(ing, "colpali_embedding_model", StubEmbed())
    monkeypatch.setattr(ing, "colpali_vector_store", StubStore())
    monkeypatch.setattr(ing.settings.worker, "colpali_store_batch_size", 2)
    monkeypatch.setattr(ing.settings.worker, "ingest_embed_prefetch", 8)  # > n batches

    doc = Document(external_id="pf", content_type="image/png", filename="x.png")
    chunks = [Chunk(content="", metadata={"is_image": True, "i": i}) for i in range(5)]
    run(ing._embed_and_store(doc, [], chunks, AUTH, True))
    assert stored == [0, 1, 2, 3, 4]
    assert len(doc.chunk_ids) == 5
    assert sorted(x for call in calls for x in call) == [0, 1, 2, 3, 4]

    # failure mid-store: in-flight embed futures must be awaited/cancelled
    stored.clear()
    calls.clear()
    release.clear()

    class BoomStore(StubStore):
        async def store_embeddings(self, doc_chunks, app_id=None, fde_vectors=None):
            raise RuntimeError("disk full")

    monkeypatch.setattr(ing, "colpali_vector_store", BoomStore())
    release.set()  # don't block the stub embeds
    doc2 = Document(external_id="pf2", content_type="image/png", filename="y.png")
    with pytest.raises(RuntimeError, match="disk full"):
        run(ing._embed_and_store(doc2, [], chunks, AUTH, True))
    # nothing half-registered and no stray in-flight embed futures (the
    # fixture's job-queue worker loops are expected long-lived tasks)
    assert doc2.chunk_ids == []
    pending = [
        t for t in asyncio.all_tasks(_LOOP)
        if not t.done() and "_embed" in repr(t.get_coro())
    ]
    assert pending == []
