"""Process-pool rasterization tests (SURVEY.md §7 host-raster bottleneck:
the pool keeps the TPU fed at the 10k pages/min target). Uses the
hand-built PDF from test_parser so the textrender ladder exercises the
pool even without PyMuPDF; with PyMuPDF installed the same code paths
run the native renderer."""

import asyncio

from conftest import run_once

from tests.test_parser import make_pdf

from morphik_core_tpu.parser.raster_pool import RasterPool, _page_count


def run(coro):
    return run_once(coro)


def _pdf(n):
    return make_pdf([f"PAGE {i} CONTENT quarterly revenue {i * 7}" for i in range(n)])


def test_page_count_fallback():
    assert _page_count(_pdf(6)) == 6
    assert _page_count(b"not a pdf") is None


def test_pool_renders_all_pages_in_order():
    data = _pdf(6)
    pool = RasterPool(processes=2)
    try:
        pages = run(pool.rasterize_pdf_jpegs(data, dpi=72))
        assert pages is not None and len(pages) == 6
        assert [i for i, _ in pages] == list(range(6))  # TRUE page indices
        jpegs = [b for _, b in pages]
        assert all(b[:2] == b"\xff\xd8" for b in jpegs)  # JPEG magic
        assert pool._pool is not None  # pool actually engaged
        # page order: decode and check content differs per page
        from io import BytesIO

        from PIL import Image

        import numpy as np

        imgs = [np.asarray(Image.open(BytesIO(b)).convert("L")) for b in jpegs]
        assert not np.array_equal(imgs[0], imgs[5])
    finally:
        pool.shutdown()


def test_small_pdf_stays_in_process():
    pool = RasterPool(processes=4)
    try:
        jpegs = run(pool.rasterize_pdf_jpegs(_pdf(2), dpi=72))
        assert jpegs is not None and len(jpegs) == 2
        assert pool._pool is None  # below _MIN_PAGES_FOR_POOL: no pool spawned
    finally:
        pool.shutdown()


def test_non_pdf_returns_none():
    pool = RasterPool(processes=2)
    assert run(pool.rasterize_pdf_jpegs(b"not a pdf at all")) is None


def test_prep_patches_match_stored_payload():
    """Embed-what-you-store: the prep-mode patches must equal a fresh
    preprocess of the DECODED stored JPEG. Round-5 regression: patches
    computed from pre-encode pixels drifted ~5e-4/token from what a
    query embedded from the payload sees — summed over ~750 tokens
    that's the exact-MaxSim margin between near-duplicate pages, and
    identity top-1 through the production stack fell 1.0 -> 0.525."""
    from io import BytesIO

    from PIL import Image

    import numpy as np

    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8

    pool = RasterPool(processes=0)
    try:
        prep = (4 * 28 * 28, 768 * 28 * 28)
        pages = run(pool.rasterize_pdf_jpegs(_pdf(5), dpi=72, prep=prep))
        assert pages is not None and len(pages) == 5
        non_blank = [t for t in pages if not t[4]]
        assert non_blank, "expected at least one non-blank page"
        for page, jpeg, patches, grid, blank in non_blank:
            img = Image.open(BytesIO(jpeg)).convert("RGB")
            expect, egrid = preprocess_image_u8(img, min_pixels=prep[0], max_pixels=prep[1])
            assert tuple(grid) == tuple(egrid)
            assert np.array_equal(patches, expect)
    finally:
        pool.shutdown()


def test_ingestion_uses_pool_for_pdf(tmp_path):
    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.models.schemas import AuthContext, EntityType
    from morphik_core_tpu.services_init import build_services

    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(tmp_path / "storage")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "worker": {"raster_processes": 2},
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
    auth = AuthContext(
        entity_type=EntityType.DEVELOPER, entity_id="t",
        permissions={"read", "write", "admin"}, user_id="t",
    )

    async def go():
        doc = await services.ingestion_service.ingest_file_content(
            _pdf(5), "report.pdf", {}, auth, use_colpali=True
        )
        out = await services.ingestion_service.process_ingestion_job(doc.external_id, auth, True)
        assert out.system_metadata["status"] == "completed"
        assert out.system_metadata["page_count"] == 5
        chunks = await services.colpali_vector_store.query_similar(
            (await services.colpali_embedding_model.embed_for_query("quarterly revenue")),
            k=2, app_id=auth.app_id,
        )
        assert chunks and chunks[0].metadata.get("is_image")
        assert chunks[0].content.startswith("data:image/jpeg;base64,")

    loop.run_until_complete(go())
    services.ingestion_service.raster_pool.shutdown()
