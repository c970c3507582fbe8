"""v2 pipeline tests: page-XML ingest -> filtered cosine retrieval
(reference v2_document_service.py / chunk_v2_store.py / routes/v2.py)."""

import asyncio
import sys

import httpx
import pytest

sys.path.insert(0, "tests")

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("v2")
    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "morphik": {"enable_colpali": False, "colpali_mode": "off"},
        }
    )
    services = build_services(settings)
    run(services.initialize())
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    run(srv.start())
    yield f"http://127.0.0.1:{srv.port}"
    run(srv.stop())
    run(services.shutdown())


def test_v2_ingest_retrieve_delete(server):
    from test_parser import make_pdf

    async def go():
        async with httpx.AsyncClient(base_url=server, timeout=120) as c:
            pdf = make_pdf(["Fusion output was 42 terajoules.", "Second page about cooling systems."])
            r = await c.post(
                "/v2/documents",
                files={"file": ("fusion.pdf", pdf, "application/pdf")},
                data={"metadata": '{"plant": "alpha"}'},
            )
            assert r.status_code == 200, r.text
            doc = r.json()
            assert doc["system_metadata"]["status"] == "completed"
            assert doc["system_metadata"]["page_count"] == 2

            r = await c.post("/v2/retrieve/chunks", json={"query": "fusion terajoules", "k": 2})
            chunks = r.json()
            assert chunks and chunks[0]["document_id"] == doc["external_id"]
            assert chunks[0]["content"].startswith('<page n="0">')
            assert "42 terajoules" in chunks[0]["content"]

            # metadata filter
            r = await c.post("/v2/retrieve/chunks", json={"query": "fusion", "k": 2, "filters": {"plant": "beta"}})
            assert r.json() == []

            r = await c.delete(f"/v2/documents/{doc['external_id']}")
            assert r.json()["status"] == "deleted"
            r = await c.post("/v2/retrieve/chunks", json={"query": "fusion terajoules", "k": 2})
            assert all(ch["document_id"] != doc["external_id"] for ch in r.json())

    run(go())


def test_pdf_block_bboxes():
    """extract_pages_blocks: positioned blocks with sane bboxes
    (x grows with text, y near the Td position, origin bottom-left)."""
    from tests.test_parser import make_pdf

    from morphik_core_tpu.parser.pdf import extract_pages_blocks

    pdf = make_pdf(["Alpha line\nBeta line", "Gamma page"])
    pages = extract_pages_blocks(pdf)
    assert len(pages) == 2
    b = pages[0][0]
    assert "Alpha line" in b.text and "Beta line" in b.text
    x0, y0, x1, y1 = b.bbox
    assert 0 < x0 < x1 and 0 < y0 < y1 <= 800


def test_v2_page_xml_carries_bboxes(server):
    base = server
    from tests.test_parser import make_pdf

    async def go():
        import httpx

        async with httpx.AsyncClient(base_url=base, timeout=120.0) as c:
            pdf = make_pdf(["Coolant pressure nominal at 3 bar."])
            r = await c.post("/v2/documents", files={"file": ("p.pdf", pdf, "application/pdf")})
            assert r.status_code == 200, r.text
            r = await c.post("/v2/retrieve/chunks", json={"query": "coolant pressure", "k": 1})
            assert r.status_code == 200 and r.json()
            content = r.json()[0]["content"]
            assert content.startswith('<page n="0">')
            assert 'bbox="' in content

    run(go())

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
