"""API parser mode + OCR deep-parse ladder (round-1 verdict item 6).

Reference behaviors reproduced:
  - parser_mode="api": POST documents to remote parse endpoints with
    failover (core/parser/morphik_parser.py:502-525);
  - deep parse: OCR pages when normal parsing yields nothing
    (morphik_parser.py:552-582);
  - ingestion ladder: native -> text fallback -> deep OCR ->
    accept-but-unsearchable (ingestion_worker.py:764-902).
"""

import asyncio

from conftest import run_once
import json
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from morphik_core_tpu.config import Settings
from morphik_core_tpu.models.schemas import AuthContext, EntityType
from morphik_core_tpu.parser.morphik_parser import MorphikParser, ParseAPIError
from morphik_core_tpu.parser.ocr import ApiOCR, CallableOCR

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


def _make_pdf(pages_text):
    import importlib.util
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location("_tp", os.path.join(here, "test_parser.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_pdf(pages_text)


def make_blank_pdf(n_pages):
    """A 'scanned' PDF: pages exist but carry no text operators."""
    objs = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    objs.append(f"2 0 obj<</Type/Pages/Kids[{kids}]/Count {n_pages}>>endobj\n".encode())
    for i in range(n_pages):
        objs.append(
            f"{3 + i} 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]>>endobj\n".encode()
        )
    return b"%PDF-1.4\n" + b"".join(objs) + b"trailer<</Root 1 0 R>>\n%%EOF"


@pytest.fixture(scope="module")
def fake_endpoint():
    """One HTTP server doing double duty: /parse (multipart in, text out)
    and /ocr (PNG in, text out)."""
    state = {"parse_calls": 0, "ocr_calls": 0, "auth": []}

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            state["auth"].append(self.headers.get("Authorization"))
            if self.path == "/parse":
                state["parse_calls"] += 1
                out = {"text": "REMOTE PARSED TEXT from the parse API"}
            elif self.path.startswith("/ocr"):
                state["ocr_calls"] += 1
                state["last_ocr_path"] = self.path
                assert body[:8] == b"\x89PNG\r\n\x1a\n"
                out = {"text": f"OCR TEXT page {state['ocr_calls']}"}
                if "tables=true" in self.path:
                    state["table_calls"] = state.get("table_calls", 0) + 1
                    out["tables"] = [
                        "| part | torque Nm |\n|---|---|\n| flux coupler | 42 |"
                    ]
            else:
                self.send_response(404)
                self.end_headers()
                return
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _parser(settings_dict, **kw):
    return MorphikParser(Settings.model_validate(settings_dict), **kw)


def test_api_parser_mode_with_failover(fake_endpoint, tmp_path):
    base, state = fake_endpoint
    parser = _parser(
        {
            "parser": {
                "parser_mode": "api",
                # first endpoint is dead -> failover to the live one
                "parse_api_endpoints": ["http://127.0.0.1:9/parse", f"{base}/parse"],
                "parse_api_key": "parse-key-1",
            }
        }
    )
    pdf = _make_pdf(["Local text that must NOT be used in api mode."])
    meta, text = run(parser.parse_file_to_text(pdf, "doc.pdf"))
    assert text == "REMOTE PARSED TEXT from the parse API"
    assert state["parse_calls"] == 1
    assert "Bearer parse-key-1" in state["auth"]

    # text files bypass the parse API
    meta, text = run(parser.parse_file_to_text(b"plain text", "a.txt"))
    assert text == "plain text" and state["parse_calls"] == 1


def test_api_parser_mode_all_down_raises():
    parser = _parser(
        {
            "parser": {
                "parser_mode": "api",
                "parse_api_endpoints": ["http://127.0.0.1:9/parse"],
            }
        }
    )
    with pytest.raises(ParseAPIError):
        run(parser.parse_file_to_text(_make_pdf(["x"]), "doc.pdf"))


def test_deep_parse_ocr_api(fake_endpoint):
    base, state = fake_endpoint
    parser = _parser(
        {"parser": {"ocr_mode": "api", "ocr_api_endpoint": f"{base}/ocr"}}
    )
    assert isinstance(parser.ocr_engine, ApiOCR)
    pdf = make_blank_pdf(2)
    meta, text = run(parser.parse_file_to_text_deep(pdf, "scan.pdf"))
    assert "OCR TEXT page" in text
    assert meta["ocr_pages"] == 2
    assert state["ocr_calls"] == 2


def test_deep_parse_without_ocr_returns_empty():
    parser = _parser({"parser": {"ocr_mode": "none"}})
    assert parser.ocr_engine is None
    meta, text = run(parser.parse_file_to_text_deep(make_blank_pdf(1), "scan.pdf"))
    assert text == "" and meta == {}


# ------------------------------------------------------- ingestion ladder


@pytest.fixture()
def svc(tmp_path):
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
            "morphik": {"enable_colpali": False},
        }
    )
    s = build_services(settings)
    run(s.initialize())
    yield s
    run(s.shutdown())


AUTH = AuthContext(
    entity_type=EntityType.DEVELOPER, entity_id="dev", permissions={"read", "write", "admin"},
    user_id="dev",
)


def test_ladder_deep_ocr_recovers_scanned_pdf(svc):
    """Scanned PDF + no colpali + OCR configured -> deep rung produces
    text chunks and the document is searchable."""
    svc.ingestion_service.parser.ocr_engine = CallableOCR(
        lambda img: "dilithium crystal maintenance schedule"
    )
    doc = run(
        svc.ingestion_service.ingest_file_content(
            make_blank_pdf(1), "scan.pdf", {}, AUTH, use_colpali=False
        )
    )
    out = run(svc.ingestion_service.process_ingestion_job(doc.external_id, AUTH, use_colpali=False))
    assert out.system_metadata["status"] == "completed"
    assert "unsearchable" not in out.system_metadata
    assert "deep_parse" in out.system_metadata["phase_times"]
    res = run(
        svc.document_service.retrieve_chunks("dilithium maintenance", AUTH, k=1, use_colpali=False)
    )
    assert res and "dilithium" in res[0].content


def test_ladder_table_aware_deep_parse(svc, fake_endpoint):
    """Round-3 verdict item 9: the deep-parse rung asks the OCR api for
    table structure (?tables=true) and the returned markdown tables
    become searchable chunks (reference TableFormer deep parse,
    core/parser/morphik_parser.py:552-582)."""
    from morphik_core_tpu.parser.ocr import ApiOCR

    base, state = fake_endpoint
    svc.ingestion_service.parser.ocr_engine = ApiOCR(f"{base}/ocr", tables=True)
    doc = run(
        svc.ingestion_service.ingest_file_content(
            make_blank_pdf(1), "scan_table.pdf", {}, AUTH, use_colpali=False
        )
    )
    out = run(svc.ingestion_service.process_ingestion_job(doc.external_id, AUTH, use_colpali=False))
    assert out.system_metadata["status"] == "completed"
    assert "unsearchable" not in out.system_metadata
    stored = run(svc.database.get_document(doc.external_id, AUTH))
    assert stored.additional_metadata.get("ocr_tables") == 1
    assert state.get("table_calls", 0) >= 1
    res = run(
        svc.document_service.retrieve_chunks("flux coupler torque", AUTH, k=1, use_colpali=False)
    )
    assert res and "| flux coupler | 42 |" in res[0].content


def test_ocr_tables_url_join_preserves_existing_query(fake_endpoint):
    """?tables=true must join with '&' when the endpoint already carries
    a query string (key-in-URL auth)."""
    import asyncio

    from PIL import Image

    from morphik_core_tpu.parser.ocr import ApiOCR

    base, state = fake_endpoint
    ocr = ApiOCR(f"{base}/ocr?key=abc", tables=True)
    out = run_once(
        ocr.image_to_structured(Image.new("RGB", (20, 20), "white"))
    )
    assert out["tables"], out
    assert state["last_ocr_path"].endswith("/ocr?key=abc&tables=true"), state["last_ocr_path"]


def test_ladder_unsearchable_without_ocr(svc):
    """Scanned PDF + no OCR -> accepted but flagged unsearchable."""
    svc.ingestion_service.parser.ocr_engine = None
    doc = run(
        svc.ingestion_service.ingest_file_content(
            make_blank_pdf(1), "scan2.pdf", {}, AUTH, use_colpali=False
        )
    )
    out = run(svc.ingestion_service.process_ingestion_job(doc.external_id, AUTH, use_colpali=False))
    assert out.system_metadata["status"] == "completed"
    assert out.system_metadata.get("unsearchable") is True


def test_tesseract_probe_success_with_fake_module(monkeypatch, svc):
    """The pytesseract seam end-to-end: a fake pytesseract module makes
    get_ocr_engine(ocr_mode='tesseract') build TesseractOCR, and a
    scanned PDF ingests searchable through it (the reference's local
    EasyOCR rung, morphik_parser.py:552-582)."""
    import sys
    import types

    from morphik_core_tpu.parser.ocr import TesseractOCR, get_ocr_engine

    fake = types.ModuleType("pytesseract")
    fake.image_to_string = lambda image: f"TESS {image.size[0]}x{image.size[1]}"
    monkeypatch.setitem(sys.modules, "pytesseract", fake)

    class S:
        class parser:
            ocr_mode = "tesseract"

    engine = get_ocr_engine(S)
    assert isinstance(engine, TesseractOCR)

    svc.ingestion_service.parser.ocr_engine = engine
    doc = run(
        svc.ingestion_service.ingest_file_content(
            make_blank_pdf(1), "scan3.pdf", {}, AUTH, use_colpali=False
        )
    )
    out = run(svc.ingestion_service.process_ingestion_job(doc.external_id, AUTH, use_colpali=False))
    assert out.system_metadata["status"] == "completed"
    assert "unsearchable" not in out.system_metadata
    stored = run(svc.database.get_document(doc.external_id, AUTH))
    assert stored.additional_metadata.get("ocr_pages") == 1
    # the OCR'd text is retrievable
    res = run(svc.document_service.retrieve_chunks("TESS", AUTH, k=1, use_colpali=False))
    assert res and "TESS" in res[0].content


def test_tesseract_probe_failure_is_logged(monkeypatch, caplog):
    """Probe failure paths: ocr_mode='tesseract' logs a warning,
    'auto' logs at info; both return None instead of raising."""
    import builtins
    import logging

    real_import = builtins.__import__

    def no_pytesseract(name, *a, **kw):
        if name == "pytesseract":
            raise ImportError("No module named 'pytesseract'")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_pytesseract)
    import sys

    monkeypatch.delitem(sys.modules, "pytesseract", raising=False)
    from morphik_core_tpu.parser.ocr import get_ocr_engine

    class S:
        class parser:
            ocr_mode = "tesseract"

    with caplog.at_level(logging.INFO, logger="morphik_core_tpu.parser.ocr"):
        assert get_ocr_engine(S) is None
        S.parser.ocr_mode = "auto"
        assert get_ocr_engine(S) is None
    msgs = [r.getMessage() for r in caplog.records]
    assert any("ocr_mode=tesseract" in m and "probe failed" in m for m in msgs)
    assert any("ocr_mode=auto" in m and "probe failed" in m for m in msgs)

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
