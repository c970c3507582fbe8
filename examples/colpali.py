"""Minimal end-to-end example (mirrors reference examples/colpali.py):
ingest a PDF with the visual pipeline, retrieve page images by query,
run a RAG completion.

Usage: python examples/colpali.py [path/to/file.pdf]
Runs fully offline (tiny random model unless model.checkpoint_path is
configured in morphik_tpu.toml)."""

import asyncio
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from morphik_core_tpu.models.schemas import AuthContext
from morphik_core_tpu.services_init import build_services


async def main() -> None:
    services = build_services()
    await services.initialize()
    auth = AuthContext(entity_id="example", permissions={"read", "write", "admin"})

    if len(sys.argv) > 1:
        pdf_bytes = Path(sys.argv[1]).read_bytes()
        name = Path(sys.argv[1]).name
    else:  # synthesize a small PDF
        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
        from test_parser import make_pdf

        pdf_bytes = make_pdf(
            ["ACME Q3 report. Revenue grew 18 percent to 4.2M.",
             "Headcount reached 52 employees across 3 offices."]
        )
        name = "acme_q3.pdf"

    doc = await services.ingestion_service.ingest_file_content(
        pdf_bytes, name, {"source": "example"}, auth, use_colpali=True
    )
    await services.ingestion_service.process_ingestion_job(doc.external_id, auth, True)
    print(f"ingested {name} -> {doc.external_id}")

    chunks = await services.document_service.retrieve_chunks(
        "revenue growth", auth, k=2, use_colpali=True, filters={"source": "example"}
    )
    for c in chunks:
        kind = "image" if c.metadata.get("is_image") else "text"
        print(f"  page {c.chunk_number} score={c.score:.3f} [{kind}] {c.content[:60]}...")

    resp = await services.document_service.query(
        "What was the revenue growth?", auth, k=2, use_colpali=True
    )
    print("answer:", resp.completion)
    await services.shutdown()


if __name__ == "__main__":
    asyncio.run(main())
