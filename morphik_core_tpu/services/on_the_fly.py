"""Morphik On-the-Fly: one-shot document analysis without prior ingestion
(reference core/services/morphik_on_the_fly_structured_output.py +
routes/ingest.py:471 POST /ingest/document/query).

The reference sends the raw document to Gemini with a JSON-schema-typed
response. Here the uploaded file is parsed locally (same parser router as
ingestion) and the text is fed to the configured completion model with an
optional `response_schema` for structured output; page images could be
attached for vision models via data URIs.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

from morphik_core_tpu.models.schemas import CompletionRequest

logger = logging.getLogger(__name__)

MAX_DOCUMENT_BYTES = 50 * 1024 * 1024  # reference MORPHIK_ON_THE_FLY_MAX_DOCUMENT_BYTES
MAX_CONTEXT_CHARS = 200_000


class OnTheFlyError(Exception):
    pass


class OnTheFlyService:
    def __init__(self, parser, completion_model):
        self.parser = parser
        self.completion_model = completion_model

    async def query_document(
        self,
        file_bytes: bytes,
        filename: Optional[str],
        prompt: str,
        schema: Optional[Dict[str, Any]] = None,
        content_type: Optional[str] = None,
    ) -> Dict[str, Any]:
        """-> {completion, structured_output, usage, metadata}."""
        if not file_bytes:
            raise OnTheFlyError("uploaded file is empty")
        if len(file_bytes) > MAX_DOCUMENT_BYTES:
            raise OnTheFlyError(
                f"uploaded file exceeds limit of {MAX_DOCUMENT_BYTES // (1024 * 1024)} MB"
            )
        try:
            _meta, text = await self.parser.parse_file_to_text(
                file_bytes, filename or "upload", content_type
            )
        except Exception as e:  # noqa: BLE001
            raise OnTheFlyError(f"failed to parse document: {e}") from e
        if not text.strip():
            raise OnTheFlyError("document produced no extractable text")

        request = CompletionRequest(
            query=prompt,
            context_chunks=[text[:MAX_CONTEXT_CHARS]],
            response_schema=schema,
        )
        resp = await self.completion_model.complete(request)
        structured = resp.completion if (schema and not isinstance(resp.completion, str)) else None
        return {
            "completion": resp.completion,
            "structured_output": structured,
            "usage": resp.usage,
            "metadata": {"filename": filename, "parsed_chars": len(text)},
        }
