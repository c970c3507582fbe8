"""File-type parse router (reference core/parser/morphik_parser.py:196-664).

Routes by detected content type:
  text/*            -> read-through
  xlsx              -> markdown tables (office.py)
  docx              -> paragraphs (office.py)
  pptx              -> per-slide text (office.py)
  pdf               -> extract_pages_text (pdf.py)
  xml               -> XMLChunker structural chunks
  video/*           -> VideoParser (frame descriptions; requires a
                       vision describe_fn)
  everything else   -> best-effort utf-8 decode

split_text applies the recursive splitter; an optional ContextualChunker
(LLM chunk-situating, reference :110-193) wraps it when configured."""

from __future__ import annotations

import logging
from typing import Any, Awaitable, Callable, Dict, List, Optional, Tuple

from morphik_core_tpu.config import Settings, get_settings
from morphik_core_tpu.models.schemas import Chunk
from morphik_core_tpu.parser.office import docx_to_text, pptx_to_slides, xlsx_to_markdown
from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter
from morphik_core_tpu.parser.xml_chunker import XMLChunker
from morphik_core_tpu.storage.content_types import DOCX, PPTX, XLSX, detect_content_type
from morphik_core_tpu.utils.fast_ops import clean_control_chars

logger = logging.getLogger(__name__)

CompleteFn = Callable[[str], Awaitable[str]]


class ParseAPIError(RuntimeError):
    """All remote parse endpoints failed (parser_mode="api")."""


class ContextualChunker:
    """LLM-prefixes each chunk with situating context (reference :110-193)."""

    PROMPT = (
        "<document>\n{document}\n</document>\n"
        "Here is the chunk we want to situate within the whole document\n"
        "<chunk>\n{chunk}\n</chunk>\n"
        "Please give a short succinct context to situate this chunk within "
        "the overall document for the purposes of improving search retrieval "
        "of the chunk. Answer only with the succinct context and nothing else."
    )

    def __init__(self, splitter: RecursiveCharacterTextSplitter, complete_fn: CompleteFn):
        self.splitter = splitter
        self.complete_fn = complete_fn

    async def split_text(self, text: str) -> List[Chunk]:
        base = self.splitter.split_text(text)
        out = []
        for c in base:
            try:
                ctx = await self.complete_fn(self.PROMPT.format(document=text[:40000], chunk=c))
                ctx = (ctx or "").strip()
                # only prefix usable context — an empty/failed/stub answer
                # must not pollute the retrievable chunk text
                if ctx and not ctx.startswith("[offline-stub]"):
                    out.append(Chunk(content=f"{ctx}; {c}", metadata={}))
                else:
                    out.append(Chunk(content=c, metadata={}))
            except Exception as e:  # noqa: BLE001
                logger.warning("contextual chunking failed (%s); using raw chunk", e)
                out.append(Chunk(content=c, metadata={}))
        return out


class MorphikParser:
    def __init__(
        self,
        settings: Optional[Settings] = None,
        describe_fn=None,
        complete_fn: Optional[CompleteFn] = None,
        ocr_engine=None,
    ):
        self.settings = settings or get_settings()
        p = self.settings.parser
        self.splitter = RecursiveCharacterTextSplitter(p.chunk_size, p.chunk_overlap)
        self.xml_chunker = XMLChunker(max_tokens=p.xml_max_tokens)
        self.frame_sample_rate = p.frame_sample_rate
        self.describe_fn = describe_fn
        self.contextual = (
            ContextualChunker(self.splitter, complete_fn)
            if p.use_contextual_chunking and complete_fn
            else None
        )
        if ocr_engine is None:
            from morphik_core_tpu.parser.ocr import get_ocr_engine

            ocr_engine = get_ocr_engine(self.settings)
        self.ocr_engine = ocr_engine
        self.parser_mode = p.parser_mode
        self.parse_api_endpoints = [e.rstrip("/") for e in p.parse_api_endpoints]
        self.parse_api_key = p.parse_api_key

    # ------------------------------------------------------------------

    async def parse_file_to_text(
        self, file: bytes, filename: Optional[str] = None, content_type: Optional[str] = None
    ) -> Tuple[Dict[str, Any], str]:
        """-> (additional_metadata, text)."""
        ctype = content_type or detect_content_type(file, filename)
        try:
            if ctype in ("text/html", "application/xhtml+xml") or (
                ctype.startswith("text/") and file.lstrip()[:100].lower().startswith((b"<!doctype html", b"<html"))
            ):
                from morphik_core_tpu.parser.html_text import html_to_text

                title, text = html_to_text(file)
                return ({"title": title} if title else {}), clean_control_chars(text)
            if ctype.startswith("text/") or ctype in ("application/json",):
                return {}, clean_control_chars(file.decode("utf-8", errors="replace"))
            if self.parser_mode == "api" and (
                ctype in ("application/pdf", XLSX, DOCX, PPTX) or ctype.startswith("image/")
            ):
                # remote parse with endpoint failover (reference
                # morphik_parser.py:502-525); raises when all are down,
                # letting the ingestion ladder decide
                text = await self._parse_via_api(file, filename or "file")
                return {}, clean_control_chars(text)
            if ctype == XLSX:
                return {}, xlsx_to_markdown(file)
            if ctype == DOCX:
                return {}, docx_to_text(file)
            if ctype == PPTX:
                slides = pptx_to_slides(file)
                return {"slide_count": len(slides)}, "\n\n".join(
                    f"## Slide {i + 1}\n{s}" for i, s in enumerate(slides)
                )
            if ctype == "application/pdf":
                # ONE parse+inflate pass yields both page text and the
                # positioned blocks table detection needs. No parse
                # endpoint / layout model needed for born-digital PDFs:
                # recover table grids geometrically from the text-
                # positioning operators and merge them as markdown so the
                # splitter produces searchable table chunks (reference
                # TableFormer merge, morphik_parser.py:552-582)
                from morphik_core_tpu.parser.pdf import extract_pages_text_and_blocks
                from morphik_core_tpu.parser.table_detect import detect_tables_from_blocks

                pages, page_blocks = extract_pages_text_and_blocks(file)
                per_page_tables = [detect_tables_from_blocks(b) for b in page_blocks]
                n_tables = 0
                parts = []
                for i, pg in enumerate(pages):
                    seg = [pg] if pg else []
                    if i < len(per_page_tables) and per_page_tables[i]:
                        seg.extend(per_page_tables[i])
                        n_tables += len(per_page_tables[i])
                    if seg:
                        parts.append("\n\n".join(seg))
                meta: Dict[str, Any] = {"page_count": len(pages)}
                if n_tables:
                    meta["detected_tables"] = n_tables
                return meta, "\n\n".join(parts)
            if ctype.startswith("video/"):
                return await self._parse_video(file)
            if ctype in ("application/xml", "text/xml") or (filename or "").lower().endswith(".xml"):
                return {}, clean_control_chars(file.decode("utf-8", errors="replace"))
        except ParseAPIError:
            raise  # all remote endpoints down — the ingestion ladder decides
        except Exception as e:  # noqa: BLE001
            logger.warning("parse of %s (%s) failed: %s — falling back to utf-8 decode", filename, ctype, e)
        return {}, clean_control_chars(file.decode("utf-8", errors="replace"))

    async def _parse_via_api(self, file: bytes, filename: str) -> str:
        """POST the document to each configured parse endpoint until one
        succeeds (reference _parse_document_via_api, :502-525)."""
        if not self.parse_api_endpoints:
            raise ParseAPIError("parser_mode=api but no parse_api_endpoints configured")
        import asyncio as _asyncio
        import json as _json
        import re as _re
        import urllib.error
        import urllib.request

        # the filename is user-supplied: strip CR/LF/quotes so it cannot
        # terminate the Content-Disposition line or inject headers/fields
        # into the multipart body
        filename = _re.sub(r'[\r\n"\\]', "_", filename or "file")[:255]

        def post(endpoint: str) -> str:
            import uuid as _uuid

            # random per-request boundary: document bytes containing a
            # fixed guessable boundary would truncate the part / inject
            # extra form fields into the request
            boundary = f"----morphikparse{_uuid.uuid4().hex}"
            body = (
                f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
                "Content-Type: application/octet-stream\r\n\r\n"
            ).encode() + file + (
                f"\r\n--{boundary}\r\n"
                'Content-Disposition: form-data; name="filename"\r\n\r\n'
                f"{filename}\r\n--{boundary}--\r\n"
            ).encode()
            headers = {"Content-Type": f"multipart/form-data; boundary={boundary}"}
            if self.parse_api_key:
                headers["Authorization"] = f"Bearer {self.parse_api_key}"
            req = urllib.request.Request(endpoint, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=300.0) as resp:
                return _json.loads(resp.read().decode()).get("text", "")

        last: Optional[Exception] = None
        for ep in self.parse_api_endpoints:
            try:
                return await _asyncio.to_thread(post, ep)
            except Exception as e:  # noqa: BLE001 — try the next endpoint
                logger.warning("parse API %s failed: %s", ep, e)
                last = e
        raise ParseAPIError(f"all parse API endpoints failed: {last}")

    async def parse_file_to_text_deep(
        self, file: bytes, filename: Optional[str] = None, content_type: Optional[str] = None
    ) -> Tuple[Dict[str, Any], str]:
        """Expensive fallback after normal parsing produced no text
        (reference _parse_document_local_deep + EasyOCR,
        morphik_parser.py:552-582): rasterize pages and OCR them through
        the configured engine. Returns ({}, "") when OCR is unavailable —
        the ladder then records the document as unsearchable."""
        if self.ocr_engine is None:
            return {}, ""
        ctype = content_type or detect_content_type(file, filename)
        images = []
        if ctype == "application/pdf":
            from morphik_core_tpu.parser.pdf import rasterize_pdf

            images, _ = rasterize_pdf(file, dpi=self.settings.pdf.colpali_pdf_dpi)
        elif ctype.startswith("image/"):
            import io as _io

            from PIL import Image as _Image

            images = [_Image.open(_io.BytesIO(file)).convert("RGB")]
        if not images:
            return {}, ""
        pages = await self.ocr_engine.images_to_structured(images)
        parts, n_tables = [], 0
        for pg in pages:
            seg = [pg.get("text", "").strip()]
            tables = [t.strip() for t in pg.get("tables", []) if t and t.strip()]
            n_tables += len(tables)
            # markdown tables become part of the page text so the
            # splitter produces searchable table chunks (reference deep
            # parse merges TableFormer output the same way)
            seg.extend(tables)
            seg = [s for s in seg if s]
            if seg:
                parts.append("\n\n".join(seg))
        text = "\n\n".join(parts)
        meta: Dict[str, Any] = {}
        if text:
            meta["ocr_pages"] = len(images)
            if n_tables:
                meta["ocr_tables"] = n_tables
        return meta, clean_control_chars(text)

    async def _parse_video(self, file: bytes) -> Tuple[Dict[str, Any], str]:
        from morphik_core_tpu.parser.video_parser import OpenAITranscriptionClient, VideoParser

        transcribe = None
        pc = self.settings.parser if self.settings else None
        if pc is not None and pc.transcription_api_base:
            transcribe = OpenAITranscriptionClient(
                pc.transcription_api_base, pc.transcription_api_key, pc.transcription_model
            )
        parser = VideoParser(file, describe_fn=self.describe_fn,
                             frame_sample_rate=self.frame_sample_rate, transcribe_fn=transcribe)
        result = await parser.process_video()
        frames = result["frame_descriptions"]
        transcript = result["transcript"]
        meta = {
            "frame_description": frames.time_to_content,
            "transcript": transcript.time_to_content,
        }
        text = "\n".join(frames.contents) + ("\n" + "\n".join(transcript.contents) if transcript.contents else "")
        return meta, text

    # ------------------------------------------------------------------

    async def split_text(self, text: str) -> List[Chunk]:
        if self.contextual is not None:
            return await self.contextual.split_text(text)
        return [Chunk(content=c, metadata={}) for c in self.splitter.split_text(text)]

    def parse_and_chunk_xml(self, xml_text: str) -> List[Chunk]:
        return [
            Chunk(content=c["content"], metadata={"xml": {"breadcrumbs": c["breadcrumbs"], "tag": c["tag"]}})
            for c in self.xml_chunker.chunk(xml_text)
        ]

    @staticmethod
    def is_xml_file(filename: Optional[str], content_type: Optional[str]) -> bool:
        if content_type in ("application/xml", "text/xml"):
            return True
        return bool(filename and filename.lower().endswith(".xml"))
