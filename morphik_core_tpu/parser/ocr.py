"""Pluggable OCR engines for the deep-parse fallback.

The reference's deep parse runs EasyOCR + accurate table structure
through Docling (core/parser/morphik_parser.py:552-582) when normal
parsing yields no chunks. Neither EasyOCR nor tesseract ships in this
image, so OCR is a pluggable interface:

  - ApiOCR   : POST the page image to a remote OCR endpoint
               ({"text": ...} JSON back) — the production path, same
               shape as the reference's remote parse API.
  - CallableOCR: wrap any (PIL.Image) -> str callable (tests, local
               engines when available).
  - get_ocr_engine(settings): builds from [parser] ocr_mode config;
               probes pytesseract when ocr_mode="auto".
"""

from __future__ import annotations

import asyncio
import io
import json
import logging
import urllib.request
from typing import Callable, List, Optional

from PIL import Image

logger = logging.getLogger(__name__)


class BaseOCR:
    async def image_to_text(self, image: Image.Image) -> str:
        raise NotImplementedError

    async def images_to_text(self, images: List[Image.Image]) -> List[str]:
        return [await self.image_to_text(im) for im in images]

    async def image_to_structured(self, image: Image.Image) -> dict:
        """Text + extracted tables for one page. Engines without table
        structure return {"text": ..., "tables": []} (the reference's
        deep parse enables accurate TableFormer table structure,
        core/parser/morphik_parser.py:552-582)."""
        return {"text": await self.image_to_text(image), "tables": []}

    async def images_to_structured(self, images: List[Image.Image]) -> List[dict]:
        return [await self.image_to_structured(im) for im in images]


class CallableOCR(BaseOCR):
    def __init__(self, fn: Callable[[Image.Image], str]):
        self.fn = fn

    async def image_to_text(self, image: Image.Image) -> str:
        out = self.fn(image)
        if asyncio.iscoroutine(out):
            out = await out
        return out or ""


class ApiOCR(BaseOCR):
    """POST PNG bytes to `{endpoint}` (multipart-free: raw body,
    Content-Type image/png); expects JSON {"text": "..."}. With
    `tables=True` the request carries ?tables=true and the endpoint may
    additionally return {"tables": ["| markdown | table |", ...]} —
    merged into searchable chunks by the deep-parse rung."""

    def __init__(
        self,
        endpoint: str,
        api_key: Optional[str] = None,
        timeout_s: float = 120.0,
        tables: bool = False,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.api_key = api_key
        self.timeout_s = timeout_s
        self.tables = bool(tables)

    def _post_sync(self, png: bytes) -> dict:
        headers = {"Content-Type": "image/png"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        # '&' when the endpoint already carries a query string (e.g.
        # key-in-URL auth) — a second '?' would corrupt the first param
        sep = "&" if "?" in self.endpoint else "?"
        url = self.endpoint + (f"{sep}tables=true" if self.tables else "")
        req = urllib.request.Request(url, data=png, headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read().decode())
        if not isinstance(payload, dict):
            return {"text": "", "tables": []}
        tables = payload.get("tables") or []
        if not isinstance(tables, list):
            tables = []
        return {"text": payload.get("text", "") or "", "tables": [str(t) for t in tables]}

    async def image_to_structured(self, image: Image.Image) -> dict:
        buf = io.BytesIO()
        image.save(buf, format="PNG")
        return await asyncio.to_thread(self._post_sync, buf.getvalue())

    async def image_to_text(self, image: Image.Image) -> str:
        return (await self.image_to_structured(image))["text"]


class TesseractOCR(BaseOCR):
    """Local OCR via pytesseract (needs the `tesseract` binary on PATH;
    neither ships in this image — tests exercise the seam with a fake
    pytesseract module). Operator setup: `apt install tesseract-ocr`,
    `pip install pytesseract`, then `[parser] ocr_mode = "tesseract"`
    (or "auto" to use it whenever the probe succeeds)."""

    def __init__(self):
        import pytesseract  # noqa: F401 — availability probe

        self._tess = pytesseract

    async def image_to_text(self, image: Image.Image) -> str:
        return await asyncio.to_thread(self._tess.image_to_string, image)


def get_ocr_engine(settings) -> Optional[BaseOCR]:
    """Build the configured OCR engine, or None when OCR is off /
    unavailable (the ladder then records the document as unsearchable
    instead of failing)."""
    mode = getattr(settings.parser, "ocr_mode", "none")
    if mode == "none":
        return None
    if mode == "api":
        ep = settings.parser.ocr_api_endpoint
        if not ep:
            logger.warning("ocr_mode=api but no ocr_api_endpoint configured — OCR disabled")
            return None
        return ApiOCR(
            ep,
            api_key=getattr(settings.parser, "ocr_api_key", None),
            tables=getattr(settings.parser, "ocr_tables", True),
        )
    if mode in ("auto", "tesseract"):
        try:
            return TesseractOCR()
        except Exception as e:  # noqa: BLE001 — pytesseract not installed
            if mode == "tesseract":
                logger.warning(
                    "ocr_mode=tesseract but the pytesseract probe failed (%s) — OCR disabled", e
                )
            else:
                logger.info("ocr_mode=auto: pytesseract probe failed (%s) — no local OCR", e)
            return None
    logger.warning("unknown ocr_mode %r — OCR disabled", mode)
    return None
