"""Process-pool PDF rasterization.

SURVEY.md §7 "hard parts": host-side rasterization is the CPU
bottleneck at the 10k pages/min target (~167 pages/s) — a single
PyMuPDF render loop caps well below that, so page ranges are fanned out
across worker processes (the reference instead batches high-density
pages 2-at-a-time in one process, ingestion_service.py:1640-1696; a
process pool is the idiomatic way to keep a TPU fed from the host).

Workers rasterize a page range and return JPEG bytes (quality 70, the
reference's chunk payload format) so IPC ships compressed images, not
raw bitmaps. Falls back to the in-process ladder when pools are
unavailable or the document is small.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import io
import logging
import os
from typing import List, Optional, Tuple

logger = logging.getLogger(__name__)

_JPEG_QUALITY = 70
_MAX_WIDTH = 1024
_MIN_PAGES_FOR_POOL = 4  # pool overhead isn't worth it below this


def is_blank_page(img, dark_fraction: float = 2e-4, std_threshold: float = 1.0) -> bool:
    """Near-uniform pages are skipped (reference ingestion_service.py:1396-1414).
    A page counts as blank only if it is both low-variance AND has
    (almost) no ink — small text on white must survive downsampling."""
    import numpy as np  # noqa: PLC0415

    small = img.convert("L").resize((128, 128))
    arr = np.asarray(small, dtype=np.float32)
    ink = float((arr < 200).mean())
    return ink < dark_fraction and float(arr.std()) < std_threshold


def _resize(img, max_width: int):
    from PIL import Image  # noqa: PLC0415

    if img.width > max_width:
        img = img.resize((max_width, int(img.height * max_width / img.width)), Image.LANCZOS)
    return img


def _encode(img, max_width: int) -> bytes:
    buf = io.BytesIO()
    _resize(img, max_width).save(buf, format="JPEG", quality=_JPEG_QUALITY)
    return buf.getvalue()


def _finish_page(i: int, img, max_width: int, prep):
    """Render artifact(s) for one page from the in-hand PIL image.

    prep=None -> (i, jpeg) — the classic JPEG-only contract.
    prep=(min_pixels, max_pixels) -> (i, jpeg, patches, grid, blank):
    payload JPEG AND preprocessed u8 patches, plus the blank flag — the
    ingest fast path then skips the embed-side decode+preprocess (on the
    1-core bench host that round trip costs ~70 ms/page, the single
    biggest host tax in the embed phase). The patches are computed from
    the DECODED JPEG, not the pre-encode pixels: stored embeddings must
    match what a query embedded from the stored payload sees — the
    ~5e-4/token pre-vs-post-JPEG drift, summed over ~750 tokens, is the
    same order as the exact-MaxSim margin between near-duplicate pages
    and flipped identity top-1 in the round-5 eval (0.525 vs 1.0).
    preprocess is numpy/PIL-only, safe inside raster worker processes."""
    from PIL import Image  # noqa: PLC0415

    img = _resize(img, max_width)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=_JPEG_QUALITY)
    jpeg = buf.getvalue()
    if prep is None:
        return (i, jpeg)
    stored = Image.open(io.BytesIO(jpeg)).convert("RGB")
    blank = is_blank_page(stored)
    if blank:
        return (i, jpeg, None, None, True)
    from morphik_core_tpu.models.colqwen.preprocess import preprocess_image_u8  # noqa: PLC0415

    patches, grid = preprocess_image_u8(stored, min_pixels=prep[0], max_pixels=prep[1])
    return (i, jpeg, patches, grid, False)


def _raster_range(
    data: bytes, dpi: int, start: int, end: int, max_width: int, prep=None
) -> List[tuple]:
    """Child-process worker: rasterize pages [start, end) -> per-page
    artifacts (`_finish_page`). Same backend ladder as
    parser.pdf.rasterize_pdf: PyMuPDF when available, else the
    text-render fallback."""
    out: List[tuple] = []
    try:
        import fitz  # PyMuPDF  # noqa: PLC0415
        from PIL import Image  # noqa: PLC0415

        with fitz.open(stream=data, filetype="pdf") as pdf:
            mat = fitz.Matrix(dpi / 72.0, dpi / 72.0)
            for i in range(start, min(end, pdf.page_count)):
                try:
                    pix = pdf[i].get_pixmap(matrix=mat, alpha=False)
                    img = Image.frombytes("RGB", (pix.width, pix.height), pix.samples)
                except Exception:  # noqa: BLE001 — per-page failure skips the page
                    continue
                out.append(_finish_page(i, img, max_width, prep))
        return out
    except ImportError:
        pass
    from morphik_core_tpu.parser.pdf import _render_text_page, extract_pages_text  # noqa: PLC0415

    texts = extract_pages_text(data)
    for i in range(start, min(end, len(texts))):
        out.append(_finish_page(i, _render_text_page(texts[i], dpi), max_width, prep))
    return out


def _page_count(data: bytes) -> Optional[int]:
    try:
        import fitz  # noqa: PLC0415

        with fitz.open(stream=data, filetype="pdf") as pdf:
            return pdf.page_count
    except ImportError:
        try:
            from morphik_core_tpu.parser.pdf import extract_pages_text  # noqa: PLC0415

            n = len(extract_pages_text(data))
            return n or None
        except Exception:  # noqa: BLE001
            return None
    except Exception:  # noqa: BLE001
        return None


class RasterPool:
    """Shared process pool for PDF page rendering (lazily started)."""

    def __init__(self, processes: int = 0):
        self.processes = processes if processes > 0 else (os.cpu_count() or 4)
        self._pool: Optional[concurrent.futures.ProcessPoolExecutor] = None

    def _ensure(self) -> concurrent.futures.ProcessPoolExecutor:
        if self._pool is None:
            import multiprocessing  # noqa: PLC0415

            # Not fork: the parent may hold a live TPU client whose state
            # must not be inherited by raster workers. forkserver over
            # spawn: children don't re-execute the user's __main__.
            try:
                ctx = multiprocessing.get_context("forkserver")
            except ValueError:  # platform without forkserver
                ctx = multiprocessing.get_context("spawn")
            self._pool = concurrent.futures.ProcessPoolExecutor(
                max_workers=self.processes, mp_context=ctx
            )
        return self._pool

    def shutdown(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    async def rasterize_pdf_jpegs(
        self, data: bytes, dpi: int = 150, max_width: int = _MAX_WIDTH, prep=None
    ) -> "Optional[List[tuple]]":
        """-> ordered (page_index, JPEG bytes) pairs — or, with
        prep=(min_pixels, max_pixels), (page, jpeg, patches, grid, blank)
        tuples (`_finish_page`) so the embed stage starts from
        ready-made u8 patches. None when the pool path doesn't apply
        (caller falls back to the ladder). Page indices are the TRUE
        physical pages: a failed/skipped page must not shift every later
        page's metadata."""
        n = _page_count(data)
        if n is None:
            return None
        if n < _MIN_PAGES_FOR_POOL or self.processes <= 1:
            loop = asyncio.get_running_loop()
            pages = await loop.run_in_executor(
                None, _raster_range, data, dpi, 0, n, max_width, prep
            )
            return sorted(pages, key=lambda t: t[0])
        pool = self._ensure()
        per = max(1, -(-n // self.processes))  # ceil
        loop = asyncio.get_running_loop()
        futs = [
            loop.run_in_executor(pool, _raster_range, data, dpi, s, s + per, max_width, prep)
            for s in range(0, n, per)
        ]
        parts = await asyncio.gather(*futs, return_exceptions=True)
        pages: List[tuple] = []
        for p in parts:
            if isinstance(p, Exception):
                logger.warning("raster worker failed: %s", p)
                continue
            pages.extend(p)
        if not pages:
            return None
        return sorted(pages, key=lambda t: t[0])
