"""Minimal dependency-free PDF handling.

The reference rasterizes PDFs with PyMuPDF at 150 DPI and falls back to
pdf2image (reference core/services/ingestion_service.py:1567-1638).
Neither native lib ships in this environment, so this module provides:

  - `extract_pages_text`: a small PDF parser (brute object scan,
    FlateDecode streams, BT/ET text operators) good enough for
    digitally-born PDFs. Font CMap decoding is NOT implemented; PDFs
    with subsetted/CID fonts degrade to empty text (the caller falls
    back, mirroring the reference's parse-fallback ladder).
  - `rasterize_pdf`: backend ladder — PyMuPDF if importable ->
    pdf2image if importable -> text-render fallback (extracted page
    text drawn onto a white page at the configured DPI) so the visual
    pipeline stays functional offline.
"""

from __future__ import annotations

import io
import logging
import re
import zlib
from typing import Dict, List, Optional, Tuple

from PIL import Image, ImageDraw, ImageFont

logger = logging.getLogger(__name__)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n", re.S)


def _parse_objects(data: bytes) -> Dict[int, bytes]:
    """Brute-force scan: object number -> raw object body."""
    objs: Dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end == -1:
            continue
        objs[int(m.group(1))] = data[start:end]
    return objs


def _stream_of(body: bytes) -> Optional[bytes]:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    start = m.end()
    end = body.rfind(b"endstream")
    if end == -1:
        return None
    raw = body[start:end].rstrip(b"\r\n")
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            try:  # some writers pad; try raw deflate
                return zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
    return raw


def _refs(body: bytes, key: bytes) -> List[int]:
    """Extract object refs after /Key (single ref or array)."""
    m = re.search(key + rb"\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    m = re.search(key + rb"\s*(\d+)\s+\d+\s+R", body)
    return [int(m.group(1))] if m else []


_ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f", b"(": "(", b")": ")", b"\\": "\\"}


def _decode_pdf_string(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal
                m = re.match(rb"[0-7]{1,3}", raw[i + 1 : i + 4])
                if m is None:  # malformed '\8'/'\9': drop the backslash
                    i += 1
                    continue
                oct_digits = m.group(0)
                out.append(chr(int(oct_digits, 8)))
                i += 1 + len(oct_digits)
                continue
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


_TEXT_OP_RE = re.compile(
    rb"\((?P<lit>(?:[^()\\]|\\.)*)\)\s*(?P<op>Tj|'|\")"  # literal string show
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj)"  # hex string show
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ"  # array show
    rb"|(?P<nl>T\*|TD|Td)",
    re.S,
)
_ARR_STR_RE = re.compile(rb"\((?P<lit>(?:[^()\\]|\\.)*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")


def _hex_to_text(h: bytes) -> str:
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"
    try:
        b = bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return ""
    # heuristic: UTF-16BE if it decodes cleanly with 2-byte units, else latin-1
    if len(b) % 2 == 0 and all(b[i] == 0 for i in range(0, min(len(b), 8), 2)):
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return b.decode("latin-1")


def _extract_text_from_content(content: bytes) -> str:
    parts: List[str] = []
    for m in _TEXT_OP_RE.finditer(content):
        if m.group("nl"):
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
            continue
        if m.group("lit") is not None:
            parts.append(_decode_pdf_string(m.group("lit")))
        elif m.group("hex") is not None:
            parts.append(_hex_to_text(m.group("hex")))
        elif m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                if sm.group("lit") is not None:
                    parts.append(_decode_pdf_string(sm.group("lit")))
                elif sm.group("hex") is not None:
                    parts.append(_hex_to_text(sm.group("hex")))
    text = "".join(parts)
    return re.sub(r"\n{3,}", "\n\n", text).strip()


def _page_content_streams(data: bytes) -> List[bytes]:
    """PDF bytes -> per-page decompressed content streams (b"" for
    contentless pages). The parse + inflate here is the expensive part
    of text/block extraction — callers that need both (ingest: page text
    AND table geometry) should pay it once via
    `extract_pages_text_and_blocks`."""
    objs = _parse_objects(data)
    pages: List[Tuple[int, bytes]] = []
    for num, body in objs.items():
        head = body.split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/Page\b(?!s)", head):
            pages.append((num, body))
    pages.sort(key=lambda t: t[0])
    out: List[bytes] = []
    for _, body in pages:
        content = b""
        for ref in _refs(body, rb"/Contents"):
            if ref in objs:
                s = _stream_of(objs[ref])
                if s:
                    content += s + b"\n"
        out.append(content)
    return out


def extract_pages_text(data: bytes) -> List[str]:
    """PDF bytes -> per-page extracted text (may be empty strings)."""
    return [
        _extract_text_from_content(c) if c else ""
        for c in _page_content_streams(data)
    ]


def extract_pages_text_and_blocks(data: bytes):
    """One parse+inflate pass -> (per-page text, per-page positioned
    blocks). The ingest hot path needs both; calling extract_pages_text
    and extract_pages_blocks separately doubles the PDF parse cost
    (round-4 review)."""
    streams = _page_content_streams(data)
    texts = [_extract_text_from_content(c) if c else "" for c in streams]
    blocks = [_blocks_from_content(c) if c else [] for c in streams]
    return texts, blocks


def page_count(data: bytes) -> int:
    return len(extract_pages_text(data))


# ---------------------------------------------------------------- raster


def _try_pymupdf(data: bytes, dpi: int) -> Optional[List[Image.Image]]:
    try:
        import fitz  # noqa: F401
    except ImportError:
        return None
    doc = fitz.open(stream=data, filetype="pdf")
    zoom = dpi / 72.0
    images = []
    for page in doc:
        pix = page.get_pixmap(matrix=fitz.Matrix(zoom, zoom))
        images.append(Image.frombytes("RGB", (pix.width, pix.height), pix.samples))
    return images


def _try_pdf2image(data: bytes, dpi: int) -> Optional[List[Image.Image]]:
    try:
        from pdf2image import convert_from_bytes
    except ImportError:
        return None
    try:
        return convert_from_bytes(data, dpi=dpi)
    except Exception:  # noqa: BLE001 — poppler missing etc.
        return None


def _render_text_page(text: str, dpi: int) -> Image.Image:
    """Fallback renderer: extracted text drawn on a letter-sized page."""
    w, h = int(8.5 * dpi), int(11 * dpi)
    img = Image.new("RGB", (w, h), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype("DejaVuSans.ttf", size=max(10, dpi // 8))
    except OSError:
        font = ImageFont.load_default()
    margin = dpi // 2
    max_chars = max(20, (w - 2 * margin) // max(6, dpi // 14))
    y = margin
    line_h = max(12, dpi // 6)
    for raw_line in (text or "(no extractable text)").split("\n"):
        line = raw_line
        while line and y < h - margin:
            draw.text((margin, y), line[:max_chars], fill=(0, 0, 0), font=font)
            line = line[max_chars:]
            y += line_h
        if y >= h - margin:
            break
        if not raw_line:
            y += line_h // 2
    return img


def rasterize_pdf(data: bytes, dpi: int = 150) -> Tuple[List[Image.Image], str]:
    """-> (page images, backend name). Backend ladder mirrors the
    reference's render fallbacks (ingestion_service.py:1567-1638)."""
    images = _try_pymupdf(data, dpi)
    if images is not None:
        return images, "pymupdf"
    images = _try_pdf2image(data, dpi)
    if images is not None:
        return images, "pdf2image"
    texts = extract_pages_text(data)
    if not texts:
        texts = [""]
    logger.warning(
        "No native PDF rasterizer available — using text-render fallback (%d pages)", len(texts)
    )
    return [_render_text_page(t, dpi) for t in texts], "textrender"


# ---------------------------------------------------------------------------
# Positioned text blocks (bboxes for the v2 page-XML pipeline)
# ---------------------------------------------------------------------------

_POS_OP_RE = re.compile(
    rb"(?P<tx>-?[\d.]+)\s+(?P<ty>-?[\d.]+)\s+(?P<tdop>Td|TD)"
    rb"|(?P<m>(?:-?[\d.]+\s+){5}-?[\d.]+)\s+Tm"
    rb"|/\w+\s+(?P<fs>[\d.]+)\s+Tf"
    rb"|(?P<bt>BT)|(?P<et>ET)|(?P<star>T\*)"
    rb"|\((?P<lit>(?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")"
    rb"|<(?P<hex>[0-9A-Fa-f\s]+)>\s*Tj"
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ",
    re.S,
)


class TextBlock:
    """A positioned run of text: bbox = (x0, y0, x1, y1) in PDF points,
    origin bottom-left (PDF user space). `size` is the font size (Tf
    operand) active when the block started — the layout-role classifier
    (parser/layout.py) keys heading/title detection on it."""

    __slots__ = ("text", "bbox", "size")

    def __init__(self, text: str, bbox: Tuple[float, float, float, float],
                 size: float = 12.0):
        self.text = text
        self.bbox = bbox
        self.size = size

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextBlock({self.text[:20]!r}, {self.bbox})"


def _blocks_from_content(content: bytes) -> List[TextBlock]:
    """Track the text cursor through Td/TD/Tm/T* and group shows into
    blocks. Width is estimated as 0.5 * font_size per character (the
    standard average-glyph heuristic when font metrics aren't parsed)."""
    blocks: List[TextBlock] = []
    x = y = 0.0
    font_size = 12.0
    leading = 14.0
    cur_text: List[str] = []
    cur_x0 = cur_y0 = cur_x1 = cur_y1 = 0.0
    cur_size = 12.0

    def flush():
        nonlocal cur_text
        t = "".join(cur_text).strip()
        if t:
            blocks.append(TextBlock(t, (cur_x0, cur_y0, cur_x1, cur_y1), size=cur_size))
        cur_text = []

    def begin_at(nx, ny):
        nonlocal cur_x0, cur_y0, cur_x1, cur_y1, cur_size
        cur_x0, cur_y0 = nx, ny - 0.2 * font_size
        cur_x1, cur_y1 = nx, ny + font_size
        cur_size = font_size

    def add_text(t: str):
        nonlocal cur_x1
        if not cur_text:
            begin_at(x, y)
        cur_text.append(t)
        cur_x1 += 0.5 * font_size * len(t)

    for m in _POS_OP_RE.finditer(content):
        if m.group("bt"):
            flush()
            x = y = 0.0
        elif m.group("et"):
            flush()
        elif m.group("fs"):
            font_size = float(m.group("fs"))
            leading = 1.2 * font_size
        elif m.group("tdop"):
            tx, ty = float(m.group("tx")), float(m.group("ty"))
            if m.group("tdop") == b"TD":
                leading = -ty if ty else leading
            x, y = x + tx, y + ty
            # vertical move = new line; continue the block, big jump = new block
            if abs(ty) > 2.5 * leading or (cur_text and ty == 0 and abs(tx) > 100):
                flush()
            elif cur_text:
                cur_text.append("\n")
                nonlocal_y = y - 0.2 * font_size
                cur_y0 = min(cur_y0, nonlocal_y)
        elif m.group("m") is not None:
            nums = [float(v) for v in m.group("m").split()]
            flush()
            x, y = nums[4], nums[5]
        elif m.group("star"):
            y -= leading
            if cur_text:
                cur_text.append("\n")
                cur_y0 = min(cur_y0, y - 0.2 * font_size)
        elif m.group("lit") is not None:
            add_text(_decode_pdf_string(m.group("lit")))
        elif m.group("hex") is not None:
            add_text(_hex_to_text(m.group("hex")))
        elif m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                if sm.group("lit") is not None:
                    add_text(_decode_pdf_string(sm.group("lit")))
                elif sm.group("hex") is not None:
                    add_text(_hex_to_text(sm.group("hex")))
    flush()
    return blocks


def extract_pages_blocks(data: bytes) -> List[List[TextBlock]]:
    """PDF bytes -> per-page positioned text blocks (v2 pipeline;
    the reference gets bboxes from DoclingV2's layout model,
    v2_document_service.py:395-472 — here from the PDF's own
    text-positioning operators)."""
    return [
        _blocks_from_content(c) if c else []
        for c in _page_content_streams(data)
    ]
