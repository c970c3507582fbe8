"""Geometric layout-role classification for born-digital PDFs.

The reference's v2 pipeline runs DoclingV2's layout model and emits
role-tagged XML items — SECTION_HEADER -> <h>, TITLE -> <title>,
PAGE_HEADER -> <r>, PAGE_FOOTER -> <f>, LIST_ITEM -> <li>, TEXT -> <t>
(/root/reference/core/parser/docling_v2.py:154-181). No layout model
ships in this environment, so this module recovers the same roles
heuristically from the PDF's own geometry: font size (Tf operand,
carried on parser.pdf.TextBlock.size), vertical position, and lexical
shape. Born-digital documents put real sizes in their content streams,
which is exactly the regime where the heuristics are reliable; scanned
PDFs fall back to everything-is-<t>, same as the reference does when
Docling finds no layout.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from morphik_core_tpu.parser.pdf import TextBlock

# lexical list-item shapes: bullets, "1. ", "a) ", "(i) ", "- "
_LIST_RE = re.compile(r"^\s*(?:[-•‣◦⁃*]|\(?\w{1,3}[.)])\s+\S")
# page-number / running-footer shapes
_FOOTER_RE = re.compile(r"^\s*(?:page\s+)?\d{1,4}(?:\s*(?:/|of)\s*\d{1,4})?\s*$", re.I)

HEADING_SIZE_RATIO = 1.25  # block size vs page median to count as heading
TITLE_SIZE_RATIO = 1.6
EDGE_BAND = 0.07  # top/bottom fraction of the CONTENT extent for r/f roles
MIN_EXTENT_PT = 300.0  # below this vertical spread, r/f roles are off
MAX_HEADING_CHARS = 120


def _median(vals: Sequence[float]) -> float:
    s = sorted(vals)
    return s[len(s) // 2] if s else 12.0


def classify_blocks(
    blocks: Sequence[TextBlock], page_height: Optional[float] = None,
    first_page: bool = False,
) -> List[Tuple[str, TextBlock]]:
    """-> [(tag, block)] in input order. Tags mirror the reference's
    docling_v2 label_to_tag contract: t/h/title/r/f/li.

    Header/footer bands are computed from the page's CONTENT extent
    (min/max block y), not a paper-size constant — the hand-rolled
    parser doesn't surface MediaBox, and a hard-coded 792 pt band
    misclassifies A4/landscape pages (round-4 review). Pass
    `page_height` to extend the extent when the caller knows it. Pages
    with too little vertical spread get no r/f roles at all."""
    if not blocks:
        return []
    body_sizes = [b.size for b in blocks if len(b.text) >= 40] or [b.size for b in blocks]
    med = max(_median(body_sizes), 1.0)
    y_lo = min(b.bbox[1] for b in blocks)
    y_hi = max(b.bbox[3] for b in blocks)
    if page_height:
        y_lo, y_hi = min(y_lo, 0.0), max(y_hi, page_height)
    extent = y_hi - y_lo
    edges_on = extent >= MIN_EXTENT_PT
    top_y = y_hi - EDGE_BAND * extent
    bot_y = y_lo + EDGE_BAND * extent
    out: List[Tuple[str, TextBlock]] = []
    seen_title = False
    for b in blocks:
        text = b.text.strip()
        yc = (b.bbox[1] + b.bbox[3]) / 2
        short = len(text) <= MAX_HEADING_CHARS and "\n" not in text
        tag = "t"
        if edges_on and yc <= bot_y and (len(text) <= 60 or _FOOTER_RE.match(text)):
            tag = "f"
        elif edges_on and _FOOTER_RE.match(text) and yc >= top_y:
            tag = "r"
        elif short and b.size >= TITLE_SIZE_RATIO * med and first_page and not seen_title:
            tag = "title"
            seen_title = True
        elif short and b.size >= HEADING_SIZE_RATIO * med:
            tag = "h"
        elif edges_on and yc >= top_y and len(text) <= 60 and b.size <= med:
            tag = "r"
        elif _LIST_RE.match(text):
            tag = "li"
        out.append((tag, b))
    return out
