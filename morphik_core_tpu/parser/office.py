"""Office-format text extraction with zero native deps.

The reference shells out to LibreOffice for office->PDF conversion and
openpyxl for Excel (reference core/services/ingestion_service.py:1698-1897,
core/parser/morphik_parser.py:381-428). Neither is available here, so
OOXML files (docx/xlsx/pptx) are read directly: they are zip archives of
XML parts (stdlib zipfile + ElementTree)."""

from __future__ import annotations

import io
import logging
import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Dict, List

logger = logging.getLogger(__name__)

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def docx_to_text(data: bytes) -> str:
    """Paragraph-preserving text from word/document.xml."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)
    paras = []
    for p in root.iter(f"{_W}p"):
        runs = [t.text or "" for t in p.iter(f"{_W}t")]
        text = "".join(runs).strip()
        if text:
            paras.append(text)
    return "\n\n".join(paras)


def pptx_to_slides(data: bytes) -> List[str]:
    """One text blob per slide (ppt/slides/slideN.xml, ordered)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = sorted(
            (n for n in z.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        out = []
        for n in names:
            root = ET.fromstring(z.read(n))
            texts = [t.text or "" for t in root.iter(f"{_A}t")]
            out.append("\n".join(s for s in (x.strip() for x in texts) if s))
    return out


def xlsx_to_markdown(data: bytes, max_rows: int = 5000) -> str:
    """Sheets -> markdown tables (the reference's fast Excel path renders
    openpyxl rows to markdown, morphik_parser.py:381-428)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_S}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
        # map sheet names via workbook.xml (order == sheetN.xml order in most files)
        sheet_names: Dict[int, str] = {}
        if "xl/workbook.xml" in z.namelist():
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            for i, sh in enumerate(wb.iter(f"{_S}sheet")):
                sheet_names[i] = sh.attrib.get("name", f"Sheet{i + 1}")
        parts = []
        sheets = sorted(
            (n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        for i, name in enumerate(sheets):
            root = ET.fromstring(z.read(name))
            rows_out: List[List[str]] = []
            for row in root.iter(f"{_S}row"):
                cells = []
                for c in row.iter(f"{_S}c"):
                    # honor the cell reference (r="C3"): sheet XML OMITS
                    # empty cells, so positional append would shift every
                    # later value under the wrong column header
                    ref = c.attrib.get("r", "")
                    col_letters = "".join(ch for ch in ref if ch.isalpha())
                    if col_letters:
                        col = 0
                        for ch in col_letters.upper():
                            col = col * 26 + (ord(ch) - 64)
                        col -= 1
                        while len(cells) < col:
                            cells.append("")
                    v = c.find(f"{_S}v")
                    if v is None or v.text is None:
                        is_node = c.find(f"{_S}is")
                        cells.append("".join(t.text or "" for t in is_node.iter(f"{_S}t")) if is_node is not None else "")
                        continue
                    if c.attrib.get("t") == "s":
                        idx = int(v.text)
                        cells.append(shared[idx] if idx < len(shared) else "")
                    else:
                        cells.append(v.text)
                rows_out.append(cells)
                if len(rows_out) >= max_rows:
                    break
            if not rows_out:
                continue
            width = max(len(r) for r in rows_out)
            rows_out = [r + [""] * (width - len(r)) for r in rows_out]
            md = [f"## {sheet_names.get(i, f'Sheet{i+1}')}", ""]
            md.append("| " + " | ".join(rows_out[0]) + " |")
            md.append("|" + "---|" * width)
            for r in rows_out[1:]:
                md.append("| " + " | ".join(r) + " |")
            parts.append("\n".join(md))
    return "\n\n".join(parts)
