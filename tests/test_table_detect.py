"""Heuristic table detection for born-digital PDFs (no parse endpoint,
no layout model — geometry from the PDF's own text operators)."""

import zlib

from conftest import run_once

from morphik_core_tpu.parser.table_detect import detect_pdf_tables, detect_tables_from_blocks
from morphik_core_tpu.parser.pdf import TextBlock


def make_positioned_pdf(cells, extra_text=()):
    """Hand-built PDF where each (x, y, text) cell is its own BT..ET run
    (how digital table generators emit grids)."""
    ops = b""
    for x, y, text in cells:
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops += f"BT /F1 12 Tf {x} {y} Td (".encode() + esc.encode("latin-1") + b") Tj ET\n"
    for i, line in enumerate(extra_text):
        ops += f"BT /F1 12 Tf 72 {700 - 14 * i} Td (".encode() + line.encode("latin-1") + b") Tj ET\n"
    comp = zlib.compress(ops)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
        b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
        b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents 4 0 R>>endobj\n"
        + f"4 0 obj<</Length {len(comp)}/Filter/FlateDecode>>stream\n".encode()
        + comp
        + b"\nendstream endobj\ntrailer<</Root 1 0 R>>\n%%EOF"
    )


TABLE_CELLS = [
    (72, 600, "Region"), (200, 600, "Revenue"), (320, 600, "Margin"),
    (72, 584, "EMEA"), (200, 584, "1,204"), (320, 584, "31%"),
    (72, 568, "APAC"), (200, 568, "987"), (320, 568, "27%"),
    (72, 552, "Americas"), (200, 552, "2,441"), (320, 552, "35%"),
]


def test_detects_simple_grid():
    pdf = make_positioned_pdf(TABLE_CELLS)
    tables = detect_pdf_tables(pdf)
    assert len(tables) == 1 and len(tables[0]) == 1
    md = tables[0][0]
    lines = md.splitlines()
    assert lines[0].startswith("| Region | Revenue | Margin |")
    assert set(lines[1].replace("|", "").split()) == {"---"}
    assert "| EMEA | 1,204 | 31% |" in md
    assert "| Americas | 2,441 | 35% |" in md


def test_two_stacked_tables_both_detected():
    """A vertical gap between two grids must close the first run AND
    start the second with its header row intact (round-4 review: the
    gap row was dropped, losing table B's header or all of table B)."""
    second = [
        (72, 400, "Quarter"), (200, 400, "Units"),
        (72, 384, "Q1"), (200, 384, "512"),
        (72, 368, "Q2"), (200, 368, "634"),
    ]
    pdf = make_positioned_pdf(TABLE_CELLS + second)
    tables = detect_pdf_tables(pdf)
    assert len(tables) == 1 and len(tables[0]) == 2
    a, b = tables[0]
    assert "| Region | Revenue | Margin |" in a
    assert "| Quarter | Units |" in b  # header row survives the gap
    assert "| Q1 | 512 |" in b and "| Q2 | 634 |" in b


def test_prose_is_not_a_table():
    # multi-cell-looking two-column prose: long lines must NOT match
    left = "This is a long paragraph line of flowing prose text that continues"
    right = "And a second long column of flowing prose text beside the first one"
    cells = []
    for i in range(5):
        cells.append((72, 700 - 14 * i, left))
        cells.append((330, 700 - 14 * i, right))
    tables = detect_pdf_tables(make_positioned_pdf(cells))
    assert tables == [[]]


def test_single_column_text_no_table():
    pdf = make_positioned_pdf([], extra_text=["line one", "line two", "line three", "line four"])
    assert detect_pdf_tables(pdf) == [[]]


def test_short_grid_below_min_rows_skipped():
    pdf = make_positioned_pdf(TABLE_CELLS[:6])  # 2 rows only
    assert detect_pdf_tables(pdf) == [[]]


def test_pipe_escaping():
    blocks = [
        TextBlock("a|b", (72, 600, 100, 612)), TextBlock("v1", (200, 600, 220, 612)),
        TextBlock("r2", (72, 584, 90, 596)), TextBlock("v2", (200, 584, 220, 596)),
        TextBlock("r3", (72, 568, 90, 580)), TextBlock("v3", (200, 568, 220, 580)),
    ]
    (md,) = detect_tables_from_blocks(blocks)
    assert "a\\|b" in md


def test_parser_merges_detected_tables():
    from morphik_core_tpu.parser.morphik_parser import MorphikParser

    async def go():
        parser = MorphikParser()
        pdf = make_positioned_pdf(TABLE_CELLS, extra_text=["Quarterly results narrative."])
        meta, text = await parser.parse_file_to_text(pdf, "report.pdf")
        assert meta.get("detected_tables") == 1
        assert "Quarterly results narrative." in text
        assert "| EMEA | 1,204 | 31% |" in text
        # chunks produced from the merged text keep the table searchable
        chunks = await parser.split_text(text)
        assert any("| EMEA | 1,204 | 31% |" in c.content for c in chunks)

    run_once(go())
