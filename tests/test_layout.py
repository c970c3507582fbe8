"""Geometric layout-role classification (parser/layout.py): the
docling_v2 tag contract (t/h/title/r/f/li) recovered from born-digital
geometry (reference core/parser/docling_v2.py:154-181)."""

import zlib

from morphik_core_tpu.parser.layout import classify_blocks
from morphik_core_tpu.parser.pdf import TextBlock, extract_pages_blocks


def make_sized_pdf(items):
    """items: (x, y, size, text) -> single-page PDF bytes."""
    ops = b""
    for x, y, size, text in items:
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops += (
            f"BT /F1 {size} Tf {x} {y} Td (".encode()
            + esc.encode("latin-1") + b") Tj ET\n"
        )
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


BODY = "This is a long flowing body paragraph with plenty of characters in it."


def test_blocks_carry_font_size():
    pdf = make_sized_pdf([(72, 700, 24, "Big Title"), (72, 600, 12, BODY)])
    blocks = extract_pages_blocks(pdf)[0]
    sizes = {b.text: b.size for b in blocks}
    assert sizes["Big Title"] == 24.0
    assert sizes[BODY] == 12.0


def test_roles_title_heading_body_list_footer():
    pdf = make_sized_pdf([
        (72, 720, 24, "Annual Report 2026"),          # title (first page, big)
        (72, 640, 16, "1. Financial Overview"),       # heading (1.25x body)
        (72, 600, 12, BODY),                          # body
        (72, 560, 12, BODY + " More words here."),    # body
        (90, 520, 12, "- revenue grew 31%"),          # list item
        (90, 500, 12, "- margins held steady"),       # list item
        (300, 30, 10, "3"),                           # footer page number
    ])
    blocks = extract_pages_blocks(pdf)[0]
    tags = {b.text: tag for tag, b in classify_blocks(blocks, first_page=True)}
    assert tags["Annual Report 2026"] == "title"
    assert tags["1. Financial Overview"] == "h"
    assert tags[BODY] == "t"
    assert tags["- revenue grew 31%"] == "li"
    assert tags["3"] == "f"


def test_title_only_on_first_page():
    items = [(72, 720, 24, "Chapter Heading"), (72, 600, 12, BODY)]
    blocks = extract_pages_blocks(make_sized_pdf(items))[0]
    first = dict((b.text, t) for t, b in classify_blocks(blocks, first_page=True))
    later = dict((b.text, t) for t, b in classify_blocks(blocks, first_page=False))
    assert first["Chapter Heading"] == "title"
    assert later["Chapter Heading"] == "h"  # demoted off the first page


def test_scanned_like_pages_degrade_to_text():
    # uniform sizes, mid-page: nothing misclassified as heading/title
    items = [(72, 600 - 20 * i, 12, BODY + f" {i}") for i in range(5)]
    blocks = extract_pages_blocks(make_sized_pdf(items))[0]
    assert all(t == "t" for t, _ in classify_blocks(blocks, first_page=True))


def test_v2_page_xml_role_tags(tmp_path):
    """The v2 page-XML carries the role tags end-to-end."""
    from morphik_core_tpu.services.v2_document_service import V2DocumentService

    pdf = make_sized_pdf([
        (72, 720, 24, "Spec Title"),
        (72, 640, 16, "Section One"),
        (72, 600, 12, BODY),
    ])
    blocks = extract_pages_blocks(pdf)[0]
    xml = V2DocumentService._page_xml(0, "", blocks=blocks)
    assert xml.startswith('<page n="0">')
    assert "<title bbox=" in xml and "<h bbox=" in xml and "<t bbox=" in xml
    assert "Spec Title</title>" in xml
