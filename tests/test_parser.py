"""Parser layer tests: splitter invariants, XML chunking, office
extraction (hand-built OOXML zips), minimal PDF text extraction and the
rasterization fallback ladder."""

import io
import zipfile
import zlib

import asyncio

from conftest import run_once
import numpy as np
import pytest

from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter
from morphik_core_tpu.parser.xml_chunker import XMLChunker
from morphik_core_tpu.parser.office import docx_to_text, pptx_to_slides, xlsx_to_markdown
from morphik_core_tpu.parser.pdf import extract_pages_text, rasterize_pdf
from morphik_core_tpu.parser.morphik_parser import MorphikParser
from morphik_core_tpu.storage.content_types import DOCX, PPTX, XLSX, detect_content_type


def run(coro):
    return run_once(coro)


# ------------------------------------------------------------- splitter


def test_splitter_respects_chunk_size():
    text = "para one.\n\n" + ("word " * 500) + "\n\nlast para."
    s = RecursiveCharacterTextSplitter(chunk_size=200, chunk_overlap=20)
    chunks = s.split_text(text)
    assert all(len(c) <= 200 for c in chunks)
    assert "".join(c[20:] if i else c for i, c in enumerate(chunks)).replace(" ", "") in text.replace(" ", "") + "x"


def test_splitter_short_text_passthrough():
    s = RecursiveCharacterTextSplitter(chunk_size=100, chunk_overlap=10)
    assert s.split_text("hello") == ["hello"]
    assert s.split_text("") == []


def test_splitter_content_preserved():
    text = "s1. s2. s3. " * 100
    s = RecursiveCharacterTextSplitter(chunk_size=64, chunk_overlap=0)
    chunks = s.split_text(text)
    assert "".join(chunks) == text


def test_splitter_overlap():
    text = ("a" * 90 + " ") * 10
    s = RecursiveCharacterTextSplitter(chunk_size=100, chunk_overlap=20)
    chunks = s.split_text(text)
    # every chunk honors the budget; the carried overlap is the largest
    # tail that still fits next to the incoming piece (20 requested, but
    # 91-char pieces leave room for only 9)
    assert all(len(c) <= 100 for c in chunks)
    for prev, nxt in zip(chunks, chunks[1:]):
        assert nxt.startswith(prev[-9:])

    # with small pieces the full requested overlap is carried
    s2 = RecursiveCharacterTextSplitter(chunk_size=100, chunk_overlap=20)
    chunks2 = s2.split_text(("word " * 6) * 30)  # 30-char-ish pieces
    assert all(len(c) <= 100 for c in chunks2)
    for prev, nxt in zip(chunks2, chunks2[1:]):
        assert nxt.startswith(prev[-20:])


# ------------------------------------------------------------------ xml


def test_xml_chunker_breadcrumbs():
    xml = """<doc><section id="intro"><p>Hello world.</p></section>
    <section id="body"><item name="a">Content A here.</item>
    <item name="b">Content B here.</item></section></doc>"""
    chunks = XMLChunker(max_tokens=50).chunk(xml)
    contents = [c["content"] for c in chunks]
    assert any("section[intro]" in c and "Hello world." in c for c in contents)
    assert any("section[body]" in c and "Content A here." in c for c in contents)
    # a tighter budget forces descent to item granularity
    tight = XMLChunker(max_tokens=5).chunk(xml)
    tight_contents = [c["content"] for c in tight]
    assert any("item[a]" in c for c in tight_contents)
    assert any("item[b]" in c for c in tight_contents)


def test_xml_chunker_token_budget_splits_large_leaf():
    big = "token " * 1000
    xml = f"<doc><p>{big}</p></doc>"
    chunks = XMLChunker(max_tokens=100).chunk(xml)
    assert len(chunks) > 1
    assert all(len(c["content"]) <= 100 * 4 + 50 for c in chunks)


def test_xml_chunker_invalid_xml_fallback():
    chunks = XMLChunker(max_tokens=50).chunk("not <valid <xml at all")
    assert chunks and all(c["tag"] == "text" for c in chunks)


# ---------------------------------------------------------------- office


def _zipbytes(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in files.items():
            z.writestr(name, data)
    return buf.getvalue()


W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def test_docx_extraction_and_detection():
    doc = f"""<?xml version="1.0"?><w:document {W}><w:body>
      <w:p><w:r><w:t>First paragraph.</w:t></w:r></w:p>
      <w:p><w:r><w:t>Second </w:t></w:r><w:r><w:t>paragraph.</w:t></w:r></w:p>
    </w:body></w:document>"""
    data = _zipbytes({"word/document.xml": doc})
    assert detect_content_type(data, "report.docx") == DOCX
    text = docx_to_text(data)
    assert text == "First paragraph.\n\nSecond paragraph."


def test_pptx_extraction():
    A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    slide = f'<?xml version="1.0"?><p:sld xmlns:p="x" {A}><a:t>Title here</a:t><a:t>Bullet</a:t></p:sld>'
    data = _zipbytes({"ppt/slides/slide1.xml": slide, "ppt/slides/slide2.xml": slide.replace("Title here", "Slide two")})
    assert detect_content_type(data, "deck.pptx") == PPTX
    slides = pptx_to_slides(data)
    assert len(slides) == 2 and "Title here" in slides[0] and "Slide two" in slides[1]


def test_xlsx_extraction():
    S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = f'<?xml version="1.0"?><sst {S}><si><t>name</t></si><si><t>alice</t></si></sst>'
    sheet = f"""<?xml version="1.0"?><worksheet {S}><sheetData>
      <row r="1"><c t="s"><v>0</v></c><c><v>42</v></c></row>
      <row r="2"><c t="s"><v>1</v></c><c><v>7</v></c></row>
    </sheetData></worksheet>"""
    wb = f'<?xml version="1.0"?><workbook {S}><sheets><sheet name="People" sheetId="1"/></sheets></workbook>'
    data = _zipbytes({"xl/sharedStrings.xml": shared, "xl/worksheets/sheet1.xml": sheet, "xl/workbook.xml": wb})
    assert detect_content_type(data, "t.xlsx") == XLSX
    md = xlsx_to_markdown(data)
    assert "## People" in md and "| name | 42 |" in md and "| alice | 7 |" in md


# ------------------------------------------------------------------- pdf


def make_pdf(pages_text):
    """Hand-built minimal PDF with FlateDecode content streams."""
    objs = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages_text)))
    objs.append(b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    objs.append(
        f"2 0 obj<</Type/Pages/Kids[{kids}]/Count {len(pages_text)}>>endobj\n".encode()
    )
    for i, text in enumerate(pages_text):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"{page_num} 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]/Contents {content_num} 0 R>>endobj\n".encode()
        )
        lines = text.split("\n")
        ops = b"BT /F1 12 Tf 72 720 Td "
        for j, line in enumerate(lines):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if j:
                ops += b"0 -14 Td "
            ops += b"(" + esc.encode("latin-1") + b") Tj "
        ops += b"ET"
        comp = zlib.compress(ops)
        objs.append(
            f"{content_num} 0 obj<</Length {len(comp)}/Filter/FlateDecode>>stream\n".encode()
            + comp
            + b"\nendstream endobj\n"
        )
    body = b"%PDF-1.4\n" + b"".join(objs) + b"trailer<</Root 1 0 R>>\n%%EOF"
    return body


def test_pdf_text_extraction_multipage():
    pdf = make_pdf(["Hello page one.\nWith a second line.", "Page two content (parens) here."])
    pages = extract_pages_text(pdf)
    assert len(pages) == 2
    assert "Hello page one." in pages[0] and "second line" in pages[0]
    assert "(parens)" not in pages[0]
    assert "Page two content (parens) here." in pages[1]


def test_pdf_rasterize_fallback():
    pdf = make_pdf(["Rasterize me."])
    images, backend = rasterize_pdf(pdf, dpi=72)
    assert backend in ("pymupdf", "pdf2image", "textrender")
    assert len(images) == 1
    arr = np.asarray(images[0])
    assert arr.shape[0] > 500 and arr.shape[2] == 3
    assert (arr < 128).any()  # some dark pixels (drawn text)


def test_detect_content_type_pdf_and_text():
    assert detect_content_type(make_pdf(["x"]), "a.bin") == "application/pdf"
    assert detect_content_type(b"plain words here", "notes.txt") == "text/plain"
    assert detect_content_type(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"


# ------------------------------------------------------------ router


def test_morphik_parser_routes(tmp_path):
    async def go():
        p = MorphikParser()
        meta, text = await p.parse_file_to_text(b"hello world", "a.txt")
        assert text == "hello world"
        pdf = make_pdf(["Route me via pdf."])
        meta, text = await p.parse_file_to_text(pdf, "x.pdf")
        assert "Route me" in text and meta["page_count"] == 1
        chunks = await p.split_text("abc. " * 3000)
        assert len(chunks) > 1
        xml_chunks = p.parse_and_chunk_xml("<doc><section id='s'>Some xml text.</section></doc>")
        assert xml_chunks and "Some xml text." in xml_chunks[0].content

    run(go())


def test_video_describe_fn_wired(tmp_path):
    """build_services wires the completion model as the video frame
    describe_fn and the contextual-chunking complete_fn (reference
    VisionModelClient + ContextualChunker seams)."""
    import asyncio

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.services_init import build_services

    settings = Settings.model_validate(
        {
            "storage": {"storage_path": str(tmp_path / "s")},
            "database": {"path": str(tmp_path / "db.sqlite")},
            "vector_store": {"index_path": str(tmp_path / "i")},
        }
    )
    services = build_services(settings)
    assert services.parser.describe_fn is not None
    out = run_once(
        services.parser.describe_fn("data:image/jpeg;base64,AAAA", "")
    )
    assert isinstance(out, str)


def test_html_to_text_extraction():
    from morphik_core_tpu.parser.html_text import html_to_text

    html = b"""<!DOCTYPE html><html><head><title>Quarterly Report</title>
    <style>body { color: red }</style><script>alert(1)</script></head>
    <body><h1>Results</h1><p>Revenue grew <b>8%</b> in Q3.</p>
    <ul><li>Cloud: up</li><li>Hardware: flat</li></ul>
    <table><tr><th>Region</th><th>Sales</th></tr><tr><td>EMEA</td><td>4.2M</td></tr></table>
    </body></html>"""
    title, text = html_to_text(html)
    assert title == "Quarterly Report"
    assert "# Results" in text
    assert "Revenue grew 8% in Q3." in text
    assert "- Cloud: up" in text
    assert "EMEA | 4.2M" in text or "| EMEA | 4.2M" in text
    assert "alert(1)" not in text and "color: red" not in text


def test_parser_routes_html(tmp_path):
    import asyncio

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.parser.morphik_parser import MorphikParser

    p = MorphikParser(Settings())
    html = b"<!DOCTYPE html><html><head><title>T</title></head><body><p>HTML body text.</p></body></html>"
    meta, text = run_once(
        p.parse_file_to_text(html, "page.html")
    )
    assert meta.get("title") == "T"
    assert "HTML body text." in text and "<p>" not in text


def test_video_transcript_provider():
    """Pluggable transcript provider fills the transcript series; frame
    sampling is stubbed (cv2 absent in this image). Reference:
    parse_video.py:162-253 (AssemblyAI transcript -> TimeSeriesData)."""
    import asyncio

    from morphik_core_tpu.parser.video_parser import VideoParser

    async def transcribe(video_bytes):
        assert video_bytes == b"vid"
        return {0.0: "hello", 2.5: "world"}

    vp = VideoParser(b"vid", transcribe_fn=transcribe)
    vp.sample_frames = lambda: ([(0.0, b"jpg")], {"fps": 30.0, "duration": 1.0, "frame_count": 30.0})
    out = run_once(vp.process_video())
    assert out["transcript"].time_to_content == {0.0: "hello", 2.5: "world"}
    assert out["frame_descriptions"].time_to_content


def test_video_transcript_provider_outage_tolerated():
    import asyncio

    from morphik_core_tpu.parser.video_parser import VideoParser

    async def transcribe(_):
        raise ConnectionError("provider down")

    vp = VideoParser(b"vid", transcribe_fn=transcribe)
    vp.sample_frames = lambda: ([], {"fps": 30.0, "duration": 0.0, "frame_count": 0.0})
    out = run_once(vp.process_video())
    assert out["transcript"].time_to_content == {}  # ingest survives


def test_openai_transcription_client_parses_segments():
    import asyncio

    from morphik_core_tpu.parser.video_parser import OpenAITranscriptionClient

    client = OpenAITranscriptionClient("http://stt.local/v1", api_key="k1", model="whisper-1")
    seen = {}

    async def fake(url, files, data, headers):
        seen.update(url=url, data=data, auth=headers.get("Authorization"))
        return {"segments": [
            {"start": 0.0, "text": " intro "},
            {"start": 3.2, "text": "body"},
            {"start": 9.9, "text": "   "},
        ]}

    client._request = fake
    out = run_once(client(b"vid"))
    assert out == {0.0: "intro", 3.2: "body"}
    assert seen["url"] == "http://stt.local/v1/audio/transcriptions"
    assert seen["data"]["response_format"] == "verbose_json"
    assert seen["auth"] == "Bearer k1"


def test_openai_transcription_client_plain_text_fallback():
    import asyncio

    from morphik_core_tpu.parser.video_parser import OpenAITranscriptionClient

    client = OpenAITranscriptionClient("http://stt.local/v1")

    async def fake(url, files, data, headers):
        return {"text": "full transcript"}

    client._request = fake
    out = run_once(client(b"vid"))
    assert out == {0.0: "full transcript"}


def test_xml_chunker_auto_unit_tag_and_ignore():
    """Schemas without preferred tag names get an auto-selected unit tag
    (reference _choose_unit_tag frequency heuristic); TOC/INDEX subtrees
    are skipped (ignore_tags)."""
    from morphik_core_tpu.parser.xml_chunker import XMLChunker

    xml = """<filing>
      <toc><line>1. Overview .... 3</line><line>2. Risk .... 9</line></toc>
      <block num="1">Overview text body one.</block>
      <block num="2">Risk factors body two.</block>
      <block num="3">Financials body three.</block>
    </filing>"""
    chunks = XMLChunker(max_tokens=50).chunk(xml)
    contents = [c["content"] for c in chunks]
    assert sum(1 for c in chunks if c["tag"] == "block") == 3
    assert not any("Overview ...." in c for c in contents)  # TOC skipped
    # auto-unit elements get a first-words xml id in their breadcrumb
    assert any("block[" in c for c in contents)


def test_xml_chunker_first_words_id_for_units():
    from morphik_core_tpu.parser.xml_chunker import XMLChunker

    xml = "<doc><section>Quarterly revenue summary for 2024.</section></doc>"
    chunks = XMLChunker(max_tokens=50).chunk(xml)
    assert chunks[0]["breadcrumbs"][-1].startswith("section[Quarterly_revenue_summary")


def test_native_split_text_parity():
    """The C++ splitter must produce byte-identical chunks to the Python
    implementation on randomized ASCII corpora (reference chunking.rs is
    a parity port of the Python splitter too)."""
    import random

    from morphik_core_tpu.utils import fast_ops
    from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter

    if not fast_ops.native_available():
        import pytest

        pytest.skip("native library not built")

    rng = random.Random(0)
    words = ["alpha", "beta", "gamma", "delta", "x", "longtoken" * 4]
    seps = [" ", " ", " ", ". ", "\n", "\n\n"]
    for trial in range(24):
        n_words = rng.randint(50, 1200)
        parts = []
        for _ in range(n_words):
            parts.append(rng.choice(words))
            parts.append(rng.choice(seps))
        text = "".join(parts)
        if trial % 5 == 0:
            text += "Z" * rng.randint(300, 900)  # forces character-level slicing
        if trial % 7 == 0:
            text = "\n\n".join([text[:200]] * 6) + "   "  # trailing whitespace chunk
        size = rng.choice([120, 256, 400])
        overlap = rng.choice([0, 20, 60])
        py = RecursiveCharacterTextSplitter(size, overlap)
        # bypass the native fast path inside split_text for the oracle
        expect = py._merge(py._split(text, 0)) if len(text) > size else [text]
        got = fast_ops.native_split_text(text, size, overlap)
        assert got is not None
        assert got == expect, (trial, size, overlap, len(text))


def test_native_split_text_rejects_non_ascii():
    from morphik_core_tpu.utils import fast_ops

    if not fast_ops.native_available():
        import pytest

        pytest.skip("native library not built")
    assert fast_ops.native_split_text("héllo wörld " * 100, 50, 10) is None


def test_split_text_public_entry():
    from morphik_core_tpu.utils.fast_ops import split_text

    chunks = split_text("one two three. " * 200, chunk_size=300, chunk_overlap=30)
    assert len(chunks) > 3
    assert all(len(c) <= 300 for c in chunks)
    assert "".join(c[30:] if i else c for i, c in enumerate(chunks)).startswith("one two three.")


def test_pdf_malformed_octal_escape():
    """Regression: '\\8' in a PDF literal string crashed the decoder."""
    from morphik_core_tpu.parser.pdf import _decode_pdf_string

    # malformed '\8': drop the backslash, keep the char (reader behavior)
    assert _decode_pdf_string(rb"foo\8bar") == "foo8bar"
    assert _decode_pdf_string(rb"ok\101") == "okA"  # real octal still works


def test_xml_chunker_mixed_content_tails():
    """Regression: tail text between child elements was dropped."""
    from morphik_core_tpu.parser.xml_chunker import XMLChunker

    xml = ("<doc><chapter>" + "<p>" + "alpha " * 40 + "</p>"
           " important tail text here "
           "<p>" + "beta " * 40 + "</p>"
           " closing remark text"
           "</chapter></doc>")
    chunks = XMLChunker(max_tokens=30).chunk(xml)
    joined = " ".join(c["content"] for c in chunks)
    assert "important tail text here" in joined
    assert "closing remark text" in joined


def test_xlsx_sparse_cells_align_columns():
    """Regression: omitted empty cells shifted later values left."""
    from morphik_core_tpu.parser.office import xlsx_to_markdown

    sheet = (
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>Name</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>Qty</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>Price</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>widget</t></is></c>'
        '<c r="C2"><v>9.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = ('<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
          '<sheets><sheet name="S1" sheetId="1"/></sheets></workbook>')
    data = _zipbytes({"xl/workbook.xml": wb, "xl/worksheets/sheet1.xml": sheet})
    md = xlsx_to_markdown(data)
    row = next(line for line in md.splitlines() if "widget" in line)
    cols = [c.strip() for c in row.strip("|").split("|")]
    assert cols == ["widget", "", "9.5"], cols  # price under Price, not Qty
