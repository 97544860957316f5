"""DOCX/XLSX loading (S3/S8): stdlib zip+XML decode through the Spark
binaryFile source. Test files are constructed in-test with zipfile — real
OOXML containers, no office libs required on either side."""

from __future__ import annotations

import zipfile

import pytest

from delm_spark.io.loaders import load_path
from delm_spark.io.office import parse_docx_bytes, parse_xlsx_rows

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def _docx(path, body_paras, table=None, header=None, footer=None):
    def paras(texts):
        return "".join(f"<w:p><w:r><w:t>{t}</w:t></w:r></w:p>" for t in texts)

    tbl = ""
    if table:
        rows = "".join(
            "<w:tr>"
            + "".join(f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>" for c in row)
            + "</w:tr>"
            for row in table
        )
        tbl = f"<w:tbl>{rows}</w:tbl>"
    doc = f'<?xml version="1.0"?><w:document {W}><w:body>{paras(body_paras)}{tbl}</w:body></w:document>'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
        if header:
            z.writestr(
                "word/header1.xml", f'<?xml version="1.0"?><w:hdr {W}>{paras(header)}</w:hdr>'
            )
        if footer:
            z.writestr(
                "word/footer1.xml", f'<?xml version="1.0"?><w:ftr {W}>{paras(footer)}</w:ftr>'
            )


def _xlsx(path, rows):
    strings, cells_xml = [], []
    for ri, row in enumerate(rows, start=1):
        cs = []
        for ci, val in enumerate(row):
            ref = chr(65 + ci) + str(ri)
            if isinstance(val, str):
                idx = len(strings)
                strings.append(val)
                cs.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
            elif val is not None:
                cs.append(f'<c r="{ref}"><v>{val}</v></c>')
        cells_xml.append(f'<row r="{ri}">{"".join(cs)}</row>')
    sheet = f'<?xml version="1.0"?><worksheet {S}><sheetData>{"".join(cells_xml)}</sheetData></worksheet>'
    sst = (
        f'<?xml version="1.0"?><sst {S}>'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", f'<?xml version="1.0"?><workbook {S}/>')
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def test_parse_docx_reference_part_order(tmp_path):
    """Reference extraction order (data_loaders.py:109-152): headers,
    body paragraphs, table cells row-major, footers."""
    p = tmp_path / "doc.docx"
    _docx(
        p,
        body_paras=["Body one", "Body two"],
        table=[["A1", "B1"], ["A2", "B2"]],
        header=["Head"],
        footer=["Foot"],
    )
    text = parse_docx_bytes(p.read_bytes())
    assert text == "Head\nBody one\nBody two\nA1\nB1\nA2\nB2\nFoot"


def test_load_docx_via_spark(spark, tmp_path):
    for i in range(3):
        _docx(tmp_path / f"d{i}.docx", body_paras=[f"Doc {i} text"])
    df = load_path(spark, str(tmp_path / "*.docx"))
    rows = {r["delm_raw_data"] for r in df.collect()}
    assert rows == {"Doc 0 text", "Doc 1 text", "Doc 2 text"}


def test_parse_xlsx_rows_types_and_gaps(tmp_path):
    p = tmp_path / "t.xlsx"
    _xlsx(p, [["name", "score"], ["alice", 3], [None, 7], ["bob", None]])
    rows = parse_xlsx_rows(p.read_bytes())
    assert rows[0] == ["name", "score"]
    assert rows[1] == ["alice", "3"]
    assert rows[2] == [None, "7"]
    assert rows[3] == ["bob", None]


def test_load_xlsx_via_spark(spark, tmp_path):
    p = tmp_path / "t.xlsx"
    _xlsx(p, [["name", "note"], ["alice", "likes spark"], ["bob", "likes ducks"]])
    df = load_path(spark, str(p), target_column="note")
    got = {(r["name"], r["note"]) for r in df.collect()}
    assert got == {("alice", "likes spark"), ("bob", "likes ducks")}
    assert df.columns == ["delm_file_name", "name", "note"]


def test_load_xlsx_missing_target_column(spark, tmp_path):
    p = tmp_path / "t.xlsx"
    _xlsx(p, [["name"], ["alice"]])
    with pytest.raises(ValueError, match="target_column"):
        load_path(spark, str(p), target_column="text")


# --- S9: directory loading with single-extension validation ----------------

from delm_spark.io.loaders import load_directory


def test_load_directory_single_ext_union(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("alpha doc")
    (tmp_path / "sub" / "b.txt").write_text("beta doc")
    (tmp_path / ".DS_Store").write_text("junk")  # skipped (IGNORE_FILES)
    df, ext = load_directory(spark, str(tmp_path))
    assert ext == ".txt"
    assert {r["delm_raw_data"] for r in df.collect()} == {"alpha doc", "beta doc"}


def test_load_directory_rejects_mixed_extensions(spark, tmp_path):
    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "b.csv").write_text("text\nx")
    with pytest.raises(ValueError, match="mixes extensions"):
        load_directory(spark, str(tmp_path))


def test_load_directory_empty(spark, tmp_path):
    with pytest.raises(ValueError, match="no loadable files"):
        load_directory(spark, str(tmp_path))


# ---------------------------------------------------------------------------
# PDF text-layer extraction (delm_spark/io/pdf.py)
# ---------------------------------------------------------------------------


def _assemble_pdf(objs: list) -> bytes:
    """Serialize numbered objects into a well-formed PDF with a correct
    xref table (offsets computed, not hard-coded)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def _minimal_pdf(content_stream: bytes, compress: bool = False) -> bytes:
    """A well-formed single-page PDF around `content_stream`, with a
    correct xref table (offsets computed, not hard-coded)."""
    import zlib

    filt = b""
    body = content_stream
    if compress:
        body = zlib.compress(content_stream)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(body)).encode() + filt + b" >>\nstream\n"
        + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    return _assemble_pdf(objs)


PDF_CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello \\(escaped\\) world) Tj "
    b"0 -14 Td [(Kerned) -250 ( pairs)] TJ "
    b"T* (Octal: \\101\\102) Tj "
    b"(apostrophe line) ' "
    b"0 -14 Td <48657820737472696E67> Tj ET"
)


def test_parse_pdf_bytes_text_layer():
    from delm_spark.io.pdf import parse_pdf_bytes

    for compress in (False, True):
        text = parse_pdf_bytes(_minimal_pdf(PDF_CONTENT, compress=compress))
        assert "Hello (escaped) world" in text
        assert "Kerned pairs" in text
        assert "Octal: AB" in text
        assert "apostrophe line" in text
        assert "Hex string" in text
        # layout ops produced line structure
        assert text.index("Hello") < text.index("Kerned") < text.index("Octal")


def test_parse_pdf_skips_image_streams():
    from delm_spark.io.pdf import parse_pdf_bytes

    # a DCT (JPEG-ish) stream must not crash or leak garbage into the text
    pdf = _minimal_pdf(PDF_CONTENT) + (
        b"9 0 obj\n<< /Subtype /Image /Filter /DCTDecode /Length 8 >>\n"
        b"stream\n\xff\xd8\xff\xe0BTgg\nendstream\nendobj\n"
    )
    text = parse_pdf_bytes(pdf)
    assert "Hello (escaped) world" in text and "gg" not in text


_CMAP_BODY = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <00650301>
endbfchar
1 beginbfrange
<0010> <0012> <006C>
endbfrange
1 beginbfrange
<0020> <0022> [<0041> <0042> <00430043>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def _type0_pdf(compress_cmap: bool = False) -> bytes:
    """Single page mixing a Type0 font with ToUnicode CMap (/F1) and a
    plain simple font (/F2). The /F1 show-string uses 2-byte character
    codes that are NOT unicode (0001, 0002, 0010.., 0020..) so a latin-1
    fallback would produce garbage — only the CMap yields readable text."""
    import zlib

    cmap_body = _CMAP_BODY
    filt = b""
    if compress_cmap:
        cmap_body = zlib.compress(cmap_body)
        filt = b" /Filter /FlateDecode"
    content = (
        b"BT /F1 12 Tf <0001 0002 0010 0011 0012 0020 0021 0022> Tj "
        b"T* /F2 10 Tf (plain latin) Tj ET"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeCID "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap_body)).encode() + filt + b" >>\nstream\n"
        + cmap_body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    return _assemble_pdf(objs)


def test_parse_pdf_type0_tounicode_cmap():
    from delm_spark.io.pdf import parse_pdf_bytes

    for compress in (False, True):
        text = parse_pdf_bytes(_type0_pdf(compress_cmap=compress))
        # bfchar: 0001 -> H, 0002 -> e + combining acute (multi-unit dst)
        # bfrange incremental: 0010..0012 -> l m n
        # bfrange array: 0020 -> A, 0021 -> B, 0022 -> CC (two units)
        assert "HélmnABCC" in text
        # the simple-font /F2 string still decodes via latin-1 fallback
        assert "plain latin" in text


def test_parse_tounicode_cmap_kernel():
    from delm_spark.io.pdf import parse_tounicode_cmap

    cmap = parse_tounicode_cmap(_CMAP_BODY)
    assert cmap.code_len == 2
    assert cmap.map[0x0001] == "H"
    assert cmap.map[0x0002] == "é"
    assert [cmap.map[c] for c in (0x10, 0x11, 0x12)] == ["l", "m", "n"]
    assert cmap.map[0x0022] == "CC"
    # codes outside the map are dropped, not garbled
    assert cmap.decode(bytes.fromhex("0001FFFF0010")) == "Hl"


def test_font_state_persists_across_text_blocks():
    """Tf is graphics state: a BT/ET block WITHOUT its own Tf keeps the
    previously selected font's CMap (common writer pattern)."""
    from delm_spark.io.pdf import parse_pdf_bytes

    content = (
        b"BT /F1 12 Tf <0001> Tj ET "
        b"BT <0010> Tj ET "          # no Tf: still the /F1 CMap
        b"BT /F2 9 Tf (plain) Tj ET "
        b"BT (more) Tj ET"           # still the simple font -> latin-1
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(_CMAP_BODY)).encode() + b" >>\nstream\n"
        + _CMAP_BODY + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    text = parse_pdf_bytes(_assemble_pdf(objs))
    lines = text.split("\n")
    assert lines[0] == "H"      # 0001 via CMap
    assert lines[1] == "l"      # 0010 via the SAME CMap (no Tf in block)
    assert lines[2] == "plain" and lines[3] == "more"


def test_font_resource_indirect_dict():
    """/Font given as an indirect reference to a resource object."""
    from delm_spark.io.pdf import parse_pdf_bytes

    content = b"BT /G1 12 Tf <00010010> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font 8 0 R >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(_CMAP_BODY)).encode() + b" >>\nstream\n"
        + _CMAP_BODY + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /G1 5 0 R >>",
    ]
    text = parse_pdf_bytes(_assemble_pdf(objs))
    assert "Hl" in text


def test_load_pdf_via_spark(spark, tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(_minimal_pdf(PDF_CONTENT, compress=True))
    (d / "b.pdf").write_bytes(
        _minimal_pdf(b"BT /F1 9 Tf (Second doc) Tj ET", compress=False)
    )
    df, ext = __import__("delm_spark.io.loaders", fromlist=["load_directory"]).load_directory(
        spark, str(d)
    )
    rows = {r["delm_file_name"].split("/")[-1]: r["delm_raw_data"]
            for r in df.collect()}
    assert ext == ".pdf"
    assert "Hello (escaped) world" in rows["a.pdf"]
    assert rows["b.pdf"] == "Second doc"


def test_font_state_persists_across_contents_array_pieces():
    """A page's /Contents ARRAY is one logical stream split across
    objects (PDF 32000-1 s7.8.2): a Tf issued in piece 1 still governs
    text shown in piece 2."""
    from delm_spark.io.pdf import parse_pdf_bytes

    piece1 = b"BT /F1 12 Tf <0001> Tj ET"
    piece2 = b"BT <0010> Tj ET"  # no Tf: decodes via piece 1's CMap
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 7 0 R] "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(piece1)).encode() + b" >>\nstream\n"
        + piece1 + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(_CMAP_BODY)).encode() + b" >>\nstream\n"
        + _CMAP_BODY + b"\nendstream",
        b"<< /Length " + str(len(piece2)).encode() + b" >>\nstream\n"
        + piece2 + b"\nendstream",
    ]
    text = parse_pdf_bytes(_assemble_pdf(objs))
    assert text.split("\n") == ["H", "l"]


def test_incremental_update_page_not_duplicated():
    """An incrementally-updated PDF rewrites a page dict under the SAME
    object number (signing/annotation); only the latest version may emit
    text — not once per surviving copy."""
    from delm_spark.io.pdf import parse_pdf_bytes

    content = b"BT (Hello) Tj ET"
    body3 = (
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        body3,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    parts = [b"%PDF-1.4\n"]
    for i, o in enumerate(objs, 1):
        parts.append(str(i).encode() + b" 0 obj\n" + o + b"\nendobj\n")
    # incremental update: object 3 appears AGAIN (annotated page dict)
    parts.append(b"3 0 obj\n" + body3 + b" \nendobj\n")
    parts.append(b"trailer << /Root 1 0 R >>\n%%EOF")
    assert parse_pdf_bytes(b"".join(parts)) == "Hello"


def test_contents_ref_to_array_object_keeps_font_state():
    """/Contents N 0 R where object N is itself the pieces array (legal
    per PDF 32000-1): pieces still concatenate into one logical stream,
    so a Tf in piece 1 governs piece 2."""
    from delm_spark.io.pdf import parse_pdf_bytes

    piece1 = b"BT /F1 12 Tf <0001> Tj ET"
    piece2 = b"BT <0010> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(piece1)).encode() + b" >>\nstream\n"
        + piece1 + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(_CMAP_BODY)).encode() + b" >>\nstream\n"
        + _CMAP_BODY + b"\nendstream",
        b"<< /Length " + str(len(piece2)).encode() + b" >>\nstream\n"
        + piece2 + b"\nendstream",
        b"[4 0 R 7 0 R]",  # the indirect Contents array (object 8)
    ]
    text = parse_pdf_bytes(_assemble_pdf(objs))
    assert text.split("\n") == ["H", "l"]


def test_identity_h_without_tounicode_placeholders_and_quality(spark, tmp_path):
    """VERDICT r4 #8: a Type0/Identity-H font with NO ToUnicode CMap must
    not decode its 2-byte glyph ids as latin-1 mojibake — each glyph maps
    to a deterministic plane-15 PUA placeholder, and the per-file
    decode_quality column (min over text units) flags the page so
    curation can gate on it."""
    from delm_spark.io.pdf import parse_pdf_bytes, parse_pdf_quality

    content = b"BT /F1 12 Tf <00410042> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /NotoSans "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 >>",
    ]
    pdf = _assemble_pdf(objs)
    text, quality = parse_pdf_quality(pdf)
    # glyph ids 0x0041, 0x0042 -> U+F0041, U+F0042: placeholders, not 'A'/'B'
    assert chr(0xF0041) in text and chr(0xF0042) in text
    assert "A" not in text and "B" not in text and "�" not in text
    assert quality == 0.0  # every glyph on the page is a placeholder
    assert parse_pdf_bytes(pdf) == text  # same text layer either way
    # a digital-born file scores 1.0
    _, q_clean = parse_pdf_quality(_minimal_pdf(PDF_CONTENT, compress=True))
    assert q_clean == 1.0
    # the Spark loader surfaces the column per file
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "cid.pdf").write_bytes(pdf)
    (d / "clean.pdf").write_bytes(_minimal_pdf(PDF_CONTENT))
    from delm_spark.io.pdf import load_pdf

    rows = {
        r["delm_file_name"].split("/")[-1]: r["decode_quality"]
        for r in load_pdf(spark, str(d)).collect()
    }
    assert rows == {"cid.pdf": 0.0, "clean.pdf": 1.0}
