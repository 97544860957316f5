"""S4: PDF -> text, stdlib-only text-layer extraction.

The reference's PdfLoader runs marker OCR (data_loaders.py:195-224) —
a model-weight dependency this environment cannot ship. What CAN be done
natively, and covers the overwhelmingly common digital-born case, is
text-layer extraction: decompress content streams (zlib = FlateDecode)
and evaluate the text-showing operators (Tj, ', ", TJ) inside BT/ET
blocks, honoring PDF literal-string escapes and hex strings.

Scope (documented, like the office decoders' stdlib scope in office.py):
  * FlateDecode and uncompressed content streams — yes
  * standard-encoding text (latin-1-ish simple fonts) — yes
  * CID/Type0 fonts with ToUnicode CMaps, encrypted files, scanned
    image-only PDFs — no; those need the reference's OCR path, exposed
    here as the same pluggable `decode_udf` seam the other binary
    loaders use (io/loaders.py:load_binary_with_udf).

The Spark side mirrors load_docx: binaryFile source + Arrow-batched
pandas UDF, so decoding runs on executors, one batch of files at a time.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.S)
#: operators that emit the pending strings
_SHOW_OPS = (b"Tj", b"TJ", b"'", b'"')
#: operators that move to the next line
_NEWLINE_OPS = (b"T*", b"Td", b"TD")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at data[i] == '('; returns
    (decoded bytes, index after the closing paren). Handles balanced
    nested parens, backslash escapes, and octal escapes."""
    assert data[i : i + 1] == b"("
    out = bytearray()
    depth, i = 1, i + 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: emit the char itself (PDF 32000 7.3.4.2)
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a hex string starting at data[i] == '<' (not a dict '<<')."""
    j = data.find(b">", i + 1)
    if j == -1:
        return b"", len(data)
    digits = re.sub(rb"\s", b"", data[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _extract_block_text(block: bytes) -> str:
    """Evaluate the text-showing operators of one BT/ET block."""
    out: list[str] = []
    pending: list[bytes] = []
    i, n = 0, len(block)
    while i < n:
        c = block[i : i + 1]
        if c == b"(":
            s, i = _parse_literal(block, i)
            pending.append(s)
        elif c == b"<" and block[i : i + 2] != b"<<":
            s, i = _parse_hex(block, i)
            pending.append(s)
        elif c == b"<":  # inline dict (e.g. BDC properties): skip
            i += 2
        elif c == b"%":  # comment to end of line
            j = block.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif re.match(rb"[A-Za-z'\"*]", c):
            m = re.match(rb"[A-Za-z'\"*]+", block[i:])
            op = m.group(0)
            i += len(op)
            if op in (b"Tj", b"TJ"):
                out.extend(p.decode("latin-1") for p in pending)
                pending.clear()
            elif op in (b"'", b'"'):
                out.append("\n")
                out.extend(p.decode("latin-1") for p in pending)
                pending.clear()
            elif op in _NEWLINE_OPS:
                if out and out[-1] != "\n":
                    out.append("\n")
                pending.clear()
            elif op == b"Tf":  # font select consumes a name + size
                pending.clear()
            # other operators: positioned text (Tm) keeps pending cleared
            elif op == b"Tm":
                pending.clear()
        else:
            i += 1
    return "".join(out)


def parse_pdf_bytes(data: bytes) -> str:
    """Extract the text layer of a PDF: every FlateDecode/uncompressed
    content stream's BT/ET blocks, in file order, newline-joined."""
    texts: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        # streams may end with \r\n/\n before 'endstream'
        body = raw[:-2] if raw.endswith(b"\r\n") else (
            raw[:-1] if raw.endswith(b"\n") else raw
        )
        try:
            content = zlib.decompress(body)
        except zlib.error:
            # uncompressed content stream, or a non-Flate stream (image);
            # only treat as content if it shows text
            content = body
        if b"BT" not in content:
            continue
        for block in _TEXT_BLOCK_RE.finditer(content):
            t = _extract_block_text(block.group(1)).strip()
            if t:
                texts.append(t)
    return "\n".join(texts)


def pdf_decode_udf():
    """Arrow-batched Series[bytes] -> Series[str] text-layer decoder — the
    same `decode_udf` seam marker OCR would plug into."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    def _decode(content):
        return content.map(
            lambda b: parse_pdf_bytes(bytes(b)) if b is not None else None
        )

    return F.pandas_udf(_decode, StringType())


def load_pdf(spark, path: str):
    """S4: PDFs -> (delm_file_name, delm_raw_data), text layer decoded on
    executors. Scanned/image PDFs need an OCR decode_udf via
    load_binary_with_udf (reference marker path, data_loaders.py:195-224)."""
    from delm_spark.io.loaders import load_binary_with_udf

    return load_binary_with_udf(spark, path, decode_udf=pdf_decode_udf())
