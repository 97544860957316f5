"""DOCX / XLSX decoding with the standard library only (S3 / S8).

The reference uses python-docx and pandas.read_excel
(/root/reference/src/delm/strategies/data_loaders.py:85-152, 226-236);
neither lib exists in this environment. Both formats are ZIP archives of
XML, so the decode is implemented directly on zipfile + ElementTree:

  * docx text extraction follows the reference's part order exactly
    (data_loaders.py:109-152): section headers, body paragraphs (tables
    excluded), table cells row-major, footers — non-empty parts joined
    with newlines; a cell's text is its paragraphs joined by newlines
    (python-docx Cell.text semantics).
  * xlsx reads sheet1 + sharedStrings; the first row is the header
    (pandas.read_excel default). All values are surfaced as strings —
    cast downstream (documented divergence from pandas' type inference).

Spark-side: files arrive through the `binaryFile` source and decode in an
Arrow-batched pandas UDF (the pure functions below), so a directory of
documents decodes in parallel across executors.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Optional

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _para_text(p) -> str:
    """Concatenated run text of one w:p paragraph (python-docx Paragraph.text:
    tabs -> \\t, breaks -> \\n would need w:tab/w:br handling; text runs
    cover the reference's extraction which only uses .text)."""
    parts = []
    for node in p.iter():
        if node.tag == f"{W_NS}t" and node.text:
            parts.append(node.text)
        elif node.tag == f"{W_NS}tab":
            parts.append("\t")
        elif node.tag in (f"{W_NS}br", f"{W_NS}cr"):
            parts.append("\n")
    return "".join(parts)


def parse_docx_bytes(data: bytes) -> str:
    """All visible text of a .docx, in the reference's part order."""
    parts: list[str] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())

        def _paras(xml_name: str, skip_tables: bool):
            root = ET.fromstring(z.read(xml_name))
            body = root.find(f"{W_NS}body")
            scope = body if body is not None else root
            out = []
            for child in list(scope):
                if child.tag == f"{W_NS}p":
                    out.append(_para_text(child))
                elif not skip_tables:
                    out.extend(_para_text(p) for p in child.iter(f"{W_NS}p"))
            return out

        # 1. headers
        for name in sorted(n for n in names if re.match(r"word/header\d*\.xml$", n)):
            root = ET.fromstring(z.read(name))
            parts.extend(_para_text(p) for p in root.iter(f"{W_NS}p"))
        # 2. body paragraphs (top-level only; table text handled next)
        if "word/document.xml" in names:
            parts.extend(_paras("word/document.xml", skip_tables=True))
            # 3. tables, row-major, cell text = its paragraphs joined by \n
            root = ET.fromstring(z.read("word/document.xml"))
            for tbl in root.iter(f"{W_NS}tbl"):
                for tr in tbl.findall(f"{W_NS}tr"):
                    for tc in tr.findall(f"{W_NS}tc"):
                        cell = "\n".join(
                            _para_text(p) for p in tc.findall(f"{W_NS}p")
                        ).strip()
                        if cell:
                            parts.append(cell)
        # 4. footers
        for name in sorted(n for n in names if re.match(r"word/footer\d*\.xml$", n)):
            root = ET.fromstring(z.read(name))
            parts.extend(_para_text(p) for p in root.iter(f"{W_NS}p"))
    return "\n".join(p for p in parts if p.strip())


def _col_index(ref: str) -> int:
    """'B7' -> 1 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def parse_xlsx_rows(data: bytes) -> list:
    """First worksheet of an .xlsx as a list of rows (lists of optional
    strings), gaps preserved as None."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{S_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{S_NS}t")))
        sheet_names = sorted(
            n for n in z.namelist() if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
        )
        if not sheet_names:
            return []
        root = ET.fromstring(z.read(sheet_names[0]))
        rows: list = []
        for row in root.iter(f"{S_NS}row"):
            vals: dict[int, Optional[str]] = {}
            for c in row.findall(f"{S_NS}c"):
                idx = _col_index(c.get("r", "A"))
                t = c.get("t")
                if t == "inlineStr":
                    is_el = c.find(f"{S_NS}is")
                    v = (
                        "".join(x.text or "" for x in is_el.iter(f"{S_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v_el = c.find(f"{S_NS}v")
                    v = v_el.text if v_el is not None else None
                    if t == "s" and v is not None:
                        v = shared[int(v)]
                vals[idx] = v
            width = max(vals) + 1 if vals else 0
            rows.append([vals.get(i) for i in range(width)])
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def docx_decode_udf():
    """Series[bytes] -> Series[str] pandas UDF for the binaryFile source."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    def _decode(content):
        return content.map(lambda b: parse_docx_bytes(bytes(b)) if b is not None else None)

    return F.pandas_udf(_decode, StringType())


def load_docx(spark, path: str):
    """S3: Word documents -> (delm_file_name, delm_raw_data), decoded in
    parallel on executors."""
    from delm_spark.io.loaders import load_binary_with_udf

    return load_binary_with_udf(spark, path, decode_udf=docx_decode_udf())


def load_xlsx(spark, path: str, target_column: Optional[str] = None):
    """S8: Excel -> DataFrame, first row = header (pandas.read_excel
    default). Columns are strings; the header row of the FIRST file fixes
    the schema (Spark needs a static schema; driver reads one file's
    header, executors decode the rest)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from delm_spark.constants import FILE_NAME_COL

    bin_df = (
        spark.read.format("binaryFile")
        .load(path)
        .select(F.col("path").alias(FILE_NAME_COL), F.col("content"))
    )
    first = bin_df.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no files matched {path}")
    header = parse_xlsx_rows(bytes(first[0]["content"]))[0]
    columns = [str(h) for h in header]
    if target_column is not None and target_column not in columns:
        raise ValueError(
            f"target_column {target_column!r} not in Excel columns {columns}"
        )
    out_schema = StructType(
        [StructField(FILE_NAME_COL, StringType())]
        + [StructField(c, StringType()) for c in columns]
    )

    def decode(batches):
        for pdf in batches:
            out_rows = []
            for fname, blob in zip(pdf[FILE_NAME_COL], pdf["content"]):
                rows = parse_xlsx_rows(bytes(blob))
                for r in rows[1:]:
                    padded = (list(r) + [None] * len(columns))[: len(columns)]
                    out_rows.append([fname] + padded)
            yield pd.DataFrame(out_rows, columns=[FILE_NAME_COL] + columns)

    return bin_df.mapInPandas(decode, schema=out_schema)
