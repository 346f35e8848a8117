"""Minimal xlsx codec on the stdlib alone (zipfile + xml.etree).

The reference ships Excel in/out through pandas + openpyxl
(reference: yaetos/excel_utils.py:8-30, yaetos/pandas_utils.py:21-82).
openpyxl is not in this image, so the pandas shim alone would leave
Excel import-gated.  An .xlsx file is just a zip of SpreadsheetML
parts, and the subset pandas actually round-trips — one sheet, a
header row, numbers / strings / booleans / blanks — needs no codec
library at all.  This module implements exactly that subset:

- ``read_xlsx``  → list of header names + list of row tuples.  Handles
  shared strings (``t="s"``), inline strings (``t="inlineStr"``),
  formula-cached strings (``t="str"``), booleans (``t="b"``), and
  numbers (no ``t``), with sparse cells restored from the ``r``
  cell references.
- ``write_xlsx`` ← header + rows, emitting shared strings for text (the
  layout real producers emit, so our reader's ``t="s"`` path is
  exercised by our own files).

Small-data contract, same as the pandas shim it backs: Excel exists
for humans, so whole-file driver-side processing is the right scope —
the distributed formats are parquet/csv/json/orc.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'B' → 1, ..., 'AA' → 26 (spreadsheet base-26)."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _col_name(idx: int) -> str:
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(65 + rem) + name
    return name


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        node = cell.find(f"{_NS}is/{_NS}t")
        return node.text or "" if node is not None else ""
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":  # formula cached result
        return v.text
    if ctype == "b":
        return v.text == "1"
    # numeric: preserve ints exactly (pandas-style inference)
    num = float(v.text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def _first_sheet_part(zf: zipfile.ZipFile) -> str | None:
    """Resolve the workbook's FIRST worksheet part name.

    Part numbers don't track display order (a producer that reorders
    sheets keeps the original partN names), so the authoritative chain
    is workbook.xml ``<sheets>`` order → the first sheet's ``r:id`` →
    its Target in xl/_rels/workbook.xml.rels.  Fall back to numeric
    part-name sort (NOT lexicographic — sheet10 would sort before
    sheet2) when the chain is absent or broken."""
    names = set(zf.namelist())
    if "xl/workbook.xml" in names and "xl/_rels/workbook.xml.rels" in names:
        try:
            import posixpath

            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            # only WORKSHEET relationships: a chartsheet tab has no cell
            # data, so the first DATA sheet in display order is the one
            # pandas-equivalent semantics want
            ws_rels = {
                rel.get("Id"): rel.get("Target")
                for rel in rels.iter(f"{_PKG_RNS}Relationship")
                if str(rel.get("Type", "")).endswith("/worksheet") and rel.get("Target")
            }
            for sheet in wb.findall(f"{_NS}sheets/{_NS}sheet"):
                target = ws_rels.get(sheet.get(f"{_RNS}id"))
                if not target:
                    continue  # chart tab or dangling r:id — keep looking
                # Targets are package-absolute ("/xl/...") or relative
                # to the xl/ part directory
                part = (
                    target.lstrip("/")
                    if target.startswith("/")
                    else posixpath.normpath("xl/" + target)
                )
                if part in names:
                    return part
        except ET.ParseError:
            pass
    numbered = sorted(
        (n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"sheet(\d+)", n).group(1)),
    )
    return numbered[0] if numbered else None


def read_xlsx(path: str):
    """First worksheet → (header_names, rows). The first row is the
    header (pandas ``read_excel`` default); sparse/missing cells come
    back as None."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                # a shared string may be split across rich-text runs
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        first = _first_sheet_part(zf)
        if first is None:
            raise ValueError(f"no worksheet found in {path}")
        root = ET.fromstring(zf.read(first))

    grid: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: list = []
        for cell in row.findall(f"{_NS}c"):
            ref = cell.get("r")
            if ref:
                col = _col_index(_CELL_REF.fullmatch(ref).group(1))
                while len(cells) < col:
                    cells.append(None)
            cells.append(_cell_value(cell, shared))
        grid.append(cells)
    if not grid:
        return [], []
    header = ["" if h is None else str(h) for h in grid[0]]
    width = len(header)
    rows = [(r + [None] * width)[:width] for r in grid[1:]]
    # xlsx numbers carry no int/float distinction; harmonize per COLUMN
    # like pandas: one float in a column makes the whole column float
    for c in range(width):
        if any(isinstance(r[c], float) for r in rows):
            for r in rows:
                if isinstance(r[c], int) and not isinstance(r[c], bool):
                    r[c] = float(r[c])
    return header, [tuple(r) for r in rows]


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
    "</Relationships>"
)


def write_xlsx(path: str, header: list[str], rows) -> None:
    """Write one sheet, header row first; text lands in sharedStrings
    (deduplicated, like real producers), numbers/bools inline, None as
    a blank (omitted) cell."""
    strings: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in strings:
            strings[s] = len(strings)
        return strings[s]

    def cell_xml(ref: str, value) -> str:
        if value is None:
            return ""
        if isinstance(value, bool):
            return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
        if isinstance(value, (int, float)):
            return f'<c r="{ref}"><v>{value!r}</v></c>'
        return f'<c r="{ref}" t="s"><v>{sref(str(value))}</v></c>'

    body = []
    for rnum, row in enumerate([tuple(header)] + [tuple(r) for r in rows], start=1):
        cells = "".join(
            cell_xml(f"{_col_name(c)}{rnum}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{rnum}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    ordered = sorted(strings, key=strings.get)
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(ordered)}" uniqueCount="{len(ordered)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in ordered)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
