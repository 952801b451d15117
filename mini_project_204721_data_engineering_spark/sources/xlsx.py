"""Dependency-free minimal .xlsx reader/writer (S5 byte level).

The reference reads incident workbooks with pandas+openpyxl
(``pd.ExcelFile`` / ``pd.read_excel``, ``backend/app/utils.py:469-485``).
openpyxl isn't in this environment — but OOXML spreadsheets are a public
format: a zip archive of small XML parts (ECMA-376).  This module reads
the subset an analytics ingest needs:

- ``xl/workbook.xml``           → sheet names in workbook order
- ``xl/_rels/workbook.xml.rels``→ sheet name → worksheet part path
- ``xl/sharedStrings.xml``      → the shared-string table
- ``xl/worksheets/sheetN.xml``  → rows/cells (shared, inline and formula
  strings, numbers, booleans)

Cells keep their raw values: strings as str, numbers as float (int when
integral).  Date cells in xlsx are style-tagged serial numbers; styles
are out of scope, so dates surface as serials/strings and the pipeline's
``try_to_date`` handles parsing — same contract as the rest of the
ingest (C6).

The writer emits the minimal valid part set (inline strings only) and
exists to round-trip the reader in tests, like ``dbf.write_dbf`` and
``shapefile.write_shp``.

Driver-side by design: incident workbooks are batch-upload-sized; the
rows distribute via ``spark.createDataFrame`` after normalization.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

__all__ = ["read_xlsx", "write_xlsx"]

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 ..."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _si_text(si: ET.Element) -> str:
    """A shared-string item: concatenate every <t> descendant (plain and
    rich-text runs)."""
    return "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")


def _parse_sheet_xml(xml: bytes, shared: list[str]) -> list[list]:
    root = ET.fromstring(xml)
    rows: dict[int, dict[int, object]] = {}
    width = 0
    next_row = 0
    for row_el in (e for e in root.iter() if _local(e.tag) == "row"):
        r_attr = row_el.get("r")
        ri = int(r_attr) - 1 if r_attr else next_row
        next_row = ri + 1
        cells: dict[int, object] = {}
        next_col = 0
        for c in (e for e in row_el if _local(e.tag) == "c"):
            ref = c.get("r")
            if ref:
                m = _CELL_REF.match(ref)
                ci = _col_index(m.group(1)) if m else next_col
            else:
                ci = next_col
            next_col = ci + 1
            ctype = c.get("t", "n")
            v_el = next((e for e in c if _local(e.tag) == "v"), None)
            is_el = next((e for e in c if _local(e.tag) == "is"), None)
            val: object = None
            if ctype == "s" and v_el is not None:
                val = shared[int(v_el.text)]
            elif ctype == "inlineStr" and is_el is not None:
                val = _si_text(is_el)
            elif ctype in ("str", "e") and v_el is not None:
                # "e" = error cells (#DIV/0! etc.) — surface the error
                # string rather than crashing the whole ingest
                val = v_el.text or ""
            elif ctype == "b" and v_el is not None:
                val = v_el.text == "1"
            elif v_el is not None and v_el.text is not None:
                f = float(v_el.text)
                val = int(f) if f.is_integer() else f
            cells[ci] = val
            width = max(width, ci + 1)
        rows[ri] = cells
    if not rows:
        return []
    height = max(rows) + 1
    return [
        [rows.get(r, {}).get(c) for c in range(width)] for r in range(height)
    ]


def read_xlsx(path: str) -> dict[str, pd.DataFrame]:
    """Read every sheet of an .xlsx into ``{name: DataFrame}`` with
    pandas ``read_excel(header=0)`` semantics (first row becomes the
    columns) — the shape ``excel.choose_sheet`` /
    ``excel.normalize_incident_sheet`` consume."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target") for r in rels if _local(r.tag) == "Relationship"
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in sst if _local(si.tag) == "si"]

        out: dict[str, pd.DataFrame] = {}
        for sheet in (e for e in wb.iter() if _local(e.tag) == "sheet"):
            name = sheet.get("name")
            rid = next(v for k, v in sheet.attrib.items() if k.endswith("}id") or k == "id")
            target = rel_target[rid].lstrip("/")  # absolute OPC part names
            part = target if target.startswith("xl/") else f"xl/{target}"
            grid = _parse_sheet_xml(z.read(part), shared)
            if not grid:
                out[name] = pd.DataFrame()
                continue
            header = [("" if v is None else str(v)) for v in grid[0]]
            out[name] = pd.DataFrame(grid[1:], columns=header)
        return out


_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    for k, v in _XML_ESC.items():
        s = s.replace(k, v)
    return s


def _col_ref(ci: int) -> str:
    ref = ""
    ci += 1
    while ci:
        ci, rem = divmod(ci - 1, 26)
        ref = chr(65 + rem) + ref
    return ref


def write_xlsx(sheets: dict[str, pd.DataFrame], path: str) -> None:
    """Write ``{name: DataFrame}`` as a minimal .xlsx (inline strings;
    header row from the columns).  Tests/fixtures only."""
    n = len(sheets)
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name="{_esc(str(name))}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )

    def sheet_xml(df: pd.DataFrame) -> str:
        def cell(ci: int, ri: int, v) -> str:
            ref = f"{_col_ref(ci)}{ri + 1}"
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return ""
            if isinstance(v, bool):
                return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
            if isinstance(v, (int, float)):
                return f'<c r="{ref}"><v>{v}</v></c>'
            return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>'

        rows = ['<row r="1">' + "".join(cell(ci, 0, c) for ci, c in enumerate(df.columns)) + "</row>"]
        for ri, (_, row) in enumerate(df.iterrows(), start=1):
            rows.append(
                f'<row r="{ri + 1}">'
                + "".join(cell(ci, ri, v) for ci, v in enumerate(row))
                + "</row>"
            )
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>" + "".join(rows) + "</sheetData></worksheet>"
        )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, df in enumerate(sheets.values()):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(df))
