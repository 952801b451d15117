"""Dependency-free minimal .xlsx reader/writer (S5 byte level).

The reference reads incident workbooks with pandas+openpyxl
(``pd.ExcelFile`` / ``pd.read_excel``, ``backend/app/utils.py:469-485``).
openpyxl isn't in this environment — but OOXML spreadsheets are a public
format: a zip archive of small XML parts (ECMA-376).  This module reads
the subset an analytics ingest needs:

- ``xl/workbook.xml``           → sheet names in workbook order
- ``xl/_rels/workbook.xml.rels``→ sheet name → worksheet part path
- ``xl/sharedStrings.xml``      → the shared-string table
- ``xl/styles.xml``             → which cell styles are date formats
- ``xl/worksheets/sheetN.xml``  → rows/cells (shared, inline and formula
  strings, numbers, booleans, date-styled serials)

Cells keep their raw values: strings as str, numbers as float (int when
integral).  Date cells in xlsx are serial numbers whose cell style (the
``s`` attribute → ``cellXfs`` → ``numFmtId``) carries a date format;
those are decoded to ISO ``yyyy-MM-dd`` strings (``yyyy-MM-dd HH:mm:ss``
when a time-of-day fraction is present) — the same calendar the
reference's openpyxl path uses (1900 date system incl. the phantom
1900-02-29, ``backend/app/utils.py:484,520-524``), surfaced as strings
so the pipeline's strict ``try_to_date`` contract (C6) is unchanged.

The writer emits the minimal valid part set (inline strings only) and
exists to round-trip the reader in tests, like ``dbf.write_dbf`` and
``shapefile.write_shp``.

Driver-side by design: incident workbooks are batch-upload-sized; the
rows distribute via ``spark.createDataFrame`` after normalization.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

__all__ = ["read_xlsx", "write_xlsx"]

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")

#: built-in ECMA-376 numFmtIds that render as dates/times (§18.8.30)
_BUILTIN_DATE_FMT_IDS = frozenset(range(14, 23)) | frozenset(range(27, 37)) | frozenset(
    range(45, 48)
) | frozenset(range(50, 59))

#: quoted literals / bracketed sections / escaped chars carry no format
#: semantics — strip before sniffing for date tokens
_FMT_NOISE = re.compile(r'"[^"]*"|\[[^\]]*\]|\\.')


def _is_date_format_code(code: str) -> bool:
    """True when a custom number-format code renders a date/time: after
    dropping quoted text, ``[...]`` sections and escapes, any of the
    ``y m d h s`` tokens remains (the openpyxl ``is_date_format``
    heuristic).  'General', '0.00', '#,##0%' → False."""
    if not code or code.lower() == "general":
        return False
    return re.search(r"[ymdhs]", _FMT_NOISE.sub("", code), re.IGNORECASE) is not None


def _parse_date_styles(styles_xml: bytes) -> frozenset[int]:
    """Indexes into ``cellXfs`` whose number format is a date format —
    what a cell's ``s`` attribute points at."""
    root = ET.fromstring(styles_xml)
    custom = {
        int(nf.get("numFmtId")): nf.get("formatCode") or ""
        for nf in root.iter()
        if _local(nf.tag) == "numFmt" and nf.get("numFmtId")
    }
    cellxfs = next((e for e in root.iter() if _local(e.tag) == "cellXfs"), None)
    if cellxfs is None:
        return frozenset()
    out = set()
    for i, xf in enumerate(e for e in cellxfs if _local(e.tag) == "xf"):
        fid = int(xf.get("numFmtId", "0"))
        if fid in _BUILTIN_DATE_FMT_IDS or _is_date_format_code(custom.get(fid, "")):
            out.add(i)
    return frozenset(out)


#: 1900 date system epochs: serials ≥ 61 sit after Lotus's phantom
#: 1900-02-29 (serial 60), serials 1–59 before it
_EPOCH_POST_LEAP = _dt.datetime(1899, 12, 30)
_EPOCH_PRE_LEAP = _dt.datetime(1899, 12, 31)
#: Mac 1904 date system: serial 0 = 1904-01-01, no phantom leap day
_EPOCH_1904 = _dt.datetime(1904, 1, 1)


def _date_from_serial(serial: float, date1904: bool = False) -> str:
    """Excel serial → ISO string (date-only when there is no time
    fraction).  Mirrors openpyxl's ``from_excel`` for both the 1900
    system (incl. the phantom 1900-02-29) and the Mac 1904 system
    (``workbookPr date1904``)."""
    days = int(serial)
    frac = serial - days
    if date1904:
        base = _EPOCH_1904
    else:
        base = _EPOCH_POST_LEAP if days >= 61 else _EPOCH_PRE_LEAP
    dt = base + _dt.timedelta(days=days, seconds=round(frac * 86400))
    if dt.hour == dt.minute == dt.second == 0:
        return dt.strftime("%Y-%m-%d")
    return dt.strftime("%Y-%m-%d %H:%M:%S")


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


def _parse_sheet_xml(
    xml: bytes,
    shared: list[str],
    date_styles: frozenset[int] = frozenset(),
    date1904: bool = False,
) -> list[list]:
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
                s_attr = c.get("s")
                if s_attr is not None and int(s_attr) in date_styles and (
                    f >= 1 or (date1904 and f >= 0)
                ):
                    val = _date_from_serial(f, date1904)
                else:
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
        date_styles = (
            _parse_date_styles(z.read("xl/styles.xml"))
            if "xl/styles.xml" in z.namelist()
            else frozenset()
        )
        wbpr = next((e for e in wb.iter() if _local(e.tag) == "workbookPr"), None)
        date1904 = wbpr is not None and (
            (wbpr.get("date1904") or "").lower() in ("1", "true")
        )

        out: dict[str, pd.DataFrame] = {}
        for sheet in (e for e in wb.iter() if _local(e.tag) == "sheet"):
            name = sheet.get("name")
            rid = next(v for k, v in sheet.attrib.items() if k.endswith("}id") or k == "id")
            target = rel_target[rid].lstrip("/")  # absolute OPC part names
            part = target if target.startswith("xl/") else f"xl/{target}"
            grid = _parse_sheet_xml(z.read(part), shared, date_styles, date1904)
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


def _to_serial(d: _dt.date | _dt.datetime) -> float:
    """Date → Excel 1900-system serial.  Dates before 1900-03-01 sit
    before Lotus's phantom 1900-02-29 and use the pre-leap epoch
    (1900-02-28 → 59, not 60)."""
    dt = d if isinstance(d, _dt.datetime) else _dt.datetime(d.year, d.month, d.day)
    epoch = _EPOCH_POST_LEAP if dt >= _dt.datetime(1900, 3, 1) else _EPOCH_PRE_LEAP
    delta = dt - epoch
    return delta.days + delta.seconds / 86400.0


#: minimal styles part: xf 0 = General, xf 1 = built-in date numFmtId 14
#: (m/d/yyyy), xf 2 = built-in datetime numFmtId 22 (m/d/yy h:mm)
_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="1"><font/></fonts>'
    '<fills count="1"><fill/></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>'
    '<cellXfs count="3">'
    '<xf numFmtId="0" xfId="0"/>'
    '<xf numFmtId="14" applyNumberFormat="1" xfId="0"/>'
    '<xf numFmtId="22" applyNumberFormat="1" xfId="0"/>'
    "</cellXfs></styleSheet>"
)


def write_xlsx(sheets: dict[str, pd.DataFrame], path: str) -> None:
    """Write ``{name: DataFrame}`` as a minimal .xlsx (inline strings;
    header row from the columns; ``datetime.date``/``datetime`` values as
    DATE-STYLED serial cells, like real workbooks).  Tests/fixtures only."""
    n = len(sheets)
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
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
        + f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        + "</Relationships>"
    )

    def sheet_xml(df: pd.DataFrame) -> str:
        def cell(ci: int, ri: int, v) -> str:
            ref = f"{_col_ref(ci)}{ri + 1}"
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return ""
            if isinstance(v, bool):
                return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
            if isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp)):
                if isinstance(v, pd.Timestamp):
                    v = v.to_pydatetime()
                has_time = isinstance(v, _dt.datetime) and (
                    v.hour or v.minute or v.second
                )
                serial = _to_serial(v)
                style = 2 if has_time else 1
                sv = serial if has_time else int(serial)
                return f'<c r="{ref}" s="{style}"><v>{sv}</v></c>'
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
        z.writestr("xl/styles.xml", _STYLES_XML)
        for i, df in enumerate(sheets.values()):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(df))
