"""Excel incident-log source (reference S5, ``utils.py:451-501``).

The reference accepts multi-sheet workbooks with two header layouts:
format 1 (English headers on row 0) and format 2 (two junk rows, Thai
headers).  Its sheet chooser fuzzy-normalizes sheet names.

Byte-level reads use pandas+openpyxl when available (full xlsx feature
coverage) and fall back to the dependency-free OOXML reader
(``sources/xlsx.py`` — xlsx is a public zip-of-XML format) otherwise,
so S5 is real end-to-end in this environment too.
"""

from __future__ import annotations

import pandas as pd

from mini_project_204721_data_engineering_spark.functions.text import normalize_sheet_name

__all__ = [
    "REQUIRED_COLUMNS",
    "ACCEPTED_SHEET_KEYS",
    "THAI_RENAME",
    "choose_sheet",
    "normalize_incident_sheet",
    "read_incident_workbook",
]

#: required columns after normalization (``utils.py:487-490``)
REQUIRED_COLUMNS = ("Disaster Date", "Province", "District")

#: normalized sheet-name keys the reference accepts (``utils.py:16-20``)
ACCEPTED_SHEET_KEYS = ("incidents", "รายงาน", "data", "sheet1")

#: format-2 Thai header → canonical rename (``utils.py:501``)
THAI_RENAME = {
    "วันที่เกิดภัย": "Disaster Date",
    "จังหวัด": "Province",
    "อำเภอ": "District",
}


def choose_sheet(sheet_names: list[str]) -> str:
    """Fuzzy sheet selection (``utils.py:451-467``): first sheet whose
    normalized name matches an accepted key; else the first sheet."""
    for name in sheet_names:
        if normalize_sheet_name(name) in ACCEPTED_SHEET_KEYS:
            return name
    return sheet_names[0]


def normalize_incident_sheet(df: pd.DataFrame) -> pd.DataFrame:
    """Layout sniff + normalization (``utils.py:487-501``).

    Format 1: required columns already present → validate and pass.
    Format 2: drop the two junk rows, promote the Thai header row,
    rename to canonical names.  Raises ``ValueError`` naming the missing
    columns otherwise (the reference's required-column contract, F10).
    """
    if set(REQUIRED_COLUMNS) <= set(map(str, df.columns)):
        out = df.copy()
    else:
        # format 2: row 1 holds the Thai headers (rows 0-1 are junk)
        if len(df) < 2:
            raise ValueError(
                f"missing required columns {sorted(set(REQUIRED_COLUMNS) - set(map(str, df.columns)))}"
            )
        header = [str(v).strip() for v in df.iloc[1]]
        out = df.iloc[2:].copy()
        out.columns = header
        out = out.rename(columns=THAI_RENAME)
        missing = set(REQUIRED_COLUMNS) - set(map(str, out.columns))
        if missing:
            raise ValueError(f"missing required columns {sorted(missing)}")
    out = out[list(REQUIRED_COLUMNS)].copy()
    for c in ("Province", "District"):
        out[c] = out[c].map(lambda v: str(v).strip() if pd.notna(v) else None)
    return out.reset_index(drop=True)


def read_incident_workbook(path: str) -> pd.DataFrame:
    """Full byte-level read: fuzzy sheet choice → layout normalization.

    Container routing matches the reference's ``pd.ExcelFile``
    (``utils.py:475-485``), which accepts both ``.xlsx`` and legacy
    ``.xls``: OLE2/CFB magic routes to the dependency-free BIFF8 reader
    (``sources/xls.py``); OOXML zips use pandas+openpyxl when installed
    or the dependency-free reader (``sources/xlsx.py``) otherwise — same
    ``header=0`` row shape every way, so the layout logic downstream is
    container-agnostic."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":  # legacy .xls
        from mini_project_204721_data_engineering_spark.sources.xls import read_xls

        sheets = read_xls(path)
        sheet = choose_sheet(list(sheets))
        return normalize_incident_sheet(sheets[sheet])
    # gate ONLY the import: a pandas-internal ImportError (e.g. openpyxl
    # minimum-version check) should surface, not silently downgrade the
    # read to the minimal fallback reader
    try:
        import openpyxl  # noqa: F401

        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if have_openpyxl:
        xl = pd.ExcelFile(path)
        sheet = choose_sheet(xl.sheet_names)
        raw = pd.read_excel(xl, sheet_name=sheet, header=0)
    else:
        from mini_project_204721_data_engineering_spark.sources.xlsx import read_xlsx

        sheets = read_xlsx(path)
        sheet = choose_sheet(list(sheets))
        raw = sheets[sheet]
    return normalize_incident_sheet(raw)
