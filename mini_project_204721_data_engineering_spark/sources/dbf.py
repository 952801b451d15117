"""Dependency-free dBASE III (.dbf) reader/writer.

The reference reads its landslide-risk table with ``dbfread`` and TIS-620
encoding (``backend/app/utils.py:293-294``).  That library isn't in this
environment, and the dBASE III layout is a small fixed public binary
format — 32-byte header, 32-byte field descriptors terminated by 0x0D,
fixed-width ASCII records prefixed by a deletion flag — so we read it
directly.

Reader returns a pandas DataFrame (DBF attribute tables are dimension-
sized; distribution happens after ``spark.createDataFrame``).
"""

from __future__ import annotations

import struct
from datetime import date

import pandas as pd

__all__ = ["read_dbf", "write_dbf"]


def read_dbf(path: str, encoding: str = "tis-620", lowercase_columns: bool = True) -> pd.DataFrame:
    """Read a dBASE III file into a DataFrame.

    ``encoding`` defaults to TIS-620 per the reference source (S4);
    ``lowercase_columns`` reproduces its column normalization (C13,
    ``utils.py:297``).  Deleted records (flag ``*``) are skipped.
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 32:
        raise ValueError(f"not a DBF file (too short): {path}")
    n_records, header_len, record_len = struct.unpack_from("<IHH", data, 4)

    fields: list[tuple[str, str, int, int]] = []  # (name, type, length, decimals)
    off = 32
    while off < header_len - 1 and data[off] != 0x0D:
        raw = data[off : off + 32]
        name = raw[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        off += 32

    rows = []
    pos = header_len
    for _ in range(n_records):
        if pos + record_len > len(data):
            break
        rec = data[pos : pos + record_len]
        pos += record_len
        if rec[0:1] == b"*":  # deleted
            continue
        vals = {}
        p = 1
        for name, ftype, flen, fdec in fields:
            raw_v = rec[p : p + flen]
            p += flen
            if ftype == "C":
                vals[name] = raw_v.decode(encoding, "replace").rstrip()
            elif ftype in ("N", "F"):
                s = raw_v.decode("ascii", "replace").strip()
                if not s:
                    vals[name] = None
                elif fdec or "." in s:
                    try:
                        vals[name] = float(s)
                    except ValueError:
                        vals[name] = None
                else:
                    try:
                        vals[name] = int(s)
                    except ValueError:
                        vals[name] = None
            elif ftype == "D":
                s = raw_v.decode("ascii", "replace").strip()
                vals[name] = (
                    date(int(s[0:4]), int(s[4:6]), int(s[6:8])) if len(s) == 8 else None
                )
            elif ftype == "L":
                c = raw_v.decode("ascii", "replace")
                vals[name] = True if c in "YyTt" else False if c in "NnFf" else None
            else:
                vals[name] = raw_v.decode(encoding, "replace").rstrip()
        rows.append(vals)

    df = pd.DataFrame(rows, columns=[f[0] for f in fields])
    if lowercase_columns:
        df.columns = [c.lower() for c in df.columns]
    return df


def write_dbf(df: pd.DataFrame, path: str, encoding: str = "tis-620") -> None:
    """Write a DataFrame as dBASE III (strings as C fields, numbers as N).

    Primarily for tests/fixtures — gives the reader a real binary file to
    exercise, including the TIS-620 round trip.
    """
    fields = []
    for col in df.columns:
        ser = df[col]
        if ser.dtype.kind in "if":
            fields.append((col, "N", 18, 6 if ser.dtype.kind == "f" else 0))
        else:
            width = max([len(str(v).encode(encoding, "replace")) for v in ser.fillna("")] + [1])
            fields.append((col, "C", min(width, 254), 0))

    record_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    today = date.today()
    out += struct.pack(
        "<BBBBIHH20x",
        0x03,
        today.year - 1900,
        today.month,
        today.day,
        len(df),
        header_len,
        record_len,
    )
    for name, ftype, flen, fdec in fields:
        fd = bytearray(32)
        fd[:11] = name.encode("ascii", "replace")[:10].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen
        fd[17] = fdec
        out += fd
    out += b"\x0d"
    for _, row in df.iterrows():
        out += b" "
        for name, ftype, flen, fdec in fields:
            v = row[name]
            if ftype == "C":
                b = ("" if pd.isna(v) else str(v)).encode(encoding, "replace")
                out += b[:flen].ljust(flen, b" ")
            else:
                if pd.isna(v):
                    s = ""
                elif fdec:
                    s = f"{float(v):.{fdec}f}"
                else:
                    s = str(int(v))
                out += s.rjust(flen)[:flen].encode("ascii")
    out += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(out))
