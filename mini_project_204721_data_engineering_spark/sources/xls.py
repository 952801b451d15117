"""Dependency-free legacy ``.xls`` (BIFF8 and BIFF5/7) reader (S5 parity edge).

The reference's ``pd.ExcelFile`` (``/root/reference/backend/app/utils.py:475-485``)
accepts both ``.xlsx`` and legacy ``.xls`` incident logs; the OOXML
reader (``sources/xlsx.py``) covers only the former.  A ``.xls`` file is
two stacked public formats:

- **OLE2 / Compound File Binary** (Microsoft's open-spec MS-CFB): a
  FAT-style container of named streams in 512-byte sectors, with a
  64-byte "mini stream" for small streams;
- **BIFF** (open-spec MS-XLS): the ``Workbook`` (BIFF8) or ``Book``
  (BIFF5) stream — a sequence of (id, length, payload) records: one
  workbook-globals substream (``SST`` shared strings in BIFF8, ``XF``
  cell formats, ``FORMAT`` codes, ``BOUNDSHEET`` directory) followed by
  one substream per sheet (``LABELSST``/``NUMBER``/``RK``/``MULRK``/
  ``LABEL``/``RSTRING``/``FORMULA`` cells).  The BOF version routes the
  two dialects: BIFF8 strings are SST/UTF-16; BIFF5 strings are inline
  bytes decoded via the workbook ``CODEPAGE`` (cp874 for Thai-era
  files).

``read_xls`` returns the same ``{sheet: DataFrame}`` shape as
``read_xlsx`` — header row promoted, date-formatted cells rendered as
ISO strings via the same serial conversion — so
``excel.read_incident_workbook`` routes on the container magic and the
two-layout normalization downstream is container-agnostic.

``write_xls`` emits a valid minimal CFB+BIFF8 workbook and exists to
round-trip the reader in tests (the xlsx/dbf/shp/netcdf strategy).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from mini_project_204721_data_engineering_spark.sources.xlsx import (
    _BUILTIN_DATE_FMT_IDS,
    _date_from_serial,
    _is_date_format_code,
)

__all__ = ["read_xls", "write_xls"]

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


# --------------------------------------------------------------------------
# OLE2 / CFB container
# --------------------------------------------------------------------------


def _cfb_stream(data: bytes, wanted: tuple[str, ...]) -> bytes:
    """Extract the first stream named in ``wanted`` (case-insensitive)
    from a CFB container, handling both regular-sector and mini-stream
    storage."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (.xls container)")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        return data[(i + 1) * ssz : (i + 2) * ssz]

    # FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    d = first_difat
    for _ in range(n_difat):
        raw = sector(d)
        per = ssz // 4 - 1
        difat.extend(struct.unpack_from(f"<{per}I", raw, 0))
        d = struct.unpack_from("<I", raw, ssz - 4)[0]
    fat: list[int] = []
    for s in difat[: max(n_fat, 1)]:
        if s == _FREESECT:
            break
        fat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(s), 0))

    def chain(start: int) -> bytes:
        out, s, hops = [], start, 0
        while s not in (_ENDOFCHAIN, _FREESECT) and hops <= len(fat):
            out.append(sector(s))
            s = fat[s]
            hops += 1
        return b"".join(out)

    # directory entries: 128 bytes each
    dir_raw = chain(first_dir)
    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        nlen = struct.unpack_from("<H", dir_raw, off + 64)[0]
        if nlen < 2:
            continue
        name = dir_raw[off : off + nlen - 2].decode("utf-16-le", "replace")
        etype = dir_raw[off + 66]
        start = struct.unpack_from("<I", dir_raw, off + 116)[0]
        size = struct.unpack_from("<Q", dir_raw, off + 120)[0] & 0xFFFFFFFF
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_raw = b""
    minifat: list[int] = []
    if root is not None and root[2] not in (_ENDOFCHAIN, _FREESECT):
        mini_raw = chain(root[2])[: root[3]]
        m, hops = first_minifat, 0
        while m not in (_ENDOFCHAIN, _FREESECT):
            if hops > len(fat):
                raise ValueError("cyclic mini-FAT chain in CFB container")
            minifat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(m), 0))
            m = fat[m]
            hops += 1

    targets = {w.lower() for w in wanted}
    for name, etype, start, size in entries:
        if etype == 2 and name.lower() in targets:
            if size < mini_cutoff and mini_raw:
                out, s, hops = [], start, 0
                while s not in (_ENDOFCHAIN, _FREESECT) and hops <= len(minifat):
                    out.append(mini_raw[s * mssz : (s + 1) * mssz])
                    s = minifat[s]
                    hops += 1
                return b"".join(out)[:size]
            return chain(start)[:size]
    raise ValueError(f"no {wanted} stream in CFB container")


# --------------------------------------------------------------------------
# BIFF8 Workbook stream
# --------------------------------------------------------------------------

_CONTINUE = 0x003C


def _records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        rid, sz = struct.unpack_from("<HH", stream, pos)
        if rid == 0:
            break
        yield rid, stream[pos + 4 : pos + 4 + sz], pos
        pos += 4 + sz


class _SegCursor:
    """Cursor over SST payload + CONTINUE payloads.  BIFF8 strings may
    split at segment boundaries, where a fresh option-flags byte
    (compressed vs UTF-16) precedes the remaining characters."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.segs[self.i]) - self.pos

    def _advance_seg(self) -> bool:
        while self.i + 1 < len(self.segs):
            self.i += 1
            self.pos = 0
            if len(self.segs[self.i]):
                return True
        return False

    def raw(self, n: int) -> bytes:
        """n bytes of non-character data (no flag byte at boundaries)."""
        out = b""
        while n > 0:
            if self._remaining() == 0:
                if not self._advance_seg():
                    raise ValueError("truncated SST")
                continue
            take = min(n, self._remaining())
            out += self.segs[self.i][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return out

    def u8(self) -> int:
        return self.raw(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.raw(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def chars(self, cch: int, high: bool) -> str:
        """cch characters, re-reading the option byte when the string
        spills into a CONTINUE segment."""
        out = []
        while cch > 0:
            if self._remaining() == 0:
                if not self._advance_seg():
                    raise ValueError("truncated SST string")
                high = bool(self.u8() & 1)  # fresh grbit at continuation
                continue
            per = 2 if high else 1
            avail = self._remaining() // per
            take = min(cch, avail)
            if take == 0:  # lone byte of a utf-16 pair at segment end
                if not self._advance_seg():
                    raise ValueError("truncated SST string")
                high = bool(self.u8() & 1)
                continue
            raw = self.raw(take * per)
            out.append(raw.decode("utf-16-le" if high else "latin-1", "replace"))
            cch -= take
        return "".join(out)


def _read_unicode_string(cur: _SegCursor, cch: int) -> str:
    flags = cur.u8()
    high = bool(flags & 0x01)
    rich = bool(flags & 0x08)
    ext = bool(flags & 0x04)
    c_run = cur.u16() if rich else 0
    cb_ext = cur.u32() if ext else 0
    s = cur.chars(cch, high)
    if c_run:
        cur.raw(4 * c_run)  # formatting runs
    if cb_ext:
        cur.raw(cb_ext)  # phonetic data
    return s


def _parse_sst(segments: list[bytes]) -> list[str]:
    cur = _SegCursor(segments)
    cur.raw(4)  # total count
    n_unique = cur.u32()
    return [_read_unicode_string(cur, cur.u16()) for _ in range(n_unique)]


def _rk_value(rk: int) -> float:
    """RK-encoded number: bit0 = ÷100, bit1 = int vs truncated double."""
    div100 = rk & 1
    if rk & 2:
        v = float(struct.unpack("<i", struct.pack("<I", rk))[0] >> 2)
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if div100 else v


def read_xls(source: str | bytes) -> dict[str, pd.DataFrame]:
    """Read every sheet of a ``.xls`` into ``{name: DataFrame}`` with
    the same header-promotion semantics as ``read_xlsx``.  Handles both
    BIFF8 (Excel 97+: SST, UTF-16 strings) and BIFF5/7 (Excel 5.0/95:
    inline LABEL/RSTRING byte strings decoded via the workbook's
    CODEPAGE record — e.g. cp874 for Thai-era files)."""
    data = source if isinstance(source, bytes) else open(source, "rb").read()
    try:
        return _read_xls_stream(_cfb_stream(data, ("Workbook", "Book")))
    except (struct.error, IndexError, KeyError, OverflowError, UnicodeDecodeError) as e:
        # truncated/corrupt workbooks fail loudly with context, not with
        # a bare struct error from the record walker
        raise ValueError(f"corrupt or truncated .xls file: {e!r}") from e


def _codepage_codec(cp: int) -> str:
    """Windows codepage id → Python codec (874 Thai, 1252 Western, …);
    unknown pages fall back to latin-1 (byte-preserving)."""
    import codecs

    if cp == 1200:
        return "utf-16-le"
    if cp == 10000:
        return "mac-roman"
    try:
        codecs.lookup(f"cp{cp}")
        return f"cp{cp}"
    except LookupError:
        return "latin-1"


def _read_xls_stream(stream: bytes) -> dict[str, pd.DataFrame]:

    # ---- BOF: route BIFF8 (Excel 97+) vs BIFF5/7 (Excel 5.0/95)
    rid0, sz0 = struct.unpack_from("<HH", stream, 0)
    if rid0 != 0x0809:
        raise ValueError(f"workbook stream does not start with BOF (rid {rid0:#x})")
    bof_ver = struct.unpack_from("<H", stream, 4)[0] if sz0 >= 2 else 0
    biff5 = bof_ver < 0x0600
    if bof_ver < 0x0500:
        raise NotImplementedError(
            f"BIFF version {bof_ver:#x} (< Excel 5.0) not supported"
        )
    enc = "latin-1"  # BIFF5 byte-string encoding until CODEPAGE arrives

    # ---- globals substream
    shared: list[str] = []
    xf_ifmt: list[int] = []
    custom_fmt: dict[int, str] = {}
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    date1904 = False
    sst_segments: list[bytes] | None = None
    collecting_sst = False
    for rid, payload, pos in _records(stream):
        if rid == 0x000A:  # EOF of globals
            break
        if rid == 0x00FC:
            sst_segments = [payload]
            collecting_sst = True
            continue
        if rid == _CONTINUE and collecting_sst:
            sst_segments.append(payload)
            continue
        collecting_sst = False  # CONTINUEs after another record aren't SST's
        if rid == 0x0022:
            date1904 = bool(struct.unpack_from("<H", payload, 0)[0])
        elif rid == 0x0042:  # CODEPAGE: byte-string encoding (BIFF5 path)
            enc = _codepage_codec(struct.unpack_from("<H", payload, 0)[0])
        elif rid == 0x041E:  # FORMAT: ifmt + code string
            ifmt = struct.unpack_from("<H", payload, 0)[0]
            if biff5:  # 1-byte length + codepage bytes
                cch = payload[2]
                custom_fmt[ifmt] = payload[3 : 3 + cch].decode(enc, "replace")
            else:
                cch = struct.unpack_from("<H", payload, 2)[0]
                cur = _SegCursor([payload[4:]])
                custom_fmt[ifmt] = cur.chars(cch, bool(cur.u8() & 1))
        elif rid == 0x00E0:  # XF (ifmt at offset 2 in BIFF5 and BIFF8)
            xf_ifmt.append(struct.unpack_from("<H", payload, 2)[0])
        elif rid == 0x0085:  # BOUNDSHEET
            lb_pos = struct.unpack_from("<I", payload, 0)[0]
            cch = payload[6]
            if biff5:  # 8-bit name in the workbook codepage
                name = payload[7 : 7 + cch].decode(enc, "replace")
            else:
                high = bool(payload[7] & 1)
                raw = payload[8 : 8 + cch * (2 if high else 1)]
                name = raw.decode("utf-16-le" if high else "latin-1", "replace")
            sheets.append((name, lb_pos))
    if sst_segments:
        shared = _parse_sst(sst_segments)

    date_xf = {
        i
        for i, ifmt in enumerate(xf_ifmt)
        if ifmt in _BUILTIN_DATE_FMT_IDS or _is_date_format_code(custom_fmt.get(ifmt, ""))
    }

    def cell_number(f: float, ixfe: int):
        if ixfe in date_xf and (f >= 1 or (date1904 and f >= 0)):
            return _date_from_serial(f, date1904)
        return int(f) if float(f).is_integer() else f

    # ---- per-sheet substreams
    out: dict[str, pd.DataFrame] = {}
    for name, lb_pos in sheets:
        cells: dict[tuple[int, int], object] = {}
        pending_formula: tuple[int, int] | None = None
        for rid, payload, pos in _records(stream[lb_pos:]):
            if rid == 0x000A:
                break
            if rid == 0x00FD:  # LABELSST
                rw, col, _ixfe, isst = struct.unpack_from("<HHHI", payload, 0)
                cells[(rw, col)] = shared[isst] if isst < len(shared) else ""
            elif rid == 0x0203:  # NUMBER
                rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
                (f,) = struct.unpack_from("<d", payload, 6)
                cells[(rw, col)] = cell_number(f, ixfe)
            elif rid == 0x027E:  # RK
                rw, col, ixfe, rk = struct.unpack_from("<HHHI", payload, 0)
                cells[(rw, col)] = cell_number(_rk_value(rk), ixfe)
            elif rid == 0x00BD:  # MULRK
                rw, col0 = struct.unpack_from("<HH", payload, 0)
                n = (len(payload) - 6) // 6
                for k in range(n):
                    ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * k)
                    cells[(rw, col0 + k)] = cell_number(_rk_value(rk), ixfe)
            elif rid in (0x0204, 0x00D6):  # LABEL / RSTRING (inline string)
                rw, col, _ixfe, cch = struct.unpack_from("<HHHH", payload, 0)
                if biff5:  # codepage bytes (RSTRING's runs follow — ignored)
                    cells[(rw, col)] = payload[8 : 8 + cch].decode(enc, "replace")
                else:
                    cur = _SegCursor([payload[8:]])
                    cells[(rw, col)] = cur.chars(cch, bool(cur.u8() & 1))
            elif rid == 0x0205:  # BOOLERR
                rw, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
                val, is_err = payload[6], payload[7]
                cells[(rw, col)] = f"#ERR{val}" if is_err else bool(val)
            elif rid == 0x0006:  # FORMULA: cached numeric / string result
                rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
                res = payload[6:14]
                if res[6:8] == b"\xff\xff":
                    if res[0] == 0:  # string: value arrives in STRING record
                        pending_formula = (rw, col)
                    elif res[0] == 1:
                        cells[(rw, col)] = bool(res[2])
                else:
                    (f,) = struct.unpack("<d", res)
                    cells[(rw, col)] = cell_number(f, ixfe)
            elif rid == 0x0207 and pending_formula is not None:  # STRING
                cch = struct.unpack_from("<H", payload, 0)[0]
                if biff5:
                    cells[pending_formula] = payload[2 : 2 + cch].decode(enc, "replace")
                else:
                    cur = _SegCursor([payload[2:]])
                    cells[pending_formula] = cur.chars(cch, bool(cur.u8() & 1))
                pending_formula = None
        if not cells:
            out[name] = pd.DataFrame()
            continue
        height = max(r for r, _ in cells) + 1
        width = max(c for _, c in cells) + 1
        grid = [[cells.get((r, c)) for c in range(width)] for r in range(height)]
        header = [("" if v is None else str(v)) for v in grid[0]]
        out[name] = pd.DataFrame(grid[1:], columns=header)
    return out


# --------------------------------------------------------------------------
# writer (test fixtures)
# --------------------------------------------------------------------------


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _ustr(s: str) -> bytes:
    b = s.encode("utf-16-le")
    return struct.pack("<HB", len(s), 1) + b


def write_xls(
    path: str,
    sheets: dict[str, list[list]],
    date_cols: dict[str, list[int]] | None = None,
    biff: int = 8,
    codepage: int = 874,
) -> None:
    """Write a minimal workbook: BIFF8 (default — strings via SST,
    UTF-16, Thai headers round-trip) or BIFF5 (Excel 5.0/95 fixture
    shape: inline LABEL byte strings in ``codepage``, 8-bit sheet
    names, CODEPAGE record) — the writer half of the BIFF5 reader
    round-trip.  Numbers as NUMBER records, ``date_cols`` columns (by
    sheet, data rows only) as date-formatted serials."""
    if biff not in (5, 8):
        raise ValueError(f"biff must be 5 or 8, got {biff}")
    biff5 = biff == 5
    bof_ver = 0x0500 if biff5 else 0x0600
    enc = _codepage_codec(codepage)
    date_cols = date_cols or {}
    strings: list[str] = []
    sst_index: dict[str, int] = {}

    def isst(s: str) -> int:
        if s not in sst_index:
            sst_index[s] = len(strings)
            strings.append(s)
        return sst_index[s]

    sheet_streams: list[bytes] = []
    for name, grid in sheets.items():
        body = _rec(0x0809, struct.pack("<HHHHII", bof_ver, 0x0010, 0, 0, 0, 0))
        dcols = set(date_cols.get(name, ()))
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, str):
                    if biff5:  # inline LABEL, codepage bytes
                        vb = v.encode(enc)
                        body += _rec(
                            0x0204, struct.pack("<HHHH", r, c, 0, len(vb)) + vb
                        )
                    else:
                        body += _rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst(v)))
                elif isinstance(v, bool):
                    body += _rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                else:
                    ixfe = 1 if (r > 0 and c in dcols) else 0
                    body += _rec(0x0203, struct.pack("<HHH", r, c, ixfe) + struct.pack("<d", float(v)))
        body += _rec(0x000A, b"")
        sheet_streams.append(body)

    # SST honoring the BIFF8 8224-byte record cap: overflow spills into
    # CONTINUE records; a string split mid-characters re-emits its
    # option-flags byte at the continuation start (the spec's rule the
    # reader's _SegCursor implements)
    MAXP = 8224
    segments: list[bytearray] = [bytearray(struct.pack("<II", len(strings), len(strings)))]

    def _room() -> int:
        return MAXP - len(segments[-1])

    for s in strings:
        b = s.encode("utf-16-le")
        header = struct.pack("<HB", len(s), 1)
        if _room() < len(header) + 2:  # keep cch+flags together
            segments.append(bytearray())
        segments[-1] += header
        data = b
        while data:
            take = min(len(data), _room() - (_room() % 2))
            if take <= 0:
                segments.append(bytearray(b"\x01"))  # fresh grbit: utf-16
                continue
            segments[-1] += data[:take]
            data = data[take:]

    globals_body = _rec(0x0809, struct.pack("<HHHHII", bof_ver, 0x0005, 0, 0, 0, 0))
    globals_body += _rec(0x0022, struct.pack("<H", 0))
    fmt_code = "yyyy\\-mm\\-dd"
    if biff5:
        globals_body += _rec(0x0042, struct.pack("<H", codepage))
        fb = fmt_code.encode(enc)
        globals_body += _rec(0x041E, struct.pack("<HB", 164, len(fb)) + fb)
    else:
        globals_body += _rec(0x041E, struct.pack("<H", 164) + _ustr(fmt_code))
    globals_body += _rec(0x00E0, struct.pack("<HH", 0, 0) + b"\x00" * 16)  # XF 0: general
    globals_body += _rec(0x00E0, struct.pack("<HH", 0, 164) + b"\x00" * 16)  # XF 1: date
    if not biff5:
        globals_body += _rec(0x00FC, bytes(segments[0]))
        for seg in segments[1:]:
            globals_body += _rec(0x003C, bytes(seg))

    # BOUNDSHEET offsets need the final globals length — two passes
    if biff5:
        bs_len = sum(4 + 7 + len(n.encode(enc)) for n in sheets)
    else:
        bs_len = sum(4 + 8 + len(n.encode("utf-16-le")) for n in sheets)
    globals_len = len(globals_body) + bs_len + 4  # + EOF
    offsets, acc = [], globals_len
    for body in sheet_streams:
        offsets.append(acc)
        acc += len(body)
    for (name, _), off in zip(sheets.items(), offsets):
        if biff5:
            nb = name.encode(enc)
            globals_body += _rec(0x0085, struct.pack("<IHB", off, 0, len(nb)) + nb)
        else:
            nb = name.encode("utf-16-le")
            globals_body += _rec(0x0085, struct.pack("<IHBB", off, 0, len(name), 1) + nb)
    globals_body += _rec(0x000A, b"")
    assert len(globals_body) == globals_len

    stream = globals_body + b"".join(sheet_streams)
    if len(stream) < 4096:
        stream += b"\x00" * (4096 - len(stream))  # stay out of the mini-stream
    _write_cfb(path, "Book" if biff5 else "Workbook", stream)


def _write_cfb(path: str, stream_name: str, stream: bytes) -> None:
    """Minimal CFB v3 container: 1 FAT sector, 1 directory sector, then
    the stream (≥4096 bytes → regular sectors, no mini-stream)."""
    ssz = 512
    n_stream_sectors = -(-len(stream) // ssz)
    # sector map: 0 = FAT, 1 = directory, 2.. = stream
    fat = [_FATSECT, _ENDOFCHAIN]
    fat += [2 + i + 1 for i in range(n_stream_sectors - 1)] + [_ENDOFCHAIN]
    if len(fat) > ssz // 4:
        raise ValueError("stream too large for the single-FAT test writer")
    fat += [_FREESECT] * (ssz // 4 - len(fat))

    def dirent(name: str, etype: int, start: int, size: int, child: int = _FREESECT) -> bytes:
        nb = name.encode("utf-16-le") + b"\x00\x00"
        e = nb + b"\x00" * (64 - len(nb))
        e += struct.pack("<HBB", len(nb), etype, 1)
        e += struct.pack("<III", _FREESECT, _FREESECT, child)
        e += b"\x00" * 16 + struct.pack("<I", 0)  # clsid + state bits
        e += struct.pack("<QQ", 0, 0)  # timestamps
        e += struct.pack("<IQ", start, size)
        return e

    directory = dirent("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
    directory += dirent(stream_name, 2, 2, len(stream))
    directory += b"\x00" * (ssz - len(directory) % ssz if len(directory) % ssz else 0)

    header = _CFB_MAGIC + b"\x00" * 16
    header += struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
    header += b"\x00" * 6
    header += struct.pack("<IIII", 0, 1, 1, 0)  # ndir, nfat, first dir, trans
    header += struct.pack("<IIIII", 4096, _ENDOFCHAIN, 0, _ENDOFCHAIN, 0)
    difat = [0] + [_FREESECT] * 108
    header += struct.pack("<109I", *difat)
    assert len(header) == 512

    body = stream + b"\x00" * ((-len(stream)) % ssz)
    with open(path, "wb") as f:
        f.write(header + struct.pack(f"<{ssz // 4}I", *fat) + directory + body)
