"""Legacy ``.xls`` (BIFF8/OLE2) reader tests (S5 parity edge): CFB
container + BIFF8 record round-trips through write_xls, SST CONTINUE
splitting, RK/MULRK decoding, date-formatted serials, and the twin of
the xlsx two-layout cases — both reference layouts from ``.xls`` bytes
produce output identical to the ``.xlsx`` path through
``read_incident_workbook`` (reference ``pd.ExcelFile`` accepts both,
``backend/app/utils.py:475-485``)."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from mini_project_204721_data_engineering_spark.sources.excel import read_incident_workbook
from mini_project_204721_data_engineering_spark.sources.xls import (
    _rk_value,
    read_xls,
    write_xls,
)
from mini_project_204721_data_engineering_spark.sources.xlsx import write_xlsx


def test_roundtrip_types_sheets_and_thai(tmp_path):
    p = str(tmp_path / "wb.xls")
    write_xls(
        p,
        {
            "Data": [
                ["name", "qty", "score"],
                ["กรุงเทพ", 3, 1.25],
                ["x&<y>", 0, -2.5],
            ],
            "Other": [["a"], [42]],
        },
    )
    sheets = read_xls(p)
    assert list(sheets) == ["Data", "Other"]
    df = sheets["Data"]
    assert df["name"].tolist() == ["กรุงเทพ", "x&<y>"]
    assert df["qty"].tolist() == [3, 0]
    assert df["score"].tolist() == [1.25, -2.5]
    assert sheets["Other"]["a"].tolist() == [42]


def test_date_styled_serials_decode_to_iso(tmp_path):
    p = str(tmp_path / "d.xls")
    write_xls(
        p,
        {"S": [["Disaster Date", "n"], [45108.0, 45108.0], [45109.5, 2.0]]},
        date_cols={"S": [0]},
    )
    df = read_xls(p)["S"]
    # col 0 is date-styled → ISO strings; col 1 plain numbers untouched
    assert df["Disaster Date"].tolist() == ["2023-07-01", "2023-07-02 12:00:00"]
    assert df["n"].tolist() == [45108.0, 2.0]


def test_rk_encodings():
    # int, int/100, truncated double, double/100
    assert _rk_value((7 << 2) | 2) == 7.0
    assert _rk_value((725 << 2) | 3) == 7.25
    packed = struct.unpack("<Q", struct.pack("<d", 1.5))[0]
    rk = (packed >> 32) & 0xFFFFFFFC
    assert _rk_value(rk) == 1.5
    assert _rk_value(rk | 1) == 0.015
    # negative int RK: sign bit must survive the shift
    neg = struct.unpack("<I", struct.pack("<i", (-5 << 2) | 2))[0]
    assert _rk_value(neg) == -5.0


def test_incident_workbook_format1_xls_matches_xlsx(tmp_path):
    """Twin of test_xlsx.test_incident_workbook_format1: identical
    normalized output from the legacy container."""
    df = pd.DataFrame(
        {
            "Disaster Date": ["2023-06-01", "2023-06-02"],
            "Province": [" เชียงใหม่ ", "น่าน"],
            "District": ["เมือง", "ปัว"],
            "Extra": [1, 2],
        }
    )
    xls_p = str(tmp_path / "f1.xls")
    xlsx_p = str(tmp_path / "f1.xlsx")
    grid = [list(df.columns)] + df.values.tolist()
    write_xls(xls_p, {"summary": [["junk"], [1]], "Incidents": grid})
    write_xlsx({"summary": pd.DataFrame({"junk": [1]}), "Incidents": df}, xlsx_p)
    a = read_incident_workbook(xls_p)
    b = read_incident_workbook(xlsx_p)
    assert list(a.columns) == list(b.columns) == ["Disaster Date", "Province", "District"]
    assert a.values.tolist() == b.values.tolist()
    assert a["Province"].tolist() == ["เชียงใหม่", "น่าน"]  # trimmed


def test_incident_workbook_format2_thai_headers_xls(tmp_path):
    """Twin of the xlsx format-2 case: junk rows + Thai header row."""
    rows = [
        ["junk0", "junk1", "junkX"],
        ["junk2", None, None],
        ["วันที่เกิดภัย", "จังหวัด", "อำเภอ"],
        ["2023-06-03", "แพร่", "สอง"],
    ]
    p = str(tmp_path / "f2.xls")
    write_xls(p, {"รายงาน!": rows})
    out = read_incident_workbook(p)
    assert out.iloc[0].tolist() == ["2023-06-03", "แพร่", "สอง"]


def test_missing_columns_raise_from_xls(tmp_path):
    p = str(tmp_path / "bad.xls")
    write_xls(p, {"Data": [["a", "b"], [1, 2]]})
    with pytest.raises(ValueError, match="missing required columns"):
        read_incident_workbook(p)


def test_sst_continue_split(tmp_path):
    """Force the SST across a CONTINUE boundary: BIFF8 limits records to
    8224 payload bytes, so ~600 distinct 20-char strings must split; the
    continuation re-reads the option-flags byte."""
    n = 600
    grid = [["col"]] + [[f"string-{i:04d}-" + "x" * 8] for i in range(n)]
    p = str(tmp_path / "big.xls")
    # writer caps single records at 8224 bytes? emulate by many strings
    write_xls(p, {"S": grid})
    df = read_xls(p)["S"]
    assert df["col"].tolist() == [f"string-{i:04d}-" + "x" * 8 for i in range(n)]


def test_incidents_pipeline_from_real_xls(spark, tmp_path):
    """The reference's Excel ingest end-to-end from LEGACY workbook
    bytes: .xls → fuzzy sheet choice → layout normalization → dim joins
    → per-day counts — the twin of the .xlsx pipeline test, proving
    container parity all the way into Spark."""
    from pyspark.sql import Row

    from mini_project_204721_data_engineering_spark.pipelines.dims import build_dims
    from mini_project_204721_data_engineering_spark.pipelines.incidents import ingest_incidents

    p = str(tmp_path / "incidents.xls")
    write_xls(
        p,
        {
            "Incidents": [
                ["Disaster Date", "Province", "District"],
                ["2023-06-01", "เชียงใหม่", "เมือง"],
                ["2023-06-01", "เชียงใหม่", "เมือง"],
                ["not-a-date", "เชียงใหม่", "เมือง"],
                ["2023-06-02", "นอกเขต", "ไม่มี"],
            ]
        },
    )
    rows = read_incident_workbook(p)

    adm2 = spark.createDataFrame(
        [Row(ADM1_EN="Chiang Mai", ADM1_TH="จังหวัดเชียงใหม่", ADM2_EN="Muang", ADM2_TH="อำเภอเมือง")]
    )
    province, district = build_dims(adm2, north_only=True)
    out = ingest_incidents(spark.createDataFrame(rows), province, district).collect()
    # bad date dropped (C6 coerce), unmapped province dropped (F8),
    # two same-day incidents counted together (A5)
    assert len(out) == 1
    assert str(out[0]["disaster_date"]) == "2023-06-01"
    assert out[0]["count_of_disasters"] == 2


def test_not_cfb_rejected(tmp_path):
    p = str(tmp_path / "x.xls")
    open(p, "wb").write(b"PK\x03\x04" + b"\x00" * 100)
    with pytest.raises(ValueError, match="OLE2/CFB"):
        read_xls(p)


# ---- BIFF5 (Excel 5.0/95) -------------------------------------------------


def test_biff5_roundtrip_thai_codepage(tmp_path):
    """BIFF5 workbook ('Book' stream, inline cp874 LABELs, 8-bit sheet
    names): Thai strings, numbers, and dates round-trip through the same
    reader that handles BIFF8 — the BOF version routes the dialect."""
    p = str(tmp_path / "old.xls")
    write_xls(
        p,
        {
            "ข้อมูล": [
                ["name", "qty", "Disaster Date"],
                ["กรุงเทพ", 3, 45108.0],
                ["เชียงใหม่", 0, 45109.5],
            ],
        },
        date_cols={"ข้อมูล": [2]},
        biff=5,
        codepage=874,
    )
    sheets = read_xls(p)
    assert list(sheets) == ["ข้อมูล"]
    df = sheets["ข้อมูล"]
    assert df["name"].tolist() == ["กรุงเทพ", "เชียงใหม่"]
    assert df["qty"].tolist() == [3, 0]
    assert df["Disaster Date"].tolist() == ["2023-07-01", "2023-07-02 12:00:00"]


def test_biff5_equals_biff8_through_normalization(tmp_path):
    """The same incident grid written as BIFF5 and BIFF8 yields
    identical DataFrames — dialect is invisible downstream."""
    grid = {
        "Sheet1": [
            ["Province", "Qty"],
            ["Chiang Mai", 5],
            ["Lamphun", 2.5],
        ]
    }
    p5, p8 = str(tmp_path / "b5.xls"), str(tmp_path / "b8.xls")
    write_xls(p5, grid, biff=5, codepage=1252)
    write_xls(p8, grid, biff=8)
    import pandas as pd

    pd.testing.assert_frame_equal(read_xls(p5)["Sheet1"], read_xls(p8)["Sheet1"])


def test_pre_biff5_raises_clearly(tmp_path):
    """A BIFF4-era BOF version fails with the honest unsupported error,
    not a garbage parse."""
    import struct

    from mini_project_204721_data_engineering_spark.sources.xls import _read_xls_stream

    stream = struct.pack("<HH", 0x0809, 8) + struct.pack("<HHHH", 0x0400, 0x0005, 0, 0)
    with pytest.raises(NotImplementedError, match="BIFF version"):
        _read_xls_stream(stream)
