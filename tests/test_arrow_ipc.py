"""Arrow IPC / Feather source-sink round-trips (sources/arrow_ipc.py):
both container flavors, compression, column pruning, batch streaming."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mini_project_204721_data_engineering_spark.sources.arrow_ipc import (
    arrow_ipc_schema,
    read_arrow_ipc,
    write_arrow_ipc,
)


def _pdf(n=50, offset=0):
    return pd.DataFrame(
        {
            "doc_id": range(offset, offset + n),
            "text": [f"doc number {i}" for i in range(offset, offset + n)],
            "score": [i / 7.0 for i in range(offset, offset + n)],
        }
    )


def test_arrow_ipc_roundtrip_multifile_and_compression(spark, tmp_path):
    d = str(tmp_path)
    write_arrow_ipc(_pdf(50), os.path.join(d, "a.arrow"), batch_rows=16)
    write_arrow_ipc(
        _pdf(30, offset=100), os.path.join(d, "b.arrow"), batch_rows=16,
        compression="lz4",
    )
    out = read_arrow_ipc(spark, d)
    rows = out.collect()
    assert len(rows) == 80
    got = {r["doc_id"]: (r["text"], r["score"]) for r in rows}
    assert got[3] == ("doc number 3", 3 / 7.0)
    assert got[129] == ("doc number 129", 129 / 7.0)
    assert dict(out.dtypes)["doc_id"] == "bigint"


def test_arrow_ipc_stream_format_and_pruning(spark, tmp_path):
    d = str(tmp_path)
    write_arrow_ipc(_pdf(40), os.path.join(d, "s.arrow"), stream=True, batch_rows=8)
    out = read_arrow_ipc(spark, d, columns=["doc_id"])
    assert out.columns == ["doc_id"]
    assert out.count() == 40
    # schema helper reads the stream header without decoding batches
    sch = arrow_ipc_schema(os.path.join(d, "s.arrow"))
    assert sch.names == ["doc_id", "text", "score"]


def test_arrow_ipc_empty_dir_and_corrupt_file(spark, tmp_path):
    with pytest.raises(ValueError, match="no files match"):
        read_arrow_ipc(spark, str(tmp_path))
    bad = os.path.join(str(tmp_path), "bad.arrow")
    with open(bad, "wb") as fh:
        fh.write(b"ARROW1 this is not a real footer")
    with pytest.raises(Exception):  # pyarrow's own clean invalid-file error
        arrow_ipc_schema(bad)


def test_arrow_ipc_timestamp_and_list_columns(spark, tmp_path):
    """Type-mapping coverage: naive timestamps → timestamp_ntz, float
    lists → array<double> — the columns ML shards actually carry."""
    import pandas as pd

    d = str(tmp_path)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "ts": pd.to_datetime(["2024-03-01 12:00:00", "2024-03-02 00:30:00"]),
            "embedding": [[0.1, 0.2], [0.3, 0.4]],
        }
    )
    write_arrow_ipc(pdf, os.path.join(d, "t.arrow"))
    out = read_arrow_ipc(spark, d)
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    assert dict(out.dtypes)["embedding"] == "array<double>"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["ts"].hour == 12
    assert rows[2]["embedding"] == [0.3, 0.4]
