"""WebDataset tar-shard sink/source — the de-facto wire format for
multimodal training corpora (one POSIX tar per shard; each sample is a
group of files sharing a basename: ``000123.jpg`` + ``000123.txt`` +
``000123.json``; loaders stream shards sequentially).

Public format: WebDataset convention (github.com/webdataset/webdataset)
over plain POSIX ustar — both fully implementable with the stdlib
``tarfile`` module, no dependencies, same clean-room discipline as the
other binary sources here.

Scale shape, both directions:

- **write**: rows are assigned to shards DETERMINISTICALLY (hash of the
  key — stable across reruns/layouts, the same contract as every
  sampler here), one ``repartition`` co-locates each shard's rows on
  one task, and each task streams ONE tar to its own
  ``shard-NNNNN.tar`` — bytes never visit the driver, shard count is
  explicit (loader parallelism), and a rerun produces byte-identical
  shards (tar mtimes are pinned to epoch 0).
- **read**: ``binaryFile`` lists the shard directory, each task parses
  ONE tar in memory via ``tarfile`` and yields (sample key, extension,
  payload bytes) rows through Arrow batches — the exact
  ``binaryFile + mapInPandas`` shape of the WARC/Avro/NetCDF readers.

The payload column stays opaque ``binary`` (the multimodal contract of
:mod:`mini_project_204721_data_engineering_spark.llm.multimodal` — decode is a separate, injectable
stage); text/json members are bytes too, decoded by the caller, so one
reader serves every modality.
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_webdataset", "read_webdataset"]


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "sample_key",
    n_shards: int = 8,
) -> None:
    """Write a multimodal frame to ``path/shard-NNNNN.tar``.

    Input contract: one row per sample FILE — ``(key_col string,
    ext string, payload binary)``; rows sharing a key form one sample
    and land in the same shard ADJACENTLY (sorted by key, then ext —
    the WebDataset grouping rule).  Shard = ``xxhash64(key) mod
    n_shards``, so adding samples never moves existing ones between
    shards.  Tar members are emitted with zeroed mtime/uid/gid so
    reruns are byte-identical (testable, cacheable)."""
    import pandas as pd

    cols = {key_col, "ext", "payload"}
    missing = cols - set(df.columns)
    if missing:
        raise ValueError(
            f"write_webdataset needs columns {sorted(cols)}; missing {sorted(missing)}"
        )

    prepped = (
        df.select(F.col(key_col).alias("__k"), "ext", "payload")
        .withColumn(
            "__shard",
            F.pmod(F.xxhash64(F.col("__k")), F.lit(n_shards)).cast("int"),
        )
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", "__k", "ext")
    )

    def worker(batches):
        bufs: dict[int, tarfile.TarFile] = {}
        raws: dict[int, io.BytesIO] = {}
        for pdf in batches:
            for k, ext, payload, sh in zip(
                pdf["__k"], pdf["ext"], pdf["payload"], pdf["__shard"]
            ):
                sh = int(sh)
                if sh not in bufs:
                    raws[sh] = io.BytesIO()
                    bufs[sh] = tarfile.open(
                        fileobj=raws[sh], mode="w", format=tarfile.USTAR_FORMAT
                    )
                data = bytes(payload)
                info = tarfile.TarInfo(name=f"{k}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                bufs[sh].addfile(info, io.BytesIO(data))
        out = []
        for sh, tf in bufs.items():
            tf.close()
            out.append((sh, raws[sh].getvalue()))
        yield pd.DataFrame(
            {"shard": [s for s, _ in out], "tar": [t for _, t in out]}
        )

    # hash-partitioned on __shard: each task sees exactly one shard's
    # rows (n_shards tasks), builds its tar in memory and returns it as
    # ONE row; the final foreach writes each tar to its own file.
    # In-memory per task = one shard — size shards accordingly
    # (the WebDataset norm is ~100 MB-1 GB per shard).
    tars = prepped.mapInPandas(worker, schema="shard int, tar binary")

    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(path)
    fs = base.getFileSystem(hconf)
    fs.mkdirs(base)

    # each task writes its own shard file directly (local/NFS paths —
    # the loader-facing target; collecting n_shards tar blobs through
    # the driver would defeat the distributed write), publishing
    # atomically via rename so readers never see a half-written shard
    import os

    def writer(batches):
        import pandas as pd

        wrote = []
        for pdf in batches:
            for sh, tar in zip(pdf["shard"], pdf["tar"]):
                p = os.path.join(path, f"shard-{int(sh):05d}.tar")
                tmp = p + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(bytes(tar))
                os.replace(tmp, p)  # atomic publish per shard
                wrote.append(int(sh))
        yield pd.DataFrame({"shard": wrote})

    tars.mapInPandas(writer, schema="shard int").count()


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WebDataset scan → ``(shard string, sample_key
    string, ext string, payload binary)``: one row per member file,
    grouped back into samples by ``sample_key`` downstream
    (``groupBy(sample_key).pivot("ext")`` or a map aggregate).  One
    tar per task; tar bytes never visit the driver."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(f"{path}/*.tar")

    def worker(batches):
        for pdf in batches:
            shards, keys, exts, payloads = [], [], [], []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                shard = fpath.rsplit("/", 1)[-1]
                # the contract covers the WHOLE decode: open() only reads
                # the first header, so a truncated archive surfaces from
                # getmembers()/read() — those must name the shard too
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                        for member in tf.getmembers():
                            if not member.isfile():
                                continue
                            name = member.name
                            key, _, ext = name.rpartition(".")
                            if not key:  # extension-less member: key only
                                key, ext = name, ""
                            fh = tf.extractfile(member)
                            shards.append(shard)
                            keys.append(key)
                            exts.append(ext)
                            payloads.append(fh.read() if fh else b"")
                except tarfile.TarError as e:
                    raise ValueError(
                        f"corrupt WebDataset shard {shard}: {e}"
                    ) from e
            yield pd.DataFrame(
                {
                    "shard": shards,
                    "sample_key": keys,
                    "ext": exts,
                    "payload": payloads,
                }
            )

    return files.select("path", "content").mapInPandas(
        worker, schema="shard string, sample_key string, ext string, payload binary"
    )
