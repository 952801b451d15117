"""Cross-PROCESS commit race: the in-process 8-thread race test pins
exactly-one-winner within one JVM; this pins the same guarantee across
TWO SEPARATE DRIVER JVMs committing to the same table directory — the
O_EXCL manifest claim is a kernel-level guarantee, not a JVM lock, so
two whole Spark drivers must interleave without a lost update."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _list_versions,
    read_snapshot,
    snapshot_append,
)


@pytest.mark.parametrize("scheme", ["", "mock:"])
def test_cross_process_commit_race_no_lost_update(spark, tmp_path, scheme):
    """Parametrized over the manifest-IO seam: '' exercises the Hadoop/
    O_EXCL local path, 'mock:' the object-store emulation's conditional
    put — the exactly-one-winner guarantee must hold across two driver
    JVMs through EITHER implementation (the mock resolves in the child
    process because registration happens at module import)."""
    t = scheme + str(tmp_path / "t")
    ready = str(tmp_path / "ready")
    go = str(tmp_path / "go")
    child_code = textwrap.dedent(
        f"""
        import pathlib, time
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "2")
                 .getOrCreate())
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            snapshot_append,
        )
        pathlib.Path({ready!r}).touch()
        for _ in range(1200):
            if pathlib.Path({go!r}).exists():
                break
            time.sleep(0.05)
        else:
            raise SystemExit("no go signal from the parent")
        for i in range(6):
            snapshot_append(
                spark.createDataFrame([(i, "child")], "i long, w string"),
                {t!r},
            )
        spark.stop()
        """
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", child_code],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        deadline = time.time() + 180
        while not os.path.exists(ready):
            if proc.poll() is not None or time.time() > deadline:
                out, err = proc.communicate(timeout=10)
                pytest.skip(
                    f"second driver JVM unavailable: {err[-500:]!r}"
                )
            time.sleep(0.1)
        open(go, "w").close()  # both drivers append from here on
        for i in range(6):
            snapshot_append(
                spark.createDataFrame([(i, "parent")], "i long, w string"), t
            )
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, err[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()
    # versions are LINEAR — every claimed version exactly once, no gaps,
    # no clobbered manifest (a lost O_EXCL race would drop a commit)
    versions = _list_versions(spark, t)
    assert versions == list(range(1, 13)), versions
    counts = {
        r["w"]: r["n"]
        for r in read_snapshot(spark, t)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {"child": 6, "parent": 6}  # no lost update
