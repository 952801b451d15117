"""Incremental aggregate-view maintenance (operators/incremental.py).

The load-bearing property: maintain_aggregate(base_aggregate(S), feed)
≡ base_aggregate(S') for the post-feed snapshot S' — for any feed,
including key-moving updates and many ops per key in one batch.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.operators.incremental import (
    base_aggregate,
    maintain_aggregate,
)

SCHEMA = "id int, grp string, val double"
FEED_SCHEMA = (
    "op string, before struct<id:int,grp:string,val:double>, "
    "after struct<id:int,grp:string,val:double>"
)
MEAS = {"cents": lambda r: F.round(r["val"] * 100).cast("long")}


def _agg_dict(df):
    return {r["grp"]: (r["cents"], r["n"]) for r in df.collect()}


def test_randomized_feed_matches_full_recompute(spark):
    """200 random ops (inserts / deletes / key-moving updates) over a
    100-row snapshot: incremental state ≡ recompute from the post-feed
    snapshot, replayed entirely in Python as the independent model."""
    rng = random.Random(20240815)
    snap = {i: (rng.choice("abcd"), round(rng.uniform(0, 100), 2)) for i in range(100)}
    rows = [(i, g, v) for i, (g, v) in snap.items()]
    base = base_aggregate(spark.createDataFrame(rows, SCHEMA), ["grp"], MEAS)

    feed, next_id = [], 100
    model = dict(snap)
    for _ in range(200):
        op = rng.choice(["insert", "delete", "update"])
        if op == "insert" or not model:
            g, v = rng.choice("abcde"), round(rng.uniform(0, 100), 2)
            feed.append(("insert", None, (next_id, g, v)))
            model[next_id] = (g, v)
            next_id += 1
        elif op == "delete":
            k = rng.choice(list(model))
            g, v = model.pop(k)
            feed.append(("delete", (k, g, v), None))
        else:
            k = rng.choice(list(model))
            g, v = model[k]
            g2, v2 = rng.choice("abcde"), round(rng.uniform(0, 100), 2)
            feed.append(("update", (k, g, v), (k, g2, v2)))
            model[k] = (g2, v2)

    out = maintain_aggregate(
        base, spark.createDataFrame(feed, FEED_SCHEMA), ["grp"], MEAS
    )
    expect_rows = [(i, g, v) for i, (g, v) in model.items()]
    expect = base_aggregate(spark.createDataFrame(expect_rows, SCHEMA), ["grp"], MEAS)
    assert _agg_dict(out) == _agg_dict(expect)


def test_emptied_group_dropped_and_key_moving_update(spark):
    df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    base = base_aggregate(df, ["grp"], MEAS)
    feed = spark.createDataFrame(
        [("update", (1, "a", 1.0), (1, "b", 3.0))], FEED_SCHEMA
    )
    got = _agg_dict(maintain_aggregate(base, feed, ["grp"], MEAS))
    assert got == {"b": (500, 2)}  # 'a' emptied and dropped; 1.0 moved as 3.0


def test_multiple_ops_per_key_are_additive(spark):
    """Unlike apply_changes, a feed may touch the same key many times —
    contributions sum (insert then delete of the same row nets zero)."""
    df = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    base = base_aggregate(df, ["grp"], MEAS)
    feed = spark.createDataFrame(
        [
            ("insert", None, (2, "a", 5.0)),
            ("delete", (2, "a", 5.0), None),
            ("insert", None, (3, "a", 7.0)),
        ],
        FEED_SCHEMA,
    )
    assert _agg_dict(maintain_aggregate(base, feed, ["grp"], MEAS)) == {"a": (800, 2)}


@pytest.mark.parametrize(
    "feed_row,msg",
    [
        (("delete", (99, "zz", 1.0), None), "absent from the base aggregate"),
        (("upsert", None, (9, "a", 1.0)), "unknown CDC op"),
        (("insert", None, None), "requires a non-NULL after image"),
        (("delete", None, None), "requires a non-NULL before image"),
    ],
)
def test_feed_consistency_guards_raise_in_plan(spark, feed_row, msg):
    base = base_aggregate(
        spark.createDataFrame([(1, "a", 1.0)], SCHEMA), ["grp"], MEAS
    )
    feed = spark.createDataFrame([feed_row], FEED_SCHEMA)
    with pytest.raises(Exception, match=msg):
        maintain_aggregate(base, feed, ["grp"], MEAS).collect()


def test_no_separate_guard_job(spark):
    """The guards live IN the maintenance plan: building the maintained
    DataFrame launches no Spark job at all (lazy end to end)."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    base = base_aggregate(
        spark.createDataFrame([(1, "a", 1.0)], SCHEMA), ["grp"], MEAS
    )
    feed = spark.createDataFrame([("insert", None, (2, "b", 2.0))], FEED_SCHEMA)
    maintain_aggregate(base, feed, ["grp"], MEAS)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_measure_name_colliding_with_key_refused(spark):
    base = base_aggregate(
        spark.createDataFrame([(1, "a", 1.0)], SCHEMA), ["grp"], MEAS
    )
    feed = spark.createDataFrame([("insert", None, (2, "b", 2.0))], FEED_SCHEMA)
    with pytest.raises(ValueError, match="collide with key"):
        maintain_aggregate(base, feed, ["grp"], {"grp": lambda r: r["val"]})


def test_null_grouping_key_maintains_as_one_group(spark):
    """groupBy treats NULL as a real group; the merge join must too —
    a NULL-key insert lands in the EXISTING NULL group, and a NULL-key
    delete finds it (no spurious absent-from-base error)."""
    df = spark.createDataFrame([(1, None, 10.0), (2, "a", 1.0)], SCHEMA)
    base = base_aggregate(df, ["grp"], MEAS)
    feed = spark.createDataFrame(
        [("insert", None, (3, None, 5.0)), ("delete", (1, None, 10.0), None)],
        FEED_SCHEMA,
    )
    out = maintain_aggregate(base, feed, ["grp"], MEAS).collect()
    got = {r["grp"]: (r["cents"], r["n"]) for r in out}
    assert len(out) == 2  # exactly ONE row for the NULL group
    assert got == {None: (500, 1), "a": (100, 1)}


def test_measure_name_colliding_with_count_col_refused(spark):
    base = base_aggregate(
        spark.createDataFrame([(1, "a", 1.0)], SCHEMA), ["grp"], MEAS
    )
    feed = spark.createDataFrame([("insert", None, (2, "b", 2.0))], FEED_SCHEMA)
    with pytest.raises(ValueError, match="count_col"):
        maintain_aggregate(base, feed, ["grp"], {"n": lambda r: r["val"]})
