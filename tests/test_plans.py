"""Scale-health plan assertions (SURVEY §4.2): pushdown, pruning,
broadcast joins, top-k pagination.  These are the properties that make
the same code survive a 100 TB scale-up; a regression here is a
performance bug even if results stay correct."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mini_project_204721_data_engineering_spark.plans.checks import (
    broadcast_join_count,
    has_pushed_filters,
    has_take_ordered,
    scan_columns,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    from mini_project_204721_data_engineering_spark import queries as _q

    # plan assertions cover variant demos outside the driver budget too
    return {**entrymod.queries(), **_q.all_extra_queries()}


def test_list_orders_pushdown_and_topk(spark, qs):
    df = qs["list_orders_page"](spark, SF)
    # status + date range reach the orders scan (Catalyst rewrites the
    # DATE cast into raw timestamp bounds — pushable)
    assert has_pushed_filters(df, "o_orderstatus")
    assert has_pushed_filters(df, "o_orderdate")
    # pagination is top-k, never a global sort
    assert has_take_ordered(df)
    # both dims broadcast
    assert broadcast_join_count(df) == 2


def test_list_orders_column_pruning(spark, qs):
    df = qs["list_orders_page"](spark, SF)
    cols = scan_columns(df, "orders.parquet")
    # only the referenced columns are read, not the full table
    assert set(cols) == {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"}


def test_pricing_summary_partial_agg_single_shuffle(spark, qs):
    df = qs["pricing_summary"](spark, SF)
    # one shuffle for the groupBy, one for the output orderBy — and the
    # shipdate filter is pushed
    assert has_pushed_filters(df, "l_shipdate")
    assert shuffle_count(df) <= 2
    assert "partial" in df._jdf.queryExecution().executedPlan().toString().lower()


def test_dashboard_broadcasts_dims(spark, qs):
    df = qs["dashboard_probability"](spark, SF)
    # nation broadcast + AQE will broadcast the per-key aggregates at
    # this size; at minimum the explicit one must be there
    assert broadcast_join_count(df) >= 1


def test_volume_join_broadcasts_small_dims(spark, qs):
    df = qs["volume_by_nation"](spark, SF)
    assert broadcast_join_count(df) >= 1
    assert has_take_ordered(df) or shuffle_count(df) <= 3


def test_similarity_broadcasts_queries(spark, qs):
    df = qs["similarity_topk"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the query side must broadcast: corpus × queries as BroadcastNestedLoop
    assert "Broadcast" in plan


def test_asof_join_is_union_window_not_range_join(spark, qs):
    df = qs["events_asof_spend"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the as-of must compile to union + one keyed window pass — never a
    # nested-loop/cartesian range probe (which explodes at scale)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    # shuffles: right-side pre-aggregate + the window's key partition
    # (+ AQE reads); no per-row join exchange on top
    assert shuffle_count(df) <= 3
    # r3 perf lock: the payload travels as FLAT per-column last() fills
    # (payload_nonnull fast path), not one nested struct through the
    # window sort — the struct form cost the r2 bench +27%
    assert "__pay" not in plan
    assert "__p_day_spend" in plan


def test_dashboard_sum_is_integer_cents_not_decimal(spark, qs):
    """r3 perf lock: the dashboard's money sum aggregates exact integer
    CENTS (codegen-cheap, order-independent), never decimal(18,2) — the
    r2 decimal aggregation buffer cost the bench +28%."""
    df = qs["dashboard_probability"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg = [ln for ln in plan.splitlines() if "sum(" in ln.lower()]
    assert agg, "expected an aggregate over o_totalprice in the plan"
    assert not any("decimal(18,2)" in ln for ln in agg), agg


def test_keyset_pagination_pushes_cursor_and_topk(spark, qs):
    df = qs["list_events_keyset"](spark, SF)
    assert has_pushed_filters(df, "ts")
    assert has_take_ordered(df)


def test_daily_activity_single_partition_window_per_type(spark, qs):
    df = qs["daily_activity"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # agg shuffle + window repartition on event_type; no global sort
    assert shuffle_count(df) <= 2


def test_top_return_customers_scale_shape(spark, qs):
    df = qs["top_return_customers"](spark, SF)
    # returnflag filter reaches the lineitem scan; final top-20 is top-k
    assert has_pushed_filters(df, "l_returnflag")
    assert has_take_ordered(df)
    assert broadcast_join_count(df) >= 1


def test_string_contains_pushdown(spark, qs):
    df = qs["red_parts_by_brand"](spark, SF)
    # the contains() predicate must reach the parquet scan as a
    # StringContains pushed filter, not a post-scan Filter only
    assert has_pushed_filters(df, "p_name")


def test_embedding_neardup_has_no_corpus_self_crossjoin(spark, qs):
    df = qs["embedding_neardup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the LSH path must candidate via the band-key equi-join; an exact
    # all-pairs corpus×corpus cross product cannot run at 100 TB
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_ivf_routes_via_broadcast_centroids(spark, qs):
    df = qs["similarity_ivf"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scoring joins the (tiny) routed-query side via broadcast
    assert "Broadcast" in plan


def test_ivf_cell_assignment_is_shuffle_free(spark):
    """The IVF coarse assignment must be a pure projection — centroids
    are inlined literals, so at 100 TB the corpus is only SCANNED, never
    exchanged, to get its cell labels."""
    from mini_project_204721_data_engineering_spark.catalog import load_table
    from mini_project_204721_data_engineering_spark.llm.similarity import assign_cells, seeded_centroids

    emb = load_table(spark, SF, "embeddings")
    cells = assign_cells(emb, seeded_centroids(emb, 4))
    assert shuffle_count(cells) == 0


def test_cheapest_supplier_is_one_aggregate_no_window(spark, qs):
    """Q2-shape argmin must decorrelate to a partial-aggregated
    min(struct) — one shuffle on the group key, no per-row window sort,
    and only the three needed lineitem columns read."""
    df = qs["cheapest_supplier_per_part"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial" in plan.lower()
    assert shuffle_count(df) <= 1
    assert set(scan_columns(df, "lineitem.parquet")) == {
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        "l_quantity",
    }


def test_orders_above_cust_avg_single_keyed_window(spark, qs):
    """The decorrelated scalar subquery is ONE keyed window pass: a
    single shuffle on o_custkey, no join, no subquery re-scan."""
    df = qs["orders_above_cust_avg"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert shuffle_count(df) <= 1


def test_sequence_packing_keyed_window_and_pruned_scan(spark, qs):
    """Packing's prefix-sum must stay a KEYED window (partitioned by the
    stratum — parallel across languages, one shuffle), never a global
    single-partition sort; only (lang, doc_id, text) are read."""
    df = qs["sequence_packing"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert shuffle_count(df) <= 1
    # a global (unpartitioned) window would shuffle to a single partition
    assert "SinglePartition" not in plan
    assert set(scan_columns(df, "documents.parquet")) == {"lang", "doc_id", "text"}


def test_decontaminate_broadcast_shape(spark, qs):
    """Driver-visible twin of the operator-level assert: the benchmark
    gram set broadcasts; the corpus side never sort-merge-joins."""
    df = qs["decontaminate"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q18_aggregates_before_joining(spark, qs):
    """Q18 shape: the joins must consume the HAVING-grain aggregate,
    never lineitem rows — pinned structurally: the lineitem scan reads
    ONLY (l_orderkey, l_quantity) (column pruning proves no lineitem
    detail reaches a join), the aggregate map-side combines, and the
    having filter exists over the aggregated total."""
    df = qs["q18_large_volume_orders"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan  # map-side combine on the fact scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
    assert "(total_qty" in plan  # the HAVING filter on the aggregate


def test_bloom_semi_prune_probe_not_shuffled_before_filter(spark, qs):
    """The lineitem probe reaches the SBBF bit test via a broadcast
    word-table join — the fact side must not exchange before the bloom
    filter prunes it."""
    df = qs["bloom_semi_prune"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the SBBF bit-test join is present and broadcast
    assert "__mask" in plan and "BroadcastHashJoin" in plan
    # the fact side is NEVER hash-partitioned on its join key and no
    # sort-merge join exists anywhere — the only exchange in the plan
    # is the final group-by's
    assert "Exchange hashpartitioning(l_partkey" not in plan
    assert "SortMergeJoin" not in plan


def test_supplier_pagerank_constant_plan_depth(spark, qs):
    """Checkpointed iteration: the FINAL plan must not nest 5 rounds of
    joins — ranks re-root at a checkpoint every round, so the executed
    plan contains the last round's single contribution join, not a
    5-deep join tower."""
    df = qs["supplier_pagerank"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
    assert n_joins <= 4, f"plan carries {n_joins} joins — lineage not truncated"


def test_q21_two_fact_scans_no_cartesian(spark):
    """The Q21 decorrelation contract: EXISTS + NOT EXISTS collapse to
    ONE per-order aggregate image — lineitem is scanned exactly twice,
    no cartesian product anywhere, and the top-20 is a
    TakeOrderedAndProject (never a global sort)."""
    from mini_project_204721_data_engineering_spark.queries.analytics import (
        q21_blamed_suppliers,
    )

    df = q21_blamed_suppliers(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 2
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_top_return_customers_aqe_flips_to_smj_past_threshold(spark, qs):
    """r15: BASELINE.md attributes this query's second-decade sf10
    exponent (0.71) to broadcast-BUILD growth of a dim that scales WITH
    the fact in the synthetic data; the scale story requires that once
    the customer dim crosses spark.sql.autoBroadcastJoinThreshold the
    planner flips that join to sort-merge instead of OOMing the
    broadcast.  Demonstrated here by lowering the threshold below the
    dim size: the customer join plans as SortMergeJoin, the explicitly
    HINTED nation broadcast survives (hints outrank the threshold), and
    results are identical either way."""
    from mini_project_204721_data_engineering_spark.plans.checks import (
        physical_plan,
    )

    fn = qs["top_return_customers"]
    base = fn(spark, SF)
    rows = base.collect()
    assert "SortMergeJoin" not in physical_plan(base)
    default = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        flipped = fn(spark, SF)
        plan = physical_plan(flipped)
        assert "SortMergeJoin" in plan  # customer (and orders) joins flip
        assert "BroadcastHashJoin" in plan  # hinted nation broadcast stays
        assert flipped.collect() == rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", default)
