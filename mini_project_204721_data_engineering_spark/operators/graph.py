"""Link-graph analytics: PageRank over an edge DataFrame.

Why it lives in a training-data engine: link-based authority is one of
the oldest and strongest web-document quality signals (the Common
Crawl-scale pipelines weight or filter hosts by harmonic/PageRank
centrality), so a corpus pipeline needs it next to the quality and
dedup gates.  The reference has no graph surface; this is an extension
operator in the same family as the connected-components resolver
(``llm/dedup.py::dup_clusters``).

Spark shape — the standard synchronous power iteration:

- edges are normalized ONCE to (src, dst, weight/out-degree) and
  ``localCheckpoint``-ed: every iteration reuses the materialized edge
  table and shuffles only (vertex, contribution) pairs;
- one ``groupBy(dst)`` per iteration (map-side combined), one join of
  ranks→edges on src — both hash-partitioned on vertex id, so AQE
  reuses the layout;
- ranks are ``localCheckpoint``-ed per iteration to truncate lineage
  (an N-iteration nested plan would otherwise grow exponentially in
  optimizer time — the same trap dup_clusters documents);
- dangling vertices (no out-edges) redistribute their mass uniformly
  via a 1-row aggregate broadcast into the update expression — the
  standard correction that keeps total rank mass = |V| (sum-preserving
  up to float; asserted in tests).

Convergence is geometric at rate = damping (0.85 → ~66 iterations per
1e-5 of L1 error); ``n_iter`` caps the loop, and an optional ``tol``
measures the actual L1 delta every ``check_every`` iterations (one
join + 1-row aggregate per check) and stops early once
Σ|Δrank| < tol — callers neither overpay iterations nor undershoot
silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 15,
    tol: float | None = None,
    check_every: int = 5,
    stats: dict | None = None,
) -> DataFrame:
    """Ranks for every vertex appearing in ``edges`` (either side).
    Returns ``(id, rank)`` with ranks on the |V|-mass convention
    (uniform start = 1.0 each; sum(rank) ≈ |V|).  Parallel edges are
    legitimate (they add weight); self-loops count as ordinary edges.

    ``tol``: optional convergence stop — every ``check_every``
    iterations the total L1 movement Σ|rank_i − rank_{i-1}| is measured
    (one id-join of the two checkpointed rank tables + a 1-row
    aggregate, negligible next to an iteration) and the loop exits once
    it drops below ``tol``; ``n_iter`` stays the hard cap.  Geometric
    convergence at rate ``damping`` means the L1 error after stopping
    is at most ``tol · damping / (1 − damping)``.  Pass a dict as
    ``stats`` to receive ``{"iterations": k, "last_delta": d}`` for
    observability (``last_delta`` is None when ``tol`` is unset —
    nothing measures movement then)."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if tol is not None and tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
    if check_every < 1:
        raise ValueError("check_every must be >= 1")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_v = vertices.count()
    if n_v == 0:
        if stats is not None:  # converged vacuously: zero movement
            stats["iterations"] = 0
            stats["last_delta"] = 0.0 if tol is not None else None
        return vertices.select("id", F.lit(0.0).alias("rank"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # per-edge share of its source's rank, materialized once
    norm_edges = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("share"))
        .localCheckpoint(eager=True)
    )
    ranks = vertices.select("id", F.lit(1.0).alias("rank")).localCheckpoint(
        eager=True
    )
    # the dangling SET is fixed by the edge list — detect it once, not
    # with a per-iteration anti-join in the hot loop
    dangling_ids = (
        vertices.join(out_deg, vertices.id == out_deg.src, "left_anti")
        .select("id")
        .localCheckpoint(eager=True)
    )
    base = 1.0 - damping  # per-vertex teleport mass on the |V| convention

    iterations = 0
    last_delta: float | None = None
    for i in range(n_iter):
        prev = ranks
        contribs = (
            norm_edges.join(ranks, norm_edges.src == ranks.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("__in"))
        )
        # dangling mass: rank sitting on vertices with no out-edges —
        # redistributed uniformly (1-row aggregate, broadcast into the
        # expression; without it total mass leaks every iteration)
        dangling = (
            ranks.join(dangling_ids, "id")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__d"))
        )
        ranks = (
            vertices.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__d") / F.lit(float(n_v)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        iterations = i + 1
        if tol is not None and (iterations % check_every == 0 or iterations == n_iter):
            # both sides are checkpointed id-keyed tables; the join is
            # vertex-sized and the result a single driver row.  sum()
            # over zero vertices is NULL — an empty graph has moved by
            # exactly 0.0, not by "incomparable with tol"
            d = (
                ranks.join(prev.withColumnRenamed("rank", "__prev"), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("d"))
                .collect()[0]["d"]
            )
            last_delta = 0.0 if d is None else d
            if last_delta < tol:
                break
    if stats is not None:
        stats["iterations"] = iterations
        stats["last_delta"] = last_delta
    return ranks
