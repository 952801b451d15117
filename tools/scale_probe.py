"""Measured scale evidence: run the core operator shapes on synthetic
data 100-400x the sf0.1 events table (driver sf0.1 events = 1e5 rows;
this generates 1e7-4e7) with a DELIBERATE hot key, and time them.

The point is to measure, not guess, the claims SCALE.md leans on.
Measured findings (SCALE.md "Measured at 100-400x" table):

1. the wide operators (dedup agg, asof union+window, rollup cascade)
   scale linearly-to-sublinearly from 1e7 to 4e7 rows; the rollup and
   the plain groupBy stay nearly FLAT because their shuffle volume is
   |groups|, not |rows| (map-side combine absorbs the growth);
2. for ALGEBRAIC aggregates, partial aggregation already neutralizes
   hot-key skew — salting a count costs ~20-150% extra (second shuffle
   phase) for nothing.  `salted_agg`'s lane is NON-combinable partials
   and skewed-join replication (`salted_broadcast_left`), not counts;
   the probe keeps both timings to document that honestly.

Data is generated deterministically from `spark.range` + xxhash64 (no
rand(): reruns are identical).  ~20% of rows share ONE hot user.

Usage: python tools/scale_probe.py [n_rows]   (default 10_000_000)
Prints one JSON line per probe and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_events(spark, n: int):
    """Deterministic events-shaped frame with a planted hot user (~20%)."""
    h = F.xxhash64(F.col("id"))
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            # 30 days of event time, second granularity
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(h, F.lit(30 * 86400))
            ).alias("ts"),
            # hot key: id % 5 == 0 -> user 0 (20% of all rows)
            F.when(F.col("id") % 5 == 0, F.lit(0))
            .otherwise(F.pmod(h, F.lit(50_000)))
            .alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("click", "view", "signup", "purchase", "error")]),
                (F.pmod(h, F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(h, F.lit(1000)) / F.lit(1.0)).alias("value"),
        )
    )


def timed(name, fn, out):
    t0 = time.time()
    n = fn()
    sec = round(time.time() - t0, 3)
    rec = {"probe": name, "sec": sec, "rows": n}
    out.append(rec)
    print(json.dumps(rec), flush=True)
    return sec


def main() -> None:
    mode = "events"
    args = [a for a in sys.argv[1:]]
    if args and args[0] in ("events", "docs", "ann", "srp", "cc", "spans", "vocab", "decon", "semdedup", "spatial", "bpe", "hotcell", "radius", "interval", "knn", "merge", "linkage", "sparsesim", "wsample", "pq", "snap", "snap-manifest", "heavy", "pagerank", "matview", "snap-big", "snap-contention", "snap-maint", "spill"):
        mode = args.pop(0)
    n = int(args[0]) if args else {
        "events": 10_000_000, "docs": 1_000_000, "ann": 1_000_000,
        "srp": 1_000_000, "cc": 1_000_000, "spans": 200_000,
        "vocab": 5_000_000, "decon": 500_000, "semdedup": 100_000,
        "spatial": 1_000_000, "bpe": 200_000, "hotcell": 50_000, "radius": 1_000_000, "interval": 1_000_000,
        "knn": 1_000_000, "merge": 10_000_000, "linkage": 100_000,
        "sparsesim": 10_000, "wsample": 10_000_000, "pq": 1_000_000,
        "snap": 2_000_000, "snap-manifest": 100_000, "heavy": 10_000_000,
        "pagerank": 2_000_000, "matview": 10_000_000,
        "snap-big": 20_000_000, "snap-contention": 200_000,
        "snap-maint": 200_000, "spill": 30_000_000,
    }[mode]
    from mini_project_204721_data_engineering_spark.session import get_spark

    spark = get_spark("scale-probe")
    out: list[dict] = []
    if mode != "events":
        {"docs": probe_docs, "ann": probe_ann, "srp": probe_srp, "cc": probe_cc,
         "spans": probe_spans, "vocab": probe_vocab,
         "decon": probe_decon, "semdedup": probe_semdedup,
         "spatial": probe_spatial, "bpe": probe_bpe,
         "hotcell": probe_hotcell, "radius": probe_radius,
         "interval": probe_interval, "knn": probe_knn,
         "merge": probe_merge, "linkage": probe_linkage,
         "sparsesim": probe_sparsesim,
         "wsample": probe_wsample,
         "pq": probe_pq,
         "snap": probe_snap,
         "snap-manifest": probe_snap_manifest,
         "heavy": probe_heavy,
         "pagerank": probe_pagerank,
         "matview": probe_matview,
         "snap-big": probe_snap_big,
         "snap-contention": probe_snap_contention,
         "snap-maint": probe_snap_maintenance,
         "spill": probe_spill}[mode](spark, n, out)
        total = round(sum(r["sec"] for r in out), 3)
        print(json.dumps({"metric": f"scale_probe_{mode}_total", "value": total,
                          "unit": "sec", "n_rows": n,
                          "probes": {r["probe"]: r["sec"] for r in out}}))
        return
    ev = synth_events(spark, n).localCheckpoint(eager=True)  # materialize input once

    # every probe CONSUMES its computed measure (a bare count() would let
    # Catalyst prune the window/agg expressions and time only the scan)

    # 1. skew: plain groupBy vs salted two-phase on the hot-key distribution
    timed(
        "groupby_plain_skewed",
        lambda: ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0],
        out,
    )

    def salted():
        from mini_project_204721_data_engineering_spark.operators.skew import salted_agg

        return salted_agg(
            ev,
            keys=["user_id"],
            salt_from="event_id",
            partials={"n": (F.count(F.lit(1)), F.sum("n"))},
            n_salts=32,
        ).agg(F.sum("n")).collect()[0][0]

    timed("groupby_salted_skewed", salted, out)

    # 2. exact dedup (agg form) on a 50%-duplicated key space
    def dedup():
        from mini_project_204721_data_engineering_spark.operators.dedup import (
            dedup_keep_first_agg,
        )

        d = ev.withColumn("k", F.pmod(F.col("event_id"), F.lit(n // 2)))
        kept = dedup_keep_first_agg(d, ["k"], ["event_id"])
        return kept.agg(F.count(F.lit(1)), F.sum("event_id")).collect()[0][0]

    timed("dedup_keep_first_agg_50pct_dups", dedup, out)

    # 3. as-of join: every event against a daily per-user spine (fact-fact)
    def asof():
        from mini_project_204721_data_engineering_spark.operators.joins import asof_join

        right = (
            ev.groupBy("user_id", F.date_trunc("day", "ts").alias("rt"))
            .agg(F.sum("value").alias("spend"))
        )
        joined = asof_join(
            ev.select("event_id", "user_id", "ts"),
            right,
            on=["user_id"],
            left_time="ts",
            right_time="rt",
            payload=["spend"],
            payload_nonnull=True,
        )
        # consume the filled payload so the window cannot be pruned
        return joined.agg(F.count("spend")).collect()[0][0]

    timed("asof_union_window_fact_fact", asof, out)

    # 3b. as-of with tolerance: same union-window plan + the post-fill
    # staleness filter — must cost the same shape as the plain as-of
    def asof_tolerance():
        from mini_project_204721_data_engineering_spark.operators.joins import asof_join

        right = (
            ev.groupBy("user_id", F.date_trunc("day", "ts").alias("rt"))
            .agg(F.sum("value").alias("spend"))
        )
        joined = asof_join(
            ev.select("event_id", "user_id", "ts"),
            right,
            on=["user_id"],
            left_time="ts",
            right_time="rt",
            payload=["spend"],
            payload_nonnull=True,
            tolerance="INTERVAL '12' HOUR",
        )
        # count(spend) consumes the tolerance-nulled fill
        return joined.agg(F.count("spend")).collect()[0][0]

    timed("asof_union_window_tolerance_12h", asof_tolerance, out)

    # 4. hourly -> daily rollup cascade
    def rollup():
        from mini_project_204721_data_engineering_spark.operators.rollup import (
            reaggregate,
            rollup_time,
        )

        hourly = rollup_time(ev, "ts", "value", ["event_type"], "hour")
        daily = reaggregate(hourly, ["event_type"], "day")
        return daily.agg(F.count(F.lit(1)), F.sum("value_sum")).collect()[0][0]

    timed("rollup_cascade_hour_day", rollup, out)

    total = round(sum(r["sec"] for r in out), 3)
    print(
        json.dumps(
            {"metric": "scale_probe_total", "value": total, "unit": "sec", "n_rows": n,
             "probes": {r["probe"]: r["sec"] for r in out}}
        )
    )



def synth_docs(spark, n: int, n_tokens: int = 50, vocab: int = 1000, dup_frac_mod: int = 10):
    """Deterministic word-soup docs; every ``dup_frac_mod``-th doc is an
    exact duplicate of its predecessor (near-dup structure for LSH)."""
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % dup_frac_mod == 0, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("bid"),
    )
    words = F.expr(
        f"transform(sequence(0, {n_tokens - 1}), "
        f"i -> concat('w', pmod(xxhash64(bid * {n_tokens} + i), {vocab})))"
    )
    return d.select("doc_id", F.concat_ws(" ", words).alias("text"))


def synth_embeddings(spark, n: int, dim: int = 64):
    """Deterministic unit-ish embeddings: dim pseudo-random doubles."""
    vec = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> cast(pmod(xxhash64(id * {dim} + i), 2000) - 1000 as double) / 1000.0)"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        # a 16-cell routing label (hash partition: timing-representative
        # for the nprobe/ncells scan-cost ratio, not a recall claim)
        F.pmod(F.xxhash64(F.col("id")), F.lit(16)).alias("label"),
    )


def probe_docs(spark, n: int, out: list) -> None:
    """LLM-surface probes: MinHash-LSH dedup at corpus scale."""
    docs = synth_docs(spark, n).localCheckpoint(eager=True)

    def lsh(hash_fn):
        def run():
            from mini_project_204721_data_engineering_spark.llm.dedup import minhash_lsh_pairs

            pairs = minhash_lsh_pairs(docs, k=8, bands=4, threshold=0.5, hash_fn=hash_fn)
            return pairs.agg(F.count(F.lit(1))).collect()[0][0]

        return run

    timed("minhash_lsh_pairs_md5", lsh("md5"), out)
    timed("minhash_lsh_pairs_xxhash64", lsh("xxhash64"), out)

    def exact():
        from mini_project_204721_data_engineering_spark.llm.dedup import exact_dedup

        return exact_dedup(docs).agg(F.count(F.lit(1))).collect()[0][0]

    timed(f"exact_dedup_docs", exact, out)


def probe_ann(spark, n: int, out: list) -> None:
    """ANN probes: brute-force cosine top-k vs IVF at corpus scale."""
    emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
    qs = emb.filter(F.col("vec_id") % max(1, n // 100) == 0)  # ~100 queries

    def brute():
        from mini_project_204721_data_engineering_spark.llm.similarity import cosine_topk

        return cosine_topk(emb, qs, k=10).agg(F.count(F.lit(1))).collect()[0][0]

    timed("ann_bruteforce_topk", brute, out)

    def ivf():
        from mini_project_204721_data_engineering_spark.llm.similarity import ivf_topk

        return ivf_topk(emb, qs, k=10, nprobe=2).agg(
            F.count(F.lit(1))
        ).collect()[0][0]

    timed("ann_ivf_nprobe2_of16cells", ivf, out)

    # honest RECALL measurement needs geometric cluster structure the
    # flat synthetic lacks: plant 16 well-separated centers (one-hot-ish
    # blocks scaled to dominate) + small deterministic jitter, so true
    # neighbors concentrate in cells and nprobe routing is meaningful
    dim = 64
    centers = 16
    for signal, tag in ((10.0, "separated"), (1.5, "overlapping")):
        clustered = spark.range(n).select(
            F.col("id").alias("vec_id"),
            # IVF lists = the true clusters (what a converged k-means
            # finds on these centers) — the probe measures nprobe
            # ROUTING recall, not quantizer training
            F.pmod(F.col("id"), F.lit(centers)).cast("int").alias("label"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), i -> "
                f"cast(IF(i div {dim // centers} = pmod(id, {centers}), {signal}, 0.0) "
                f"+ (pmod(xxhash64(id * {dim} + i), 2000) - 1000) / 1000.0 as double))"
            ).alias("embedding"),
        ).localCheckpoint(eager=True)
        cqs = clustered.filter(F.col("vec_id") % max(1, n // 50) == 0)

        def recall(c=clustered, q=cqs, t=tag):
            from mini_project_204721_data_engineering_spark.llm.similarity import (
                cosine_topk,
                ivf_topk,
            )

            exact = {
                (r["query_id"], r["vec_id"])
                for r in cosine_topk(c, q, k=10).collect()
            }
            approx = {
                (r["query_id"], r["vec_id"])
                for r in ivf_topk(c, q, k=10, nprobe=2).collect()
            }
            hit = len(exact & approx)
            rec = round(hit / max(1, len(exact)), 4)
            print(json.dumps({"probe": f"ann_ivf_recall_at10_nprobe2_{t}",
                              "recall": rec, "n_true": len(exact)}), flush=True)
            return hit

        timed(f"ann_ivf_recall_{tag}", recall, out)


def synth_embeddings_with_dups(spark, n: int, dim: int = 64, dup_mod: int = 10):
    """Embeddings where every ``dup_mod``-th vector exactly copies its
    predecessor — planted near-dup structure for the SRP-LSH probe."""
    d = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % dup_mod == 0, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("bid"),
    )
    vec = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> cast(pmod(xxhash64(bid * {dim} + i), 2000) - 1000 as double) / 1000.0)"
    )
    return d.select("vec_id", vec.alias("embedding"))


def probe_srp(spark, n: int, out: list) -> None:
    """SRP-LSH embedding near-dup at corpus scale (VERDICT r5 #5).

    The load-bearing variable is BITS PER BAND vs corpus size: random
    unrelated vectors agree on a sign bit with p≈0.5, so a band of b
    bits collides at ≈2^-b and random candidates ≈ bands·n²/2^b.
    Keeping that ≈O(n) needs b ≳ log2(bands·n/2) — at n=1e6 that is
    ~21+ bits/band.  The two probes measure both regimes: 16-bit bands
    (under-provisioned at 1e6: candidates grow ~n²) vs 24-bit bands
    (candidates ∝ planted dups).  Run at two n to see the shape."""
    emb = synth_embeddings_with_dups(spark, n).localCheckpoint(eager=True)

    def srp(n_bits, bands, label):
        def run():
            from mini_project_204721_data_engineering_spark.llm.dedup import srp_banded_pairs

            pairs = srp_banded_pairs(
                emb, threshold=0.99, n_bits=n_bits, bands=bands
            )
            return pairs.agg(F.count(F.lit(1))).collect()[0][0]

        return run

    timed("srp_16bit_bands_underprovisioned", srp(32, 2, "16b"), out)
    timed("srp_24bit_bands_provisioned", srp(48, 2, "24b"), out)


def probe_spans(spark, n: int, out: list) -> None:
    """Exact-substring duplicate_spans at corpus scale — the r6 claim
    under test: xxhash64-ing positional grams before the count shuffle
    and the hot-gram join moves 8-B keys instead of ~60-B gram strings
    (identical output; the oracle checks that at sf).  n docs x 50
    tokens -> ~43 n positional 8-grams through the shuffle."""
    from mini_project_204721_data_engineering_spark.llm.dedup import duplicate_spans

    docs = synth_docs(spark, n).localCheckpoint(eager=True)

    def spans(hash_grams):
        def run():
            return (
                duplicate_spans(docs, k=8, hash_grams=hash_grams)
                .agg(F.count(F.lit(1)), F.sum("n_tokens"))
                .collect()[0][0]
            )

        return run

    timed("duplicate_spans_hashed", spans(True), out)
    timed("duplicate_spans_strings", spans(False), out)


def probe_vocab(spark, n: int, out: list) -> None:
    """Two-phase vocab rank (r6 #6) vs the single-partition global
    window it replaced, at n DISTINCT tokens (the straggler axis: a
    100 TB corpus has 1e7-1e8 distinct tokens).  Both variants consume
    sum(rank) = n(n+1)/2, so neither can dead-code the window."""
    from mini_project_204721_data_engineering_spark.llm.quality import (
        _ranked_token_counts,
    )

    counts = (
        spark.range(n)
        .select(
            F.concat(F.lit("w"), F.col("id")).alias("token"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(1000)) + 1001).alias("n_occurrences"),
        )
        .localCheckpoint(eager=True)
    )

    def two_phase():
        return (
            _ranked_token_counts(counts, 32).agg(F.sum("__lrank")).collect()[0][0]
        )

    def global_window():
        from pyspark.sql.window import Window

        w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        return (
            counts.withColumn("r", F.row_number().over(w))
            .agg(F.sum("r"))
            .collect()[0][0]
        )

    timed("vocab_rank_two_phase", two_phase, out)
    timed("vocab_rank_global_window", global_window, out)


def probe_decon(spark, n: int, out: list) -> None:
    """Decontamination at corpus scale: broadcast gram-set join vs the
    r6 split-block-Bloom pre-filter, n corpus docs against a 2%-of-n
    benchmark.  Both must return identical contaminated-doc counts."""
    from mini_project_204721_data_engineering_spark.llm.quality import (
        contaminated_docs,
    )

    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    bench = synth_docs(spark, max(1000, n // 50)).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    def run(bloom_fpp):
        def go():
            return (
                contaminated_docs(docs, bench, n=8, bloom_fpp=bloom_fpp)
                .agg(F.count(F.lit(1)), F.sum("n_shared_grams"))
                .collect()[0][0]
            )

        return go

    timed("decon_broadcast", run(None), out)
    timed("decon_bloom_sbbf", run(0.01), out)


def probe_semdedup(spark, n: int, out: list) -> None:
    """semantic_dedup (SemDeDup) at corpus scale.  The pairwise stage
    costs ~n x cell_size / 2 cosine evaluations, so the load-bearing
    knob is CELL SIZE, not corpus size: a fixed quantizer (ncells
    constant) goes quadratic as n grows, while provisioning
    ncells ∝ n (constant cell size) keeps the operator linear — the
    same provisioning discipline as the SRP bits/band rule.  Two
    probes: fixed ncells=64, and ncells scaled to hold cell size at
    ~390 vectors."""
    emb = synth_embeddings_with_dups(spark, n).localCheckpoint(eager=True)

    def run(ncells):
        def go():
            from mini_project_204721_data_engineering_spark.llm.dedup import semantic_dedup

            return semantic_dedup(emb, threshold=0.99, ncells=ncells).count()

        return go

    timed("semdedup_fixed_64cells", run(64), out)
    timed("semdedup_cells_prop_n", run(max(8, n // 390)), out)

    def run_two_level():
        from mini_project_204721_data_engineering_spark.llm.dedup import semantic_dedup
        from mini_project_204721_data_engineering_spark.llm.similarity import (
            assign_cells_two_level,
            seeded_two_level,
        )

        k = max(2, int(round((n / 390) ** 0.5)))
        supers, subs = seeded_two_level(emb, k1=k, k2=k)
        cells = assign_cells_two_level(emb, supers, subs)
        return semantic_dedup(emb, threshold=0.99, cells_df=cells).count()

    # same effective cell count as cells_prop_n, but assignment costs
    # n·2√k instead of n·k — the SCALE.md linear path beyond 1e7 vectors
    timed("semdedup_two_level", run_two_level, out)


def probe_hotcell(spark, n: int, out: list) -> None:
    """Hot-cell guard for semantic_dedup (r7): a corpus whose lower
    half collapses onto ONE direction (per-id scalings — identical
    cosine to every centroid, so one cell takes 50% of the vectors)
    is the quadratic failure mode the cap defuses.  Claim under test:
    uncapped cost grows ~n² in the hot-cell population while
    max_cell_size holds the per-reducer pairwise work constant, so the
    capped runtime stays ~linear in n."""
    dim = 64
    hot = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> cast(1 + pmod(i * 37, 29) as double) / 29.0 "
        f"* (1.0 + cast(pmod(id, 97) as double) / 97000.0))"
    )
    spread = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> cast(pmod(xxhash64(id * {dim} + i), 2000) - 1000 as double) / 1000.0)"
    )
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") % 2 == 0, hot).otherwise(spread).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )

    def run(cap):
        def go():
            from mini_project_204721_data_engineering_spark.llm.dedup import semantic_dedup

            return semantic_dedup(
                emb, threshold=0.99, ncells=64, max_cell_size=cap
            ).count()

        return go

    timed("hotcell_uncapped", run(None), out)
    timed("hotcell_cap500", run(500), out)


def probe_radius(spark, n: int, out: list) -> None:
    """Grid-bucketed radius join at point scale: n points against 1000
    sites in a Thailand-sized box.  Claim under test: candidates are
    bounded by local density (grid equi-join), so cost is ~linear in n
    — against the brute-force n×1000 cross join whose cost is the
    product.  Both consume their match count."""
    from mini_project_204721_data_engineering_spark.operators.geo import (
        haversine_km,
        radius_join,
    )

    pts = (
        spark.range(n)
        .select(
            F.col("id").alias("pid"),
            (F.lit(6.0) + F.pmod(F.xxhash64("id"), 100000) / 100000.0 * 14.0).alias("lat"),
            (F.lit(97.0) + F.pmod(F.xxhash64(F.col("id") + 7), 100000) / 100000.0 * 8.0).alias("lon"),
        )
        .localCheckpoint(eager=True)
    )
    sites = (
        spark.range(1000)
        .select(
            F.col("id").alias("site_id"),
            (F.lit(6.0) + F.pmod(F.xxhash64(F.col("id") * 31), 100000) / 100000.0 * 14.0).alias("slat"),
            (F.lit(97.0) + F.pmod(F.xxhash64(F.col("id") * 37), 100000) / 100000.0 * 8.0).alias("slon"),
        )
        .localCheckpoint(eager=True)
    )

    def grid():
        return radius_join(
            pts, sites, radius_km=25.0, point_cols=("lat", "lon"),
            site_cols=("slat", "slon"), lat_range=(5.0, 21.0),
        ).count()

    def brute():
        return (
            pts.crossJoin(sites)
            .withColumn(
                "d",
                haversine_km(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon")),
            )
            .filter(F.col("d") <= 25.0)
            .count()
        )

    timed("radius_grid", grid, out)
    timed("radius_brute_crossjoin", brute, out)


def probe_knn(spark, n: int, out: list) -> None:
    """knn_join starved-fraction vs radius on a SPARSE synthetic: n
    points against only 200 sites in a Thailand-sized box.  Claim under
    test: the brute-force fallback (certificate-failing points × full
    site table) is the cost cliff an under-provisioned radius walks
    off — the starved fraction collapses as the radius grows past the
    k-neighborhood scale, and max_brute_fraction is the guard that
    surfaces it.  Each probe row records the measured fraction."""
    from mini_project_204721_data_engineering_spark.operators.geo import knn_join

    pts = (
        spark.range(n)
        .select(
            F.col("id").alias("pid"),
            (F.lit(6.0) + F.pmod(F.xxhash64("id"), 100000) / 100000.0 * 14.0).alias("lat"),
            (F.lit(97.0) + F.pmod(F.xxhash64(F.col("id") + 7), 100000) / 100000.0 * 8.0).alias("lon"),
        )
        .localCheckpoint(eager=True)
    )
    sites = (
        spark.range(200)
        .select(
            F.col("id").alias("site_id"),
            (F.lit(6.0) + F.pmod(F.xxhash64(F.col("id") * 31), 100000) / 100000.0 * 14.0).alias("slat"),
            (F.lit(97.0) + F.pmod(F.xxhash64(F.col("id") * 37), 100000) / 100000.0 * 8.0).alias("slon"),
        )
        .localCheckpoint(eager=True)
    )
    kw = dict(point_cols=("lat", "lon"), site_cols=("slat", "slon"),
              lat_range=(5.0, 21.0))
    for radius in (25.0, 100.0, 400.0):
        # measure the starved fraction the guard would see, then run the
        # full join (fallback included) and consume it
        try:
            knn_join(pts, sites, k=3, point_key="pid", radius_km=radius,
                     max_brute_fraction=0.0, **kw)
            frac = 0.0
        except ValueError as e:
            import re

            m = re.search(r"\((\d+(?:\.\d+)?)%\)", str(e))
            frac = float(m.group(1)) / 100.0 if m else -1.0

        def run(r=radius):
            return knn_join(pts, sites, k=3, point_key="pid",
                            radius_km=r, **kw).count()

        sec = timed(f"knn_r{int(radius)}km_starved{frac:.3f}", run, out)
        del sec


def probe_linkage(spark, n: int, out: list) -> None:
    """Fuzzy-join blocking at catalog scale: n left names (realistic
    SKU shape — word pair + 5-hex suffix, so grams are DIVERSE like
    real catalogs; an earlier revision with only 100 word combos was a
    worst case where every string shared every gram and blocking bought
    little) against n/10 intact right names; every 3rd left name loses
    a char, every 5th transposes its words.  Claims under test: blocked
    candidates ∝ matches vs the quadratic brute cross join, and
    tokensort additionally recovers the transposed pairs that raw
    levenshtein-distance-2 linkage MISSES."""
    from mini_project_204721_data_engineering_spark.operators.linkage import (
        fuzzy_join,
        fuzzy_join_tokensort,
    )

    colors = "red blue green grey teal navy coral amber ivory umber".split()
    nouns = "widget gadget flange sprocket bracket grommet spindle washer bolt clasp".split()

    def base(m):
        return spark.range(m).select(
            F.col("id").alias("nid"),
            F.concat(
                F.array(*[F.lit(c) for c in colors])[
                    F.pmod(F.xxhash64(F.col("id")), 10)
                ],
                F.lit(" "),
                F.array(*[F.lit(w) for w in nouns])[
                    F.pmod(F.xxhash64(F.col("id") * 31), 10)
                ],
                F.lit(" "),
                F.substring(F.md5(F.col("id").cast("string")), 1, 5),
            ).alias("name"),
        )

    left = (
        base(n)
        .withColumn(
            "name",
            F.when(  # word transposition: "red widget ab12f" -> "widget red ab12f"
                F.col("nid") % 5 == 0,
                F.concat(
                    F.element_at(F.split("name", " "), 2), F.lit(" "),
                    F.element_at(F.split("name", " "), 1), F.lit(" "),
                    F.element_at(F.split("name", " "), 3),
                ),
            ).when(  # typo: delete the 4th char
                F.col("nid") % 3 == 0,
                F.concat(F.substring("name", 1, 3), F.expr("substring(name, 5)")),
            ).otherwise(F.col("name")),
        )
        .withColumnRenamed("name", "lname")
        .localCheckpoint(eager=True)
    )
    right = (
        base(n // 10).withColumnRenamed("name", "rname").localCheckpoint(eager=True)
    )

    def blocked():
        return fuzzy_join(
            left, right, "lname", "rname", max_dist=2, max_gram_df=2000
        ).count()

    nb = timed("linkage_blocked_qgram", blocked, out)
    del nb

    def tokensort():
        return fuzzy_join_tokensort(
            left, right, "lname", "rname", min_sim=0.85, max_gram_df=2000
        ).count()

    timed("linkage_tokensort_blocked", tokensort, out)

    def brute():
        return (
            left.crossJoin(right)
            .filter(F.levenshtein(F.col("lname"), F.col("rname")) <= 2)
            .count()
        )

    timed("linkage_bruteforce_crossjoin", brute, out)


def probe_merge(spark, n: int, out: list) -> None:
    """merge_into cost ∝ AFFECTED partitions, not table size: an n-row
    table of realistically WIDE rows (~250 B payload — the claim is
    about bytes WRITTEN, which a narrow 3-column row never stresses)
    over 50 day partitions takes a 2-partition upsert (n/50 keys
    touched) vs a full-table dynamic overwrite of the same merged
    content.  Claim under test: the partition-scoped MERGE rewrites
    ~2/50 of the bytes — the gap is the point of partition-grain CDC
    and widens with row width and table size."""
    import shutil
    import tempfile

    from mini_project_204721_data_engineering_spark.sources.sink import (
        merge_into,
        overwrite_fact_partitions,
    )

    base = tempfile.mkdtemp(prefix="probe_merge_")
    tab = base + "/t"
    try:
        rows = spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit("d"), F.pmod(F.col("id"), 50).cast("string")).alias("day"),
            (F.col("id") % 997 / 7.0).alias("v"),
            # incompressible-ish per-row payload so write volume is real
            F.repeat(F.md5(F.col("id").cast("string")), 8).alias("payload"),
        )
        rows.repartition(F.col("day")).write.partitionBy("day").parquet(tab)
        src = (
            spark.range(n // 50)
            .select(
                (F.col("id") * 50 + (F.col("id") % 2)).alias("k"),  # days d0/d1
                F.concat(F.lit("d"), (F.col("id") % 2).cast("string")).alias("day"),
                F.lit(-1.0).alias("v"),
                F.repeat(F.md5((-F.col("id")).cast("string")), 8).alias("payload"),
            )
            .localCheckpoint(eager=True)
        )

        def scoped():
            r = merge_into(src, tab, ["k"], "day")
            return r["updated"] + r["inserted"]

        timed("merge_2_of_50_partitions", scoped, out)

        def full_rewrite():
            existing = spark.read.parquet(tab)
            merged = (
                existing.join(src.select("k"), ["k"], "left_anti")
                .unionByName(src)
                .repartition(F.col("day"))
                .localCheckpoint(eager=True)
            )
            overwrite_fact_partitions(merged, tab, ["day"])
            return n

        timed("merge_full_table_rewrite", full_rewrite, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def probe_interval(spark, n: int, out: list) -> None:
    """Bucketed interval join at fact scale: n facts against n/2
    overlapping intervals over 1000 keys (mean length ~= bucket).
    Claim under test: bucketed candidates ∝ per-(key, bucket) density →
    ~linear in n, while the brute-force theta join (equi-join on key +
    range filter) carries facts × intervals / keys candidate pairs —
    quadratic in n when both sides grow."""
    from mini_project_204721_data_engineering_spark.operators.temporal import interval_join

    facts = (
        spark.range(n)
        .select(
            F.col("id").alias("fid"),
            F.pmod(F.xxhash64("id"), 1000).alias("k"),
            (F.pmod(F.xxhash64(F.col("id") + 3), 1_000_000) * 1.0).alias("ts"),
        )
        .localCheckpoint(eager=True)
    )
    ivs = (
        spark.range(n // 2)
        .select(
            F.col("id").alias("iid"),
            F.pmod(F.xxhash64(F.col("id") * 13), 1000).alias("k"),
            (F.pmod(F.xxhash64(F.col("id") * 17), 1_000_000) * 1.0).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + 500.0 + F.pmod(F.xxhash64("iid"), 1000))
        .localCheckpoint(eager=True)
    )

    def bucketed():
        return interval_join(
            facts, ivs, fact_ts="ts", start_col="lo", end_col="hi",
            bucket=1000.0, on=["k"],
        ).count()

    def brute():
        return (
            facts.join(ivs, "k")
            .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
            .count()
        )

    timed("interval_bucketed", bucketed, out)
    timed("interval_brute_theta", brute, out)


def probe_bpe(spark, n: int, out: list) -> None:
    """BPE induction over an n-distinct-word frequency table (the r6
    operator's working set — every merge round is a pair-count groupBy
    + argmax + fold over THIS table, never the corpus).  Claim under
    test: per-round cost ∝ vocab size; 8 merges at n and 4n should
    scale ~linearly.  Words are synthetic 8-char strings so the symbol
    arrays (and pair tables) have realistic size."""
    from mini_project_204721_data_engineering_spark.llm.bpe import bpe_train

    words = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("w"),
                F.lpad(F.conv(F.pmod(F.xxhash64("id"), F.lit(1 << 40)).cast("string"), 10, 36), 8, "a"),
            ).alias("word"),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000)) + 1).alias("n"),
        )
        .localCheckpoint(eager=True)
    )

    def run():
        merges, seg = bpe_train(words.withColumn("syms", F.expr(
            "array_append(split(word, ''), '</w>')")), n_merges=8)
        # consume the final segmentation so no round is dead-coded
        return seg.agg(F.sum(F.size("syms"))).collect()[0][0]

    timed("bpe_8_merges", run, out)

    def run_local():
        # the production trainer: collect the word table once, run 512
        # EXACT sequential merges driver-side (incremental pair counts,
        # zero Spark rounds) — 64× the merges of the distributed probe
        from mini_project_204721_data_engineering_spark.llm.bpe import bpe_train_local

        merges, seg = bpe_train_local(words, n_merges=512, max_words=n + 1)
        return len(merges) + seg.count()

    timed("bpe_local_512_merges", run_local, out)


def probe_spatial(spark, n: int, out: list) -> None:
    """Point-in-polygon spatial join (J1's general mapInPandas path) at
    fact scale: n points against a 900-polygon ADM2-sized boundary set
    (the reference's Thailand ADM2 file has 928).  Claim under test:
    cost is linear in points — the polygon set is broadcast once, the
    bbox prefilter makes the per-polygon work ∝ candidate points, and
    no shuffle exists anywhere (pure map stage)."""
    import pandas as pd

    from mini_project_204721_data_engineering_spark.sources.geometry import (
        assign_points_udf,
    )

    # 30x30 grid of unit-cell "districts" over [0,30)x[0,30)
    polys = []
    for i in range(30):
        for j in range(30):
            wkt = (
                f"POLYGON(({i} {j}, {i + 1} {j}, {i + 1} {j + 1}, "
                f"{i} {j + 1}, {i} {j}))"
            )
            polys.append({"province": f"p{i}", "district": f"d{i}_{j}", "wkt": wkt})
    polygons_df = pd.DataFrame(polys)
    pts = (
        spark.range(n)
        .select(
            F.col("id").alias("pt_id"),
            (F.pmod(F.xxhash64("id"), F.lit(30_000)) / 1000.0).alias("lon"),
            (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(30_000)) / 1000.0).alias("lat"),
        )
        .localCheckpoint(eager=True)
    )

    def run():
        tagged = assign_points_udf(pts, polygons_df)
        return tagged.agg(F.count(F.lit(1))).collect()[0][0]

    timed("spatial_join_900_polys", run, out)


def probe_cc(spark, n: int, out: list) -> None:
    """dup_clusters (connected components) over n planted near-dup
    PAIRS: clusters of 5 docs chained (diameter 4 — the realistic
    near-dup shape), so rounds stay constant while edges scale.  The
    claim under test: cost ∝ edges × diameter, not corpus²."""
    from mini_project_204721_data_engineering_spark.llm.dedup import dup_clusters

    # chains 0-1-2-3-4, 5-6-..., each cluster spans 5 ids → n pairs total
    pairs = (
        spark.range(n)
        .filter(F.pmod("id", F.lit(5)) != 4)  # last link of each 5-chain omitted
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        .localCheckpoint(eager=True)
    )

    def cc():
        labels = dup_clusters(pairs)
        # consume: every doc labeled with its chain head (id - id%5)
        return labels.filter(
            F.col("cluster_id") == F.col("doc_id") - F.pmod("doc_id", F.lit(5))
        ).count()

    timed("dup_clusters_chain5", cc, out)




def probe_sparsesim(spark, n: int, out: list) -> None:
    """All-pairs tf-cosine join: prefix-filtered inverted index vs the
    brute inverted-index join on a Zipf-ish vocabulary (u² draw — hot
    terms carry quadratic posting-list cost, exactly where prefix
    filtering pays: hot terms are suffix-ranked and drop out of the
    INDEX side unless a document's mass concentrates in them).  Both
    variants return identical pairs (pinned in tests/test_llm.py);
    here we pin the COST separation."""
    from mini_project_204721_data_engineering_spark.llm.sparse_sim import (
        sparse_cosine_join,
    )

    # realistic corpus shape: 50k-term vocabulary under a heavy-tailed
    # (u^4) draw — the top "stopword" lands in ~98% of documents, so the
    # brute join's hot posting list is ~|docs| and its cost quadratic,
    # while tf-L2 weighting leaves stopwords LOW-mass per doc, so they
    # sort last and fall out of the prefix index
    n_tokens, vocab = 60, 50_000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("bid"),
    )
    words = F.expr(
        f"transform(sequence(0, {n_tokens - 1}), "
        f"i -> concat('w', cast(pow(pmod(xxhash64(bid * {n_tokens} + i), 10000) "
        f"/ 10000.0, 4.0) * {vocab} as int)))"
    )
    docs = d.select(
        "doc_id", F.concat_ws(" ", words).alias("text")
    ).localCheckpoint(eager=True)

    def run(prefix, label):
        def f():
            return (
                sparse_cosine_join(
                    docs, 0.8, prefix_filter=prefix, persist_vectors=True
                )
                .agg(F.count(F.lit(1)))
                .collect()[0][0]
            )

        return f

    timed("sparse_cosine_prefix", run(True, "prefix"), out)
    timed("sparse_cosine_brute", run(False, "brute"), out)


def probe_pq(spark, n: int, out: list) -> None:
    """Product quantization at embedding-corpus scale: one-off encode
    cost, then the per-query separation that justifies it — the ADC
    scan reads m=8 one-byte codes per vector, the brute cosine scan
    reads all 64 doubles.  Recall is pinned in tests/test_llm.py; this
    pins the COST."""
    from mini_project_204721_data_engineering_spark.llm.pq import pq_encode, pq_search, pq_train
    from mini_project_204721_data_engineering_spark.llm.similarity import cosine_topk

    emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
    cb = pq_train(emb, m=8, k=256, sample=20_000, iters=5)
    q = [float((i % 7) - 3) / 3.0 for i in range(64)]

    codes_box = {}

    def encode():
        codes_box["c"] = pq_encode(emb, cb).localCheckpoint(eager=True)
        return codes_box["c"].count()

    timed("pq_encode_once", encode, out)

    def adc():
        return pq_search(codes_box["c"], q, cb, topk=10).count()

    def brute():
        qdf = spark.createDataFrame([(-1, q)], "vec_id long, embedding array<double>")
        return cosine_topk(emb, qdf, k=10).count()

    timed("pq_adc_query", adc, out)
    timed("brute_cosine_query", brute, out)


def probe_wsample(spark, n: int, out: list) -> None:
    """Exactly-k weighted sampling at corpus-sized k (k = n/10): the
    TakeOrderedAndProject form holds a k-row heap per task and
    materializes k rows on the driver; the threshold form locates the
    k-th rank key and selects by filter.  Both must return the same
    row count; the probe pins the cost separation and that the filter
    form stays driver-safe."""
    from mini_project_204721_data_engineering_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_threshold,
    )

    df = spark.range(n).select(
        F.col("id").alias("key"),
        (F.pmod(F.xxhash64("id"), F.lit(997)) + 1).cast("double").alias("w"),
    ).localCheckpoint(eager=True)
    k = n // 10

    def topk():
        return weighted_sample(df, k, "w", "key").agg(
            F.count(F.lit(1)), F.sum("key")
        ).collect()[0][0]

    def threshold():
        got = weighted_sample_threshold(df, k, "w", "key").agg(
            F.count(F.lit(1)), F.sum("key")
        ).collect()[0][0]
        spark.catalog.clearCache()
        return got

    timed("weighted_topk_form", topk, out)
    timed("weighted_threshold_form", threshold, out)
    assert out[-1]["rows"] == out[-2]["rows"] == k, (out[-2], out[-1])


def probe_snap(spark, n: int, out: list) -> None:
    """Snapshot-log probes: manifest-metadata cost as the log grows, and
    file-prune effectiveness for a key-range read over many files.
    20 commits x 10 files of range-partitioned ids with stats on id."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
    )

    d = tempfile.mkdtemp(prefix="snap_probe_")
    t = d + "/t"
    n -= n % 20  # 20 equal commits: exact-count asserts need divisibility
    per = n // 20
    try:
        def commits():
            for i in range(20):
                df = (
                    spark.range(i * per, (i + 1) * per)
                    .select(F.col("id"), (F.col("id") % 97).alias("v"))
                    .repartitionByRange(10, "id")
                )
                snapshot_append(df, t, stats_cols=["id"])
            return 20

        timed("snap_20_commits_200_files_with_stats", commits, out)

        full = read_snapshot(spark, t)
        n_files_full = len(full.inputFiles())
        lo, hi = 3 * per, 3 * per + per // 2  # half of one commit's range
        pruned = read_snapshot(spark, t, prune={"id": (lo, hi)})
        n_files_pruned = len(pruned.inputFiles())

        def scan_full():
            return full.filter(F.col("id").between(lo, hi)).agg(
                F.sum("v")
            ).collect()[0][0]

        def scan_pruned():
            return pruned.filter(F.col("id").between(lo, hi)).agg(
                F.sum("v")
            ).collect()[0][0]

        a = timed(f"range_scan_full_{n_files_full}_files", scan_full, out)
        b = timed(f"range_scan_pruned_{n_files_pruned}_files", scan_pruned, out)
        assert scan_full() == scan_pruned()  # pruning never changes answers
        print(json.dumps({
            "probe": "prune_effectiveness",
            "files_full": n_files_full, "files_pruned": n_files_pruned,
            "speedup": round(a / b, 2) if b else None,
        }), flush=True)

        # read_snapshot_where: the engine derives the prune from an
        # ordinary WHERE clause — files planned must scale with the
        # range's SELECTIVITY, not the table's file count
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            read_snapshot_where,
        )

        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            snapshot_count,
            snapshot_min_max,
            snapshot_plan_info,
        )

        sel_files = {}
        sel_bytes = {}
        for pct in (1, 10, 50):
            hi_q = n * pct // 100
            q = read_snapshot_where(spark, t, f"id >= 0 AND id < {hi_q}")
            sel_files[pct] = len(q.inputFiles())
            assert q.count() == hi_q
            # the plan_info probe prices the SAME predicate in bytes,
            # from the manifest alone (no scan, no Spark job)
            info = snapshot_plan_info(spark, t, f"id >= 0 AND id < {hi_q}")
            assert info["files_planned"] == sel_files[pct]
            sel_bytes[pct] = info["bytes_planned"]
        assert sel_files[1] < sel_files[10] < sel_files[50] < n_files_full
        assert sel_bytes[1] < sel_bytes[10] < sel_bytes[50]
        print(json.dumps({
            "probe": "read_where_selectivity",
            "files_full": n_files_full,
            "files_planned_by_pct": sel_files,
            "bytes_planned_by_pct": sel_bytes,
            "bytes_total": snapshot_plan_info(spark, t)["bytes_total"],
        }), flush=True)

        # metadata-only aggregates: the serving-path COUNT(*) / MIN/MAX
        # answered from the manifest (zero data files opened) vs the
        # full scan — the reference runs both on EVERY page request
        def meta_count():
            return snapshot_count(spark, t)

        def scan_count():
            return read_snapshot(spark, t).count()

        def meta_minmax():
            return snapshot_min_max(spark, t, "id")

        def scan_minmax():
            r = read_snapshot(spark, t).agg(
                F.min("id"), F.max("id")
            ).collect()[0]
            return (r[0], r[1])

        assert meta_count() == scan_count() == n
        assert meta_minmax() == scan_minmax() == (0, n - 1)
        mc = timed("count_metadata_only", meta_count, out)
        sc = timed("count_full_scan", scan_count, out)
        mm = timed("minmax_metadata_only", meta_minmax, out)
        sm = timed("minmax_full_scan", scan_minmax, out)
        print(json.dumps({
            "probe": "metadata_aggregates",
            "files": n_files_full,
            "count_scan_over_meta": round(sc / mc, 1) if mc else None,
            "minmax_scan_over_meta": round(sm / mm, 1) if mm else None,
        }), flush=True)

        # FILTERED count with full-coverage detection: interior files of
        # an id-range are provably predicate-TRUE row-wise and count
        # from the manifest; only the two boundary files scan
        lo_c, hi_c = per // 2, 7 * per - per // 2 - 1
        pred_c = f"id BETWEEN {lo_c} AND {hi_c}"

        def covered_count():
            return snapshot_count(spark, t, where=pred_c)

        def scan_where_count():
            return read_snapshot(spark, t).filter(pred_c).count()

        assert covered_count() == scan_where_count() == hi_c - lo_c + 1
        cc = timed("count_where_covered_hybrid", covered_count, out)
        cs = timed("count_where_full_scan", scan_where_count, out)
        info_c = snapshot_plan_info(spark, t, pred_c)
        print(json.dumps({
            "probe": "covered_count",
            "files_planned": info_c["files_planned"],
            "files_covered": info_c["files_covered"],
            "bytes_planned": info_c["bytes_planned"],
            "bytes_scanned": info_c["bytes_scanned"],
            "scan_over_hybrid": round(cs / cc, 1) if cc else None,
        }), flush=True)

        # grouped rollup from the manifest: daily appends lay one day
        # per commit; the per-day count/sum/avg rollup is then driver
        # arithmetic over O(files) manifest entries — zero Spark jobs —
        # vs the full-scan groupBy the reference recomputes per request
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            snapshot_agg,
        )

        t_roll = d + "/t_rollup"
        days = 25
        per_day = n // days
        for i in range(days):
            day_df = (
                spark.range(i * per_day, (i + 1) * per_day)
                .select(
                    F.col("id"),
                    (F.col("id") % 97).cast("double").alias("v"),
                    F.date_add(F.lit("2024-01-01").cast("date"), i).alias("day"),
                )
                .coalesce(2)
            )
            snapshot_append(day_df, t_roll, stats_cols=["v", "day"])
        roll_aggs = {"n": "count(*)", "s": "sum(v)", "a": "avg(v)"}

        def meta_rollup():
            return snapshot_agg(spark, t_roll, roll_aggs, group_by="day")

        def scan_rollup():
            return {
                r["day"]: {"n": r["n"], "s": r["s"], "a": r["a"]}
                for r in read_snapshot(spark, t_roll)
                .groupBy("day")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("s"),
                    F.avg("v").alias("a"),
                )
                .collect()
            }

        got_m, got_s = meta_rollup(), scan_rollup()
        assert set(got_m) == set(got_s) and all(
            got_m[k]["n"] == got_s[k]["n"]
            and abs(got_m[k]["s"] - got_s[k]["s"]) < 1e-6
            for k in got_m
        )
        mr = timed(
            "grouped_rollup_metadata_only", lambda: len(meta_rollup()), out
        )
        sr = timed(
            "grouped_rollup_full_scan", lambda: len(scan_rollup()), out
        )
        print(json.dumps({
            "probe": "metadata_grouped_rollup",
            "days": days,
            "rows": days * per_day,
            "scan_over_meta": round(sr / mr, 1) if mr else None,
        }), flush=True)

        # NDV sketch sidecars: distinct count from per-file HLL unions
        # (metadata-sized sidecar scan) vs the full-column pass
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            snapshot_ndv,
        )

        t_ndv = d + "/t_ndv"
        true_ndv = min(100_000, n // 2)  # n is CLI-overridable
        keyed_ndv = (
            spark.range(n // 2)
            .select((F.col("id") % true_ndv).alias("k"))
            .repartition(16)
        )
        snapshot_append(keyed_ndv, t_ndv, ndv_cols=["k"])

        def meta_ndv():
            return snapshot_ndv(spark, t_ndv, "k")

        def scan_ndv():
            return (
                read_snapshot(spark, t_ndv)
                .agg(F.countDistinct("k"))
                .collect()[0][0]
            )

        est = meta_ndv()
        assert abs(est - true_ndv) / true_ndv < 0.05
        nv = timed("ndv_sketch_union", meta_ndv, out)
        ns = timed("ndv_exact_full_scan", scan_ndv, out)
        print(json.dumps({
            "probe": "ndv_sidecars",
            "estimate": est,
            "true": true_ndv,
            "rel_err": round(abs(est - true_ndv) / true_ndv, 4),
            "scan_over_sketch": round(ns / nv, 1) if nv else None,
        }), flush=True)

        # bloom point-lookup: a hash-distributed key prunes NOTHING by
        # min/max (every file spans the hex space); the per-file SBBF
        # sidecar plans ~1 file.  Twin tables, same data, ± bloom_cols.
        t_bl, t_nobl = d + "/t_bloom", d + "/t_nobloom"
        keyed = (
            spark.range(n // 10)
            .select(
                F.col("id"),
                F.sha2(F.col("id").cast("string"), 256).alias("doc_id"),
                (F.col("id") % 97).alias("v"),
            )
            .repartition(20)
        )
        snapshot_append(keyed, t_bl, bloom_cols=["doc_id"])
        snapshot_append(keyed, t_nobl)
        needle_id = (n // 10) // 2  # mid-keyspace, valid for ANY probe n
        needle_row = keyed.filter(F.col("id") == needle_id).collect()[0]
        needle = needle_row["doc_id"]

        files_seen: dict = {}

        def lookup(tbl):
            def go():
                q = read_snapshot_where(spark, tbl, f"doc_id = '{needle}'")
                files_seen[tbl] = len(q.inputFiles())
                assert q.count() == 1
                return files_seen[tbl]
            return go

        lb = timed("point_lookup_bloom", lookup(t_bl), out)
        ln = timed("point_lookup_no_bloom", lookup(t_nobl), out)
        f_bl, f_nobl = files_seen[t_bl], files_seen[t_nobl]
        assert f_bl < f_nobl
        print(json.dumps({
            "probe": "bloom_point_lookup",
            "files_planned_bloom": f_bl,
            "files_planned_no_bloom": f_nobl,
            "no_bloom_over_bloom": round(ln / lb, 2) if lb else None,
        }), flush=True)

        # delete-mode economics: the same one-key takedown as CoW rewrite
        # vs merge-on-read (zero bytes moved) — both answers identical
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            snapshot_clone,
            snapshot_delete_where,
        )

        t_cow, t_lazy = d + "/t_cow", d + "/t_lazy"
        snapshot_clone(spark, t, t_cow)
        snapshot_clone(spark, t, t_lazy)
        pred = f"id = {3 * per + 7}"

        def cow():
            m = snapshot_delete_where(spark, t_cow, pred)
            return m["meta"]["rewritten_files"]

        def lazy():
            m = snapshot_delete_where(spark, t_lazy, pred, lazy=True)
            assert m["meta"]["rewritten_files"] == 0
            return m["meta"]["filtered_files"]

        c1 = timed("delete_one_key_cow", cow, out)
        c2 = timed("delete_one_key_lazy", lazy, out)
        # real equivalence oracle: identical row SETS, not just counts
        a_df, b_df = read_snapshot(spark, t_cow), read_snapshot(spark, t_lazy)
        assert a_df.exceptAll(b_df).limit(1).count() == 0
        assert b_df.exceptAll(a_df).limit(1).count() == 0
        print(json.dumps({"probe": "lazy_delete_speedup",
                          "cow_over_lazy": round(c1 / c2, 2) if c2 else None}),
              flush=True)

        # stacked-takedown read economics: N pending predicate-lazy
        # entries RE-EVALUATE their predicates on every covered read
        # (cost ∝ N × predicate cost × rows), N DV entries read as ONE
        # unioned anti-join (cost flat in both N and predicate cost).
        # Takedown predicates at scale are hash/identifier matches, not
        # cheap arithmetic — use the sha2-match shape, 8 stacked,
        # answers identical.
        t_stk_lazy, t_stk_dv = d + "/t_stk_lazy", d + "/t_stk_dv"
        snapshot_clone(spark, t, t_stk_lazy)
        snapshot_clone(spark, t, t_stk_dv)
        for k in range(8):
            pred_k = (
                f"substr(sha2(CAST(id AS STRING), 256), 1, 2) = '{k:02x}'"
            )
            snapshot_delete_where(spark, t_stk_lazy, pred_k, lazy=True)
            snapshot_delete_where(spark, t_stk_dv, pred_k, lazy="dv")

        def read_stacked(tbl):
            def go():
                return read_snapshot(spark, tbl).agg(F.sum("v")).collect()[0][0]
            return go

        r_lazy = timed("read_8_stacked_predicate_lazy", read_stacked(t_stk_lazy), out)
        r_dv = timed("read_8_stacked_dv", read_stacked(t_stk_dv), out)
        assert read_stacked(t_stk_lazy)() == read_stacked(t_stk_dv)()
        plan = read_snapshot(spark, t_stk_dv)._jdf.queryExecution().executedPlan().toString()
        print(json.dumps({
            "probe": "stacked_takedown_read",
            "n_takedowns": 8,
            "predicate_shape": "sha2-identifier-match",
            "dv_antijoins_in_plan": plan.count("LeftAnti"),
            "lazy_over_dv": round(r_lazy / r_dv, 2) if r_dv else None,
        }), flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_snap_manifest(spark, n: int, out: list) -> None:
    """The 'manifests are O(live files) driver JSON' claim, measured at
    1e4 and 1e5 file entries: manifest write (the real O_EXCL commit
    path), tip resolution (version listing + JSON parse), and stats
    prune for a narrow key range.  File entries are synthetic (nothing
    scans them — these are driver-metadata timings, the exact surface
    the claim is about) but flow through the REAL manifest writer,
    reader, and pruner."""
    import shutil
    import tempfile
    import time as _time

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        _list_versions,
        _prune_files,
        _read_manifest,
        _try_write_manifest,
    )

    d = tempfile.mkdtemp(prefix="snap_manifest_probe_")
    try:
        for n_files in (10_000, 100_000):
            t = f"{d}/t{n_files}"
            rows_per_file = 1000
            manifest = {
                "version": 1, "parent": 0, "ts": _time.time(), "op": "append",
                "schema": "id bigint,v bigint", "table_id": "probe",
                "files": [
                    f"{t}/data/part-{i:06d}.parquet" for i in range(n_files)
                ],
                "stats": {
                    f"{t}/data/part-{i:06d}.parquet": {
                        "id": [i * rows_per_file, (i + 1) * rows_per_file - 1]
                    }
                    for i in range(n_files)
                },
                "stats_cols": {"id": "id"},
                "txn": {}, "meta": {},
            }

            def write(m=manifest, tt=t):
                assert _try_write_manifest(spark, tt, 1, m)
                return n_files

            timed(f"manifest_write_{n_files}_files", write, out)

            def resolve(tt=t):
                v = _list_versions(spark, tt)[-1]
                return len(_read_manifest(spark, tt, v)["files"])

            timed(f"tip_resolve_{n_files}_files", resolve, out)

            lo = (n_files // 2) * rows_per_file
            m_loaded = _read_manifest(spark, t, 1)

            def prune(m=m_loaded, lo=lo):
                kept = _prune_files(m, {"id": (lo, lo + 5 * rows_per_file)})
                assert len(kept) == 6, len(kept)
                return len(kept)

            timed(f"stats_prune_{n_files}_files", prune, out)
            import os as _os

            size = _os.path.getsize(f"{t}/_manifests/v{1:010d}.json")
            print(json.dumps({"probe": f"manifest_bytes_{n_files}_files",
                              "bytes": size}), flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_heavy(spark, n: int, out: list) -> None:
    """Heavy hitters vs plain GROUP BY/HAVING at high key cardinality:
    n rows over ~n/2 distinct keys with 10 planted hitters at ~1% each.
    The claim is shuffle VOLUME (candidates ≤ m×P vs one group per
    distinct key), measured alongside wall-clock (local[32] over warm
    columnar input may hide the win — the shuffle numbers don't)."""
    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.operators.heavy import heavy_hitters

    th = 0.005
    hot = (F.col("id") % 100 < 10)  # 10% of rows spread over 10 hot keys
    df = (
        spark.range(n)
        .select(
            F.when(hot, F.concat(F.lit("hot"), (F.col("id") % 10)))
            .otherwise(
                F.concat(F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(n // 2)))
            )
            .alias("k")
        )
        .localCheckpoint(eager=True)
    )

    def sketch():
        rows = heavy_hitters(df, ["k"], th).collect()
        assert len(rows) == 10, len(rows)
        return len(rows)

    def sketch_jvm():
        rows = heavy_hitters(df, ["k"], th, candidates="freqItems").collect()
        assert len(rows) == 10, len(rows)
        return len(rows)

    def plain():
        total = df.count()
        rows = (
            df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= th * total)
            .collect()
        )
        assert len(rows) == 10, len(rows)
        return len(rows)

    a = timed("heavy_hitters_mg_recount", sketch, out)
    j = timed("heavy_hitters_freqitems_recount", sketch_jvm, out)
    b = timed("plain_groupby_having", plain, out)
    # the structural number: groups crossing the shuffle
    n_distinct = df.select("k").distinct().count()
    import math as _math

    m = _math.ceil(2.0 / th)
    n_parts = df.rdd.getNumPartitions()
    print(json.dumps({
        "probe": "heavy_shuffle_volume",
        "distinct_keys_plain_shuffles": n_distinct,
        "candidate_bound_mg": m * n_parts,
        "wallclock_ratio_plain_over_mg": round(b / a, 2) if a else None,
        "wallclock_ratio_plain_over_freqitems": round(b / j, 2) if j else None,
    }), flush=True)


def probe_pagerank(spark, n: int, out: list) -> None:
    """PageRank power iteration at link-graph scale: n edges over n/10
    vertices (Zipf-ish in-degree via modular hashing, ~1% dangling).
    The measure is per-iteration cost staying flat as iterations stack
    (checkpointed ranks = constant-size plan every round)."""
    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.operators.graph import pagerank

    n_v = n // 10
    edges = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_v)).alias("src"),
            # skewed destinations: popular pages get quadratically more links
            F.pmod(
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_v))
                * F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_v)),
                F.lit(n_v),
            ).alias("dst"),
        )
        # ~1% of vertices dangling: drop every edge sourced at them
        .filter(F.pmod(F.col("src"), F.lit(100)) != 0)
        .localCheckpoint(eager=True)
    )

    def run(iters):
        def f():
            r = pagerank(edges, n_iter=iters)
            row = r.agg(F.sum("rank"), F.count(F.lit(1))).collect()[0]
            return int(row[1])

        return f

    a = timed("pagerank_5_iters", run(5), out)
    b = timed("pagerank_10_iters", run(10), out)
    print(json.dumps({"probe": "per_iter_flatness",
                      "ratio_10v5": round(b / a, 2) if a else None}), flush=True)



def probe_matview(spark, n: int, out: list) -> None:
    """Incremental view refresh vs full recompute: an n-row source gets
    a 1% append; the maintained view should cost ~delta+view, the full
    rebuild ~source."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.operators.incremental import base_aggregate
    from mini_project_204721_data_engineering_spark.operators.matview import refresh_aggregate_view
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
    )

    meas = {"cents": (lambda r: F.round(r["val"] * 100).cast("long"))}

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (F.col("id") % 5000).cast("string").alias("grp"),
            (F.col("id") % 97).cast("double").alias("val"),
        )

    d = tempfile.mkdtemp(prefix="matview_probe_")
    src, view = d + "/src", d + "/view"
    try:
        snapshot_append(rows(0, n), src)
        refresh_aggregate_view(spark, src, view, ["grp"], meas)  # full build
        snapshot_append(rows(n, n + n // 100), src)  # 1% delta

        def incremental():
            m = refresh_aggregate_view(spark, src, view, ["grp"], meas)
            return m["meta"]["src_version"]

        a = timed("incremental_refresh_1pct_delta", incremental, out)

        def full():
            # apples-to-apples: a full REBUILD writes the view too
            v2 = d + "/view_rebuild"
            m = refresh_aggregate_view(spark, src, v2, ["grp"], meas)
            shutil.rmtree(v2, ignore_errors=True)
            return m["meta"]["src_version"]

        b = timed("full_rebuild_same_state", full, out)
        print(json.dumps({"probe": "refresh_speedup",
                          "full_over_incremental": round(b / a, 2) if a else None}),
              flush=True)

        # non-append window: a one-key CoW delete rewrites 1 of ~32
        # source files; the confined refresh must read the delta files,
        # never the source (cost ∝ rewritten files + view size)
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            snapshot_delete_where,
        )

        n_src_files = len(read_snapshot(spark, src).inputFiles())
        snapshot_delete_where(spark, src, f"id = {n // 2}")

        def confined():
            m = refresh_aggregate_view(spark, src, view, ["grp"], meas)
            assert m["meta"]["refresh_mode"] == "delta-confined", m["meta"]
            return m["meta"]["src_files_read"]

        c = timed("confined_refresh_one_file_delete", confined, out)

        def full2():
            v3 = d + "/view_rebuild2"
            m = refresh_aggregate_view(spark, src, v3, ["grp"], meas)
            shutil.rmtree(v3, ignore_errors=True)
            return m["meta"]["src_files_read"]

        b2 = timed("full_rebuild_after_delete", full2, out)
        print(json.dumps({
            "probe": "confined_refresh_speedup",
            "src_files_total": n_src_files,
            "full_over_confined": round(b2 / c, 2) if c else None,
        }), flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)



def probe_snap_big(spark, n: int, out: list) -> None:
    """Metadata-layer flatness at a 2,000-file manifest (task: prove the
    zero/near-zero-job serving ops stay manifest-sized while scans grow
    with the data): 200 commits x 10 files, day-constant per commit,
    stats on (id, day, v-sum), HLL sidecars on user_id.  Each
    metadata-only answer is asserted EQUAL to the warm full scan."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        read_snapshot,
        snapshot_agg,
        snapshot_count,
        snapshot_min_max,
        snapshot_ndv,
        snapshot_plan_info,
        snapshot_append,
    )

    d = tempfile.mkdtemp(prefix="snap_big_")
    t = d + "/t"
    n -= n % 200
    per = n // 200
    try:
        def commits():
            for i in range(200):
                df = (
                    spark.range(i * per, (i + 1) * per)
                    .select(
                        F.col("id"),
                        F.lit(f"2024-01-01").cast("date")
                        + F.lit(i).cast("int"),
                        (F.col("id") % 97).cast("double").alias("v"),
                        (F.col("id") % 10007).alias("user_id"),
                    )
                    .toDF("id", "day", "v", "user_id")
                    .repartitionByRange(10, "id")
                )
                snapshot_append(
                    df, t, stats_cols=["id", "day", "v"],
                    ndv_cols=["user_id"],
                )
            return 200

        timed("snap_big_200_commits_2000_files", commits, out)
        full = read_snapshot(spark, t)
        warm = full.count()  # warm the scan path
        assert warm == n

        def scan_count():
            return read_snapshot(spark, t).count()

        def meta_count():
            return snapshot_count(spark, t)

        a = timed("full_scan_count_2000_files", scan_count, out)
        b = timed("metadata_count_2000_files", meta_count, out)
        assert snapshot_count(spark, t) == n

        def scan_rollup():
            return (
                read_snapshot(spark, t)
                .groupBy("day")
                .agg(F.count(F.lit(1)).alias("c"), F.sum("v").alias("s"))
                .count()
            )

        def meta_rollup():
            return len(
                snapshot_agg(
                    spark, t, {"c": "count(*)", "s": "sum(v)"}, group_by="day"
                )
            )

        c = timed("full_scan_rollup_200_days", scan_rollup, out)
        dsec = timed("metadata_rollup_200_days", meta_rollup, out)
        assert meta_rollup() == 200

        def meta_minmax():
            return snapshot_min_max(spark, t, "id")

        timed("metadata_min_max", lambda: (meta_minmax(), 1)[1], out)
        assert meta_minmax() == (0, n - 1)

        def grouped_ndv():
            return len(
                snapshot_agg(
                    spark, t, {"u": "approx_ndv(user_id)"}, group_by="day"
                )
            )

        timed("sidecar_grouped_ndv_200_days", grouped_ndv, out)

        def table_ndv():
            return snapshot_ndv(spark, t, "user_id")

        est = table_ndv()
        true_ndv = min(n, 10007)
        assert abs(est - true_ndv) / true_ndv < 0.05, (est, true_ndv)
        timed("sidecar_table_ndv", table_ndv, out)

        info = snapshot_plan_info(spark, t, predicate=f"id < {per}")
        print(json.dumps({
            "probe": "plan_info_selectivity",
            "files_total": info["files_total"],
            "files_planned": info["files_planned"],
            "count_speedup": round(a / b, 2) if b else None,
            "rollup_speedup": round(c / dsec, 2) if dsec else None,
        }), flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_snap_contention(spark, n: int, out: list) -> None:
    """Optimistic-concurrency THROUGHPUT under contention: W concurrent
    writers (threads; the commit claim is O_EXCL, not a JVM lock — the
    cross-process pin is a separate pytest) doing mixed append/CoW-delete
    on ONE table.  Reports commits/sec at 1/2/4/8 writers and asserts
    zero aborts-to-exhaustion (liveness)."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        _list_versions,
        read_snapshot,
        snapshot_append,
        snapshot_delete_where,
    )

    per_writer = 6
    for writers in (1, 2, 4, 8):
        d = tempfile.mkdtemp(prefix=f"snap_cont_{writers}_")
        t = d + "/t"
        snapshot_append(
            spark.range(n).select(
                F.col("id"), (F.col("id") % 101).alias("k")
            ).coalesce(4),
            t,
        )
        errors: list = []

        def work(w):
            try:
                for i in range(per_writer):
                    if i % 3 == 2:
                        # CoW rewrites are conservative-serializable:
                        # ANY concurrent commit aborts them and the
                        # CALLER retries the whole read-rewrite-commit
                        # (the documented contract) — liveness means
                        # the retry loop converges, not that the first
                        # attempt wins
                        import random as _rnd
                        import time as _time

                        for attempt in range(50):
                            try:
                                snapshot_delete_where(
                                    spark, t,
                                    f"id % 1009 = {w * per_writer + i}",
                                    lazy=False,
                                )
                                break
                            except RuntimeError:
                                # full-jitter backoff before redoing the
                                # read-rewrite-commit (the rewrite is a
                                # Spark job — colliding redos in
                                # lockstep waste whole cluster passes)
                                _time.sleep(_rnd.uniform(0, min(0.05 * (2 ** min(attempt, 4)), 0.5)))
                                continue
                        else:
                            raise RuntimeError("delete never converged")
                    else:
                        snapshot_append(
                            spark.range(2000).select(
                                (F.col("id") + 10_000_000 * (w + 1) + i)
                                .alias("id"),
                                (F.col("id") % 101).alias("k"),
                            ).coalesce(1),
                            t,
                        )
            except Exception as e:  # exhaustion = liveness failure
                errors.append(repr(e))

        def run():
            with ThreadPoolExecutor(max_workers=writers) as ex:
                list(ex.map(work, range(writers)))
            return writers * per_writer

        sec = timed(f"contention_{writers}_writers_{writers * per_writer}_commits", run, out)
        versions = _list_versions(spark, t)
        assert not errors, errors[:2]
        assert len(versions) == 1 + writers * per_writer, (
            len(versions), writers)
        read_snapshot(spark, t).count()  # table still readable
        print(json.dumps({
            "probe": f"contention_{writers}_writers_rate",
            "commits_per_sec": round(writers * per_writer / sec, 2) if sec else None,
            "aborts": len(errors),
        }), flush=True)
        shutil.rmtree(d, ignore_errors=True)


def probe_snap_maintenance(spark, n: int, out: list) -> None:
    """Maintenance-vs-writer contention (r15 judge task): a
    catalog_maintain loop (compact write specs through multi_table_txn)
    racing W appenders on one enrolled table.  Reports append
    commits/sec SOLO vs UNDER MAINTENANCE, the number of maintenance
    transactions that landed, and asserts the safety clauses: zero
    retry exhaustion, no lost updates (row multiset exact), and a
    catalog_changes window spanning the interleaved compacts reading
    as the pure append delta."""
    import shutil
    import tempfile
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_changes,
        catalog_history,
        catalog_init,
        catalog_maintain,
        catalog_read,
        multi_table_txn,
    )

    writers, per = 4, 6
    rows_per = max(1, n // (writers * per))
    for with_maint in (False, True):
        d = tempfile.mkdtemp(prefix="snap_maint_")
        cat = d + "/cat"
        catalog_init(spark, cat, {"facts": d + "/facts"})
        for j in range(6):  # fragmented seed: first sweep has work
            multi_table_txn(
                spark, cat,
                {"facts": {"op": "append",
                           "df": spark.range(100 * j, 100 * (j + 1))
                           .coalesce(1)}},
            )
        cursor = catalog_history(spark, cat)[-1]["version"]
        errors: list = []
        maint_txns: list = []
        done = threading.Event()

        def appender(w):
            try:
                for i in range(per):
                    df = spark.range(rows_per).select(
                        (F.col("id") + 10_000_000 * (w + 1) + rows_per * i)
                        .alias("id")
                    ).coalesce(1)
                    multi_table_txn(
                        spark, cat, {"facts": {"op": "append", "df": df}}
                    )
            except Exception as e:
                errors.append(repr(e))

        def maintainer():
            try:
                while True:
                    res = catalog_maintain(
                        spark, cat, target_file_bytes=512 * 1024
                    )
                    maint_txns.extend(res["executed"])
                    if done.is_set():
                        break
                    _time.sleep(0.2)
            except Exception as e:
                errors.append(repr(e))

        def run():
            with ThreadPoolExecutor(max_workers=writers + 1) as ex:
                futs = [ex.submit(appender, w) for w in range(writers)]
                m = ex.submit(maintainer) if with_maint else None
                for f in futs:
                    f.result()
                done.set()
                if m is not None:
                    m.result()
            return writers * per

        tag = "under_maintenance" if with_maint else "solo"
        sec = timed(f"maint_appends_{tag}_{writers}x{per}", run, out)
        assert not errors, errors[:2]
        count = catalog_read(spark, cat, "facts").count()
        assert count == 600 + writers * per * rows_per, (count, tag)
        if with_maint:
            assert maint_txns, "maintenance never landed — vacuous probe"
            delta = catalog_changes(spark, cat, cursor)["facts"]
            assert delta.count() == writers * per * rows_per
        print(json.dumps({
            "probe": f"maint_{tag}_rate",
            "append_commits_per_sec": round(writers * per / sec, 2) if sec else None,
            "maintenance_txns": len(maint_txns),
        }), flush=True)
        shutil.rmtree(d, ignore_errors=True)


def probe_spill(spark, n: int, out: list) -> None:
    """Spill honesty: the SAME larger-than-heap aggregate+sort workload
    in (a) this comfortable session and (b) a CHILD driver capped at
    700 MB heap — the child must complete correctly (external
    spill paths), and the recorded ratio is the degradation factor.
    ~n rows x ~120-byte synthetic payload >> 700 MB at the default n."""
    import os
    import subprocess
    import sys as _sys
    import textwrap

    from pyspark.sql import functions as F

    def workload(s):
        df = s.range(n).select(
            F.col("id"),
            (F.col("id") % 1_000_003).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        agg = (
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"), F.max("pad").alias("mp"))
            .orderBy(F.desc("c"), F.col("k"))
        )
        row = agg.limit(1).collect()[0]
        return int(row["c"])

    got_box: list = []

    def run_once():
        got_box.append(workload(spark))
        return n

    want = timed("spill_workload_comfortable_128g", run_once, out)
    expect = got_box[0]

    child_code = textwrap.dedent(f"""
        import json, time
        from pyspark.sql import SparkSession, functions as F
        s = (SparkSession.builder.master("local[4]")
             .config("spark.driver.memory", "700m")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .getOrCreate())
        t0 = time.time()
        df = s.range({n}).select(
            F.col("id"), (F.col("id") % 1_000_003).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"))
        agg = (df.groupBy("k")
               .agg(F.count(F.lit(1)).alias("c"), F.max("pad").alias("mp"))
               .orderBy(F.desc("c"), F.col("k")))
        row = agg.limit(1).collect()[0]
        print(json.dumps({{"sec": round(time.time() - t0, 3),
                           "c": int(row["c"])}}))
        s.stop()
    """)
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    res = subprocess.run(
        [_sys.executable, "-c", child_code], env=env,
        capture_output=True, text=True, timeout=3600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    child = json.loads(res.stdout.strip().splitlines()[-1])
    out.append({"probe": "spill_workload_tiny_700m_child",
                "sec": child["sec"], "rows": n})
    print(json.dumps(out[-1]), flush=True)
    assert child["c"] == expect, (child["c"], expect)
    print(json.dumps({
        "probe": "spill_degradation",
        "comfortable_sec": want,
        "tiny_heap_sec": child["sec"],
        "factor": round(child["sec"] / want, 2) if want else None,
    }), flush=True)


if __name__ == "__main__":
    main()
