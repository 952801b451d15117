"""All-pairs sparse cosine similarity join — EXACT lexical near-dup /
similarity pairs over token tf vectors, at scale.

The lexical analogue of the embedding-side SRP-LSH dedup
(:mod:`mini_project_204721_data_engineering_spark.llm.dedup`): find every document pair whose
L2-normalized term-frequency cosine is ≥ a threshold, with NO
approximation.  The scale mechanism is the prefix-filtered inverted
index of Bayardo, Ma & Srikant, *Scaling Up All Pairs Similarity
Search* (WWW 2007): a document only needs to be INDEXED under its
rarest terms, because pairs that overlap only on the remaining
low-mass suffix provably cannot reach the threshold.

Completeness theorem (why prefix filtering drops no pair).  Fix a
global term order (document frequency ascending, term as tie-break)
and sort every document's terms by it.  For normalized vector ``x``
let ``suffix_norm(x, i) = ‖x[i:]‖`` and index term ``i`` of ``x`` iff
``suffix_norm(x, i) ≥ t``.  Suppose ``cos(x, y) ≥ t`` but NO shared
term is indexed by either side.  Let ``i`` (resp. ``j``) be the first
shared term's position in ``x`` (resp. ``y``).  All shared mass lives
in ``x[i:]`` and ``y[j:]``, so by Cauchy-Schwarz
``cos(x, y) ≤ ‖x[i:]‖·‖y[j:]‖ < t·t ≤ t`` (both suffix norms < t
since unindexed, and t ≤ 1) — contradiction.  Hence every qualifying
pair shares ≥ 1 term indexed by at least one side, and joining
[prefix entries] × [all entries] on term generates a complete
candidate set.  Candidates are then verified EXACTLY over all shared
terms, so the output is identical to the brute inverted-index join
(pinned in tests/test_llm.py).

Scale shape: tokenize → (doc, term) tf and the per-doc norm are
map-side-combinable aggregates plus one doc-partitioned window; the
document-frequency ordering joins on ``term`` (vocab-sized table —
NOT broadcast, web-scale vocabularies exceed broadcast limits);
candidate generation is a term-keyed equi-join whose cost is
``Σ_t |prefix postings(t)| · |postings(t)|`` — rare terms carry the
index, and a common term enters a document's prefix only when that
document's remaining mass is concentrated in it; a positional
suffix-product filter then prunes join rows before the distinct, and
the verify stage is two id-keyed joins over packed map vectors, O(L)
per candidate.  Nothing is all-pairs.

Measured posture (tools/scale_probe.py sparsesim, SCALE.md): the
plain inverted join ("brute", ``prefix_filter=False``) carries
``Σ_t |postings(t)|²`` join rows — quadratic in hot posting lists —
yet WINS below a ~40k-doc crossover at the probe's density, because
Spark shuffles narrow join rows faster than the prefix path's
distinct+verify overhead; beyond the crossover the prefix path's
flatter growth (5.2× vs 7.6× per 3× docs, join volume 14× lower)
takes over, which is why it is the default.  The reference has no
similarity operator (its nearest analogue is pandas
``drop_duplicates``, ``backend/app/utils.py``); this is the
engine-native extension SURVEY §2.8 calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mini_project_204721_data_engineering_spark.llm.text import tokens

__all__ = ["doc_tf_vectors", "sparse_cosine_join"]


def _weighted_tf(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weighting: str,
) -> DataFrame:
    """Un-normalized weighted tf rows ``(id, term, w, __df)`` with the
    term's document frequency ATTACHED (r16; guide §2.3/§2.4): ``__df``
    is aggregated once and serves BOTH consumers — the smoothed-idf
    weight (``weighting="tfidf"``) and the prefix-filter's
    rarest-term-first ordering — where the r15 shape aggregated the
    vocabulary twice (once inside :func:`doc_tf_vectors`, once inside
    :func:`sparse_cosine_join`) and paid the vocab join twice."""
    if weighting not in ("tf", "tfidf"):
        raise ValueError(f"weighting must be 'tf' or 'tfidf', got {weighting!r}")
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    wtf = tf.join(dfreq, "term")
    if weighting == "tfidf":
        n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
        wtf = wtf.crossJoin(F.broadcast(n)).select(
            "id",
            "term",
            "__df",
            (
                F.col("w")
                * (
                    F.log(
                        (F.col("__n") + 1.0)
                        / (F.col("__df").cast("double") + 1.0)
                    )
                    + 1.0
                )
            ).alias("w"),
        )
    return wtf


def doc_tf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weighting: str = "tf",
) -> DataFrame:
    """L2-normalized sparse token vectors: ``(id, term, w)`` with
    ``Σ w² = 1`` per document.  Empty documents produce no rows (a
    zero vector has no cosine).  ``weighting="tf"`` uses raw term
    frequency; ``"tfidf"`` scales by the same smoothed idf as
    :func:`~mini_project_204721_data_engineering_spark.llm.quality.tfidf_topk`
    (``ln((N+1)/(df+1)) + 1``) — the production setting for topical
    similarity, and the one that starves stopwords of mass so the
    prefix index sheds their posting lists.  One (id, term) shuffle
    for the tf count, an id-partitioned window for the norm; tfidf
    adds one vocab-sized ``term`` join and a broadcast 1-row N."""
    if weighting not in ("tf", "tfidf"):
        raise ValueError(f"weighting must be 'tf' or 'tfidf', got {weighting!r}")
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    if weighting == "tfidf":
        dfreq = tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("__idf_df")
        )
        n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
        tf = (
            tf.join(dfreq, "term")
            .crossJoin(F.broadcast(n))
            .select(
                "id",
                "term",
                (
                    F.col("w")
                    * (
                        F.log(
                            (F.col("__n") + 1.0) / (F.col("__idf_df") + 1.0)
                        )
                        + 1.0
                    )
                ).alias("w"),
            )
        )
    nw = Window.partitionBy("id")
    return tf.withColumn(
        "w", F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(nw))
    )


def _dot(v1_alias: str, v2_alias: str) -> Column:
    return F.sum(F.col(f"{v1_alias}") * F.col(f"{v2_alias}")).alias("sim")


def sparse_cosine_join(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_filter: bool = True,
    round_dp: int = 4,
    persist_vectors: bool = False,
    weighting: str = "tf",
) -> DataFrame:
    """Every document pair with tf-vector cosine ≥ ``threshold`` —
    exact, never all-pairs.  Returns ``(id_1, id_2, cos_sim)`` with
    ``id_1 < id_2`` and ``cos_sim`` portably rounded to ``round_dp``
    (the threshold compares against the ROUNDED value so distributed
    partial-sum order can never flip a boundary pair between engines).

    ``prefix_filter=True`` is the production path (see the module
    docstring's completeness theorem); ``False`` runs the plain
    inverted-index join — complete for any threshold > 0 because a
    qualifying pair must share a term — used as the in-repo oracle.
    ``persist_vectors=True`` materializes the flagged vectors ONCE —
    ``localCheckpoint`` on the prefix path (truncating the lineage so
    the index/probe/verify consumers read the result instead of
    re-planning the whole tokenize+weight+window build per reference —
    guide §3.3), plain MEMORY_AND_DISK persist on the brute path — the
    mandatory setting at corpus scale (three full text scans
    otherwise), same contract as ``tfidf_topk(persist_tf=)``.  The
    materialized table is tf-table-sized.
    ``weighting`` selects raw-tf or smoothed-tfidf vectors (see
    :func:`doc_tf_vectors`); the completeness theorem is
    weighting-agnostic — it only needs L2-normalized vectors."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    if prefix_filter:
        # r16 one-pass vector build (guide §2.3/§2.4): the r15 shape
        # normalized in one window (doc_tf_vectors), re-aggregated the
        # vocabulary for the prefix ordering, joined it back, and ran a
        # SECOND id-keyed window for the suffix norms — and, because
        # `flagged` is referenced by both join sides plus the packed
        # verify vectors, Spark re-planned that whole chain per
        # reference (37 Exchanges / 18 scans in the shipped tfidf
        # query).  Now: ONE vocab aggregate feeds idf and ordering
        # (_weighted_tf), the full norm and the suffix norm come out of
        # ONE id-partitioned window pass (same exchange, same sort),
        # and `persist_vectors=True` localCheckpoints the flagged
        # vectors so every downstream consumer reads the materialized
        # result instead of replaying the build — the guide §3.3
        # lineage-truncation cure for multi-reference plans.
        wtf = _weighted_tf(docs, id_col, text_col, weighting)
        if persist_vectors:
            # Explicit fixed-width hash repartition by id IN PLACE of the
            # window's own exchange (the window needs hash(id), so this
            # adds no shuffle — it replaces one).  Rationale, measured
            # the hard way: AQE sizes the window exchange by its INPUT
            # (a few MB at demo scale → 1 partition), but this exchange
            # feeds a checkpoint whose frozen layout outlives AQE's
            # local view — the whole vector build, the checkpoint write
            # and every broadcast build downstream ran single-task on
            # the critical path (+6 s wall at sf0.1 while executor time
            # was EQUAL to r15's).  A user repartition with explicit N
            # is exempt from AQE coalescing; N = spark.sql.shuffle.
            # partitions, the operator-owned scale knob (== cores
            # locally, the cluster-sized value in production), exactly
            # the width this exchange would have without coalescing.
            # Id-partitioning also keeps the candidate join's output
            # co-located by the probe id, so the distinct's PARTIAL
            # aggregate collapses a pair's duplicate rows to at most 2
            # (one per orientation) before the exchange — measured
            # 23.2M rows shuffled for 11.8M pairs at sf0.1, vs 52.7M
            # under round-robin layout (§2.3).
            n_shuffle = int(
                docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
            wtf = wtf.repartition(n_shuffle, "id")
        ordw = Window.partitionBy("id").orderBy(
            F.col("__df").asc(), F.col("term").asc()
        )
        full = ordw.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        suffix = ordw.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        flagged = (
            wtf.withColumn(
                "w",
                F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(full)),
            )
            .withColumn(
                "__suffix_norm",
                F.sqrt(F.sum(F.col("w") * F.col("w")).over(suffix)),
            )
            .select("id", "term", "w", "__suffix_norm")
        )
        if persist_vectors:
            # Materialize ONCE and truncate lineage (guide §3.3): every
            # downstream consumer (index side, probe side, packed verify
            # vectors ×2) reads this result instead of replaying the
            # tokenize+weight+window build.  The explicit repartition
            # above fixed the checkpoint's width and id-layout.
            flagged = flagged.localCheckpoint(eager=True)
        index_side = flagged.filter(
            F.col("__suffix_norm") >= F.lit(float(threshold))
        ).select(
            F.col("id").alias("__ia"), "term", F.col("__suffix_norm").alias("__sa")
        )
        probe_side = flagged.select(
            F.col("id").alias("__ib"), "term", F.col("__suffix_norm").alias("__sb")
        )
        # positional (suffix-product) filter, applied per JOIN ROW before
        # the distinct: a row for shared term t survives only if
        # suffix_norm_x(t) · suffix_norm_y(t) ≥ threshold.  Sound: for a
        # qualifying pair let t* be its EARLIEST shared term in the
        # canonical order — all shared mass lies in both suffixes from
        # t*, so t ≤ cos(x,y) ≤ sn_x(t*)·sn_y(t*); with both factors ≤ 1
        # each is ≥ t, hence t* is indexed on BOTH sides and its row
        # passes this filter.  Junk candidates that share only a
        # mid-order term (both suffix norms already decayed) die here
        # instead of flooding the distinct + verify stages — measured
        # 2.5× fewer verified candidates (9.4M → 3.8M) on the
        # sparsesim probe's 10k-doc Zipf corpus.
        cand = (
            index_side.join(probe_side, "term")
            .filter(
                (F.col("__ia") != F.col("__ib"))
                & (F.col("__sa") * F.col("__sb") >= F.lit(float(threshold)))
            )
            .select(
                F.least("__ia", "__ib").alias("id_1"),
                F.greatest("__ia", "__ib").alias("id_2"),
            )
            .distinct()
        )
        # verify with PACKED vectors: one map<term,w> row per doc, two
        # id-keyed joins, dot product as a codegen'd aggregate over the
        # map entries — |candidates| rows through the shuffle, never the
        # |candidates| × doc-length exploded 3-way-join form (measured
        # 1.6× slower end-to-end at the 30k-doc sparsesim probe)
        packed = flagged.groupBy("id").agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "w"))
            ).alias("__m")
        )
        sims = (
            cand.join(
                packed.select(F.col("id").alias("id_1"), F.col("__m").alias("__m1")),
                "id_1",
            )
            .join(
                packed.select(F.col("id").alias("id_2"), F.col("__m").alias("__m2")),
                "id_2",
            )
            .select(
                "id_1",
                "id_2",
                # hash-merge dot: map_zip_with is O(L1+L2) per pair;
                # a per-key element_at lookup loop is O(L1·L2) and
                # measured 2.6× slower end-to-end (67.1 s → 25.9 s,
                # 10k-doc sparsesim probe)
                F.expr(
                    "aggregate(map_values(map_zip_with(__m1, __m2, "
                    "(k, a, b) -> coalesce(a, 0D) * coalesce(b, 0D))), "
                    "0D, (acc, v) -> acc + v)"
                ).alias("__sim"),
            )
        )
    else:
        vec = doc_tf_vectors(docs, id_col, text_col, weighting=weighting)
        if persist_vectors:
            from pyspark import StorageLevel

            vec = vec.persist(StorageLevel.MEMORY_AND_DISK)
        v1 = vec.select(F.col("id").alias("id_1"), "term", F.col("w").alias("__w1"))
        v2 = vec.select(F.col("id").alias("id_2"), "term", F.col("w").alias("__w2"))
        sims = (
            v1.join(v2, "term")
            .filter(F.col("id_1") < F.col("id_2"))
            .groupBy("id_1", "id_2")
            .agg(F.sum(F.col("__w1") * F.col("__w2")).alias("__sim"))
        )

    from mini_project_204721_data_engineering_spark.functions.parity import portable_round

    return (
        sims.withColumn("cos_sim", portable_round(F.col("__sim"), round_dp))
        .filter(F.col("cos_sim") >= F.lit(float(threshold)))
        .select("id_1", "id_2", "cos_sim")
    )
