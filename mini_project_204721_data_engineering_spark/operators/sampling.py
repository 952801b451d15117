"""Deterministic hash-based sampling — the reproducible way to subsample
or mix a 100 TB corpus.

``df.sample()`` draws from a per-partition RNG: results change with
partitioning, task retries, and cluster size, and no oracle can mirror
them.  Hash sampling decides per ROW from a content key —
``md5(salt | key) < threshold`` — so it is:

- reproducible: same rows kept on any cluster layout, any rerun, any
  engine (the DuckDB oracle mirrors the expression verbatim);
- shuffle-free: a pure map-stage filter that composes with pushdown;
- stratifiable: per-stratum thresholds give training-data mixture
  weights (the "sample each source at its own rate" step of corpus
  assembly).

The threshold compares the first 4 hex chars of the md5 (16 bits of
resolution, ±1.5e-5 of rate): lowercase fixed-width hex compares
lexicographically == numerically in both Spark and DuckDB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_sample_predicate",
    "hash_sample",
    "stratified_hash_sample",
    "assign_split",
    "exemplars_per_group",
    "rates_for_token_budget",
    "hash_topk_sample",
    "weighted_sample",
    "weighted_sample_threshold",
    "epoch_order",
    "alpha_mix_rates",
]


def _threshold_hex(rate: float) -> str:
    """4-hex-digit keep threshold for a rate in [0, 1)."""
    return format(max(0, min(65535, int(rate * 65536))), "04x")


def hash_sample_predicate(key: Column, rate: float, salt: str = "sample") -> Column:
    """Keep-predicate: ``substr(md5(salt|key), 1, 4) < hex(rate·2^16)``.

    ``rate >= 1`` short-circuits to TRUE (a 4-char string can't compare
    below the 5-char threshold lexicographically, so it is special-cased
    rather than encoded).

    NULL keys: the hash of a null key is null, so the predicate is null
    and the row is dropped at any rate < 1 (identically in Spark and the
    DuckDB oracle — ``concat``/``||`` propagate NULL in both).  Sample on
    a non-null key, or ``coalesce`` upstream if null keys must be kept."""
    if rate >= 1.0:
        return F.lit(True)
    return (
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 4)
        < F.lit(_threshold_hex(rate))
    )


def hash_sample(
    df: DataFrame, key: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Uniform deterministic sample at ``rate`` keyed on column ``key``."""
    return df.filter(hash_sample_predicate(F.col(key), rate, salt))


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive.

    ``rates`` maps stratum values (of column ``strata``) to keep rates;
    unlisted strata use ``default_rate``.  Decisions hash only ``key``,
    so changing one stratum's rate monotonically grows/shrinks exactly
    that stratum's kept set (nested samples — rerunning at a higher rate
    keeps a superset)."""
    default = hash_sample_predicate(F.col(key), default_rate, salt)
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata) == F.lit(value)
        branch = hash_sample_predicate(F.col(key), rate, salt)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return df.filter(default if expr is None else expr.otherwise(default))


def assign_split(
    df: DataFrame,
    key: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: a ``split`` column from
    consecutive md5-threshold ranges over the same 16-bit hash as
    :func:`hash_sample_predicate`.

    Every row lands in exactly one split (the last split absorbs the
    residual hash range, so weights that sum to 1 cover everything), the
    assignment is stable under reruns/repartitioning, and — because the
    hash is keyed, not row-ordered — adding new rows never moves old
    rows between splits (no leakage of yesterday's train docs into
    tomorrow's test set)."""
    h = F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col(key).cast("string"))), 1, 4)
    expr = None
    cum = 0.0
    for name, weight in list(splits)[:-1]:
        cum += weight
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = list(splits)[-1][0]
    return df.withColumn(
        "split", F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    )


def exemplars_per_group(
    df: DataFrame,
    group_col: str,
    key: str,
    k: int = 5,
    salt: str = "exemplar",
) -> DataFrame:
    """Deterministic k exemplars per group: rank rows inside each group
    by the same keyed md5 hash the samplers use and keep the k smallest
    — "show me k random-but-reproducible rows per source", the
    inspection/QA primitive of a corpus pipeline.

    Unlike ``ORDER BY rand() LIMIT k`` per group, the pick is stable
    under reruns, repartitioning, and engine (the DuckDB oracle mirrors
    it verbatim), and adding rows to one group never changes another
    group's exemplars.  One keyed window; partial top-k per partition
    keeps the sort shallow at scale.  Adds ``exemplar_rank`` (1..k)."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("exemplar_rank", F.row_number().over(w))
        .filter(F.col("exemplar_rank") <= k)
    )


def rates_for_token_budget(
    df: DataFrame,
    strata: str,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    cap: float = 1.0,
) -> dict[str, float]:
    """Turn per-source TOKEN budgets into the keep-rates
    :func:`stratified_hash_sample` consumes — the "mix to N tokens per
    source" step of training-mix assembly (budgets are how mixes are
    actually specified; rates are an implementation detail).

    One aggregate over the corpus computes per-stratum token totals
    (map-side combinable; the result is strata-sized, driver-safe by
    contract); each rate is ``min(cap, budget / available)``.  Strata
    absent from ``budgets`` get no entry — pair with ``default_rate``
    at the sampler.  Deterministic: same corpus + budgets → same rates
    → (hash sampling) same kept rows.  The realized token count is
    rate·available in expectation with hash-uniform deviation
    (~1/√docs); budgets are targets, not exact quotas — exact packing
    would need a corpus-ordered prefix sum (a global sort) for a
    guarantee training mixes don't actually need."""
    totals = {
        r["__s"]: r["__t"]
        for r in df.groupBy(F.col(strata).alias("__s"))
        .agg(F.sum(token_col).alias("__t"))
        .collect()
        if r["__s"] in budgets and r["__t"]
    }
    return {
        s: min(cap, float(budgets[s]) / float(totals[s]))
        for s in budgets
        if totals.get(s)
    }


def alpha_mix_rates(
    counts: dict[str, int],
    alpha: float = 0.5,
    budget_rows: int = 0,
    cap: float = 1.0,
) -> dict[str, float]:
    """Temperature-weighted source mixing — the standard multi-source
    LLM recipe (exponentiated sampling, e.g. the α≈0.3 of mBERT/XLM-R
    and the α≈0.7 mixes of later corpora): target share of source
    ``s`` ∝ ``n_s^α``, so α=1 keeps natural proportions, α=0 equalizes
    sources, and 0<α<1 up-samples the tail without drowning the head.
    Returns keep-rates for :func:`stratified_hash_sample`:
    ``rate_s = min(cap, budget · (w_s / Σw) / n_s)``.

    Pure driver-side arithmetic over a strata-sized counts dict (get it
    from one map-side-combining groupBy — same contract as
    :func:`rates_for_token_budget`).  Capped sources keep everything
    they have; the budget shortfall is NOT redistributed (document the
    realized mix instead — redistribution makes rates depend on each
    other and breaks the nested-sample property).  Deterministic: the
    weight sum runs over sorted source names so the same counts always
    produce bit-identical rates (and the DuckDB oracle mirrors the
    whole derivation in SQL)."""
    w = {s: float(n) ** alpha for s, n in counts.items() if n}
    tot = sum(w[s] for s in sorted(w))
    return {
        s: min(cap, budget_rows * (w[s] / tot) / counts[s]) for s in sorted(w)
    }


def hash_topk_sample(
    df: DataFrame, key: str, k: int, salt: str = "sample"
) -> DataFrame:
    """EXACTLY-k deterministic sample: the k rows with the smallest
    ``md5(salt|key)`` — rate-based sampling sized ±√n around its
    expectation, and some jobs need a fixed budget ("pick exactly 10k
    docs for human eval").  Hash order is uniform and layout-independent,
    so the picked set is stable across clusters/reruns and NESTED in k
    (k+1 adds one row, never reshuffles the rest).  Plans as a
    distributed top-k (TakeOrderedAndProject — per-partition heaps, no
    global sort materialization); k is driver-bounded by contract.
    Ties (md5 collisions) break on the key itself, so the result is
    total-ordered even then."""
    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key).cast("string")))
    return (
        df.withColumn("__h", h)
        .orderBy(F.col("__h").asc(), F.col(key).asc())
        .limit(k)
        .drop("__h")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key: str,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY-k weighted sample without replacement — importance
    sampling for training mixes ("pick 100k documents, proportional to
    quality score"), which uniform hash sampling cannot express.

    Efraimidis–Spirakis A-ES: each row draws a deterministic uniform
    ``u ∈ (0, 1]`` from ``xxhash64(seed | key)`` and ranks by
    ``ln(u) / w`` descending (the numerically stable equivalent of
    ``u^(1/w)``); the top k are EXACTLY a weighted sample without
    replacement.  Same scale shape as :func:`hash_topk_sample`: plans
    as a distributed top-k (per-partition heaps, no global sort), is
    layout/rerun-stable, and is NESTED in k.  Rows with NULL or
    non-positive weight are excluded (they have zero selection
    probability; a negative weight is meaningless here).

    Not oracle-paired by design: ``ln``/division on the rank BOUNDARY
    could differ across engines in the last ulp, silently swapping the
    k-th and (k+1)-th pick — statistical properties are pytest-pinned
    instead (frequency ∝ weight over many seeds, determinism across
    repartitionings, nesting)."""
    scored = _aes_scored(df, weight_col, key, seed)
    return (
        scored.orderBy(F.col("__wk").desc(), F.col(key).asc())
        .limit(k)
        .drop("__wk")
    )


def _aes_scored(df: DataFrame, weight_col: str, key: str, seed: int) -> DataFrame:
    """Positive-weight rows with the A-ES rank key ``__wk`` attached —
    shared by :func:`weighted_sample` (top-k form) and
    :func:`weighted_sample_threshold` (filter form)."""
    w = F.col(weight_col).cast("double")
    # seed hashed as LONG: xxhash64 output depends on the input's width,
    # so an int-literal seed would silently disagree with a bigint seed
    # column in any mirrored computation.  Modulus 2^53 (the largest
    # power of two a double holds exactly): u takes ~9e15 distinct
    # values, so equal-weight rank-key ties at the top-k boundary are
    # vanishingly rare — a small modulus would collide equal-weight rows
    # on the rank key and the deterministic `key asc` tie-break would
    # systematically favor small keys, biasing the boundary picks.
    _m = 1 << 53
    u = (
        F.pmod(F.xxhash64(F.lit(seed).cast("long"), F.col(key)), F.lit(_m))
        + 1
    ) / F.lit(float(_m))  # uniform on (0, 1], never 0 → ln finite
    rank_key = F.log(u) / w
    return df.filter(w.isNotNull() & (w > 0)).withColumn("__wk", rank_key)


def weighted_sample_threshold(
    df: DataFrame,
    k: int,
    weight_col: str,
    key: str,
    seed: int = 0,
    rel_err: float = 1e-4,
    margin: float = 4.0,
) -> DataFrame:
    """:func:`weighted_sample` for CORPUS-SIZED ``k`` ("pick 100M docs
    by quality weight"): the same exactly-k A-ES sample, selected by a
    distributed FILTER instead of a top-k heap.  ``orderBy().limit(k)``
    plans as TakeOrderedAndProject — per-task k-row heaps and a k-row
    driver materialization, fine at 10k picks and fatal at 100M.  Here
    the k-th rank key is LOCATED rather than collected:

    1. one pass scores rows (persisted — the 3 bounded follow-up jobs
       reuse it), 2. ``approxQuantile`` brackets the k-th largest key
       at ``1 − k/n ± margin·rel_err``, 3. one conditional aggregate
       counts the definitely-in rows above the bracket and validates
       the bracket actually straddles k (falls back to the top-k form
       on the rare estimator miss), 4. the exact boundary row is the
       j-th of the BAND (≈ ``2·margin·rel_err·n`` rows, the only
       sorted set), 5. the output is ``filter(wk > cut OR (wk = cut
       AND key ≤ cut_key))`` — no heap anywhere, every job bounded.

    Selects EXACTLY the same rows as ``weighted_sample`` for the same
    seed (pytest-pinned), because both cut the identical total order
    ``(wk desc, key asc)`` at position k.  Returns all positive-weight
    rows when ``k ≥ n``.  The persisted score frame is input-sized —
    call ``spark.catalog.clearCache()`` when done if memory is tight."""
    from pyspark import StorageLevel

    scored = _aes_scored(df, weight_col, key, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = scored.count()
    if k >= n:
        return scored.drop("__wk")
    p = 1.0 - k / n
    lo_q = max(0.0, p - margin * rel_err)
    hi_q = min(1.0, p + margin * rel_err)
    t_lo, t_hi = scored.stat.approxQuantile("__wk", [lo_q, hi_q], rel_err)
    counts = scored.agg(
        F.count(F.when(F.col("__wk") > t_hi, 1)).alias("c_hi"),
        F.count(F.when(F.col("__wk") > t_lo, 1)).alias("c_lo"),
    ).collect()[0]
    c_hi, c_lo = counts["c_hi"], counts["c_lo"]
    if not (c_hi <= k <= c_lo):  # estimator miss — guaranteed-exact fallback
        return (
            scored.orderBy(F.col("__wk").desc(), F.col(key).asc())
            .limit(k)
            .drop("__wk")
        )
    j = k - c_hi
    if j == 0:
        return scored.filter(F.col("__wk") > t_hi).drop("__wk")
    band = scored.filter(
        (F.col("__wk") > t_lo) & (F.col("__wk") <= t_hi)
    )
    # the j-th row of the band under (wk desc, key asc) is the LAST of
    # the limited set under that order: re-order the j survivors by the
    # REVERSED order and take the first — two bounded TakeOrdereds over
    # the band, never over the table
    cut_row = (
        band.orderBy(F.col("__wk").desc(), F.col(key).asc())
        .limit(j)
        .orderBy(F.col("__wk").asc(), F.col(key).desc())
        .limit(1)
        .select("__wk", F.col(key).alias("__ck"))
        .collect()[0]
    )
    cut_wk, cut_key = cut_row["__wk"], cut_row["__ck"]
    return scored.filter(
        (F.col("__wk") > F.lit(cut_wk))
        | ((F.col("__wk") == F.lit(cut_wk)) & (F.col(key) <= F.lit(cut_key)))
    ).drop("__wk")


def epoch_order(
    df: DataFrame,
    key: str,
    seed: int = 0,
    n_shards: int | None = None,
    hash_fn: str = "xxhash64",
    target_rows_per_shard: int = 4_000_000,
) -> DataFrame:
    """Deterministic training-epoch shuffle: a stable pseudo-random
    ordering of the corpus as (shard, position) — what a data loader
    needs to stream a 100 TB corpus in a "random" order that is
    IDENTICAL across reruns, resumable mid-epoch, and different per
    ``seed`` (epoch number).

    No global sort: the order key ``xxhash64(seed, key)`` assigns a
    shard by modulo, and position is a ``row_number`` window WITHIN the
    shard — one shuffle by shard, per-shard sorts run in parallel.  A
    loader reads shards round-robin for global mixing; within-shard
    order is hash order, so any contiguous slice is an unbiased sample
    of the corpus (the property epoch shuffling exists to provide).

    SHARD PROVISIONING is the scale knob: parallelism of the sort ==
    shard count, so a fixed small default is a straggler by
    construction (8 reducers sorting 100 TB).  When ``n_shards`` is
    None it derives as ``ceil(count / target_rows_per_shard)`` — one
    extra counting pass over the corpus (cheap: a column-pruned scan),
    paid once per epoch ordering.  Pass ``n_shards`` explicitly to skip
    the count when the corpus size is already known.

    ``hash_fn="md5"`` is the engine-portable variant (shards are hex
    prefixes, ``n_shards`` must be a power of 16 — a derived count
    rounds UP to the next power of 16, never down) so the whole
    ordering is DuckDB-oracle-checkable — the same portability split as
    the MinHash and count-min families; xxhash64 stays the scale
    default."""
    import math

    from pyspark.sql.window import Window

    if n_shards is None:
        n_rows = df.count()
        n_shards = max(1, math.ceil(n_rows / target_rows_per_shard))
        if hash_fn == "md5":  # round up to the next power of 16
            n_shards = 16 ** max(0, math.ceil(math.log(n_shards, 16)))
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(seed), F.col(key))  # numeric order key
        shard = F.pmod(F.xxhash64(F.lit(seed), F.col(key)), F.lit(n_shards)).cast(
            "int"
        ).cast("string")
    elif hash_fn == "md5":
        import math

        nhex = round(math.log(n_shards, 16))
        if 16 ** nhex != n_shards:
            raise ValueError(f"md5 shards need n_shards = 16^k, got {n_shards}")
        h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(key).cast("string")))
        shard = F.substring(h, 1, nhex)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(key).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w))
        .drop("__h")
    )
