"""Product-quantization ANN — compressed nearest-neighbor search over
the embedding column (Jégou, Douze & Schmid, *Product Quantization for
Nearest Neighbor Search*, TPAMI 2011 — the public algorithm behind
FAISS's ``IndexPQ``).

Why it exists here: the brute cosine scan (:func:`..similarity.cosine_topk`)
reads every float of every vector per query — 256 B/vector for d=64
float32.  PQ stores ``m`` one-byte codes per vector instead (32×
smaller for m=8) and scans per-query lookup tables, so a 100 TB
embedding corpus becomes a ~3 TB code table that often fits the
cluster's page cache.  The full FAISS ``IndexIVFPQ`` composition is
implemented too: :func:`ivfpq_build` routes vectors through the
distributed k-means coarse quantizer and PQ-encodes the per-cell
RESIDUALS (centered → finer quantization at equal code budget —
reconstruction-error halving pinned in tests), and
:func:`ivfpq_search` probes only ``nprobe`` cells' code lists.

Division of labor (deliberate):

- **Codebook training is driver-side numpy over a bounded
  deterministic sample** — codebooks are MODEL PARAMETERS
  (m·k·(d/m) floats ≈ 64 KB), and the standard practice (FAISS
  trains on 10⁴-10⁶ sampled vectors) because k-means over the full
  corpus buys recall nothing.  The sample is hash-ordered
  (layout/rerun-stable), capped, and the cap documented.
- **Encoding is executor-side** via one Arrow-batched vectorized
  pandas UDF (``mapInPandas``): per batch a (rows × k) numpy distance
  argmin per subspace.  This is dense linear algebra — exactly the
  surface this package's UDF policy reserves Python for (same lane as
  the media decode plumbing), and it runs once per corpus.
- **Search is pure Spark codegen**: the per-query lookup table is an
  m·k literal array, the asymmetric distance (ADC) is an
  ``aggregate`` over the code array, and the top-k is a bounded
  TakeOrderedAndProject — no Python anywhere in the hot query path.

Distances are squared L2 (the PQ-native metric; for L2-normalized
embeddings the ranking equals cosine's).  Determinism: sampling,
seeding, and argmin tie-breaks are all index-ordered, so codebooks,
codes, and results are bit-stable across reruns and layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pq_train", "pq_encode", "pq_search", "pq_search_rerank",
           "pq_reconstruct", "ivfpq_build", "ivfpq_search", "ivfpq_search_rerank"]


def _check_geometry(d: int, m: int, k: int) -> None:
    if d % m != 0:
        raise ValueError(
            f"embedding dim {d} is not divisible by m={m} subspaces — "
            "pick m | d (pad upstream if the model dim is prime)"
        )
    if not 2 <= k <= 256:
        raise ValueError(
            f"k={k} centroids per subspace out of range [2, 256] — codes "
            "are one byte by design; use IVF cells for coarser routing"
        )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 65536,
    iters: int = 10,
) -> list:
    """Train the ``m`` per-subspace codebooks → nested list
    ``codebooks[sub][centroid] = [d/m floats]`` (a plain JSON-able
    model object the caller persists/broadcasts).

    Sampling: the ``sample`` hash-smallest ids (stable on any layout,
    nested in sample size) are collected to the driver — bounded by
    contract at sample × d doubles (default 64k × 64 ≈ 32 MB).  Lloyd
    iterations run in numpy per subspace; an emptied cluster keeps its
    previous centroid (same rule as ``kmeans_assign``); initial
    centroids are the first k distinct sample rows per subspace in
    hash order."""
    import numpy as np

    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train: empty embeddings input")
    d = len(first[0])
    _check_geometry(d, m, k)
    rows = (
        embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col("__id").cast("long")).asc(), F.col("__id").asc())
        .limit(int(sample))
        .collect()
    )
    x = np.asarray([list(r["__v"]) for r in rows], dtype=np.float64)
    sub_d = d // m
    codebooks = []
    for s in range(m):
        xs = x[:, s * sub_d : (s + 1) * sub_d]
        # first k DISTINCT rows in hash order seed the centroids
        seen, seed_idx = set(), []
        for i in range(xs.shape[0]):
            key = xs[i].tobytes()
            if key not in seen:
                seen.add(key)
                seed_idx.append(i)
            if len(seed_idx) == k:
                break
        cents = xs[seed_idx].copy()
        kk = cents.shape[0]  # fewer distinct points than k is legal
        for _ in range(max(1, iters)):
            # (n, kk) squared distances; argmin ties break on index
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        codebooks.append([[float(v) for v in c] for c in cents])
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-centroid codes →
    ``(id, codes array<int>)``.  One Arrow-batched ``mapInPandas``
    pass (vectorized numpy argmin per subspace per batch); the
    codebooks ride the closure (≈64 KB — broadcast-by-serialization).
    Ties break on centroid index, so codes are deterministic."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    cents = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    out_schema = f"{id_col} long, codes array<int>"

    def worker(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * sub_d : (s + 1) * sub_d]
                d2 = ((xs[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes.tolist())}
            )

    return df.select(id_col, vec_col).mapInPandas(worker, schema=out_schema)


def _lut(query: list, codebooks: list) -> list:
    """Per-query ADC lookup table, flattened row-major to m·k doubles:
    ``lut[s*k + c] = ‖query_sub_s − codebook[s][c]‖²``."""
    import numpy as np

    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * sub_d:
        raise ValueError(
            f"query dim {q.shape[0]} != codebook dim {m * sub_d}"
        )
    out = []
    k = max(len(cb) for cb in codebooks)
    for s in range(m):
        qs = q[s * sub_d : (s + 1) * sub_d]
        cb = np.asarray(codebooks[s], dtype=np.float64)
        d2 = ((cb - qs[None, :]) ** 2).sum(axis=1)
        row = d2.tolist() + [float("inf")] * (k - len(cb))
        out.extend(float(v) for v in row)
    return out


def pq_search(
    codes_df: DataFrame,
    query: list,
    codebooks: list,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over the code table → ``(id,
    approx_dist)`` ascending.  PURE Spark: the m·k lookup table is a
    literal array, the distance an ``aggregate`` over the code array
    (whole-stage codegen), the top-k a bounded
    TakeOrderedAndProject — the scan reads m bytes of codes per
    vector, never the embeddings.  ``topk`` is driver-bounded by
    contract (same as ``cosine_topk``)."""
    k = max(len(cb) for cb in codebooks)
    m = len(codebooks)
    lut = _lut(query, codebooks)
    lut_col = F.array(*[F.lit(v) for v in lut])
    dist = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(acc, s) -> acc + element_at(__lut, s * {k} + element_at(codes, s + 1) + 1))"
    )
    return (
        codes_df.withColumn("__lut", lut_col)
        .select(F.col(id_col), dist.alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col(id_col).asc())
        .limit(int(topk))
    )


def pq_search_rerank(
    codes_df: DataFrame,
    embeddings: DataFrame,
    query: list,
    codebooks: list,
    topk: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ pattern: ADC over the code table builds a
    ``shortlist`` of candidates (reading m bytes/vector), then ONLY
    those ids join back to the full embeddings for an exact L2 rerank
    → ``(id, dist)`` ascending.  Quantization error bounds which
    candidates make the shortlist but never the final ordering — with
    an adequate shortlist the top-k equals the brute-force answer
    (recall pinned in tests).  The shortlist side is broadcast
    (shortlist-sized by contract), the rerank is zip_with/aggregate
    codegen — still no Python in the query path."""
    cand = pq_search(
        codes_df, query, codebooks, topk=int(shortlist), id_col=id_col
    ).select(id_col)
    q = F.array(*[F.lit(float(v)) for v in query])
    dist = F.expr(
        f"aggregate(zip_with({vec_col}, __q, (a, b) -> (a - b) * (a - b)), "
        "0D, (acc, x) -> acc + x)"
    )
    return (
        embeddings.join(F.broadcast(cand), id_col)
        .withColumn("__q", q)
        .select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(int(topk))
    )


def pq_reconstruct(codes: list, codebooks: list) -> list:
    """Decode one code row back to its centroid-concatenated vector —
    the reconstruction used for error measurement in tests (driver-side
    by design; corpus-scale reconstruction would defeat the point of
    the compression)."""
    out: list[float] = []
    for s, c in enumerate(codes):
        out.extend(codebooks[s][c])
    return out


def _exact_rerank(
    embeddings: DataFrame,
    cand: DataFrame,
    query: list,
    topk: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact L2 rerank of a bounded candidate id set (broadcast join +
    zip_with/aggregate codegen) → ``(id, dist)`` ascending."""
    q = F.array(*[F.lit(float(v)) for v in query])
    dist = F.expr(
        f"aggregate(zip_with({vec_col}, __q, (a, b) -> (a - b) * (a - b)), "
        "0D, (acc, x) -> acc + x)"
    )
    return (
        embeddings.join(F.broadcast(cand.select(id_col)), id_col)
        .withColumn("__q", q)
        .select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(int(topk))
    )


def ivfpq_build(
    embeddings: DataFrame,
    ncells: int = 16,
    m: int = 8,
    k: int = 256,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 65536,
    pq_iters: int = 10,
):
    """IVF-PQ index build — the full FAISS ``IndexIVFPQ`` shape on
    DataFrames: a k-means coarse quantizer routes each vector to a
    cell (:func:`..similarity.kmeans_assign` — fully distributed), the
    RESIDUAL ``v − centroid(cell)`` is what gets PQ-encoded (residuals
    are centered and small, so the same k centroids quantize them far
    more finely than raw vectors — the core IVF-PQ insight), and
    search probes only ``nprobe`` cells' code lists.

    Returns ``(codes_df, centroids, codebooks)``: ``codes_df`` =
    ``(id, cell, codes)`` — persist it; ``centroids`` = ncells×d
    nested list; ``codebooks`` as in :func:`pq_train`.  Residual
    subtraction is ``zip_with`` codegen against the broadcast
    centroid table; nothing corpus-sized reaches the driver."""
    from mini_project_204721_data_engineering_spark.llm.similarity import kmeans_assign

    assigned = kmeans_assign(
        embeddings, ncells=ncells, iters=kmeans_iters,
        id_col=id_col, vec_col=vec_col,
    )
    cent_rows = (
        assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("pc"))
        .select("cell", F.expr("transform(pc, s -> s.cx)").alias("cv"))
        .collect()
    )
    centroids = {r["cell"]: [float(v) for v in r["cv"]] for r in cent_rows}
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(c, v) for c, v in sorted(centroids.items())], ["cell", "cv"]
    ).select("cell", F.expr("transform(cv, x -> cast(x as double))").alias("cv"))
    resid = (
        assigned.join(F.broadcast(cent_df), "cell")
        .select(
            id_col,
            "cell",
            F.expr(
                f"zip_with(transform({vec_col}, x -> cast(x as double)), cv, "
                "(a, b) -> a - b)"
            ).alias("__resid"),
        )
    )
    codebooks = pq_train(
        resid, m=m, k=k, id_col=id_col, vec_col="__resid",
        sample=sample, iters=pq_iters,
    )
    codes = pq_encode(
        resid.select(id_col, "cell", "__resid"), codebooks,
        id_col=id_col, vec_col="__resid",
    )
    # mapInPandas drops non-selected columns — re-attach cell via the
    # (id, cell) projection (id-keyed join, both sides code-table-sized)
    codes = codes.join(resid.select(id_col, "cell"), id_col)
    cent_list = [centroids[c] for c in sorted(centroids)]
    return codes, cent_list, codebooks


def ivfpq_search(
    codes_df: DataFrame,
    query: list,
    centroids: list,
    codebooks: list,
    topk: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probed ADC search over an IVF-PQ index → ``(id, approx_dist)``
    ascending.  Driver picks the ``nprobe`` nearest cells (an
    ncells×d numpy scan of the MODEL, not the data), builds one
    residual lookup table per probed cell (query − that centroid), and
    the scan is a PURE-codegen filter + per-cell LUT aggregate: cells
    outside the probe set are PRUNED before any distance math — the
    1/ncells·nprobe scan reduction that makes PQ corpus-scale.
    Combine with :func:`_exact_rerank`-style reranking via
    :func:`ivfpq_search_rerank`."""
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    if q.shape[0] != cents.shape[1]:
        raise ValueError(f"query dim {q.shape[0]} != centroid dim {cents.shape[1]}")
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(d2)), d2))
    probed = [int(c) for c in order[: max(1, int(nprobe))]]
    k = max(len(cb) for cb in codebooks)
    m = len(codebooks)
    cell_keys, luts = [], []
    for c in probed:
        cell_keys.append(F.lit(c))
        luts.append(
            F.array(*[F.lit(v) for v in _lut((q - cents[c]).tolist(), codebooks)])
        )
    lut_map = F.map_from_arrays(F.array(*cell_keys), F.array(*luts))
    dist = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, (acc, s) -> acc + "
        f"element_at(element_at(__luts, cell), s * {k} + element_at(codes, s + 1) + 1))"
    )
    return (
        codes_df.filter(F.col("cell").isin(probed))
        .withColumn("__luts", lut_map)
        .select(F.col(id_col), dist.alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col(id_col).asc())
        .limit(int(topk))
    )


def ivfpq_search_rerank(
    codes_df: DataFrame,
    embeddings: DataFrame,
    query: list,
    centroids: list,
    codebooks: list,
    topk: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ shortlist → exact rerank (the production read path):
    probed ADC proposes ``shortlist`` ids, only those join back to the
    full embeddings for exact L2 — same contract as
    :func:`pq_search_rerank` with the additional 1/ncells·nprobe scan
    pruning."""
    cand = ivfpq_search(
        codes_df, query, centroids, codebooks,
        topk=int(shortlist), nprobe=nprobe, id_col=id_col,
    )
    return _exact_rerank(embeddings, cand, query, topk, id_col, vec_col)
