"""Split-block Bloom-filter join pruning — the generalized form of the
decontamination scale path (``llm/quality.py::contaminated_docs``).

Spark's optimizer injects runtime bloom filters for some shuffle joins
on its own (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this
is the *declarative* operator for the shapes it can't infer: pruning a
fact stream before an expensive verify join, before a Python-UDF stage,
or against a build side computed by another engine pass.

Construction is the parquet SBBF idea, everything JVM-side codegen:

- a key maps to ONE 64-bit word (``pmod(xxhash64(keys), n_words)``) and
  an 8-bit mask within it (8 × 6-bit positions from a second hash);
- the filter is a tiny ``(word_idx, bits)`` DataFrame built with
  ``bit_or`` aggregation (map-side combined — shuffle volume is at most
  partitions × n_words words, never key-count) — NOTHING is ever
  collected to the driver;
- the probe side broadcast-joins that table on the 8-byte word index
  and keeps rows with ``bits & mask = mask``.

The words table is n_bits/8 bytes — ~25-50× smaller than the key
strings it stands for, so broadcastability extends by that factor over
a raw broadcast semi-join.  fpp for this split-block construction is
slightly above the classic k=8 Bloom bound at the same bit budget
(all 8 bits land in one word); the default sizing uses the classic
formula, measured ~2-3× optimistic — callers that need a hard fpp
should size with ``n_items`` at ~4× the classic bits.  A bare
:func:`bloom_filter` is therefore a SUPERSET of the true semi-join
(false positives, never false negatives — property-pinned);
:func:`bloom_semi_join` adds the exact verify join, whose output is
IDENTICAL to a plain semi-join (oracle-checked) while only the
~fpp-sized survivor set ever reaches the shuffle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "build_bloom", "bloom_filter", "bloom_semi_join"]

_SEED2 = 1337  # second-hash seed; must match build and probe
_MASK_SQL_TMPL = "|".join(
    f"shiftleft(1L, cast((%(h2)s >> {6 * i}) & 63 AS INT))" for i in range(8)
)


@dataclass(frozen=True)
class BloomFilter:
    """The built filter: the (word_idx, bits) table plus its geometry.
    ``words`` is a lazy DataFrame — building a BloomFilter launches no
    job when ``n_items`` was supplied."""

    words: DataFrame
    n_words: int
    fpp: float


def _hashed(df: DataFrame, keys: Sequence[str], n_words: int) -> DataFrame:
    """Attach (__word, __mask) for the given key columns.  Rows with any
    NULL key are dropped — mirroring equi-join semantics, where a NULL
    key can never match."""
    reserved = {"__h2", "__word", "__mask", "__bits"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with bloom internals — "
            "rename them before the bloom call"
        )
    cols = [F.col(k) for k in keys]
    notnull = cols[0].isNotNull()
    for c in cols[1:]:
        notnull = notnull & c.isNotNull()
    h2 = F.xxhash64(*cols, F.lit(_SEED2))
    return (
        df.filter(notnull)
        .withColumn("__h2", h2)
        .withColumn("__word", F.pmod(F.xxhash64(*cols), F.lit(n_words)))
        .withColumn("__mask", F.expr(_MASK_SQL_TMPL % {"h2": "__h2"}))
        .drop("__h2")
    )


def build_bloom(
    build: DataFrame,
    keys: Sequence[str],
    fpp: float = 0.01,
    n_items: int | None = None,
    max_bloom_bytes: int = 256 * 1024 * 1024,
) -> BloomFilter:
    """Build the filter over ``build``'s key columns.

    ``n_items`` sizes the bit array; when omitted it is taken as
    ``build.count()`` (one counting job — an UPPER bound on distinct
    keys, so the realized fpp only improves; pass an estimate to stay
    fully lazy).  Raises when the sized filter exceeds
    ``max_bloom_bytes`` — at that point a bloom that must itself be
    shuffled has lost the game; raise ``fpp`` or fall back to a plain
    shuffle semi-join.
    """
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if n_items is None:
        n_items = build.count()
    n_items = max(1, n_items)
    n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    n_words = (n_bits + 63) // 64
    if n_words * 8 > max_bloom_bytes:
        raise ValueError(
            f"bloom for n_items={n_items} at fpp={fpp} needs {n_words * 8} bytes "
            f"> max_bloom_bytes={max_bloom_bytes}; raise fpp, pass a tighter "
            f"n_items, or use a plain shuffle semi-join"
        )
    words = (
        _hashed(build, keys, n_words)
        .groupBy("__word")
        .agg(F.expr("bit_or(__mask)").alias("__bits"))
    )
    return BloomFilter(words=words, n_words=n_words, fpp=fpp)


def bloom_filter(
    probe: DataFrame, bloom: BloomFilter, keys: Sequence[str]
) -> DataFrame:
    """Keep probe rows whose key MAY be in the build set: a SUPERSET of
    the true semi-join (false positives at ~fpp, never false
    negatives).  One broadcast hash join on the 8-byte word index and a
    codegen bit test — the probe side is never shuffled."""
    out_cols = probe.columns
    return (
        _hashed(probe, keys, bloom.n_words)
        .join(F.broadcast(bloom.words), "__word")
        .filter(F.expr("(__bits & __mask) = __mask"))
        .select(*out_cols)
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    fpp: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """EXACT semi-join with bloom pre-pruning: only the ~fpp-sized
    bloom-survivor set reaches the exact (shuffle) semi-join, so the
    fact-table shuffle shrinks by the filter's selectivity.  Output is
    identical to ``probe.join(build, on, "left_semi")`` by construction
    — the bloom only prunes, the exact join decides."""
    if len(probe_keys) != len(build_keys):
        raise ValueError("probe_keys and build_keys must pair up")
    # xxhash64 hashes by TYPE as well as value (int 5 != bigint 5), so a
    # type-mismatched key pair would silently false-negative every row —
    # the one failure mode a bloom must never have.  Refuse loudly; the
    # caller casts one side (exactly what the equi-join would have
    # needed for a sane plan anyway).
    ptypes = dict(probe.dtypes)
    btypes = dict(build.dtypes)
    for pk, bk in zip(probe_keys, build_keys):
        if ptypes[pk] != btypes[bk]:
            raise ValueError(
                f"key type mismatch: probe {pk}:{ptypes[pk]} vs build "
                f"{bk}:{btypes[bk]} — cast one side before bloom_semi_join"
            )
    bloom = build_bloom(build, list(build_keys), fpp=fpp, n_items=n_items)
    pruned = bloom_filter(probe, bloom, list(probe_keys))
    cond = None
    for pk, bk in zip(probe_keys, build_keys):
        c = pruned[pk] == build[bk]
        cond = c if cond is None else cond & c
    return pruned.join(build, cond, "left_semi")
