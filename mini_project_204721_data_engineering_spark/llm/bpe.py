"""Distributed BPE tokenizer induction (byte-pair encoding, the
Sennrich-et-al. subword algorithm LLM tokenizers derive from).

Scale design — the reason this runs at corpus scale at all:

- The corpus is touched ONCE: a whitespace word count collapses it to
  the (word, n) frequency table, which is VOCAB-sized (1e6-1e8 distinct
  words at 100 TB, vs 1e12+ tokens).  Every merge round operates on
  that table only — the standard word-frequency factorization of BPE.
- Each round is (a) one vocab-sized groupBy counting adjacent symbol
  pairs weighted by word frequency (map-side combinable), (b) a
  1-row argmax collect, (c) a codegen fold that merges the winning
  pair non-overlapping left-to-right in every word's symbol array.
  ``localCheckpoint`` severs lineage per round (the k-means loop
  discipline) so round *i* never replays rounds < i.
- ``bpe_apply`` segments a corpus with the learned merges via a
  broadcast join of the TRAINED word→segmentation table (segmentations
  are a free by-product of training) with a character-split fallback
  for out-of-vocabulary words — one broadcast hash join, no per-merge
  replay over the corpus.

Determinism: ties on pair frequency break lexicographically, so the
merge sequence is a pure function of the corpus.  Not SQL-expressible
(iterative argmax) — pytest-verified against a reference pure-Python
BPE (QUERYMAP "pytest-only surfaces").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_freqs", "bpe_train", "bpe_apply", "bpe_reference"]

#: end-of-word sentinel (standard BPE: lets merges distinguish suffixes)
EOW = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) frequency table — the ONE corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_expr(a: str, b: str) -> str:
    """SQL fold that merges adjacent (a, b) symbol pairs in ``syms``,
    non-overlapping, leftmost first: carry (out, pending); a pending
    ``a`` followed by ``b`` emits the merged symbol and clears pending,
    so the merged token cannot re-merge within the same round."""
    def q(s: str) -> str:  # SQL string literal: escape \ first, then '
        return s.replace("\\", "\\\\").replace("'", "\\'")

    qa, qb = q(a), q(b)
    return f"""
    aggregate(
      syms,
      named_struct('out', cast(array() as array<string>), 'pending', cast(null as string)),
      (acc, x) -> CASE
        WHEN acc.pending = '{qa}' AND x = '{qb}'
          THEN named_struct('out', array_append(acc.out, '{qa}{qb}'),
                            'pending', cast(null as string))
        WHEN acc.pending IS NULL THEN named_struct('out', acc.out, 'pending', x)
        ELSE named_struct('out', array_append(acc.out, acc.pending), 'pending', x)
      END,
      acc -> CASE WHEN acc.pending IS NULL THEN acc.out
                  ELSE array_append(acc.out, acc.pending) END
    )"""


def bpe_train(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a corpus.

    Returns ``(merges, segmented)``: the ordered merge list and the
    (word, n, syms) table holding every word's final segmentation —
    feed the latter to :func:`bpe_apply`.  Stops early when no pair
    reaches ``min_pair_count`` (merging singletons is noise)."""
    if "syms" in docs.columns:  # pre-segmented word table: resume training
        words = docs
    else:
        # initial symbols: characters + end-of-word sentinel
        words = word_freqs(docs, text_col).select(
            "word",
            "n",
            F.expr(f"array_append(split(word, ''), '{EOW}')").alias("syms"),
        )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                "n",
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> named_struct('a', s, 'b', syms[i + 1]))"
                ).alias("ps"),
            )
            .select(F.explode("ps").alias("p"), "n")
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < min_pair_count:
            break
        best = pairs[0]["p"]
        merges.append((best["a"], best["b"]))
        words = words.select(
            "word", "n", F.expr(_merge_expr(best["a"], best["b"])).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, words


def bpe_apply(
    docs: DataFrame,
    segmented: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment a corpus with a trained BPE: explode words with their
    positions, broadcast-join the trained (word → syms) table, fall
    back to character symbols for OOV words, and reassemble per-doc
    token arrays in order.  One broadcast hash join at any corpus size
    (the segmentation table is vocab-sized); the learned merges are
    never replayed over the corpus."""
    seg = F.broadcast(segmented.select("word", F.col("syms").alias("__seg")))
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__pos", "word"),
    ).filter(F.col("word") != "")
    oov = F.expr(f"array_append(split(word, ''), '{EOW}')")
    return (
        exploded.join(seg, "word", "left")
        .select(
            F.col(id_col),
            "__pos",
            F.coalesce(F.col("__seg"), oov).alias("__toks"),
        )
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(__pos, __toks))), s -> s.__toks)")
            ).alias("bpe_tokens")
        )
    )


def bpe_reference(texts: list[str], n_merges: int = 32, min_pair_count: int = 2):
    """Pure-Python reference BPE (same tie-breaks) for tests."""
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.split())
    words = {w: [*w, EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, pending = [], None
            for x in syms:
                if pending == a and x == b:
                    out.append(a + b)
                    pending = None
                elif pending is None:
                    pending = x
                else:
                    out.append(pending)
                    pending = x
            if pending is not None:
                out.append(pending)
            words[w] = out
    return merges, words
