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

__all__ = [
    "word_freqs",
    "bpe_train",
    "bpe_train_local",
    "bpe_apply",
    "bpe_reference",
]

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


def _merge_expr(pairs: list[tuple[str, str]]) -> str:
    """SQL fold that merges adjacent symbol pairs in ``syms``,
    non-overlapping, leftmost first: carry (out, pending); a pending
    ``a`` followed by ``b`` emits the merged symbol and clears pending,
    so the merged token cannot re-merge within the same round.  Accepts
    a BATCH of pairs (they must be symbol-disjoint — enforced by the
    batch selection in :func:`bpe_train` — so at most one pair can
    match any (pending, x) and one combined pass ≡ one pass per pair)."""
    def q(s: str) -> str:  # SQL string literal: escape \ first, then '
        return s.replace("\\", "\\\\").replace("'", "\\'")

    whens = "\n        ".join(
        f"WHEN acc.pending = '{q(a)}' AND x = '{q(b)}' "
        f"THEN named_struct('out', array_append(acc.out, '{q(a)}{q(b)}'), "
        f"'pending', cast(null as string))"
        for a, b in pairs
    )
    return f"""
    aggregate(
      syms,
      named_struct('out', cast(array() as array<string>), 'pending', cast(null as string)),
      (acc, x) -> CASE
        {whens}
        WHEN acc.pending IS NULL THEN named_struct('out', acc.out, 'pending', x)
        ELSE named_struct('out', array_append(acc.out, acc.pending), 'pending', x)
      END,
      acc -> CASE WHEN acc.pending IS NULL THEN acc.out
                  ELSE array_append(acc.out, acc.pending) END
    )"""


def _select_batch(
    ranked: list,
    fst_max: dict,
    sec_max: dict,
    symbols: set,
    budget: int,
    min_pair_count: int,
) -> list[tuple[str, str]]:
    """The maximal CONSECUTIVE prefix of the ranked pair list that can
    merge in one combined pass with results identical to merging them
    one per round.  A candidate ``p`` (count ``c``) extends the prefix
    iff ALL of:

    1. ``c >= min_pair_count``;
    2. ``p`` shares no symbol with any already-selected pair (disjoint
       pairs commute: one fold pass ≡ sequential passes);
    3. ``c`` STRICTLY exceeds every selected pair's new-pair ceiling
       ``M_s = max(sec_max[s.a], fst_max[s.b])`` — any pair the merge
       of ``s=(a,b)`` can create is of the form (x, ab) with count
       ≤ count((x, a)) ≤ sec_max[a], or (ab, y) with count
       ≤ count((b, y)) ≤ fst_max[b], so no mid-batch pair can outrank
       (or tie) a later prefix member and the sequential argmax at each
       step provably equals the next prefix pair;
    4. the selected merge outputs are NOT existing symbols (else new
       (x, ab) occurrences would ADD to an existing pair's count,
       voiding bound 3) and no candidate symbol equals a selected
       output.

    Stopping at the FIRST violation (never skipping) is what preserves
    order-equivalence: skipping a pair could let sequential training
    merge it before a lower-ranked accepted one."""
    out: list[tuple[str, str]] = []
    used: set[str] = set()
    outputs: set[str] = set()
    ceilings: list[int] = []
    for row in ranked:
        a, b, c = row["p"]["a"], row["p"]["b"], row["cnt"]
        if c < min_pair_count or len(out) >= budget:
            break
        if a in used or b in used or a in outputs or b in outputs:
            break
        if out and any(c <= m for m in ceilings):
            break
        out.append((a, b))
        if (a + b) in symbols:
            # a colliding merge output is only unsafe for SUBSEQUENT
            # batch members (new occurrences would inflate an EXISTING
            # pair's count mid-round, voiding the ceiling bound); as
            # the last accepted pair it is exact — accept and stop
            break
        used.update((a, b))
        outputs.add(a + b)
        ceilings.append(max(sec_max.get(a, 0), fst_max.get(b, 0)))
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_batch: int = 1,
    round_log: list | None = None,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a corpus.

    Returns ``(merges, segmented)``: the ordered merge list and the
    (word, n, syms) table holding every word's final segmentation —
    feed the latter to :func:`bpe_apply`.  Stops early when no pair
    reaches ``min_pair_count`` (merging singletons is noise).

    ``max_batch`` > 1 merges up to that many pairs PER ROUND — the
    production-scale path: one Spark round per merge cannot reach the
    30k-100k merges real tokenizers need (scheduler overhead alone
    would take days), so each round takes the maximal prefix of the
    ranked pair list whose members are symbol-disjoint and whose counts
    strictly dominate every possible merge-created pair
    (:func:`_select_batch`) — a batch provably identical, merge for
    merge, to running those rounds sequentially (pytest-pinned against
    the one-per-round trainer and the pure-Python reference, including
    corpora with interacting pairs).  Typical round reduction is
    10-30× (measured in SCALE.md); the merge LIST is byte-identical
    either way."""
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
    while len(merges) < n_merges:
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
        )
        budget = min(max_batch, n_merges - len(merges))
        if budget > 1:
            pairs = pairs.persist()
        ranked = pairs.orderBy(
            F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc()
        ).limit(max(budget * 2, budget + 8)).collect()
        if budget > 1:
            # per-symbol pair-count maxima (symbol-alphabet-sized —
            # bounded by charset + merges so far, a driver-safe collect)
            # feed the new-pair ceiling M_s; one pass over the cached
            # pair table for both sides
            side_max = (
                pairs.select(F.col("p.a").alias("sym"), F.lit("f").alias("side"), "cnt")
                .unionAll(
                    pairs.select(F.col("p.b").alias("sym"), F.lit("s").alias("side"), "cnt")
                )
                .groupBy("sym", "side")
                .agg(F.max("cnt").alias("m"))
                .collect()
            )
            pairs.unpersist()
            fst_max = {r["sym"]: r["m"] for r in side_max if r["side"] == "f"}
            sec_max = {r["sym"]: r["m"] for r in side_max if r["side"] == "s"}
            symbols = set(fst_max) | set(sec_max)
            batch = _select_batch(
                ranked, fst_max, sec_max, symbols, budget, min_pair_count
            )
        else:
            batch = (
                [(ranked[0]["p"]["a"], ranked[0]["p"]["b"])]
                if ranked and ranked[0]["cnt"] >= min_pair_count
                else []
            )
        if not batch:
            break
        if round_log is not None:
            round_log.append(len(batch))
        merges.extend(batch)
        words = words.select(
            "word", "n", F.expr(_merge_expr(batch)).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, words


def bpe_train_local(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_words: int = 5_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Production-scale BPE trainer: ONE corpus pass (the distributed
    word-frequency collapse), then exact sequential training
    driver-side with INCREMENTAL pair-count maintenance — the standard
    tokenizer-trainer shape (a 100 TB corpus collapses to a vocab-sized
    word table; 30k-100k merges then run in seconds with zero Spark
    rounds, where one-job-per-merge would take days of scheduler
    overhead alone).

    Exactness: merge-for-merge identical to :func:`bpe_train` and
    :func:`bpe_reference` (same (count desc, pair lex asc) tie-break),
    via a lazy max-heap over pair counts with per-merge updates
    confined to the words that CONTAIN the merged pair (an inverted
    pair→words index) — O(affected words · word length) per merge, not
    a full rescan.

    Contract: the (word, n) table must fit on the driver —
    ``max_words`` guards the collect (default 5e6 words ≈ a few 100 MB
    of symbol lists; real web corpora at 100 TB hold 1e7-1e8 distinct
    words after minimal normalization, so raise the cap on a big
    driver, pre-filter singleton words, or fall back to the
    fully-distributed :func:`bpe_train` whose per-round cost SCALE.md
    measures).  Returns the same ``(merges, segmented)`` contract;
    ``segmented`` is parallelized back for :func:`bpe_apply`."""
    import heapq
    from collections import Counter, defaultdict

    if "word" in docs.columns and "n" in docs.columns:
        wf = docs.select("word", "n")  # pre-collapsed frequency table
    else:
        wf = word_freqs(docs, text_col)
    n_words = wf.count()
    if n_words > max_words:
        raise ValueError(
            f"word table has {n_words} distinct words > max_words="
            f"{max_words}; raise the cap, pre-filter rare words, or use "
            "the distributed bpe_train"
        )
    rows = wf.collect()
    words: list[list[str]] = [[*r["word"], EOW] for r in rows]
    freqs: list[int] = [r["n"] for r in rows]
    counts: Counter = Counter()
    containing: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] += freqs[i]
            containing[(a, b)].add(i)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)  # lazy heap: skip stale entries
        if counts.get(pair, 0) != -negc:
            continue
        if -negc < min_pair_count:
            break
        a, b = pair
        merges.append(pair)
        touched: set[tuple[str, str]] = set()
        for i in list(containing[pair]):
            syms, f = words[i], freqs[i]
            out: list[str] = []
            pending: str | None = None
            changed = False
            for x in syms:
                if pending == a and x == b:
                    out.append(a + b)
                    pending = None
                    changed = True
                elif pending is None:
                    pending = x
                else:
                    out.append(pending)
                    pending = x
            if pending is not None:
                out.append(pending)
            if not changed:  # stale index entry (pair already merged away)
                containing[pair].discard(i)
                continue
            for p in zip(syms, syms[1:]):
                counts[p] -= f
                touched.add(p)
                if counts[p] <= 0:
                    del counts[p]
                    containing.pop(p, None)
                else:
                    containing[p].discard(i)
            for p in zip(out, out[1:]):
                counts[p] = counts.get(p, 0) + f
                touched.add(p)
                containing[p].add(i)
            words[i] = out
        for p in touched:
            if p in counts:
                heapq.heappush(heap, (-counts[p], p))
    spark = docs.sparkSession
    segmented = spark.createDataFrame(
        [(r["word"], freqs[i], words[i]) for i, r in enumerate(rows)],
        "word string, n long, syms array<string>",
    )
    return merges, segmented


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
