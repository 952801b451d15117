"""Text-analysis operators for document corpora.

All pure Column expressions over ``pyspark.sql.functions`` — tokenization,
shingling, language ID, quality scoring, and fingerprinting stay inside
whole-stage codegen; nothing here drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "shingles",
    "token_count",
    "subword_count",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "lang_id_code",
    "lang_from_code",
    "LANG_CODES",
    "pii_count",
    "strip_html",
    "SCRIPT_STYLE_PATTERN",
    "HTML_COMMENT_PATTERN",
    "HTML_TAG_PATTERN",
    "pii_redact",
    "url_parts",
    "canonical_url",
    "STOPWORDS",
    "SUBWORD_PATTERN",
    "EMAIL_PATTERN",
    "PHONE_PATTERN",
]

#: small English stopword list used by the quality heuristic
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.trim(text), r"\s+")


def shingles(toks_col: str, n: int = 3) -> Column:
    """Word n-gram shingles of a token-array column (by name) — empty array
    when the document is shorter than ``n`` tokens.

    Built with ``transform(sequence(...))`` — a codegen'd array expression;
    no explode until the caller chooses to.
    """
    parts = ", ".join(f"{toks_col}[i + {k}]" for k in range(n))
    return F.expr(
        f"CASE WHEN size({toks_col}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> concat_ws(' ', {parts})) END"
    )


def token_count(text: Column) -> Column:
    """Number of whitespace tokens."""
    return F.size(tokens(text))


#: GPT-2-style pre-tokenizer segments (the units BPE would merge within):
#: contractions, space-prefixed letter runs, digit runs, punctuation runs.
#: Kept to portable regex constructs (same semantics in Java and RE2/PCRE)
#: so the DuckDB oracle can mirror it verbatim.
SUBWORD_PATTERN = r"'[sdmt]|'ll|'re|'ve| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def subword_count(text: Column) -> Column:
    """BPE-ish token-count estimate: the number of pre-tokenizer segments
    (:data:`SUBWORD_PATTERN` matches).  An upper-bound proxy for the BPE
    token count a real tokenizer would produce — the standard cheap
    training-data budget estimator; stays in codegen (no Python UDF, no
    vocab lookup)."""
    return F.size(F.regexp_extract_all(text, F.lit(SUBWORD_PATTERN), 0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(text)
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    kept = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(kept) / F.size(toks)


def quality_score(text: Column) -> Column:
    """Cheap document-quality heuristic in [0,1]:
    0.5 · min(1, n_tokens/100)  — enough content
    + 0.5 · (1 − stopword_ratio) — not all glue words
    """
    n = token_count(text)
    return F.least(F.lit(1.0), n / F.lit(100.0)) * 0.5 + (
        F.lit(1.0) - stopword_ratio(text)
    ) * 0.5


#: PII patterns kept to constructs with identical semantics in Java regex
#: (Spark) and RE2 (DuckDB) so oracles can mirror them verbatim
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_count(text: Column, pattern: str) -> Column:
    """Number of matches of a PII pattern (codegen regexp, no UDF)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_redact(text: Column) -> Column:
    """Redact emails then phone numbers with typed placeholders —
    the scrub a corpus pass applies before tokenization.  Spark's
    ``regexp_replace`` is replace-ALL (mirror DuckDB with the ``'g'``
    flag)."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )


def lang_id(text: Column) -> Column:
    """Character-class language heuristic (n-gram-free, codegen-friendly):
    >30% Thai codepoints → 'th'; >30% CJK → 'zh'; >50% Latin letters →
    'latin'; else 'unknown'.  (On ASCII-only corpora this is 'latin'
    everywhere — the operator is the contract, the data decides.)
    """
    total = F.length(text)
    thai = F.size(F.regexp_extract_all(text, F.lit("[฀-๿]"), 0))
    cjk = F.size(F.regexp_extract_all(text, F.lit("[一-鿿]"), 0))
    latin = F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]"), 0))
    return (
        F.when(total == 0, F.lit("unknown"))
        .when(thai > total * 0.3, F.lit("th"))
        .when(cjk > total * 0.3, F.lit("zh"))
        .when(latin > total * 0.5, F.lit("latin"))
        .otherwise(F.lit("unknown"))
    )


#: integer codes for :func:`lang_id` labels — a 1-byte aggregation-friendly
#: stand-in for the string label.  Spark's HashAggregate only accepts
#: fixed-width mutable aggregation buffers, so carrying the label as a
#: TINYINT through a group-by (and decoding after) keeps dedup/rollup
#: stages in hash aggregation instead of falling back to SortAggregate
#: (r15 optimization; a full map-side sort at 100 TB otherwise).
LANG_CODES = (("unknown", 0), ("th", 1), ("zh", 2), ("latin", 3))


def lang_id_code(text: Column) -> Column:
    """:func:`lang_id` emitting the TINYINT code instead of the label —
    same CASE tree, same per-row regex cost, hash-aggregable."""
    total = F.length(text)
    thai = F.size(F.regexp_extract_all(text, F.lit("[฀-๿]"), 0))
    cjk = F.size(F.regexp_extract_all(text, F.lit("[一-鿿]"), 0))
    latin = F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]"), 0))
    return (
        F.when(total == 0, F.lit(0))
        .when(thai > total * 0.3, F.lit(1))
        .when(cjk > total * 0.3, F.lit(2))
        .when(latin > total * 0.5, F.lit(3))
        .otherwise(F.lit(0))
        .cast("tinyint")
    )


def lang_from_code(code: Column) -> Column:
    """Decode a :func:`lang_id_code` value back to the :func:`lang_id`
    label (applied after aggregation, where only |groups| rows pay it)."""
    out = None
    for label, c in LANG_CODES:
        out = F.when(code == c, F.lit(label)) if out is None else out.when(
            code == c, F.lit(label)
        )
    return out


#: HTML-extraction patterns, restricted (like the PII set) to constructs
#: with identical Java-regex and RE2 semantics so oracles mirror them:
#: (?is) flags, non-greedy block bodies, no backreferences.
SCRIPT_STYLE_PATTERN = (
    r"(?is)(<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>)"
)
HTML_COMMENT_PATTERN = r"(?s)<!--.*?-->"
HTML_TAG_PATTERN = r"(?s)<[^>]+>"


def strip_html(text: Column) -> Column:
    """Boilerplate-free text from raw HTML — the crawl→corpus extraction
    step, entirely in codegen ``regexp_replace`` (no parser, no UDF):
    drop script/style blocks WITH their contents, drop comments, strip
    remaining tags, decode the common entities, collapse whitespace.

    Regex-based extraction is the deliberate trade at 100 TB: a DOM
    parser is per-row Python; these five codegen passes handle the
    overwhelming majority of crawl text (malformed nesting degrades to
    extra whitespace, never an exception).  Runs of whitespace collapse
    to single spaces and the result is trimmed."""
    t = F.regexp_replace(text, SCRIPT_STYLE_PATTERN, " ")
    t = F.regexp_replace(t, HTML_COMMENT_PATTERN, " ")
    t = F.regexp_replace(t, HTML_TAG_PATTERN, " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def url_parts(url: Column) -> Column:
    """Decompose a URL into a struct (scheme, host, registered_domain,
    path, query) — the crawl-pipeline grouping key factory (per-domain
    rate stats, host-level dedup, domain blocklists).  Pure codegen
    regexp extraction, no UDF.

    ``registered_domain`` is the last two host labels — the standard
    cheap heuristic; it under-splits multi-label public suffixes
    (``example.co.uk`` → ``co.uk``), which is the documented trade for
    not shipping the public-suffix list.  Hosts lowercase; a missing
    component is the empty string (regexp_extract's no-match value),
    so group-bys never see NULL keys."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        domain.alias("registered_domain"),
        path.alias("path"),
        query.alias("query"),
    )


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme and host,
    drop the fragment, drop a trailing slash on the bare path, keep the
    query (it routes content on real sites).  Deterministic and purely
    lexical — the frontier-dedup key of a crawler (pair with
    ``exact_dedup``/``dedup_keep_first`` on this column)."""
    p = url_parts(url)
    path = F.when(p["path"] == "/", F.lit("")).otherwise(
        F.regexp_replace(p["path"], r"/$", "")
    )
    q = F.when(p["query"] == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), p["query"])
    )
    return F.concat(p["scheme"], F.lit("://"), p["host"], path, q)
