"""Text analysis operators (north-star: language-ID, quality scoring,
token counting, fingerprinting).

No counterpart exists in the reference (its only text handling is CSV
parsing, `backend/main.py:233-239`); these are the LLM-pipeline
operators mandated by BASELINE.json. Everything here is built-in
`pyspark.sql.functions` — higher-order array functions keep the whole
pipeline inside whole-stage codegen, so at 100 TB these run as pure
column-at-a-time JVM work with zero Python in the loop.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# Tiny per-language stopword inventories for the n-gram/stopword
# language-ID heuristic. Deliberately small and deterministic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empties dropped (leading/trailing
    separators produce '' entries in both Spark and DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords — a quality-score feature."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / punctuation / stopword quality features, all
    codegen'd column expressions."""
    c = F.col(text_col)
    toks = tokens(c)
    n_toks = F.size(toks).cast("bigint")
    n_chars = F.length(c).cast("bigint")
    punct = F.length(F.regexp_replace(c, r"[^.!?,;:]", "")).cast("bigint")
    return df.withColumns(
        {
            "n_chars_text": n_chars,
            "n_tokens": n_toks,
            "avg_token_len": (n_chars - (n_toks - F.lit(1))).cast("double")
            / F.greatest(n_toks, F.lit(1)).cast("double"),
            "punct_ratio": punct.cast("double")
            / F.greatest(n_chars, F.lit(1)).cast("double"),
            "stopword_ratio": stopword_ratio(c),
        }
    )


def hashed_linear_score(col: Column | str, n_dims: int = 64) -> Column:
    """fastText/CCNet-style linear text-quality score over feature-hashed
    bag-of-words, as ONE codegen'd column expression: each token hashes
    into ``n_dims`` buckets (md5 — the hashing trick, no vocabulary
    build), the bucket's weight is an md5-derived integer in
    [-1000, 1000], and the document score is the exact int64 sum of its
    tokens' weights. In production the weight vector is learned and
    broadcast as literals; the md5-derived stand-in keeps the whole
    scorer deterministic and bit-replayable cross-engine (same
    hex-prefix→int trick as simhash's oracle path).

    Scale shape: zero joins, zero shuffles — a full-corpus scan scores
    every document in one pass inside whole-stage codegen; only the
    downstream census aggregates."""
    t = tokens(col)

    def w(term: Column) -> Column:
        dim = (
            F.conv(F.substring(F.md5(term), 1, 6), 16, 10).cast("bigint")
            % n_dims
        )
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("w-"), dim.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % 2001
        ) - 1000

    return F.aggregate(
        t, F.lit(0).cast("bigint"), lambda acc, x: acc + w(x)
    )


def fingerprint(col: Column | str) -> Column:
    """Normalized-content fingerprint (md5 of lowercased trimmed text).

    The exact-dedup key: hash-groupBy on this is the scale path —
    shuffles 16-byte digests, not documents.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-grams as space-joined strings, array-side (codegen).

    Built by zipping ``n`` staggered slices of the token array — each
    slice has length ``max(0, n_tokens - (n-1))``, so documents shorter
    than ``n`` tokens yield NO grams (matching the SQL LEAD-window
    formulation, which NULLs out tail grams). Never ``F.get(toks, i+k)``
    inside a transform — that re-embeds the tokenizer per element
    (the O(tokens²) trap, see text_bigram_freq)."""
    toks = tokens(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return grams


def contamination_scores(
    docs: DataFrame,
    bench_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check — the eval-leak gate every
    training-data pipeline needs: per document, the fraction of its
    DISTINCT word n-grams that appear anywhere in the benchmark corpus.

    Scale shape: the benchmark's distinct gram set is the SMALL side
    (eval suites are a few thousand items even when the corpus is
    100 TB) and broadcasts; documents explode to (id, gram) and take a
    broadcast LEFT join — the corpus never shuffles, and the per-doc
    aggregate is partial-combined. Returns
    (id, n_grams, n_hits, contamination)."""
    def grams_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias(
                "gram"
            ),
        )

    bench = grams_of(bench_docs).select("gram").distinct().withColumn(
        "hit", F.lit(1)
    )
    g = grams_of(docs).join(F.broadcast(bench), "gram", "left")
    return (
        g.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_hits").cast("bigint").alias("n_hits"),
            (F.col("n_hits").cast("double") / F.col("n_grams").cast("double")).alias(
                "contamination"
            ),
        )
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-\d{4}\b"


def pii_scrub(
    df: DataFrame, text_col: str, out_col: str = "scrubbed"
) -> DataFrame:
    """Redact email addresses and phone-shaped tokens, counting the
    redactions per row — pure codegen'd regexp work (patterns chosen to
    behave identically under Java regex and RE2-style engines: no
    lookaround, no backrefs)."""
    c = F.col(text_col)
    email_scrubbed = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    # phones are counted on the EMAIL-scrubbed text — the same string
    # the phone replacement actually runs over — so n_redactions equals
    # the number of substitutions made even when a phone-shaped token
    # sits inside an email match (e.g. '555-1234@corp.example')
    n_redactions = (
        F.regexp_count(c, F.lit(PII_EMAIL_RE))
        + F.regexp_count(email_scrubbed, F.lit(PII_PHONE_RE))
    ).cast("bigint")
    scrubbed = F.regexp_replace(email_scrubbed, PII_PHONE_RE, "<PHONE>")
    return df.withColumns({out_col: scrubbed, "n_redactions": n_redactions})


def repetition_ratio(col: Column | str) -> Column:
    """1 - distinct_tokens/total_tokens — the cheap repetition signal
    (boilerplate, keyword stuffing, decode loops) quality filters gate
    on; 0.0 for empty documents."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-hit language ID.

    Scores each language by its stopword hit-count over the token array
    (a cheap, deterministic proxy for character-n-gram models); ties and
    zero-evidence rows fall back to 'und'. One pass, no shuffle, no UDF:
    the per-language scores are a static column fan-out.
    """
    toks = tokens(F.col(text_col))

    def lang_score(lang: str, words: list[str]):
        sw = F.array(*[F.lit(w) for w in words])
        hit = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        return F.struct(hit.alias("hits"), F.lit(lang).alias("lang"))

    scores = [lang_score(lang, words) for lang, words in sorted(LANG_STOPWORDS.items())]
    best = F.array_max(F.array(*scores))
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def compression_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "zlib_ratio"
) -> DataFrame:
    """Gopher/FineWeb-style compressibility quality signal: zlib-
    compressed UTF-8 byte length over raw byte length, as an Arrow-
    batched pandas UDF (zlib is per-document CPU work — no shuffle, no
    state; the legitimate Python escape hatch since no SQL engine
    exposes a DEFLATE primitive, which is also why the query carrying
    this is rows-only-checked with accuracy unit tests instead of a
    DuckDB twin). Boilerplate and template spam compress far below
    ~0.4; high-entropy junk sits near (or just above) 1.0 — both tails
    are drop candidates. Level 6 pinned: zlib output is deterministic
    for a fixed (input, level, library) triple.

    Scale shape: one scan, ~n_bytes of CPU per doc, fully parallel;
    the downstream gate is a codegen'd filter on the ratio column."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t) -> float:
            raw = (t or "").encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(one)

    return df.withColumn(out_col, ratio(F.col(text_col)))
