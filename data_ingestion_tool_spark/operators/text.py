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


def fingerprint(col: Column | str) -> Column:
    """Normalized-content fingerprint (md5 of lowercased trimmed text).

    The exact-dedup key: hash-groupBy on this is the scale path —
    shuffles 16-byte digests, not documents.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


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
