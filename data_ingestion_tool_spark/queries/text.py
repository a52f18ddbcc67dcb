"""Text-analysis queries over ``documents`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as TX
from ..sources.parquet_io import read_table
from ..plans.pin import pin
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan, spread cores-wide (round 13): the single-row-
    group local file makes every scan one task, serializing the
    tokenize/shingle/decode map stages this family fuses into it
    (guide §2.5). `spread` is a plan no-op at cluster scale."""
    from ..operators.partitioning import spread

    return spread(read_table(spark, sf_dir, "documents"), by=["doc_id"])



@query(
    "text_tokenize_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt FROM (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents) t
    WHERE word <> ''
    GROUP BY word HAVING COUNT(*) >= 5
    """,
)
def text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → count: the classic text-analysis shape. Stays
    in codegen until the single count shuffle (partial-aggregated)."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.token_count("text").alias("n_tokens"))


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_text,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> list_contains(['the','a','of','and','to','in','is','that'], x)))
                  AS BIGINT) AS sw_hits
      FROM documents)
    SELECT doc_id, n_chars_text, n_tokens,
           CAST(sw_hits AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)
             AS stopword_ratio
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: length, token count, stopword ratio — all
    codegen'd column expressions (see operators.text.quality_features
    for the full feature set)."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_text"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        TX.stopword_ratio("text").alias("stopword_ratio"),
    )


@query(
    "text_fingerprint",
    oracle="SELECT doc_id, md5(lower(trim(text))) AS content_hash FROM documents",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("content_hash"))


def _langid_oracle() -> str:
    """DuckDB twin of operators.text.lang_id — the heuristic is a
    DETERMINISTIC closed form (per-language stopword hit counts →
    argmax with (hits, lang) tuple order, 'und' on zero evidence), so
    it gets a full differential oracle rather than the rows-only check
    it shipped with (round-6 promotion). The VALUES table is generated
    from the same LANG_STOPWORDS constant the Spark operator reads."""
    from ..operators.text import LANG_STOPWORDS

    vals = ", ".join(
        "('{}', [{}])".format(
            lang, ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    hits AS (
      SELECT doc_id, l.lang,
             len(list_filter(t, x -> list_contains(l.words, x))) AS h
      FROM toks, (VALUES {vals}) AS l(lang, words)
    ),
    best AS (
      SELECT doc_id, MAX({{'h': h, 'l': lang}}) AS b
      FROM hits GROUP BY doc_id
    )
    SELECT CASE WHEN b.h > 0 THEN b.l ELSE 'und' END AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM best GROUP BY 1
    """


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (operators.text.lang_id) → per-language
    document counts. Promoted to a full DuckDB-hash oracle in round 6:
    the classifier is an identical closed-form argmax on both engines
    (ties break by the (hits, lang) tuple order — Spark array_max over
    structs == DuckDB MAX over structs)."""
    d = _docs(spark, sf_dir)
    return (
        TX.lang_id(d)
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@query(
    "sql_function_surface",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens,
           md5(lower(trim(text))) AS content_hash
    FROM documents
    """,
)
def sql_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's registered SQL UDFs driven purely through
    ``spark.sql`` — proves the SQL surface exists and that the SQL-UDF
    bodies inline (no Python boundary; see functions/register.py)."""
    from ..functions import register_sql_functions

    register_sql_functions(spark)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT doc_id,
               dit_token_count(text) AS n_tokens,
               dit_fingerprint(text) AS content_hash
        FROM documents
        """
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term <> '' GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS score
      FROM tf, dfreq, n WHERE tf.term = dfreq.term),
    ranked AS (
      SELECT doc_id, term, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term) AS BIGINT) AS rk
      FROM scored)
    SELECT doc_id, term, score, rk FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the keyword-extraction /
    feature-weighting primitive. Shape: explode → (doc,term) partial
    agg → term-level doc-frequency agg (tiny, broadcasts back) → one
    window per doc. The corpus-size scalar rides a 1-row broadcast
    cross join, never a collect. Window ORDER BY uses the ROUNDED
    score + term tie-break so ranks match the oracle exactly (raw
    ln() differs in final ulps across libms)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "score", "rk")
    )


@query(
    "text_bigram_freq",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term,
             generate_subscripts(list_filter(string_split_regex(lower(text), '\\s+'),
                                             x -> x <> ''), 1) AS pos
      FROM documents),
    big AS (
      SELECT term || ' ' || LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos)
               AS bigram
      FROM tok)
    SELECT bigram, COUNT(*) AS cnt FROM big
    WHERE bigram IS NOT NULL
    GROUP BY bigram HAVING COUNT(*) >= 20
    """,
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (n-gram LM / collocation prep). The
    Spark side pairs adjacent tokens ARRAY-SIDE (zip_with over two
    slices) — zero per-document shuffle, unlike the oracle's
    LEAD-window formulation which must cluster by doc; only the final
    bigram count shuffles, partial-aggregated."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    # zip_with over two slices — NOT transform with get(toks, i+1),
    # which re-embeds the whole tokenize expression per element and
    # makes the row O(tokens²) (measured 4.1s → 0.6s at sf0.1)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 20)
    )


@query(
    "text_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE) END AS repetition
    FROM t
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-token ratio per document — the boilerplate/stuffing
    signal quality filters gate on. Pure column expressions, no
    shuffle at all."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.repetition_ratio("text").alias("repetition"),
    )


@query(
    "text_contamination_check",
    oracle="""
    WITH toklist AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(toks) AS term,
             generate_subscripts(toks, 1) AS pos
      FROM toklist),
    tri AS (
      SELECT doc_id,
             term || ' ' || LEAD(term, 1) OVER w || ' '
                  || LEAD(term, 2) OVER w AS gram
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    grams AS (SELECT DISTINCT doc_id, gram FROM tri WHERE gram IS NOT NULL),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    scored AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      FROM grams g LEFT JOIN bench b ON g.gram = b.gram
      WHERE g.doc_id % 50 <> 0
      GROUP BY g.doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination
    FROM scored
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scores: the held-out slice (doc_id % 50
    = 0) plays the eval suite; every training doc reports the fraction
    of its distinct trigrams that leak from it. The benchmark gram set
    broadcasts (eval suites stay small at any corpus scale); the
    corpus explodes locally and never shuffles before the per-doc
    aggregate."""
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return TX.contamination_scores(train, bench)


@query(
    "text_pii_scrub",
    oracle="""
    WITH synth AS (
      SELECT c_custkey,
             'reach ' || c_name || ' at '
               || lower(replace(c_name, '#', '.')) || '@corp.example'
               || ' or call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               AS contact
      FROM customer)
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(contact,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b555-\\d{4}\\b', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(contact,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
              + len(regexp_extract_all(
                  regexp_replace(contact,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'),
                  '\\b555-\\d{4}\\b'))
              AS BIGINT) AS n_redactions
    FROM synth
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails + phone-shaped tokens) — the corpus text
    carries no PII, so both engines synthesize the same contact string
    from customer fields and the differential check exercises the
    actual scrub regexes. Pure regexp codegen, no shuffle."""
    c = read_table(spark, sf_dir, "customer")
    synth = c.select(
        "c_custkey",
        F.concat(
            F.lit("reach "),
            F.col("c_name"),
            F.lit(" at "),
            F.lower(F.regexp_replace("c_name", "#", ".")),
            F.lit("@corp.example or call 555-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ).alias("contact"),
    )
    return TX.pii_scrub(synth, "contact").select(
        "c_custkey", "scrubbed", "n_redactions"
    )


@query(
    "text_readability_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                      1) AS n_sentences,
             greatest(CAST(len(list_filter(
                 string_split_regex(lower(text), '\\s+'), x -> x <> ''))
               AS BIGINT), 1) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_sentences, n_words, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             AS flesch_score
    FROM t
    """,
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a vowel-group syllable
    proxy (``[aeiouy]+`` runs — the standard cheap estimator).
    Sentence/word/syllable counts are integers from identical regexes
    (plain character classes behave the same under Java regex and
    RE2), and the score is the identical float expression over
    identical integers — bit-equal cross-engine, no rounding needed.

    Scale shape: pure per-row codegen — counting regex matches never
    materializes the match arrays into a shuffle.
    """
    d = _docs(spark, sf_dir)
    n_sent = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")).cast("bigint"),
        F.lit(1),
    )
    n_words = F.greatest(TX.token_count("text"), F.lit(1))
    n_syll = F.size(
        F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("bigint")
    t = d.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    )
    return t.withColumn(
        "flesch_score",
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double")),
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_replace(lower(text), '[aeiou\\s]', '', 'g'))
                AS BIGINT) AS n_consonant_chars
    FROM documents
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark's vectorized batch
    transfer, ~10-100x over row-at-a-time pickling): counts
    non-vowel, non-space characters in Python while the oracle does
    the same with a regex — proving the Python-side semantics line up
    exactly with the SQL twin. The registry's ONLY row-logic Python
    UDF, and deliberately so: everything expressible stays JVM-side
    (CLAUDE.md scale rules); this entry documents the escape hatch
    done right.

    Scale shape: Arrow batches stream through the Python worker
    pinned to the scan — no shuffle; throughput bounded by the Python
    worker pool (spark.sql.execution.arrow.maxRecordsPerBatch tunes
    batch amortization).
    """
    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def n_consonant_chars(text: str) -> int:
        if text is None:
            return None
        # NO \v here: the oracle's regex class [aeiou\s] is RE2 \s =
        # [\t\n\f\r ], which excludes vertical tab — the drop sets must
        # match character-for-character or a \v in any document counts
        # differently on the two sides.
        drop = set("aeiou \t\n\r\f")
        return sum(1 for ch in text.lower() if ch not in drop)

    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", n_consonant_chars("text").alias("n_consonant_chars"))


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ),
    freqs AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freqs),
    scored AS (
      SELECT t.doc_id,
             CAST(ln(CAST(f.cnt AS DOUBLE) / CAST(total.total AS DOUBLE))
                  AS DECIMAL(18,9)) AS logp
      FROM toks t JOIN freqs f ON t.tok = f.tok, total
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(logp) AS DOUBLE) AS sum_logprob,
           CAST(SUM(logp) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model score per document: each token
    contributes ln(corpus_freq/total); low average log-probability
    flags unusual/garbage text — the cheap perplexity proxy used in
    corpus filtering. Each term is an identical double (a log of a
    quotient of identical bigints) QUANTIZED to DECIMAL(18,9) before
    summation, so the per-doc sum is decimal-exact and
    order-independent — a raw float SUM over thousands of log terms
    differs in final ulps by partition order (the CLAUDE.md dsum rule,
    applied to logs).

    Scale shape: the frequency table is a map-side-combinable count;
    the (token → logp) join is broadcast-size for real vocabularies;
    the final per-doc sum shares the doc_id grouping with the explode.
    """
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    freqs = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freqs.agg(F.sum("cnt").cast("bigint").alias("total"))
    scored = (
        toks.join(F.broadcast(freqs), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(
                F.col("cnt").cast("double") / F.col("total").cast("double")
            ).cast("decimal(18,9)").alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("logp").cast("double").alias("sum_logprob"),
        (F.sum("logp").cast("double") / F.count(F.lit(1))).alias(
            "avg_logprob"
        ),
    )


@query(
    "text_chunk_dedup_crossdoc",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    k AS (
      SELECT doc_id, toks,
             unnest(generate_series(
               0, CAST(ceil(len(toks) / 10.0) AS INT) - 1)) AS k
      FROM t
    ),
    ch AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, k * 10 + 1, k * 10 + 10), ' ')
               AS chunk
      FROM k
    ),
    g AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY chunk
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN g.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks
    FROM ch c JOIN g USING (chunk) GROUP BY c.doc_id
    """,
)
def text_chunk_dedup_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style chunk-level cross-document dedup signal:
    split each document into non-overlapping 10-token chunks, count per
    doc how many of its chunks also occur in ANOTHER document. The
    downstream scrub drops or rewrites those chunks; this emits the
    per-doc audit (total chunks, shared chunks).

    Scale shape: chunking is array math on the scan (no HOF
    re-embedding: ``toks`` is bound as a column before the transform);
    the global chunk census is one hash groupBy on the chunk string —
    at 100 TB you'd pre-hash chunks to 128-bit digests so the shuffle
    carries 16-byte keys, which is the only change this plan needs.
    Exact string equality both sides; counts are integers."""
    d = _docs(spark, sf_dir)
    d2 = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    nch = F.ceil(F.size("toks") / F.lit(10.0)).cast("int")
    chunks = F.when(
        nch > 0,
        F.transform(
            F.sequence(F.lit(0), nch - 1),
            lambda k: F.array_join(F.slice(F.col("toks"), k * 10 + 1, 10), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ch = d2.select("doc_id", F.explode(chunks).alias("chunk"))
    g = ch.groupBy("chunk").agg(
        F.count_distinct(F.col("doc_id")).alias("ndocs")
    )
    return (
        ch.join(g, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).alias(
                "n_shared_chunks"
            ),
        )
    )


@query(
    "text_token_estimate_regex",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_ish,
           CAST(len(regexp_extract_all(lower(text), '[a-z]{5,}'))
                AS BIGINT) AS n_long_words
    FROM documents
    """,
)
def text_token_estimate_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token-count estimate — the budget sizer that whitespace
    counting undershoots: a GPT-2-style pre-tokenizer class (letter
    runs | single digits | punctuation) counted per document, plus the
    long-word count that correlates with subword splits. Pure
    ``regexp_count`` codegen (the identical RE2-compatible class on
    both engines), no explode, no shuffle — per-row scan math."""
    d = _docs(spark, sf_dir)
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.regexp_count(low, F.lit("[a-z]+|[0-9]|[^a-z0-9 ]"))
        .cast("bigint")
        .alias("n_bpe_ish"),
        F.regexp_count(low, F.lit("[a-z]{5,}")).cast("bigint").alias(
            "n_long_words"
        ),
    )


# ---------------------------------------------------------------------------
# Vocabulary richness: hapax legomena per language
# ---------------------------------------------------------------------------


@query(
    "text_hapax_ratio",
    oracle=r"""
    WITH tok AS (
      SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (
      SELECT lang, term, COUNT(*) AS freq FROM tok GROUP BY lang, term
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(freq) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dis,
           CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS hapax_ratio
    FROM tf GROUP BY lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness profile per language: hapax legomena (terms
    seen exactly once) and dis legomena (exactly twice) over the corpus
    vocabulary — the lexical-diversity signal a training-data curation
    pass uses to spot boilerplate-heavy vs organic text. Pure integer
    counts; the ratio is one division of identical integers.

    Scale shape: tokenize → per-(lang, term) count (one shuffle,
    map-side combinable) → per-lang rollup of the vocabulary grain.
    The vocabulary frame is the only shuffled data after the first
    aggregate; raw text never moves twice.
    """
    d = _docs(spark, sf_dir)
    tf = (
        d.select("lang", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("freq").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dis"),
        (
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("hapax_ratio"),
    )


# ---------------------------------------------------------------------------
# Zipf's law: log-log slope of the top-100 rank-frequency curve
# ---------------------------------------------------------------------------


@query(
    "text_zipf_rank_slope",
    oracle=r"""
    WITH tf AS (
      SELECT term, COUNT(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS term
        FROM documents
      ) GROUP BY term
    ),
    top AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rnk
      FROM tf QUALIFY rnk <= 100
    ),
    pts AS (
      SELECT CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(20,11)) AS x,
             CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(20,11)) AS y,
             CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(freq AS DOUBLE))
                  AS DECIMAL(20,11)) AS xy,
             CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))
                  AS DECIMAL(20,11)) AS xx
      FROM top
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS zipf_slope
    FROM s
    """,
)
def text_zipf_rank_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) against ln(rank) for
    the corpus's top-100 terms (natural text sits near −1; heavily
    templated/duplicated corpora flatten). Determinism: ranks and
    frequencies are exact integers; each ln/product is an identical
    double expression on both engines (ln is correctly rounded; DuckDB
    `ln`, never its base-10 `log` — CLAUDE.md), then every point is
    quantized to DECIMAL(20,11) before summing so the Σ is
    order-independent and its integer form stays < 2^53 for the
    decimal→double cast. Final slope rounded to 6.

    Scale shape: term counting is the one big shuffle; the top-100 is a
    distributed TakeOrdered (orderBy+limit), and the regression runs on
    a 100-row frame. QUALIFY-style rank windows never see the full
    vocabulary on the Spark side.
    """
    d = _docs(spark, sf_dir)
    tf = (
        d.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top100 = tf.orderBy(F.desc("freq"), F.asc("term")).limit(100)
    ranked = top100.withColumn(
        # bounded: runs on the 100-row limited frame above
        "rnk", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term")))
    )
    lx = F.log(F.col("rnk").cast("double"))
    ly = F.log(F.col("freq").cast("double"))
    pts = ranked.select(
        lx.cast("decimal(20,11)").alias("x"),
        ly.cast("decimal(20,11)").alias("y"),
        (lx * ly).cast("decimal(20,11)").alias("xy"),
        (lx * lx).cast("decimal(20,11)").alias("xx"),
    )
    s = pts.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
    )
    return s.select(
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Cross-source vocabulary overlap (Jaccard over term sets)
# ---------------------------------------------------------------------------


@query(
    "text_vocab_overlap_sources",
    oracle=r"""
    WITH tok AS (
      SELECT DISTINCT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    sz AS (
      SELECT source, COUNT(*) AS vocab FROM tok GROUP BY source
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b
        ON a.term = b.term AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b,
           CAST(sa.vocab AS BIGINT) AS vocab_a,
           CAST(sb.vocab AS BIGINT) AS vocab_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common AS DOUBLE)
             / (sa.vocab + sb.vocab - i.n_common) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    WHERE i.n_common * 4 >= (sa.vocab + sb.vocab - i.n_common) * 3
    """,
)
def text_vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (reported above 75%
    overlap — the integer-math threshold 4·|∩| ≥ 3·|∪|): the corpus-
    level contamination/redundancy signal that says two "different"
    sources are really the same crawl. Jaccard itself is one division
    of identical exact integers.

    Scale shape: the corpus collapses to the DISTINCT (source, term)
    grain first; the pair counting joins on term, where each term
    contributes at most |sources|² bounded pairs (sources are a small
    domain) — so the join output is vocab-linear, never corpus-
    quadratic. Per-source vocab sizes broadcast back onto the pair
    list.
    """
    d = _docs(spark, sf_dir)
    tok = (
        d.select("source", F.explode(TX.tokens("text")).alias("term"))
        .distinct()
        .transform(pin, eager=False)
    )
    sz = tok.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    out = (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .filter(
            F.col("n_common") * 4
            >= (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")) * 3
        )
    )
    return out.select(
        "src_a",
        "src_b",
        F.col("vocab_a").cast("bigint").alias("vocab_a"),
        F.col("vocab_b").cast("bigint").alias("vocab_b"),
        F.col("n_common").cast("bigint").alias("n_common"),
        (
            F.col("n_common").cast("double")
            / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# KL divergence of each source's unigram distribution from the corpus mix
# ---------------------------------------------------------------------------


@query(
    "text_kl_source_vs_corpus",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    cst AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tok GROUP BY source, term
    ),
    ns AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst GROUP BY source
    ),
    ct AS (
      SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst GROUP BY term
    ),
    nn AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cst)
    SELECT cst.source,
           CAST(MAX(ns.n_s) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           ROUND(SUM(
             (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
             * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                  / (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)))
           ), 6) AS kl_from_corpus
    FROM cst
    JOIN ns USING (source)
    JOIN ct USING (term)
    CROSS JOIN nn
    GROUP BY cst.source
    """,
)
def text_kl_source_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    whole-corpus distribution — the distribution-shift monitor for a
    training-data mix (a source whose KL spikes is drifting away from
    the blend it was weighted for). The corpus is the mixture, so every
    source term has corpus support and no smoothing is needed; counts
    are exact bigints, p/q are identical double divisions, and only the
    per-source sum of ln-terms is float-order-sensitive — pinned with
    ROUND(6) on both sides (drift is ~1e-13 at this vocab size).

    Scale shape: the corpus collapses to (source, term) counts with
    map-side combine; marginals reuse that aggregate (term shuffle =
    vocab-sized, source/total aggregates broadcast back). No per-row
    second pass over documents.
    """
    d = _docs(spark, sf_dir)
    tok = d.select("source", F.explode(TX.tokens("text")).alias("term"))
    cst = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    )
    cst = cst.transform(pin, eager=False)
    ns = cst.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("n_s"))
    ct = cst.groupBy("term").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    nn = cst.agg(F.sum("c_st").cast("bigint").alias("n"))
    p = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_t").cast("double") / F.col("n").cast("double")
    joined = (
        cst.join(ct, "term")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nn))
    )
    return joined.groupBy("source").agg(
        F.max("n_s").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.round(F.sum(p * F.log(p / q)), 6).alias("kl_from_corpus"),
    )


# ---------------------------------------------------------------------------
# Trigram novelty per source (how much n-gram mass is source-exclusive?)
# ---------------------------------------------------------------------------


@query(
    "text_trigram_novelty_per_source",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term,
             generate_subscripts(list_filter(string_split_regex(lower(text), '\\s+'),
                                             x -> x <> ''), 1) AS pos
      FROM documents),
    tri AS (
      SELECT source,
             term || ' ' || LEAD(term) OVER w || ' ' || LEAD(term, 2) OVER w
               AS trigram
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    st AS (
      SELECT DISTINCT source, trigram FROM tri WHERE trigram IS NOT NULL),
    ns AS (
      SELECT trigram, COUNT(*) AS nsrc FROM st GROUP BY trigram)
    SELECT st.source,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN ns.nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exclusive,
           CAST(SUM(CASE WHEN ns.nsrc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty_share
    FROM st JOIN ns ON st.trigram = ns.trigram
    GROUP BY st.source
    """,
)
def text_trigram_novelty_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trigram novelty: the share of a source's distinct
    word-trigrams that appear in NO other source — high novelty means
    the source contributes genuinely new phrasing to the corpus; low
    novelty flags near-duplicate scrapes worth down-weighting in the
    mixture. The share is a quotient of identical bigints (bit-equal
    cross-engine, no rounding needed).

    Spark builds trigrams ARRAY-SIDE (zip_with over three slices — the
    bigram lesson: never re-embed the tokenize expression inside a HOF
    lambda), so no per-doc window; the oracle uses the LEAD-window
    formulation, a genuine differential check.

    Scale shape: explode → (source, trigram) distinct (map-side
    combine) → trigram-keyed count + join back — two shuffles on the
    trigram key, both partial-aggregated; no corpus-sized window, no
    driver-side state.
    """
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n2 = F.greatest(F.size(toks) - 2, F.lit(0))
    tri = F.zip_with(
        F.slice(toks, 1, n2),
        F.zip_with(
            F.slice(toks, 2, n2),
            F.slice(toks, 3, n2),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    st = (
        d.select("source", F.explode(tri).alias("trigram"))
        .distinct()
    )
    ns = st.groupBy("trigram").agg(F.count(F.lit(1)).alias("nsrc"))
    j = st.join(ns, "trigram")
    excl = F.sum(F.when(F.col("nsrc") == 1, 1).otherwise(0))
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        excl.cast("bigint").alias("n_exclusive"),
        (excl.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "novelty_share"
        ),
    )


# ---------------------------------------------------------------------------
# Feature-hashing document vectors (hashed bag-of-words)
# ---------------------------------------------------------------------------


@query(
    "text_feature_hashing_bow",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(CAST(CONCAT('0x', substring(md5(term), 1, 6)) AS BIGINT) % 16
                AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM tok GROUP BY doc_id, dim
    """,
)
def text_feature_hashing_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (the "hashing trick") document vectors: each
    token hashes into one of 16 dimensions via md5, and the document's
    sparse bag-of-words vector is the per-dimension token count —
    vocabulary-free featurization that needs NO global dictionary
    build, which is what makes it the 100 TB-friendly text vectorizer
    (a learned vocab is a second full pass + a broadcast dictionary).
    md5 gives identical dimension assignment on both engines.

    Scale shape: explode → (doc, dim) count with map-side combine —
    one shuffle keyed by (doc_id, dim); output is the sparse COO form
    downstream ANN/classifiers consume. The doc_id < 200 cap only
    bounds the ORACLE's output for the gate; the operator itself is a
    full-corpus scan shape.
    """
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    dim = F.expr(
        "CAST(CAST(conv(substring(md5(term), 1, 6), 16, 10) AS BIGINT) % 16"
        " AS INT)"
    )
    return tok.groupBy("doc_id", dim.alias("dim")).agg(
        F.count(F.lit(1)).cast("bigint").alias("weight")
    )


@query(
    "text_token_length_histogram",
    oracle="""
    WITH t AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n
      FROM documents
    )
    SELECT source, CAST(least(n // 50, 8) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM t GROUP BY source, bucket
    """,
)
def text_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per source in fixed 50-token buckets
    (capped at bucket 8) — the context-window sizing report every
    training pipeline reads before choosing sequence length and packing
    strategy. Pure integer bucket math (DIV, no float log), map-side
    combinable aggregate over source × 9 buckets."""
    d = read_table(spark, sf_dir, "documents").select(
        "source", TX.token_count("text").alias("n")
    )
    return (
        d.select(
            "source",
            F.least(F.expr("n DIV 50"), F.lit(8).cast("bigint")).alias(
                "bucket"
            ),
            "n",
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )


@query(
    "text_bigram_conditional_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT source, t[i] AS x, t[i+1] AS y
      FROM tok, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    cxy AS (
      SELECT source, x, y, CAST(COUNT(*) AS BIGINT) AS cxy
      FROM big GROUP BY source, x, y
    ),
    cx AS (
      SELECT source, x, CAST(SUM(cxy) AS BIGINT) AS cx
      FROM cxy GROUP BY source, x
    ),
    terms AS (
      SELECT cxy.source,
             cxy.cxy * CAST(ln(CAST(cx.cx AS DOUBLE) / CAST(cxy.cxy AS DOUBLE))
                            AS DECIMAL(18,9)) AS term,
             cxy.cxy AS n
      FROM cxy JOIN cx ON cx.source = cxy.source AND cx.x = cxy.x
    )
    SELECT source, CAST(SUM(n) AS BIGINT) AS n_bigrams,
           CAST(SUM(term) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
             AS cond_entropy_nats
    FROM terms GROUP BY source
    """,
)
def text_bigram_conditional_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bigram conditional entropy H(next | current) per source, in nats
    — the n-gram language-model predictability metric (low entropy =
    repetitive/templated text; a corpus-quality signal next to the
    repetition ratio). H = Σ (c_xy/N)·ln(c_x/c_xy) with c_x the
    bigram-start marginal. Each term is an identical double (a log of
    a quotient of identical bigints) QUANTIZED to DECIMAL(18,9) before
    the integer-weighted decimal sum — the text_unigram_logprob
    discipline — so the accumulation is order-independent. The mean is
    emitted UNROUNDED: the decimal sum's 1e-9 granularity makes
    sum/n sit exactly on ROUND boundaries for a third of the sources
    (engines' ROUND disagrees there — the CLAUDE.md rule, observed as
    systematic 1e-9 hash diffs); the raw division of identical exact
    values is already bit-deterministic.

    Scale shape: bigrams pair array-side (zip_with over two slices,
    the text_bigram_freq pattern — no per-doc window); the (source, x,
    y) and (source, x) counts are map-side-combinable aggregates; the
    marginal joins back on the aggregated bigram-type grain (vocab²
    bounded), never the raw corpus."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
    )
    big = d.select("source", F.explode(bigrams).alias("b")).select(
        "source", F.col("b.x").alias("x"), F.col("b.y").alias("y")
    )
    cxy = big.groupBy("source", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    cx = cxy.groupBy("source", "x").agg(
        F.sum("cxy").cast("bigint").alias("cx")
    )
    terms = cxy.join(cx, ["source", "x"]).select(
        "source",
        (
            # cxy must shrink to decimal(10,0) before the multiply: a
            # raw bigint widens to decimal(20,0) and 20+18+1 > 38 makes
            # Spark REDUCE THE SCALE to fit (silent 9→8 digit loss,
            # observed as ~1e-7 sum drift vs DuckDB); decimal(10,0)
            # keeps the product exact at (29,9)
            F.col("cxy").cast("decimal(10,0)")
            * F.log(
                F.col("cx").cast("double") / F.col("cxy").cast("double")
            ).cast("decimal(18,9)")
        ).alias("term"),
        F.col("cxy").alias("n"),
    )
    return terms.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_bigrams"),
        (
            F.sum("term").cast("double") / F.sum("n").cast("bigint")
        ).alias("cond_entropy_nats"),
    )


@query(
    "text_js_divergence_sources",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    cst AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tok GROUP BY source, term
    ),
    ns AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst GROUP BY source
    ),
    ct AS (
      SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst GROUP BY term
    ),
    nn AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cst),
    grid AS (
      SELECT ns.source, ns.n_s, ct.term, ct.c_t,
             COALESCE(cst.c_st, 0) AS c_st
      FROM ns CROSS JOIN ct
      LEFT JOIN cst ON cst.source = ns.source AND cst.term = ct.term
    ),
    terms AS (
      SELECT source,
             CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE) AS p,
             CAST(c_t AS DOUBLE) / CAST(n.n AS DOUBLE) AS q
      FROM grid CROSS JOIN nn n
    )
    SELECT source,
           ROUND(SUM(
             0.5 * (CASE WHEN p > 0
                         THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END)
             + 0.5 * q * ln(2.0 * q / (p + q))
           ), 6) AS jsd_from_corpus
    FROM terms GROUP BY source
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's unigram distribution
    from the corpus — the SYMMETRIC, bounded (≤ ln 2) sibling of
    text_kl_source_vs_corpus (KL explodes on source-only terms; JSD's
    mixture denominator keeps every term finite, so it ranks source
    drift even with disjoint vocab tails). Identical float expression
    over identical integer count ratios on both engines, ROUND 6 (the
    KL key's discipline — composed-float rule).

    Scale shape: the per-source × corpus-vocab grid is |sources| ×
    |vocab| rows (domain-bounded, never corpus-grain); counts partial-
    aggregate map-side; the corpus total rides a 1-row broadcast."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(TX.tokens("text")).alias("term"))
    cst = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    )
    ns = cst.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("n_s"))
    ct = cst.groupBy("term").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    nn = cst.agg(F.sum("c_st").cast("bigint").alias("n"))
    grid = (
        ns.crossJoin(ct)
        .join(cst, ["source", "term"], "left")
        .select(
            "source",
            "n_s",
            "c_t",
            F.coalesce("c_st", F.lit(0)).alias("c_st"),
        )
        .crossJoin(F.broadcast(nn))
    )
    p = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_t").cast("double") / F.col("n").cast("double")
    term = F.lit(0.5) * F.when(
        p > 0, p * F.log(F.lit(2.0) * p / (p + q))
    ).otherwise(F.lit(0.0)) + F.lit(0.5) * q * F.log(
        F.lit(2.0) * q / (p + q)
    )
    return grid.select("source", term.alias("t")).groupBy("source").agg(
        F.round(F.sum("t"), 6).alias("jsd_from_corpus")
    )


@query(
    "quality_hashed_classifier_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    scored AS (
      SELECT doc_id, ANY_VALUE(source) AS source,
             CAST(SUM(
               (CAST('0x' || substr(md5('w-' || CAST(
                    CAST('0x' || substr(md5(term), 1, 6) AS BIGINT) % 64
                  AS VARCHAR)), 1, 15) AS BIGINT) % 2001) - 1000
             ) AS BIGINT) AS score
      FROM tok GROUP BY doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(SUM(score) AS BIGINT) AS sum_score,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM scored GROUP BY source
    """,
)
def quality_hashed_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, the way CCNet/GPT-3-style corpus
    pipelines gate documents: a linear classifier over feature-hashed
    bag-of-words scores every doc, and the per-source census reports
    how many clear the score>0 gate. The weight vector here is
    md5-derived (deterministic stand-in for learned weights — the
    serving machinery is identical: hash token → dim, sum dim weights),
    so the WHOLE scorer is exact int64 math the DuckDB twin replays
    bit-for-bit.

    Scale shape: scoring is one codegen'd expression per document —
    no vocabulary broadcast, no join, no per-doc shuffle (the score
    folds inside F.aggregate on the scan); only the |sources|-row
    census shuffles. The 100 TB quality-gate pass is therefore
    scan-bound, which is the point of the hashing trick."""
    d = _docs(spark, sf_dir)
    scored = d.select(
        "source", TX.hashed_linear_score(F.col("text")).alias("score")
    ).filter(F.size(TX.tokens("text")) > 0)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum("score").cast("bigint").alias("sum_score"),
        F.min("score").cast("bigint").alias("min_score"),
        F.max("score").cast("bigint").alias("max_score"),
    )


def _gopher_rules_oracle() -> str:
    from ..operators.text import ENGLISH_STOPWORDS

    en = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    return f"""
    WITH t AS (
      SELECT source, text,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    m AS (
      SELECT source,
             CAST(len(toks) AS BIGINT) AS n,
             CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                  AS BIGINT) AS sumlen,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                  AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks, x -> list_contains([{en}], x)))
                  AS BIGINT) AS stop_hits,
             n_chars,
             n_chars - CAST(length(regexp_replace(text, '[#!?]', '', 'g'))
                            AS BIGINT) AS sym
      FROM t
    ),
    r AS (
      SELECT source,
             CASE WHEN n BETWEEN 10 AND 2000 THEN 0 ELSE 1 END AS f_len,
             CASE WHEN 3 * n <= sumlen AND sumlen <= 12 * n
                  THEN 0 ELSE 1 END AS f_wordlen,
             CASE WHEN stop_hits >= 2 THEN 0 ELSE 1 END AS f_stop,
             CASE WHEN 10 * sym <= n_chars THEN 0 ELSE 1 END AS f_sym,
             CASE WHEN 5 * n_alpha >= 4 * n THEN 0 ELSE 1 END AS f_alpha
      FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_len + f_wordlen + f_stop + f_sym + f_alpha
                         = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(f_len) AS BIGINT) AS fail_len,
           CAST(SUM(f_wordlen) AS BIGINT) AS fail_wordlen,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stop,
           CAST(SUM(f_sym) AS BIGINT) AS fail_sym,
           CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha
    FROM r GROUP BY source
    """


@query("filter_gopher_quality_rules", oracle=_gopher_rules_oracle())
def filter_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style rule-based quality filtering — the
    standard pre-model gate battery for LLM training corpora: token
    count in [10, 2000], mean token length in [3, 12], ≥2 stopwords,
    symbol ratio ≤ 10%, and ≥80% alphabetic tokens. EVERY rule is
    decided in integer math (cross-multiplied ratios — 3n ≤ Σlen ≤
    12n, 10·sym ≤ chars, 5·alpha ≥ 4n), so no float boundary exists
    anywhere and the per-source pass/fail census hash-matches DuckDB
    exactly. Output includes the per-rule fail breakdown auditors
    actually want (which gate is dropping a source's docs).

    Scale shape: all five rules are codegen'd expressions over the
    token array of a single scan — no explode, no join, no per-doc
    shuffle; only the |sources|-row census aggregates."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n = F.size(toks).cast("bigint")
    sumlen = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x).cast("bigint"),
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast(
        "bigint"
    )
    sw = F.array(*[F.lit(w) for w in TX.ENGLISH_STOPWORDS])
    stop_hits = F.size(
        F.filter(toks, lambda x: F.array_contains(sw, x))
    ).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    sym = n_chars - F.length(F.regexp_replace("text", "[#!?]", "")).cast(
        "bigint"
    )
    fails = {
        "f_len": ~n.between(10, 2000),
        "f_wordlen": ~((3 * n <= sumlen) & (sumlen <= 12 * n)),
        "f_stop": stop_hits < 2,
        "f_sym": 10 * sym > n_chars,
        "f_alpha": 5 * n_alpha < 4 * n,
    }
    flagged = d.select(
        "source",
        *[F.when(c, 1).otherwise(0).alias(k) for k, c in fails.items()],
    )
    total_f = sum(F.col(k) for k in fails)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(total_f == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        *[
            F.sum(k).cast("bigint").alias("fail" + k[1:])
            for k in fails
        ],
    )


@query(
    "text_chunk_sliding_window",
    oracle="""
    WITH n AS (
      SELECT doc_id, text, length(text) AS n_chars,
             CAST((length(text) - 1) // 96 AS INT) + 1 AS n_chunks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_chunks - 1)) AS i
      FROM n
    ),
    ch AS (
      SELECT doc_id, i AS chunk_idx,
             CAST(i * 96 + 1 AS BIGINT) AS start_pos,
             substr(text, i * 96 + 1, 128) AS chunk
      FROM idx
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, start_pos,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           CAST('0x' || substr(md5(chunk), 1, 15) AS BIGINT) AS chunk_digest
    FROM ch
    """,
)
def text_chunk_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style sliding-window chunk materialization: every document
    becomes overlapping 128-char windows on a 96-char stride (32-char
    overlap carries context across boundaries), each chunk emitted with
    its provenance (doc_id, index, 1-based start offset) and a 60-bit
    md5-prefix digest — the retrieval corpus a vector indexer consumes,
    and the digest the chunk-level deduper joins on. Exact cross-engine:
    substr/length are char-based and md5 is bit-identical in both
    engines, so the oracle replays every chunk boundary and digest.

    Scale shape: pure narrow ops on the scan — sequence+explode then
    substring, no shuffle at all (the explode multiplies rows ~6x at
    this chunk/stride ratio but stays partition-local); at 100 TB the
    chunker is the map stage feeding the embedding UDF, and the digest
    keeps downstream dedup shuffles at 8 bytes/key."""
    d = _docs(spark, sf_dir)
    n_chunks = (
        (F.length("text") - 1) / F.lit(96)
    ).cast("int") + F.lit(1)
    ch = (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .withColumn(
            "chunk",
            F.expr("substring(text, chunk_idx * 96 + 1, 128)"),
        )
    )
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * 96 + 1).cast("bigint").alias("start_pos"),
        F.length("chunk").cast("bigint").alias("chunk_len"),
        F.conv(F.substring(F.md5("chunk"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("chunk_digest"),
    )


@query(
    "text_bm25_query_scores",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    dl AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ),
    gstats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
    ),
    q AS (SELECT unnest(['hash', 'join', 'vector', 'scan', 'merge'])
            AS term),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok JOIN q USING (term) GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (CAST(g.n_docs - df.df AS DOUBLE) + 0.5)
                        / (CAST(df.df AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * ((CAST(dl.dl AS DOUBLE)
                              * CAST(g.n_docs AS DOUBLE))
                              / CAST(g.sum_dl AS DOUBLE)))))
               AS s
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN gstats g
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           ROUND(SUM(s), 6) AS bm25
    FROM scored GROUP BY doc_id
    """,
)
def text_bm25_query_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Okapi, k1=1.2 b=0.75, Lucene idf) lexical retrieval scores
    for the 5-term query {hash, join, vector, scan, merge} — the
    sparse-retrieval half every hybrid RAG stack pairs with dense
    cosine. All inputs (tf, df, dl, N, Σdl) are exact integers; each
    per-term score is ONE identical float expression on both engines;
    the per-doc sum spans ≤5 terms and rounds to 6 (composed-float
    rule — verified at sf0.1).

    Scale shape: tf is a map-side-combinable groupBy AFTER a
    broadcast-semi-join on the 5-term query (the corpus-wide token
    explode is filtered before any shuffle); df and the global length
    stats are broadcast-sized; doc length joins on doc_id. At 100 TB
    this is the standard inverted-index build restricted to the query
    vocabulary."""
    terms = ["hash", "join", "vector", "scan", "merge"]
    d = read_table(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", F.explode(TX.tokens("text")).alias("term")
    )
    dl = toked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    glob = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toked.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(pin, eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dd = lambda c: c.cast("double")  # noqa: E731
    idf = F.log(
        F.lit(1.0)
        + (dd(F.col("n_docs") - F.col("df")) + 0.5)
        / (dd(F.col("df")) + 0.5)
    )
    norm = (dd(F.col("dl")) * dd(F.col("n_docs"))) / dd(F.col("sum_dl"))
    tfpart = (dd(F.col("tf")) * 2.2) / (
        dd(F.col("tf")) + 1.2 * (0.25 + 0.75 * norm)
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(glob))
        .select("doc_id", (idf * tfpart).alias("s"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
        F.round(F.sum("s"), 6).alias("bm25"),
    )


@query(
    "text_tfidf_keywords_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS MATERIALIZED (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             CAST(tf.tf AS DOUBLE)
               * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN nd n
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           ROUND(tfidf, 9) AS tfidf,
           CAST(rn AS INT) AS keyword_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY tfidf DESC, term) AS rn FROM scored)
    WHERE rn <= 3
    """,
)
def text_tfidf_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by TF-IDF
    (tf · ln(N/df), term tie-break) — the summarization/tagging
    primitive behind faceted corpus browsers and weak topic labels.
    tf/df/N are exact integers and the ranking replays exactly (a
    1-ulp ln() disagreement between libm builds cannot reorder terms
    whose exact scores differ); the reported score rounds to 9 because
    ln is not correctly-rounded identically across engines.

    Scale shape: tf is a map-side-combinable groupBy; df aggregates the
    already-compressed tf frame (pinned, reused for df and scoring);
    the top-k window partitions by doc_id — embarrassingly parallel,
    no global sort."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(pin, eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    tfidf = F.col("tf").cast("double") * F.log(
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "term", "tf", tfidf.alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.round("tfidf", 9).alias("tfidf"),
            F.col("rn").cast("int").alias("keyword_rank"),
        )
    )


@query(
    "quality_pareto_skyline_2d",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')))
               AS BIGINT) AS n_unique_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    w AS (
      SELECT doc_id, n_unique_tokens, n_chars,
             MIN(n_chars) OVER (PARTITION BY n_unique_tokens) AS min_eq,
             MIN(n_chars) OVER (ORDER BY n_unique_tokens DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS min_higher
      FROM f
    )
    SELECT doc_id, n_unique_tokens, n_chars
    FROM w
    WHERE n_chars = min_eq
      AND (min_higher IS NULL OR n_chars < min_higher)
    """,
)
def quality_pareto_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over (lexical richness ↑, length ↓): the documents
    no other document beats on both axes — maximal unique-token count
    for their size. The curation move behind 'best exemplars per
    budget' selection: anything OFF the skyline is dominated and can be
    dropped without losing the quality/cost frontier. Dominance is
    decided by two window MINs (strictly-richer frame + equal-richness
    partition), NOT an O(n²) pairwise join; all values exact integers.

    Scale shape (round-9): the dominance frontier depends only on the
    RICHNESS-GRAIN minima, so the windows run over the (n_unique →
    min chars) histogram — one map-side-combinable groupBy to
    value-grain rows (bounded by the richness domain, NOT by doc
    count), one ordered window over that tiny frame, and a broadcast
    join back onto the doc rows. The former row-grain
    ``Window.orderBy`` put every document through one task — the
    single-task wall at 100 TB."""
    d = _docs(spark, sf_dir)
    f = d.select(
        "doc_id",
        F.size(F.array_distinct(TX.tokens("text")))
        .cast("bigint")
        .alias("n_unique_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    g = f.groupBy("n_unique_tokens").agg(
        F.min("n_chars").alias("min_eq")
    )
    w_hi = Window.orderBy(F.col("n_unique_tokens").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    g2 = g.withColumn("min_higher", F.min("min_eq").over(w_hi))
    w2 = f.join(F.broadcast(g2), "n_unique_tokens")
    return w2.filter(
        (F.col("n_chars") == F.col("min_eq"))
        & (
            F.col("min_higher").isNull()
            | (F.col("n_chars") < F.col("min_higher"))
        )
    ).select("doc_id", "n_unique_tokens", "n_chars")


@query(
    "text_zipf_alpha_fit",
    oracle="""
    WITH tc AS (
      SELECT term, COUNT(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS term
        FROM documents)
      GROUP BY term
    ),
    ranked AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS r
      FROM tc
    ),
    pts AS (
      SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
      FROM ranked WHERE r <= 500
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           ROUND(-((sxy - sx * sy / n) / (sxx - sx * sx / n)), 6)
             AS zipf_alpha,
           ROUND((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx)
                 / n, 6) AS log_c
    FROM s
    """,
)
def text_zipf_alpha_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus token distribution: OLS of ln(freq)
    on ln(rank) over the top-500 ranks gives freq ≈ C·rank^(−α); a
    natural-text α sits near 1, and a corpus drifting away from its
    usual α is a strong contamination/generation-loop signal. The
    top-500 cap makes the float sums a FIXED-size reduction —
    scale-stable by construction — and the fitted α/ln C round to 6
    (composed-float rule; ranks and counts themselves are exact ints
    with a term tie-break at the cut).

    Scale shape: term counting is the map-side-combinable wordcount;
    the top-500 cut is one ORDER BY LIMIT over the already-aggregated
    vocabulary (TakeOrdered, no full sort); the regression reduces 500
    rows."""
    d = read_table(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # rank-filter (r <= 500): Catalyst rewrites to TakeOrdered(500)
    # BEFORE the window — the single partition sees 500 rows, bounded
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    pts = (
        tc.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 500)
        .select(
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ) / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    return s.select(
        F.col("n").cast("bigint").alias("n_ranks"),
        F.round(-slope, 6).alias("zipf_alpha"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("log_c"),
    )


@query(
    "text_bpe_top_merges",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                   i -> substr(word, i, 2))) AS pair
      FROM words
      WHERE length(word) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def text_bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge-induction step: the 20 most frequent adjacent
    character pairs inside words — exactly the statistic a tokenizer
    trainer computes each merge round (Sennrich et al. 2016, §3). The
    counts are exact integers with a lexicographic pair tie-break at
    the cut, so the top-20 is fully deterministic.

    Scale shape: the char-pair explode is a flatMap inside codegen
    (transform over sequence(1, len-1) of a MATERIALIZED word column —
    not a recomputed array expression, so it's O(len) per word); the
    count shuffles once with map-side partial aggregation and the
    top-20 is a TakeOrdered, never a full sort. Further merge rounds
    at cluster scale re-run the same shape over a re-paired corpus."""
    d = _docs(spark, sf_dir)
    words = d.select(F.explode(TX.tokens("text")).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1),"
                   " i -> substring(word, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@query(
    "text_normalize_clean",
    oracle="""
    WITH c1 AS (
      SELECT doc_id, length(text) AS raw_len,
             regexp_replace(text, '[^ -~]', '', 'g') AS ascii_only
      FROM documents
    ),
    c2 AS (
      SELECT doc_id, raw_len, length(ascii_only) AS ascii_len,
             trim(regexp_replace(ascii_only, '[ \t\n\r]+', ' ', 'g'))
               AS clean
      FROM c1
    )
    SELECT doc_id,
           CAST(raw_len AS BIGINT) AS raw_len,
           CAST(raw_len - ascii_len AS BIGINT) AS n_nonascii_removed,
           CAST(ascii_len - length(clean) AS BIGINT) AS n_ws_collapsed,
           CAST(length(clean) AS BIGINT) AS clean_len,
           md5(clean) AS clean_md5
    FROM c2
    """,
)
def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — the first stage of every curation
    pipeline: strip non-printable/non-ASCII bytes, collapse whitespace
    runs to single spaces, trim edges; report per-doc how much each
    stage removed plus an md5 of the CLEANED text, so the oracle
    proves the two engines' cleaners emit byte-identical output (not
    just equal lengths). Regex classes are chosen from the
    RE2 ∩ Java-regex common dialect ('[^ -~]', '[ \\t\\n\\r]+'); SQL
    trim strips spaces only, identically on both (CLAUDE.md rule).

    Scale shape: pure per-row codegen string work on the scan — no
    shuffle, runs at I/O speed; the md5 doubles as the exact-dedup key
    for the cleaned corpus downstream."""
    d = _docs(spark, sf_dir)
    c1 = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("raw_len"),
        F.regexp_replace("text", "[^ -~]", "").alias("ascii_only"),
    )
    c2 = c1.select(
        "doc_id",
        "raw_len",
        F.length("ascii_only").cast("bigint").alias("ascii_len"),
        F.trim(
            F.regexp_replace("ascii_only", "[ \t\n\r]+", " ")
        ).alias("clean"),
    )
    return c2.select(
        "doc_id",
        "raw_len",
        (F.col("raw_len") - F.col("ascii_len")).alias("n_nonascii_removed"),
        (F.col("ascii_len") - F.length("clean").cast("bigint")).alias(
            "n_ws_collapsed"
        ),
        F.length("clean").cast("bigint").alias("clean_len"),
        F.md5("clean").alias("clean_md5"),
    )


def _langid_confusion_oracle() -> str:
    """Actual × predicted confusion cells for the stopword langid —
    same closed-form classifier as _langid_oracle, joined back to the
    ground-truth ``lang`` column."""
    from ..operators.text import LANG_STOPWORDS

    vals = ", ".join(
        "('{}', [{}])".format(
            lang, ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    hits AS (
      SELECT toks.doc_id, toks.lang AS actual_lang, l.lang AS cand,
             len(list_filter(toks.t, x -> list_contains(l.words, x))) AS h
      FROM toks, (VALUES {vals}) AS l(lang, words)
    ),
    best AS (
      SELECT doc_id, MAX(actual_lang) AS actual,
             MAX({{'h': h, 'l': cand}}) AS b
      FROM hits GROUP BY doc_id
    )
    SELECT actual,
           CASE WHEN b.h > 0 THEN b.l ELSE 'und' END AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM best GROUP BY 1, 2
    """


@query("text_langid_confusion", oracle=_langid_confusion_oracle())
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX — the evaluation the classifier
    itself needs: actual ``lang`` × predicted cells, exact counts.
    Off-diagonal mass tells a curation run which language pairs the
    stopword heuristic confuses (and therefore where to distrust the
    language routing); the diagonal over row sums is per-language
    recall. Same deterministic argmax as text_langid, so the matrix
    inherits its full differential oracle.

    Scale shape: classify per doc (codegen HOFs over the token array),
    then one map-side-combinable groupBy to ≤ |langs|² cells."""
    d = _docs(spark, sf_dir)
    return (
        TX.lang_id(d)
        .groupBy(F.col("lang").alias("actual"), "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@query(
    "stats_cohens_kappa_langid",
    oracle=f"""
    WITH cells AS ({_langid_confusion_oracle()}),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM cells),
    rws AS (SELECT actual AS cat, CAST(SUM(n_docs) AS BIGINT) AS rn
            FROM cells GROUP BY 1),
    cls AS (SELECT pred_lang AS cat, CAST(SUM(n_docs) AS BIGINT) AS cn
            FROM cells GROUP BY 1),
    agr AS (SELECT CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS a
            FROM cells WHERE actual = pred_lang),
    rc AS (SELECT CAST(COALESCE(SUM(rn * cn), 0) AS BIGINT) AS rc
           FROM rws JOIN cls USING (cat))
    SELECT n, a AS n_agree,
           ROUND(CAST(a AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
           ROUND(CAST(rc AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)),
                 6) AS pe,
           ROUND((CAST(a AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(rc AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (1.0 - CAST(rc AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa
    FROM tot, agr, rc
    """,
)
def stats_cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the stopword langid against the ground-truth
    ``lang`` column — chance-corrected agreement, the metric that tells
    a curation run whether the language router beats marginal-frequency
    guessing (raw accuracy alone can't: a skewed corpus inflates it).

    Determinism: the confusion cells, marginals, agreement count and
    the row*col inner product are all exact integers (rn*cn <= n^2, far
    inside int64); po/pe/kappa are correctly-rounded +,-,*,/
    compositions of identical integers, ROUND 6.  The chance-agreement
    join only keeps categories present in BOTH marginals — absent
    categories contribute exactly 0, the standard kappa convention.

    Scale shape: the langid classification is per-doc codegen HOF work;
    ONE map-side-combinable groupBy to <= |langs|^2 cells, and all
    kappa math runs on that tiny domain frame."""
    d = _docs(spark, sf_dir)
    cells = (
        TX.lang_id(d)
        .groupBy(F.col("lang").alias("actual"), "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .transform(pin, eager=False)
    )
    tot = cells.agg(F.sum("n_docs").cast("bigint").alias("n"))
    rws = cells.groupBy(F.col("actual").alias("cat")).agg(
        F.sum("n_docs").cast("bigint").alias("rn")
    )
    cls = cells.groupBy(F.col("pred_lang").alias("cat")).agg(
        F.sum("n_docs").cast("bigint").alias("cn")
    )
    agr = cells.filter(F.col("actual") == F.col("pred_lang")).agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("bigint").alias("a")
    )
    rc = (
        rws.join(cls, "cat")
        .agg(
            F.coalesce(F.sum(F.col("rn") * F.col("cn")), F.lit(0))
            .cast("bigint")
            .alias("rc")
        )
    )
    return (
        tot.crossJoin(F.broadcast(agr))
        .crossJoin(F.broadcast(rc))
        .selectExpr(
            "n",
            "a AS n_agree",
            "ROUND(CAST(a AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po",
            "ROUND(CAST(rc AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe",
            "ROUND((CAST(a AS DOUBLE) / CAST(n AS DOUBLE)"
            " - CAST(rc AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
            " / (1.0 - CAST(rc AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa",
        )
    )


@query(
    "filter_blocklist_terms",
    oracle="""
    WITH hits AS (
      SELECT doc_id, source,
             len(list_filter(
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''),
               x -> list_contains(['merge', 'panic', 'leak', 'deadlock'],
                                  x))) AS n_hits
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS flagged_docs,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) * 5 >= COUNT(*)
             AS source_over_20pct
    FROM hits GROUP BY source
    """,
)
def filter_blocklist_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist content filter — the safety-screening shape of a
    curation run: exact token-boundary matches against a term list
    (here a stand-in vocabulary; production swaps the literal array
    for a broadcast blocklist at the same call site), rolled up to
    per-source flagged counts and a 20%-of-source escalation fence in
    integer cross-multiplication. Token-boundary matching (not
    substring LIKE) is the part that matters — 'leaky' must not hit
    'leak'.

    Scale shape: per-row codegen HOFs over the token array, no
    shuffle until the per-source rollup; a blocklist too large for a
    literal array becomes a broadcast hash join on exploded tokens."""
    d = _docs(spark, sf_dir)
    bl = F.array(*[F.lit(w) for w in ["merge", "panic", "leak", "deadlock"]])
    hits = d.select(
        "source",
        F.size(
            F.filter(TX.tokens("text"), lambda x: F.array_contains(bl, x))
        ).alias("n_hits"),
    )
    flagged = F.when(F.col("n_hits") > 0, 1).otherwise(0)
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(flagged).cast("bigint").alias("flagged_docs"),
        F.sum("n_hits").cast("bigint").alias("total_hits"),
        (F.sum(flagged) * 5 >= F.count(F.lit(1))).alias("source_over_20pct"),
    )


@query(
    "filter_quality_threshold_sweep",
    oracle=r"""
    WITH t AS (
      SELECT CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                  x -> list_contains(['the','a','of','and','to','in','is','that'], x)))
                  AS BIGINT) AS sw_hits
      FROM documents),
    b AS (SELECT least(9, (10 * sw_hits) // greatest(n_tokens, 1)) AS jmax,
                 n_tokens
          FROM t),
    h AS (SELECT jmax, CAST(COUNT(*) AS BIGINT) AS docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS toks
          FROM b GROUP BY jmax),
    g AS (SELECT unnest(generate_series(0, 9)) AS j)
    SELECT CAST(g.j AS INT) AS threshold_decile,
           CAST(COALESCE(SUM(h.docs), 0) AS BIGINT) AS n_docs_kept,
           CAST(COALESCE(SUM(h.toks), 0) AS BIGINT) AS n_tokens_kept
    FROM g LEFT JOIN h ON h.jmax >= g.j
    GROUP BY g.j
    """,
)
def filter_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point table for a curation filter: for every stopword-
    ratio threshold t = j/10 (j = 0..9), how many documents and tokens
    survive ``stopword_ratio >= t``. The sweep picks the keep-rate /
    budget trade-off BEFORE a full filtering run — the curve a curation
    team reads off to set the production threshold.

    Determinism: thresholds never touch floats — each doc's maximal
    surviving decile is the integer ``least(9, (10·sw_hits) DIV
    n_tokens)`` (the cross-multiplication rule; a ``ratio >= j/10``
    float compare would wobble at exact boundaries), and per-threshold
    totals are cumulative sums over that 10-bucket histogram.

    Scale shape: ONE scan with codegen'd token counting → a ≤10-row
    histogram; the sweep itself is a broadcast theta-join of two tiny
    frames (10 x ≤10 rows). Adding thresholds costs nothing."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    sw = F.array(*[F.lit(w) for w in TX.ENGLISH_STOPWORDS])
    feats = d.select(
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        .cast("bigint")
        .alias("sw_hits"),
    )
    b = feats.select(
        F.expr(
            "least(CAST(9 AS BIGINT),"
            " (10 * sw_hits) DIV greatest(n_tokens, CAST(1 AS BIGINT)))"
        ).alias("jmax"),
        "n_tokens",
    )
    h = b.groupBy("jmax").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
    )
    g = spark.range(0, 10).select(F.col("id").alias("j"))
    return (
        g.join(F.broadcast(h), F.col("jmax") >= F.col("j"), "left")
        .groupBy("j")
        .agg(
            F.coalesce(F.sum("docs"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_kept"),
            F.coalesce(F.sum("toks"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens_kept"),
        )
        .select(
            F.col("j").cast("int").alias("threshold_decile"),
            "n_docs_kept",
            "n_tokens_kept",
        )
    )


@query(
    "text_ttr_lexical_diversity",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id, t[1:50] AS w FROM toks WHERE len(t) >= 50
    )
    SELECT doc_id,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) * 2 >= 50
             AS is_diverse
    FROM win
    """,
)
def text_ttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio over a FIXED 50-token window — the lexical-
    diversity quality signal computed the scale-stable way: raw TTR
    shrinks with document length (Heaps' law), so comparing docs
    requires a fixed window, which also makes the numbers exact
    integers (distinct types among the first 50 tokens) and the
    diversity fence an integer cross-multiplication (types·2 ≥ 50 ⇔
    TTR ≥ 0.5). Low-TTR docs are template/keyword-stuffing suspects —
    composes with text_repetition_ratio.

    Scale shape: pure per-row array work in codegen; no shuffle."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", TX.tokens("text").alias("t")).where(
        F.size("t") >= 50
    )
    win = toks.select("doc_id", F.slice("t", 1, 50).alias("w"))
    return win.select(
        "doc_id",
        F.size(F.array_distinct("w")).cast("bigint").alias("n_types"),
        F.size("w").cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct("w")).cast("bigint") * 2 >= 50).alias(
            "is_diverse"
        ),
    )


def _langid_trigram_agreement_oracle() -> str:
    """Agreement matrix between the stopword classifier and a char-
    trigram profile classifier, both replayed in closed form."""
    from ..operators.text import LANG_STOPWORDS

    vals = ", ".join(
        "('{}', [{}])".format(
            lang, ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    return f"""
    WITH lowered AS (
      SELECT doc_id, lang, lower(text) AS lt FROM documents
    ),
    tris AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, length(lt) - 2),
                                   i -> substr(lt, i, 3))) AS tg
      FROM lowered WHERE length(lt) >= 3
    ),
    prof_cnt AS (
      SELECT lang, tg, COUNT(*) AS c FROM tris GROUP BY lang, tg
    ),
    prof AS (
      SELECT lang, tg FROM (
        SELECT lang, tg,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY c DESC, tg) AS rn
        FROM prof_cnt) WHERE rn <= 20
    ),
    doc_tris AS (SELECT DISTINCT doc_id, tg FROM tris),
    scores AS (
      SELECT d.doc_id, p.lang AS cand, COUNT(*) AS h
      FROM doc_tris d JOIN prof p ON d.tg = p.tg
      GROUP BY d.doc_id, p.lang
    ),
    best_tri AS (
      SELECT l.doc_id,
             MAX({{'h': s.h, 'l': s.cand}}) AS b
      FROM lowered l LEFT JOIN scores s ON l.doc_id = s.doc_id
      GROUP BY l.doc_id
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sw_hits AS (
      SELECT toks.doc_id, l.lang AS cand,
             len(list_filter(toks.t, x -> list_contains(l.words, x))) AS h
      FROM toks, (VALUES {vals}) AS l(lang, words)
    ),
    best_sw AS (
      SELECT doc_id, MAX({{'h': h, 'l': cand}}) AS b
      FROM sw_hits GROUP BY doc_id
    )
    SELECT CASE WHEN s.b.h > 0 THEN s.b.l ELSE 'und' END AS pred_stopword,
           CASE WHEN t.b.h IS NOT NULL AND t.b.h > 0 THEN t.b.l
                ELSE 'und' END AS pred_trigram,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM best_sw s JOIN best_tri t ON s.doc_id = t.doc_id
    GROUP BY 1, 2
    """


@query(
    "text_langid_trigram_agreement",
    oracle=_langid_trigram_agreement_oracle(),
)
def text_langid_trigram_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classifier-ensemble agreement: a SECOND language identifier
    (char-trigram profiles — top-20 trigrams per language learned from
    the labeled corpus itself, scored by distinct-trigram overlap,
    argmax with the (hits, lang) struct order) cross-tabulated against
    the stopword classifier. Off-diagonal cells are the docs where two
    independent cheap models disagree — exactly the docs a curation
    run routes to the expensive model. Every count, profile rank, and
    tie-break is integer-exact, so the full two-model pipeline
    hash-matches its SQL replay.

    Scale shape: trigram profile building is the wordcount shape
    (explode + map-side-combinable count + per-lang top-20 window on
    the aggregated vocab); scoring joins DISTINCT doc trigrams to the
    |langs|·20-row broadcast profile."""
    from ..operators.text import lang_id

    # _docs spreads the scan: both trigram explodes and the stopword
    # tokenization run cores-wide (guide §2.5)
    d = _docs(spark, sf_dir)
    lowered = d.select(
        "doc_id", "lang", F.lower("text").alias("lt")
    ).filter(F.length("lt") >= 3)
    tris = lowered.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(lt) - 2),"
                   " i -> substring(lt, i, 3))")
        ).alias("tg"),
    )
    prof_cnt = tris.groupBy("lang", "tg").agg(
        F.count(F.lit(1)).alias("c")
    )
    wprof = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("tg")
    )
    prof = (
        prof_cnt.withColumn("rn", F.row_number().over(wprof))
        .filter(F.col("rn") <= 20)
        .select(F.col("lang").alias("cand"), "tg")
    )
    # filter BEFORE the distinct (guide §2.3): the broadcast profile
    # join keeps only trigrams in some language's top-20, so the
    # distinct shuffles the tiny match set instead of every (doc,
    # trigram) pair of the corpus. distinct over (doc, cand, tg) ==
    # distinct (doc, tg) then join: both count each matching distinct
    # trigram once per language containing it.
    scores = (
        tris.select("doc_id", "tg")
        .join(F.broadcast(prof), "tg")
        .select("doc_id", "cand", "tg")
        .distinct()
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    best_tri = (
        d.select("doc_id")
        .join(scores, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("h").alias("h"), F.col("cand").alias("l"))
            ).alias("b")
        )
        .select(
            "doc_id",
            F.when(
                F.col("b.h").isNotNull() & (F.col("b.h") > 0), F.col("b.l")
            )
            .otherwise("und")
            .alias("pred_trigram"),
        )
    )
    sw = lang_id(d).select("doc_id", F.col("pred_lang").alias("pred_stopword"))
    return (
        sw.join(best_tri, "doc_id")
        .groupBy("pred_stopword", "pred_trigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@query(
    "text_compression_ratio_quality",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(1 AS INT) AS bands_partition_ok,
           CAST(1 AS INT) AS ratio_bounds_ok,
           CAST(1 AS INT) AS keep_majority_ok
    FROM documents GROUP BY source ORDER BY source
    """,
)
def text_compression_ratio_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compressibility-based quality census (operators/text.py
    compression_ratio) as a hash-oracled band-contract FENCE (promoted
    round 12 from the repo's last rows-only key — r11-verdict item 5,
    the same bound-as-value technique as the pruned-ANN recall
    fences). zlib/DEFLATE has no SQL twin, so the oracle replays the
    CONTRACT the zlib values must satisfy, per source:

    - ``bands_partition_ok``: the spam(<0.35) / keep / high(>1.05)
      band counts partition n_docs exactly (a NULL/NaN ratio or a
      dropped row flips it);
    - ``ratio_bounds_ok``: every ratio in (0.2, 2.0) — the real data
      spans [0.38, 1.13] at both sf0.01 and sf0.1, so a broken UDF
      (empty-string 1.0 default storm, byte/char confusion, level
      drift) flips it while genuine corpus variation never does;
    - ``keep_majority_ok``: 2·n_keep >= n_docs (observed >=247/250
      keep per source at sf0.1 — a quality-collapse regression flips
      it with enormous margin).

    Value-level zlib accuracy stays pinned by
    tests/test_text_quality.py::test_compression_ratio_* (exact
    Python zlib twin, determinism, fixture tails).

    Scale shape: one scan, per-doc CPU, map-side-combinable census."""
    from ..operators.text import compression_ratio

    d = read_table(spark, sf_dir, "documents")
    r = compression_ratio(d.select("source", "text"))
    lo, hi = 0.35, 1.05
    band = F.when(F.col("zlib_ratio") < lo, "spam").when(
        F.col("zlib_ratio") > hi, "high"
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(band == "spam", 1).otherwise(0)).alias("n_spam"),
            F.sum(
                F.when(
                    (F.col("zlib_ratio") >= lo)
                    & (F.col("zlib_ratio") <= hi),
                    1,
                ).otherwise(0)
            ).alias("n_keep"),
            F.sum(F.when(band == "high", 1).otherwise(0)).alias("n_high"),
            F.min("zlib_ratio").alias("rmin"),
            F.max("zlib_ratio").alias("rmax"),
        )
        .select(
            "source",
            "n_docs",
            (F.col("n_spam") + F.col("n_keep") + F.col("n_high")
             == F.col("n_docs")).cast("int").alias("bands_partition_ok"),
            ((F.col("rmin") > 0.2) & (F.col("rmax") < 2.0))
            .cast("int")
            .alias("ratio_bounds_ok"),
            (F.col("n_keep") * 2 >= F.col("n_docs"))
            .cast("int")
            .alias("keep_majority_ok"),
        )
        .orderBy("source")
    )


@query(
    "text_bigram_lm_heldout_nll",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, source, t[i] AS x, t[i+1] AS y
      FROM tok, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    trn AS (SELECT x, y FROM big WHERE doc_id % 5 <> 0),
    cxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy FROM trn
            GROUP BY 1, 2),
    cx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM cxy GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) + 1 AS v FROM trn),
    ho AS (
      SELECT source, x, y, CAST(COUNT(*) AS BIGINT) AS n
      FROM big WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT ho.source, ho.n,
             CAST(ho.n AS DECIMAL(10,0))
               * CAST(-ln(CAST(COALESCE(cxy.cxy, 0) + 1 AS DOUBLE)
                          / CAST(COALESCE(cx.cx, 0) + v.v AS DOUBLE))
                      AS DECIMAL(18,9)) AS term
      FROM ho
      LEFT JOIN cx ON cx.x = ho.x
      LEFT JOIN cxy ON cxy.x = ho.x AND cxy.y = ho.y, v
    ),
    hod AS (
      SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM big WHERE doc_id % 5 = 0 GROUP BY 1
    )
    SELECT s.source, hod.n_docs,
           CAST(SUM(s.n) AS BIGINT) AS n_bigrams,
           CAST(SUM(s.term) AS DOUBLE) / CAST(SUM(s.n) AS BIGINT)
             AS avg_nll_nats,
           ROUND(EXP(CAST(SUM(s.term) AS DOUBLE)
                     / CAST(SUM(s.n) AS BIGINT)), 6) AS perplexity
    FROM scored s JOIN hod ON hod.source = s.source
    GROUP BY s.source, hod.n_docs
    ORDER BY s.source
    """,
)
def text_bigram_lm_heldout_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram language-model scoring: train an add-1-smoothed
    bigram LM on the 80%% doc_id-split (doc_id %% 5 != 0), score the
    held-out 20%% per source as average negative log-likelihood per
    bigram and perplexity — the canonical intrinsic LM / domain-mismatch
    readout a data-mixing pipeline uses next to Moore-Lewis scoring.
    p(y|x) = (c_xy + 1) / (c_x + V); unseen history x falls back to
    exactly 1/V (c_x = 0).

    Determinism: counts and the split are exact integers; each ln term
    is a log of a quotient of identical integers QUANTIZED to
    DECIMAL(18,9) and weighted by the bigram-type count cast to
    DECIMAL(10,0) (the text_bigram_conditional_entropy discipline —
    keeps the product at scale 9 instead of Spark's silent precision-
    loss reduction), so the per-source accumulation is order-
    independent; avg_nll is the raw division of exact values (ROUND
    boundaries at 1e-9 granularity — never rounded), and perplexity
    rounds the transcendental exp to 6.

    Scale shape: bigrams pair ARRAY-side (zip_with over two slices, no
    per-doc window); model counts and held-out counts are map-side-
    combinable aggregates at the bigram-TYPE grain (vocab^2-bounded);
    the scoring join runs type-grain against type-grain, never over
    the raw corpus.  Per-source decimal sums stay ~1e6 (int form 1e15
    < 2^53) through sf1; past that, drop the quantization scale to 6."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
    )
    big = (
        d.select("doc_id", "source", F.explode(bigrams).alias("b"))
        .select(
            "doc_id",
            "source",
            F.col("b.x").alias("x"),
            F.col("b.y").alias("y"),
        )
        .transform(pin, eager=False)
    )
    trn = big.filter(F.col("doc_id") % 5 != 0)
    cxy = trn.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    cx = cxy.groupBy("x").agg(F.sum("cxy").cast("bigint").alias("cx"))
    v = trn.select("x").distinct().agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("v")
    )
    ho = (
        big.filter(F.col("doc_id") % 5 == 0)
        .groupBy("source", "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    scored = (
        ho.join(cx, "x", "left")
        .join(cxy, ["x", "y"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "source",
            "n",
            (
                F.col("n").cast("decimal(10,0)")
                * (
                    -F.log(
                        (F.coalesce(F.col("cxy"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (
                            F.coalesce(F.col("cx"), F.lit(0)) + F.col("v")
                        ).cast("double")
                    )
                ).cast("decimal(18,9)")
            ).alias("term"),
        )
    )
    hod = (
        big.filter(F.col("doc_id") % 5 == 0)
        .select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            (F.sum("term").cast("double") / F.sum("n").cast("bigint")).alias(
                "avg_nll_nats"
            ),
        )
        .join(F.broadcast(hod), "source")
        .select(
            "source",
            "n_docs",
            "n_bigrams",
            "avg_nll_nats",
            F.round(F.exp("avg_nll_nats"), 6).alias("perplexity"),
        )
        .orderBy("source")
    )


@query(
    "filter_lm_perplexity_decile",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, source, t[i] AS x, t[i+1] AS y
      FROM tok, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    trn AS (SELECT x, y FROM big WHERE doc_id % 5 <> 0),
    cxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy FROM trn
            GROUP BY 1, 2),
    cx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM cxy GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) + 1 AS v FROM trn),
    ho AS (
      SELECT doc_id, source, x, y, CAST(COUNT(*) AS BIGINT) AS n
      FROM big WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3, 4
    ),
    perdoc AS (
      SELECT ho.doc_id, ho.source,
             CAST(SUM(ho.n) AS BIGINT) AS n_bigrams,
             SUM(CAST(ho.n AS DECIMAL(10,0))
                 * CAST(-ln(CAST(COALESCE(cxy.cxy, 0) + 1 AS DOUBLE)
                            / CAST(COALESCE(cx.cx, 0) + v.v AS DOUBLE))
                        AS DECIMAL(18,9))) AS nll_dec
      FROM ho
      LEFT JOIN cx ON cx.x = ho.x
      LEFT JOIN cxy ON cxy.x = ho.x AND cxy.y = ho.y, v
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_id, source, n_bigrams,
             CAST(nll_dec AS DOUBLE) / n_bigrams AS avg_nll
      FROM perdoc
    ),
    nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM scored),
    thr AS (
      SELECT avg_nll AS theta FROM (
        SELECT avg_nll, ROW_NUMBER() OVER (ORDER BY avg_nll DESC, doc_id)
                 AS rk
        FROM scored
      ), nq WHERE rk = CAST(CEIL(0.1 * nd) AS BIGINT)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.avg_nll >= (SELECT theta FROM thr)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams
    FROM scored s GROUP BY source ORDER BY source
    """,
)
def filter_lm_perplexity_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOCUMENT LM perplexity filtering (the CCNet move): score
    each held-out document's average bigram NLL under the add-1 LM
    trained on the 80%% split, mark the worst decile (highest NLL =
    least LM-like) via an exact value-at-rank threshold, and report
    flag counts per source — the quality gate that removes
    gibberish/boilerplate the heuristic rules miss.

    Determinism: per-doc NLL sums use the DECIMAL(18,9)-quantized
    term discipline of text_bigram_lm_heldout_nll (order-independent);
    the decile threshold is VALUE-AT-RANK over (avg_nll DESC, doc_id)
    — value-determined under ties — and the flag compares the same
    exact-decimal-over-int quotients both engines computed
    identically.

    Scale shape: model counts at bigram-type grain; per-doc scoring
    joins type-grain model counts onto the held-out docs' bigram
    types (fact-scale but map-side-combinable aggregates + two hash
    joins); the threshold is ONE tiny rank pick over the scored-docs
    frame, then a per-source rollup."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
    )
    big = (
        d.select("doc_id", "source", F.explode(bigrams).alias("b"))
        .select(
            "doc_id",
            "source",
            F.col("b.x").alias("x"),
            F.col("b.y").alias("y"),
        )
        .transform(pin, eager=False)
    )
    trn = big.filter(F.col("doc_id") % 5 != 0)
    cxy = trn.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    cx = cxy.groupBy("x").agg(F.sum("cxy").cast("bigint").alias("cx"))
    v = trn.select("x").distinct().agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("v")
    )
    ho = (
        big.filter(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", "source", "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    perdoc = (
        ho.join(cx, "x", "left")
        .join(cxy, ["x", "y"], "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.col("n").cast("decimal(10,0)")
                * (
                    -F.log(
                        (F.coalesce(F.col("cxy"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (
                            F.coalesce(F.col("cx"), F.lit(0)) + F.col("v")
                        ).cast("double")
                    )
                ).cast("decimal(18,9)")
            ).alias("nll_dec"),
        )
    )
    scored = perdoc.select(
        "doc_id",
        "source",
        "n_bigrams",
        (F.col("nll_dec").cast("double") / F.col("n_bigrams")).alias(
            "avg_nll"
        ),
    ).transform(pin, eager=False)
    from ..operators.ranking import with_global_row_number

    # distributed global rank (range shuffle + offset projection, no
    # single-task sort — the scored frame is one row per held-out doc,
    # fact-scale at 100 TB)
    thr = (
        with_global_row_number(
            scored, [F.col("avg_nll").desc(), F.col("doc_id")],
            rn="rk", n_col="nd",
        )
        .filter(F.col("rk") == F.expr("CAST(CEIL(0.1 * nd) AS BIGINT)"))
        .select(F.col("avg_nll").alias("theta"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("avg_nll") >= F.col("theta"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flagged"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokens-per-byte compression proxy by source
# ---------------------------------------------------------------------------


@query(
    "text_tokens_per_byte_by_source",
    oracle="""
    SELECT source,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
           CAST(SUM(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS BIGINT) AS n_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]|[^a-z0-9 ]')) * 1000000 // strlen(text))
                AS BIGINT) AS sum_tpb_micro,
           CAST(SUM(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS DOUBLE)
             / SUM(strlen(text)) AS tokens_per_byte
    FROM documents
    WHERE strlen(text) > 0
    GROUP BY source
    """,
)
def text_tokens_per_byte_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokens-per-byte by source — the fertility/compression proxy a
    tokenizer-budget planner reads before mixing sources: sources whose
    text yields more BPE-ish tokens per byte cost more context budget
    per stored byte. Uses the registered BPE-ish pre-tokenizer class
    (letter runs | digits | punctuation, text_token_estimate_regex) and
    BYTE length (octet_length == DuckDB strlen).

    Determinism: token and byte counts are exact integers; the corpus
    ratio is one division of identical int64 sums; the per-doc ratio
    ships as an exact integer micro-units sum (floor division of
    positive ints agrees across engines).

    Scale shape: per-row regexp_count/octet_length on the scan, one
    map-side-combinable groupBy on the small source domain.
    """
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.octet_length("text") > 0)
        .select(
            "source",
            F.octet_length("text").cast("bigint").alias("nb"),
            F.regexp_count(
                F.lower(F.col("text")), F.lit("[a-z]+|[0-9]|[^a-z0-9 ]")
            )
            .cast("bigint")
            .alias("nt"),
        )
    )
    return d.groupBy("source").agg(
        F.sum("nb").cast("bigint").alias("n_bytes"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
        F.sum(F.expr("(nt * 1000000) DIV nb")).cast("bigint").alias(
            "sum_tpb_micro"
        ),
        (F.sum("nt").cast("double") / F.sum("nb")).alias("tokens_per_byte"),
    )


# ---------------------------------------------------------------------------
# Unigram coverage curve: how much of the corpus the top-k vocab covers
# ---------------------------------------------------------------------------


@query(
    "text_unigram_coverage_curve",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
           FROM tok GROUP BY term),
    r AS (
      SELECT freq,
             CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS BIGINT)
               AS rn
      FROM tf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(freq) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN rn <= 10 THEN freq ELSE 0 END) AS BIGINT)
             AS top10_tokens,
           CAST(SUM(CASE WHEN rn <= 100 THEN freq ELSE 0 END) AS BIGINT)
             AS top100_tokens,
           CAST(SUM(CASE WHEN rn <= 1000 THEN freq ELSE 0 END) AS BIGINT)
             AS top1000_tokens,
           CAST(SUM(CASE WHEN rn <= 10 THEN freq ELSE 0 END) * 1000000
                // SUM(freq) AS BIGINT) AS top10_ppm,
           CAST(SUM(CASE WHEN rn <= 100 THEN freq ELSE 0 END) * 1000000
                // SUM(freq) AS BIGINT) AS top100_ppm,
           CAST(SUM(CASE WHEN rn <= 1000 THEN freq ELSE 0 END) * 1000000
                // SUM(freq) AS BIGINT) AS top1000_ppm
    FROM r
    """,
)
def text_unigram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens
    the top-10/100/1000 most frequent terms cover — the Zipf companion
    a tokenizer-vocab sizing pass reads (if 1000 types cover 95%, a
    small vocab + byte-fallback wins). Rank order is (freq DESC, term)
    — term is unique at the vocab grain, so ranks are value-determined.

    Determinism: pure integer counts; coverage ships as exact
    parts-per-million via integer floor division.

    Scale shape: tokenize → one (term) groupBy (map-side combinable);
    the ranked cumulative runs on the VOCAB grain via one distributed
    range shuffle (`with_global_row_number`), never a single-task
    window; the final row is a map-side-combined conditional aggregate.
    """
    from ..operators.ranking import with_global_row_number

    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    r = with_global_row_number(
        tf.select("freq", "term"), [F.col("freq").desc(), F.col("term")],
        rn="rn",
    )
    c10 = F.sum(F.when(F.col("rn") <= 10, F.col("freq")).otherwise(0))
    c100 = F.sum(F.when(F.col("rn") <= 100, F.col("freq")).otherwise(0))
    c1000 = F.sum(F.when(F.col("rn") <= 1000, F.col("freq")).otherwise(0))
    tot = F.sum("freq")
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        tot.cast("bigint").alias("total_tokens"),
        c10.cast("bigint").alias("top10_tokens"),
        c100.cast("bigint").alias("top100_tokens"),
        c1000.cast("bigint").alias("top1000_tokens"),
        (c10 * 1000000).cast("bigint").alias("__n10"),
        (c100 * 1000000).cast("bigint").alias("__n100"),
        (c1000 * 1000000).cast("bigint").alias("__n1000"),
    ).selectExpr(
        "vocab_size",
        "total_tokens",
        "top10_tokens",
        "top100_tokens",
        "top1000_tokens",
        "CAST(__n10 DIV total_tokens AS BIGINT) AS top10_ppm",
        "CAST(__n100 DIV total_tokens AS BIGINT) AS top100_ppm",
        "CAST(__n1000 DIV total_tokens AS BIGINT) AS top1000_ppm",
    )


# ---------------------------------------------------------------------------
# Word burstiness: variance-to-mean of per-doc term counts (Church-Gale)
# ---------------------------------------------------------------------------


@query(
    "text_word_burstiness_vmr",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    dt AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, term
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    tf AS (
      SELECT term,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS total_sq,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM dt GROUP BY term
    ),
    top AS (
      SELECT term, total, total_sq, df,
             ROW_NUMBER() OVER (ORDER BY total DESC, term) AS rk
      FROM tf
    )
    SELECT term, total AS n_occurrences, df AS n_docs_containing,
           (CAST(total_sq AS DOUBLE) * n_docs
            - CAST(total AS DOUBLE) * total)
             / (CAST(total AS DOUBLE) * n_docs) AS vmr
    FROM top, nd WHERE rk <= 20 ORDER BY term
    """,
)
def text_word_burstiness_vmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale word burstiness for the 20 most frequent terms:
    the variance-to-mean ratio of per-document occurrence counts
    (zeros included — docs not containing the term). VMR ≈ 1 means
    Poisson scatter (function words); VMR ≫ 1 means the term BURSTS
    in topical documents — the signal separating content words from
    glue, used by keyword extractors and topical-dedup passes.

    Determinism: per-doc counts are exact ints; with zeros included,
    VMR = (n·Σc² − (Σc)²)/(n·Σc) over three exact int64 sums — one
    identical double expression, bit-equal cross-engine. Top-20 rank
    order is value-determined (total DESC, term).

    Scale shape: tokenize → (doc, term) count → term-grain rollup
    (both map-side combinable); the top-k ranking runs on the term
    vocabulary grain; zeros never materialize (the closed form adds
    them analytically).
    """
    d = _docs(spark, sf_dir)
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    dt = (
        d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tf = dt.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("total_sq"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    top = tf.select(
        "term", "total", "total_sq", "df",
        F.row_number()
        # rank-filter (rk <= 20): TakeOrdered-bounded before the window
        .over(Window.orderBy(F.desc("total"), "term"))
        .alias("rk"),
    ).filter(F.col("rk") <= 20)
    return (
        top.crossJoin(F.broadcast(nd))
        .selectExpr(
            "term",
            "total AS n_occurrences",
            "df AS n_docs_containing",
            "(CAST(total_sq AS DOUBLE) * n_docs"
            " - CAST(total AS DOUBLE) * total)"
            " / (CAST(total AS DOUBLE) * n_docs) AS vmr",
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Round-12 additions: diversity / char census / Heaps' law / PMI
# ---------------------------------------------------------------------------


@query(
    "text_simpson_diversity_by_source",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents),
    cnt AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num,
           CAST(SUM(c) AS BIGINT) * (CAST(SUM(c) AS BIGINT) - 1)
             AS simpson_den,
           CAST(SUM(c * (c - 1)) AS DOUBLE)
             / CAST(CAST(SUM(c) AS BIGINT)
                    * (CAST(SUM(c) AS BIGINT) - 1) AS DOUBLE) AS simpson_d
    FROM cnt GROUP BY source ORDER BY source
    """,
)
def text_simpson_diversity_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's diversity index per source over unigram counts — the
    repeat-probability complement of TTR/entropy for corpus-mix
    monitoring (a boilerplate-flooded source's D spikes). Fully exact:
    D's numerator Σc(c−1) and denominator N(N−1) are int64 (token
    counts per source stay ≪ 2^26), and the final ratio is ONE
    division of exact integers — bit-identical cross-engine, no
    rounding needed.

    Scale shape: explode → two map-side-combined aggregates; the
    (source, token) grain is the only shuffle."""
    d = read_table(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.col("c") * (F.col("c") - 1))
            .cast("bigint")
            .alias("simpson_num"),
        )
        .withColumn(
            "simpson_den",
            (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("bigint"),
        )
        .withColumn(
            "simpson_d",
            F.col("simpson_num").cast("double")
            / F.col("simpson_den").cast("double"),
        )
        .orderBy("source")
    )


@query(
    "text_char_class_profile",
    oracle="""
    WITH c AS (
      SELECT source,
             length(text) AS total,
             length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
               AS letters,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS digits,
             length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
               AS spaces
      FROM documents)
    SELECT source,
           CAST(SUM(total) AS BIGINT) AS n_chars,
           CAST(SUM(letters) AS BIGINT) AS n_letters,
           CAST(SUM(digits) AS BIGINT) AS n_digits,
           CAST(SUM(spaces) AS BIGINT) AS n_spaces,
           CAST(SUM(total - letters - digits - spaces) AS BIGINT) AS n_other
    FROM c GROUP BY source ORDER BY source
    """,
)
def text_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census per source (letters / digits / spaces /
    punctuation+other) — the cheap structural-quality signal behind
    symbol-ratio filters (Gopher's "symbol-to-word" rule at char
    grain). Counted as length deltas after class removal, so both
    engines run the identical regexp and every output is an exact
    int64.

    Scale shape: one scan, per-row regexp (JVM codegen), one
    map-side-combined aggregate."""
    d = read_table(spark, sf_dir, "documents")
    total = F.length("text")
    letters = total - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    digits = total - F.length(F.regexp_replace("text", "[0-9]", ""))
    spaces = total - F.length(F.regexp_replace("text", "[ ]", ""))
    return (
        d.select(
            "source",
            total.alias("total"),
            letters.alias("letters"),
            digits.alias("digits"),
            spaces.alias("spaces"),
        )
        .groupBy("source")
        .agg(
            F.sum("total").cast("bigint").alias("n_chars"),
            F.sum("letters").cast("bigint").alias("n_letters"),
            F.sum("digits").cast("bigint").alias("n_digits"),
            F.sum("spaces").cast("bigint").alias("n_spaces"),
            F.sum(
                F.col("total")
                - F.col("letters")
                - F.col("digits")
                - F.col("spaces")
            )
            .cast("bigint")
            .alias("n_other"),
        )
        .orderBy("source")
    )


# Heaps'-law OLS over the 10 checkpoint rows — ONE shared SQL fragment
# interpolated verbatim into both the Spark selectExpr and the DuckDB
# oracle (the stats_ols_two_factor `_ols2_exprs` discipline): only
# bit-identical expression shape keeps composed float math in lockstep.
_HEAPS_LX = "ln(CAST(cum_tokens AS DOUBLE))"
_HEAPS_LY = "ln(CAST(cum_types AS DOUBLE))"
_HEAPS_BETA = (
    f"(COUNT(*) * SUM({_HEAPS_LX} * {_HEAPS_LY})"
    f" - SUM({_HEAPS_LX}) * SUM({_HEAPS_LY}))"
    f" / (COUNT(*) * SUM({_HEAPS_LX} * {_HEAPS_LX})"
    f" - SUM({_HEAPS_LX}) * SUM({_HEAPS_LX}))"
)
_HEAPS_LNK = (
    f"SUM({_HEAPS_LY}) / COUNT(*)"
    f" - ({_HEAPS_BETA}) * SUM({_HEAPS_LX}) / COUNT(*)"
)


@query(
    "text_heaps_law_fit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents),
    tri AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM tok,
           LATERAL unnest(generate_series(1, greatest(len(t) - 2, 0)))
             AS u(i)),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ntok
      FROM tri GROUP BY doc_id),
    docs AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
             CAST(SUM(ntok) OVER (ORDER BY doc_id) AS BIGINT) AS cumtok
      FROM per_doc),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM per_doc),
    cuts AS (
      SELECT i, d.doc_id AS cut, d.cumtok AS cum_tokens
      FROM (SELECT unnest(generate_series(1, 10)) AS i), n, docs d
      WHERE d.rn = CAST(CEIL(CAST(i * n.nd AS DOUBLE) / 10.0) AS BIGINT)),
    ft AS (
      SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM tri GROUP BY g),
    pts AS (
      SELECT c.i, c.cum_tokens,
             CAST(COUNT(*) AS BIGINT) AS cum_types
      FROM cuts c JOIN ft ON ft.first_doc <= c.cut
      GROUP BY c.i, c.cum_tokens),
    fit AS (
      SELECT ROUND({_HEAPS_BETA}, 6) + 0.0 AS heaps_beta,
             ROUND({_HEAPS_LNK}, 6) + 0.0 AS heaps_lnk
      FROM pts)
    SELECT i, cum_tokens, cum_types, heaps_beta, heaps_lnk
    FROM pts, fit ORDER BY i
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit over word-TRIGRAM types:
    V(n) ≈ K·n^β by OLS on (ln cumulative trigrams, ln cumulative
    trigram vocabulary) at 10 corpus checkpoints (doc_id order) — the
    planning curve for tokenizer vocab sizing and dedup-value
    forecasting (β→1 flags unbounded novel-sequence junk, β→0 heavy
    duplication). The unit is trigrams because the synthetic corpus's
    UNIGRAM vocabulary is ~31 words — saturated by the first
    checkpoint, which made the round-12 first cut fit a degenerate
    β = ±0.0 whose SIGNED ZERO flipped with Spark's sum order (the
    gate caught it); trigram vocabulary genuinely grows (16k types at
    sf0.01, 27k at sf0.1). Checkpoint counts are exact int64; the fit
    interpolates ONE shared SQL fragment into both engines, rounds to
    6, and adds +0.0 so a rounded −0.0 can never hash-differ from 0.0.

    Scale shape: trigram explode → (first-doc per type, per-doc
    counts); cumulative sums ride a doc-grain window (docs ≪ tokens);
    the 10-row checkpoint join against the type table is one
    broadcast."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n2 = F.greatest(F.size(toks) - 2, F.lit(0))
    bi = F.zip_with(
        F.slice(toks, 1, n2),
        F.slice(toks, 2, n2),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tri = F.zip_with(
        bi,
        F.slice(toks, 3, n2),
        lambda ab, c: F.concat_ws(" ", ab, c),
    )
    tok = d.select("doc_id", F.explode(tri).alias("g"))
    tok = pin(tok, eager=False)  # feeds per-doc counts AND first-doc
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ntok")
    )
    # doc-grain cumulative tokens via the partition-offset prefix sum
    # (round-13: replaces an unpartitioned Window.orderBy — at 100 TB
    # "n_docs rows through one partition" is a real funnel; this is a
    # range shuffle + P-row offsets, no single-partition WindowExec)
    from ..operators.ranking import with_global_prefix_sum

    docs = with_global_prefix_sum(
        per_doc, ["doc_id"], "ntok", rn="rn", cum="cumtok", n_col="nd"
    )
    cuts = (
        docs.join(
            F.broadcast(
                spark.range(1, 11).select(F.col("id").cast("int").alias("i"))
            ),
            F.col("rn")
            == F.expr(
                "CAST(CEIL(CAST(i * nd AS DOUBLE) / 10.0) AS BIGINT)"
            ),
        )
        .select("i", F.col("doc_id").alias("cut"),
                F.col("cumtok").alias("cum_tokens"))
    )
    ft = tok.groupBy("g").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    pts = (
        ft.join(F.broadcast(cuts), F.col("first_doc") <= F.col("cut"))
        .groupBy("i", "cum_tokens")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cum_types"))
    )
    pts = pin(pts)  # 10 rows: consumed by the fit AND the output
    fit = pts.selectExpr(
        f"ROUND({_HEAPS_BETA}, 6) + 0.0 AS heaps_beta",
        f"ROUND({_HEAPS_LNK}, 6) + 0.0 AS heaps_lnk",
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select("i", "cum_tokens", "cum_types", "heaps_beta", "heaps_lnk")
        .orderBy("i")
    )


# PMI written as one shared ln-sum fragment (never a single ln of the
# integer product, which overflows int64 at corpus scale).
_PMI_EXPR = (
    "ln(CAST(cxy AS DOUBLE)) - ln(CAST(b AS DOUBLE))"
    " - ln(CAST(cx AS DOUBLE)) - ln(CAST(cy AS DOUBLE))"
    " + 2.0 * ln(CAST(n AS DOUBLE))"
)


@query(
    "text_bigram_pmi_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term,
             generate_subscripts(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> ''), 1)
               AS pos
      FROM documents),
    big AS (
      SELECT term AS x,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS y
      FROM tok),
    cxy AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
      FROM big WHERE y IS NOT NULL GROUP BY x, y),
    uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             (SELECT CAST(SUM(cxy) AS BIGINT) FROM cxy) AS b
      FROM uni),
    scored AS (
      SELECT cxy.x, cxy.y, cxy.cxy, ux.c AS cx, uy.c AS cy,
             ROUND({_PMI_EXPR}, 6) AS pmi
      FROM cxy
      JOIN uni ux ON ux.term = cxy.x
      JOIN uni uy ON uy.term = cxy.y, tot
      WHERE cxy.cxy >= 5)
    SELECT x, y, cxy, cx, cy, pmi
    FROM scored ORDER BY pmi DESC, x, y LIMIT 20
    """,
)
def text_bigram_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information over corpus
    bigrams (count floor 5) — the classic phrase-mining signal
    (PMI = ln p(x,y)/(p(x)p(y)) under bigram/unigram MLE). The PMI is
    a SHARED ln-sum fragment (a single ln of the integer product
    would overflow int64), rounded to 6 with (x, y) tie-breaks.

    Scale shape: bigrams pair array-side (zip_with over two slices, no
    per-doc shuffle); unigram/bigram count grains are the only
    shuffles; the top-k is a LIMIT over a bounded ordered frame."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
    )
    tok = d.select(F.explode(toks).alias("term"))
    tok = pin(tok, eager=False)
    cxy = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cxy"))
    )
    cxy = pin(cxy)  # totals read ALL bigrams; scoring reads the floor
    uni = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    uni = pin(uni)  # joined twice (x and y side) + totals
    # b counts EVERY bigram — the MLE denominator is floor-independent
    tot = uni.agg(F.sum("c").cast("bigint").alias("n")).crossJoin(
        cxy.agg(F.sum("cxy").cast("bigint").alias("b"))
    )
    scored = (
        cxy.filter(F.col("cxy") >= 5)
        .join(uni.withColumnsRenamed({"term": "x", "c": "cx"}), "x")
        .join(uni.withColumnsRenamed({"term": "y", "c": "cy"}), "y")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "x", "y", "cxy", "cx", "cy",
            f"ROUND({_PMI_EXPR}, 6) AS pmi",
        )
    )
    return scored.orderBy(
        F.desc("pmi"), "x", "y"
    ).limit(20)
