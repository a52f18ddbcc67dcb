"""Training-data mixing / curation queries over ``documents``:
deterministic stratified sampling, token-budget mixture selection,
corpus-mix reporting, and integer-fence quality filtering.

These are the "what goes into the training run" ops of an LLM data
pipeline: pick N docs per source, fill a per-source token budget,
report the mixture, drop low-quality docs. All four are oracle-backed
— sampling is usually rows-only territory, but ordering by
``md5(doc_id)`` gives a deterministic pseudo-random permutation BOTH
engines compute identically (same MD5 of the same decimal string), so
even the samplers hash-match.

Determinism notes: md5-order carries a doc_id tie-break (hash
collisions are 2^-128 but the rule is free); all shares/fences compare
integers (CLAUDE.md threshold rule); token counts reuse the exact
whitespace-token twin from queries/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as TX
from ..plans.pin import pin
from ..sources.parquet_io import read_table
from .registry import QUERIES, query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan, spread cores-wide (round 13): the single-row-
    group local file makes every scan one task, serializing the
    tokenize/shingle/decode map stages this family fuses into it
    (guide §2.5). `spread` is a plan no-op at cluster scale."""
    from ..operators.partitioning import spread

    return spread(read_table(spark, sf_dir, "documents"), by=["doc_id"])


# DuckDB twin of operators.text.token_count (same as text_token_count's
# oracle): whitespace split, empties dropped.
_SQL_NTOK = (
    "CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),"
    " x -> x <> '')) AS BIGINT)"
)

# Deterministic pseudo-random order shared by both engines.
_SQL_SHUF = "md5(CAST(doc_id AS VARCHAR)), doc_id"


def _shuffle_order():
    return [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]


SAMPLE_PER_SOURCE = 5
TOKEN_BUDGET = 1500


@query(
    "sample_stratified_by_source",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY {_SQL_SHUF}
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= {SAMPLE_PER_SOURCE}
    """,
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sample: N docs per source, drawn by
    ranking an md5(doc_id) pseudo-random permutation — deterministic,
    engine-independent, and repeatable across runs (unlike
    ``TABLESAMPLE``/``df.sample``, whose RNG is engine-private — that
    variant is ``sample_seeded``, rows-only).

    Scale shape: one shuffle on source for the ranking window; at
    production scale the md5 rank is a per-partition top-N
    (rank <= N prunes before the final merge via the window's
    partial top-k), never a global sort.
    """
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(*_shuffle_order())
    return (
        d.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= SAMPLE_PER_SOURCE)
        .select("doc_id", "source", "rn")
    )


@query(
    "sample_token_budget_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY {_SQL_SHUF}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def sample_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a per-source token budget: walk each source's docs in the
    deterministic md5 order and keep docs while the running token sum
    stays within budget — how a training mixture hits its target
    source proportions in tokens (the unit that matters) rather than
    doc counts. Integer cumsum ⇒ the budget fence cannot wobble.

    Scale shape (round-9): the running token sum rides
    ``with_grouped_global_prefix_sum`` — one pinned range exchange on
    (source, shuffle-order) plus a per-(partition, source) parallel
    window — because ``Window.partitionBy(source)`` routes each
    source's ENTIRE corpus through one task, and unlike the rank<=k
    samplers there is no WindowGroupLimit rescue for a token fence
    (the budget bounds tokens, not rows, so no map-side row cutoff
    exists).
    """
    from ..operators.ranking import with_grouped_global_prefix_sum

    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", TX.token_count("text").alias("n_tokens"))
    return (
        with_grouped_global_prefix_sum(
            t, ["source"], _shuffle_order(), "n_tokens", cum="cum_tokens"
        )
        .where(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


@query(
    "corpus_mix_report",
    oracle=f"""
    WITH t AS (
      SELECT source, {_SQL_NTOK} AS n_tokens, n_chars FROM documents
    ),
    agg AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM t GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE)
             / CAST(SUM(total_tokens) OVER () AS DOUBLE) AS token_share,
           CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_chars
    FROM agg
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture dashboard: per-source doc counts, token totals,
    token share of the whole corpus, and mean doc length. Shares and
    means are quotients of identical bigints — bit-equal cross-engine.

    Scale shape: map-side-combinable aggregation to |source| rows; the
    share window runs over that tiny aggregate (empty OVER() is a
    1-partition exchange of |source| rows, not of the corpus).
    """
    d = read_table(spark, sf_dir, "documents")
    t = d.select("source", TX.token_count("text").alias("n_tokens"), "n_chars")
    agg = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        (
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(Window.partitionBy()).cast("double")
        ).alias("token_share"),
        (F.col("total_chars").cast("double") / F.col("n_docs").cast("double")).alias(
            "avg_chars"
        ),
    )


@query(
    "filter_quality_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars, {_SQL_NTOK} AS n_tokens,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> list_contains(['the','a','of','and','to','in','is','that'], x)))
                  AS BIGINT) AS sw_hits
      FROM documents
    )
    SELECT doc_id, source, n_chars, n_tokens
    FROM t
    WHERE n_chars >= 100 AND n_chars <= 20000
      AND n_tokens >= 10
      AND sw_hits * 100 >= n_tokens * 2
    """,
)
def filter_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate with integer fences: length window, minimum token
    count, and a stopword floor (≥2% of tokens are English stopwords —
    gibberish and non-prose fail it). Every fence compares integers
    (``sw_hits·100 ≥ n_tokens·2``, never a float ratio), so boundary
    docs are classified identically by both engines — the CLAUDE.md
    threshold rule applied to the classic C4-style quality filter.

    Scale shape: pure per-row codegen predicates on the scan — no
    shuffle at all; at 100 TB this runs at I/O speed and prunes the
    corpus before any downstream dedup/mixing pass.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    sw = F.array(*[F.lit(w) for w in TX.ENGLISH_STOPWORDS])
    t = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        .cast("bigint")
        .alias("sw_hits"),
    )
    return t.where(
        (F.col("n_chars") >= 100)
        & (F.col("n_chars") <= 20000)
        & (F.col("n_tokens") >= 10)
        & (F.col("sw_hits") * 100 >= F.col("n_tokens") * 2)
    ).select("doc_id", "source", "n_chars", "n_tokens")


@query(
    "pipeline_prep_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars, {_SQL_NTOK} AS n_tokens,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> list_contains(['the','a','of','and','to','in','is','that'], x)))
                  AS BIGINT) AS sw_hits,
             md5(lower(trim(text))) AS content_hash
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, n_tokens, content_hash,
             (n_chars >= 100 AND n_chars <= 20000 AND n_tokens >= 10
              AND sw_hits * 100 >= n_tokens * 2) AS pass_quality
      FROM t
    ),
    keepers AS (
      SELECT doc_id, n_tokens, pass_quality,
             pass_quality AND doc_id = MIN(CASE WHEN pass_quality
                 THEN doc_id END) OVER (PARTITION BY content_hash)
               AS is_keeper
      FROM flagged
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
           CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_pass,
           CAST(SUM(CASE WHEN is_keeper THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_docs,
           CAST(SUM(CASE WHEN is_keeper THEN n_tokens ELSE 0 END) AS BIGINT)
             AS n_tokens_final
    FROM keepers
    """,
)
def pipeline_prep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end prep funnel, hash-verified: input count → quality
    gate (integer fences) → exact content dedup (min-id keeper per
    md5 of canonical text, chosen among quality passers) → final token
    inventory. The deterministic sibling of
    ``pipeline_training_data_prep`` (whose near-dup stage is
    approximate and rows-only): every number in THIS funnel is exact,
    so the driver hash-checks the whole pipeline, not just its stages.

    Scale shape: one scan computes all per-doc features; the only
    shuffle is the content-hash window (same key a production dedup
    shuffles on); output is one row.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    sw = F.array(*[F.lit(w) for w in TX.ENGLISH_STOPWORDS])
    t = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        .cast("bigint")
        .alias("sw_hits"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
    )
    flagged = t.select(
        "doc_id",
        "n_tokens",
        "content_hash",
        (
            (F.col("n_chars") >= 100)
            & (F.col("n_chars") <= 20000)
            & (F.col("n_tokens") >= 10)
            & (F.col("sw_hits") * 100 >= F.col("n_tokens") * 2)
        ).alias("pass_quality"),
    )
    w = Window.partitionBy("content_hash")
    keepers = flagged.withColumn(
        "is_keeper",
        F.col("pass_quality")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("pass_quality"), F.col("doc_id"))).over(w)
        ),
    )
    return keepers.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("pass_quality"), 1).otherwise(0)).alias(
            "n_quality_pass"
        ),
        F.sum(F.when(F.col("is_keeper"), 1).otherwise(0)).alias("n_unique_docs"),
        F.sum(F.when(F.col("is_keeper"), F.col("n_tokens")).otherwise(0)).alias(
            "n_tokens_final"
        ),
    )


@query(
    "sample_weighted_by_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SQL_NTOK} AS n_tokens FROM documents
    )
    SELECT doc_id, source, n_tokens
    FROM t
    WHERE CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
               AS BIGINT) * 400
          < n_tokens * 281474976710656
    """,
)
def sample_weighted_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with token-proportional acceptance — longer
    documents are kept with probability n_tokens/400 (clamped by the
    data's token range): accept iff the first 12 md5 hex digits of the
    doc id, read as a uniform 48-bit integer, fall below the doc's
    share of 16^12. Both sides compare exact integers (hash·400 <
    n_tokens·2^48 — products stay well under int64), so the sample is
    deterministic, repeatable, AND unbiased in the usual
    hash-as-uniform sense — the engine-independent version of
    ``df.sample(weights)``.

    Scale shape: per-row codegen predicate on the scan, no shuffle.
    """
    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", TX.token_count("text").alias("n_tokens"))
    h48 = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT)"
    )
    return t.where(h48 * 400 < F.col("n_tokens") * F.lit(281474976710656))


@query(
    "dedup_exact_keep_best",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars, {_SQL_NTOK} AS n_tokens,
             md5(lower(trim(text))) AS content_hash
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_chars, n_tokens, content_hash,
             row_number() OVER (
               PARTITION BY content_hash
               ORDER BY n_tokens DESC, doc_id
             ) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY content_hash) AS BIGINT)
               AS cluster_size
      FROM t
    )
    SELECT doc_id, source, n_tokens, cluster_size
    FROM ranked WHERE rn = 1
    """,
)
def dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup that keeps the BEST doc per content cluster (most
    tokens, doc_id tie-break) instead of the arbitrary min-id — the
    production keeper rule: among byte-identical-after-normalization
    copies, keep the one whose metadata/extraction is richest. Emits
    the keeper with its cluster size (1 = unique).

    Scale shape: one shuffle on the content hash; the ranking window
    and cluster-size count share it.
    """
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        "n_chars",
        TX.token_count("text").alias("n_tokens"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    ranked = t.withColumn("rn", F.row_number().over(w)).withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(Window.partitionBy("content_hash")).cast("bigint"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id", "source", "n_tokens", "cluster_size"
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (alpha-sampling)
# ---------------------------------------------------------------------------


@query(
    "mix_temperature_weights",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ),
    t AS (
      SELECT source, n_docs,
             CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(20,12)) AS sq
      FROM s
    ),
    z AS (
      SELECT CAST(SUM(sq) AS DOUBLE) AS zsum,
             CAST(SUM(n_docs) AS BIGINT) AS ntot
      FROM t
    )
    SELECT t.source, t.n_docs,
           ROUND(CAST(t.n_docs AS DOUBLE) / z.ntot, 9) AS raw_share,
           ROUND(CAST(t.sq AS DOUBLE) / z.zsum, 9) AS temp_weight,
           ROUND((CAST(t.sq AS DOUBLE) / z.zsum)
                 / (CAST(t.n_docs AS DOUBLE) / z.ntot), 9) AS boost
    FROM t, z
    """,
)
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α = 0.5) mixture weights per source — the
    standard rebalancing for multi-source training corpora: sampling
    probability ∝ share^α flattens the distribution so rare sources
    upsample (boost > 1) and dominant ones downsample. Each sqrt is
    IEEE-correctly-rounded (identical cross-engine), quantized to
    DECIMAL(20,12) before the normalizer sum so accumulation order is
    irrelevant; weights/boosts are identical-expression doubles rounded
    to 9.

    Scale shape: one count aggregate to the source grain (domain-
    bounded), then scalar math against the broadcast one-row
    normalizer. The weights table is what a downstream weighted
    sampler (sample_weighted_by_tokens) consumes.
    """
    d = read_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    t = s.withColumn(
        "sq", F.sqrt(F.col("n_docs").cast("double")).cast("decimal(20,12)")
    )
    z = t.groupBy().agg(
        F.sum("sq").cast("double").alias("zsum"),
        F.sum("n_docs").cast("bigint").alias("ntot"),
    )
    j = t.crossJoin(F.broadcast(z))
    w = F.col("sq").cast("double") / F.col("zsum")
    share = F.col("n_docs").cast("double") / F.col("ntot")
    return j.select(
        "source",
        "n_docs",
        F.round(share, 9).alias("raw_share"),
        F.round(w, 9).alias("temp_weight"),
        F.round(w / share, 9).alias("boost"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-group reservoir sample (k docs per source)
# ---------------------------------------------------------------------------


@query(
    "sample_reservoir_per_group",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 10
    """,
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group reservoir sample (k=10 docs per source),
    derandomized the repo's standard way: ranking by md5 of the key is
    equivalent to a uniform random permutation but identical on both
    engines, so the "reservoir" is exactly reproducible — the
    stratified spot-check sampler for eyeballing every source in a
    corpus. doc_id breaks the (impossible) digest tie.

    Scale shape: one shuffle on source with a per-group top-k; Spark
    plans rank-filtered windows with a per-partition limit pushdown
    (group-limit), so each partition keeps ≤ k rows per group rather
    than sorting whole groups.
    """
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
    )


# ---------------------------------------------------------------------------
# Fixed-size weighted reservoir (A-Res keys) — top-k sample w/o replacement
# ---------------------------------------------------------------------------


@query(
    "sample_weighted_reservoir_ares",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, n_tokens,
             ln((CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 12)) AS BIGINT) + 1.0)
                / 281474976710657.0) / CAST(n_tokens AS DOUBLE) AS ares_key
      FROM t WHERE n_tokens > 0
    ),
    picked AS (
      SELECT doc_id, source, n_tokens, ares_key
      FROM keyed
      ORDER BY ares_key DESC, doc_id
      LIMIT 100
    )
    SELECT doc_id, source, n_tokens, ROUND(ares_key, 9) AS ares_key
    FROM picked
    """,
)
def sample_weighted_reservoir_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement via Efraimidis–
    Spirakis A-Res keys: each doc draws a pseudo-uniform u from its id
    hash (48-bit md5 prefix mapped into (0,1)) and is ranked by
    ln(u)/weight (the oracle selects/orders on the RAW key in a
    subquery and rounds in an outer SELECT — DuckDB binds a bare
    ORDER BY ares_key to the output alias, so rounding in the same
    SELECT would rank on the rounded key while Spark ranks on the raw
    one; ADVICE r4) — the top-k by that key is a weighted reservoir of
    exactly k docs (vs the Bernoulli sampler sample_weighted_by_tokens,
    whose output SIZE is random). The key is one identical float
    expression of exact integers, so selection and order agree
    cross-engine; doc_id breaks (astronomically unlikely) key ties.

    Scale shape: per-row key math on the scan + a distributed top-k
    (per-partition heads merged on the driver's limit) — no full sort,
    no shuffle of the corpus, k·partitions rows move.
    """
    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id", "source", TX.token_count("text").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    h48 = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT)"
    )
    u = (h48 + F.lit(1.0)) / F.lit(281474976710657.0)
    keyed = t.withColumn(
        "ares_key", F.log(u) / F.col("n_tokens").cast("double")
    )
    return (
        keyed.orderBy(F.col("ares_key").desc(), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.round("ares_key", 9).alias("ares_key"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (hash-bucketed, stratified report)
# ---------------------------------------------------------------------------


@query(
    "mix_train_val_test_split",
    oracle="""
    WITH b AS (
      SELECT source,
             CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) % 10 AS bucket,
             n_chars
      FROM documents
    ),
    s AS (
      SELECT source,
             CASE WHEN bucket < 8 THEN 'train'
                  WHEN bucket = 8 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM b
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY source, split
    """,
)
def mix_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: the md5 of the doc
    id mod 10 assigns each document a stable bucket (repeatable across
    runs, engines, and re-partitioning — never ``rand()``), and the
    report audits the realized split sizes per source. The same
    predicate IS the production split filter; this query materializes
    its audit table.

    Scale shape: per-row hash + one map-side-combinable groupBy to
    (source, split) grain.
    """
    d = read_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT) % 10"
    )
    s = d.select(
        "source",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
    )
    return s.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Round-robin source interleave (balanced curriculum ordering)
# ---------------------------------------------------------------------------


@query(
    "mix_interleave_round_robin",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos_in_source
      FROM documents
    ),
    g AS (
      SELECT doc_id, source, CAST(pos_in_source AS BIGINT) AS pos_in_source,
             row_number() OVER (ORDER BY pos_in_source, source, doc_id)
               AS global_pos
      FROM r
    )
    SELECT doc_id, source, pos_in_source, CAST(global_pos AS BIGINT)
             AS global_pos
    FROM g WHERE global_pos <= 200
    """,
)
def mix_interleave_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced round-robin interleave across sources — the curriculum
    ordering that feeds one doc per source in rotation (shuffled
    within source by the deterministic md5 permutation) so no source
    dominates any training-window prefix. Emits the first 200 global
    positions. The global ordering key (pos_in_source, source,
    doc_id) is a total order — cross-engine identical.

    Scale shape: per-source ranking is a partitioned window (many
    sources, bounded groups); the global interleave order needs only
    a top-k (LIMIT) — a distributed TakeOrdered, not a full global
    sort — because position k is wanted, not a ranking of all rows.
    """
    d = read_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = d.select(
        "doc_id",
        "source",
        F.row_number().over(ws).cast("bigint").alias("pos_in_source"),
    )
    topk = (
        r.orderBy("pos_in_source", "source", "doc_id")
        .limit(200)
        .withColumn(
            "global_pos",
            F.row_number()
            # bounded: runs on the 200-row limited frame above
            .over(Window.orderBy("pos_in_source", "source", "doc_id"))
            .cast("bigint"),
        )
    )
    return topk


# ---------------------------------------------------------------------------
# Fractional-epoch upsampling (deterministic per-source repetition)
# ---------------------------------------------------------------------------


@query(
    "mix_fractional_epoch_upsample",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             4 + CAST(CONCAT('0x', substring(md5(source), 1, 6))
                      AS BIGINT) % 9 AS x4,
             CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) % 4 AS r
      FROM documents
    ),
    n AS (
      SELECT source, doc_id,
             x4 // 4 + CASE WHEN r < x4 % 4 THEN 1 ELSE 0 END AS n
      FROM h
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_copies,
           CAST(SUM(doc_id * ((n * (n + 1)) // 2)) AS BIGINT) AS copy_checksum
    FROM n GROUP BY source
    """,
)
def mix_fractional_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch corpus upsampling — the mixture knob LLM data
    recipes actually use ("2.25 epochs of source A, 1.5 of B"): every
    doc repeats floor(e) times and one extra copy with probability
    frac(e), derandomized the repo's standard way. Epochs are quarter
    -grained per source (x4/4, x4 = 4 + md5(source)%9 ∈ [4,12]) and the
    extra-copy draw compares 48-bit doc hashes against the quarter
    remainder IN INTEGERS (h%4 < x4%4 — the CLAUDE.md share-threshold
    rule, no float boundary). The Spark side MATERIALIZES the copies
    (explode over sequence(1, n) — what a training-data writer would
    ship) and aggregates count + a copy-index checksum
    Σ doc_id·i; the oracle computes the same totals in closed form
    (Σ n, Σ doc_id·n(n+1)/2) — a genuine differential proof that the
    explosion produced exactly the prescribed copies.

    Scale shape: per-row hash math + explode (narrow, no shuffle), one
    map-side-combinable groupBy(source). Copy factor is bounded (≤4
    epochs) so output ≤ 4x input — the explode never amplifies
    unboundedly.
    """
    d = read_table(spark, sf_dir, "documents")
    h6s = F.expr("CAST(conv(substring(md5(source), 1, 6), 16, 10) AS BIGINT)")
    h48 = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT)"
    )
    x4 = (F.lit(4) + h6s % 9).alias("x4")
    withn = d.select(
        "doc_id",
        "source",
        (
            F.floor(x4 / 4)
            + F.when((h48 % 4) < (x4 % 4), 1).otherwise(0)
        ).cast("int").alias("n"),
    )
    copies = withn.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
    )
    return copies.groupBy("source").agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.sum(F.col("doc_id") * F.col("i")).cast("bigint").alias("copy_checksum"),
    )


# ---------------------------------------------------------------------------
# Curriculum staging by global quality rank (parallel ntile consumer)
# ---------------------------------------------------------------------------


@query(
    "mix_curriculum_quality_stages",
    oracle="""
    WITH staged AS (
      SELECT source, n_chars,
             ntile(3) OVER (ORDER BY n_chars DESC, doc_id) AS stage
      FROM documents
    )
    SELECT CAST(stage AS BIGINT) AS stage, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM staged GROUP BY stage, source
    """,
)
def mix_curriculum_quality_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: split the corpus into 3 global stages by
    document length (longest docs first — the simple curriculum proxy),
    then report the per-(stage, source) mixture so a trainer can see
    which sources dominate each stage. NTILE over a total order
    (doc_id tie-break) is engine-exact integer math.

    Scale shape: the global ntile runs through the PARALLEL range-
    shuffle ranking operator (operators/ranking.py with_global_ntile —
    literal-offset projection, no single-task sort), then one
    map-side-combinable groupBy over (stage, source).
    """
    from ..operators.ranking import with_global_ntile

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    staged = with_global_ntile(
        d, [F.desc("n_chars"), F.asc("doc_id")], 3, "stage"
    )
    return staged.groupBy("stage", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Target-distribution reweighting (per-source sampling weights)
# ---------------------------------------------------------------------------


@query(
    "mix_target_reweighting",
    oracle=f"""
    WITH t AS (
      SELECT source, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    agg AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok
      FROM t GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(tok) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_src
      FROM agg
    )
    SELECT source, tok AS n_tokens,
           CASE WHEN total >= 5 * n_src * tok THEN 5.0
                ELSE CAST(total AS DOUBLE)
                     / (CAST(n_src AS DOUBLE) * CAST(tok AS DOUBLE)) END
             AS weight,
           total >= 5 * n_src * tok AS capped
    FROM agg, tot
    """,
)
def mix_target_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights that move the corpus toward a
    UNIFORM token distribution — the mixture-rebalancing step of a
    training-data recipe: weight_s = target_share / current_share =
    total / (n_sources · tokens_s), capped at 5× (upweighting a tiny
    source unboundedly just repeats it into memorization). The cap
    decision compares integers (total ≥ 5·n·tokens_s — the CLAUDE.md
    threshold rule); the weight itself is one division of identical
    exact integers, bit-equal cross-engine.

    Scale shape: map-side-combinable token rollup to |source| rows;
    the one-row total broadcast-joins back. The weights then feed the
    deterministic samplers (sample_weighted_by_tokens /
    sample_weighted_reservoir_ares) downstream.
    """
    d = read_table(spark, sf_dir, "documents")
    agg = (
        d.select("source", TX.token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("bigint").alias("tok"))
    )
    tot = agg.agg(
        F.sum("tok").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    j = agg.crossJoin(F.broadcast(tot))
    cap = F.col("total") >= 5 * F.col("n_src") * F.col("tok")
    return j.select(
        "source",
        F.col("tok").alias("n_tokens"),
        F.when(cap, F.lit(5.0))
        .otherwise(
            F.col("total").cast("double")
            / (F.col("n_src").cast("double") * F.col("tok").cast("double"))
        )
        .alias("weight"),
        cap.alias("capped"),
    )


# ---------------------------------------------------------------------------
# Fixed-context sequence packing (GPT-style concat-then-chunk)
# ---------------------------------------------------------------------------


@query(
    "pack_sequences_fixed_context",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_NTOK} AS n FROM documents
    ),
    c AS (
      SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id) AS cum
      FROM t WHERE n > 0
    ),
    spans AS (SELECT doc_id, n, CAST(cum - n AS BIGINT) AS s,
                     CAST(cum AS BIGINT) AS e FROM c),
    blocks AS (
      SELECT b AS block_id, doc_id,
             least(e, (b + 1) * 512) - greatest(s, b * 512) AS toks
      FROM spans,
           LATERAL unnest(generate_series(s // 512, (e - 1) // 512)) AS u(b)
    )
    SELECT CAST(block_id AS BIGINT) AS block_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM blocks GROUP BY block_id
    """,
)
def pack_sequences_fixed_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus in doc_id
    order and slice it into fixed 512-token context blocks — the
    standard "concat then chunk" batch-assembly step of an LLM training
    pipeline. Emits per block: how many documents it touches and its
    token count (== 512 everywhere except the tail block) — the
    packing-efficiency report.

    Determinism: token counts are the exact whitespace twin; block
    assignment is pure integer math over an exact global prefix sum
    (inclusive cumsum of int64 token counts in doc_id order), so both
    engines compute identical block spans.

    Scale shape: the prefix sum is the PARALLEL literal-offset operator
    (operators/ranking.py with_global_prefix_sum — one range shuffle +
    vectorized partition cumsums; the oracle's single-sort window is
    the fixture-scale twin); each doc then fans out to its
    ceil(n/512)+1 overlapped blocks via sequence+explode (bounded by
    doc length, never corpus size) and the per-block aggregate is
    map-side combinable. No joins, no driver collect beyond the ≤P-row
    offsets.
    """
    from ..operators.ranking import with_global_prefix_sum

    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TX.token_count("text").alias("n")).filter(
        F.col("n") > 0
    )
    c = with_global_prefix_sum(t, ["doc_id"], "n", rn="__rn", cum="cum")
    spans = c.select(
        "doc_id", "n", (F.col("cum") - F.col("n")).alias("s"),
        F.col("cum").alias("e"),
    )
    blocks = spans.select(
        F.explode(
            # DIV: exact integer floor-division (a float `/` would lose
            # exactness once offsets pass 2^53 at real corpus sizes)
            F.sequence(F.expr("s DIV 512"), F.expr("(e - 1) DIV 512"))
        ).alias("block_id"),
        "s",
        "e",
    ).select(
        "block_id",
        (
            F.least(F.col("e"), (F.col("block_id") + 1) * 512)
            - F.greatest(F.col("s"), F.col("block_id") * 512)
        ).alias("toks"),
    )
    return blocks.groupBy("block_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
    )


@query(
    "mix_moore_lewis_source_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term,
             generate_subscripts(
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''), 1) AS pos
      FROM documents
    ),
    big AS (
      SELECT source, term AS w1,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    bg AS (SELECT source, w1, w2 FROM big WHERE w2 IS NOT NULL),
    cs AS (SELECT source, w1, w2, COUNT(*) AS c_s
           FROM bg GROUP BY source, w1, w2),
    cs1 AS (SELECT source, w1, SUM(c_s) AS c_s1
            FROM cs GROUP BY source, w1),
    c AS (SELECT w1, w2, SUM(c_s) AS c FROM cs GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c) AS c1 FROM c GROUP BY w1),
    j AS (
      SELECT cs.source, cs.c_s,
             CAST(cs.c_s AS DOUBLE)
               * (ln(CAST(cs.c_s AS DOUBLE)) - ln(CAST(cs1.c_s1 AS DOUBLE))
                  - ln(CAST(c.c AS DOUBLE)) + ln(CAST(c1.c1 AS DOUBLE)))
               AS term
      FROM cs
      JOIN cs1 USING (source, w1)
      JOIN c USING (w1, w2)
      JOIN c1 USING (w1)
    )
    SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_bigrams,
           ROUND(SUM(term) / SUM(c_s), 6) AS moore_lewis_score
    FROM j GROUP BY source
    """,
)
def mix_moore_lewis_source_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis data selection at source granularity — THE classic
    domain-relevance score for training-data curation: mean over a
    source's bigram occurrences of ln P_src(w2|w1) − ln P_corpus(w2|w1)
    (cross-entropy difference between the in-domain LM and the corpus
    LM; positive ⇒ the source is more predictable by its own LM, i.e.
    distinctive). Unsmoothed is exact here because every scored bigram
    occurs in both LMs by construction. Counts are exact ints; each ln
    sees the identical double on both engines; the occurrence-weighted
    mean rounds to 6 decimals (composed-float rule — verified at
    sf0.1).

    Scale shape: one explode → (source, w1, w2) count with map-side
    combine, then the three marginal count frames REUSE that
    aggregated frame (pinned — bigram stats are orders smaller than
    the corpus, the standard LM-count materialization), and the joins
    are on bigram/unigram keys, never on documents."""
    d = read_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    ex = d.select("source", F.explode(pairs).alias("p")).select(
        "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    cs = (
        ex.groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_s"))
        .transform(pin, eager=False)
    )
    cs1 = cs.groupBy("source", "w1").agg(F.sum("c_s").alias("c_s1"))
    c = cs.groupBy("w1", "w2").agg(F.sum("c_s").alias("c"))
    c1 = c.groupBy("w1").agg(F.sum("c").alias("c1"))
    ln = F.log
    dd = lambda col: F.col(col).cast("double")  # noqa: E731
    term = dd("c_s") * (
        ln(dd("c_s")) - ln(dd("c_s1")) - ln(dd("c")) + ln(dd("c1"))
    )
    j = (
        cs.join(cs1, ["source", "w1"])
        .join(c, ["w1", "w2"])
        .join(c1, ["w1"])
        .select("source", "c_s", term.alias("term"))
    )
    return j.groupBy("source").agg(
        F.sum("c_s").cast("bigint").alias("n_bigrams"),
        F.round(F.sum("term") / F.sum("c_s"), 6).alias("moore_lewis_score"),
    )


@query(
    "mix_dsir_hashed_importance",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS term,
             generate_subscripts(
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''), 1) AS pos
      FROM documents
    ),
    big AS (
      SELECT doc_id, term AS w1,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(w1 || ' ' || w2), 1, 15) AS BIGINT)
               % 1024 AS f
      FROM big WHERE w2 IS NOT NULL
    ),
    dfc AS MATERIALIZED (
      SELECT doc_id, f, COUNT(*) AS c FROM feat GROUP BY doc_id, f
    ),
    qf AS MATERIALIZED (SELECT f, SUM(c) AS q FROM dfc GROUP BY f),
    tf AS MATERIALIZED (
      SELECT f, SUM(c) AS t
      FROM dfc JOIN documents USING (doc_id)
      WHERE source IN ('src0', 'src1', 'src2', 'src3')
      GROUP BY f
    ),
    tot AS (
      SELECT (SELECT SUM(q) FROM qf) AS qt,
             (SELECT COALESCE(SUM(t), 0) FROM tf) AS tt
    ),
    j AS (
      SELECT d.doc_id, d.c,
             CAST(d.c AS DOUBLE)
               * (ln(CAST(COALESCE(t.t, 0) + 1 AS DOUBLE))
                  - ln(CAST(tot.tt + 1024 AS DOUBLE))
                  - ln(CAST(q.q + 1 AS DOUBLE))
                  + ln(CAST(tot.qt + 1024 AS DOUBLE))) AS term
      FROM dfc d JOIN qf q USING (f) LEFT JOIN tf t USING (f), tot
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           ROUND(SUM(term), 6) AS dsir_logweight
    FROM j GROUP BY doc_id
    """,
)
def mix_dsir_hashed_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    per-document importance log-weights over HASHED bigram features:
    bigrams hash into 1024 buckets (the dimensionality bound that makes
    the method run at corpus scale), the target LM is the src0-src3
    slice, the raw LM is the whole corpus, and each document scores
    Σ_f c_df·(ln p̂_target(f) − ln q̂_raw(f)) with add-one smoothing.
    Downstream, sampling ∝ exp(weight) tilts the corpus toward the
    target domain. Feature counts are exact ints; every ln sees the
    identical double; the per-doc sum rounds to 6 (composed-float
    rule — verified at sf0.1).

    Scale shape: one explode → (doc, f) count with map-side combine
    (the hashed space caps distinct features at 1024·docs), the two LM
    count frames reuse that aggregate (pinned), and the scoring join is
    on the 1024-key feature column — broadcast-sized by construction —
    so the corpus is never reshuffled."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    f_col = F.conv(F.substring(F.md5(F.col("bg")), 1, 15), 16, 10).cast(
        "bigint"
    ) % 1024
    ex = d.select(
        "doc_id", "source", F.explode(pairs).alias("bg")
    ).select("doc_id", "source", f_col.alias("f"))
    dfc = (
        ex.groupBy("doc_id", "source", "f")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(pin, eager=False)
    )
    qf = dfc.groupBy("f").agg(F.sum("c").alias("q"))
    tf = (
        dfc.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
        .groupBy("f")
        .agg(F.sum("c").alias("t"))
    )
    tot = qf.agg(F.sum("q").alias("qt")).crossJoin(
        tf.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("tt"))
    )
    ln = F.log
    dd = lambda c: c.cast("double")  # noqa: E731
    term = dd(F.col("c")) * (
        ln(dd(F.coalesce(F.col("t"), F.lit(0)) + 1))
        - ln(dd(F.col("tt") + 1024))
        - ln(dd(F.col("q") + 1))
        + ln(dd(F.col("qt") + 1024))
    )
    j = (
        dfc.join(F.broadcast(qf), "f")
        .join(F.broadcast(tf), "f", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "c", term.alias("term"))
    )
    return j.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.round(F.sum("term"), 6).alias("dsir_logweight"),
    )


@query(
    "mix_source_quota_capping",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(SUM(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_docs,
           CAST(SUM(CASE WHEN rn > 15 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_docs,
           CAST(SUM(CASE WHEN rn <= 15 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked
    GROUP BY source
    """,
)
def mix_source_quota_capping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping — the anti-domination rule of a corpus
    mixture: no source may contribute more than Q documents, and when a
    source exceeds its quota the LONGEST documents win (n_chars-desc
    with a doc_id tie-break, a deterministic quality proxy). Reports
    kept/dropped/char-mass per source so the curation run can audit
    what the cap cost. Pure integer ranks and sums — bit-exact.

    Scale shape (round-9): the audit needs EVERY row's rank (dropped
    rows count too), so the rank<=k WindowGroupLimit pushdown cannot
    apply; the rank rides ``with_grouped_global_row_number`` instead —
    one pinned range exchange on (source, chars desc, doc_id) and a
    literal-map projection, so a mega-source's millions of rows rank
    across ALL partitions instead of one task per source."""
    from ..operators.ranking import with_grouped_global_row_number

    d = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    r = with_grouped_global_row_number(
        d,
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        rn="rn",
    )
    kept = F.when(F.col("rn") <= 15, 1).otherwise(0)
    return r.groupBy("source").agg(
        F.sum(kept).cast("bigint").alias("kept_docs"),
        F.sum(1 - kept).cast("bigint").alias("dropped_docs"),
        F.sum(F.when(F.col("rn") <= 15, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "pipeline_incremental_curation",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 3 <> 2
    ),
    replay AS (
      SELECT doc_id, text, n_chars FROM documents
      WHERE doc_id % 3 <> 2 AND doc_id % 7 = 0
    ),
    inc AS (
      SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 3 = 2
      UNION ALL
      SELECT doc_id + 10000000, text, n_chars FROM replay
      UNION ALL
      SELECT doc_id + 20000000, text, n_chars FROM replay
    ),
    q AS (
      SELECT * FROM inc WHERE n_chars BETWEEN 100 AND 520
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
    ),
    within AS (
      SELECT q.* FROM q JOIN keep ON q.doc_id = keep.doc_id
    ),
    survivors AS (
      SELECT w.* FROM within w
      WHERE md5(w.text) NOT IN (SELECT md5(text) FROM base)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM inc) AS increment_rows,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS after_quality,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM within) AS after_within_dedup,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM survivors) AS after_cross_dedup,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM base)
        + (SELECT CAST(COUNT(*) AS BIGINT) FROM survivors)
        AS curated_total
    """,
)
def pipeline_incremental_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The INCREMENTAL curation loop end-to-end on the transaction-log
    format: a curated corpus table receives a crawl increment (new
    docs plus re-crawled copies of existing ones under fresh ids), and
    the pipeline consumes the CHANGE FEED — never the full table —
    through quality fences (integer n_chars bounds), within-increment
    exact dedup (min-doc_id per md5), and cross-dedup against the
    curated corpus (hash anti-join), then commits the survivors as the
    next version. Reports every stage's row count plus the final
    curated total, so the audit trail the judge of any curation run
    wants is one row.

    Scale shape: the feed is churn-sized (TxnLogTable.changefeed reads
    only the increment batch); the cross-dedup anti-join is
    hash-partitioned on md5 with the curated side reduced to its hash
    column; the final commit appends one immutable batch. At 100 TB
    the full-corpus rescan this replaces is the difference between a
    nightly job and an impossible one."""
    from ..sources.txnlog import TxnLogTable
    from .sources_sinks import _scratch

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    base = d.filter(F.col("doc_id") % 3 != 2)
    replay = base.filter(F.col("doc_id") % 7 == 0)
    inc = (
        d.filter(F.col("doc_id") % 3 == 2)
        .unionByName(replay.withColumn("doc_id", F.col("doc_id") + 10000000))
        .unionByName(replay.withColumn("doc_id", F.col("doc_id") + 20000000))
    )
    land = TxnLogTable(spark, _scratch("landing"))
    land.commit(base)
    land.commit(inc)
    cur = TxnLogTable(spark, _scratch("curated"))
    cur.commit(base)
    feed = pin(land.changefeed(0, 1, ["doc_id"]).drop("change_type"))
    q = pin(feed.filter(F.col("n_chars").between(100, 520)))
    keep = q.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    within = pin(q.join(keep.select("doc_id"), "doc_id", "left_semi"))
    base_hashes = cur.snapshot(0).select(F.md5("text").alias("h"))
    survivors = pin(
        within.withColumn("h", F.md5("text"))
        .join(base_hashes, "h", "left_anti")
        .drop("h")
    )
    cur.commit(survivors)
    counts = [
        inc.agg(F.count(F.lit(1)).cast("bigint").alias("increment_rows")),
        q.agg(F.count(F.lit(1)).cast("bigint").alias("after_quality")),
        within.agg(
            F.count(F.lit(1)).cast("bigint").alias("after_within_dedup")
        ),
        survivors.agg(
            F.count(F.lit(1)).cast("bigint").alias("after_cross_dedup")
        ),
        cur.snapshot(1).agg(
            F.count(F.lit(1)).cast("bigint").alias("curated_total")
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


@query(
    "sample_systematic_every_k",
    oracle="""
    WITH perm AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source, n_chars, rn
    FROM perm WHERE (rn - 1) % 25 = 0
    """,
)
def sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-25 sampling on a deterministic pseudo-random
    permutation: rank every doc by md5(doc_id) (the cross-engine
    shuffle both engines compute identically) and keep every 25th —
    equal-probability, evenly spread, and reproducible, the sampling
    frame an eval-set builder wants. Exact integer ranks; the hash
    tie-breaks on doc_id.

    Scale shape: the global rank uses the two-pass range-shuffle
    row_number (operators/ranking.py) — one parallel sort + a
    partition-offset projection, never a single-partition window."""
    from ..operators.ranking import with_global_row_number

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    ranked = with_global_row_number(d, ["h", "doc_id"], rn="rn")
    return (
        ranked.filter((F.col("rn") - 1) % 25 == 0)
        .select("doc_id", "source", "n_chars", "rn")
    )


@query(
    "mix_shard_balanced_export",
    oracle=f"""
    WITH s AS (
      SELECT (CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                    1, 15) AS BIGINT) % 64) AS shard,
             {_SQL_NTOK} AS ntok
      FROM documents
    ),
    per AS (
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM s GROUP BY 1
    )
    SELECT shard, n_docs, n_tokens,
           64 * n_tokens <= 2 * (SELECT SUM(n_tokens) FROM per)
             AS within_2x_mean
    FROM per
    """,
)
def mix_shard_balanced_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export sharding: hash-assign every document to one of
    64 output shards (seeded md5 of the doc id — deterministic,
    replayable, and independent of row order, so a re-run or a resumed
    export lands every doc in the SAME shard) and report the per-shard
    doc/token census plus a balance fence: no shard may carry more
    than 2x the mean token load (64·n_tokens ≤ 2·total, integer
    cross-multiplication). This is the write-side contract of a
    training-data export — shard-parallel readers get near-equal token
    work, and the fence catches both a broken hash and pathological
    doc-length skew before shards hit disk.

    Scale shape: one scan, map-side-combinable aggregate to 64 rows;
    the shard column doubles as the partitionBy key of the actual
    export write (one file set per shard, no shuffle beyond the
    64-way)."""
    d = read_table(spark, sf_dir, "documents")
    s = d.select(
        (
            F.expr(
                "CAST(conv(substring(md5(concat('shard:',"
                " CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            )
            % 64
        ).alias("shard"),
        TX.token_count("text").alias("ntok"),
    )
    per = s.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").cast("bigint").alias("t"))
    return per.crossJoin(F.broadcast(total)).select(
        "shard",
        "n_docs",
        "n_tokens",
        (64 * F.col("n_tokens") <= 2 * F.col("t")).alias("within_2x_mean"),
    )


@query(
    "mix_length_bucket_batching",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM t),
    hist AS (
      SELECT n_tokens, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM t GROUP BY n_tokens
    ),
    cum AS (
      SELECT n_tokens,
             CAST(SUM(cnt) OVER (ORDER BY n_tokens ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM hist
    ),
    bounds AS (
      SELECT i,
             (SELECT MIN(n_tokens) FROM cum, n
              WHERE c * 8 >= i * nd) AS b
      FROM (SELECT unnest(generate_series(1, 7)) AS i)
    ),
    bucketed AS (
      SELECT t.doc_id, t.n_tokens,
             CAST((SELECT COUNT(*) FROM bounds
                   WHERE t.n_tokens > bounds.b) AS INT) AS bucket
      FROM t
    ),
    per_bucket AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
             CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS pad_waste_tokens,
             CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / 4096.0) AS BIGINT)
               AS n_batches_4k
      FROM bucketed GROUP BY bucket
    ),
    total AS (
      SELECT CAST(-1 AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
             CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS pad_waste_tokens,
             CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / 4096.0) AS BIGINT)
               AS n_batches_4k
      FROM t
    )
    SELECT * FROM per_bucket UNION ALL SELECT * FROM total
    ORDER BY bucket
    """,
)
def mix_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED BATCHING prep (the dynamic-batching move every
    trainer makes): docs split into 8 octile token-length buckets via
    exact value-at-rank boundaries (8*cum >= i*n integer comparison on
    the length histogram), and per bucket the padding waste if batches
    pad to the bucket max — with the bucket = -1 row showing the
    GLOBAL pad-to-max waste that bucketing eliminates (typically
    5-10x).

    Determinism: token counts, histogram cumsums, rank boundaries and
    waste are all exact integers; the only float is the 4k-token batch
    count ceiling of an integer quotient.

    Scale shape: token counts are per-doc codegen HOFs; boundaries
    come from the LENGTH HISTOGRAM (domain-bounded, never a global
    sort of docs); assignment is a 7-row broadcast comparison; the
    rollup is map-side-combinable."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", TX.token_count("text").alias("n_tokens")
    ).transform(pin, eager=False)
    n = t.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    hist = t.groupBy("n_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cum = hist.withColumn(
        "c",
        F.sum("cnt")
        .over(
            Window.orderBy("n_tokens").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("bigint"),
    )
    bounds = (
        spark.range(1, 8)
        .select(F.col("id").alias("i"))
        .join(cum.crossJoin(F.broadcast(n)), how="cross")
        .filter(F.col("c") * 8 >= F.col("i") * F.col("nd"))
        .groupBy("i")
        .agg(F.min("n_tokens").alias("b"))
    )
    bucketed = (
        t.crossJoin(F.broadcast(bounds))
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.sum(
                F.when(F.col("n_tokens") > F.col("b"), 1).otherwise(0)
            )
            .cast("int")
            .alias("bucket")
        )
    )
    def _roll(df, bucket_col):
        return df.groupBy(bucket_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            (
                F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")
            )
            .cast("bigint")
            .alias("pad_waste_tokens"),
            F.expr(
                "CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / 4096.0)"
                " AS BIGINT)"
            ).alias("n_batches_4k"),
        )

    per_bucket = _roll(bucketed, F.col("bucket"))
    total = _roll(
        t.withColumn("bucket", F.lit(-1).cast("int")), F.col("bucket")
    )
    return per_bucket.unionByName(total).orderBy("bucket")


# ---------------------------------------------------------------------------
# Leakage-safe train/test split: split by DEDUP CLUSTER, not by doc
# ---------------------------------------------------------------------------


def _leakage_split_oracle() -> str:
    """Compose the upstream pair-generation SQL from
    ORACLES['dedup_prefix_bucket_jaccard'] verbatim (the
    _mutual_knn_oracle pattern) so a future edit to the dedup key's
    threshold/bucket can never silently desynchronize this audit from
    the pipeline it audits — round-11 advice item 2."""
    from .registry import ORACLES

    return f"""
    WITH RECURSIVE cand AS ({ORACLES["dedup_prefix_bucket_jaccard"]}),
    pairs AS (
      SELECT doc_a, doc_b FROM cand
    ),
    e AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    r AS (
      SELECT src AS node, src AS reach FROM e
      UNION
      SELECT r.node, e.dst FROM r JOIN e ON e.src = r.reach
    ),
    comp AS (
      SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cid
      FROM r GROUP BY node
    ),
    lab AS (
      SELECT d.doc_id,
             COALESCE(comp.cid, d.doc_id) AS cid,
             CAST(CAST('0x' || substr(md5(CAST(COALESCE(comp.cid, d.doc_id)
                       AS VARCHAR)), 1, 4) AS BIGINT) % 10 = 0 AS INT)
               AS is_test,
             CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                       AS BIGINT) % 10 = 0 AS INT) AS naive_test
      FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
    ),
    per_c AS (
      SELECT cid,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(is_test) - MIN(is_test) AS INT) AS cluster_leak,
             CAST(MAX(naive_test) - MIN(naive_test) AS INT) AS naive_leak
      FROM lab GROUP BY cid
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST((SELECT SUM(is_test) FROM lab) AS BIGINT) AS n_test_docs,
           CAST(SUM(cluster_leak) AS BIGINT) AS leaky_clusters,
           CAST(SUM(naive_leak) AS BIGINT) AS naive_leaky_clusters
    FROM per_c
    """


@query("mix_leakage_safe_split", oracle=_leakage_split_oracle())
def mix_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: assign each NEAR-DUP CLUSTER (not
    each document) to a split with a deterministic md5 hash, so a
    document and its near-duplicate can never land on opposite sides —
    the contamination failure mode of naive per-doc splits that
    inflates eval scores. Clusters come from the fully-replayable
    prefix-blocked exact-Jaccard graph (dedup_clusters_prefix_jaccard);
    singletons are their own cluster. The output audits BOTH policies:
    cluster-level split leakage is 0 BY CONSTRUCTION, while the naive
    per-doc md5 split's leaky-cluster count is reported as the
    counterfactual.

    Determinism: md5-of-decimal-string bucketing is identical
    cross-engine (hex→int via conv == '0x' cast, CLAUDE.md rule);
    leak flags are integer max−min per cluster.

    Scale shape: pair generation is the bucketed join; label
    propagation runs on the pair graph only; the split/audit is one
    broadcast-join of cluster ids plus a cluster-grain aggregate.
    """
    from ..operators.graph import connected_components

    d = _docs(spark, sf_dir).select("doc_id")
    pairs = QUERIES["dedup_prefix_bucket_jaccard"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cid")
    )
    lab = (
        d.join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cid"), F.col("doc_id")).alias("cid"),
        )
        .selectExpr(
            "doc_id",
            "cid",
            "CAST(CAST(conv(substring(md5(CAST(cid AS STRING)), 1, 4),"
            " 16, 10) AS BIGINT) % 10 = 0 AS INT) AS is_test",
            "CAST(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4),"
            " 16, 10) AS BIGINT) % 10 = 0 AS INT) AS naive_test",
        )
    )
    lab = pin(lab)  # consumed by the cluster audit AND the doc count
    per_c = lab.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.max("is_test") - F.min("is_test")).cast("int").alias(
            "cluster_leak"
        ),
        (F.max("naive_test") - F.min("naive_test")).cast("int").alias(
            "naive_leak"
        ),
    )
    tot_test = lab.agg(F.sum("is_test").cast("bigint").alias("n_test_docs"))
    return per_c.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("cluster_leak").cast("bigint").alias("leaky_clusters"),
        F.sum("naive_leak").cast("bigint").alias("naive_leaky_clusters"),
    ).crossJoin(F.broadcast(tot_test)).select(
        "n_docs", "n_clusters", "n_test_docs",
        "leaky_clusters", "naive_leaky_clusters",
    )


# ---------------------------------------------------------------------------
# Round-12 additions: temperature sweep + exact-dedup discount report
# ---------------------------------------------------------------------------

# Shared textual shape for the sweep's weight math: w_s ∝ n_s^tau via
# exp(tau·ln n_s) — identical expression on both engines; the entropy
# and effective-source-count compose from it and ROUND 6 absorbs the
# (sum-order-sensitive) normalization.
_TEMP_W = "exp(tau * ln(CAST(n_docs AS DOUBLE)))"


@query(
    "mix_temperature_sweep_effective_sources",
    oracle=f"""
    WITH n AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    sw AS (
      SELECT tau, source, n_docs, {_TEMP_W} AS w
      FROM n,
           (SELECT CAST(unnest([0.3, 0.5, 0.7, 1.0]) AS DOUBLE) AS tau)),
    tot AS (
      SELECT tau, SUM(w) AS z, CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM sw GROUP BY tau),
    ent AS (
      SELECT sw.tau, tot.n_sources,
             -SUM((sw.w / tot.z) * ln(sw.w / tot.z)) AS h
      FROM sw JOIN tot ON tot.tau = sw.tau
      GROUP BY sw.tau, tot.n_sources)
    SELECT tau, n_sources,
           ROUND(h, 6) AS weight_entropy,
           ROUND(exp(h), 6) AS effective_sources
    FROM ent ORDER BY tau
    """,
)
def mix_temperature_sweep_effective_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-sampling sweep: for τ ∈ {0.3, 0.5, 0.7, 1.0} the
    source weights w_s ∝ n_s^τ, reported as weight entropy H and
    effective source count e^H — the knob-tuning table behind
    multilingual/multi-source mixing (τ→0 flattens toward uniform,
    τ=1 is proportional; mix_temperature_weights is the single-τ
    sibling that emits the weights themselves). Weight math is ONE
    shared exp/ln fragment; ROUND 6 absorbs the sum-order-sensitive
    normalization (composed-float rule).

    Scale shape: one source-grain aggregate; the sweep is a 4×sources
    broadcast frame."""
    n = read_table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    taus = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (1.0,)], "tau double"
    )
    sw = n.crossJoin(F.broadcast(taus)).selectExpr(
        "tau", "source", "n_docs", f"{_TEMP_W} AS w"
    )
    tot = sw.groupBy("tau").agg(
        F.sum("w").alias("z"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    ent = (
        sw.join(tot, "tau")
        .groupBy("tau", "n_sources")
        .agg(
            (-F.sum(
                (F.col("w") / F.col("z"))
                * F.log(F.col("w") / F.col("z"))
            )).alias("h")
        )
    )
    return ent.select(
        "tau",
        "n_sources",
        F.round("h", 6).alias("weight_entropy"),
        F.round(F.exp("h"), 6).alias("effective_sources"),
    ).orderBy("tau")


@query(
    "mix_dedup_discount_report",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, md5(text) AS h,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS ntok
      FROM documents),
    keep AS (
      SELECT h, MIN(doc_id) AS keeper FROM tok GROUP BY h)
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t.ntok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN k.keeper = t.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN k.keeper = t.doc_id THEN t.ntok ELSE 0 END)
                AS BIGINT) AS n_tokens_kept,
           CAST((SUM(t.ntok)
                 - SUM(CASE WHEN k.keeper = t.doc_id THEN t.ntok ELSE 0 END))
                * 1000000 // SUM(t.ntok) AS BIGINT) AS discount_ppm
    FROM tok t JOIN keep k ON k.h = t.h
    GROUP BY t.source ORDER BY t.source
    """,
)
def mix_dedup_discount_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup token-discount report: per source, how many docs and
    tokens survive md5-exact dedup (keeper = min doc_id per hash) and
    the removed-token rate in ppm — THE number a data-mixing plan
    needs before setting epoch weights (upsampling a source whose
    tokens are 30% duplicates silently overtrains the unique 70%).
    All counts exact int64; ppm is integer floor-division (both
    engines' // on non-negative ints agrees).

    Scale shape: one scan computes hash + token count; the hash-grain
    keeper aggregate is the only data-sized shuffle (the same shape as
    dedup_exact_docs); the report is a source-grain fold."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(TX.tokens("text")).cast("bigint").alias("ntok"),
    )
    tok = pin(tok)  # keeper aggregate AND report join read it
    keep = tok.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    j = tok.join(keep, "h")
    kept = F.col("keeper") == F.col("doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
            F.sum(kept.cast("int")).cast("bigint").alias("n_docs_kept"),
            F.sum(F.when(kept, F.col("ntok")).otherwise(0))
            .cast("bigint")
            .alias("n_tokens_kept"),
        )
        .withColumn(
            "discount_ppm",
            F.expr(
                "CAST((n_tokens - n_tokens_kept) * 1000000"
                " DIV n_tokens AS BIGINT)"
            ),
        )
        .orderBy("source")
    )
