"""Deduplication queries over ``documents`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..sources.parquet_io import read_table
from ..plans.pin import pin
from .registry import QUERIES, query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan, spread cores-wide (round 13): the single-row-
    group local file makes every scan one task, serializing the
    tokenize/shingle/decode map stages this family fuses into it
    (guide §2.5). `spread` is a plan no-op at cluster scale."""
    from ..operators.partitioning import spread

    return spread(read_table(spark, sf_dir, "documents"), by=["doc_id"])



@query(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           MIN(doc_id) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: min-id representative per fingerprint. The
    shuffle carries (digest, id) pairs only."""
    return DD.exact_dedup_by_content(read_table(spark, sf_dir, "documents"))


_SHINGLE_PAIR_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id,
               array_to_string(t[i:least(i+2, len(t))], ' ') AS g
        FROM toks,
             LATERAL unnest(generate_series(1, greatest(len(t)-2, 1)))
               AS u(i)
        WHERE len(t) > 0
      ) WHERE g <> ''
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, CAST(ninter AS BIGINT) AS n_inter,
           CAST(sa.sz + sb.sz - ninter AS BIGINT) AS n_union
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE {num} * ninter >= {den} * (sa.sz + sb.sz - ninter)
"""


def _exact_verified_pairs(
    spark: SparkSession, sf_dir: str, num: int, den: int
) -> DataFrame:
    return _exact_verified_pairs_df(
        read_table(spark, sf_dir, "documents"), num, den
    )


def _exact_verified_pairs_df(d: DataFrame, num: int, den: int) -> DataFrame:
    """LSH candidates → EXACT distinct-shingle Jaccard ≥ den/num in
    integer cross-multiplication (num·inter ≥ den·union — no float
    boundary). Shingle sets are distinct STRING 3-grams on both
    engines, so inter/union counts match DuckDB exactly (no hash-
    collision surface).

    The shingle arrays are computed ONCE and pinned (lazy
    localCheckpoint): three consumers read them — the minhash feature
    derivation (xxhash64 over the same strings) and both sides of the
    verify join — where the naive composition re-tokenized the corpus
    per branch. At 100 TB this is the persist-the-preprocessed-
    features step of any dedup pipeline."""
    from ..operators.dedup import (
        _spread,
        minhash_near_dup_pairs_from_feats,
        shingles,
    )

    sh = (
        _spread(d)
        .select(
            F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .transform(pin, eager=False)
    )
    feats = sh.select(
        "id",
        F.transform("sh", lambda s: F.xxhash64(s)).alias("feats"),
    )
    cands = minhash_near_dup_pairs_from_feats(
        feats, jaccard_threshold=0.0
    ).select("id_a", "id_b")
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ninter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    nunion = (
        F.size("sh_a").cast("bigint")
        + F.size("sh_b").cast("bigint")
        - ninter
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            ninter.alias("n_inter"),
            nunion.alias("n_union"),
        )
        .filter(F.lit(num) * F.col("n_inter") >= F.lit(den) * F.col("n_union"))
    )


@query(
    "dedup_near_minhash",
    oracle=_SHINGLE_PAIR_ORACLE.format(num=2, den=1),
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+banded-LSH near-dup detection, promoted to a FULL
    differential oracle (round-6, the bound-as-value family): the LSH
    stage only PRUNES candidates; every emitted pair is verified by the
    EXACT distinct-shingle Jaccard (2·inter ≥ union, integer math), and
    the output carries the exact (n_inter, n_union) counts — never the
    minhash estimate. The DuckDB twin computes ALL exact-Jaccard ≥ 0.5
    pairs via a shingle inverted-index join, so the hash check proves
    both precision (exact verify can't emit a false positive) AND
    recall (a banding miss would drop a row and fail the hash).

    Seed-dependence note: 16 bands × 4 rows at J = 0.8 (the data's
    minimum true-pair similarity at sf0.01 AND sf0.1) misses a pair
    with p ≈ 2e-4 under random permutations; under the fixed seed 42
    the candidate set is deterministic and verified complete at both
    scales. tests/test_dedup_recall.py pins recall separately.

    Scale shape: candidates from banded buckets (never all-pairs; soak
    table pins ~linear growth); exact verify joins shingle arrays onto
    the CANDIDATE pairs only."""
    return _exact_verified_pairs(spark, sf_dir, num=2, den=1)


_SIMHASH_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id,
               array_to_string(t[i:least(i+1, len(t))], ' ') AS g
        FROM toks,
             LATERAL unnest(generate_series(1, greatest(len(t)-1, 1)))
               AS u(i)
        WHERE len(t) > 0
      ) WHERE g <> ''
    ),
    feat AS (
      SELECT doc_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h
      FROM sh
    ),
    bitsum AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM feat
      CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) b
      GROUP BY doc_id, b.bit
    ),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0
                           THEN (CAST(1 AS BIGINT) << bit)
                           ELSE 0 END) AS BIGINT) AS f
      FROM bitsum GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 3
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3), FULL differential oracle
    (promoted round 8, r7-verdict item 3).

    The cross-engine trick: per-shingle hash = int64 of the first 15
    hex digits of md5 (the one hash both engines compute bit-identically
    — CLAUDE.md conv/0x-cast identity), so fingerprints are 60-bit and
    the whole pipeline (tokenize → distinct bigram shingles → md5-prefix
    hash → per-bit sign-of-sum → fingerprint) is replayed exactly by the
    DuckDB twin. Production keeps xxhash64/64-bit via the operator
    default; this query pins the SAME bucketed pipeline
    (scheme=chunk_triples, the round-12 default: C(6,3)=20
    triple-buckets with ~30-bit keys, hamming<=3 recall exact by
    pigeonhole) on the oracle-able hash.

    The oracle computes ALL-PAIRS hamming over the 60-bit fingerprints
    (fine at oracle scale; 5000 docs at sf0.1), so a hash match proves
    both precision (exact verify) AND recall (a bucketing miss drops a
    row and fails the hash)."""
    d = read_table(spark, sf_dir, "documents")

    def md5_prefix60(s):
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")

    return DD.simhash_near_dup_pairs(
        d,
        max_hamming=3,
        hash_expr=md5_prefix60,
        nbits=60,
        scheme="chunk_triples",
    ).orderBy("id_a", "id_b")


@query(
    "dedup_ngram_jaccard",
    oracle=_SHINGLE_PAIR_ORACLE.format(num=5, den=4),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.8 over LSH-pruned candidate pairs —
    promoted to a full differential oracle alongside dedup_near_minhash
    (round 6): same exact-verify pipeline, tighter threshold in integer
    cross-multiplication (5·inter ≥ 4·union, exact at the J = 0.8
    boundary the data actually contains). The DuckDB twin enumerates
    ALL exact ≥ 0.8 pairs via the shingle inverted index, so the hash
    proves precision + recall of the pruned pipeline."""
    return _exact_verified_pairs(spark, sf_dir, num=5, den=4)


_RESOLVE_CLUSTERS_ORACLE = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id,
               array_to_string(t[i:least(i+2, len(t))], ' ') AS g
        FROM toks,
             LATERAL unnest(generate_series(1, greatest(len(t)-2, 1)))
               AS u(i)
        WHERE len(t) > 0
      ) WHERE g <> ''
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE 2 * ninter >= sa.sz + sb.sz - ninter
    ),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    r AS (
      SELECT src AS node, src AS reach FROM e
      UNION
      SELECT r.node, e.dst FROM r JOIN e ON e.src = r.reach
    ),
    comp AS (SELECT node, MIN(reach) AS cid FROM r GROUP BY node),
    lab AS (
      SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cid
      FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
    ),
    cl AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS cluster_size,
             MIN(doc_id) AS keeper_id
      FROM lab GROUP BY cid
    )
    SELECT cluster_size,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
           MIN(keeper_id) AS min_keeper
    FROM cl GROUP BY cluster_size
"""


@query("dedup_resolve_clusters", oracle=_RESOLVE_CLUSTERS_ORACLE)
def dedup_resolve_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup resolution: near-dup pairs → connected
    components (iterative hash-min label propagation) → one keeper per
    cluster → cluster-size census. PROMOTED to a full differential
    oracle in round 6: the pair input is now the EXACT-verified
    minhash pipeline (see dedup_near_minhash — the approximate stage
    only prunes, so DuckDB replays the identical pair graph via the
    shingle inverted index) and the iterative operator is checked
    against an independent recursive-CTE transitive closure, the
    dedup_clusters_prefix_jaccard pattern. Singletons keep themselves
    (left join + coalesce on both engines).

    Scale shape: label propagation shuffles only the near-dup PAIR
    graph (tiny vs corpus), one join + aggregate per round with
    persist-per-round lineage cuts; the census is |sizes| rows."""
    from ..operators.graph import dedup_clusters

    d = _docs(spark, sf_dir).select("doc_id", "text")
    pairs = _exact_verified_pairs(spark, sf_dir, num=2, den=1).select(
        "id_a", "id_b"
    )
    out = dedup_clusters(pairs, d, "doc_id")
    return out.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("keeper_id").alias("min_keeper"),
    )


def _pipeline_prep_oracle() -> str:
    """Composed DuckDB twin of the END-TO-END pipeline — every stage of
    the Spark composition replayed: langid argmax (the text_langid
    oracle), quality gates (integer token fence + the identical float
    ratio compare of identical doubles), the exact-verified shingle
    pair graph RESTRICTED to gated docs (the dedup_near_minhash
    oracle), recursive-CTE cluster closure with min-id keepers, and
    the per-source census."""
    from ..operators.text import ENGLISH_STOPWORDS, LANG_STOPWORDS

    vals = ", ".join(
        "('{}', [{}])".format(lang, ", ".join(f"'{w}'" for w in words))
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    en = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source,
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
    ),
    gated AS (
      SELECT f.doc_id, f.source, len(f.t) AS nt, f.t
      FROM toks f JOIN best ON best.doc_id = f.doc_id
      WHERE (CASE WHEN best.b.h > 0 THEN best.b.l ELSE 'und' END) = 'en'
        AND len(f.t) >= 20
        AND CAST(len(list_filter(f.t, x -> list_contains([{en}], x)))
                 AS DOUBLE) / greatest(len(f.t), 1) >= 0.05
    ),
    sh AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id, array_to_string(t[i:least(i+2, len(t))], ' ') AS g
        FROM gated,
             LATERAL unnest(generate_series(1, greatest(len(t)-2, 1)))
               AS u(i)
        WHERE len(t) > 0
      ) WHERE g <> ''
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE 2 * ninter >= sa.sz + sb.sz - ninter
    ),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    r AS (
      SELECT src AS node, src AS reach FROM e
      UNION
      SELECT r.node, e.dst FROM r JOIN e ON e.src = r.reach
    ),
    comp AS (SELECT node, MIN(reach) AS cid FROM r GROUP BY node),
    keep AS (
      SELECT g.doc_id, g.source, g.nt
      FROM gated g LEFT JOIN comp ON comp.node = g.doc_id
      WHERE g.doc_id = COALESCE(comp.cid, g.doc_id)
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(nt) AS BIGINT) AS n_tokens_kept
    FROM keep GROUP BY source
    """


@query("pipeline_training_data_prep", oracle=_pipeline_prep_oracle())
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data prep — the engine's component operators
    chained the way a 100 TB corpus pipeline runs them:

      language-ID → quality gates → exact-verified near-dup pairs →
      connected-components cluster resolution → keep one doc per
      cluster → per-source corpus stats.

    PROMOTED to a full differential oracle in round 6: with every
    stage now individually oracle-expressible (langid argmax, integer
    quality fences, the exact-verified pair graph, recursive-closure
    clustering), the WHOLE COMPOSITION is replayed in one DuckDB query
    — the strongest end-to-end check in the suite. The float
    stopword-ratio gate compares identical doubles (same division,
    same literal) on both engines.

    Scale shape: the gates are codegen'd column filters (prune early,
    before the expensive signature stage); the minhash stage only
    PRUNES candidates (recall verified complete on this corpus — any
    banding miss fails the hash loudly); the CC loop shuffles only the
    near-dup PAIR list, never the corpus."""
    from ..operators.graph import dedup_clusters
    from ..operators.text import lang_id, quality_features

    # _docs spreads the single-row-group scan so the langid
    # tokenization + quality HOF folds run cores-wide (guide §2.5)
    d = _docs(spark, sf_dir)
    # The gated frame feeds THREE consumers (pair generation, cluster
    # resolution, the keeper join) — pin the filtered slim projection
    # once so the langid/quality expression tree runs a single pass
    # over the corpus instead of once per branch (6.4s → ~4.7s at
    # sf0.1). At 100 TB this is the standard persist-the-curated-subset
    # step: the frame is the post-gate SURVIVOR set, already pruned to
    # four columns.
    gated = (
        quality_features(lang_id(d))
        .filter(
            (F.col("pred_lang") == "en")
            & (F.col("n_tokens") >= 20)
            & (F.col("stopword_ratio") >= 0.05)
        )
        .select("doc_id", "text", "source", "n_tokens")
        .transform(pin, eager=False)
    )
    pairs = _exact_verified_pairs_df(
        gated.select("doc_id", "text"), num=2, den=1
    ).select("id_a", "id_b")
    resolved = dedup_clusters(pairs, gated, "doc_id")
    kept = gated.join(
        resolved.filter(F.col("doc_id") == F.col("keeper_id")).select("doc_id"),
        "doc_id",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Boilerplate prefix clustering (shared-header detection)
# ---------------------------------------------------------------------------


@query(
    "dedup_boilerplate_prefix_clusters",
    oracle="""
    WITH p AS (
      SELECT doc_id, source, md5(substring(text, 1, 64)) AS prefix_digest
      FROM documents
    )
    SELECT prefix_digest,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS sample_doc_id
    FROM p
    GROUP BY prefix_digest
    HAVING COUNT(*) >= 2
    """,
)
def dedup_boilerplate_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-boilerplate detection: documents whose first 64
    characters hash identically form a prefix cluster — the cheap
    screen for template headers, licence banners, and scraped
    navigation chrome that survives full-document dedup because the
    bodies differ. Reports cluster size, how many sources share the
    boilerplate (cross-source spread ⇒ template, single-source ⇒
    house style), and a sample doc. md5 is identical cross-engine;
    substring is 1-based in both.

    Scale shape: shuffle carries (digest, source, doc_id) only —
    never text; group-by combines map-side. The 64-char prefix read
    is scan-local.
    """
    d = read_table(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        "source",
        F.md5(F.substring(F.col("text"), 1, 64)).alias("prefix_digest"),
    )
    return (
        p.groupBy("prefix_digest")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("sample_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Exact Jaccard verify stage over prefix-bucketed candidate pairs
# ---------------------------------------------------------------------------


@query(
    "dedup_prefix_bucket_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id, substring(lower(text), 1, 20) AS bucket,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS toks
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_sz,
             CAST(len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS union_sz
      FROM t a JOIN t b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, inter_sz, union_sz,
           CAST(inter_sz AS DOUBLE) / CAST(union_sz AS DOUBLE) AS jaccard
    FROM pairs
    WHERE inter_sz * 2 >= union_sz
    """,
)
def dedup_prefix_bucket_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of a candidate-based near-dup pipeline, made
    exact and oracle-checkable: candidate pairs come from a cheap
    blocking key (identical 20-char lowercase prefix — the boilerplate
    signal), then each pair gets an EXACT distinct-token Jaccard and
    survives at ≥ 0.5, compared in integers (2·|A∩B| ≥ |A∪B|, the
    CLAUDE.md threshold rule; union via inclusion-exclusion so both
    engines subtract the same intersection count). This is the same
    two-phase shape as MinHash-LSH → verify, with a deterministic
    blocking key in place of banded hashes so the whole pipeline
    hash-matches DuckDB.

    Scale shape: one shuffle on the block key; the quadratic term is
    per-bucket and buckets are boilerplate clusters (bounded — the
    PLANS.md simhash soak argument); token arrays travel once per doc
    into the join, and the Jaccard math is array-function codegen, no
    Python.
    """
    d = _docs(spark, sf_dir)
    from ..operators import text as TX

    t = d.select(
        "doc_id",
        F.substring(F.lower("text"), 1, 20).alias("bucket"),
        F.array_distinct(TX.tokens("text")).alias("toks"),
    )
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.cast("bigint").alias("inter_sz"),
            union.cast("bigint").alias("union_sz"),
        )
        .where(F.col("inter_sz") * 2 >= F.col("union_sz"))
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "inter_sz",
        "union_sz",
        (
            F.col("inter_sz").cast("double") / F.col("union_sz").cast("double")
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Connected-component clusters over DETERMINISTIC pairs (oracle-backed)
# ---------------------------------------------------------------------------


@query(
    "dedup_clusters_prefix_jaccard",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, substring(lower(text), 1, 20) AS bucket,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS toks
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM t a JOIN t b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks)) * 2
            >= len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
    ),
    e AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    r AS (
      SELECT src AS node, src AS reach FROM e
      UNION
      SELECT r.node, e.dst FROM r JOIN e ON e.src = r.reach
    )
    SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_id
    FROM r GROUP BY node
    """,
)
def dedup_clusters_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component dedup clusters with a FULL differential
    oracle: pairs come from the deterministic prefix-blocked exact-
    Jaccard verify stage (dedup_prefix_bucket_jaccard), so DuckDB can
    replay the identical graph and close it with a RECURSIVE CTE —
    the iterative hash-min label-propagation operator
    (operators/graph.py) is hash-checked against an independent
    transitive-closure formulation, not just rows-counted (the
    minhash-fed sibling dedup_resolve_clusters stays rows-only because
    its PAIR INPUT is the approximate part). Cluster id = min doc_id
    in the component on both sides.

    Scale shape: pair generation is the bucketed join (linear soak,
    PLANS.md); label propagation runs on the PAIR graph only (near-dup
    pairs, tiny vs corpus), one join + aggregate per round with
    persist-per-round lineage cuts. The oracle's closure is
    fixture-scale machinery; the Spark side is the 100 TB path.
    """
    from ..operators.graph import connected_components

    pairs = QUERIES["dedup_prefix_bucket_jaccard"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("comp").cast("bigint").alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter dedup prefilter (broadcast bitset membership)
# ---------------------------------------------------------------------------


@query(
    "dedup_bloom_prefilter",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS h FROM documents
    ),
    filt AS (SELECT h FROM h WHERE source < 'src2' AND source >= 'src10'),
    probe AS (SELECT doc_id, h FROM h
              WHERE source >= 'src2' OR source < 'src10'),
    bits AS (
      SELECT DISTINCT b FROM (
        SELECT CAST('0x' || substr(h, 1, 8) AS BIGINT) % 4096 AS b FROM filt
        UNION ALL
        SELECT CAST('0x' || substr(h, 9, 8) AS BIGINT) % 4096 AS b FROM filt
      )
    ),
    p AS (
      SELECT doc_id, h,
             CAST('0x' || substr(h, 1, 8) AS BIGINT) % 4096 AS b1,
             CAST('0x' || substr(h, 9, 8) AS BIGINT) % 4096 AS b2
      FROM probe
    )
    SELECT doc_id,
           (b1 IN (SELECT b FROM bits)) AND (b2 IN (SELECT b FROM bits))
             AS bloom_hit,
           h IN (SELECT h FROM filt) AS is_dup,
           ((b1 IN (SELECT b FROM bits)) AND (b2 IN (SELECT b FROM bits)))
             OR NOT (h IN (SELECT h FROM filt)) AS no_false_negative
    FROM p
    """,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup prefilter — the broadcast-bitset pattern that
    replaces a full shuffle anti-join at 100 TB: hash the REFERENCE
    partition's content fingerprints into an m-bit set (m = 4096 here;
    sized to corpus at scale), broadcast it, and probe every incoming
    document with k = 2 bit tests. A bloom miss PROVES novelty (no
    false negatives — pinned per row as a boolean the oracle requires
    TRUE); hits fall through to the exact check. The filter here is a
    deterministic md5-derived bitset — identical integer math on both
    engines (md5 hex → int via conv/0x-cast, CLAUDE.md rule), so the
    whole query is a FULL differential oracle with no probabilistic
    tolerance, unlike impl-dependent sketch objects.

    Reference split: sources 'src10'..'src19' (string-range predicate)
    build the filter; the rest probe. Output per probe doc: bloom_hit,
    exact is_dup, and the no-false-negative invariant.

    Scale shape: the bitset frame is ≤ m rows (broadcast); both probe
    joins are broadcast hash joins; the exact is_dup check is a
    broadcast left-semi on the reference hashes (itself prefiltered by
    bloom_hit at real scale). The probe side — the 100 TB side — never
    shuffles.
    """
    d = read_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    is_filt = (F.col("source") < "src2") & (F.col("source") >= "src10")
    filt = h.filter(is_filt).select("h")
    probe = h.filter(~is_filt).select("doc_id", "h")

    def bit(col, start):
        return (
            F.conv(F.substring(col, start, 8), 16, 10).cast("bigint") % 4096
        )

    bits = (
        filt.select(bit(F.col("h"), 1).alias("b"))
        .unionAll(filt.select(bit(F.col("h"), 9).alias("b")))
        .distinct()
    )
    p = probe.select(
        "doc_id", "h", bit(F.col("h"), 1).alias("b1"), bit(F.col("h"), 9).alias("b2")
    )
    b1s = bits.select(F.col("b").alias("b1"), F.lit(1).alias("__h1"))
    b2s = bits.select(F.col("b").alias("b2"), F.lit(1).alias("__h2"))
    dups = filt.select("h", F.lit(1).alias("__d")).distinct()
    out = (
        p.join(F.broadcast(b1s), "b1", "left")
        .join(F.broadcast(b2s), "b2", "left")
        .join(F.broadcast(dups), "h", "left")
    )
    bloom_hit = F.col("__h1").isNotNull() & F.col("__h2").isNotNull()
    is_dup = F.col("__d").isNotNull()
    return out.select(
        "doc_id",
        bloom_hit.alias("bloom_hit"),
        is_dup.alias("is_dup"),
        (bloom_hit | ~is_dup).alias("no_false_negative"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (doc-inside-doc detection)
# ---------------------------------------------------------------------------


@query(
    "dedup_containment_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id,
               array_to_string(t[i:least(i+2, len(t))], ' ') AS g
        FROM toks,
             LATERAL unnest(generate_series(1, greatest(len(t)-2, 1)))
               AS u(i)
        WHERE len(t) > 0
      ) WHERE g <> ''
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, CAST(ninter AS BIGINT) AS n_inter,
           CAST(least(sa.sz, sb.sz) AS BIGINT) AS n_min
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE 10 * ninter >= 9 * least(sa.sz, sb.sz)
    """,
)
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment near-dup: |A∩B| / min(|A|,|B|) ≥ 0.9 over
    distinct 3-gram shingles — catches a document quoted or embedded
    inside a larger one, which symmetric Jaccard under-scores (J of a
    doc inside one twice its size caps at 0.5). Same LSH-prune →
    exact-verify pipeline as dedup_near_minhash (candidate recall
    verified complete at both SFs); the threshold compares in integer
    cross-multiplication (10·inter ≥ 9·min), and the output carries
    the exact (inter, min-size) counts the DuckDB inverted-index twin
    recomputes independently."""
    from ..operators.dedup import (
        _spread,
        minhash_near_dup_pairs_from_feats,
        shingles,
    )

    d = _docs(spark, sf_dir)
    sh = (
        _spread(d)
        .select(
            F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .transform(pin, eager=False)
    )
    feats = sh.select(
        "id", F.transform("sh", lambda s: F.xxhash64(s)).alias("feats")
    )
    cands = minhash_near_dup_pairs_from_feats(
        feats, jaccard_threshold=0.0
    ).select("id_a", "id_b")
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ninter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    nmin = F.least(F.size("sh_a"), F.size("sh_b")).cast("bigint")
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", ninter.alias("n_inter"), nmin.alias("n_min")
        )
        .filter(F.lit(10) * F.col("n_inter") >= F.lit(9) * F.col("n_min"))
    )


@query(
    "dedup_sorted_neighborhood",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             substring(lower(trim(text)), 1, 2) AS blk,
             substring(lower(trim(text)), 1, 12) AS skey,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS toks
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, blk, toks,
             ROW_NUMBER() OVER (PARTITION BY blk
                                ORDER BY skey, doc_id) AS rn
      FROM t
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_sz,
             CAST(len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS union_sz
      FROM ranked a JOIN ranked b
        ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 3
    )
    SELECT doc_a, doc_b, inter_sz, union_sz,
           CAST(inter_sz AS DOUBLE) / CAST(union_sz AS DOUBLE) AS jaccard
    FROM pairs
    WHERE inter_sz * 2 >= union_sz
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez-Stolfo SNM) — the classic
    entity-resolution blocking strategy the LSH family doesn't cover:
    sort by a normalization key (12-char lowercase prefix), compare
    each record only against the next 3 in sort order, then verify
    candidates with the EXACT integer-compared Jaccard (2·|A∩B| ≥
    |A∪B|). Sliding the window over a sort catches near-dups whose
    prefixes differ past any fixed blocking cut, at a guaranteed
    O(n·w) candidate budget — no bucket-size blowup, ever.

    Scale shape: the sort is range-partitioned by the 2-char block
    (the production multi-pass SNM key hierarchy); row_number rides
    that one shuffle, and the ranked frame is pinned so the
    tokenize/rank pipeline runs once, not once per join side. The
    window band is generated as an EQUI-join on (blk, rn+δ), δ∈{1,2,3}
    — a hash join that emits exactly ≤3n candidate rows; joining on blk
    alone with a rank-band residual would materialize |block|² pairs
    first, which is precisely the bucket blowup SNM exists to avoid."""
    d = read_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from ..operators import text as TX

    norm = F.lower(F.trim(F.col("text")))
    t = d.select(
        "doc_id",
        F.substring(norm, 1, 2).alias("blk"),
        F.substring(norm, 1, 12).alias("skey"),
        F.array_distinct(TX.tokens("text")).alias("toks"),
    )
    w = Window.partitionBy("blk").orderBy("skey", "doc_id")
    ranked = t.select(
        "doc_id", "blk", "toks", F.row_number().over(w).alias("rn")
    ).transform(pin, eager=False)
    a = (
        ranked.select(
            "doc_id",
            "blk",
            "toks",
            "rn",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("delta"),
        )
        .select(
            "doc_id", "blk", "toks", (F.col("rn") + F.col("delta")).alias("rn")
        )
        .alias("a")
    )
    b = ranked.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    pairs = a.join(b, ["blk", "rn"]).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.cast("bigint").alias("inter_sz"),
        union.cast("bigint").alias("union_sz"),
    )
    return pairs.filter(F.col("inter_sz") * 2 >= F.col("union_sz")).select(
        "doc_a",
        "doc_b",
        "inter_sz",
        "union_sz",
        (F.col("inter_sz").cast("double") / F.col("union_sz").cast("double"))
        .alias("jaccard"),
    )


@query(
    "dedup_lsh_calibration_sweep",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id,
               array_to_string(t[i:least(i+2, len(t))], ' ') AS g
        FROM toks,
             LATERAL unnest(generate_series(1, greatest(len(t)-2, 1)))
               AS u(i)
        WHERE len(t) > 0
      ) WHERE g <> ''
    ),
    hv AS (
      SELECT doc_id, sp.i AS i,
             MIN(CAST('0x' || substr(md5(g || ':' || sp.i), 1, 15)
                 AS BIGINT)) AS mh
      FROM sh, (SELECT unnest(generate_series(1, 24)) AS i) sp
      GROUP BY doc_id, sp.i
    ),
    cfgs AS (SELECT * FROM (VALUES (12, 2), (8, 3), (6, 4)) c(bands, rpb)),
    bucketed AS (
      SELECT c.bands, c.rpb, hv.doc_id,
             CAST((hv.i - 1) // c.rpb AS INT) AS band,
             string_agg(CAST(hv.mh AS VARCHAR), ',' ORDER BY hv.i) AS bucket
      FROM hv, cfgs c
      GROUP BY c.bands, c.rpb, hv.doc_id, CAST((hv.i - 1) // c.rpb AS INT)
    ),
    cand AS (
      SELECT DISTINCT b1.bands, b1.rpb,
             b1.doc_id AS id_a, b2.doc_id AS id_b
      FROM bucketed b1
      JOIN bucketed b2
        ON b1.bands = b2.bands AND b1.rpb = b2.rpb
       AND b1.band = b2.band AND b1.bucket = b2.bucket
       AND b1.doc_id < b2.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    tp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING 2 * COUNT(*) >=
             (SELECT sz FROM sizes WHERE doc_id = a.doc_id)
             + (SELECT sz FROM sizes WHERE doc_id = b.doc_id) - COUNT(*)
    ),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM tp)
    SELECT c.bands, c.rpb AS rows_per_band,
           CAST(COUNT(cand.id_a) AS BIGINT) AS n_candidates,
           CAST(COALESCE(SUM(CASE WHEN tp.id_a IS NOT NULL THEN 1 ELSE 0
                END), 0) AS BIGINT) AS n_caught,
           (SELECT n_true FROM nt) AS n_true
    FROM cfgs c
    LEFT JOIN cand ON cand.bands = c.bands AND cand.rpb = c.rpb
    LEFT JOIN tp ON tp.id_a = cand.id_a AND tp.id_b = cand.id_b
    GROUP BY c.bands, c.rpb
    ORDER BY c.rpb
    """,
)
def dedup_lsh_calibration_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH CALIBRATION SWEEP with a full differential oracle:
    three banding configurations (12x2, 8x3, 6x4) over the SAME 24
    md5-derived minhash functions, each reporting candidate volume and
    recall against the exact Jaccard>=0.5 truth — the sweep an engineer
    runs to pick the banding operating point (more rows/band = fewer
    candidates, lower recall: the S-curve made measurable).

    Determinism: the signature is sig_i = min over distinct 3-gram
    shingles of md5int60(shingle:i) — Python-free, engine-identical
    integer mins (the int-SRP/md5 technique applied to minhash), band
    buckets are the comma-joined signature slices (exact strings), and
    truth is the integer-cross-multiplied exact Jaccard over the
    shingle inverted index.  Every output cell is an exact integer.

    Scale shape: signatures are per-doc codegen HOFs (24 array-mins
    over a bound shingle column — computed once, not per band);
    candidates come from bucket self-joins on short keys (never
    all-pairs); the truth join is the shingle inverted index (postings
    bounded by shingle frequency).  At 100 TB the truth column is the
    expensive honest part — run the sweep on a sampled stratum and
    keep candidate counting full-corpus."""
    from ..operators.dedup import _spread, shingles

    d = read_table(spark, sf_dir, "documents")
    sh = (
        _spread(d)
        .select(
            F.col("doc_id").alias("id"),
            F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .transform(pin, eager=False)
    )

    # build sig columns via selectExpr (exact expression parity with
    # the oracle's md5-prefix int60)
    sig_exprs = [
        f"array_min(transform(sh, s -> CAST(conv(substr(md5(concat(s,"
        f" ':', '{i}')), 1, 15), 16, 10) AS BIGINT))) AS mh{i}"
        for i in range(1, 25)
    ]
    sigs = sh.selectExpr("id", *sig_exprs).transform(pin, eager=False)

    cfgs = [(12, 2), (8, 3), (6, 4)]
    bucket_rows = []
    for bands, rpb in cfgs:
        for band in range(bands):
            cols = [f"mh{band * rpb + t + 1}" for t in range(rpb)]
            bucket_rows.append(
                F.struct(
                    F.lit(bands).alias("bands"),
                    F.lit(rpb).alias("rpb"),
                    F.lit(band).alias("band"),
                    F.concat_ws(
                        ",", *[F.col(c).cast("string") for c in cols]
                    ).alias("bucket"),
                )
            )
    bucketed = sigs.select(
        "id", F.explode(F.array(*bucket_rows)).alias("bb")
    ).select("id", "bb.bands", "bb.rpb", "bb.band", "bb.bucket")
    b1 = bucketed.alias("b1")
    b2 = bucketed.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.bands") == F.col("b2.bands"))
            & (F.col("b1.rpb") == F.col("b2.rpb"))
            & (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.bucket") == F.col("b2.bucket"))
            & (F.col("b1.id") < F.col("b2.id")),
        )
        .select(
            F.col("b1.bands").alias("bands"),
            F.col("b1.rpb").alias("rpb"),
            F.col("b1.id").alias("id_a"),
            F.col("b2.id").alias("id_b"),
        )
        .distinct()
        # round 14: BOTH consumers (n_caught, n_candidates) re-derived
        # the bucket self-join + distinct; the pin guarantees one
        # evaluation (static plan: 28 -> 20 Exchange/Scan/SMJ nodes).
        # Local solo wall time is UNCHANGED (3.58 -> 3.62 s — the
        # duplicate ran in otherwise-idle cores / AQE exchange reuse
        # absorbed it); kept because a candidate pair list is tiny and
        # at scale the duplicated subtree is real compute (guide §5)
        .transform(pin, eager=False)
    )
    # exact truth: inverted-index join + integer Jaccard
    ex = sh.select("id", F.explode("sh").alias("g"))
    sizes = sh.select("id", F.size("sh").cast("bigint").alias("sz"))
    ea, eb = ex.alias("ea"), ex.alias("eb")
    inter = (
        ea.join(
            eb,
            (F.col("ea.g") == F.col("eb.g"))
            & (F.col("ea.id") < F.col("eb.id")),
        )
        .groupBy(
            F.col("ea.id").alias("id_a"), F.col("eb.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("ninter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    tp = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            2 * F.col("ninter")
            >= F.col("sz_a") + F.col("sz_b") - F.col("ninter")
        )
        .select("id_a", "id_b")
        .transform(pin, eager=False)
    )
    nt = tp.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    cfg_df = spark.createDataFrame(cfgs, "bands int, rpb int")
    caught = cand.join(tp, ["id_a", "id_b"], "left_semi").groupBy(
        "bands", "rpb"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_caught"))
    ncand = cand.groupBy("bands", "rpb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return (
        cfg_df.join(F.broadcast(ncand), ["bands", "rpb"], "left")
        .join(F.broadcast(caught), ["bands", "rpb"], "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "bands",
            F.col("rpb").alias("rows_per_band"),
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            F.coalesce(F.col("n_caught"), F.lit(0))
            .cast("bigint")
            .alias("n_caught"),
            "n_true",
        )
        .orderBy("rows_per_band")
    )


@query(
    "dedup_char_shingle_memorization",
    oracle="""
    WITH docs AS (
      SELECT doc_id, source, text, CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) >= 16
    ),
    gr AS (
      SELECT doc_id, source,
             substr(text, CAST(o AS INT), 16) AS g
      FROM docs,
           LATERAL unnest(generate_series(1, CAST(n AS INT) - 15, 8))
             AS u(o)
    ),
    dg AS (SELECT DISTINCT doc_id, source, g FROM gr),
    freq AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM dg GROUP BY g
    ),
    perdoc AS (
      SELECT dg.doc_id, dg.source,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN freq.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM dg JOIN freq ON freq.g = dg.g
      GROUP BY dg.doc_id, dg.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
           CAST(SUM(n_shared) AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN 5 * n_shared >= n_shingles
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_memorization_risk
    FROM perdoc GROUP BY source ORDER BY source
    """,
)
def dedup_char_shingle_memorization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHARACTER-level cross-document duplication audit (the
    suffix-array-style memorization check of Lee et al.'s training-data
    dedup, bucketed instead of suffix-sorted): stride-8 16-char
    shingles per doc, a shingle is SHARED when it appears in more than
    one document, and a doc is memorization-risk when >=20%% of its
    shingles are shared (integer cross-multiplication 5*shared >=
    total).  Character grain catches templated/boilerplate overlap
    that word-n-gram Jaccard dilutes.

    Determinism: substr offsets, distinct-shingle document frequencies
    and all thresholds are exact integer/string operations (SQL substr
    is byte-identical on this ASCII corpus; `strlen` bytes == chars
    here).

    Scale shape: the shingle explode is ~n_chars/8 rows per doc
    executor-side; document frequency is ONE map-side-combinable
    groupBy on the shingle string (the inverted index grain), joined
    back at the (doc, shingle) grain — never doc-pairs; the rollup is
    per-source.  At 100 TB the shingle key is the shuffle: hash-
    partitioned, skew-free (16-char keys), with stride the knob that
    trades recall for volume."""
    d = read_table(spark, sf_dir, "documents")
    docs = d.filter(F.length("text") >= 16).select(
        "doc_id", "source", "text", F.length("text").alias("n")
    )
    offs = F.sequence(
        F.lit(1), (F.col("n") - F.lit(15)).cast("int"), F.lit(8)
    )
    gr = docs.select(
        "doc_id",
        "source",
        F.explode(offs).alias("o"),
        F.col("text"),
    ).select(
        "doc_id",
        "source",
        F.expr("substr(text, o, 16)").alias("g"),
    )
    dg = gr.distinct().transform(pin, eager=False)
    freq = dg.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    perdoc = (
        dg.join(freq, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_shingles").cast("bigint").alias("n_shingles"),
            F.sum("n_shared").cast("bigint").alias("n_shared"),
            F.sum(
                F.when(
                    5 * F.col("n_shared") >= F.col("n_shingles"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_memorization_risk"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-12: cross-engine-exact MinHash signatures + estimate-vs-exact error
# ---------------------------------------------------------------------------

# k=12 universal-hash permutations h_j(x) = (a_j·x + b_j) mod p over the
# Mersenne prime p = 2^31−1, with x = md5int60(token) mod p — every
# number is a non-negative int64 well inside 2^63, and md5 is the one
# per-token hash both engines compute bit-identically, so the WHOLE
# signature replays in DuckDB (production minhash keeps xxhash64 via
# operators/dedup.py; this query pins the same machinery on the
# oracle-able hash — the dedup_simhash promotion pattern).
_MH_P = 2_147_483_647
_MH_PERMS = [(999_983 * j + 17, 104_729 * j + 31) for j in range(1, 13)]


def _mh_perm(a: int, b: int):
    """One-ARG lambda factory for F.transform (PySpark dispatches on
    lambda arity — default-arg closures break HOFs, CLAUDE.md rule)."""

    def f(v):
        return (a * v + b) % _MH_P

    return f


def _minhash_error_oracle() -> str:
    sig_cols = ",\n             ".join(
        f"list_min(list_transform(x, v -> ({a} * v + {b}) % {_MH_P}))"
        f" AS s{j}"
        for j, (a, b) in enumerate(_MH_PERMS)
    )
    eqs = " + ".join(
        f"CASE WHEN a.s{j} = b.s{j} THEN 1 ELSE 0 END"
        for j in range(len(_MH_PERMS))
    )
    return f"""
    WITH t AS (
      SELECT doc_id, substring(lower(text), 1, 20) AS bucket,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS toks
      FROM documents)
      , tnz AS (SELECT * FROM t WHERE len(toks) > 0),
    h AS (
      SELECT doc_id, bucket, toks,
             list_transform(toks,
               tok -> CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
                      % {_MH_P}) AS x
      FROM tnz),
    sig AS (
      SELECT doc_id, bucket, toks,
             {sig_cols}
      FROM h),
    pairs AS (
      SELECT ({eqs}) AS matches,
             CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS i,
             CAST(len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS u
      FROM sig a JOIN sig b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
    SELECT CAST(matches AS INT) AS sig_matches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(i * 1000000 // u) AS BIGINT) AS sum_jaccard_ppm,
           CAST(SUM(abs(matches * 1000000 // {len(_MH_PERMS)}
                        - i * 1000000 // u)) AS BIGINT) AS sum_abs_err_ppm
    FROM pairs GROUP BY matches ORDER BY sig_matches
    """


@query("dedup_minhash_signature_error", oracle=_minhash_error_oracle())
def dedup_minhash_signature_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash accuracy census, fully hash-oracled: over the
    deterministic prefix-blocked candidate pairs, compare the k=12
    signature-agreement Jaccard estimate against the EXACT distinct-
    token Jaccard, grouped by match count — the calibration table that
    says what an LSH threshold actually buys (E[matches]/k = J; the
    per-band tables live in dedup_lsh_calibration_sweep). All integer
    math: md5-derived token hashes mod 2^31−1, int64 permutation mins,
    ppm floor-divisions.

    Scale shape: signatures are one per-row array fold (tokens travel
    once); the pair join is the bounded prefix-block self-join;
    everything after is a 13-group fold."""
    from ..operators import text as TX

    d = read_table(spark, sf_dir, "documents")
    t = d.filter(
        # empty-token guard (round-13 advice): a whitespace-only text
        # yields array_min over [] = NULL signatures → a NULL matches
        # group and u=0 NULL ppm divisions that DuckDB's CASE maps
        # differently; such docs carry no tokens to estimate over.
        # Predicated on the RAW text (contains any non-whitespace ⟺
        # \s+-tokens non-empty) so the filter runs before tokenization
        # instead of collapsing into the token projection. Measured
        # cost of the guard in either form: ~0.3s solo at sf0.1
        # (1.19 → 1.45-1.54s), inside the boot-variance band — the
        # round-13 bench flag vs the 0.83s prior-suite figure is
        # position/boot noise on top of that (BASELINE.md round-13).
        F.col("text").rlike(r"\S")
    ).select(
        "doc_id",
        F.substring(F.lower("text"), 1, 20).alias("bucket"),
        F.array_distinct(TX.tokens("text")).alias("toks"),
    ).withColumn(
        "x",
        F.transform(
            F.col("toks"),
            lambda tok: F.conv(F.substring(F.md5(tok), 1, 15), 16, 10)
            .cast("long")
            % _MH_P,
        ),
    )
    sig = t.select(
        "doc_id",
        "bucket",
        "toks",
        *[
            F.array_min(
                F.transform(F.col("x"), _mh_perm(a, b))
            ).alias(f"s{j}")
            for j, (a, b) in enumerate(_MH_PERMS)
        ],
    )
    sig = pin(sig)  # both sides of the self-join read one frame
    a, b = sig.alias("a"), sig.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = (
        F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    )
    matches = None
    for j in range(len(_MH_PERMS)):
        term = (F.col(f"a.s{j}") == F.col(f"b.s{j}")).cast("int")
        matches = term if matches is None else matches + term
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        matches.alias("matches"),
        inter.cast("bigint").alias("i"),
        union.cast("bigint").alias("u"),
    )
    k = len(_MH_PERMS)
    return (
        pairs.groupBy("matches")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.expr("i * 1000000 DIV u"))
            .cast("bigint")
            .alias("sum_jaccard_ppm"),
            F.sum(
                F.abs(
                    F.expr(f"matches * 1000000 DIV {k}")
                    - F.expr("i * 1000000 DIV u")
                )
            )
            .cast("bigint")
            .alias("sum_abs_err_ppm"),
        )
        .select(
            F.col("matches").cast("int").alias("sig_matches"),
            "n_pairs",
            "sum_jaccard_ppm",
            "sum_abs_err_ppm",
        )
        .orderBy("sig_matches")
    )


# ---------------------------------------------------------------------------
# Round-12: cluster-size histogram over the deterministic dedup graph
# ---------------------------------------------------------------------------


def _cluster_size_hist_oracle() -> str:
    """Composed verbatim from ORACLES['dedup_clusters_prefix_jaccard']
    (the round-11-advice CTE-composition discipline): the histogram can
    never desynchronize from the cluster construction it summarizes."""
    from .registry import ORACLES

    return f"""
    WITH RECURSIVE cc AS ({ORACLES["dedup_clusters_prefix_jaccard"]}),
    singles AS (
      SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
      FROM singles GROUP BY cluster_id)
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * sz AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz ORDER BY sz
    """


@query("dedup_cluster_size_histogram", oracle=_cluster_size_hist_oracle())
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-size distribution of the deterministic near-dup graph
    (singletons included) — the planning histogram for dedup policy:
    keep-one-per-cluster removes Σ(size−1) docs, and a fat tail says
    boilerplate flooding, not pairwise noise. Reuses the hash-oracled
    cluster construction; the oracle composes that key's SQL verbatim
    as a CTE, so both layers stay in lockstep by construction.

    Scale shape: label propagation on the pair graph only; the
    histogram is a two-level bounded aggregate."""
    d = _docs(spark, sf_dir).select("doc_id")
    cc = QUERIES["dedup_clusters_prefix_jaccard"](spark, sf_dir)
    singles = d.join(cc, "doc_id", "left").select(
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id")
    )
    sizes = singles.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            (F.col("n_clusters") * F.col("sz"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )
