"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01, runs its ``oracle_sql()`` twin
in DuckDB over the same parquet tables, and compares row count, column
names, and an order-insensitive value hash. Rows-only queries are
executed and row-counted.

Usage: python tools/verify_local.py [query_name ...]
       python tools/verify_local.py --magnitude   # sf0.1 cross-check of
                                                  # the magnitude-sensitive
                                                  # key list (see below)
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Magnitude-sensitive keys: statistics whose intermediate sums GROW with
# n can defeat fixed-decimal rounding only at larger scale (the ANOVA
# lesson, round-5 ADVICE: green at sf0.01, red at sf0.1). The 10x
# cross-check is machinery, not discipline: `--magnitude` runs exactly
# this list against sf0.1 in one command — run it whenever touching a
# stats/quantile/moment query. Prefix families + named extras.
_MAG_PREFIXES = ("stats_", "quantile_", "outlier_", "histogram_", "quality_")
_MAG_EXTRA = {
    # (stats_* keys are covered wholesale by _MAG_PREFIXES — the
    # round-12 moment additions stats_two_proportion_ztest /
    # stats_bartlett_variance_test / stats_partial_corr_qty_price /
    # stats_durbin_watson_hourly are magnitude-checked via the prefix)
    "events_acf_lags_1_to_5",
    "agg_regr_slope_intercept",
    "agg_spearman_corr",
    "agg_corr_from_moments",
    "agg_weighted_avg",
    "agg_geo_harmonic_means",
    "agg_gini_coefficient",
    "agg_stats",
    "events_autocorr_lag1",
    "events_anomaly_zscore",
    "events_daily_anomaly_zscore",
    "events_cusum_drift",
    "events_ab_cuped_adjustment",
    "events_ewma_per_user",
    "events_rolling_corr_click_purchase",
    "events_user_entropy_event_mix",
    "embedding_silhouette_per_label",
    "embedding_centroid_drift",
    "embedding_dim_variance_profile",
    "embedding_centroid_distance_matrix",
    "embedding_centroid_per_label",
    "part_brand_price_size_regression",
    "orders_decile_lift_table",
    "text_zipf_rank_slope",
    "text_unigram_logprob",
    "text_kl_source_vs_corpus",
    "text_js_divergence_sources",
    "text_bigram_conditional_entropy",
    "mix_moore_lewis_source_score",
    "mix_dsir_hashed_importance",
    "text_bm25_query_scores",
    "text_bigram_lm_heldout_nll",
    "filter_lm_perplexity_decile",
    "text_zipf_alpha_fit",
    "text_tfidf_keywords_topk",
    "orders_mann_kendall_trend",
    "embedding_pca_top_component",
    "embedding_silhouette_per_label",
    "similarity_centroid_assign_counts",
    "orders_concentration_hhi_by_nation",
    # pruned-ANN recall fences: the recall_ok margin is data-dependent
    # (hits vs floor), so any constant churn must re-verify at sf0.1
    # (round-11 verdict item 7)
    "similarity_topk_pq",
    "similarity_topk_ivf",
    "similarity_topk_ivfpq",
    "similarity_recall_vs_nprobe_curve",
    # round-12 composed-float additions (ROUND-6 outputs whose drift
    # only shows at scale: log-log OLS, exp/ln weight sweep, PMI top-k
    # boundary)
    "text_heaps_law_fit",
    "text_bigram_pmi_topk",
    "mix_temperature_sweep_effective_sources",
    "events_acf_lags_1_to_5",
}


def magnitude_keys(all_names) -> list[str]:
    return [
        n
        for n in all_names
        if n.startswith(_MAG_PREFIXES) or n in _MAG_EXTRA
    ]


def norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


# DuckDB oracle output types must land in the same TYPE FAMILY as the
# Spark result dtypes — the driver's value hash is type-sensitive even
# when the local stringified compare isn't (round-2 lesson: SUM(CASE...)
# types as HUGEINT in DuckDB vs BIGINT in Spark and the driver flagged it
# while this gate passed). Driver-green history pins the tolerance level:
# bigint↔INTEGER and timestamp_ntz↔TIMESTAMP were hash-GREEN (r01/r02:
# json_roundtrip, tpch_q3/q18), so widths within a family are fine; only
# cross-family drift and exotic types (HUGEINT/DECIMAL/UHUGEINT) fail.
_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "float",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BOOLEAN": "boolean",
    "BLOB": "binary",
}
_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "boolean": "boolean",
    "binary": "binary",
}


def _family(t: str, table: dict):
    t = t.strip()
    if table is _DUCK_FAMILY and t.endswith("[]"):
        inner = _family(t[:-2], table)
        return None if inner is None else f"array<{inner}>"
    if table is _SPARK_FAMILY and t.startswith("array<") and t.endswith(">"):
        inner = _family(t[6:-1], table)
        return None if inner is None else f"array<{inner}>"
    return table.get(t)


def type_problems(sdtypes, duck_desc):
    """Compare Spark (name, dtype) pairs against DuckDB DESCRIBE rows by
    type FAMILY; exotic oracle output types (HUGEINT, DECIMAL, ...) are
    always a failure — cast them in the oracle SQL."""
    spark_types = dict(sdtypes)
    problems = []
    for dname, dtype in duck_desc:
        dfam = _family(dtype, _DUCK_FAMILY)
        if dfam is None:
            problems.append(
                f"oracle col {dname!r} has exotic/unmapped type {dtype} "
                "(cast it: HUGEINT/DECIMAL outputs hash-mismatch at the driver)"
            )
            continue
        if dname not in spark_types:
            continue  # column-name mismatch is reported separately
        sfam = _family(spark_types[dname], _SPARK_FAMILY)
        if sfam != dfam:
            problems.append(
                f"type-family mismatch col {dname!r}: "
                f"spark={spark_types[dname]} ({sfam}) oracle={dtype} ({dfam})"
            )
    return problems


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    from data_ingestion_tool_spark.session import get_spark
    import __spark_entry__ as E

    global SF_DIR
    args = [a for a in sys.argv[1:] if a != "--magnitude"]
    magnitude = "--magnitude" in sys.argv[1:]
    if magnitude and "SPARK_GRAFT_VERIFY_SF_DIR" not in os.environ:
        SF_DIR = "/root/testdata/sf0.1"

    spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(args)
    if magnitude:
        mag = set(magnitude_keys(qs))
        only = (only & mag) if only else mag
        print(f"magnitude cross-check: {len(only)} keys at {SF_DIR}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only, {len(srows)} rows, {dt:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        try:
            ddesc = [
                (r[0], r[1])
                for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb describe error: {type(e).__name__}: {e}")
            continue
        problems = type_problems(sdtypes, ddesc)
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a sample diff
                sset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                }
                dset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"        spark-only: {x[:160]}")
                for x in list(dset - sset)[:3]:
                    print(f"        duck-only:  {x[:160]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"PASS  {name}: {len(srows)} rows, {dt:.1f}s")
    print(
        f"\n{len(failures)} failures / {len(only) if only else len(qs)} run"
        + (f": {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
