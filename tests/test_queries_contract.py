"""Contract tests for the driver interface: every query runs at sf0.001
and returns a DataFrame with stable column names; oracles are a subset
of queries; streaming parity against the batch plan."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from data_ingestion_tool_spark.queries import ORACLES, QUERIES

# near-dup queries have a large one-off codegen cost; exercised in
# test_operators on literal frames instead
SLOW = {"dedup_near_minhash", "dedup_simhash", "dedup_ngram_jaccard"}


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 40


# Registry-shrink tripwire (round-8 verdict item 7): round 7's botched
# bulk edit truncated four query modules and deleted 133 registrations;
# nothing asserted the inventory size, so bench + driver ran green on
# the shrunken registry. Bump the floors when keys are ADDED; any net
# shrink must fail loudly here.
REGISTRY_FLOOR_QUERIES = 419
REGISTRY_FLOOR_ORACLES = 418


def test_registry_never_shrinks():
    assert len(QUERIES) >= REGISTRY_FLOOR_QUERIES, (
        f"query registry shrank: {len(QUERIES)} < {REGISTRY_FLOOR_QUERIES} "
        "— a query module was probably truncated (see round-7 verdict)"
    )
    assert len(ORACLES) >= REGISTRY_FLOOR_ORACLES, (
        f"oracle registry shrank: {len(ORACLES)} < {REGISTRY_FLOOR_ORACLES}"
    )


def test_entry_flagship(spark):
    df = E.entry(spark)
    assert df.columns == ["c_name", "o_orderkey", "o_totalprice"]
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SLOW))
def test_query_runs_and_has_stable_schema(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
    assert df.count() >= 0
    # column names must be stable across invocations (driver re-runs)
    assert QUERIES[name](spark, sf_dir).columns == cols


def test_streaming_matches_batch(spark, sf_dir):
    """Streaming availableNow result == batch plan on the same input
    (SURVEY.md §5.2 streaming parity)."""
    from data_ingestion_tool_spark.sources.parquet_io import read_events
    from data_ingestion_tool_spark.streaming import tumbling_window_counts

    stream_rows = sorted(
        tuple(r) for r in QUERIES["stream_tumbling_window_counts"](spark, sf_dir).collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in tumbling_window_counts(read_events(spark, sf_dir)).collect()
    )
    assert stream_rows == batch_rows


def test_window_priority_orders_failed_then_unseen(monkeypatch):
    """The driver-window rotation (the 50-key correctness gate's entire
    input): once the static priority list has verdicts, FAILED keys
    lead (fixes re-verify next round), then never-seen keys with
    prior-round keys before this round's additions; seen-and-passing
    keys leave the window."""
    import __spark_entry__ as E

    keys = ["a", "b", "c", "d", "e"]
    monkeypatch.setattr(E, "_WINDOW_PRIORITY", ["a", "b"])
    # before full coverage of the static list: static order holds
    monkeypatch.setattr(E, "_driver_verdicts", lambda: (set(), set(), set()))
    assert E._window_priority(keys) == ["a", "b"]
    # after: 'b' failed, 'c' (prior round) and 'e' (new) never seen
    monkeypatch.setattr(
        E, "_driver_verdicts", lambda: ({"a", "b", "d"}, {"b"}, set())
    )
    monkeypatch.setattr(E, "_prior_round_keys", lambda: {"a", "b", "c", "d"})
    monkeypatch.setattr(E, "_last_attested_round", lambda: {})
    # seen-and-passing keys ('a','d') now trail as the rotation tail
    # (round-13) instead of leaving the ordering entirely
    assert E._window_priority(keys) == ["b", "c", "e", "a", "d"]
    # stale rows-only verdicts re-window like failures once an oracle
    # exists ('d' was last seen as no_oracle, now hash-oracled)
    monkeypatch.setattr(
        E, "_driver_verdicts", lambda: ({"a", "b", "d"}, {"b"}, {"d"})
    )
    assert E._window_priority(keys) == ["b", "d", "c", "e", "a"]


def test_window_rotates_stalest_verdicts_when_all_seen(monkeypatch):
    """Round-12 verdict item 2: with every key seen and none
    failed/stale, the window must NOT degrade to registry-head order —
    remaining keys rotate oldest-attested-first (registry order within
    a round) so the full registry re-attests every ~ceil(N/50)
    rounds."""
    import __spark_entry__ as E

    keys = ["a", "b", "c", "d", "e"]
    monkeypatch.setattr(E, "_WINDOW_PRIORITY", ["a"])
    monkeypatch.setattr(
        E, "_driver_verdicts", lambda: (set(keys), set(), set())
    )
    monkeypatch.setattr(E, "_prior_round_keys", lambda: set(keys))
    # a,b attested r05; c r02; d r09; e r02 → oldest first, registry
    # order breaking the c/e tie
    monkeypatch.setattr(
        E,
        "_last_attested_round",
        lambda: {"a": 5, "b": 5, "c": 2, "d": 9, "e": 2},
    )
    assert E._window_priority(keys) == ["c", "e", "a", "b", "d"]
    # failed keys still lead the rotation
    monkeypatch.setattr(
        E, "_driver_verdicts", lambda: (set(keys), {"d"}, set())
    )
    assert E._window_priority(keys) == ["d", "c", "e", "a", "b"]


def test_live_window_head_is_the_stalest_keys():
    """With the real artifacts (all 507 seen, none failed), the first
    50 queries() keys must be strictly no-younger than every key
    outside the window — the CORRECTNESS_r13 gate then re-attests the
    stalest verdicts."""
    import __spark_entry__ as E
    from data_ingestion_tool_spark.queries import QUERIES

    seen, failed, stale = E._driver_verdicts()
    unseen = [k for k in QUERIES if k not in seen]
    if unseen or failed or stale:
        return  # mid-round additions pending: unseen-first order rules
    last = E._last_attested_round()
    w = list(E.queries())
    head_max = max(last[k] for k in w[:50])
    tail_min = min(last[k] for k in w[50:])
    assert head_max <= tail_min


def test_ordered_puts_window_head_first():
    """queries()/oracle_sql() must begin with the computed window so
    the driver's first-50 slice IS the rotation."""
    import __spark_entry__ as E
    from data_ingestion_tool_spark.queries import QUERIES

    w = E._window_priority(QUERIES)
    ordered = list(E.queries())
    assert ordered[: len(w)] == [k for k in w if k in QUERIES]
    assert set(ordered) == set(QUERIES)


def test_driver_window_can_catch_up_this_round():
    """Round-11 verdict item 6: the driver checks 50 keys per round, so
    the number of registry keys WITHOUT any driver verdict (plus keys
    re-windowed for failure / stale-promotion) must never exceed 50 —
    otherwise some keys stay driver-unattested forever because each
    round's additions displace last round's. Enforced at commit time:
    adding a 51st never-seen key fails this test, which is the signal
    to stop adding and let the window catch up."""
    import __spark_entry__ as E
    from data_ingestion_tool_spark.queries import QUERIES

    seen, failed, stale = E._driver_verdicts()
    unattested = [k for k in QUERIES if k not in seen]
    backlog = len(set(unattested) | failed | stale)
    assert backlog <= 50, (
        f"{backlog} keys need a driver verdict but the window holds 50: "
        f"{sorted(set(unattested) | failed | stale)[:60]}"
    )


def test_recall_fence_flags_broken_ann(spark):
    """The ANN recall fence must actually trip: an index that drops a
    query's rows breaks n_result_rows, and one returning junk
    neighbors flips recall_ok to 0 — either mismatch breaks the
    driver hash against the claim-replaying oracle."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.queries.similarity import _recall_fence

    qdf = spark.range(2).select(F.col("id").alias("qid"))
    bf = spark.createDataFrame(
        [(q, n, 0.9) for q in (0, 1) for n in (10, 11, 12)],
        "query_id long, neighbor_id long, score double",
    )
    good = bf  # ANN == brute force: 6 rows, recall 100%
    row = _recall_fence(qdf, good, bf, 3, 70).collect()[0]
    assert (row.n_queries, row.k, row.n_result_rows, row.recall_ok) == (
        2, 3, 6, 1,
    )
    # drops one query's rows -> row-count contract broken
    dropped = bf.where(F.col("query_id") == 0)
    assert _recall_fence(qdf, dropped, bf, 3, 70).collect()[0].n_result_rows == 3
    # right row count, wrong neighbors -> recall_ok flips to 0
    junk = bf.withColumn("neighbor_id", F.col("neighbor_id") + 100)
    assert _recall_fence(qdf, junk, bf, 3, 70).collect()[0].recall_ok == 0
