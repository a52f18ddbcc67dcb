"""Independent cross-checks of the statistics family against
numpy/pandas reference implementations (the DuckDB oracle proves
cross-engine agreement; these prove both engines compute the intended
statistic)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_ingestion_tool_spark.queries import QUERIES


@pytest.fixture(scope="module")
def events_pdf(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, ts, user_id, event_type, value"
        f" FROM '{sf_dir}/events.parquet'"
    ).df()


def test_ewma_matches_pandas(spark, sf_dir, events_pdf):
    """F.aggregate fold == pandas ewm(alpha=0.1, adjust=False) last."""
    got = {
        r.user_id: r.ewma
        for r in QUERIES["events_ewma_per_user"](spark, sf_dir).collect()
    }
    for uid, g in events_pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        want = g["value"].ewm(alpha=0.1, adjust=False).mean().iloc[-1]
        assert got[uid] == pytest.approx(want, abs=1e-6), uid


def test_autocorr_matches_numpy(spark, sf_dir, events_pdf):
    got = {
        r.event_type: (r.n_pairs, r.autocorr)
        for r in QUERIES["events_autocorr_lag1"](spark, sf_dir).collect()
    }
    for et, g in events_pdf.sort_values(["ts", "event_id"]).groupby("event_type"):
        x = g["value"].to_numpy()
        r = np.corrcoef(x[:-1], x[1:])[0, 1]
        n, got_r = got[et]
        assert n == len(x) - 1
        assert got_r == pytest.approx(r, abs=1e-9), et


def test_iqr_outliers_match_numpy(spark, sf_dir):
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_returnflag AS grp, l_extendedprice AS p"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    got = {
        r.grp: (r.n, r.q1_cents, r.q3_cents, r.n_outliers)
        for r in QUERIES["outlier_iqr_price"](spark, sf_dir).collect()
    }
    for grp, g in li.groupby("grp"):
        cents = np.sort(np.round(g["p"].to_numpy() * 100).astype(np.int64))
        n = len(cents)
        q1 = cents[(n - 1) // 4]
        q3 = cents[(3 * (n - 1)) // 4]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        outliers = int(((cents < lo) | (cents > hi)).sum())
        assert got[grp] == (n, q1, q3, outliers), grp


def test_histogram_matches_numpy(spark, sf_dir):
    con = duckdb.connect()
    p = con.execute(
        f"SELECT l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
    ).df()["l_extendedprice"].to_numpy()
    cents = np.round(p * 100).astype(np.int64)
    mask = (cents >= 90_000) & (cents < 90_000 + 20 * 520_500)
    buckets = (cents[mask] - 90_000) // 520_500
    want = {int(b): int(c) for b, c in zip(*np.unique(buckets, return_counts=True))}
    got = {
        r.bucket: r.cnt
        for r in QUERIES["histogram_price_fixed_bins"](spark, sf_dir).collect()
    }
    assert got == want
    assert mask.all(), "fixed bounds should cover every observed price"


def test_markov_probs_normalize(spark, sf_dir):
    rows = QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.prob
        assert 0.0 < r.prob <= 1.0
    for ft, total in by_from.items():
        assert total == pytest.approx(1.0, abs=1e-12), ft


def test_twap_matches_pandas(spark, sf_dir, events_pdf):
    got = {
        r.user_id: (r.n_segments, r.twap)
        for r in QUERIES["events_twap_per_user"](spark, sf_dir).collect()
    }
    for uid, g in events_pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        v = g["value"].to_numpy()
        dt = np.diff(ts)
        keep = dt > 0
        if not keep.any():
            assert uid not in got
            continue
        want = float((v[:-1][keep] * dt[keep]).sum() / dt[keep].sum())
        n, twap = got[uid]
        assert n == int(keep.sum())
        assert twap == pytest.approx(want, rel=1e-12), uid


def test_fuzzy_join_pairs_sane(spark, sf_dir):
    rows = QUERIES["fuzzy_join_levenshtein"](spark, sf_dir).collect()
    assert rows, "expected at least one brand with close name pairs"
    for r in rows:
        assert r.n_pairs >= 1
        assert 0 <= r.min_dist <= 15


def test_stratified_sample_is_exact_and_stable(spark, sf_dir):
    q = QUERIES["sample_stratified_by_source"]
    a = {(r.doc_id, r.source) for r in q(spark, sf_dir).collect()}
    b = {(r.doc_id, r.source) for r in q(spark, sf_dir).collect()}
    assert a == b, "md5-ordered sample must be run-stable"
    per_source: dict[str, int] = {}
    for _, src in a:
        per_source[src] = per_source.get(src, 0) + 1
    assert all(v <= 5 for v in per_source.values())


def test_anomaly_zscore_matches_float_reference(spark, sf_dir, events_pdf):
    """Integer fence == float z-score classification (no events sit on
    the fence in this data; the integer form exists so that if one ever
    does, both engines agree)."""
    got = {
        r.event_type: (r.n, r.n_anomalies)
        for r in QUERIES["events_anomaly_zscore"](spark, sf_dir).collect()
    }
    for et, g in events_pdf.groupby("event_type"):
        x = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        mu, sd = x.mean(), x.std()  # population std, matching n*SS - S^2
        z = (x - mu) / sd
        assert got[et] == (len(x), int((np.abs(z) > 3).sum())), et


def test_spearman_matches_pandas(spark, sf_dir):
    """Tie-aware average-rank Spearman == pandas corr(method='spearman')."""
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_returnflag AS grp, l_extendedprice AS p, l_quantity AS q"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    got = {
        r.grp: r.spearman_rho
        for r in QUERIES["agg_spearman_corr"](spark, sf_dir).collect()
    }
    for grp, g in li.groupby("grp"):
        # rank(average) + Pearson == Spearman (scipy-free)
        want = g["p"].rank(method="average").corr(g["q"].rank(method="average"))
        assert got[grp] == pytest.approx(want, abs=1e-12), grp


def test_chi_square_matches_reference(spark, sf_dir, events_pdf):
    """Cell terms rebuild the classic chi2 statistic computed directly
    from the pandas contingency table."""
    rows = QUERIES["events_chi_square_independence"](spark, sf_dir).collect()
    got_stat = sum(r.chi2_term for r in rows)
    pdf = events_pdf.copy()
    pdf["dow"] = pd.to_datetime(pdf["ts"]).dt.dayofweek  # 0=Mon
    ct = pd.crosstab(pdf["event_type"], pdf["dow"]).to_numpy().astype(float)
    expected = ct.sum(1)[:, None] * ct.sum(0)[None, :] / ct.sum()
    want_stat = ((ct - expected) ** 2 / expected).sum()
    assert got_stat == pytest.approx(want_stat, rel=1e-12)
    assert len(rows) == ct.size


def test_deciles_match_numpy(spark, sf_dir):
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_returnflag AS grp, l_extendedprice AS p"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    got: dict[tuple, int] = {
        (r.grp, r.decile): r.value_cents
        for r in QUERIES["quantile_deciles_price"](spark, sf_dir).collect()
    }
    for grp, g in li.groupby("grp"):
        cents = np.sort(np.round(g["p"].to_numpy() * 100).astype(np.int64))
        n = len(cents)
        for d in range(1, 10):
            assert got[(grp, d)] == cents[(d * (n - 1)) // 10], (grp, d)


def test_interarrival_median_matches_numpy(spark, sf_dir, events_pdf):
    got = {
        r.user_id: (r.n_gaps, r.median_gap_us)
        for r in QUERIES["events_interarrival_median"](spark, sf_dir).collect()
    }
    for uid, g in events_pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        dt = np.sort(np.diff(ts))
        if not len(dt):
            assert uid not in got
            continue
        n, med = got[uid]
        assert n == len(dt)
        assert med == dt[(len(dt) - 1) // 2], uid


def test_dau_wau_bounds(spark, sf_dir):
    rows = QUERIES["events_dau_wau_ratio"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0
