"""Accuracy / property tests for the sketch family.

The differential gate replays the SAME construction in DuckDB, so a
shared construction bug (a dyadic cover that misses part of the range,
an HLL rho off-by-one) would pass it. These tests pin the sketches
against INDEPENDENT ground truth: pure-Python property checks for the
dyadic cover, and estimate-vs-exact accuracy bands for the estimators
(deterministic — md5-seeded — so the bands are tight documentation,
not flaky tolerances).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_tool_spark.queries.sketches import (
    _DY_COVER,
    _DY_HI,
    _DY_LO,
    _dyadic_cover,
)
from data_ingestion_tool_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- dyadic

def _expand(cover):
    vals = []
    for l, a in cover:
        vals.extend(range(a << l, (a + 1) << l))
    return vals


def test_dyadic_cover_fixed_tiles_range():
    vals = _expand(_DY_COVER)
    assert vals == list(range(_DY_LO, _DY_HI))
    # canonical cover is within 2*log2(hi-lo) nodes
    assert len(_DY_COVER) <= 2 * math.ceil(math.log2(_DY_HI - _DY_LO))


@given(
    lo=st.integers(min_value=0, max_value=(1 << 20) - 2),
    span=st.integers(min_value=1, max_value=1 << 14),
)
@settings(max_examples=200, deadline=None)
def test_dyadic_cover_properties(lo, span):
    hi = min(lo + span, 1 << 20)
    cover = _dyadic_cover(lo, hi)
    # exact disjoint tiling of [lo, hi)
    assert _expand(cover) == list(range(lo, hi))
    # every node is aligned: the range [a*2^l, (a+1)*2^l) is dyadic by
    # construction; check the node count bound for the canonical cover
    assert len(cover) <= 2 * (math.ceil(math.log2(hi - lo)) + 1)


# ------------------------------------------------------------ estimators
# sf0.001 ground truth: 150 custkeys, 116/121/146 yearly sets,
# 1473 orderkeys, 15 users / 1000 events. All sketches are md5-seeded
# and therefore deterministic — the bands document the realized error.

def test_hll_estimate_accuracy(spark):
    row = QUERIES["sketch_hll_register_estimate"](spark, SF).collect()[0]
    assert row.n_exact == 150
    # m=256 linear-counting regime: within 10%
    assert abs(row.hll_estimate - row.n_exact) <= 0.10 * row.n_exact


def test_kmv_estimates_accuracy(spark):
    row = QUERIES["sketch_kmv_theta_union"](spark, SF).collect()[0]
    for est, exact in [
        (row.kmv_a_est, row.n_a_exact),
        (row.kmv_b_est, row.n_b_exact),
        (row.kmv_union_est, row.n_union_exact),
    ]:
        # k=64 minima: realized error well inside 2/sqrt(k) ~ 25%
        assert abs(est - exact) <= 0.25 * exact
    # merged-sketch consistency: union estimate never exceeds the sum
    assert row.kmv_union_est <= row.kmv_a_est + row.kmv_b_est
    assert row.kmv_intersection_est == (
        row.kmv_a_est + row.kmv_b_est - row.kmv_union_est
    )


def test_linear_counting_accuracy(spark):
    row = QUERIES["sketch_linear_counting_orderkeys"](spark, SF).collect()[0]
    assert row.n_set_bits + row.n_empty_bits == 65536
    # m=65536 at load 0.02: sub-1% regime
    assert abs(row.lc_estimate - row.n_exact) <= 0.02 * row.n_exact


def test_ams_f2_band(spark):
    row = QUERIES["sketch_ams_f2_user_events"](spark, SF).collect()[0]
    # median-of-means over 4 groups of 4: loose constant-factor band
    # (single fixed md5 draw; 15-user lattice makes it wide)
    assert 0.2 <= row.ams_ratio <= 3.0
    assert row.ams_med2x > 0


def test_ams_join_size_band(spark):
    row = QUERIES["sketch_ams_join_size_estimate"](spark, SF).collect()[0]
    # inner-product estimator, same composition/band as the F2 sketch
    # (realized 1.96/0.91/0.52 across the three SFs)
    assert 0.2 <= row.ams_ratio <= 3.0
    assert row.join_size_exact > 0


def test_cms_range_one_sided_and_close(spark):
    row = QUERIES["sketch_cms_dyadic_range_count"](spark, SF).collect()[0]
    assert row.n_cover_nodes == len(_DY_COVER)
    # CMS never underestimates
    assert row.overestimate >= 0
    # 8 probes x d=2 rows x w=128 buckets over 12k hashed rows:
    # collisions add at most a few hundred here
    assert row.cms_range_estimate <= row.n_exact + 500


def test_stream_bitmap_distinct_matches_exact(spark):
    rows = QUERIES["stream_bitmap_distinct_per_type"](spark, SF).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.bitmap_matches_exact == 1
        assert r.n_users_bitmap == r.n_users_exact
