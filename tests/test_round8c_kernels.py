"""Property tests for the round-8c analytical kernels: the closed-form
business-day counter, the Pareto-skyline window formulation, Holt
smoothing, RRF fusion, and the SNM equi-join band — edge cases the
differential oracles can't see (they'd agree even if both sides shared
a bug, so these pin each kernel against an independent reimplementation
in plain Python)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st


def weekday_count_closed_form(x: int) -> int:
    """W(x) = weekdays in [epoch, epoch+x) via the query's formula."""
    return ((x + 3) // 7) * 5 + min((x + 3) % 7, 5)


@given(st.integers(min_value=0, max_value=40000),
       st.integers(min_value=0, max_value=400))
@settings(max_examples=200, deadline=None)
def test_business_day_formula_matches_loop(a, span):
    b = a + span
    loop = sum(
        1
        for d in range(a, b)
        if (dt.date(1970, 1, 1) + dt.timedelta(days=d)).weekday() < 5
    )
    assert (
        weekday_count_closed_form(b) - weekday_count_closed_form(a) == loop
    )


def skyline_windows(points):
    """The query's two-window skyline formulation in plain Python."""
    out = []
    for i, (u, v) in enumerate(points):
        min_eq = min(v2 for (u2, v2) in points if u2 == u)
        higher = [v2 for (u2, v2) in points if u2 > u]
        min_higher = min(higher) if higher else None
        if v == min_eq and (min_higher is None or v < min_higher):
            out.append(i)
    return out


def skyline_pairwise(points):
    """O(n^2) dominance reference: maximize u, minimize v."""
    out = []
    for i, (u, v) in enumerate(points):
        dominated = any(
            (u2 >= u and v2 <= v) and (u2 > u or v2 < v)
            for j, (u2, v2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(i)
    return out


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_skyline_window_formulation_equals_pairwise(points):
    assert skyline_windows(points) == skyline_pairwise(points)


@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=120))
@settings(max_examples=100, deadline=None)
def test_holt_level_bounded_by_series_envelope(ys):
    """Holt level with alpha=beta=0.5 stays within a loose envelope of
    the running min/max (sanity: the recursion can overshoot by at most
    the accumulated trend, which is bounded by the range)."""
    level = trend = 0.0
    lo, hi = min(ys), max(ys)
    rng = float(hi - lo)
    for i, yc in enumerate(ys):
        y = float(yc)
        if i == 0:
            level, trend = y, 0.0
        else:
            new_level = 0.5 * y + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
        assert lo - 3 * rng - 1e-6 <= level <= hi + 3 * rng + 1e-6
        assert abs(trend) <= 2 * rng + 1e-6


def test_rrf_rank_fusion_prefers_consensus():
    """A candidate ranked 2nd by both scorers must out-fuse one ranked
    1st by one scorer but far down the other (k=60 damping)."""
    consensus = 1.0 / 62 + 1.0 / 62
    lopsided = 1.0 / 61 + 1.0 / (60 + 40)
    assert consensus > lopsided


@given(st.lists(st.integers(0, 3), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_snm_band_equijoin_equals_band_filter(rns_raw):
    """(blk, rn+delta) equi-join emits exactly the pairs the rank-band
    predicate 1 <= b.rn - a.rn <= 3 selects, per block."""
    blocks = {}
    for i, b in enumerate(rns_raw):
        blocks.setdefault(b, []).append(i)
    band, equi = set(), set()
    for b, members in blocks.items():
        ranked = {doc: rn + 1 for rn, doc in enumerate(members)}
        for x in members:
            for y in members:
                if 1 <= ranked[y] - ranked[x] <= 3:
                    band.add((x, y))
        for x in members:
            for delta in (1, 2, 3):
                target = ranked[x] + delta
                for y in members:
                    if ranked[y] == target:
                        equi.add((x, y))
    assert band == equi
