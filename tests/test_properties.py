"""Property-based checks (hypothesis): operators vs naive Python
oracles on randomized small inputs — the cheap way to hit edge shapes
(empty groups, all-ties, single rows, unicode) no hand-written case
covers. Example counts are small: each example runs Spark jobs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.asof import asof_join
from data_ingestion_tool_spark.operators.skew import salted_agg
from data_ingestion_tool_spark.operators.text import fingerprint

SETTINGS = dict(max_examples=10, deadline=None)

keys = st.integers(min_value=0, max_value=3)
tss = st.integers(min_value=0, max_value=86_400)


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(keys, tss), min_size=0, max_size=12),
    right=st.lists(st.tuples(keys, tss, st.floats(0, 100)), max_size=12),
)
def test_asof_join_matches_naive(spark, left, right):
    """asof payload == max-ts right row with ts <= left ts, per key."""
    lf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(99, 0, -1)],
        "k long, t long, row_id long",
    )
    rf = spark.createDataFrame(
        [(k, t, v) for k, t, v in right] or [(98, 0, 0.0)],
        "k long, t long, v double",
    )
    out = asof_join(
        lf, rf, on="k", left_ts="t", right_ts="t", payload={"v": "asof_v"}
    )
    got = {r.row_id: r.asof_v for r in out.collect() if r.row_id >= 0}

    def naive(k, t):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        if not cands:
            return None
        best_t = max(rt for rt, _ in cands)
        # ties on ts: operator pins greatest payload deterministically
        return max(v for rt, v in cands if rt == best_t)

    want = {i: naive(k, t) for i, (k, t) in enumerate(left)}
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(keys, st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
def test_salted_agg_equals_naive(spark, rows, n_salts):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v double"
    )
    got = {
        r.k: (r.cnt, r.mx)
        for r in salted_agg(
            df, ["k"], {"cnt": ("v", "count"), "mx": ("v", "max")},
            salt_from="id", n_salts=n_salts,
        ).collect()
    }
    want = {}
    for k, v in rows:
        c, m = want.get(k, (0, float("-inf")))
        want[k] = (c + 1, max(m, v))
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fingerprint_dedup_idempotent_and_consistent(spark, texts):
    """dedup(dedup(x)) == dedup(x); fingerprint equality == equality of
    normalized text (md5 collision-free at these sizes)."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    d1 = df.withColumn("fp", fingerprint("text")).dropDuplicates(["fp"])
    d2 = d1.dropDuplicates(["fp"])
    assert sorted(r.fp for r in d1.collect()) == sorted(r.fp for r in d2.collect())
    # SQL trim removes spaces only (unlike Python str.strip) — the
    # operator matches DuckDB's trim, so the oracle must too
    want = len({t.lower().strip(" ") for t in texts})
    assert d1.count() == want


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\r\n\x00"
            ),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_csv_compat_roundtrip_preserves_strings(spark, tmp_path_factory, vals):
    """Arbitrary unicode (incl. delimiters and quotes in values)
    survives write→compat-read byte-identically on the splittable
    (multiline=False) scan path. NUL excluded: uniVocity strips it
    inside quoted fields (pinned in test_csv_nul_in_quoted_field)."""
    from data_ingestion_tool_spark.sources.csv_io import read_csv_compat, write_csv

    out = str(tmp_path_factory.mktemp("csvprop"))
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    write_csv(df, out)
    back = read_csv_compat(spark, out)
    got = {int(r.i): r.s for r in back.collect()}
    assert got == {i: v for i, v in enumerate(vals)}


def test_csv_compat_multiline_newlines(spark, tmp_path):
    """Quoted embedded newlines need the opt-in multiline mode (which
    trades file splittability — documented in read_csv_compat)."""
    from data_ingestion_tool_spark.sources.csv_io import read_csv_compat, write_csv

    out = str(tmp_path / "ml")
    df = spark.createDataFrame(
        [(1, "line1\nline2"), (2, 'quote " and\nnewline')], "i long, s string"
    )
    write_csv(df, out)
    got = {int(r.i): r.s for r in read_csv_compat(spark, out, multiline=True).collect()}
    assert got == {1: "line1\nline2", 2: 'quote " and\nnewline'}


def test_csv_nul_in_quoted_field(spark, tmp_path):
    """Pin the documented limitation: uniVocity strips NUL inside
    QUOTED fields ('\\0' is its internal no-char sentinel); unquoted
    NULs survive. NUL-bearing data belongs in parquet/JSON."""
    from data_ingestion_tool_spark.sources.csv_io import read_csv_compat, write_csv

    out = str(tmp_path / "nul")
    df = spark.createDataFrame(
        [(0, '"\x00'), (1, "a\x00b")], "i long, s string"
    )
    write_csv(df, out)
    got = {int(r.i): r.s for r in read_csv_compat(spark, out).collect()}
    assert got[1] == "a\x00b"  # unquoted: lossless
    assert got[0] == '"'  # quoted: NUL stripped by the parser


def test_fsum_matches_dsum_on_exact_decimal_data(spark, sf_dir):
    """The fixed-point fast path must produce the IDENTICAL double as
    the decimal-exact path wherever its preconditions hold (exactly
    s-decimal values, group sum·10^s < 2^53) — it's a drop-in
    replacement, not an approximation."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.queries.registry import dsum, fsum
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    l = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    row = (
        l.groupBy("l_returnflag")
        .agg(
            dsum("l_extendedprice").alias("d2"),
            fsum("l_extendedprice").alias("f2"),
            dsum(disc_price, 4).alias("d4"),
            fsum(disc_price, 4).alias("f4"),
        )
        .collect()
    )
    for r in row:
        assert r.d2 == r.f2, (r.d2, r.f2)
        assert r.d4 == r.f4, (r.d4, r.f4)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                whitelist_characters="@.-_+%!?",
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_pii_scrub_idempotent_and_clean(spark, texts):
    """After scrubbing, a second scrub finds nothing (idempotence:
    no email/phone pattern survives, and the replacement tokens never
    re-trigger the patterns)."""
    from data_ingestion_tool_spark.operators.text import pii_scrub

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    once = pii_scrub(df, "s").select(
        F.col("scrubbed").alias("s"), F.col("n_redactions").alias("n1")
    )
    twice = pii_scrub(once, "s")
    rows = twice.collect()
    assert all(r.n_redactions == 0 for r in rows)
    assert all(r.scrubbed == r.s for r in rows)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", max_size=40), min_size=1, max_size=8
    )
)
def test_repetition_and_contamination_bounds(spark, texts):
    """repetition_ratio ∈ [0,1); contamination ∈ [0,1], and a corpus
    checked against ITSELF is 100% contaminated for every doc that has
    any grams."""
    from data_ingestion_tool_spark.operators.text import (
        contamination_scores,
        repetition_ratio,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    reps = [r.r for r in df.select(repetition_ratio("text").alias("r")).collect()]
    assert all(0.0 <= r < 1.0 for r in reps)
    scored = contamination_scores(df, df).collect()
    assert all(r.contamination == 1.0 and r.n_hits == r.n_grams for r in scored)


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(keys, tss), min_size=0, max_size=12),
    right=st.lists(st.tuples(keys, tss, st.floats(0, 100)), max_size=12),
)
def test_asof_join_forward_matches_naive(spark, left, right):
    """forward asof payload == min-ts right row with ts >= left ts,
    per key (ties on ts: greatest payload, same pin as backward)."""
    lf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(99, 0, -1)],
        "k long, t long, row_id long",
    )
    rf = spark.createDataFrame(
        [(k, t, v) for k, t, v in right] or [(98, 0, 0.0)],
        "k long, t long, v double",
    )
    out = asof_join(
        lf, rf, on="k", left_ts="t", right_ts="t",
        payload={"v": "asof_v"}, direction="forward",
    )
    got = {r.row_id: r.asof_v for r in out.collect() if r.row_id >= 0}

    def naive(k, t):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt >= t]
        if not cands:
            return None
        best_t = min(rt for rt, _ in cands)
        return max(v for rt, v in cands if rt == best_t)

    want = {i: naive(k, t) for i, (k, t) in enumerate(left)}
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.text(min_size=0, max_size=6), st.booleans()),
        min_size=1,
        max_size=40,
    ),
    denom=st.integers(min_value=2, max_value=10),
)
def test_frequent_items_matches_naive(spark, rows, denom):
    """frequent_items == brute-force threshold count on random data
    (random strings, random partitioning, random 1/denom threshold)."""
    from data_ingestion_tool_spark.operators.frequency import frequent_items

    df = spark.createDataFrame(
        [(s if keep else None,) for s, keep in rows], "k string"
    ).repartition(4)
    got = {
        (r.item, r.cnt)
        for r in frequent_items(df, "k", 1.0 / denom).collect()
    }
    counts: dict[str, int] = {}
    for s, keep in rows:
        if keep:
            counts[s] = counts.get(s, 0) + 1
    total = sum(counts.values())
    want = {
        (s, c) for s, c in counts.items() if c * denom >= total
    }
    assert got == want


@settings(**SETTINGS)
@given(
    ivs=st.lists(
        st.tuples(tss, st.integers(min_value=0, max_value=7200)),
        min_size=0, max_size=15,
    ),
    pts=st.lists(tss, min_size=0, max_size=25),
    width=st.sampled_from([60, 600, 3600]),
)
def test_bucketed_interval_join_matches_naive(spark, ivs, pts, width):
    """Bucketed interval join == naive O(n*m) containment scan for any
    bucket width, including intervals spanning many buckets and ends
    exactly on bucket boundaries."""
    from data_ingestion_tool_spark.operators.intervals import (
        bucketed_interval_join,
    )

    iv = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(ivs)] or [(-1, 0, 0)],
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("w_start"),
        F.timestamp_seconds("e").alias("w_end"),
    )
    pt = spark.createDataFrame(
        [(t,) for t in pts] or [(-10,)], "t long"
    ).select(F.timestamp_seconds("t").alias("p_ts"))
    out = bucketed_interval_join(
        iv, pt, start="w_start", end="w_end", point_ts="p_ts",
        bucket_width_s=width, how="left",
    )
    got = sorted(
        (r.iid, int(r.p_ts.timestamp()) if r.p_ts is not None else None)
        for r in out.collect()
        if r.iid >= 0
    )
    want = []
    for i, (s, d) in enumerate(ivs):
        hits = [t for t in pts if s <= t <= s + d]
        want.extend((i, t) for t in hits) if hits else want.append((i, None))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Round-5 ranking rewrites: literal-offset / literal-map paths vs the
# naive single-task Window reference on randomized frames
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=0,
        max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=6),
)
def test_grouped_row_number_matches_window(spark, rows, parts):
    """with_grouped_global_row_number (JVM literal-map path) must equal
    Window.partitionBy(grp).row_number for every random frame and any
    partition count — including single-row groups, all-one-group, and
    empty input. The id column makes the order total (the operator's
    contract)."""
    from pyspark.sql import Window

    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_row_number,
    )

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp string, v long, id long") if data else (
        spark.createDataFrame([], "grp string, v long, id long")
    )
    got = {
        (r.grp, r.id): (r.rn, r.n)
        for r in with_grouped_global_row_number(
            df, ["grp"], ["v", "id"], rn="rn", n_col="n", num_partitions=parts
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("v", "id")
    ref = {
        (r.grp, r.id): (r.rn, r.n)
        for r in df.select(
            "grp",
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("grp"))
            .cast("bigint")
            .alias("n"),
        ).collect()
    }
    assert got == ref


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=40
    ),
    parts=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=1, max_value=7),
)
def test_prefix_sum_and_ntile_match_window(spark, vals, parts, k):
    """with_global_prefix_sum + with_global_ntile (literal-offset path)
    must equal the naive global Window forms for any values (negatives,
    duplicates), any partition count, and any k."""
    from pyspark.sql import Window

    from data_ingestion_tool_spark.operators.ranking import (
        with_global_ntile,
        with_global_prefix_sum,
    )

    data = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "v long, id long") if data else (
        spark.createDataFrame([], "v long, id long")
    )
    got = {
        r.id: (r.rn, r.cum, r.n, r.tot)
        for r in with_global_prefix_sum(
            df,
            ["v", "id"],
            "v",
            rn="rn",
            cum="cum",
            n_col="n",
            total_col="tot",
            num_partitions=parts,
        ).collect()
    }
    w = Window.orderBy("v", "id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy()
    ref = {
        r.id: (r.rn, r.cum, r.n, r.tot)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.sum("v").over(run).cast("bigint").alias("cum"),
            F.count(F.lit(1)).over(full).cast("bigint").alias("n"),
            F.sum("v").over(full).cast("bigint").alias("tot"),
        ).collect()
    }
    assert got == ref

    got_nt = {
        r.id: r.b
        for r in with_global_ntile(
            df, ["v", "id"], k, "b", num_partitions=parts
        ).collect()
    }
    ref_nt = {
        r.id: r.b
        for r in df.select(
            "id", F.ntile(k).over(w).cast("bigint").alias("b")
        ).collect()
    }
    assert got_nt == ref_nt


# --- round-8 kernels: BMP synth/decode, NN resize, md5 quantization ------


@settings(max_examples=50, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
    width=st.integers(min_value=1, max_value=48),
)
def test_bmp_gray24_roundtrip_property(data, width):
    """forall bytes/width: encode→decode returns the modulo-wrapped
    gray array with the declared dims (row padding, bottom-up storage,
    and the empty-input fallback all exercised by the generator)."""
    import numpy as np

    from data_ingestion_tool_spark.operators.multimodal import (
        bmp_encode_gray24,
        bmp_pixels,
    )

    px = bmp_pixels(bmp_encode_gray24(data, width=width))
    src = data if data else b"\x00"
    h = -(-len(src) // width)
    idx = np.arange(h * width) % len(src)
    want = np.frombuffer(src, dtype=np.uint8)[idx].reshape(h, width)
    assert px.shape == (h, width, 3)
    assert (px[:, :, 0] == want).all()
    assert (px == px[:, :, :1]).all()  # gray replicated across BGR


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    oh=st.integers(min_value=1, max_value=24),
    ow=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_nn_resize_property(h, w, oh, ow, seed):
    """forall shapes (up- AND down-scaling): nn_resize == the pure
    double-loop index rule out(y,x) = in(y*h//oh, x*w//ow)."""
    import numpy as np

    from data_ingestion_tool_spark.operators.multimodal import nn_resize

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = nn_resize(px, oh, ow)
    assert got.shape == (oh, ow, 3)
    for y in range(oh):
        for x in range(ow):
            assert (got[y, x] == px[y * h // oh, x * w // ow]).all()


@settings(max_examples=20, deadline=None)
@given(
    s=st.text(
        alphabet=st.characters(codec="utf-8"), min_size=0, max_size=40
    )
)
def test_md5_prefix60_python_vs_duckdb_property(s):
    """forall unicode strings: the md5-prefix int60 identity the
    dedup_simhash and int-SRP oracles rest on holds byte-for-byte
    (DuckDB md5() hashes the varchar's UTF-8, same bytes Python sees)."""
    import hashlib

    import duckdb

    want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = duckdb.connect().execute(
        "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [s]
    ).fetchone()[0]
    assert got == want


_dates = st.integers(min_value=0, max_value=30)  # day offsets


@settings(max_examples=6, deadline=None)
@given(
    zmaps=st.lists(
        st.one_of(st.none(), st.tuples(_dates, _dates)), min_size=1, max_size=4
    ),
    lo=_dates,
    hi=_dates,
)
def test_zone_map_prune_matches_naive_overlap(spark, tmp_path_factory, zmaps, lo, hi):
    """zone_map_prune keeps exactly the live batches whose [zmin,zmax]
    overlaps [lo,hi] (inclusive, string order), plus every unmapped
    batch (conservative)."""
    from data_ingestion_tool_spark.sources.txnlog import TxnLogTable

    root = tmp_path_factory.mktemp("zm")
    t = TxnLogTable(spark, str(root / "t"))
    metas = []
    for zm in zmaps:
        if zm is None:
            t.commit(spark.range(1))
            metas.append(None)
        else:
            a, b = min(zm), max(zm)
            t.commit(
                spark.range(1),
                meta={"zmin": f"day-{a:02d}", "zmax": f"day-{b:02d}"},
            )
            metas.append((a, b))
    qlo, qhi = min(lo, hi), max(lo, hi)
    keep, total = t.zone_map_prune(f"day-{qlo:02d}", f"day-{qhi:02d}")
    assert total == len(metas)
    want = sum(
        1
        for m in metas
        if m is None or (m[0] <= qhi and m[1] >= qlo)
    )
    assert len(keep) == want


@settings(max_examples=6, deadline=None)
@given(
    v0_keys=st.sets(st.integers(0, 9), min_size=1, max_size=6),
    v1_keys=st.sets(st.integers(0, 9), min_size=1, max_size=6),
    bump=st.sets(st.integers(0, 9), max_size=4),
)
def test_changefeed_matches_naive_snapshot_diff(
    spark, tmp_path_factory, v0_keys, v1_keys, bump
):
    """changefeed(insert/delete/update classification) == the naive
    keyed diff of the two snapshots, for arbitrary replace commits.
    ``bump`` keys that survive get a changed payload (update); others
    keep v0's value (still an update pair here, since the whole batch
    is rewritten — batch-granularity semantics)."""
    from data_ingestion_tool_spark.sources.txnlog import TxnLogTable

    root = tmp_path_factory.mktemp("cf")
    t = TxnLogTable(spark, str(root / "t"))
    df0 = spark.createDataFrame(
        [(k, k * 10) for k in sorted(v0_keys)], "k long, val long"
    )
    _, b0 = t.commit(df0)
    df1 = spark.createDataFrame(
        [(k, k * 10 + (1 if k in bump else 0)) for k in sorted(v1_keys)],
        "k long, val long",
    )
    t.commit(df1, remove=[b0])
    feed = t.changefeed(0, 1, ["k"])
    got = sorted(
        (r["change_type"], r["k"], r["val"]) for r in feed.collect()
    )
    want = []
    for k in sorted(v0_keys - v1_keys):
        want.append(("delete", k, k * 10))
    for k in sorted(v1_keys - v0_keys):
        want.append(("insert", k, k * 10 + (1 if k in bump else 0)))
    for k in sorted(v0_keys & v1_keys):
        want.append(("update_preimage", k, k * 10))
        want.append(
            ("update_postimage", k, k * 10 + (1 if k in bump else 0))
        )
    assert got == sorted(want)
