"""Multimodal-column queries (north-star).

The payload here is text bytes (no codecs in the container) but the
execution shape — binary column + mapInPandas metadata extraction — is
exactly the production image/audio path (see operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.multimodal import extract_binary_metadata, with_binary_payload
from ..sources.parquet_io import read_table
from .registry import query




@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload column → Arrow-batched mapInPandas metadata
    extraction (byte length + sha256, standing in for width/height/
    duration). Hash-checked against DuckDB's sha256 over the same
    bytes — the Pandas-UDF plumbing must produce bit-identical output."""
    d = read_table(spark, sf_dir, "documents")
    return extract_binary_metadata(with_binary_payload(d, "text"))


@query(
    "multimodal_decode_resize",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             greatest(CAST(strlen(text) AS BIGINT), 1) AS len,
             CAST(strlen(text) AS BIGINT) AS len0
      FROM documents
    ),
    dims AS (
      SELECT doc_id, hx, len, len0,
             (len + 31) // 32 AS h,
             least(1.0, 64.0 / CAST(greatest((len + 31) // 32, 32)
                                    AS DOUBLE)) AS s
      FROM b
    ),
    tgt AS (
      SELECT doc_id, hx, len, len0, h,
             greatest(CAST(floor(CAST(h AS DOUBLE) * s) AS BIGINT), 1)
               AS oh,
             greatest(CAST(floor(32.0 * s) AS BIGINT), 1) AS ow
      FROM dims
    ),
    px AS (
      SELECT doc_id,
             CASE WHEN len0 = 0 THEN 0
                  ELSE CAST('0x' || substr(hx,
                       2 * ((((j.j * h) // oh) * 32
                             + ((k.k * 32) // ow)) % len) + 1, 2) AS INT)
             END AS g
      FROM tgt,
           LATERAL unnest(generate_series(0, oh - 1)) AS j(j),
           LATERAL unnest(generate_series(0, ow - 1)) AS k(k)
    )
    SELECT t.doc_id, t.h AS height, CAST(32 AS BIGINT) AS width,
           t.oh AS out_height, t.ow AS out_width,
           ROUND(m.mg / 255.0, 9) AS resized_mean
    FROM tgt t
    JOIN (SELECT doc_id, CAST(SUM(g) AS DOUBLE) / COUNT(*) AS mg
          FROM px GROUP BY doc_id) m ON m.doc_id = t.doc_id
    """,
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode → resize with a FULL differential oracle (round-8):
    text bytes synthesize a deterministic 24-bpp BMP executor-side
    (with_bmp_payload), bmp_pixels does actual BI_RGB pixel decode
    (bottom-up rows, 4-byte padding), nn_resize does numpy
    nearest-neighbor to max_side=64 — no codec libs anywhere. The
    synthesized pixel (y, x) is byte[(y·32+x) mod len] in all three
    channels, so DuckDB replays decode AND resize via hex-slice byte
    access; the scale factor is replayed in the operator's own IEEE
    double math (floor(h · 64/maxside) — NOT integer division: 64/96
    rounds to 63.999…97, so h=96 resizes to 63 rows on both engines).
    resized_sha (raw-bytes digest) stays operator/unit-test-only —
    the one column SQL cannot replay. Pure-Python-reference accuracy
    tests in tests/test_multimodal.py cover the full pixel path."""
    from ..operators.multimodal import decode_resize_images, with_bmp_payload

    d = read_table(spark, sf_dir, "documents")
    out = decode_resize_images(with_bmp_payload(d, "text"), max_side=64)
    return out.select(
        "doc_id",
        "height",
        "width",
        "out_height",
        "out_width",
        F.round("resized_mean", 9).alias("resized_mean"),
    ).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id, text,
             1 + (CAST('0x' || substr(sha256(text), 9, 2) AS INT) % 8) AS n
      FROM documents
    ),
    frames AS (
      SELECT doc_id, sha256(text || '-' || i) AS sha
      FROM meta, LATERAL unnest(generate_series(0, n - 1, 2)) AS u(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sampled_frames,
           MIN(sha) AS first_sha
    FROM frames GROUP BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling, promoted to a FULL differential
    oracle (round-8): each payload fans out to its sampled frames
    inside the executor (mapInPandas emits more rows than it gets — no
    shuffle), then a per-document frame count. The stand-in decode is
    sha-derived (n_frames = 1 + digest[4] % 8; frame_sha =
    sha256(payload || '-' || idx)), so DuckDB replays the fan-out
    exactly: digest byte 4 is hex chars 9-10, the ASCII '-idx' suffix
    is the same bytes as the varchar concat."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(d, "text"), every_n=2)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled_frames"),
        F.min("frame_sha").alias("first_sha"),
    )


@query(
    "multimodal_audio_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(strlen(text) AS BIGINT) AS len
      FROM documents
    ),
    x AS (
      SELECT doc_id, len, i,
             CASE WHEN ub >= 128 THEN ub - 256 ELSE ub END AS v
      FROM (
        SELECT doc_id, len, i,
               CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT) AS ub
        FROM b, LATERAL unnest(generate_series(0, len - 1)) AS u(i)
        WHERE len > 0)
    ),
    pairs AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN (a.v < 0) <> (a.nv < 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM (
        SELECT doc_id, i, v,
               LEAD(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv
        FROM x) a
      WHERE nv IS NOT NULL AND (i % 256) <> 255
      GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST((s.len + 255) // 256 AS BIGINT) AS n_windows,
           ROUND(sqrt(CAST(s.sq AS DOUBLE) / CAST(s.len AS DOUBLE)), 9)
             AS rms_all,
           CASE WHEN COALESCE(p.n_pairs, 0) > 0
                THEN ROUND(CAST(p.n_crossings AS DOUBLE)
                           / CAST(p.n_pairs AS DOUBLE), 9)
                ELSE 0.0 END AS zcr_all
    FROM (SELECT doc_id, MAX(len) AS len, CAST(SUM(v * v) AS BIGINT) AS sq
          FROM x GROUP BY doc_id) s
    LEFT JOIN pairs p ON p.doc_id = s.doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style feature extraction over binary payloads treated as
    int8 PCM (the bytes ARE the samples — no codec), promoted to a FULL
    differential oracle (round-8): the windowed mapInPandas fan-out now
    emits exact integer partials (sq_sum, crossings, pairs — window-
    LOCAL pairs, so boundary pairs between windows are excluded on both
    engines), and the doc profile aggregates those ints, making every
    output an identical-integer expression both engines compute
    bit-equal (round 9 = composed-float hygiene). DuckDB gets at the
    payload bytes via hex(encode(text)) two-char slices. Per-window
    rounded rms/zcr stay unit-tested vs a pure-Python reference."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import audio_window_features

    d = read_table(spark, sf_dir, "documents")
    feats = audio_window_features(with_binary_payload(d, "text"))
    sum_n = F.sum("n_samples").cast("bigint")
    sum_sq = F.sum("sq_sum").cast("bigint")
    sum_cr = F.sum("n_crossings").cast("bigint")
    sum_pr = F.sum("n_pairs").cast("bigint")
    return feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.round(
            F.sqrt(sum_sq.cast("double") / sum_n.cast("double")), 9
        ).alias("rms_all"),
        F.when(
            sum_pr > 0,
            F.round(sum_cr.cast("double") / sum_pr.cast("double"), 9),
        )
        .otherwise(F.lit(0.0))
        .alias("zcr_all"),
    )


@query(
    "multimodal_dedup_binary",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, sha256(text) AS payload_hash,
             CAST(strlen(text) AS BIGINT) AS byte_len
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, payload_hash, byte_len,
             row_number() OVER (
               PARTITION BY payload_hash ORDER BY doc_id
             ) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY payload_hash) AS BIGINT)
               AS n_copies
      FROM h
    )
    SELECT doc_id, source, byte_len, n_copies
    FROM ranked WHERE rn = 1
    """,
)
def multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of BINARY payloads by content digest — the first
    pass of any image/audio corpus dedup (byte-identical copies from
    re-crawls/mirrors), keeping the lowest doc_id per digest with the
    copy count. The digest is computed executor-side over the binary
    column (mapInPandas plumbing shared with multimodal_binary_meta);
    only (digest, id) pairs ever shuffle — payload bytes stay put, the
    property that makes this affordable on a 100 TB media lake.
    """
    from pyspark.sql import functions as F

    d = read_table(spark, sf_dir, "documents")
    h = extract_binary_metadata(with_binary_payload(d, "text")).select(
        "doc_id", F.col("sha256_hex").alias("payload_hash"), "byte_len"
    )
    src = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = h.join(src, "doc_id")
    w = Window.partitionBy("payload_hash").orderBy("doc_id")
    ranked = h.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_copies",
        F.count(F.lit(1)).over(Window.partitionBy("payload_hash")).cast("bigint"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id", "source", "byte_len", "n_copies"
    )


N_WAV_DOCS = 200


@query(
    "multimodal_wav_roundtrip_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars % 500 + 100 AS n
      FROM documents WHERE doc_id < {N_WAV_DOCS}
    ),
    fan AS (
      SELECT doc_id, n,
             unnest(generate_series(0, n - 1)) AS i
      FROM d
    ),
    s AS (
      SELECT doc_id, MAX(n) AS n,
             CAST(SUM(((i * 7 + doc_id) % 256 - 128)
                      * ((i * 7 + doc_id) % 256 - 128)) AS BIGINT) AS sum_sq
      FROM fan GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(16 - 8 AS INT) AS bits_per_sample,
           CAST(n AS BIGINT) AS n_samples,
           sum_sq,
           CAST(n AS DOUBLE) / 8000 AS duration_s,
           sqrt(CAST(sum_sq AS DOUBLE) / (n * 16384.0)) AS rms
    FROM s
    """,
)
def multimodal_wav_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, differentially verified: each doc synthesizes
    a deterministic 8-bit PCM mono RIFF/WAVE payload (sawtooth samples
    (i·7 + doc_id) mod 256, length from n_chars) inside the Arrow
    batch, decodes it with the pure-Python chunk-walking
    ``wav_decode`` (operators/multimodal.py), and emits sample stats —
    while the ORACLE computes the same stats in closed form from the
    generation rule, never seeing a byte. A header-walk bug, a signed/
    unsigned PCM mix-up, or an off-by-one in the data chunk all shift
    sum_sq/n_samples and break the hash. The worker also re-derives
    the decoder's float rms from the integer sum of squares and raises
    if they disagree beyond 1e-9 — so the decode path is asserted, not
    assumed. Hash-carried floats (duration, rms) are identical
    integer-ratio expressions on both engines.

    Scale shape: pure mapInPandas over the documents scan — payloads
    are created, decoded, and reduced to fixed-width stats inside the
    executor; nothing binary ever shuffles.
    """
    import math
    import struct

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import wav_decode

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_WAV_DOCS
    ).select("doc_id", "n_chars")

    def wav_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n = int(n_chars) % 500 + 100
                k = (np.arange(n, dtype=np.int64) * 7 + int(doc_id)) % 256
                data = k.astype(np.uint8).tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                meta = wav_decode(hdr + data)
                sum_sq = int(((k.astype(np.int64) - 128) ** 2).sum())
                rms_check = math.sqrt(sum_sq / (meta["n_samples"] * 16384.0))
                if abs(meta["rms"] - rms_check) > 1e-9:
                    raise AssertionError(
                        f"wav_decode rms {meta['rms']} != closed-form {rms_check}"
                    )
                rows.append(
                    (
                        int(doc_id),
                        meta["sample_rate"],
                        meta["bits_per_sample"],
                        meta["n_samples"],
                        sum_sq,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "bits_per_sample",
                    "n_samples",
                    "sum_sq",
                ],
            )

    decoded = d.mapInPandas(
        wav_batches,
        "doc_id long, sample_rate int, bits_per_sample int,"
        " n_samples long, sum_sq long",
    )
    return decoded.select(
        "doc_id",
        "sample_rate",
        "bits_per_sample",
        "n_samples",
        "sum_sq",
        (F.col("n_samples").cast("double") / 8000).alias("duration_s"),
        F.sqrt(
            F.col("sum_sq").cast("double") / (F.col("n_samples") * 16384.0)
        ).alias("rms"),
    )


N_BMP_DOCS = 200


@query(
    "multimodal_bmp_roundtrip_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars % 30 + 5 AS w, doc_id % 20 + 4 AS h
      FROM documents WHERE doc_id < {N_BMP_DOCS}
    ),
    fy AS (
      SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y FROM d
    ),
    fj AS (
      SELECT doc_id, w, h, y,
             unnest(generate_series(0, 3 * w - 1)) AS j
      FROM fy
    ),
    s AS (
      SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
             CAST(SUM((j + y * 7 + doc_id) % 256) AS BIGINT) AS sum_px
      FROM fj GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels, sum_px,
           CAST(sum_px AS DOUBLE) / (w * h * 3 * 255) AS mean_pixel
    FROM s
    """,
)
def multimodal_bmp_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, differentially verified (the BMP sibling of
    multimodal_wav_roundtrip_stats): each doc synthesizes a 24-bpp
    BI_RGB BMP — pixel byte (j + 7y + doc_id) mod 256, dimensions from
    (n_chars, doc_id), rows PADDED to 4-byte boundaries as the format
    demands — decodes it with the pure-Python ``bmp_decode``, and emits
    integer pixel sums the oracle reproduces in closed form. The row
    padding is the sharp edge: a decoder that reads the stride wrong
    pulls padding bytes into the mean and the hash breaks. The worker
    asserts the decoder's float mean against the integer sum (1e-9) so
    the pixel math is checked, not assumed.

    Scale shape: identical to the WAV twin — synthesize/decode/reduce
    inside mapInPandas, fixed-width stats out, no binary shuffle.
    """
    import struct

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import bmp_decode

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_BMP_DOCS
    ).select("doc_id", "n_chars")

    def bmp_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                w = int(n_chars) % 30 + 5
                h = doc_id % 20 + 4
                stride = (w * 3 + 3) & ~3
                img = np.zeros((h, stride), dtype=np.uint8)
                j = np.arange(3 * w, dtype=np.int64)
                for y in range(h):
                    img[y, : 3 * w] = (j + y * 7 + doc_id) % 256
                    img[y, 3 * w :] = 0xAB  # padding: must NOT leak into stats
                data = img.tobytes()
                hdr = (
                    b"BM"
                    + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                    + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                  len(data), 2835, 2835, 0, 0)
                )
                meta = bmp_decode(hdr + data)
                sum_px = int(img[:, : 3 * w].astype(np.int64).sum())
                mean_check = sum_px / (w * h * 3 * 255)
                if abs(meta["mean_pixel"] - mean_check) > 1e-9:
                    raise AssertionError(
                        f"bmp_decode mean {meta['mean_pixel']} != {mean_check}"
                    )
                if (meta["width"], meta["height"]) != (w, h):
                    raise AssertionError("bmp_decode dimension mismatch")
                rows.append((doc_id, meta["width"], meta["height"],
                             meta["channels"], sum_px))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "sum_px"]
            )

    decoded = d.mapInPandas(
        bmp_batches,
        "doc_id long, width int, height int, channels int, sum_px long",
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "channels",
        "sum_px",
        (
            F.col("sum_px").cast("double")
            / (F.col("width") * F.col("height") * 3 * 255)
        ).alias("mean_pixel"),
    )


@query(
    "multimodal_image_ahash_dedup",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             greatest(CAST(strlen(text) AS BIGINT), 1) AS len,
             CAST(strlen(text) AS BIGINT) AS len0
      FROM documents
    ),
    dims AS (SELECT doc_id, hx, len, len0, (len + 31) // 32 AS h FROM b),
    samp AS (
      SELECT doc_id, j.j AS j, k.k AS k,
             CASE WHEN len0 = 0 THEN 0
                  ELSE CAST('0x' || substr(hx,
                       2 * ((((j.j * h) // 8) * 32 + 4 * k.k) % len) + 1, 2)
                       AS INT) END AS s
      FROM dims,
           LATERAL unnest(generate_series(0, 7)) AS j(j),
           LATERAL unnest(generate_series(0, 7)) AS k(k)
    ),
    tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS total
            FROM samp GROUP BY doc_id),
    bits AS (
      SELECT samp.doc_id, j, k,
             CASE WHEN s * 64 > total THEN 1 ELSE 0 END AS bit
      FROM samp JOIN tot ON tot.doc_id = samp.doc_id
    ),
    bands AS (
      SELECT doc_id, j // 2 AS band,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << ((j % 2) * 8 + k)))
                  AS BIGINT) AS v
      FROM bits GROUP BY doc_id, j // 2
    ),
    wide AS (
      SELECT doc_id,
             MAX(CASE WHEN band = 0 THEN v END) AS b0,
             MAX(CASE WHEN band = 1 THEN v END) AS b1,
             MAX(CASE WHEN band = 2 THEN v END) AS b2,
             MAX(CASE WHEN band = 3 THEN v END) AS b3
      FROM bands GROUP BY doc_id
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
               AS INT) AS hamming
      FROM wide a JOIN wide b
        ON a.doc_id < b.doc_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    )
    SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 6
    """,
)
def multimodal_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup END-TO-END with a FULL differential
    oracle: real BMP pixel decode → 8×8 downsample → 64-bit average
    hash packed as four 16-bit bands (operators/multimodal.py
    image_ahash_bands) → band-equality LSH self-joins for candidates
    (Hamming ≤ 6 ⟹ ≥1 equal band by pigeonhole, so recall is exact by
    construction) → exact bit_count Hamming verify. Every stage is
    integer math over the synthesized payload's bytes, so DuckDB
    replays decode, resample, threshold, banding, blocking AND the
    verify — the multimodal sibling of dedup_simhash's chunk-pair
    scheme.

    Scale shape: hashing is one Arrow-batched mapInPandas pass (no
    shuffle); the four band self-joins shuffle 5-column hash rows, not
    images, and the pinned band frame computes once. Candidates are
    bucket-bounded — never all-pairs."""
    from ..operators.multimodal import image_ahash_bands, with_bmp_payload
    from ..plans.pin import pin

    d = read_table(spark, sf_dir, "documents")
    bands = image_ahash_bands(with_bmp_payload(d, "text")).transform(
        pin, eager=False
    )
    cols = ("b0", "b1", "b2", "b3")
    a, b = bands.alias("a"), bands.alias("b")
    cands = None
    for c in cols:
        j = a.join(
            b,
            (F.col(f"a.{c}") == F.col(f"b.{c}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.{x}").alias(f"a{x}") for x in cols],
            *[F.col(f"b.{x}").alias(f"b{x}") for x in cols],
        )
        cands = j if cands is None else cands.unionByName(j)
    cands = cands.dropDuplicates(["doc_a", "doc_b"])
    hamming = F.expr(
        "CAST(bit_count(ab0 ^ bb0) + bit_count(ab1 ^ bb1)"
        " + bit_count(ab2 ^ bb2) + bit_count(ab3 ^ bb3) AS INT)"
    )
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "multimodal_image_tile_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars % 30 + 5 AS w, doc_id % 20 + 4 AS h
      FROM documents WHERE doc_id < {N_BMP_DOCS}
    ),
    fy AS (
      SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y FROM d
    ),
    fj AS (
      SELECT doc_id, w, h, y,
             unnest(generate_series(0, 3 * w - 1)) AS j
      FROM fy
    ),
    px AS (
      SELECT doc_id,
             CASE WHEN y >= h - (h // 2) THEN 0 ELSE 1 END AS tile_row,
             CASE WHEN (j // 3) < (w // 2) THEN 0 ELSE 1 END AS tile_col,
             (j + y * 7 + doc_id) % 256 AS b
      FROM fj
    )
    SELECT doc_id, CAST(tile_row AS INT) AS tile_row,
           CAST(tile_col AS INT) AS tile_col,
           CAST(COUNT(*) AS BIGINT) AS n_bytes,
           CAST(SUM(b) AS BIGINT) AS sum_px
    FROM px GROUP BY doc_id, tile_row, tile_col
    """,
)
def multimodal_image_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 spatial pooling over REAL decoded pixels — the feature-
    extraction step after decode (tile/pool/patch statistics feed
    vision encoders and image-quality filters). Synthesizes the same
    padded 24-bpp BMPs as multimodal_bmp_roundtrip_stats, decodes them
    with ``bmp_decode_pixels``, and sums each visual QUADRANT's bytes.
    The quadrant split is where orientation bites: BMP stores rows
    bottom-up, so a decoder that skips the flip swaps the top and
    bottom tiles — the per-tile oracle (closed-form byte sums with the
    y ≥ h − h//2 top-tile fence) catches exactly that, which the
    orientation-invariant whole-image mean never could.

    Scale shape: synthesize → decode → pool entirely inside one
    mapInPandas pass (Arrow-batched); only fixed-width per-tile rows
    leave the worker, never pixels."""
    import struct

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import bmp_decode_pixels

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_BMP_DOCS
    ).select("doc_id", "n_chars")

    def tile_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                w = int(n_chars) % 30 + 5
                h = doc_id % 20 + 4
                stride = (w * 3 + 3) & ~3
                img = np.zeros((h, stride), dtype=np.uint8)
                j = np.arange(3 * w, dtype=np.int64)
                for y in range(h):
                    img[y, : 3 * w] = (j + y * 7 + doc_id) % 256
                    img[y, 3 * w :] = 0xAB
                data = img.tobytes()
                hdr = (
                    b"BM"
                    + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                    + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                  len(data), 2835, 2835, 0, 0)
                )
                vis = bmp_decode_pixels(hdr + data).astype(np.int64)
                if vis.shape != (h, 3 * w):
                    raise AssertionError("decoded shape mismatch")
                h_half, w_half = h // 2, 3 * (w // 2)
                for tr, rows_slice in ((0, vis[:h_half]), (1, vis[h_half:])):
                    for tc, tile in (
                        (0, rows_slice[:, :w_half]),
                        (1, rows_slice[:, w_half:]),
                    ):
                        rows.append(
                            (doc_id, tr, tc, int(tile.size), int(tile.sum()))
                        )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "tile_row", "tile_col", "n_bytes", "sum_px"],
            )

    return d.mapInPandas(
        tile_batches,
        "doc_id long, tile_row int, tile_col int, n_bytes long, sum_px long",
    )


@query(
    "multimodal_video_scene_cuts",
    oracle="""
    WITH meta AS (
      SELECT doc_id, text,
             1 + (CAST('0x' || substr(sha256(text), 9, 2) AS INT) % 8) AS n
      FROM documents
    ),
    frames AS (
      SELECT doc_id, i AS frame_idx,
             CAST('0x' || substr(sha256(text || '-' || i), 1, 8) AS BIGINT)
               AS lum
      FROM meta, LATERAL unnest(generate_series(0, n - 1)) AS u(i)
    ),
    diffs AS (
      SELECT doc_id, frame_idx, lum,
             lum - LAG(lum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS d
      FROM frames
    ),
    cuts AS (
      SELECT doc_id, frame_idx,
             CASE WHEN d IS NOT NULL AND ABS(d) > 3221225472
                  THEN 1 ELSE 0 END AS is_cut
      FROM diffs
    ),
    scenes AS (
      SELECT doc_id, frame_idx,
             CAST(SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS scene_id
      FROM cuts
    ),
    slen AS (
      SELECT doc_id, scene_id, CAST(COUNT(*) AS BIGINT) AS scene_len
      FROM scenes GROUP BY 1, 2
    )
    SELECT s.doc_id,
           CAST(SUM(s.scene_len) AS BIGINT) AS n_frames,
           CAST(MAX(s.scene_id) AS BIGINT) AS n_cuts,
           CAST(MAX(s.scene_len) AS BIGINT) AS longest_scene
    FROM slen s GROUP BY s.doc_id
    """,
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video SCENE-CUT detection over the sampled frame stream: decode
    every frame (``sample_frames`` with every_n=1 — the mapInPandas
    fan-out is the real plumbing a production ffmpeg UDF rides), derive
    a per-frame luminance proxy from the frame digest (top 8 hex chars
    as int64 — the stand-in for a real frame-mean), and declare a cut
    where the consecutive-frame difference exceeds 0.75 of the value
    range; scenes are the cut-bounded runs, per video we emit frame,
    cut, and longest-scene counts.

    Determinism: the fan-out count and every luminance value are
    sha256-derived integers both engines compute bit-identically
    (hex-slice -> int64, <= 15 hex digits); the cut threshold
    (3*2^30) and scene segmentation (cumulative cut count) are pure
    integer math.

    Scale shape: the frame fan-out happens executor-side (no shuffle);
    the lag/cumsum windows partition by doc_id — millions of tiny
    per-video partitions, the healthy window regime; the rollup is one
    map-side-combinable aggregate."""
    from ..operators.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(d, "text"), every_n=1).select(
        "doc_id",
        "frame_idx",
        F.expr("CAST(conv(substr(frame_sha, 1, 8), 16, 10) AS BIGINT)").alias(
            "lum"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    diffs = frames.withColumn("d", F.col("lum") - F.lag("lum").over(w))
    cuts = diffs.withColumn(
        "is_cut",
        F.when(
            F.col("d").isNotNull() & (F.abs(F.col("d")) > 3221225472), 1
        ).otherwise(0),
    )
    wc = Window.partitionBy("doc_id").orderBy("frame_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scenes = cuts.withColumn(
        "scene_id", F.sum("is_cut").over(wc).cast("bigint")
    )
    slen = scenes.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("scene_len")
    )
    return slen.groupBy("doc_id").agg(
        F.sum("scene_len").cast("bigint").alias("n_frames"),
        F.max("scene_id").cast("bigint").alias("n_cuts"),
        F.max("scene_len").cast("bigint").alias("longest_scene"),
    )


# ---------------------------------------------------------------------------
# Perceptual hash (8x8 DCT) over decoded BMP pixels, fully SQL-replayable
# ---------------------------------------------------------------------------

# DCT-II cosine basis quantized to 1e6 integers — the SHARED literal
# table both engines fold exactly (the md5-hyperplane technique applied
# to a transform basis).
_DCT_TAB = [(0, 0, 1000000), (0, 1, 1000000), (0, 2, 1000000), (0, 3, 1000000), (0, 4, 1000000), (0, 5, 1000000), (0, 6, 1000000), (0, 7, 1000000), (1, 0, 980785), (1, 1, 831470), (1, 2, 555570), (1, 3, 195090), (1, 4, -195090), (1, 5, -555570), (1, 6, -831470), (1, 7, -980785), (2, 0, 923880), (2, 1, 382683), (2, 2, -382683), (2, 3, -923880), (2, 4, -923880), (2, 5, -382683), (2, 6, 382683), (2, 7, 923880), (3, 0, 831470), (3, 1, -195090), (3, 2, -980785), (3, 3, -555570), (3, 4, 555570), (3, 5, 980785), (3, 6, 195090), (3, 7, -831470), (4, 0, 707107), (4, 1, -707107), (4, 2, -707107), (4, 3, 707107), (4, 4, 707107), (4, 5, -707107), (4, 6, -707107), (4, 7, 707107), (5, 0, 555570), (5, 1, -980785), (5, 2, 195090), (5, 3, 831470), (5, 4, -831470), (5, 5, -195090), (5, 6, 980785), (5, 7, -555570), (6, 0, 382683), (6, 1, -923880), (6, 2, 923880), (6, 3, -382683), (6, 4, -382683), (6, 5, 923880), (6, 6, -923880), (6, 7, 382683), (7, 0, 195090), (7, 1, -555570), (7, 2, 831470), (7, 3, -980785), (7, 4, 980785), (7, 5, -831470), (7, 6, 555570), (7, 7, -195090)]


@query(
    "multimodal_image_phash_dct",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars % 30 + 5 AS w, doc_id % 20 + 4 AS h
      FROM documents WHERE doc_id < 200
    ),
    spine8 AS (SELECT unnest(generate_series(0, 7)) AS i),
    grid AS (
      SELECT d.doc_id, sx.i AS x, sy.i AS y,
             CAST((3*((sx.i*d.w)//8) + 0 + ((sy.i*d.h)//8)*7 + d.doc_id)
                  % 256
                + (3*((sx.i*d.w)//8) + 1 + ((sy.i*d.h)//8)*7 + d.doc_id)
                  % 256
                + (3*((sx.i*d.w)//8) + 2 + ((sy.i*d.h)//8)*7 + d.doc_id)
                  % 256 AS BIGINT) AS g
      FROM d, spine8 sx, spine8 sy
    ),
    ctab AS (SELECT * FROM (VALUES (0, 0, 1000000), (0, 1, 1000000), (0, 2, 1000000), (0, 3, 1000000), (0, 4, 1000000), (0, 5, 1000000), (0, 6, 1000000), (0, 7, 1000000), (1, 0, 980785), (1, 1, 831470), (1, 2, 555570), (1, 3, 195090), (1, 4, -195090), (1, 5, -555570), (1, 6, -831470), (1, 7, -980785), (2, 0, 923880), (2, 1, 382683), (2, 2, -382683), (2, 3, -923880), (2, 4, -923880), (2, 5, -382683), (2, 6, 382683), (2, 7, 923880), (3, 0, 831470), (3, 1, -195090), (3, 2, -980785), (3, 3, -555570), (3, 4, 555570), (3, 5, 980785), (3, 6, 195090), (3, 7, -831470), (4, 0, 707107), (4, 1, -707107), (4, 2, -707107), (4, 3, 707107), (4, 4, 707107), (4, 5, -707107), (4, 6, -707107), (4, 7, 707107), (5, 0, 555570), (5, 1, -980785), (5, 2, 195090), (5, 3, 831470), (5, 4, -831470), (5, 5, -195090), (5, 6, 980785), (5, 7, -555570), (6, 0, 382683), (6, 1, -923880), (6, 2, 923880), (6, 3, -382683), (6, 4, -382683), (6, 5, 923880), (6, 6, -923880), (6, 7, 382683), (7, 0, 195090), (7, 1, -555570), (7, 2, 831470), (7, 3, -980785), (7, 4, 980785), (7, 5, -831470), (7, 6, 555570), (7, 7, -195090)) c(u, x, cv)),
    fm AS (
      SELECT grid.doc_id, cu.u AS u, cvr.u AS v,
             CAST(SUM(grid.g * cu.cv * cvr.cv) AS BIGINT) AS f
      FROM grid
      JOIN ctab cu ON cu.x = grid.x
      JOIN ctab cvr ON cvr.x = grid.y
      GROUP BY grid.doc_id, cu.u, cvr.u
    ),
    med AS (
      SELECT doc_id, f AS med_ac FROM (
        SELECT doc_id, f,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f, u, v)
                 AS rk
        FROM fm WHERE NOT (u = 0 AND v = 0)
      ) WHERE rk = 32
    ),
    ph AS (
      SELECT fm.doc_id,
             CAST(SUM(CASE WHEN NOT (u = 0 AND v = 0) AND f > med.med_ac
                      THEN (CAST(1 AS BIGINT) << (u*8 + v - 1))
                      ELSE 0 END) AS BIGINT) AS phash,
             CAST(SUM(CASE WHEN u = 0 AND v = 0 THEN f ELSE 0 END)
                  AS BIGINT) AS dc
      FROM fm JOIN med ON med.doc_id = fm.doc_id
      GROUP BY fm.doc_id
    ),
    dup AS (SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_same FROM ph
            GROUP BY phash)
    SELECT ph.doc_id, ph.dc, ph.phash, dup.n_same AS n_same_hash
    FROM ph JOIN dup ON dup.phash = ph.phash
    ORDER BY ph.doc_id
    """,
)
def multimodal_image_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL HASH (pHash) of the synthetic BMP corpus with a FULL
    differential oracle: sample each image on a fixed 8x8 grid
    (floor(i*dim/8) integer coordinates into the closed-form pixel
    field), run an exact integer 8x8 DCT-II (cosine basis quantized to
    1e6 — the shared-literal technique), take the sign of each AC
    coefficient against the exact AC median (value-at-rank 32 of 63),
    and pack 63 bits into the hash; equal-hash groups are the
    perceptual-dup report.  The real-codec pipeline swaps the sampler
    for a resize kernel and keeps everything downstream bit-identical.

    Determinism: every quantity — sampled intensities (sum of 3
    channel bytes), DCT partial sums (<= 64*765*1e12 ~ 4.9e16, inside
    int64), the median rank pick, bit packing — is exact integer math
    shared verbatim with the oracle.

    Scale shape: the doc x (u,v) x (x,y) expansion is 4096 rows per
    image joined against a 64-row broadcast basis table, reduced
    map-side to 64 coefficients per image; the dup report is one
    groupBy on the hash. Per-image work is constant — the plan scales
    linearly in image count."""
    from ..plans.pin import pin

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_BMP_DOCS
    ).select(
        "doc_id",
        (F.col("n_chars") % 30 + 5).alias("w"),
        (F.col("doc_id") % 20 + 4).alias("h"),
    )
    ctab = F.broadcast(
        spark.createDataFrame(_DCT_TAB, "u int, x int, cv bigint")
    )
    spine = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i")
    gx = d.select("doc_id", "w", "h", spine).withColumnRenamed("i", "x")
    gxy = gx.select("doc_id", "w", "h", "x", spine).withColumnRenamed(
        "i", "y"
    )
    px = "(3*((x*w) DIV 8) + {c} + ((y*h) DIV 8)*7 + doc_id) % 256"
    grid = gxy.selectExpr(
        "doc_id",
        "x",
        "y",
        f"CAST({px.format(c=0)} + {px.format(c=1)} + {px.format(c=2)}"
        " AS BIGINT) AS g",
    )
    cu = ctab.alias("cu")
    cv = ctab.alias("cvr")
    fm = (
        grid.join(cu, F.col("cu.x") == grid.x)
        .join(cv, F.col("cvr.x") == grid.y)
        .groupBy(
            "doc_id",
            F.col("cu.u").alias("u"),
            F.col("cvr.u").alias("v"),
        )
        .agg(
            F.sum(F.col("g") * F.col("cu.cv") * F.col("cvr.cv"))
            .cast("bigint")
            .alias("f")
        )
        .transform(pin, eager=False)
    )
    wmed = Window.partitionBy("doc_id").orderBy("f", "u", "v")
    med = (
        fm.filter(~((F.col("u") == 0) & (F.col("v") == 0)))
        .withColumn("rk", F.row_number().over(wmed))
        .filter(F.col("rk") == 32)
        .select("doc_id", F.col("f").alias("med_ac"))
    )
    ph = (
        fm.join(med, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    ~((F.col("u") == 0) & (F.col("v") == 0))
                    & (F.col("f") > F.col("med_ac")),
                    F.expr(
                        "CAST(1 AS BIGINT) << (u*8 + v - 1)"
                    ),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("phash"),
            F.sum(
                F.when(
                    (F.col("u") == 0) & (F.col("v") == 0), F.col("f")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("dc"),
        )
        .transform(pin, eager=False)
    )
    dup = ph.groupBy("phash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_same_hash")
    )
    return (
        ph.join(F.broadcast(dup), "phash")
        .select("doc_id", "dc", "phash", "n_same_hash")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gradient energy (edge strength) over real decoded pixels
# ---------------------------------------------------------------------------


@query(
    "multimodal_image_gradient_energy",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars % 30 + 5 AS w, doc_id % 20 + 4 AS h
      FROM documents WHERE doc_id < {N_BMP_DOCS}
    ),
    fy AS (
      SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y FROM d
    ),
    fj AS (
      SELECT doc_id, w, h, y,
             unnest(generate_series(0, 3 * w - 1)) AS j
      FROM fy
    ),
    px AS (
      SELECT doc_id, w, h, y, j,
             (j + y * 7 + doc_id) % 256 AS b
      FROM fj
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN j < 3 * w - 1 THEN
                abs(((j + 1 + y * 7 + doc_id) % 256) - b) ELSE 0 END)
                AS BIGINT) AS grad_x,
           CAST(SUM(CASE WHEN y < h - 1 THEN
                abs(((j + (y + 1) * 7 + doc_id) % 256) - b) ELSE 0 END)
                AS BIGINT) AS grad_y,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id
    """,
)
def multimodal_image_gradient_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gradient energy (Σ|∂x| and Σ|∂y| of the decoded byte plane) per
    image — the blur/flat-image detector a vision-data quality filter
    runs (near-zero gradient energy ⇒ blank or synthetic-flat frames;
    the same synthesized 24-bpp BMPs and real ``bmp_decode_pixels``
    path as the tile-stats key, so row order/orientation bugs in the
    codec shift the vertical term and break the hash).

    Determinism: pixels are exact closed-form bytes; gradients are
    integer absolute differences summed as int64 — the oracle
    recomputes the closed form positionally, never touching the codec.

    Scale shape: synthesize → decode → two np.diff reductions inside
    one Arrow-batched mapInPandas pass; one fixed-width row per image
    leaves the worker.
    """
    import struct

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import bmp_decode_pixels

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_BMP_DOCS
    ).select("doc_id", "n_chars")

    def grad_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                w = int(n_chars) % 30 + 5
                h = doc_id % 20 + 4
                stride = (w * 3 + 3) & ~3
                img = np.zeros((h, stride), dtype=np.uint8)
                j = np.arange(3 * w, dtype=np.int64)
                for y in range(h):
                    img[y, : 3 * w] = (j + y * 7 + doc_id) % 256
                    img[y, 3 * w :] = 0xAB
                data = img.tobytes()
                hdr = (
                    b"BM"
                    + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                    + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                  len(data), 2835, 2835, 0, 0)
                )
                vis = bmp_decode_pixels(hdr + data).astype(np.int64)
                gx = int(np.abs(np.diff(vis, axis=1)).sum())
                gy = int(np.abs(np.diff(vis, axis=0)).sum())
                rows.append((doc_id, gx, gy, int(vis.size)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "grad_x", "grad_y", "n_px"]
            )

    return d.mapInPandas(
        grad_batches, "doc_id long, grad_x long, grad_y long, n_px long"
    )


# ---------------------------------------------------------------------------
# Silence-run detection on int8 PCM payloads (gaps-and-islands on audio)
# ---------------------------------------------------------------------------


@query(
    "multimodal_audio_silence_runs",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(strlen(text) AS BIGINT) AS len
      FROM documents
    ),
    x AS (
      SELECT doc_id, len, i,
             CASE WHEN ub >= 128 THEN ub - 256 ELSE ub END AS v
      FROM (
        SELECT doc_id, len, i,
               CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT) AS ub
        FROM b, LATERAL unnest(generate_series(0, len - 1)) AS u(i)
        WHERE len > 0)
    ),
    q AS (SELECT doc_id, len, i FROM x WHERE abs(v) < 33),
    isl AS (
      SELECT doc_id, MAX(len) AS len,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM q GROUP BY doc_id, i
    ),
    runs AS (
      SELECT doc_id, MAX(len) AS len, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(MAX(len) AS BIGINT) AS n_samples,
           CAST(SUM(run_len) AS BIGINT) AS n_quiet,
           CAST(MAX(run_len) AS BIGINT) AS longest_quiet_run,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY doc_id
    """,
)
def multimodal_audio_silence_runs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Silence-run profile on int8-PCM-interpreted payloads: per clip,
    the quiet-sample count (|v| < 33, i.e. ASCII space/control when text bytes stand in for PCM), the number of maximal quiet
    RUNS, and the longest run — the trim/VAD preprocessing signal an
    audio-data curation pass computes before cutting leading/trailing
    silence (gaps-and-islands applied to the sample axis). Clips with
    no quiet samples drop (both engines) — they need no trimming.

    Determinism: bytes → signed int8 → integer runs; the oracle
    recomputes positionally from hex(encode(text)) slices.

    Scale shape: one Arrow-batched mapInPandas pass; runs are found
    with a vectorized numpy mask-diff per clip (no per-sample Python),
    and one fixed-width row per clip leaves the worker.
    """
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import with_binary_payload

    d = with_binary_payload(
        read_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "text",
    ).select("doc_id", "payload")

    def run_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = np.frombuffer(bytes(payload), dtype=np.int8)
                if v.size == 0:
                    continue
                quiet = np.abs(v.astype(np.int64)) < 33
                nq = int(quiet.sum())
                if nq == 0:
                    continue
                # run-length encode the quiet mask: run starts where the
                # mask turns on
                edges = np.diff(quiet.astype(np.int8))
                starts = 1 + np.flatnonzero(edges == 1)
                ends = 1 + np.flatnonzero(edges == -1)
                if quiet[0]:
                    starts = np.concatenate(([0], starts))
                if quiet[-1]:
                    ends = np.concatenate((ends, [quiet.size]))
                lens = ends - starts
                rows.append(
                    (
                        int(doc_id),
                        int(v.size),
                        nq,
                        int(lens.max()),
                        int(lens.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_quiet",
                    "longest_quiet_run",
                    "n_runs",
                ],
            )

    return d.mapInPandas(
        run_batches,
        "doc_id long, n_samples long, n_quiet long,"
        " longest_quiet_run long, n_runs long",
    )
