"""Multimodal plumbing: determinism, fan-out shape, and the codec seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.multimodal import (
    codec_decode,
    decode_images,
    fake_decode,
    resize_plan,
    sample_frames,
    with_binary_payload,
)


@pytest.fixture()
def docs(spark):
    return with_binary_payload(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "a much longer document body")],
            "doc_id long, text string",
        ),
        "text",
    )


def test_decode_deterministic(docs):
    a = {r.doc_id: tuple(r) for r in decode_images(docs).collect()}
    b = {r.doc_id: tuple(r) for r in decode_images(docs).collect()}
    assert a == b
    assert set(a) == {1, 2, 3}
    for _, h, w, c, m in a.values():
        assert 16 <= h <= 256 and 16 <= w <= 256
        assert c in (1, 3)
        assert 0.0 <= m <= 1.0


def test_resize_plan_bounds(docs):
    out = resize_plan(decode_images(docs), max_side=64).collect()
    for r in out:
        assert max(r.out_height, r.out_width) <= 64
        assert r.out_height >= 1 and r.out_width >= 1
        assert 0 < r.scale <= 1.0
        # aspect ratio preserved within rounding
        if r.scale < 1.0:
            assert abs(r.out_height / r.height - r.out_width / r.width) < 0.1


def test_frame_sample_fanout(docs):
    frames = sample_frames(docs, every_n=1)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    expect = {
        r.doc_id: fake_decode(bytes(r.payload))["n_frames"]
        for r in docs.collect()
    }
    assert {r.doc_id: r.n for r in got} == expect
    # every_n=2 halves (ceil) the sampled frames
    half = sample_frames(docs, every_n=2)
    got2 = {r.doc_id: r.n for r in
            half.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got2 == {k: (v + 1) // 2 for k, v in expect.items()}


def test_codec_seam_best_available():
    """codec_decode uses a REAL codec when the env provides one (PIL,
    import-gated), else raises loudly. Runs whichever path exists."""
    from data_ingestion_tool_spark.operators import multimodal as M

    if not M.HAS_REAL_CODEC:
        with pytest.raises(NotImplementedError, match="codec"):
            codec_decode(b"\xff\xd8\xff")
        return
    # real-codec path: a 2x3 PNG round-trips with exact dims
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (3, 2), (255, 0, 0)).save(buf, format="PNG")
    meta = codec_decode(buf.getvalue())
    assert (meta["height"], meta["width"], meta["channels"]) == (2, 3, 3)
    assert meta["n_frames"] == 1
    assert abs(meta["mean_pixel"] - (255 / 3) / 255.0) < 1e-9


def test_default_decoder_selection():
    """default_decoder() picks the real codec iff present; the fake
    path stays byte-stable (pinned digest-derived values)."""
    from data_ingestion_tool_spark.operators import multimodal as M

    dec = M.default_decoder()
    assert dec is (M.pil_decode if M.HAS_REAL_CODEC else M.fake_decode)
    # pin fake_decode determinism regardless of env
    m1, m2 = fake_decode(b"payload"), fake_decode(b"payload")
    assert m1 == m2
    assert set(m1) == {"height", "width", "channels", "mean_pixel", "n_frames"}
    assert fake_decode(b"other") != m1


def test_audio_window_features_match_pure_python(spark):
    """Windowed RMS/ZCR from the mapInPandas operator == a pure-Python
    reference on synthetic PCM with real sign changes (unlike UTF-8
    payloads, whose int8 bytes are all positive)."""
    import math
    import random

    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.multimodal import (
        audio_window_features,
    )

    rng = random.Random(7)
    payloads = {
        1: bytes((rng.randrange(256) for _ in range(1000))),
        2: bytes((rng.randrange(256) for _ in range(37))),  # short tail
        3: b"",  # empty payload -> zero rows
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in payloads.items()], "doc_id long, payload binary"
    )
    got = {
        (r.doc_id, r.window_idx): (r.n_samples, r.rms, r.zcr)
        for r in audio_window_features(df, window=64).collect()
    }

    def signed(b):  # int8 view
        return b - 256 if b >= 128 else b

    want = {}
    for did, raw in payloads.items():
        xs = [float(signed(b)) for b in raw]
        for w in range(0, len(xs), 64):
            seg = xs[w : w + 64]
            rms = round(math.sqrt(sum(v * v for v in seg) / len(seg)), 6)
            zc = (
                round(
                    sum(
                        (a < 0) != (b < 0)
                        for a, b in zip(seg[:-1], seg[1:])
                    )
                    / (len(seg) - 1),
                    6,
                )
                if len(seg) > 1
                else 0.0
            )
            want[(did, w // 64)] = (len(seg), rms, zc)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-6, k
        assert abs(got[k][2] - want[k][2]) < 1e-6, k
    assert (3, 0) not in got  # empty payload contributes nothing
