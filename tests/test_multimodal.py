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


def test_codec_gate_pinned_on_forced_no_pil(monkeypatch):
    """Pin the no-real-codec gate INDEPENDENT of the test env: with
    HAS_REAL_CODEC forced off, default_decoder() must select the
    deterministic fake, codec_decode must still decode in-repo BMP
    payloads, and anything else must raise the loud, documented
    NotImplementedError naming the escape hatches — so the gate can
    never silently widen into a quiet fallback."""
    from data_ingestion_tool_spark.operators import multimodal as M

    monkeypatch.setattr(M, "HAS_REAL_CODEC", False)
    assert M.default_decoder() is M.fake_decode
    # in-repo BMP path keeps working (real pixel math, no PIL)
    bmp = M.bmp_encode_gray24(bytes(range(64)), width=8)
    meta = M.codec_decode(bmp)
    assert (meta["height"], meta["width"]) == (8, 8)
    # everything else: loud gate with the escape hatches in the message
    with pytest.raises(NotImplementedError) as ei:
        M.codec_decode(b"\xff\xd8\xffJPEG-ish")
    msg = str(ei.value)
    assert "no codec" in msg and "fake_decode" in msg and "bmp_decode" in msg


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


# --- real in-repo codecs: golden-byte BMP / WAV fixtures ------------------


def _bmp(width, height, rows, bpp=24, palette=None, top_down=False):
    """Hand-assemble an uncompressed BI_RGB BMP from explicit pixel
    rows (rows given TOP-first; bottom-up files reverse them)."""
    import struct

    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    pal = b""
    if bpp == 8:
        entries = palette or [(i, i, i, 0) for i in range(256)]
        pal = b"".join(bytes(e) for e in entries)
    stored = rows if top_down else list(reversed(rows))
    body = b"".join(
        bytes(r) + b"\x00" * (stride - width * bytes_pp) for r in stored
    )
    data_off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if top_down else height, 1, bpp, 0,
        len(body), 2835, 2835, len(pal) // 4, 0,
    )
    return hdr + info + pal + body


def test_bmp_decode_24bpp_pixel_math():
    """2x2 24-bpp BMP with known BGR bytes: exact mean over the 12
    pixel bytes, row padding (2*3=6 -> stride 8) correctly skipped."""
    from data_ingestion_tool_spark.operators.multimodal import bmp_decode, codec_decode

    rows = [[10, 20, 30, 40, 50, 60], [70, 80, 90, 100, 110, 120]]
    meta = bmp_decode(_bmp(2, 2, rows))
    assert (meta["height"], meta["width"], meta["channels"]) == (2, 2, 3)
    want = sum(sum(r) for r in rows) / 12 / 255.0
    assert abs(meta["mean_pixel"] - want) < 1e-12
    # codec_decode routes BM-magic payloads to the real decoder
    assert codec_decode(_bmp(2, 2, rows)) == meta
    # top-down (negative height) decodes to the same stats
    assert bmp_decode(_bmp(2, 2, rows, top_down=True)) == meta


def test_bmp_decode_8bpp_palette_and_32bpp_alpha():
    from data_ingestion_tool_spark.operators.multimodal import bmp_decode

    # 8-bpp: indices map through a BGRA palette; entry k = (3k,3k,3k)
    pal = [(min(3 * i, 255),) * 3 + (0,) for i in range(256)]
    meta8 = bmp_decode(_bmp(3, 1, [[0, 1, 2]], bpp=8, palette=pal))
    assert (meta8["height"], meta8["width"], meta8["channels"]) == (1, 3, 1)
    assert abs(meta8["mean_pixel"] - (0 + 3 + 6) / 3 / 255.0) < 1e-12
    # 32-bpp: alpha byte (0xFF here) must NOT contaminate the mean
    meta32 = bmp_decode(
        _bmp(1, 1, [[10, 20, 30, 0xFF]], bpp=32)
    )
    assert meta32["channels"] == 3
    assert abs(meta32["mean_pixel"] - 20 / 255.0) < 1e-12


def test_bmp_decode_rejects_garbage():
    import pytest as _pytest

    from data_ingestion_tool_spark.operators.multimodal import bmp_decode

    with _pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"\x89PNG" + b"\x00" * 60)


def test_wav_decode_16bit_header_and_rms():
    """RIFF/WAVE with a LIST chunk before fmt /data: chunk walker must
    skip it; 16-bit samples at +/- 16384 give rms = 0.5 exactly."""
    import struct

    from data_ingestion_tool_spark.operators.multimodal import wav_decode

    samples = [16384, -16384] * 50  # 100 samples mono
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    meta = wav_decode(wav)
    assert meta["n_channels"] == 1
    assert meta["sample_rate"] == 8000
    assert meta["bits_per_sample"] == 16
    assert meta["n_samples"] == 100
    assert abs(meta["duration_s"] - 100 / 8000) < 1e-12
    assert abs(meta["rms"] - 0.5) < 1e-12


def test_wav_decode_8bit_unsigned_centering():
    import struct

    from data_ingestion_tool_spark.operators.multimodal import wav_decode

    # 8-bit PCM is unsigned centered at 128: constant 192 -> 0.5 amplitude
    data = bytes([192] * 64)
    fmt = struct.pack("<HHIIHH", 1, 2, 4000, 8000, 2, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    meta = wav_decode(wav)
    assert meta["n_channels"] == 2
    assert meta["n_samples"] == 32  # 64 bytes / 2 channels
    assert abs(meta["rms"] - 0.5) < 1e-12


def test_bmp_payloads_through_decode_images_plumbing(spark):
    """The real decoder rides the SAME mapInPandas plumbing as the
    stand-in: BMP payloads in a binary column decode distributively
    with exact pixel means."""
    from data_ingestion_tool_spark.operators.multimodal import (
        codec_decode,
        decode_images,
    )

    rows = [
        (1, bytearray(_bmp(2, 2, [[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]]))),
        (2, bytearray(_bmp(1, 1, [[255, 255, 255]]))),
        (3, bytearray(_bmp(3, 1, [[10, 20, 30, 40, 50, 60, 70, 80, 90]]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r
        for r in decode_images(df, decoder=codec_decode).collect()
    }
    assert got[1].mean_pixel == 0.0
    assert got[2].mean_pixel == 1.0
    assert abs(got[3].mean_pixel - 50 / 255.0) < 1e-12
    assert (got[3].height, got[3].width, got[3].channels) == (1, 3, 3)


# --- real decode→resize path (round-8: un-gated BMP pixels) ---------------


def _nn_reference(px_rows, out_h, out_w):
    """Independent pure-Python nearest-neighbor: out(y,x) =
    in(floor(y*h/out_h), floor(x*w/out_w)). No numpy — pins the
    operator's index-scaling rule from first principles."""
    h, w = len(px_rows), len(px_rows[0])
    return [
        [px_rows[y * h // out_h][x * w // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


def test_bmp_pixels_orientation_palette_alpha():
    import numpy as np

    from data_ingestion_tool_spark.operators.multimodal import bmp_pixels

    # 24-bpp 2x2: pixel array comes back TOP-down regardless of storage
    rows = [[10, 20, 30, 40, 50, 60], [70, 80, 90, 100, 110, 120]]
    want = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    assert (bmp_pixels(_bmp(2, 2, rows)) == want).all()
    assert (bmp_pixels(_bmp(2, 2, rows, top_down=True)) == want).all()
    # 8-bpp palette indirection → BGR triples
    pal = [(min(3 * i, 255),) * 3 + (0,) for i in range(256)]
    px8 = bmp_pixels(_bmp(3, 1, [[0, 1, 2]], bpp=8, palette=pal))
    assert (px8 == np.array([[[0] * 3, [3] * 3, [6] * 3]], dtype=np.uint8)).all()
    # 32-bpp: alpha dropped
    px32 = bmp_pixels(_bmp(1, 1, [[10, 20, 30, 0xFF]], bpp=32))
    assert (px32 == np.array([[[10, 20, 30]]], dtype=np.uint8)).all()


def test_bmp_encode_gray24_roundtrip():
    import numpy as np

    from data_ingestion_tool_spark.operators.multimodal import (
        bmp_encode_gray24,
        bmp_decode,
        bmp_pixels,
    )

    data = bytes(range(1, 71))  # 70 bytes, width 32 → 3 rows, wraps
    px = bmp_pixels(bmp_encode_gray24(data, width=32))
    assert px.shape == (3, 32, 3)
    idx = np.arange(3 * 32) % 70
    want = np.frombuffer(data, dtype=np.uint8)[idx].reshape(3, 32)
    assert (px[:, :, 0] == want).all()  # gray replicated across BGR
    assert (px == px[:, :, :1]).all()
    # empty input → 1px black, still a valid BMP
    assert bmp_decode(bmp_encode_gray24(b"", width=32))["height"] == 1


def test_nn_resize_matches_pure_python_reference():
    import numpy as np

    from data_ingestion_tool_spark.operators.multimodal import nn_resize

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for oh, ow in [(5, 4), (13, 9), (1, 1), (7, 9)]:
        got = nn_resize(px, oh, ow)
        want = np.array(
            _nn_reference([list(map(list, r)) for r in px.tolist()], oh, ow),
            dtype=np.uint8,
        )
        assert got.shape == (oh, ow, 3)
        assert (got == want).all()


def test_decode_resize_images_end_to_end(spark):
    """Whole pipeline through Spark on known texts: dims, mean, and sha
    match a driver-side recomputation built from the pure-Python
    reference (independent of nn_resize's numpy indexing)."""
    import hashlib

    import numpy as np

    from data_ingestion_tool_spark.operators.multimodal import (
        decode_resize_images,
        with_bmp_payload,
    )

    texts = ["hello world " * 40, "short", "x" * 5000]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in decode_resize_images(
            with_bmp_payload(df, "text"), max_side=64
        ).collect()
    }
    for i, t in enumerate(texts):
        data = t.encode("utf-8")
        w, h = 32, -(-len(data) // 32)
        idx = np.arange(h * w) % len(data)
        gray = np.frombuffer(data, dtype=np.uint8)[idx].reshape(h, w)
        scale = min(1.0, 64 / max(h, w))
        oh, ow = max(1, int(h * scale)), max(1, int(w * scale))
        rows = [[[int(v)] * 3 for v in r] for r in gray.tolist()]
        out = np.array(_nn_reference(rows, oh, ow), dtype=np.uint8)
        r = got[i]
        assert (r["height"], r["width"]) == (h, w)
        assert (r["out_height"], r["out_width"]) == (oh, ow)
        assert abs(r["resized_mean"] - float(out.mean()) / 255.0) < 1e-12
        assert r["resized_sha"] == hashlib.sha256(out.tobytes()).hexdigest()


def test_image_ahash_bands_match_pure_python(spark):
    """Operator aHash bands vs an independent pure-Python walk of the
    synthesized-BMP byte formula: sample(j,k) = data[((j*h)//8*32+4k)
    mod len], bit = sample*64 > sum, band b packs rows 2b..2b+1."""
    from data_ingestion_tool_spark.operators.multimodal import (
        image_ahash_bands,
        with_bmp_payload,
    )

    texts = ["hello world " * 40, "short", "x" * 5000, "", "abc" * 11]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in image_ahash_bands(with_bmp_payload(df, "text")).collect()
    }
    for i, t in enumerate(texts):
        data = t.encode("utf-8") or b"\x00"
        n = len(data)
        h = -(-n // 32)
        samples = [
            [data[(((j * h) // 8) * 32 + 4 * k) % n] for k in range(8)]
            for j in range(8)
        ]
        total = sum(sum(r) for r in samples)
        expect = [0, 0, 0, 0]
        for j in range(8):
            for k in range(8):
                if samples[j][k] * 64 > total:
                    expect[j // 2] |= 1 << ((j % 2) * 8 + k)
        r = got[i]
        assert [r["b0"], r["b1"], r["b2"], r["b3"]] == expect, f"doc {i}"


def test_image_ahash_identical_payloads_collide(spark):
    """Exact duplicate images must hash identically (Hamming 0) and
    differ from a non-duplicate."""
    from data_ingestion_tool_spark.operators.multimodal import (
        image_ahash_bands,
        with_bmp_payload,
    )

    df = spark.createDataFrame(
        [(0, "duplicate payload " * 30), (1, "duplicate payload " * 30),
         (2, "something else entirely " * 25)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in image_ahash_bands(with_bmp_payload(df, "text")).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
