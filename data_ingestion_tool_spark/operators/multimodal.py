"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json). The design: image/audio/video
payloads live in a ``binary`` column beside typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions over ``mapInPandas`` so each task processes a batch of
payloads without ever collecting to the driver.

The container has no image/audio codecs, so the *codec call* is behind
a seam: each operator takes a ``decoder`` callable; the default is
:func:`fake_decode` — a deterministic stand-in that derives plausible
(height, width, channels, pixel-stats) from the payload bytes — and
:func:`codec_decode` raises ``NotImplementedError`` exactly where
PIL/ffmpeg would plug in. Everything around the seam (schemas, Arrow
batch shapes, the one-row-to-many frame explode, partition behavior) is
real, production-shaped, and tested.

At 100 TB: payloads ride executor-local (parquet binary column, no
driver transit); mapInPandas streams Arrow batches, so peak memory per
task is one batch, not one partition; frame sampling fans out rows
inside the executor with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Decoder = Callable[[bytes], dict]


def with_binary_payload(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Pack a column into the opaque binary payload column (here from
    text; in production from raw image/audio bytes at ingest)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "UTF-8"))


METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
    ]
)


def extract_binary_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata per payload via mapInPandas (Arrow batches).

    This is the exact execution shape a real decoder uses: per-task
    iterator of pandas batches in, schema-declared batches out, nothing
    on the driver. sha256/length stand in for width/height/duration.
    """

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256_hex": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(meta_batches, METADATA_SCHEMA)


# --- the codec seam -------------------------------------------------------

try:  # optional dep (CLAUDE.md: no pip install — import-gated only)
    from PIL import Image as _PILImage  # noqa: N813
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None

HAS_REAL_CODEC = _PILImage is not None


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image codec: digest-derived
    dimensions + pixel stats. CLEARLY FAKE — swap for a PIL/libjpeg
    decode in production; the surrounding plumbing is unchanged."""
    d = hashlib.sha256(payload).digest()
    return {
        "height": 16 + d[0] % 16 * 16,          # 16..256, deterministic
        "width": 16 + d[1] % 16 * 16,
        "channels": 1 if d[2] % 4 == 0 else 3,
        "mean_pixel": d[3] / 255.0,
        "n_frames": 1 + d[4] % 8,               # video payloads: 1..8
    }


def pil_decode(payload: bytes) -> dict:
    """Real image decode via PIL (only when the env provides it).
    Emits the same dict shape as :func:`fake_decode`, so the two are
    drop-in interchangeable behind the same mapInPandas plumbing."""
    if _PILImage is None:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "PIL not available in this environment; use fake_decode"
        )
    import io

    import numpy as np

    with _PILImage.open(io.BytesIO(payload)) as img:
        n_frames = int(getattr(img, "n_frames", 1))
        arr = np.asarray(img.convert("RGB"), dtype=np.float64)
        return {
            "height": int(arr.shape[0]),
            "width": int(arr.shape[1]),
            "channels": int(arr.shape[2]),
            "mean_pixel": float(arr.mean() / 255.0),
            "n_frames": n_frames,
        }


def bmp_decode(payload: bytes) -> dict:
    """REAL image decode for uncompressed BI_RGB BMP (8-bpp paletted
    grayscale, 24-bpp BGR, 32-bpp BGRA) — pure Python + numpy, no
    third-party codec, so the real-decode path executes in CI with
    actual pixel math instead of only the digest stand-in. Emits the
    same dict shape as :func:`fake_decode`/:func:`pil_decode`.

    Handles the format's real quirks: rows padded to 4-byte
    boundaries, bottom-up storage (negative biHeight ⇒ top-down), and
    8-bpp palette indirection (indices map through the BGRA color
    table; mean is over the mapped gray levels). Mean for 32-bpp is
    over the BGR channels only (alpha excluded)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    h = abs(height)
    if width <= 0 or h == 0:
        raise ValueError("degenerate dimensions")
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_off
    ).reshape(h, row_stride)[:, : width * bytes_pp]
    if bpp == 8:
        # palette: BGRA quads between the 54-byte headers and the data
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=54
        ).reshape(n_colors, 4)
        gray = pal[:, :3].mean(axis=1)  # BGR of each palette entry
        mean = float(gray[px.reshape(-1)].mean())
        channels = 1
    elif bpp == 24:
        mean = float(px.mean())
        channels = 3
    else:  # 32-bpp BGRA: exclude the alpha byte from the pixel mean
        mean = float(px.reshape(h, width, 4)[:, :, :3].mean())
        channels = 3
    return {
        "height": h,
        "width": width,
        "channels": channels,
        "mean_pixel": mean / 255.0,
        "n_frames": 1,
    }


def bmp_pixels(payload: bytes):
    """Full pixel decode for the same BMP subset :func:`bmp_decode`
    handles: returns a top-down ``(h, w, 3)`` uint8 BGR array (8-bpp
    palette indices map through the color table; 32-bpp drops alpha).
    Positive biHeight means bottom-up row storage, so rows flip to
    top-down here — :func:`bmp_decode`'s means are orientation-blind,
    but resize output is not."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    h = abs(height)
    if width <= 0 or h == 0:
        raise ValueError("degenerate dimensions")
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_off
    ).reshape(h, row_stride)[:, : width * bytes_pp]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=54
        ).reshape(n_colors, 4)
        px = pal[raw.reshape(h, width), :3]  # palette BGR per index
    elif bpp == 24:
        px = raw.reshape(h, width, 3)
    else:  # 32-bpp BGRA → BGR
        px = raw.reshape(h, width, 4)[:, :, :3]
    if height > 0:  # bottom-up storage → top-down array
        px = px[::-1]
    return np.ascontiguousarray(px)


def bmp_encode_gray24(data: bytes, width: int = 32) -> bytes:
    """Deterministic 24-bpp BI_RGB BMP from arbitrary bytes — the
    ingest-side stand-in for real image bytes (CI has no camera).
    Pixel (y, x), top-down, is the gray level ``data[(y·width+x) mod
    len]`` in all three BGR channels (modulo wrap, no zero-pad bias);
    height = ceil(len/width). Empty input encodes a single black
    pixel. Stored bottom-up (positive biHeight), rows padded to
    4 bytes — exercises the decoder's real quirks."""
    import struct

    import numpy as np

    if not data:
        data = b"\x00"
    h = -(-len(data) // width)
    idx = np.arange(h * width, dtype=np.int64) % len(data)
    gray = np.frombuffer(data, dtype=np.uint8)[idx].reshape(h, width)
    px = np.repeat(gray[:, :, None], 3, axis=2)  # BGR = gray
    row_stride = (width * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : width * 3] = px.reshape(h, width * 3)
    body = rows[::-1].tobytes()  # bottom-up storage
    data_off = 54
    file_sz = data_off + len(body)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", file_sz, 0, 0, data_off,
        40, width, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + body


def nn_resize(px, out_h: int, out_w: int):
    """Nearest-neighbor resize of an ``(h, w, c)`` array: output pixel
    (y, x) = input pixel (floor(y·h/out_h), floor(x·w/out_w)) — the
    classic index-scaling rule, pinned exactly by the pure-Python
    reference in tests/test_multimodal.py."""
    import numpy as np

    h, w = px.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return np.ascontiguousarray(px[ys][:, xs])


def with_bmp_payload(
    df: DataFrame, src_col: str, out_col: str = "payload", width: int = 32
) -> DataFrame:
    """Pack a text column into a REAL (synthesized) BMP binary payload,
    Arrow-batched executor-side — the deterministic ingest stand-in
    that lets the decode→resize pipeline run actual pixel math with no
    codec libs."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def enc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: bmp_encode_gray24(t.encode("utf-8"), width))

    return df.withColumn(out_col, enc(F.col(src_col)))


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ]
)


def image_ahash_bands(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual average-hash (aHash) over image payloads, emitted as
    FOUR 16-bit bands: real BMP pixel decode (:func:`bmp_pixels`) →
    8×8 nearest-neighbor downsample (:func:`nn_resize`) → bit(j,k) =
    [sample·64 > sum of samples] (the strict-integer compare — no mean
    rounding anywhere) → band b packs rows 2b..2b+1. Bands double as
    the LSH blocking key for Hamming near-dup search: two images within
    Hamming distance 6 of a 64-bit hash agree on ≥1 of 4 bands
    (pigeonhole), so a band-equality self-join finds every such pair
    without an all-pairs scan.

    All math is exact int64 (samples ≤ 255, sums ≤ 255·64), so the
    whole hash — decode, resample, threshold, packing — replays
    bit-for-bit in SQL over the synthesized payload's byte stream."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = []
            bands: list[list[int]] = [[], [], [], []]
            w2 = (
                np.int64(1)
                << (np.arange(2)[:, None] * 8 + np.arange(8)[None, :])
            )
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                px = bmp_pixels(bytes(b))
                g = nn_resize(px, 8, 8)[:, :, 0].astype(np.int64)
                bits = (g * 64 > int(g.sum())).astype(np.int64)
                ids.append(int(i))
                for band in range(4):
                    bands[band].append(
                        int((bits[2 * band : 2 * band + 2] * w2).sum())
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "b0": pd.Series(bands[0], dtype="int64"),
                    "b1": pd.Series(bands[1], dtype="int64"),
                    "b2": pd.Series(bands[2], dtype="int64"),
                    "b3": pd.Series(bands[3], dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AHASH_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("out_height", T.LongType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("resized_mean", T.DoubleType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def decode_resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_side: int = 64,
) -> DataFrame:
    """REAL decode → nearest-neighbor resize over BMP payloads (round-8,
    r6-verdict item 6): :func:`bmp_pixels` + :func:`nn_resize`, pure
    numpy inside one Arrow-batched mapInPandas pass — no codec libs, no
    shuffle, peak memory one batch per task. Target dims use the same
    rule as :func:`resize_plan` (scale = min(1, max_side/max(h,w)),
    floor, min 1). Emits the resized image's mean (in [0,1]) and the
    sha256 of its raw BGR bytes, so output is deterministic and
    downstream-verifiable."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hs, ws, ohs, ows, means, shas = [], [], [], [], [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                px = bmp_pixels(bytes(b))
                h, w = px.shape[:2]
                scale = min(1.0, max_side / max(h, w))
                oh = max(1, int(np.floor(h * scale)))
                ow = max(1, int(np.floor(w * scale)))
                out = nn_resize(px, oh, ow)
                ids.append(i)
                hs.append(h)
                ws.append(w)
                ohs.append(oh)
                ows.append(ow)
                means.append(float(out.mean()) / 255.0)
                shas.append(hashlib.sha256(out.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "out_height": pd.Series(ohs, dtype="int64"),
                    "out_width": pd.Series(ows, dtype="int64"),
                    "resized_mean": pd.Series(means, dtype="float64"),
                    "resized_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)


def wav_decode(payload: bytes) -> dict:
    """REAL audio header+PCM decode for RIFF/WAVE (PCM, 8/16-bit) —
    pure Python + numpy. Walks the chunk list (fmt /data, skipping
    LIST/fact/etc.), then computes sample-level stats from the data
    chunk: (n_channels, sample_rate, bits_per_sample, n_samples,
    duration_s, rms) with rms normalized to [0, 1] full scale."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (fmt={audio_format}, bits={bits})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:  # 8-bit WAV PCM is UNSIGNED, centered at 128
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n_samples = len(x) // n_channels
    return {
        "n_channels": int(n_channels),
        "sample_rate": int(sample_rate),
        "bits_per_sample": int(bits),
        "n_samples": int(n_samples),
        "duration_s": n_samples / sample_rate if sample_rate else 0.0,
        "rms": float(np.sqrt((x**2).mean())) if len(x) else 0.0,
    }


def codec_decode(payload: bytes) -> dict:
    """The production seam, now with a REAL in-repo decode path: BMP
    payloads decode with actual pixel math (:func:`bmp_decode`,
    exercised in CI with golden-byte fixtures), anything else uses PIL
    when the environment provides it, else a loud NotImplementedError
    telling the caller to use the deterministic stand-in."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if HAS_REAL_CODEC:
        return pil_decode(payload)
    raise NotImplementedError(
        "no codec for this payload in this environment (in-repo: BMP via "
        "bmp_decode, WAV via wav_decode); pass decoder=fake_decode "
        "(deterministic) or plug in a real codec callable"
    )


def default_decoder() -> Decoder:
    """Best available decoder: real codec if the env provides one, else
    the deterministic stand-in (keeps test results reproducible)."""
    return pil_decode if HAS_REAL_CODEC else fake_decode


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Decoder = fake_decode,
) -> DataFrame:
    """Decode payloads → typed image features, one output row per
    payload, Arrow-batched, executor-local."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decoder(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").values,
                    "height": [m["height"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "mean_pixel": [m["mean_pixel"] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, DECODE_SCHEMA)


def resize_plan(
    decoded: DataFrame, max_side: int = 64
) -> DataFrame:
    """Resize planning over decoded dims — pure column math (codegen),
    no second decode pass: scale factor + target dims per image."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("height"), F.col("width")).cast("double"),
    )
    return decoded.withColumns(
        {
            "scale": scale,
            "out_height": F.greatest(
                F.floor(F.col("height") * scale).cast("bigint"), F.lit(1)
            ),
            "out_width": F.greatest(
                F.floor(F.col("width") * scale).cast("bigint"), F.lit(1)
            ),
        }
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
    decoder: Decoder = fake_decode,
) -> DataFrame:
    """Video frame sampling: one input row fans out to ~n_frames/every_n
    output rows *inside the executor* (mapInPandas emits more rows than
    it receives — no shuffle, no driver). frame_sha stands in for the
    frame tensor a real ffmpeg extraction would yield."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, shas = [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                raw = bytes(b)
                n = decoder(raw)["n_frames"]
                for f_idx in range(0, n, every_n):
                    ids.append(i)
                    idxs.append(f_idx)
                    shas.append(
                        # payload || "-" || idx (ASCII suffix, so a SQL
                        # twin can replay it: sha256(text || '-' || i))
                        hashlib.sha256(
                            raw + b"-" + str(f_idx).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        # exact integer partials (round-8): additively mergeable across
        # windows, so doc/corpus profiles compute from identical ints
        # with no per-window float rounding in the path — the property
        # the differential oracle needs, and the right production shape
        # for two-level aggregation anyway.
        T.StructField("sq_sum", T.LongType()),
        T.StructField("n_crossings", T.LongType()),
        T.StructField("n_pairs", T.LongType()),
    ]
)


def audio_window_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window: int = 256,
) -> DataFrame:
    """Windowed audio features over a raw-PCM binary payload — unlike
    the image/video seams this needs NO codec: the payload bytes ARE
    the samples (int8 PCM), so the computation is real end-to-end.

    Per non-overlapping window of ``window`` samples: RMS energy and
    zero-crossing rate (the classic VAD/silence-trim features), numpy-
    vectorized inside mapInPandas — one input row fans out to
    ~n_samples/window feature rows executor-side, no shuffle, no
    driver. Values round to 6 decimals (pure numpy is deterministic;
    rounding keeps downstream aggregates engine-stable)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, widx, ns, rms, zcr = [], [], [], [], []
            sqs, ncr, npr = [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                xi = np.frombuffer(bytes(b), dtype=np.int8).astype(np.int64)
                x = xi.astype(np.float64)
                for w in range(0, len(x), window):
                    seg = x[w : w + window]
                    segi = xi[w : w + window]
                    ids.append(i)
                    widx.append(w // window)
                    ns.append(len(seg))
                    rms.append(round(float(np.sqrt(np.mean(seg * seg))), 6))
                    cross = (
                        int(
                            (np.signbit(seg[:-1]) != np.signbit(seg[1:])).sum()
                        )
                        if len(seg) > 1
                        else 0
                    )
                    zcr.append(
                        round(cross / (len(seg) - 1), 6) if len(seg) > 1 else 0.0
                    )
                    sqs.append(int((segi * segi).sum()))
                    ncr.append(cross)
                    npr.append(max(len(seg) - 1, 0))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": widx,
                    "n_samples": ns,
                    "rms": rms,
                    "zcr": zcr,
                    "sq_sum": pd.Series(sqs, dtype="int64"),
                    "n_crossings": pd.Series(ncr, dtype="int64"),
                    "n_pairs": pd.Series(npr, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_SCHEMA)


def bmp_decode_pixels(payload: bytes):
    """24-bpp BI_RGB BMP → uint8 array (h, 3·w) in TOP-DOWN visual
    order — the pixel-array sibling of :func:`bmp_decode` for feature
    extraction (tiling, pooling, resizing) rather than scalar stats.

    The orientation handling is the part a naive decoder gets wrong:
    positive biHeight means the file stores rows BOTTOM-UP, so the
    array is flipped; negative biHeight is already top-down. Row
    padding to 4-byte strides is cut exactly as in bmp_decode."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp != 24:
        raise ValueError("bmp_decode_pixels supports 24-bpp BI_RGB only")
    h = abs(height)
    if width <= 0 or h == 0:
        raise ValueError("degenerate dimensions")
    row_stride = (width * 3 + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_off
    ).reshape(h, row_stride)[:, : width * 3]
    return px[::-1] if height > 0 else px
