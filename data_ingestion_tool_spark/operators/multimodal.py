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


def codec_decode(payload: bytes) -> dict:
    """The production seam: a REAL codec when the environment has one
    (PIL, import-gated above), else a loud NotImplementedError telling
    the caller to use the deterministic stand-in."""
    if HAS_REAL_CODEC:
        return pil_decode(payload)
    raise NotImplementedError(
        "no image/audio codec in this environment; pass decoder=fake_decode "
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
                        hashlib.sha256(raw + f_idx.to_bytes(4, "big")).hexdigest()
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
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                x = np.frombuffer(bytes(b), dtype=np.int8).astype(np.float64)
                for w in range(0, len(x), window):
                    seg = x[w : w + window]
                    ids.append(i)
                    widx.append(w // window)
                    ns.append(len(seg))
                    rms.append(round(float(np.sqrt(np.mean(seg * seg))), 6))
                    zcr.append(
                        round(
                            float(
                                np.mean(
                                    np.signbit(seg[:-1]) != np.signbit(seg[1:])
                                )
                            ),
                            6,
                        )
                        if len(seg) > 1
                        else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": widx,
                    "n_samples": ns,
                    "rms": rms,
                    "zcr": zcr,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_SCHEMA)
