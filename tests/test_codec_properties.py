"""Property-based checks for the pure-Python codec kernels
(operators/multimodal.py): the BMP encode→decode→pixels loop and the
WAV decode math, under hypothesis-generated payloads. Pure Python +
numpy — no Spark session, so hundreds of examples run in seconds."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_tool_spark.operators.multimodal import (
    bmp_decode,
    bmp_encode_gray24,
    bmp_pixels,
    wav_decode,
)

SETTINGS = dict(max_examples=200, deadline=None)


@settings(**SETTINGS)
@given(
    data=st.binary(min_size=0, max_size=400),
    width=st.integers(min_value=1, max_value=37),
)
def test_bmp_gray24_roundtrip_exact(data, width):
    """encode(data) decodes to the exact dims, gray pixel values, and
    the exact integer pixel mean — including the empty-input, odd-width
    (row padding), and modulo-wrap paths."""
    payload = bmp_encode_gray24(data, width=width)
    eff = data if data else b"\x00"
    h = -(-len(eff) // width)
    meta = bmp_decode(payload)
    assert (meta["height"], meta["width"], meta["channels"]) == (h, width, 3)
    # exact expected mean over the wrapped gray plane
    idx = np.arange(h * width, dtype=np.int64) % len(eff)
    gray = np.frombuffer(eff, dtype=np.uint8)[idx]
    assert abs(meta["mean_pixel"] - gray.mean() / 255.0) < 1e-12
    # full pixel decode: top-down, all three channels equal the gray
    px = bmp_pixels(payload)
    assert px.shape == (h, width, 3)
    expect = gray.reshape(h, width)
    for ch in range(3):
        assert (px[:, :, ch] == expect).all()


@settings(**SETTINGS)
@given(st.binary(min_size=54, max_size=200))
def test_bmp_decode_never_misreads_garbage(blob):
    """Arbitrary bytes either raise ValueError (not BMP / unsupported)
    or — if they happen to parse — return the documented dict shape
    with sane values. No silent nonsense, no crashes other than
    ValueError."""
    try:
        meta = bmp_decode(b"BM" + blob[2:])
    except ValueError:
        return
    assert set(meta) == {
        "height", "width", "channels", "mean_pixel", "n_frames",
    }
    assert meta["height"] >= 1 and meta["width"] >= 1
    assert 0.0 <= meta["mean_pixel"] <= 1.0


def _wav_payload(bits: int, channels: int, rate: int, frames: bytes) -> bytes:
    block = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(frames))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
    )


@settings(**SETTINGS)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=300,
    ),
    channels=st.integers(min_value=1, max_value=2),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_decode_16bit_matches_numpy_reference(samples, channels, rate):
    """wav_decode's n_samples / duration / rms equal the closed-form
    numpy reference for 16-bit PCM, mono and stereo."""
    if channels == 2 and len(samples) % 2:
        samples = samples + [0]
    frames = struct.pack(f"<{len(samples)}h", *samples)
    meta = wav_decode(_wav_payload(16, channels, rate, frames))
    x = np.array(samples, dtype=np.float64) / 32768.0
    n = len(samples) // channels
    assert meta["n_channels"] == channels
    assert meta["sample_rate"] == rate
    assert meta["bits_per_sample"] == 16
    assert meta["n_samples"] == n
    assert abs(meta["duration_s"] - n / rate) < 1e-12
    assert abs(meta["rms"] - float(np.sqrt((x**2).mean()))) < 1e-12


@settings(**SETTINGS)
@given(
    samples=st.lists(
        st.integers(min_value=0, max_value=255), min_size=1, max_size=200
    )
)
def test_wav_decode_8bit_unsigned_centering(samples):
    """8-bit WAV PCM is UNSIGNED centered at 128 — the decode must
    subtract 128, never sign-interpret (an all-128 payload is silence)."""
    frames = bytes(samples)
    meta = wav_decode(_wav_payload(8, 1, 8000, frames))
    x = (np.array(samples, dtype=np.float64) - 128.0) / 128.0
    assert meta["n_samples"] == len(samples)
    assert abs(meta["rms"] - float(np.sqrt((x**2).mean()))) < 1e-12
    silence = wav_decode(_wav_payload(8, 1, 8000, bytes([128] * 16)))
    assert silence["rms"] == 0.0
