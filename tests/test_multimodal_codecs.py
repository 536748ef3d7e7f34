"""Real-codec tests for the multimodal decode path: PNG / BMP / WAV
are synthesized in-test (stdlib only) and decoded back, so the decode
step is genuinely exercised — no stub, no external image libs."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from tabata_spark.operators.multimodal import (
    _bmp_decode,
    _png_decode,
    _wav_decode,
    audio_features,
    decode_real,
    image_features,
    probe_meta,
    sniff_mime,
)


# ----------------------------------------------------------- encoders


def make_png(img: np.ndarray, filters=None) -> bytes:
    """Minimal PNG encoder with selectable per-row filters (0-4) —
    exercises the decoder's full filter reconstruction."""
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    if filters is None:
        filters = [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        line = flat[r]
        f = filters[r]
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            a = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - a) % 256
        elif f == 2:  # Up
            enc = (line - prev) % 256
        elif f == 3:  # Average
            a = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - ((a + prev) >> 1)) % 256
        elif f == 4:  # Paeth
            a = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = (line - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP encoder."""
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r][:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        data.extend(row + b"\x00" * (row_size - len(row)))
    off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(data)


def make_wav(x: np.ndarray, sr: int = 8000) -> bytes:
    """16-bit PCM WAV encoder via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture()
def rgb():
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)


# ------------------------------------------------------------- codecs


@pytest.mark.parametrize("filters", [None, [1, 2, 3, 4] * 4])
def test_png_roundtrip_all_filters(rgb, filters):
    img = rgb[:16]
    blob = make_png(img, filters=filters[: len(img)] if filters else None)
    got = _png_decode(blob)
    np.testing.assert_array_equal(got, img)


def test_png_gray_and_rgba():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(6, 9, 1), dtype=np.uint8)
    np.testing.assert_array_equal(_png_decode(make_png(gray, [4] * 6)), gray)
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    np.testing.assert_array_equal(_png_decode(make_png(rgba, [3] * 5)), rgba)


def test_bmp_roundtrip(rgb):
    np.testing.assert_array_equal(_bmp_decode(make_bmp(rgb)), rgb)


def test_wav_roundtrip_and_features():
    sr = 8000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).reshape(-1, 1)
    blob = make_wav(tone, sr)
    sr2, x = _wav_decode(blob)
    assert sr2 == sr and x.shape == (sr, 1)
    np.testing.assert_allclose(x[:, 0], tone[:, 0], atol=1e-3)
    f = audio_features(sr2, x, dim=8)
    assert abs(f[0] - 1.0) < 1e-6  # duration 1 s
    assert abs(f[1] - 1 / np.sqrt(2)) < 1e-2  # sine RMS
    assert abs(f[3] * (sr / 2) - 440.0) < 2.0  # dominant frequency


def test_sniff_and_probe(rgb):
    png, bmp = make_png(rgb), make_bmp(rgb)
    wavb = make_wav(np.zeros((100, 2)), 16000)
    assert sniff_mime(png) == "image/png"
    assert sniff_mime(bmp) == "image/bmp"
    assert sniff_mime(wavb) == "audio/wav"
    assert probe_meta(png) == ("image/png", 17, 13, None)
    assert probe_meta(bmp) == ("image/bmp", 17, 13, None)
    assert probe_meta(wavb) == ("audio/wav", None, None, 100)


def test_decode_real_dispatch(rgb):
    fp = decode_real(make_png(rgb), dim=8)
    fb = decode_real(make_bmp(rgb), dim=8)
    assert fp == image_features(rgb, 8) == fb
    assert len(fp) == 8 and all(0 <= v <= 1 for v in fp[:3])


# ------------------------------------------------------- spark plumbing


def test_real_decode_through_spark(spark, rgb):
    from pyspark.sql import functions as F

    from tabata_spark.operators.multimodal import (
        extract_features,
        with_probed_meta,
    )

    rows = [
        (0, bytearray(make_png(rgb))),
        (1, bytearray(make_bmp(rgb))),
        (2, bytearray(make_wav(np.zeros((50, 1)) + 0.25, 8000))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary").withColumn(
        "meta", F.lit(None).cast("struct<mime:string,width:int,height:int,n_frames:int>")
    )
    probed = {r["doc_id"]: r["meta"] for r in with_probed_meta(media).collect()}
    assert probed[0]["mime"] == "image/png" and probed[0]["width"] == 17
    assert probed[2]["n_frames"] == 50
    feats = {
        r["doc_id"]: r["feat"]
        for r in extract_features(media, dim=8, use_stub=False).collect()
    }
    np.testing.assert_allclose(feats[0], image_features(rgb, 8), atol=1e-6)
    np.testing.assert_allclose(feats[0], feats[1], atol=1e-6)  # same pixels
    assert feats[2][1] == pytest.approx(0.25, abs=1e-3)  # DC RMS
