"""Real media decode through the mapInPandas plumbing: WAV (stdlib
wave) and uncompressed 24-bit BMP (struct+numpy) decode end to end on
synthesized payloads; unsupported codecs and corrupt bytes quarantine
per row instead of failing the job."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from aws_etl_dados_publicos_cnpj_spark.operators.multimodal import (
    decode_bmp,
    decode_features,
    decode_wav,
    resize_bmp,
    sample_audio_frames,
)


def make_wav(samples, rate=8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def make_bmp(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as a bottom-up 24-bit BMP."""
    h, wd, _ = px.shape
    row_size = (wd * 3 + 3) // 4 * 4
    body = bytearray()
    bgr = px[:, :, ::-1]
    for row in bgr[::-1]:
        r = row.tobytes()
        body += r + b"\x00" * (row_size - len(r))
    data_offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", data_offset + len(body), 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, wd, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + info + body)


def test_decode_wav_stats():
    out = decode_wav(make_wav([1000, -1000, 1000, -1000], rate=4000))
    assert out["n_channels"] == 1
    assert out["sample_rate"] == 4000
    assert out["n_frames"] == 4
    assert out["duration_s"] == pytest.approx(0.001)
    assert out["rms"] == pytest.approx(1000.0)
    assert out["peak"] == 1000.0


def test_decode_bmp_pixels():
    px = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    out = decode_bmp(make_bmp(px))
    assert (out["width"], out["height"]) == (2, 2)
    assert out["mean_r"] == pytest.approx((255 + 0 + 0 + 255) / 4)
    assert out["mean_g"] == pytest.approx((0 + 255 + 0 + 255) / 4)
    assert out["mean_b"] == pytest.approx((0 + 0 + 255 + 255) / 4)


def test_decode_features_mixed_media_and_quarantine(spark):
    wav = make_wav([500] * 100)
    bmp = make_bmp(np.full((3, 5, 3), 128, dtype=np.uint8))
    rows = [
        (1, bytearray(wav), "audio/wav"),
        (2, bytearray(bmp), "image/bmp"),
        (3, bytearray(b"not really media"), "image/bmp"),  # corrupt
        (4, bytearray(b"\x00" * 64), "video/mp4"),  # unsupported codec
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, mime string")
    out = {r.doc_id: r for r in decode_features(df).collect()}
    assert len(out) == 4  # quarantine, not row loss
    assert out[1].ok and out[1].kind == "audio"
    assert out[1].sample_rate == 8000 and out[1].n_frames == 100
    assert out[1].rms == pytest.approx(500.0)
    assert out[2].ok and out[2].kind == "image"
    assert (out[2].width, out[2].height) == (5, 3)
    assert out[2].mean_g == pytest.approx(128.0)
    assert not out[3].ok and "ValueError" in out[3].err
    assert not out[4].ok and "NotImplementedError" in out[4].err


def test_resize_bmp_exact_nearest_neighbor(spark):
    # 4x4 image in 4 solid 2x2 quadrants -> 2x2 thumb picks one px each
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2, :2] = [255, 0, 0]
    px[:2, 2:] = [0, 255, 0]
    px[2:, :2] = [0, 0, 255]
    px[2:, 2:] = [255, 255, 0]
    df = spark.createDataFrame(
        [(1, bytearray(make_bmp(px)))], "doc_id long, payload binary"
    )
    r = resize_bmp(df, width=2, height=2).collect()[0]
    thumb = np.frombuffer(bytes(r.thumb), dtype=np.uint8).reshape(2, 2, 3)
    assert (r.thumb_w, r.thumb_h) == (2, 2)
    assert thumb[0, 0].tolist() == [255, 0, 0]
    assert thumb[0, 1].tolist() == [0, 255, 0]
    assert thumb[1, 0].tolist() == [0, 0, 255]
    assert thumb[1, 1].tolist() == [255, 255, 0]


def test_sample_audio_frames_every_n(spark):
    wav = make_wav(list(range(10)))
    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id long, payload binary")
    out = sample_audio_frames(df, every_n=3).collect()
    assert [(r.frame_idx, r.sample) for r in sorted(out, key=lambda r: r.frame_idx)] == [
        (0, 0.0),
        (1, 3.0),
        (2, 6.0),
        (3, 9.0),
    ]
