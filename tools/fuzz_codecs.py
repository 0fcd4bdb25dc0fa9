"""Mutation + round-trip fuzzer for the pure-Python media codecs.

Two contracts, checked over every decoder the engine ships:

1. QUARANTINE: decoding arbitrary corrupt bytes may fail only with
   ValueError or NotImplementedError (the `decode_features` /
   `decode_media` quarantine matches exactly these) — any other
   exception type (struct.error, ZeroDivisionError, MemoryError, ...)
   would escape the poison-blob handling and kill a 100 TB pass.
   Mutations are seeded from VALID payloads (bit flips, byte edits,
   truncations, splices) so the fuzz reaches deep decode states, not
   just magic-number rejection.

2. ROUND-TRIP: encoder->decoder twins must reproduce the input exactly
   for the lossless families (PNG, GIF, FLAC, WAV/AIFF containers, and
   block-constant JPEG which the fixtures rely on being lossless).

Usage:
    python tools/fuzz_codecs.py [--seconds 60] [--seed 0]

Exits non-zero on the first contract violation, printing a repro
(format, seed, mutation ops) compact enough to paste into a test.
"""

from __future__ import annotations

import argparse
import os
import random
import signal
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_etl_dados_publicos_cnpj_spark.operators import multimodal as mm

ALLOWED = (ValueError, NotImplementedError)

# cap the bytes any single decode may RETURN: the r8 guards make
# header-driven allocations data-backed, so a fuzz input of a few KB
# returning >64 MB of pixels/samples is an amplification finding even
# when it's fast enough to beat the watchdog
MAX_RESULT_BYTES = 1 << 26


def _result_nbytes(obj) -> int:
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    if isinstance(obj, (bytes, bytearray)):
        return len(obj)
    if isinstance(obj, (list, tuple)):
        return sum(_result_nbytes(v) for v in obj)
    if isinstance(obj, dict):
        return sum(_result_nbytes(v) for v in obj.values())
    return 8


def _encode_png(px: np.ndarray) -> bytes:
    """Minimal valid 8-bit RGB PNG (filter 0 scanlines) — encoder twin
    for fuzz seeds only; the engine ships a decoder, not an encoder."""
    import struct
    import zlib

    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _seed_payloads(rng: random.Random) -> list[tuple[str, bytes]]:
    """Valid payloads per format, regenerated each call so mutations
    explore different image/audio content."""
    n = rng.randrange(1, 5)
    h, w = 8 * rng.randrange(1, 3), 8 * rng.randrange(1, 4)
    px = np.asarray(
        [rng.randrange(256) for _ in range(h * w * 3)], dtype=np.uint8
    ).reshape(h, w, 3)
    gif_px = (px // 64) * 64  # <= 64 distinct colors (palette cap is 256)
    flat = px.reshape(-1)[: 64 * n].tobytes()
    samples = np.asarray(
        [rng.randrange(-3000, 3000) for _ in range(rng.randrange(1, 800))],
        dtype=np.int16,
    )
    raw8 = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
    out = [
        ("png", _encode_png(px)),
        ("gif", mm.encode_gif(gif_px)),
        ("jpeg", mm.encode_jpeg(px)),
        ("bmp", mm._bmp_payload(raw8)),
        ("flac", mm.encode_flac(samples)),
        ("wav", mm._wav_payload(raw8)),
        ("aiff", mm._aiff_payload(raw8)),
        ("avi", mm._avi_mjpeg_container(mm._mjpeg_frames_for_text(flat or b"x", n))),
        ("mp4", mm._mp4_mjpeg_container(mm._mjpeg_frames_for_text(flat or b"x", n))),
    ]
    return out


_DECODERS = {
    "png": [mm._png_pixels, mm.decode_png, mm._image_pixels],
    "gif": [mm._gif_pixels, mm.decode_gif],
    "jpeg": [mm._jpeg_pixels, mm.decode_jpeg],
    "bmp": [mm._bmp_pixels, mm.decode_bmp, mm._image_pixels],
    "flac": [mm._flac_samples, mm.decode_flac, mm._pcm16_samples],
    "wav": [mm.decode_wav, mm._pcm16_samples],
    "aiff": [mm._aiff_samples, mm.decode_aiff, mm._pcm16_samples],
    "avi": [mm._avi_mjpeg_frames, mm.decode_avi_mjpeg],
    "mp4": [mm._mp4_video_stats, mm._mp4_mjpeg_frames, mm.decode_mp4_mjpeg],
}


def _mutate(payload: bytes, rng: random.Random) -> tuple[bytes, list[str]]:
    buf = bytearray(payload)
    ops: list[str] = []
    for _ in range(rng.randrange(1, 4)):
        kind = rng.randrange(5)
        if not buf:
            break
        if kind == 0:  # single-bit flip
            i = rng.randrange(len(buf))
            buf[i] ^= 1 << rng.randrange(8)
            ops.append(f"bitflip@{i}")
        elif kind == 1:  # byte overwrite (00/FF/random favor structure)
            i = rng.randrange(len(buf))
            buf[i] = rng.choice((0x00, 0xFF, rng.randrange(256)))
            ops.append(f"byte@{i}={buf[i]:#04x}")
        elif kind == 2:  # truncate
            i = rng.randrange(len(buf)) + 1
            del buf[i:]
            ops.append(f"trunc@{i}")
        elif kind == 3:  # 4-byte big-endian length/count smash
            i = rng.randrange(max(len(buf) - 4, 1))
            v = rng.choice((0, 1, 0x7FFFFFFF, 0xFFFFFFFF, rng.randrange(1 << 32)))
            buf[i : i + 4] = v.to_bytes(4, "big")
            ops.append(f"be32@{i}={v:#x}")
        else:  # splice a chunk from elsewhere in the same payload
            if len(buf) < 8:
                continue
            i, j = sorted(rng.randrange(len(buf)) for _ in range(2))
            k = rng.randrange(len(buf))
            buf[k : k + (j - i)] = payload[i:j]
            ops.append(f"splice[{i}:{j}]@{k}")
    return bytes(buf), ops


class _DecodeHang(Exception):
    pass


def fuzz_quarantine(seconds: float, seed: int, per_decode: float = 10.0) -> int:
    rng = random.Random(seed)
    deadline = time.monotonic() + seconds
    trials = 0
    # SIGALRM watchdog: a decode that neither returns nor raises within
    # per_decode seconds is a CPU-bomb finding, not something to wait out
    def _on_alarm(signum, frame):
        raise _DecodeHang()

    old = signal.signal(signal.SIGALRM, _on_alarm)
    try:
        while time.monotonic() < deadline:
            for fmt, good in _seed_payloads(rng):
                mutated, ops = _mutate(good, rng)
                for dec in _DECODERS[fmt]:
                    trials += 1
                    out = None
                    # the timer is disarmed in an INNER finally so a
                    # late alarm (firing between dec() returning and
                    # the disarm) surfaces as the outer _DecodeHang
                    # report, not an uncaught crash
                    signal.setitimer(signal.ITIMER_REAL, per_decode)
                    try:
                        try:
                            out = dec(mutated)
                        finally:
                            signal.setitimer(signal.ITIMER_REAL, 0)
                    except ALLOWED:
                        pass
                    except _DecodeHang:
                        print(
                            f"SLOW DECODE (>{per_decode}s) fmt={fmt} "
                            f"decoder={dec.__name__} seed={seed} ops={ops} "
                            f"payload_hex={mutated.hex()}"
                        )
                        return 1
                    except Exception:
                        print(
                            f"QUARANTINE VIOLATION fmt={fmt} decoder={dec.__name__} "
                            f"seed={seed} ops={ops} payload_hex={mutated.hex()}"
                        )
                        traceback.print_exc()
                        return 1
                    if out is not None and _result_nbytes(out) > MAX_RESULT_BYTES:
                        print(
                            f"AMPLIFICATION (> {MAX_RESULT_BYTES} bytes out of "
                            f"{len(mutated)} in) fmt={fmt} decoder={dec.__name__} "
                            f"seed={seed} ops={ops} payload_hex={mutated.hex()}"
                        )
                        return 1
    finally:
        signal.signal(signal.SIGALRM, old)
    print(f"quarantine fuzz OK: {trials} decode trials, 0 violations")
    return 0


def fuzz_round_trip(seconds: float, seed: int) -> int:
    rng = random.Random(seed ^ 0x5A5A)
    deadline = time.monotonic() + seconds
    trials = 0
    while time.monotonic() < deadline:
        trials += 1
        h, w = rng.randrange(1, 40), rng.randrange(1, 40)
        px = np.asarray(
            [rng.randrange(256) for _ in range(h * w * 3)], dtype=np.uint8
        ).reshape(h, w, 3)
        if not (mm._png_pixels(_encode_png(px)) == px).all():
            print(f"PNG round-trip MISMATCH seed={seed} h={h} w={w}")
            return 1
        small = (px[:, :, 0] % 16).astype(np.uint8)
        rgb = np.stack([small] * 3, axis=-1) * 17
        if not (mm._gif_pixels(mm.encode_gif(rgb)) == rgb).all():
            print(f"GIF round-trip MISMATCH seed={seed} h={h} w={w}")
            return 1
        samples = np.asarray(
            [rng.randrange(-32768, 32768) for _ in range(rng.randrange(1, 3000))],
            dtype=np.int16,
        )
        got, _, _ = mm._flac_samples(mm.encode_flac(samples))
        if not np.array_equal(got, samples):
            print(f"FLAC round-trip MISMATCH seed={seed} n={len(samples)}")
            return 1
    print(f"round-trip fuzz OK: {trials} encode/decode trials, 0 mismatches")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rc = fuzz_quarantine(args.seconds * 0.7, args.seed)
    if rc:
        return rc
    return fuzz_round_trip(args.seconds * 0.3, args.seed)


if __name__ == "__main__":
    sys.exit(main())
