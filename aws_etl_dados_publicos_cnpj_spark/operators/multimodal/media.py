"""The mapInPandas decode/feature layer (decode_media, decode_features,
resize/sample ops), AVI (MJPEG + audio), and the deterministic fixture
synthesizers that back the oracle contract.

Split out of the r12 single-module multimodal.py (r12 verdict item:
52% of the package in one file); behavior-identical, facade in
``__init__``. See the package docstring for decode-status honesty.
"""

from __future__ import annotations

from collections.abc import Iterator
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import io
import numpy as np
import pandas as pd
import struct
import wave
from .audio import (
    FEATURE_SCHEMA, _WAVE_EXT_GUID_SUFFIX, _au_payload, _caf_payload,
    _f80_encode, _ogg_flac_payload, _pcm16_samples, _riff_chunk,
    _wav_samples_f64, decode_8svx, decode_aiff, decode_au, decode_caf,
    decode_flac, decode_mp3, decode_ogg, decode_voc, decode_wav, encode_flac,
)
from .image import (
    _PNG_MAGIC, _bmp_pixels, _gif_frames, _jpeg_pixels, _png_chunk,
    _png_frames, decode_bmp, decode_dds, decode_gif, decode_ico, decode_jpeg,
    decode_pcx, decode_png, decode_pnm, decode_qoi, decode_ras, decode_sgi,
    decode_tga, decode_tiff, decode_xbm, encode_apng, encode_dds, encode_gif,
    encode_ico, encode_jpeg, encode_jpeg_lossless, encode_pcx, encode_png,
    encode_pnm, encode_qoi, encode_ras, encode_sgi, encode_tga, encode_tiff,
    encode_tiff_jpeg, encode_tiff_multipage,
)
from .containers import (
    _MP4_PCM_LAYOUTS, _image_pixels, _mkv_mjpeg_container, _mkv_mjpeg_frames,
    _mkv_payload, _mp4_audio_stats, _mp4_audio_track, _mp4_mjpeg_frames,
    _mp4_video_stats, _mp4_video_track, _webp_frames, decode_heif, decode_mkv,
    decode_mp4_mjpeg, decode_mp4_pcm, decode_webp, encode_webp,
    encode_webp_anim,
)

def decode_media(payload: bytes, mime: str) -> dict:
    """Decode entry point, routed by mime. WAV, uncompressed BMP,
    8-bit PNG, and baseline JPEG decode for real (stdlib + numpy);
    MP4 gets a real ISO-BMFF container walk (stats only — the sample
    layer would need ffmpeg, absent in this container, and raises)."""
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(payload)
    if mime in ("audio/aiff", "audio/x-aiff"):
        return decode_aiff(payload)
    if mime in ("audio/basic", "audio/x-au", "audio/au"):
        return decode_au(payload)
    if mime in ("audio/x-caf", "audio/caf"):
        return decode_caf(payload)
    if mime in ("audio/x-8svx", "audio/8svx"):
        return decode_8svx(payload)
    if mime in ("audio/x-voc", "audio/voc"):
        return decode_voc(payload)
    if mime in ("audio/ogg", "application/ogg", "audio/x-ogg", "audio/opus"):
        return decode_ogg(payload)
    if mime in ("audio/flac", "audio/x-flac"):
        return decode_flac(payload)
    if mime in ("audio/mpeg", "audio/mp3", "audio/x-mp3"):
        # r12: REAL Layer III / Layer I sample decode with rms/peak;
        # honest-quarantine streams degrade to header-walk triage
        return decode_mp3(payload)
    if mime in ("audio/mp4", "audio/x-m4a", "audio/m4a"):
        # Raw-PCM tracks ('twos'/'sowt') decode samples for real
        # through the stsz×stsc×stco resolution; anything else gets
        # the metadata-before-decode routing (the mp4a/AAC payload is
        # not decodable without codec libraries). One box walk serves
        # routing, stats, and sample resolution — same shape as the
        # video arm below.
        trk = _mp4_audio_track(payload)
        if trk["codec"] in _MP4_PCM_LAYOUTS or (
            trk["codec"] == "lpcm" and trk.get("lpcm_flags") is not None
        ):
            return decode_mp4_pcm(payload, trk)
        return _mp4_audio_stats(payload, trk)
    if mime in ("image/bmp", "image/x-bmp"):
        return decode_bmp(payload)
    if mime in (
        "image/x-portable-pixmap",
        "image/x-portable-graymap",
        "image/x-portable-bitmap",
        "image/x-portable-anymap",
    ):
        return decode_pnm(payload)
    if mime in ("image/x-targa", "image/x-tga", "image/targa"):
        return decode_tga(payload)
    if mime in ("image/x-cmu-raster", "image/x-sun-raster"):
        return decode_ras(payload)
    if mime in ("image/x-xbitmap", "image/x-xbm"):
        return decode_xbm(payload)
    if mime in ("image/qoi", "image/x-qoi"):
        return decode_qoi(payload)
    if mime == "image/webp":
        # VP8L decodes pixels for real; lossy VP8 gets the metadata-
        # before-decode routing (dims, no means) — the AVI/MP4 shape
        return decode_webp(payload)
    if mime in ("image/vnd-ms.dds", "image/x-dds", "image/dds"):
        return decode_dds(payload)
    if mime in ("image/x-pcx", "image/pcx", "image/vnd.zbrush.pcx"):
        return decode_pcx(payload)
    if mime in ("image/sgi", "image/x-sgi", "image/x-rgb"):
        return decode_sgi(payload)
    if mime in (
        "image/heic", "image/heif", "image/avif",
        "image/heic-sequence", "image/heif-sequence",
    ):
        # container triage (dims/codec/item count from the meta walk);
        # HEVC/AV1 pixel decode needs a codec library
        return decode_heif(payload)
    if mime in ("image/x-icon", "image/vnd.microsoft.icon", "image/ico"):
        return decode_ico(payload)
    if mime in ("image/png", "image/apng"):
        # APNG payloads report n_frames from acTL; the default image
        # carries the pixel stats (the GIF first-frame rule)
        return decode_png(payload)
    if mime == "image/gif":
        return decode_gif(payload)
    if mime in ("image/tiff", "image/tif"):
        return decode_tiff(payload)
    if mime in ("image/jpeg", "image/jpg"):
        return decode_jpeg(payload)
    if mime in (
        "video/x-matroska",
        "video/webm",
        "audio/x-matroska",
        "audio/webm",
    ):
        # PCM/FLAC audio tracks decode samples for real (delegation);
        # video tracks and transform audio codecs get container triage
        return decode_mkv(payload)
    if mime in ("video/x-msvideo", "video/avi"):
        # MJPEG decodes frames for real; other codecs (xvid, h264,
        # ...) get header-level stats — the same metadata-before-
        # decode routing as the MP4 arm below
        return decode_avi(payload)
    if mime in ("video/mp4", "video/quicktime"):
        # MJPEG samples decode for real through the sample tables +
        # the JPEG codec; any other codec gets the container-level
        # stats (full metadata, no pixel means). One box walk serves
        # routing, stats, and frame resolution.
        trk = _mp4_video_track(payload)
        if trk["codec"] == "jpeg":
            return decode_mp4_mjpeg(payload, trk)
        return _mp4_video_stats(payload, trk)
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present; "
        "extract_features uses the deterministic byte-level fallback"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Per batch (pandas DataFrame in/out — the real decode would replace
    the byte-level stats with codec output): n_bytes, first byte, and a
    mod-256 checksum. Deterministic, so the SQL oracle can verify the
    full mapInPandas plumbing."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "checksum": payloads.map(lambda b: int(sum(b)) % 256).astype("int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batches, FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "doc_id long, mime string, kind string, ok boolean, err string, "
    "width int, height int, mean_r double, mean_g double, mean_b double, "
    "n_channels int, sample_rate int, n_frames int, duration_s double, "
    "rms double, peak double, codec string"
)

_DECODE_NULLS = {
    "kind": None, "width": None, "height": None,
    "mean_r": None, "mean_g": None, "mean_b": None,
    "n_channels": None, "sample_rate": None, "n_frames": None,
    "duration_s": None, "rms": None, "peak": None, "codec": None,
}


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL media decode over (payload, mime) columns through
    Arrow-batched ``mapInPandas``: WAV → audio stats, BMP → image
    stats; undecodable payloads (bad bytes or unsupported codec) become
    quarantine rows (``ok=false`` + the error) instead of failing the
    job — one poison blob must not kill a 100 TB pass."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload, mime in zip(pdf[id_col], pdf["payload"], pdf["mime"]):
                row = {"doc_id": doc_id, "mime": mime, **_DECODE_NULLS}
                try:
                    d = decode_media(bytes(payload), mime)
                    # keep only schema keys: an extra key would add a
                    # column and fail the WHOLE Arrow batch against
                    # DECODE_SCHEMA (r10 review) — a decoder drifting
                    # must degrade to a null column, not kill the pass
                    row.update({k: v for k, v in d.items() if k in row})
                    row["ok"], row["err"] = True, None
                except Exception as exc:  # noqa: BLE001 — quarantine, don't kill
                    row["ok"], row["err"] = False, f"{type(exc).__name__}: {exc}"
                out.append(row)
            yield pd.DataFrame(out)

    return df.select(id_col, "payload", "mime").mapInPandas(_batches, DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_byte int"
AUDIO_FRAME_SCHEMA = "doc_id long, frame_idx int, sample double"


def resize_bmp(df: DataFrame, width: int = 8, height: int = 8, id_col: str = "doc_id") -> DataFrame:
    """REAL image resize for BMP payloads: nearest-neighbor downsample
    of the decoded pixel array; the thumbnail is raw RGB bytes
    (h×w×3). Binary in, binary out, partition-preserving, no shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = []
            for payload in pdf["payload"]:
                px = _image_pixels(bytes(payload))  # (h, w, 3) RGB, BMP or PNG
                ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
                xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
                thumb = px[np.ix_(ys, xs)]
                thumbs.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "thumb": thumbs,
                    "thumb_w": width,
                    "thumb_h": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batches, RESIZE_SCHEMA)


def sample_audio_frames(df: DataFrame, every_n: int = 1000, id_col: str = "doc_id") -> DataFrame:
    """REAL audio frame sampling for WAV payloads: decode, then emit
    every Nth sample as a row (1→N through mapInPandas)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    samples = _wav_samples_f64(bytes(payload))[0]
                except (ValueError, NotImplementedError):
                    continue  # quarantine: undecodable → no rows
                picked = samples[::every_n]
                ids.extend([doc_id] * len(picked))
                idxs.extend(range(len(picked)))
                vals.extend(picked)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "sample": vals})

    return df.select(id_col, "payload").mapInPandas(_batches, AUDIO_FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int = 8, height: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Thumbnail/resize stage. STUB decode: the deterministic fake
    "thumbnail" is the first width×height payload bytes (a real
    implementation calls the codec inside the same batch fn). The
    Spark-side contract — binary in, binary out, partition-preserving,
    no shuffle — is the real thing."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "thumb": pdf["payload"].map(lambda b: bytes(b[:n])),
                    "thumb_w": width,
                    "thumb_h": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 50, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling stage (video analog): emit every Nth payload byte
    as a "frame" row — a 1→N batch output through mapInPandas, the shape
    a real frame extractor uses. Deterministic, so SQL-verifiable."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for frame_idx, pos in enumerate(range(0, len(payload), every_n)):
                    ids.append(doc_id)
                    idxs.append(frame_idx)
                    vals.append(payload[pos])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_byte": vals})

    return df.select(id_col, "payload").mapInPandas(_batches, FRAME_SCHEMA)


def synthesize_wav_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", rate: int = 8000
) -> DataFrame:
    """Deterministic synthetic-media generator: each UTF-8 byte of the
    text becomes one 16-bit PCM sample. Exists so the REAL WAV decoder
    can be exercised (and SQL-oracled) against corpus-scale data in an
    environment with no media files. r11: doc_id % 6 == 5 ships the
    SAME samples under the RF64 header (EBU >4 GB WAV — 0xFFFFFFFF
    data size, real size in ds64), driver-gating the 64-bit walk
    under the unchanged n_frames/rms/peak oracle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                _rf64_payload(t.encode("utf-8"), rate)
                if int(doc_id) % 6 == 5
                else _wav_payload(t.encode("utf-8"), rate)
                for doc_id, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": "audio/wav"}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def _rf64_payload(raw: bytes, rate: int = 8000) -> bytes:
    """The SAME sample contract as ``_wav_payload`` under an RF64
    header: 'ds64' carries the real 64-bit riff/data sizes, the
    32-bit data size field holds the spec's 0xFFFFFFFF sentinel."""
    samples = np.frombuffer(raw, dtype=np.uint8).astype("<i2")
    body = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    ds64 = struct.pack("<QQQI", 0, len(body), len(samples), 0)
    out = bytearray(b"RF64" + b"\xff\xff\xff\xff" + b"WAVE")
    out += b"ds64" + struct.pack("<I", len(ds64)) + ds64
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + b"\xff\xff\xff\xff" + body
    if len(body) & 1:
        out += b"\x00"
    struct.pack_into("<Q", out, 20, len(out) - 8)  # ds64 riffSize
    return bytes(out)


def _wav_payload(raw: bytes, rate: int = 8000) -> bytes:
    """The audio fixture contract: each byte of ``raw`` becomes one
    16-bit PCM sample (value 0-255), mono."""
    samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _wave_ext_fmt(subtag: int, n_ch: int, rate: int, bits: int) -> bytes:
    """A spec-correct WAVE_FORMAT_EXTENSIBLE fmt chunk body wrapping
    ``subtag``: cbSize 22, wValidBitsPerSample = container bits, the
    trivial channel mask, KSDATAFORMAT SubFormat GUID."""
    ba = n_ch * bits // 8
    return (
        struct.pack("<HHIIHH", 0xFFFE, n_ch, rate, rate * ba, ba, bits)
        + struct.pack("<HHI", 22, bits, (1 << n_ch) - 1)
        + struct.pack("<H", subtag)
        + _WAVE_EXT_GUID_SUFFIX
    )


def _riff_wrap(fmt: bytes, body: bytes) -> bytes:
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def _float_wav_payload(raw: bytes, rate: int = 8000, double: bool = False) -> bytes:
    """The SAME decoded-sample contract as ``_wav_payload`` through
    the IEEE-float decode path (fmt tag 3): byte k ships as k/32767
    in float32 (or float64), which ``_float_wav_expand`` rounds back
    to exactly k on the int16 grid — |float32(k/32767)·32767 − k| ≤
    k·2⁻²⁴ < 2·10⁻⁵, far inside the 0.5 rounding margin. Same decoded
    values, same SQL oracles, new decode path. The float64 variant
    ships wrapped in WAVE_FORMAT_EXTENSIBLE (the modern Windows
    header), driver-gating the SubFormat GUID unwrap."""
    v = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) / 32767.0
    bits = 64 if double else 32
    body = v.astype("<f8" if double else "<f4").tobytes()
    if double:
        fmt = _wave_ext_fmt(3, 1, rate, bits)
    else:
        fmt = struct.pack(
            "<HHIIHH", 3, 1, rate, rate * (bits // 8), bits // 8, bits
        )
    return _riff_wrap(fmt, body)


def _pcm32_wav_payload(raw: bytes, rate: int = 8000) -> bytes:
    """The fixture contract through the 32-bit PCM path: byte k ships
    as int32 value k — already on the int16 grid, so the native-domain
    stats AND the exact-grid fingerprint both see the byte contract
    (a 32-bit container carrying 16-bit-grid values). Emitted as
    WAVE_FORMAT_EXTENSIBLE because the spec REQUIRES the extensible
    header for >16-bit audio — which also driver-gates the probe-side
    PCM decode (the stdlib module can't read this header)."""
    samples = np.frombuffer(raw, dtype=np.uint8).astype("<i4")
    return _riff_wrap(_wave_ext_fmt(1, 1, rate, 32), samples.tobytes())


def _aiff_payload(raw: bytes, rate: int = 8000) -> bytes:
    """The SAME sample contract as ``_wav_payload`` in a real AIFF
    container (big-endian PCM, COMM 80-bit extended-float rate) — so
    mixing containers changes the DECODE PATH, never the decoded
    values, and the SQL oracles hold unchanged."""
    samples = np.frombuffer(raw, dtype=np.uint8).astype(">i2")
    comm = b"COMM" + struct.pack(">IhIh", 18, 1, len(samples), 16) + _f80_encode(rate)
    body = struct.pack(">II", 0, 0) + samples.tobytes()
    ssnd = b"SSND" + struct.pack(">I", len(body)) + body
    if len(body) & 1:
        ssnd += b"\x00"
    form = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(form)) + form


def _aifc_payload(
    raw: bytes, rate: int = 8000, compression: bytes = b"sowt"
) -> bytes:
    """The SAME sample contract as ``_aiff_payload`` in an AIFC form:
    FVER (the spec's AIFC version timestamp), COMM extended with the
    compressionType + pstring name, SSND in the layout the type
    dictates ('sowt' little-endian PCM, 'NONE'/'twos' big-endian PCM,
    'fl32'/'fl64' big-endian floats carrying k/32767 so the int16-grid
    expansion rounds back to exactly k — the float WAV trick)."""
    if compression in (b"fl32", b"fl64"):
        v = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) / 32767.0
        samples = v.astype(">f4" if compression == b"fl32" else ">f8")
        samp_size = 32 if compression == b"fl32" else 64
    else:
        le = compression == b"sowt"
        samples = np.frombuffer(raw, dtype=np.uint8).astype(
            "<i2" if le else ">i2"
        )
        samp_size = 16
    fver = b"FVER" + struct.pack(">II", 4, 0xA2805140)
    comm = (
        b"COMM"
        + struct.pack(">IhIh", 24, 1, len(samples), samp_size)
        + _f80_encode(rate)
        + compression
        + b"\x00\x00"  # empty pstring name, even-padded
    )
    body = struct.pack(">II", 0, 0) + samples.tobytes()
    ssnd = b"SSND" + struct.pack(">I", len(body)) + body
    if len(body) & 1:
        ssnd += b"\x00"
    form = b"AIFC" + fver + comm + ssnd
    return b"FORM" + struct.pack(">I", len(form)) + form


def _m4a_payload(
    n_samples: int = 44,
    codec: bytes = b"mp4a",
    channels: int = 2,
    samp_size: int = 16,
    rate: int = 44100,
    timescale: int = 44100,
    duration: int = 88200,
    entry_bytes: int = 36,
) -> bytes:
    """Audio-only ISO-BMFF container: one 'soun' trak with an
    AudioSampleEntry — the synthesizer twin of ``_mp4_audio_track``
    (r9), shared by the unit tests and the fuzz-seed corpus.
    ``entry_bytes`` < 36 truncates the sample entry to exercise the
    short-entry degradation path."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mdhd = box(
        b"mdhd", bytes(12) + struct.pack(">II", timescale, duration) + bytes(4)
    )
    hdlr = box(b"hdlr", bytes(8) + b"soun" + bytes(12))
    entry = (
        struct.pack(">I", entry_bytes)
        + codec
        + bytes(8)  # SampleEntry reserved + data_reference_index
        + bytes(8)  # AudioSampleEntry reserved
        + struct.pack(">HHHH", channels, samp_size, 0, 0)
        + struct.pack(">I", rate << 16)
    )[:entry_bytes]
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, n_samples))
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", box(b"stbl", stsd + stsz)))
    return (
        box(b"ftyp", b"M4A " + bytes(4) + b"isomM4A ")
        + box(b"moov", box(b"trak", mdia))
        + box(b"mdat", bytes(16))
    )


def _m4a_pcm_payload(
    raw: bytes,
    rate: int = 8000,
    codec: bytes = b"sowt",
    stereo: bool = False,
    lpcm_bits: int = 24,
    lpcm_flags: int = 2 | 4,  # big-endian signed integer
) -> bytes:
    """The SAME byte→sample contract as ``_wav_payload`` in a real
    PCM-in-MP4 container: one 'soun' trak whose stsd entry is 'twos'
    (big-endian) or 'sowt' (little-endian) raw 16-bit PCM, with FULL
    sample tables — uniform stsz (one audio frame per sample), a
    multi-run stsc (two chunks of 13 frames, then chunks of 7), and
    stco offsets into the mdat — so ``_mp4_pcm_samples`` exercises
    the same stsz×stsc×stco resolution as MJPEG video. ``stereo``
    de-interleaves even/odd bytes as L/R (even lengths only), like
    the FLAC fixture arm. The wide QuickTime entries (r11): 'in24'/
    'in32' carry k directly (grid-sitting, so the fingerprint's
    int16-grid check passes and the oracles hold), 'fl32'/'fl64'
    carry k/32767 so the float expansion rounds back to exactly k —
    the float-WAV trick. 'lpcm' (r11) writes the 72-byte
    SoundDescription v2 entry; ``lpcm_bits``/``lpcm_flags`` pick the
    layout (default 24-bit big-endian signed int, carrying k)."""
    if codec not in (
        b"twos", b"sowt", b"ulaw", b"alaw", b"in24", b"in32", b"fl32",
        b"fl64", b"lpcm",
    ):
        raise ValueError(f"unsupported PCM fourcc {codec!r}")
    g711 = codec in (b"ulaw", b"alaw")
    lpcm = codec == b"lpcm"
    if lpcm and (lpcm_flags & 1) and lpcm_bits not in (32, 64):
        raise ValueError("float lpcm must be 32- or 64-bit")
    samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    n_ch = 2 if stereo and len(samples) and len(samples) % 2 == 0 else 1
    frames = len(samples) // n_ch
    width = (
        lpcm_bits // 8
        if lpcm
        else {b"in24": 3, b"in32": 4, b"fl32": 4, b"fl64": 8}.get(
            codec, 1 if g711 else 2
        )
    )
    frame_bytes = width * n_ch
    # G.711 entries store the raw codewords (decoded values come from
    # the CCITT tables, so these fixtures are unit/fuzz-gated, not
    # byte-contract-oracled like the PCM arms)
    if g711:
        pcm = bytes(raw)
    elif codec == b"in24":
        v = samples.astype(np.int64)
        b24 = np.stack([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=1)
        pcm = b24.astype(np.uint8).tobytes()
    elif codec in (b"fl32", b"fl64"):
        f = samples.astype(np.float64) / 32767.0
        pcm = f.astype(">f4" if codec == b"fl32" else ">f8").tobytes()
    elif codec == b"in32":
        pcm = samples.astype(">i4").tobytes()
    elif lpcm:
        bo = ">" if lpcm_flags & 2 else "<"
        if lpcm_flags & 1:
            f = samples.astype(np.float64) / 32767.0
            pcm = f.astype(f"{bo}f{lpcm_bits // 8}").tobytes()
        elif lpcm_bits == 24:
            v = samples.astype(np.int64)
            trip = [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
            if not lpcm_flags & 2:
                trip = trip[::-1]
            pcm = np.stack(trip, axis=1).astype(np.uint8).tobytes()
        else:
            pcm = samples.astype(f"{bo}i{lpcm_bits // 8}").tobytes()
    else:
        pcm = samples.astype(">i2" if codec == b"twos" else "<i2").tobytes()

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    chunk_sizes = []
    rem = frames
    while rem > 0:
        spc = 13 if len(chunk_sizes) < 2 else 7
        chunk_sizes.append(min(spc, rem))
        rem -= chunk_sizes[-1]
    runs = [(1, 13)] + ([(3, 7)] if len(chunk_sizes) > 2 else [])

    def moov(offsets: list[int]) -> bytes:
        mdhd = box(
            b"mdhd", bytes(12) + struct.pack(">II", rate, frames) + bytes(4)
        )
        hdlr = box(b"hdlr", bytes(8) + b"soun" + bytes(12))
        if lpcm:
            # SoundDescription v2 (always-72-byte entry): the v0
            # fields hold the spec's placeholder constants
            # (3/16/-2/0/65536) and the real layout follows
            entry = (
                struct.pack(">I", 72)
                + codec
                + bytes(6)
                + struct.pack(">H", 1)  # data_reference_index
                + struct.pack(">HHIHHhHI", 2, 0, 0, 3, 16, -2, 0, 0x00010000)
                + struct.pack(">Id", 72, float(rate))
                + struct.pack(">IIII", n_ch, 0x7F000000, lpcm_bits, lpcm_flags)
                + struct.pack(">II", frame_bytes, 1)
            )
        else:
            # wide entries declare their natural width; 16-bit PCM and
            # G.711 declare 16 (QuickTime's decoded-width convention)
            entry_bits = width * 8 if width > 2 else 16
            entry = (
                struct.pack(">I", 36)
                + codec
                + bytes(16)
                + struct.pack(">HHHH", n_ch, entry_bits, 0, 0)
                + struct.pack(">I", rate << 16)
            )
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stsz = box(b"stsz", bytes(4) + struct.pack(">II", frame_bytes, frames))
        stsc = box(
            b"stsc",
            bytes(4)
            + struct.pack(">I", len(runs))
            + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
        )
        stco = box(
            b"stco",
            bytes(4)
            + struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = box(b"stbl", stsd + stsz + stsc + stco)
        return box(b"moov", box(b"trak", box(b"mdia", mdhd + hdlr + box(b"minf", stbl))))

    ftyp = box(b"ftyp", b"M4A " + bytes(4) + b"isomM4A ")
    # stco size depends only on the chunk count, so one placeholder
    # pass fixes the layout and the second writes real offsets
    data_start = len(ftyp) + len(moov([0] * len(chunk_sizes))) + 8
    offsets, pos = [], data_start
    for cs in chunk_sizes:
        offsets.append(pos)
        pos += cs * frame_bytes
    return ftyp + moov(offsets) + box(b"mdat", pcm)


def _flac_payload(raw: bytes, rate: int = 8000, stereo: bool = False) -> bytes:
    """The SAME sample contract as ``_wav_payload`` through the real
    FLAC encoder (fixed predictors + rice) — lossless, so decoded
    values and every oracle built on them are identical.

    ``stereo`` de-interleaves the byte stream into L = even bytes,
    R = odd bytes (even-length payloads only — stereo frames need
    equal channel lengths), so the DECODED interleaved stream is
    byte-identical to the mono contract while the decode path runs
    the r9 stereo-decorrelation machinery (the encoder's four-way
    channel-assignment competition sees two genuinely different
    channel streams)."""
    samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    if stereo and len(samples) >= 2 and len(samples) % 2 == 0:
        samples = samples.reshape(-1, 2)
    return encode_flac(samples, rate)


def synthesize_mixed_audio_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", rate: int = 8000
) -> DataFrame:
    """Container-diverse audio fixture: doc_id % 3 picks RIFF WAV,
    big-endian AIFF, or FLAC (real rice+fixed-predictor compression)
    around the identical byte→sample contract, so all three decode
    paths run under one unchanged oracle gate. Mono FLAC docs at
    % 12 == 8 ship as Ogg-FLAC (r11, the Xiph mapping — native
    reassembly from pages). Half the FLAC docs
    (doc_id % 6 == 5, even byte length) encode STEREO — even/odd
    bytes as L/R — so the r9 stereo-decorrelation decode runs under
    the same gate: the decoded interleaved stream is byte-identical
    either way. Half the WAV docs (doc_id % 6 == 3) ship as
    PCM-in-MP4 instead ('twos' big-endian mono at doc_id % 24 == 3,
    'sowt' little-endian stereo at % 24 == 9/33; r11 widens the slot
    to the QuickTime wide-PCM matrix: 'in24' at % 48 == 15, 'in32' at
    % 96 == 39 and the v2 'lpcm' entry at % 96 == 87 carrying k
    directly on the int16 grid, 'fl32' at % 48 == 21 and 'fl64' at
    % 48 == 45 carrying k/32767, stereo),
    driver-gating the ISO-BMFF sample-table audio decode under the
    same oracle; classic 16-bit PCM rides inside an audio-only AVI at
    % 96 == 24 (r11, the WAV-delegation arm), a Sun/NeXT .au at
    % 96 == 48 (encoding 3 big-endian), and an Apple CAF at
    % 96 == 72 ('lpcm', to-EOF data). The
    remaining WAV docs (doc_id % 6 == 0) sub-rotate across the RIFF
    sample layouts (r10): IEEE-float WAVs at % 12 == 6 (float32, or
    float64 at % 24 == 18) carrying k/32767 so the tag-3 expansion
    rounds back to exactly k; 32-bit PCM at % 24 == 12 carrying k
    directly; classic 16-bit PCM at % 24 == 0. The AIFF docs
    sub-rotate too (r10): % 6 == 4 ships AIFC ('sowt' little-endian
    at % 12 == 4, 'NONE' big-endian at % 24 == 10, 'fl32' IEEE float
    at % 24 == 22), classic AIFF at % 6 == 1. Matroska joins in r11:
    % 24 == 19 ships the 16-bit contract as A_PCM/INT/LIT under Xiph
    lacing, % 24 == 14 the FLAC stream as A_FLAC (CodecPrivate +
    block frames reassembled natively)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                raw = t.encode("utf-8")
                kind = int(doc_id) % 3
                if kind == 1:
                    if int(doc_id) % 6 == 4:
                        if int(doc_id) % 12 == 4:
                            comp = b"sowt"
                        elif int(doc_id) % 24 == 22:
                            comp = b"fl32"
                        else:
                            comp = b"NONE"
                        payloads.append(_aifc_payload(raw, rate, comp))
                        mimes.append("audio/aiff")
                    elif int(doc_id) % 24 == 19:
                        # r11: the same 16-bit contract as
                        # A_PCM/INT/LIT inside a Matroska cluster —
                        # the EBML walk + Xiph lacing at driver scale
                        payloads.append(_mkv_payload(raw, rate, lacing="xiph"))
                        mimes.append("audio/x-matroska")
                    else:
                        payloads.append(_aiff_payload(raw, rate))
                        mimes.append("audio/aiff")
                elif kind == 2:
                    if int(doc_id) % 12 == 8:
                        # r11: the same FLAC stream inside Ogg pages
                        # (the Xiph mapping) — native reassembly runs
                        # at driver scale under the unchanged oracle
                        payloads.append(_ogg_flac_payload(raw, rate))
                        mimes.append("audio/ogg")
                    elif int(doc_id) % 24 == 14:
                        # r11: the same FLAC stream as A_FLAC-in-
                        # Matroska (CodecPrivate carries the native
                        # header — the Ogg-FLAC delegation's twin)
                        payloads.append(_mkv_payload(raw, rate, codec="flac"))
                        mimes.append("audio/x-matroska")
                    else:
                        payloads.append(
                            _flac_payload(raw, rate, stereo=int(doc_id) % 6 == 5)
                        )
                        mimes.append("audio/flac")
                elif int(doc_id) % 6 == 3:
                    d = int(doc_id)
                    if d % 24 == 15:
                        # r11 wide-PCM sub-rotation: grid-sitting ints
                        # (the in32 slot splits again for the v2
                        # 'lpcm' entry, 24-bit big-endian signed)
                        if d % 48 == 15:
                            codec = b"in24"
                        else:
                            codec = b"in32" if d % 96 == 39 else b"lpcm"
                    elif d % 24 == 21:
                        # r11: IEEE floats carrying k/32767 (stereo —
                        # the de-interleave runs under the wide entry)
                        codec = b"fl32" if d % 48 == 21 else b"fl64"
                    elif d % 12 == 3:
                        codec = b"twos"
                    else:
                        codec = b"sowt"
                    payloads.append(
                        _m4a_pcm_payload(
                            raw, rate, codec=codec, stereo=d % 12 == 9
                        )
                    )
                    mimes.append("audio/mp4")
                elif int(doc_id) % 12 == 6:
                    payloads.append(
                        _float_wav_payload(
                            raw, rate, double=int(doc_id) % 24 == 18
                        )
                    )
                    mimes.append("audio/wav")
                elif int(doc_id) % 24 == 12:
                    payloads.append(_pcm32_wav_payload(raw, rate))
                    mimes.append("audio/wav")
                elif int(doc_id) % 96 == 24:
                    # r11: classic 16-bit PCM riding inside an
                    # audio-only AVI — the strf IS a WAVEFORMATEX, so
                    # the WAV delegation decodes it under the same
                    # oracle while the movi '00wb' concat runs at
                    # driver scale
                    payloads.append(_avi_audio_container(_wav_payload(raw, rate)))
                    mimes.append("video/x-msvideo")
                elif int(doc_id) % 96 == 72:
                    # r11: the same 16-bit contract inside an Apple
                    # CAF 'lpcm' chunk (to-EOF data size)
                    payloads.append(_caf_payload(raw, rate))
                    mimes.append("audio/x-caf")
                elif int(doc_id) % 96 == 48:
                    # r11: the same 16-bit contract as a Sun/NeXT .au
                    # (encoding 3, big-endian) — third legacy container
                    payloads.append(_au_payload(raw, rate))
                    mimes.append("audio/basic")
                else:
                    payloads.append(_wav_payload(raw, rate))
                    mimes.append("audio/wav")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": mimes}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def synthesize_bmp_from_text(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic-image generator: the decoded pixel at
    row-major index k gets BGR bytes ``text_bytes[(3k + c) % n]`` —
    so the REAL 24-bit BMP encoder/decoder round-trip can be exercised
    (and SQL-oracled) with no media files in the environment. Rows are
    serialized bottom-up per the BMP spec; width 8 → 24-byte rows, no
    padding."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                _bmp_payload(t.encode("utf-8"), width, height) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": "image/bmp"}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def _fixture_bgr(raw: bytes, width: int, height: int) -> np.ndarray:
    """The image fixture contract, as stored-BGR: pixel k channel c =
    ``raw[(3k + c) % n]``."""
    n = len(raw)
    idx = np.arange(height * width * 3) % max(n, 1)
    px = (
        np.frombuffer(raw, dtype=np.uint8)[idx]
        if n
        else np.zeros(height * width * 3, dtype=np.uint8)
    )
    return px.reshape(height, width, 3)


def _bmp_payload(raw: bytes, width: int = 8, height: int = 8) -> bytes:
    bgr = _fixture_bgr(raw, width, height)
    row_size = (width * 3 + 3) // 4 * 4
    rows = np.zeros((height, row_size), dtype=np.uint8)
    rows[:, : width * 3] = np.flipud(bgr).reshape(height, width * 3)
    body = rows.tobytes()
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )


def synthesize_mixed_image_from_text(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Container-diverse image fixture: doc_id % 3 picks 24-bit BMP,
    GIF89a (LZW, local color table), or TIFF (r9: TIFF-variant LZW
    strips; half the TIFF docs — doc_id % 6 == 5 — use Deflate
    compression instead, driver-gating the zlib strip path; half the
    LZW docs — doc_id % 12 == 8 — ship PlanarConfiguration 2 (r10,
    plane-major strip tables); and half the Deflate docs — doc_id %
    12 == 11 — ship TWO pages (r11, page 1 inverted; decode reads
    page 0, driver-gating the IFD chain walk); the GIF docs
    sub-rotate TGA (r11): % 12 == 7 raw truecolor, % 24 == 22 RLE —
    and late-r11, % 24 == 16 PCX (3 RLE planes per scanline) and
    % 24 == 13 SGI RGB (RLE storage, bottom-up);
    the BMP docs sub-rotate the small-format family (r11): % 12 == 9
    binary PPM (P6), % 24 == 18 16-bit P6 (maxval 65535, v·257
    samples — the exact-round 16→8 path), % 24 == 15 QOI, ICO at
    % 48 == 12 (DIB delegation) / % 48 == 36 (PNG delegation),
    % 24 == 6 lossless JPEG (SOF3, predictor rotating through all
    seven — exactly lossless at Pt=0, so the oracle holds verbatim),
    % 24 == 3 WebP VP8L (always lossless; % 48 == 3 plain
    literals + LZ77 runs, % 48 == 27 subtract-green + rotating
    predictor transform + color cache), % 48 == 24 an
    uncompressed masked-RGB DDS surface (exact for any pixels; the
    BC1-BC3 block modes are unit-pinned on the 565 lattice), and
    % 96 == 48 a Sun Raster (r12, type cycling RT_STANDARD /
    RT_BYTE_ENCODED / RT_FORMAT_RGB — all lossless))
    carrying
    the SAME decoded-RGB pixels — pixel k =
    (raw[(3k+2)%n], raw[(3k+1)%n], raw[(3k)%n]) — so all three decode
    paths run under one unchanged text-byte oracle. 8×8 fixtures have
    ≤64 distinct colors, comfortably in-palette."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                raw = t.encode("utf-8")
                kind = int(doc_id) % 3
                if kind == 1:
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    if int(doc_id) % 12 == 7:
                        # r11: the GIF slot sub-rotates TGA — raw
                        # truecolor here, RLE at % 24 == 22; same
                        # decoded pixels, same oracle
                        payloads.append(encode_tga(rgb))
                        mimes.append("image/x-targa")
                    elif int(doc_id) % 24 == 22:
                        payloads.append(encode_tga(rgb, rle=True))
                        mimes.append("image/x-targa")
                    elif int(doc_id) % 24 == 16:
                        # r11: PCX truecolor (3 RLE planes/scanline)
                        payloads.append(encode_pcx(rgb))
                        mimes.append("image/x-pcx")
                    elif int(doc_id) % 24 == 13:
                        # r11: SGI RGB, RLE storage (bottom-up rows +
                        # per-(row,channel) offset tables)
                        payloads.append(encode_sgi(rgb))
                        mimes.append("image/sgi")
                    else:
                        payloads.append(encode_gif(rgb))
                        mimes.append("image/gif")
                elif kind == 2:
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    if int(doc_id) % 12 == 11:
                        # r11: half the Deflate docs ship TWO pages
                        # (page 1 = inverted pixels) — decode reads
                        # page 0, so the oracle holds while the IFD
                        # chain walk runs at driver scale
                        payloads.append(
                            encode_tiff_multipage(
                                [rgb, 255 - rgb], compression=8
                            )
                        )
                    else:
                        comp = 8 if int(doc_id) % 6 == 5 else 5
                        payloads.append(
                            encode_tiff(
                                rgb,
                                compression=comp,
                                # r10: half the LZW docs ship planar-2
                                # (plane-major strip tables) — same
                                # decoded pixels, same oracle
                                planar=2 if int(doc_id) % 12 == 8 else 1,
                            )
                        )
                    mimes.append("image/tiff")
                elif int(doc_id) % 12 == 9:
                    # r11: the same decoded-RGB contract as a binary
                    # PPM (P6) — netpbm joins the container rotation
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(encode_pnm(rgb))
                    mimes.append("image/x-portable-pixmap")
                elif int(doc_id) % 24 == 15:
                    # r11: QOI through the real run/index/diff/luma
                    # state machine — same pixels, same oracle
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(encode_qoi(rgb))
                    mimes.append("image/qoi")
                elif int(doc_id) % 24 == 12:
                    # r11: ICO wrapping — the DIB delegation at
                    # % 48 == 12, the PNG delegation at % 48 == 36;
                    # decode reads the largest (only) image
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(
                        encode_ico([rgb], png=int(doc_id) % 48 == 36)
                    )
                    mimes.append("image/x-icon")
                elif int(doc_id) % 24 == 18:
                    # r11: 16-bit P6 (maxval 65535, v·257 samples) —
                    # the exact-round 16→8 path at driver scale
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(encode_pnm(rgb, maxval=65535))
                    mimes.append("image/x-portable-pixmap")
                elif int(doc_id) % 24 == 6:
                    # r11: lossless JPEG (SOF3) — exactly lossless at
                    # Pt=0, so the text-byte oracle holds verbatim;
                    # the predictor rotates through all seven
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(
                        encode_jpeg_lossless(
                            rgb, predictor=(int(doc_id) // 24) % 7 + 1
                        )
                    )
                    mimes.append("image/jpeg")
                elif int(doc_id) % 48 == 24:
                    # r11: uncompressed masked-RGB DDS — exact for any
                    # pixels, driving the surface-header walk at
                    # driver scale (BC round-trips are unit-pinned on
                    # the 565 lattice)
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(encode_dds(rgb, fourcc=None))
                    mimes.append("image/x-dds")
                elif int(doc_id) % 96 == 48:
                    # r12: Sun Raster — lossless at every type, so it
                    # joins the oracle-exact rotation; the type cycles
                    # RT_STANDARD / RT_BYTE_ENCODED / RT_FORMAT_RGB so
                    # the BGR order, the RLE, and the RGB order all
                    # run at driver scale (decoder cross-gated
                    # pixel-exact on CPython's real python.ras too)
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    payloads.append(
                        encode_ras(rgb, rtype=1 + (int(doc_id) // 96) % 3)
                    )
                    mimes.append("image/x-cmu-raster")
                elif int(doc_id) % 24 == 3:
                    # r11: WebP VP8L — always lossless; half plain
                    # literals + LZ77, half subtract-green + rotating
                    # predictor transform + color cache, so the
                    # transform/cache inverses run at driver scale
                    rgb = _fixture_bgr(raw, width, height)[:, :, ::-1]
                    if int(doc_id) % 48 == 27:
                        payloads.append(
                            encode_webp(
                                rgb,
                                subtract_green=True,
                                predictor=(int(doc_id) // 48) % 14,
                                color_cache_bits=4,
                            )
                        )
                    else:
                        payloads.append(encode_webp(rgb, use_lz77=True))
                    mimes.append("image/webp")
                else:
                    payloads.append(_bmp_payload(raw, width, height))
                    mimes.append("image/bmp")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": mimes}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def synthesize_png_from_text(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic-PNG generator: the decoded pixel at
    row-major index k gets RGB bytes ``text_bytes[(3k + c) % n]`` — the
    SAME mapping as the BMP synthesizer, so the aHash oracle is shared
    verbatim. Scanline y is encoded with filter type ``y % 5``, so a
    corpus-scale decode exercises ALL five PNG filters (None, Sub, Up,
    Average, Paeth), zlib stream included — a REAL compressed-codec
    round trip with zero external libraries. Half the docs (r10,
    doc_id % 6 ∈ {1, 3, 5}) route through ``encode_png`` instead —
    adaptive filter selection, and Adam7 interlacing at % 6 == 3 —
    so the encoder twin and the interlaced decode run at driver scale
    under the same pixel contract and unchanged oracles."""
    import zlib

    _chunk = _png_chunk

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride = width * 3
        for pdf in it:
            payloads = []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                raw = t.encode("utf-8")
                n = len(raw)
                idx = np.arange(height * width * 3) % max(n, 1)
                flat = (
                    np.frombuffer(raw, dtype=np.uint8)[idx]
                    if n
                    else np.zeros(height * width * 3, dtype=np.uint8)
                )
                if int(doc_id) % 2 == 1:
                    payloads.append(
                        encode_png(
                            flat.reshape(height, width, 3),
                            interlace=int(doc_id) % 6 == 3,
                        )
                    )
                    continue
                px = flat.reshape(height, stride).astype(np.int64)
                lines = []
                prev = np.zeros(stride, dtype=np.int64)
                for y in range(height):
                    f = y % 5
                    cur = px[y]
                    filt = np.zeros(stride, dtype=np.int64)
                    for x in range(stride):
                        a = int(cur[x - 3]) if x >= 3 else 0
                        b = int(prev[x])
                        if f == 0:
                            pred = 0
                        elif f == 1:
                            pred = a
                        elif f == 2:
                            pred = b
                        elif f == 3:
                            pred = (a + b) >> 1
                        else:
                            c = int(prev[x - 3]) if x >= 3 else 0
                            p = a + b - c
                            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                            pred = (
                                a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                            )
                        filt[x] = (int(cur[x]) - pred) & 0xFF
                    lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
                    prev = cur
                ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
                idat = zlib.compress(b"".join(lines))
                payloads.append(
                    _PNG_MAGIC
                    + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", idat)
                    + _chunk(b"IEND", b"")
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": "image/png"}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def synthesize_jpeg_from_text(
    df: DataFrame,
    n_blocks: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic-JPEG generator: a 64×8 GRAYSCALE
    baseline JPEG of ``n_blocks`` constant 8×8 blocks, block b's value
    = ``text_bytes[b % n]``. A constant block has only a DC
    coefficient (8·(v−128)), and the quant table's DC divisor 8
    divides it exactly — so the LOSSY codec is exactly lossless on
    these fixtures and the aHash oracle stays a pure function of the
    text bytes, while the full huffman/DCT machinery runs for real
    (the PNG synthesizer's y%5-filter-sweep discipline, adapted to a
    transform codec). EVEN doc_ids encode baseline with restart
    interval 2 (DRI/RSTn path); ODD doc_ids encode PROGRESSIVE (SOF2
    multi-scan, successive approximation, EOB runs) — both decode to
    identical pixels on these fixtures, so ONE oracle certifies both
    entropy modes at corpus scale. r11 sub-rotates new-style
    JPEG-in-TIFF (compression 7) into the same gate: doc_id % 6 == 2
    wraps the baseline stream in a two-strip TIFF (rows doubled to 16
    — the aHash reads only row 0's first 60 pixels, so the oracle is
    untouched) and % 6 == 5 wraps progressive strips with the
    JPEGTables (347) abbreviation; block-constant strips keep the
    lossy codec exactly lossless, which is what lets a TIFF-JPEG
    page live under the unchanged text-byte oracle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                raw = t.encode("utf-8")
                n = len(raw)
                vals = (
                    np.frombuffer(raw, dtype=np.uint8)[np.arange(n_blocks) % n]
                    if n
                    else np.zeros(n_blocks, dtype=np.uint8)
                )
                px = np.tile(np.repeat(vals, 8), (8, 1)).astype(np.uint8)
                d = int(doc_id)
                if d % 6 == 2:
                    payloads.append(
                        encode_tiff_jpeg(
                            np.tile(px, (2, 1)), rows_per_strip=8,
                            restart_interval=2,
                        )
                    )
                    mimes.append("image/tiff")
                elif d % 6 == 5:
                    payloads.append(
                        encode_tiff_jpeg(
                            np.tile(px, (2, 1)), rows_per_strip=8,
                            progressive=True, shared_tables=True,
                        )
                    )
                    mimes.append("image/tiff")
                else:
                    payloads.append(
                        encode_jpeg(px, progressive=True)
                        if d % 2
                        else encode_jpeg(px, restart_interval=2)
                    )
                    mimes.append("image/jpeg")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": mimes}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


AHASH_BITS = 60


def image_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Average-hash perceptual image signature over REAL decoded pixels
    (BMP or PNG, sniffed by magic): bit k is set iff pixel k's
    brightness exceeds the image mean. Computed in EXACT integer
    arithmetic (``60·gray3_k > Σgray3`` with gray3 = r+g+b, channel-
    order independent) so no float mean sits on a threshold tie —
    engine-identical by construction. 60 bits (first 60 row-major
    pixels) keeps the signature sign-safe in a BIGINT, matching the
    SimHash convention so the same pigeonhole block join applies.
    Undecodable payloads quarantine per-payload (no row), matching
    the video_frame_hashes discipline (r9 review)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, out = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    px = _image_pixels(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue  # quarantine: unfingerprintable → no row
                gray3 = px.reshape(-1, 3).sum(axis=1).astype(np.int64)[:AHASH_BITS]
                total = int(gray3.sum())
                bits = (AHASH_BITS * gray3 > total).astype(np.int64)
                ids.append(doc_id)
                out.append(int((bits << np.arange(AHASH_BITS)).sum()))
            yield pd.DataFrame({"doc_id": ids, "ahash": out})

    return df.mapInPandas(_batches, "doc_id long, ahash long")


def image_ahash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Perceptual near-duplicate image pairs: aHash signatures joined by
    the generic pigeonhole Hamming block search (exact recall, never
    all-pairs — the image twin of SimHash text dedup)."""
    from ..dedup import hamming_block_pairs

    sigs = image_ahash(df, id_col)
    return hamming_block_pairs(sigs, AHASH_BITS, id_col, "ahash", max_hamming)


_VIDEO_MAGIC = b"VID0"
_FRAME_BYTES = 54 + 8 * 8 * 3  # one 8×8 24-bit BMP, headers included


def synthesize_video_from_text(
    df: DataFrame,
    n_frames: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic-video generator: a trivial container
    (magic + frame count + concatenated 8×8 BMP frames) where frame f's
    decoded pixel byte k is ``text_bytes[(192·f + k) % n]`` — so the
    REAL container parse + per-frame BMP decode runs at corpus scale
    with no media files."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                _vid0_payload(t.encode("utf-8"), n_frames) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": "video/x-frames"}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def _vid0_payload(raw: bytes, n_frames: int) -> bytes:
    """The VID0 fixture contract: frame f's decoded pixel byte k is
    ``raw[(192·f + k) % n]`` over 8×8 24-bit BMP frames."""
    w = h = 8
    n = max(len(raw), 1)
    src = np.frombuffer(raw, dtype=np.uint8) if len(raw) else np.zeros(1, np.uint8)
    frames = []
    for f in range(n_frames):
        idx = (192 * f + np.arange(h * w * 3)) % n
        px = src[idx].reshape(h, w, 3)
        body = np.flipud(px).reshape(h, w * 3).tobytes()
        header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0
        )
        frames.append(header + body)
    return _VIDEO_MAGIC + struct.pack("<I", n_frames) + b"".join(frames)


def _avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """JPEG frame payloads of a Motion-JPEG AVI — a REAL RIFF
    container walk (the WAV discipline applied to video): verify
    RIFF/'AVI ', find the 'movi' LIST, collect '00dc'/'00db' chunk
    data honoring RIFF's even-byte padding. Each returned frame is a
    complete baseline JPEG for ``_jpeg_pixels``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    try:
        return _avi_mjpeg_frames_impl(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt AVI container ({exc})") from exc


def _avi_mjpeg_frames_impl(payload: bytes) -> list[bytes]:
    frames: list[bytes] = []
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            sub = pos + 12
            subend = pos + 8 + cksz
            while sub + 8 <= subend:
                sid = payload[sub : sub + 4]
                (ssz,) = struct.unpack_from("<I", payload, sub + 4)
                if sid[2:4] in (b"dc", b"db"):
                    # Single-stream contract (r7 advice): only stream
                    # 00 frames form ONE ordered sequence; a second
                    # video/aux stream interleaving '01dc' chunks would
                    # corrupt frame_id order + n_frames, so quarantine
                    # instead of silently merging streams.
                    if sid[:2] != b"00":
                        raise ValueError(
                            "multi-stream AVI (stream %r) unsupported"
                            % sid[:2].decode("ascii", "replace")
                        )
                    frames.append(payload[sub + 8 : sub + 8 + ssz])
                sub += 8 + ssz + (ssz & 1)  # RIFF pads chunks to even
        pos += 8 + cksz + (cksz & 1)
    if not frames:
        raise ValueError("AVI has no video frames")
    return frames


def synthesize_avi_mjpeg_from_text(
    df: DataFrame,
    n_frames: int = 4,
    n_blocks: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic Motion-JPEG AVI generator: a real RIFF/AVI
    container (avih + strl headers, 'movi' LIST of '00dc' chunks)
    whose frames are 64×8 block-constant grayscale JPEGs — frame f
    block b = ``text_bytes[(n_blocks·f + b) % n]``, the exactly-
    lossless fixture contract of ``synthesize_jpeg_from_text`` — so a
    STANDARD video container round-trips through the real JPEG codec
    with no media libraries."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                _avi_mjpeg_container(
                    _mjpeg_frames_for_text(t.encode("utf-8"), n_frames, n_blocks)
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": "video/x-msvideo"}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def _avi_mjpeg_container(frames: list[bytes], width: int = 64, height: int = 8) -> bytes:
    """A real RIFF/AVI container (avih + strl headers, 'movi' LIST of
    '00dc' chunks) around MJPEG frames."""

    def ck(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(ltype: bytes, data: bytes) -> bytes:
        return ck(b"LIST", ltype + data)

    avih = struct.pack(
        "<14I", 100_000, 0, 0, 0, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<12I", 0, 0, 0, 1, 10, 0, len(frames), 0, 0, 0, 0, 0
    )
    strf = struct.pack(
        "<3I2H6I", 40, width, height, 1, 24, 0x47504A4D, width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", ck(b"avih", avih) + lst(b"strl", ck(b"strh", strh) + ck(b"strf", strf)))
    movi = lst(b"movi", b"".join(ck(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_audio_container(wav_payload: bytes, n_chunks: int = 3) -> bytes:
    """A real audio-only RIFF/AVI container around an existing WAV's
    fmt + data (r11): one 'auds' strl whose strf is the WAV's
    WAVEFORMATEX verbatim, data split across ``n_chunks`` '00wb' movi
    chunks — so the entire WAV codec matrix can ride inside AVI in
    tests/fixtures and ``_avi_audio_as_wav`` reassembles it exactly."""
    floc = _riff_chunk(wav_payload, b"fmt ")
    dloc = _riff_chunk(wav_payload, b"data")
    if floc is None or dloc is None:
        raise ValueError("_avi_audio_container needs a fmt+data WAV")
    fmt = wav_payload[floc[0] : floc[0] + floc[1]]
    data = wav_payload[dloc[0] : dloc[0] + dloc[1]]

    def ck(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return ck(b"LIST", ltype + body)

    (rate,) = struct.unpack_from("<I", fmt, 4)
    avih = struct.pack("<14I", 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0)
    strh = (
        b"auds"
        + bytes(4)
        + bytes(12)
        + struct.pack("<II", 1, rate)
        + struct.pack("<II", 0, len(data))
        + bytes(20)
    )
    hdrl = lst(b"hdrl", ck(b"avih", avih) + lst(b"strl", ck(b"strh", strh) + ck(b"strf", fmt)))
    step = max(1, (len(data) + n_chunks - 1) // max(n_chunks, 1))
    parts = [data[i : i + step] for i in range(0, len(data), step)] or [b""]
    movi = lst(b"movi", b"".join(ck(b"00wb", p) for p in parts))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mjpeg_frames_for_text(raw: bytes, n_frames: int, n_blocks: int = 8) -> list[bytes]:
    """The shared block-constant MJPEG fixture contract (AVI and MP4
    synthesizers): frame f is a 8×(8·n_blocks) grayscale JPEG whose
    block b is solid ``raw[(n_blocks·f + b) % n]`` — exactly lossless
    through the real JPEG codec (DC divisor 8, block-constant)."""
    n = len(raw)
    frames = []
    for f in range(n_frames):
        vals = (
            np.frombuffer(raw, dtype=np.uint8)[(n_blocks * f + np.arange(n_blocks)) % n]
            if n
            else np.zeros(n_blocks, dtype=np.uint8)
        )
        px = np.tile(np.repeat(vals, 8), (8, 1)).astype(np.uint8)
        frames.append(encode_jpeg(px))
    return frames


def _mp4_mjpeg_container(
    frames: list[bytes],
    width: int = 64,
    height: int = 8,
    samples_per_chunk: int = 0,
) -> bytes:
    """A REAL minimal ISO-BMFF container around MJPEG frames: ftyp +
    mdat(samples) + moov/trak/mdia/minf/stbl with full sample tables
    (stsd 'jpeg' entry, stts, stsc, stsz, stco). ``samples_per_chunk``
    0 puts every sample in ONE chunk; a positive value splits chunks
    to exercise the decoder's stsc run expansion."""

    def box(btype: bytes, data: bytes) -> bytes:
        return struct.pack(">I", 8 + len(data)) + btype + data

    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isommp42")
    mdat_body = b"".join(frames)
    # absolute sample offsets: ftyp + mdat header precede the samples
    base = len(ftyp) + 8
    spc = samples_per_chunk or max(len(frames), 1)
    chunk_offsets = []
    pos = base
    for i, f in enumerate(frames):
        if i % spc == 0:
            chunk_offsets.append(pos)
        pos += len(f)
    n = len(frames)
    tkhd = box(
        b"tkhd", bytes(4) + bytes(80) + struct.pack(">II", width << 16, height << 16)
    )
    mdhd = box(b"mdhd", bytes(4) + bytes(8) + struct.pack(">II", 600, 60 * n) + bytes(4))
    hdlr = box(b"hdlr", bytes(4) + bytes(4) + b"vide" + bytes(12))
    entry = struct.pack(">I", 16) + b"jpeg" + bytes(8)
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stts = box(b"stts", bytes(4) + struct.pack(">III", 1, n, 60))
    # spec-exact stsc runs: a trailing partial chunk gets its own run
    runs = [(1, min(spc, n) or 1)]
    if len(chunk_offsets) > 1 and n % spc:
        runs.append((len(chunk_offsets), n % spc))
    stsc = box(
        b"stsc",
        bytes(4)
        + struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, s, 1) for fc, s in runs),
    )
    stsz = box(
        b"stsz",
        bytes(4) + struct.pack(">II", 0, n) + struct.pack(f">{n}I", *map(len, frames)),
    )
    stco = box(
        b"stco",
        bytes(4)
        + struct.pack(">I", len(chunk_offsets))
        + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", trak)
    return ftyp + box(b"mdat", mdat_body) + moov


def synthesize_mp4_mjpeg_from_text(
    df: DataFrame,
    n_frames: int = 4,
    n_blocks: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic MJPEG-in-MP4 generator — the ISO-BMFF twin of
    ``synthesize_avi_mjpeg_from_text`` with the SAME frame contract
    (frame f block b = ``text_bytes[(n_blocks·f + b) % n]``), so a
    STANDARD MP4 container round-trips through the real sample-table
    walk + JPEG codec with no media libraries."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                _mp4_mjpeg_container(
                    _mjpeg_frames_for_text(t.encode("utf-8"), n_frames, n_blocks),
                    width=8 * n_blocks,
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": "video/mp4"}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def synthesize_mixed_video_from_text(
    df: DataFrame,
    n_frames: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Container-diverse video fixture for the driver queries: doc_id
    % 3 picks VID0 (raw BMP frames), Motion-JPEG AVI, or MJPEG MP4 —
    so ALL THREE real container walks (and the JPEG codec behind two
    of them) run under one oracle gate. r11: the AVI slot sub-rotates
    Matroska V_MJPEG at % 12 == 7 (same JPEG frames, same hashes —
    the EBML block walk at driver scale); the VID0 slot sub-rotates
    APNG at % 12 == 9 and animated WebP (VP8L ANMF frames) at
    % 12 == 6, both carrying the VID0 frame contract. One
    mapInPandas, one scan."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                raw = t.encode("utf-8")
                kind = int(doc_id) % 3
                if kind == 0:
                    if int(doc_id) % 12 == 6:
                        # r11: the VID0 frame contract as an animated
                        # WebP (full-frame VP8L ANMF updates) — the
                        # channel-sum hashes keep the oracle unchanged
                        n = max(len(raw), 1)
                        src = (
                            np.frombuffer(raw, dtype=np.uint8)
                            if raw
                            else np.zeros(1, np.uint8)
                        )
                        fr = []
                        for f in range(n_frames):
                            idx = (192 * f + np.arange(8 * 8 * 3)) % n
                            fr.append(src[idx].reshape(8, 8, 3))
                        payloads.append(encode_webp_anim(fr))
                        mimes.append("image/webp")
                    elif int(doc_id) % 12 == 9:
                        # r11: the VID0 frame contract as an APNG —
                        # frame f's RGB pixel byte k is raw[(192f+k)%n]
                        # with BMP's BGR order undone, so the frame
                        # hashes (and the oracle) are unchanged
                        n = max(len(raw), 1)
                        src = (
                            np.frombuffer(raw, dtype=np.uint8)
                            if raw
                            else np.zeros(1, np.uint8)
                        )
                        fr = []
                        for f in range(n_frames):
                            idx = (192 * f + np.arange(8 * 8 * 3)) % n
                            fr.append(src[idx].reshape(8, 8, 3)[:, :, ::-1])
                        payloads.append(encode_apng(fr))
                        mimes.append("image/apng")
                    else:
                        payloads.append(_vid0_payload(raw, n_frames))
                        mimes.append("video/x-frames")
                elif kind == 1:
                    if int(doc_id) % 12 == 7:
                        payloads.append(
                            _mkv_mjpeg_container(
                                _mjpeg_frames_for_text(raw, n_frames)
                            )
                        )
                        mimes.append("video/x-matroska")
                    else:
                        payloads.append(
                            _avi_mjpeg_container(
                                _mjpeg_frames_for_text(raw, n_frames)
                            )
                        )
                        mimes.append("video/x-msvideo")
                else:
                    payloads.append(
                        _mp4_mjpeg_container(
                            _mjpeg_frames_for_text(raw, n_frames),
                            samples_per_chunk=2,  # multi-chunk stsc on the driver path
                        )
                    )
                    mimes.append("video/mp4")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "mime": mimes}
            )

    return df.select(id_col, text_col).mapInPandas(
        _batches, "doc_id long, payload binary, mime string"
    )


def _avi_video_header(payload: bytes) -> dict:
    """Metadata of the first 'vids' stream from the hdrl headers —
    the AVI twin of ``_mp4_video_track``'s metadata-before-decode
    routing: codec fourcc (strf biCompression, falling back to the
    strh handler), dimensions, declared frame count, fps. Raises
    ValueError when the headers are missing or corrupt."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    try:
        return _avi_video_header_impl(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt AVI container ({exc})") from exc


def _avi_video_header_impl(payload: bytes) -> dict:
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    pos = 12
    hdrl = None
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"LIST" and payload[pos + 8 : pos + 12] == b"hdrl":
            hdrl = (pos + 12, min(pos + 8 + cksz, end))
            break
        pos += 8 + cksz + (cksz & 1)
    if hdrl is None:
        raise ValueError("AVI missing hdrl headers")
    pos, hend = hdrl
    while pos + 8 <= hend:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"LIST" and payload[pos + 8 : pos + 12] == b"strl":
            info = _avi_strl_video(payload, pos + 12, min(pos + 8 + cksz, hend))
            if info is not None:
                return info
        pos += 8 + cksz + (cksz & 1)
    raise ValueError("AVI has no video stream headers")


def _avi_strl_video(payload: bytes, pos: int, end: int) -> dict | None:
    """Parse one strl LIST; dict for a 'vids' stream, None otherwise
    (audio/text streams — the caller keeps scanning)."""
    strh = strf = None
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"strh":
            strh = (pos + 8, cksz)
        elif ckid == b"strf":
            strf = (pos + 8, cksz)
        pos += 8 + cksz + (cksz & 1)
    if strh is None:
        # degenerate/auxiliary strl (strn/strd only): not this walk's
        # problem — keep scanning for the real video stream (r10
        # review: raising here quarantined files the movi-only decode
        # path used to read fine)
        return None
    off, ssz = strh
    if payload[off : off + 4] != b"vids":
        return None
    if ssz < 36:
        raise ValueError("AVI strh truncated")
    codec = payload[off + 4 : off + 8]
    scale, rate = struct.unpack_from("<II", payload, off + 20)
    (length,) = struct.unpack_from("<I", payload, off + 32)
    width = height = 0
    if strf is not None and strf[1] >= 20:
        _sz, width, height = struct.unpack_from("<Iii", payload, strf[0])
        comp = payload[strf[0] + 16 : strf[0] + 20]
        if comp.strip(b"\x00"):
            codec = comp  # biCompression wins over the strh handler
    return {
        "codec": codec.decode("ascii", "replace").strip("\x00 ").lower(),
        "width": abs(int(width)),
        "height": abs(int(height)),
        "n_frames": int(length),
        "fps": rate / scale if scale else 0.0,
    }


def _avi_audio_stream(payload: bytes) -> tuple[int, bytes]:
    """(stream index, WAVEFORMATEX bytes) of the first 'auds' stream
    in the hdrl headers — the index numbers the stream's movi chunks
    ('{NN}wb'). An AVI strf for an audio stream IS a WAVEFORMATEX,
    byte-identical to a WAV fmt chunk body, which is what lets the
    audio arms delegate to the entire WAV decode matrix."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    try:
        return _avi_audio_stream_impl(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt AVI container ({exc})") from exc


def _avi_audio_stream_impl(payload: bytes) -> tuple[int, bytes]:
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    pos = 12
    hdrl = None
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"LIST" and payload[pos + 8 : pos + 12] == b"hdrl":
            hdrl = (pos + 12, min(pos + 8 + cksz, end))
            break
        pos += 8 + cksz + (cksz & 1)
    if hdrl is None:
        raise ValueError("AVI missing hdrl headers")
    pos, hend = hdrl
    idx = -1
    while pos + 8 <= hend:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"LIST" and payload[pos + 8 : pos + 12] == b"strl":
            sub, send = pos + 12, min(pos + 8 + cksz, hend)
            strh = strf = None
            while sub + 8 <= send:
                sid = payload[sub : sub + 4]
                (ssz,) = struct.unpack_from("<I", payload, sub + 4)
                if sid == b"strh":
                    strh = (sub + 8, ssz)
                elif sid == b"strf":
                    strf = (sub + 8, ssz)
                sub += 8 + ssz + (ssz & 1)
            if strh is not None:  # degenerate strls don't number streams
                idx += 1
                if payload[strh[0] : strh[0] + 4] == b"auds":
                    if strf is None or strf[1] < 16:
                        raise ValueError("AVI auds stream missing strf")
                    return idx, payload[strf[0] : strf[0] + strf[1]]
        pos += 8 + cksz + (cksz & 1)
    raise ValueError("AVI has no audio stream headers")


def _avi_audio_as_wav(payload: bytes) -> bytes:
    """RIFF/WAVE bytes rebuilt from an AVI's first audio stream: the
    strf WAVEFORMATEX becomes the fmt chunk, the stream's '{NN}wb'
    movi chunks concatenate into the data chunk — so every WAV arm
    (PCM widths, float, G.711, IMA/MS ADPCM, extensible headers) and
    its int16-grid fingerprint rule applies to AVI audio verbatim,
    one support matrix across containers (r11)."""
    idx, fmt = _avi_audio_stream(payload)
    want = b"%02dwb" % idx
    data = bytearray()
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    pos = 12
    while pos + 8 <= end:
        ckid = payload[pos : pos + 4]
        (cksz,) = struct.unpack_from("<I", payload, pos + 4)
        if ckid == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            sub, subend = pos + 12, min(pos + 8 + cksz, end)
            while sub + 8 <= subend:
                sid = payload[sub : sub + 4]
                (ssz,) = struct.unpack_from("<I", payload, sub + 4)
                if sid == want:
                    data += payload[sub + 8 : sub + 8 + ssz]
                sub += 8 + ssz + (ssz & 1)
        pos += 8 + cksz + (cksz & 1)
    if not data:
        raise ValueError("AVI has no audio data chunks")
    out = bytearray(b"RIFF\x00\x00\x00\x00WAVE")
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        out += b"\x00"
    out += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


def decode_avi_audio(payload: bytes) -> dict:
    """Audio stats of an AVI's first audio stream — ``decode_wav`` on
    the rebuilt RIFF/WAVE, so the stats contract (and every width/
    codec rule) is the WAV one."""
    return decode_wav(_avi_audio_as_wav(payload))


def decode_avi(payload: bytes) -> dict:
    """AVI entry with metadata-before-decode routing (the MP4 arm's
    shape): MJPEG streams decode frames for real; any other codec
    (xvid, h264, ...) returns the header stats — full metadata, no
    pixel means — instead of quarantining with nothing. An AVI with
    no video stream but an 'auds' stream (r11) reports AUDIO stats
    through the WAV delegation instead of quarantining."""
    try:
        trk = _avi_video_header(payload)
    except ValueError as exc:
        if "no video stream" not in str(exc):
            raise
        return decode_avi_audio(payload)
    if trk["codec"] in ("mjpg", "mjpeg", "jpeg", "dmb1"):
        return decode_avi_mjpeg(payload)
    return {
        "kind": "video",
        "codec": trk["codec"],
        "n_frames": trk["n_frames"],
        "width": trk["width"],
        "height": trk["height"],
        "duration_s": trk["n_frames"] / trk["fps"] if trk["fps"] else 0.0,
    }


def decode_avi_mjpeg(payload: bytes) -> dict:
    """Video stats via the real container+codec walk: frame count and
    first-frame dimensions + mean RGB (consistent with the image
    decode dicts; ``kind: video`` so decode_features rows type)."""
    frames = _avi_mjpeg_frames(payload)
    px = _jpeg_pixels(frames[0])
    mean_rgb = px.reshape(-1, 3).mean(axis=0) if px.size else np.zeros(3)
    return {
        "kind": "video",
        "n_frames": len(frames),
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "mean_r": float(mean_rgb[0]),
        "mean_g": float(mean_rgb[1]),
        "mean_b": float(mean_rgb[2]),
    }


def video_frame_hashes(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse the video container (REAL offset walk — VID0, Motion-JPEG
    AVI, or MJPEG-in-MP4, sniffed by magic), decode every frame (REAL
    BMP or baseline-JPEG parse), and emit one aHash row per frame —
    the 1→N frame fingerprint table video dedup joins on.

    Corrupt or codec-unsupported payloads quarantine per-payload (the
    doc simply emits no frame rows — an unfingerprintable video can't
    participate in frame-join dedup anyway) instead of killing the
    whole pass; ``decode_features`` is the surface that reports WHY a
    payload failed."""

    def _frame_pixels(buf: bytes) -> list[np.ndarray]:
        if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
            return [_jpeg_pixels(f) for f in _avi_mjpeg_frames(buf)]
        if buf[4:8] == b"ftyp":
            return [_jpeg_pixels(f) for f in _mp4_mjpeg_frames(buf)]
        if buf[:6] in (b"GIF87a", b"GIF89a"):
            # animated GIF = a video: composed playback frames (r9)
            return _gif_frames(buf)
        if buf[:4] == b"\x1a\x45\xdf\xa3":
            # Matroska V_MJPEG (r11): blocks are whole JPEG frames
            return [_jpeg_pixels(f) for f in _mkv_mjpeg_frames(buf)]
        if buf[:8] == _PNG_MAGIC:
            # APNG (r11): composed playback frames, the GIF twin
            return _png_frames(buf)
        if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
            # animated WebP (r11): ANMF playback composition
            return _webp_frames(buf)
        if buf[:4] != _VIDEO_MAGIC:
            raise ValueError("not a VID0, AVI, or MP4 container")
        (nf,) = struct.unpack_from("<I", buf, 4)
        pos = 8
        out = []
        for _ in range(nf):
            out.append(_bmp_pixels(buf[pos : pos + _FRAME_BYTES]))
            pos += _FRAME_BYTES
        return out

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fids, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    frames = _frame_pixels(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue  # quarantine: corrupt/undecodable → no rows
                for f, px in enumerate(frames):
                    gray3 = px.reshape(-1, 3).sum(axis=1).astype(np.int64)[:AHASH_BITS]
                    total = int(gray3.sum())
                    bits = (AHASH_BITS * gray3 > total).astype(np.int64)
                    ids.append(doc_id)
                    fids.append(f)
                    hashes.append(int((bits << np.arange(AHASH_BITS)).sum()))
            yield pd.DataFrame({"doc_id": ids, "frame_id": fids, "fhash": hashes})

    return df.mapInPandas(_batches, "doc_id long, frame_id int, fhash long")


def video_near_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", min_shared: int = 2
) -> DataFrame:
    """Video near-dup by frame fingerprints (the production shape:
    sample frames → perceptual hash → candidates share hashed frames):
    an equi-join on the EXACT frame hash — never pairwise video
    comparison — then a per-pair distinct-shared-hash count with a
    ``min_shared`` floor.

    The frame-hash relation is pinned (lazy localCheckpoint): the
    self-join references it twice and broadcast planning defeats
    ReusedExchange, so without the pin every video payload is decoded
    twice (r13 before-plan showed the MapInPandas decode duplicated).
    Frame hashes are a few longs per video — the pin is tiny."""
    fh = (
        video_frame_hashes(df, id_col)
        .select(id_col, "fhash")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = fh.select(F.col(id_col).alias("doc_a"), "fhash")
    b = fh.select(F.col(id_col).alias("doc_b"), "fhash")
    return (
        a.join(b, "fhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared)
    )


def audio_energy_hash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual audio signature over REAL decoded WAV samples: the
    stream splits into 60 even windows (first ``n % 60`` windows one
    sample longer) and bit k is set iff window k's energy (sum of
    squared samples — exact int64) exceeds the stream mean, compared as
    ``60·E_k > ΣE`` so no float mean sits on a tie. The audio member of
    the cross-modality dedup triad (SimHash text / aHash image / this),
    all sharing the same pigeonhole Hamming block join. Undecodable
    payloads quarantine per-payload (no row — an unfingerprintable
    doc can't join; ``decode_features`` reports why), matching the
    video_frame_hashes discipline (r9 review)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, out = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    s = _pcm16_samples(bytes(payload)).astype(np.int64)
                except (ValueError, NotImplementedError):
                    continue  # quarantine: unfingerprintable → no row
                n = len(s)
                base, extra = divmod(n, AHASH_BITS)
                energies = np.zeros(AHASH_BITS, dtype=np.int64)
                pos = 0
                for k in range(AHASH_BITS):
                    ln = base + (1 if k < extra else 0)
                    energies[k] = int((s[pos : pos + ln] ** 2).sum())
                    pos += ln
                total = int(energies.sum())
                bits = (AHASH_BITS * energies > total).astype(np.int64)
                ids.append(doc_id)
                out.append(int((bits << np.arange(AHASH_BITS)).sum()))
            yield pd.DataFrame({"doc_id": ids, "ehash": out})

    return df.mapInPandas(_batches, "doc_id long, ehash long")


def audio_near_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    from ..dedup import hamming_block_pairs

    sigs = audio_energy_hash(df, id_col)
    return hamming_block_pairs(sigs, AHASH_BITS, id_col, "ehash", max_hamming)

