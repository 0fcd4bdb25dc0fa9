"""Container walks and the codecs that ride them: Matroska/WebM (EBML),
WebP/VP8L (+ encoder twins), MP4/ISO-BMFF (boxes, sample tables, PCM + MJPEG
arms), HEIF triage.

Split out of the r12 single-module multimodal.py (r12 verdict item:
52% of the package in one file); behavior-identical, facade in
``__init__``. See the package docstring for decode-status honesty.
"""

from __future__ import annotations

from collections.abc import Iterator
import numpy as np
import struct
from .audio import (
    _G711_ALAW,
    _G711_ULAW,
    _check_u8_pixels,
    _flac_samples,
    _pcm_width_expand,
)
from .image import (
    _IMG_MAX_PIXELS, _PNG_MAGIC, _QOI_MAGIC, _TGA_FOOTER, _alpha_over,
    _bmp_pixels, _dds_pixels, _gif_pixels, _ico_pixels, _jpeg_pixels,
    _pcx_pixels, _png_pixels, _pnm_pixels, _qoi_pixels, _ras_pixels,
    _sgi_pixels, _tga_pixels, _tiff_pixels, _xbm_pixels,
)

# --- Matroska / WebM (r11): the EBML container ----------------------
#
# From the public specs (RFC 8794 EBML + the Matroska element
# registry): variable-length element IDs/sizes, unknown-size master
# elements, and the SimpleBlock/Block frame layer with all three
# lacing modes (Xiph, EBML signed-delta, fixed). The walk is real
# end-to-end; the sample layer follows the engine's delegation
# doctrine: A_PCM tracks decode through the shared width machinery,
# A_FLAC reassembles the native fLaC stream from CodecPrivate + block
# frames and decodes through the FLAC machinery (the Ogg-FLAC
# pattern); Vorbis/Opus/AAC and all video codecs get honest
# metadata-before-decode triage.


def _ebml_vint(buf: bytes, pos: int, mask: bool) -> tuple[int, int]:
    """(value, n_bytes) of one EBML variable-length integer. IDs keep
    the length-marker bit (``mask=False``, the registry convention);
    sizes strip it."""
    if pos >= len(buf):
        raise ValueError("EBML vint truncated")
    first = buf[pos]
    if first == 0:
        raise ValueError("EBML vint longer than 8 bytes")
    length = 9 - first.bit_length()
    if pos + length > len(buf):
        raise ValueError("EBML vint truncated")
    v = first & ((1 << (8 - length)) - 1) if mask else first
    for i in range(1, length):
        v = (v << 8) | buf[pos + i]
    return v, length


def _ebml_children(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int, int]]:
    """(id, body_start, body_end) for each child element. An
    unknown-size element (all value bits set — legal for master
    elements in streamed files) extends to the end of its scope; a
    declared size overrunning the scope clamps (the RIFF truncation
    doctrine)."""
    pos = start
    while pos + 2 <= end:
        eid, n1 = _ebml_vint(buf, pos, False)
        size, n2 = _ebml_vint(buf, pos + n1, True)
        body = pos + n1 + n2
        if size == (1 << (7 * n2)) - 1:  # unknown size
            yield eid, body, end
            return
        yield eid, body, min(body + size, end)
        if body + size > end:
            return
        pos = body + size


def _ebml_uint(buf: bytes, b: int, e: int) -> int:
    v = 0
    for i in range(b, e):
        v = (v << 8) | buf[i]
    return v


def _ebml_float(buf: bytes, b: int, e: int) -> float:
    if e - b == 4:
        return struct.unpack_from(">f", buf, b)[0]
    if e - b == 8:
        return struct.unpack_from(">d", buf, b)[0]
    if e == b:
        return 0.0
    raise ValueError(f"EBML float of {e - b} bytes")


def _mkv_block_frames(buf: bytes, b: int, e: int) -> tuple[int, list[bytes]]:
    """(track_number, frames) of one SimpleBlock/Block: VINT track,
    16-bit relative timestamp, flags, then the lacing table."""
    tn, n = _ebml_vint(buf, b, True)
    pos = b + n + 3
    if pos > e:
        raise ValueError("Matroska block header truncated")
    lacing = (buf[b + n + 2] >> 1) & 3
    if lacing == 0:
        return tn, [buf[pos:e]]
    count = buf[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 2:  # fixed-size
        total = e - pos
        if count == 0 or total % count:
            raise ValueError("Matroska fixed lacing does not divide the block")
        sizes = [total // count] * count
    elif lacing == 1:  # Xiph: 255-continued sizes for all but the last
        for _ in range(count - 1):
            sz = 0
            while True:
                if pos >= e:
                    raise ValueError("Matroska Xiph lacing truncated")
                v = buf[pos]
                pos += 1
                sz += v
                if v != 255:
                    break
            sizes.append(sz)
        sizes.append(e - pos - sum(sizes))
    else:  # EBML: first size plain, then signed vint deltas
        if count == 1:
            # a 1-frame lace carries NO size fields — the whole
            # remainder is the frame (r11 review find: reading a
            # nonexistent vint here desynced single-frame laces)
            sizes = [e - pos]
        else:
            first, n1 = _ebml_vint(buf, pos, True)
            pos += n1
            sizes.append(first)
            for _ in range(count - 2):
                d, nd = _ebml_vint(buf, pos, True)
                pos += nd
                sizes.append(sizes[-1] + d - ((1 << (7 * nd - 1)) - 1))
            sizes.append(e - pos - sum(sizes))
    if any(s < 0 for s in sizes) or pos + sum(sizes) > e:
        raise ValueError("Matroska lacing sizes overrun the block")
    frames = []
    for s in sizes:
        frames.append(buf[pos : pos + s])
        pos += s
    return tn, frames


_MKV_CLUSTER = 0x1F43B675


def _mkv_collect_blocks(
    buf: bytes, b: int, e: int, blocks: dict[int, list[bytes]]
) -> None:
    """Frames of every SimpleBlock/BlockGroup under a Cluster —
    recursing into nested clusters, which is how an unknown-size
    cluster's successors parse (they land inside its scope)."""
    for cid, cb, ce in _ebml_children(buf, b, e):
        if cid == 0xA3:  # SimpleBlock
            tn, frames = _mkv_block_frames(buf, cb, ce)
            blocks.setdefault(tn, []).extend(frames)
        elif cid == 0xA0:  # BlockGroup
            for gid, gb, ge in _ebml_children(buf, cb, ce):
                if gid == 0xA1:  # Block
                    tn, frames = _mkv_block_frames(buf, gb, ge)
                    blocks.setdefault(tn, []).extend(frames)
        elif cid == _MKV_CLUSTER:
            _mkv_collect_blocks(buf, cb, ce, blocks)


def _mkv_doc(payload: bytes) -> dict:
    """Parsed Matroska/WebM document: doctype, timestamp scale,
    declared duration, track headers, and per-track block frames."""
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML stream")
    doc: dict = {
        "doctype": None,
        "timescale": 1_000_000,
        "duration": None,
        "tracks": [],
        "blocks": {},
    }
    try:
        for eid, b, e in _ebml_children(payload, 0, len(payload)):
            if eid == 0x1A45DFA3:
                for cid, cb, ce in _ebml_children(payload, b, e):
                    if cid == 0x4282:
                        doc["doctype"] = payload[cb:ce].decode(
                            "ascii", "replace"
                        ).rstrip("\x00")
            elif eid == 0x18538067:  # Segment
                for cid, cb, ce in _ebml_children(payload, b, e):
                    if cid == 0x1549A966:  # Info
                        for iid, ib, ie in _ebml_children(payload, cb, ce):
                            if iid == 0x2AD7B1:
                                doc["timescale"] = _ebml_uint(payload, ib, ie)
                            elif iid == 0x4489:
                                doc["duration"] = _ebml_float(payload, ib, ie)
                    elif cid == 0x1654AE6B:  # Tracks
                        for tid, tb, te in _ebml_children(payload, cb, ce):
                            if tid != 0xAE:
                                continue
                            trk: dict = {
                                "number": None, "type": None, "codec": None,
                                "private": b"", "width": None, "height": None,
                                "rate": 8000.0, "channels": 1, "bits": None,
                            }
                            for fid, fb, fe in _ebml_children(payload, tb, te):
                                if fid == 0xD7:
                                    trk["number"] = _ebml_uint(payload, fb, fe)
                                elif fid == 0x83:
                                    trk["type"] = _ebml_uint(payload, fb, fe)
                                elif fid == 0x86:
                                    trk["codec"] = payload[fb:fe].decode(
                                        "ascii", "replace"
                                    ).rstrip("\x00")
                                elif fid == 0x63A2:
                                    trk["private"] = payload[fb:fe]
                                elif fid == 0xE0:  # Video
                                    for vid, vb, ve in _ebml_children(
                                        payload, fb, fe
                                    ):
                                        if vid == 0xB0:
                                            trk["width"] = _ebml_uint(payload, vb, ve)
                                        elif vid == 0xBA:
                                            trk["height"] = _ebml_uint(payload, vb, ve)
                                elif fid == 0xE1:  # Audio
                                    for aid, ab, ae in _ebml_children(
                                        payload, fb, fe
                                    ):
                                        if aid == 0xB5:
                                            trk["rate"] = _ebml_float(payload, ab, ae)
                                        elif aid == 0x9F:
                                            trk["channels"] = _ebml_uint(payload, ab, ae)
                                        elif aid == 0x6264:
                                            trk["bits"] = _ebml_uint(payload, ab, ae)
                            doc["tracks"].append(trk)
                    elif cid == _MKV_CLUSTER:
                        _mkv_collect_blocks(payload, cb, ce, doc["blocks"])
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt Matroska stream ({exc})") from exc
    return doc


def _mkv_audio_samples(payload: bytes) -> tuple[np.ndarray, int, int]:
    """(samples, rate, n_channels) of the first audio track. A_PCM
    integer widths decode natively (int16 grid for 16-bit, int32 for
    24/32 — the CAF/MP4 wide-int doctrine), IEEE floats round onto
    the int16 grid (the WAV tag-3 rule), and A_FLAC decodes the
    reassembled native stream. Transform codecs quarantine."""
    doc = _mkv_doc(payload)
    audio = [t for t in doc["tracks"] if t["type"] == 2]
    if not audio:
        raise ValueError("Matroska stream has no audio track")
    trk = audio[0]
    codec = trk["codec"] or ""
    data = b"".join(doc["blocks"].get(trk["number"], []))
    rate = int(trk["rate"]) or 8000
    n_ch = trk["channels"] or 1
    if codec == "A_FLAC":
        native = bytes(trk["private"]) + data
        if native[:4] != b"fLaC":
            raise ValueError("A_FLAC CodecPrivate missing the fLaC header")
        return _flac_samples(native)
    if codec == "A_VORBIS":
        # Matroska Vorbis (r13): the three header packets ride
        # CodecPrivate in Xiph-lacing form (count byte == 2, then
        # 255-run sizes for the first two, third implicit); each block
        # frame is one audio packet. Delegates to the Ogg machinery's
        # container-agnostic core; no granule -> no tail truncation.
        from .vorbis import vorbis_samples_from_packets  # back edge

        priv = bytes(trk["private"])
        if len(priv) < 3 or priv[0] != 2:
            raise ValueError("A_VORBIS CodecPrivate must lace 3 packets")
        sizes = []
        pos = 1
        for _ in range(2):
            sz = 0
            while True:
                if pos >= len(priv):
                    raise ValueError("A_VORBIS CodecPrivate lacing truncated")
                b = priv[pos]
                pos += 1
                sz += b
                if b != 255:
                    break
            sizes.append(sz)
        p0 = priv[pos : pos + sizes[0]]
        p1 = priv[pos + sizes[0] : pos + sizes[0] + sizes[1]]
        p2 = priv[pos + sizes[0] + sizes[1] :]
        pkts = [p0, p1, p2] + list(doc["blocks"].get(trk["number"], []))
        s, vrate, vch = vorbis_samples_from_packets(pkts, -1)
        flat = s.reshape(-1)  # row-major = interleaved, like every arm
        return (
            np.clip(np.round(flat * 32768.0), -32768, 32767).astype(np.int16),
            vrate,
            vch,
        )
    if codec in ("A_PCM/INT/LIT", "A_PCM/INT/BIG"):
        bits = trk["bits"] or 16
        if bits not in (16, 24, 32):
            raise ValueError(f"unsupported Matroska PCM width {bits}")
        width = bits // 8
        usable = len(data) // (width * n_ch) * (width * n_ch)
        data = data[:usable]
        if codec.endswith("BIG"):
            data = (
                np.frombuffer(data, np.uint8)
                .reshape(-1, width)[:, ::-1]
                .reshape(-1)
                .tobytes()
            )
        samples = _pcm_width_expand(data, bits)
        dtype = np.int16 if bits == 16 else np.int32
        return samples.astype(dtype), rate, n_ch
    if codec == "A_PCM/FLOAT/IEEE":
        bits = trk["bits"] or 32
        if bits not in (32, 64):
            raise ValueError(f"unsupported Matroska float width {bits}")
        width = bits // 8
        usable = len(data) // (width * n_ch) * (width * n_ch)
        with np.errstate(invalid="ignore"):  # sNaN f4->f64 cast signals
            v = np.frombuffer(
                data[:usable], dtype="<f4" if bits == 32 else "<f8"
            ).astype(np.float64)
        # same contract as the WAV/AU float arms: NaN/inf samples are
        # corruption, not data — astype(int16) of NaN is platform-
        # defined, so without this check the reported stats would be
        # nondeterministic (r13 fuzz-campaign warning)
        if v.size and not np.isfinite(v).all():
            raise ValueError("Matroska float samples non-finite")
        return (
            np.round(np.clip(v, -1.0, 1.0) * 32767.0).astype(np.int16),
            rate,
            n_ch,
        )
    raise NotImplementedError(
        f"Matroska codec {codec!r} sample decode needs a codec library"
    )


def decode_mkv(payload: bytes) -> dict:
    """Matroska/WebM stats: video tracks get real container triage
    (dims, codec, frame count, declared duration — the AVI/MP4
    metadata-before-decode shape); PCM/FLAC audio tracks decode
    samples for REAL through the delegation arms."""
    doc = _mkv_doc(payload)
    duration_s = None
    if doc["duration"] is not None:
        duration_s = doc["duration"] * doc["timescale"] / 1e9
    video = [t for t in doc["tracks"] if t["type"] == 1]
    if video:
        trk = video[0]
        frames = doc["blocks"].get(trk["number"], [])
        out = {
            "kind": "video",
            "codec": (trk["codec"] or "").removeprefix("V_").lower() or None,
            "width": trk["width"],
            "height": trk["height"],
            "n_frames": len(frames),
        }
        if duration_s is not None:
            out["duration_s"] = duration_s
        if trk["codec"] == "V_MJPEG" and frames:
            # the frame layer decodes for real — report first-frame
            # pixel means like the AVI/MP4 MJPEG arms
            px = _jpeg_pixels(frames[0])
            mean_rgb = px.reshape(-1, 3).mean(axis=0)
            out.update(
                {
                    "width": int(px.shape[1]),
                    "height": int(px.shape[0]),
                    "mean_r": float(mean_rgb[0]),
                    "mean_g": float(mean_rgb[1]),
                    "mean_b": float(mean_rgb[2]),
                }
            )
        return out
    audio = [t for t in doc["tracks"] if t["type"] == 2]
    if not audio:
        raise ValueError("Matroska stream has no video or audio track")
    trk = audio[0]
    try:
        samples, rate, n_ch = _mkv_audio_samples(payload)
    except ValueError:
        # r13: A_VORBIS decodes for real, so its sample layer can fail
        # on headers the track entry misdescribes (e.g. missing
        # CodecPrivate) — degrade to track-metadata triage, the
        # decode_ogg rule; any OTHER codec's ValueError still means a
        # corrupt payload and propagates
        if (trk["codec"] or "") != "A_VORBIS":
            raise
        out = {
            "kind": "audio",
            "codec": "vorbis",
            "n_channels": trk["channels"],
            "sample_rate": int(trk["rate"]),
        }
        if duration_s is not None:
            out["duration_s"] = duration_s
        return out
    except NotImplementedError:
        out = {
            "kind": "audio",
            "codec": (trk["codec"] or "").removeprefix("A_").lower() or None,
            "n_channels": trk["channels"],
            "sample_rate": int(trk["rate"]),
        }
        if duration_s is not None:
            out["duration_s"] = duration_s
        return out
    sf = samples.astype(np.float64)
    n_frames = len(samples) // n_ch if n_ch else 0
    return {
        "kind": "audio",
        "codec": (trk["codec"] or "").removeprefix("A_").lower() or None,
        "n_channels": n_ch,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(sf**2))) if sf.size else 0.0,
        "peak": float(np.max(np.abs(sf))) if sf.size else 0.0,
    }


def _mkv_mjpeg_frames(payload: bytes) -> list[bytes]:
    """JPEG payloads of a V_MJPEG Matroska video track — blocks carry
    whole JPEG images, so the existing codec decodes them (the
    MJPEG-in-AVI/MP4 delegation). Other video codecs honestly
    quarantine."""
    doc = _mkv_doc(payload)
    video = [t for t in doc["tracks"] if t["type"] == 1]
    if not video:
        raise ValueError("Matroska stream has no video track")
    trk = video[0]
    if (trk["codec"] or "") != "V_MJPEG":
        raise NotImplementedError(
            f"Matroska video codec {trk['codec']!r} frame decode needs a "
            "codec library"
        )
    return doc["blocks"].get(trk["number"], [])


def _mkv_mjpeg_container(
    frames: list[bytes], width: int = 64, height: int = 8
) -> bytes:
    """Matroska V_MJPEG synthesizer — one SimpleBlock per JPEG frame
    (the _avi_mjpeg_container twin)."""
    video = _ebml_el(b"\xb0", _ebml_uint_body(width)) + _ebml_el(
        b"\xba", _ebml_uint_body(height)
    )
    track = _ebml_el(
        b"\xae",
        _ebml_el(b"\xd7", b"\x01")
        + _ebml_el(b"\x83", b"\x01")
        + _ebml_el(b"\x86", b"V_MJPEG")
        + _ebml_el(b"\xe0", video),
    )
    blocks = b"".join(
        _ebml_el(b"\xa3", b"\x81\x00\x00\x80" + f) for f in frames
    )
    cluster = _ebml_el(b"\x1f\x43\xb6\x75", _ebml_el(b"\xe7", b"\x00") + blocks)
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", _ebml_uint_body(1_000_000)),
    )
    segment = _ebml_el(
        b"\x18\x53\x80\x67",
        info + _ebml_el(b"\x16\x54\xae\x6b", track) + cluster,
    )
    header = _ebml_el(
        b"\x1a\x45\xdf\xa3", _ebml_el(b"\x42\x82", b"matroska")
    )
    return header + segment


def _ebml_size_field(n: int) -> bytes:
    """Shortest EBML size encoding of ``n``."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _ebml_el(eid: bytes, body: bytes) -> bytes:
    return eid + _ebml_size_field(len(body)) + body


def _ebml_uint_body(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def _mkv_payload(
    raw: bytes,
    rate: int = 8000,
    codec: str = "pcm",
    lacing: str = "none",
    doctype: str = "matroska",
    unknown_segment_size: bool = False,
) -> bytes:
    """Matroska synthesizer twin: the audio-fixture byte→sample
    contract (each byte one 16-bit sample) inside an EBML container.
    ``codec``: 'pcm' (A_PCM/INT/LIT), 'pcm_be', 'float'
    (A_PCM/FLOAT/IEEE carrying k/32767), or 'flac' (A_FLAC with the
    native header in CodecPrivate — the Ogg-FLAC delegation twin).
    ``lacing`` spreads the data over one block with Xiph/EBML/fixed
    lacing or over plain blocks ('none')."""
    from .media import _flac_payload  # back edge: synthesizer lives later

    samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    private = b""
    bits = 16
    if codec == "pcm":
        codec_id, data = b"A_PCM/INT/LIT", samples.tobytes()
    elif codec == "pcm_be":
        codec_id, data = b"A_PCM/INT/BIG", samples.byteswap().tobytes()
    elif codec == "float":
        codec_id = b"A_PCM/FLOAT/IEEE"
        data = (samples.astype("<f4") / 32767.0).tobytes()
        bits = 32
    elif codec == "flac":
        native = _flac_payload(raw, rate)
        private = native[: 4 + 4 + 34]
        data = native[4 + 4 + 34 :]
        codec_id = b"A_FLAC"
    else:
        raise ValueError(f"unknown synthesizer codec {codec!r}")
    audio = _ebml_el(b"\xb5", struct.pack(">f", float(rate))) + _ebml_el(
        b"\x9f", b"\x01"
    ) + _ebml_el(b"\x62\x64", bytes([bits]))
    track = _ebml_el(
        b"\xae",
        _ebml_el(b"\xd7", b"\x01")
        + _ebml_el(b"\x83", b"\x02")
        + _ebml_el(b"\x86", codec_id)
        + (_ebml_el(b"\x63\xa2", private) if private else b"")
        + _ebml_el(b"\xe1", audio),
    )
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", _ebml_uint_body(1_000_000))
        + _ebml_el(b"\x44\x89", struct.pack(">f", float(len(samples)))),
    )
    # frame split: thirds (at sample boundaries) to exercise multi-
    # frame reassembly in every lacing mode
    width = 4 if codec == "float" else 2
    step = max(width, (len(data) // 3) // width * width)
    frames = [data[i : i + step] for i in range(0, len(data), step)] or [b""]
    if codec == "flac":
        frames = [data]  # FLAC frames can't split arbitrarily
    blocks = b""
    if lacing == "none" or len(frames) == 1:
        for f in frames:
            blocks += _ebml_el(b"\xa3", b"\x81" + b"\x00\x00" + b"\x80" + f)
    elif lacing == "xiph":
        head = bytes([len(frames) - 1])
        for f in frames[:-1]:
            sz = len(f)
            head += b"\xff" * (sz // 255) + bytes([sz % 255])
        blocks = _ebml_el(
            b"\xa3", b"\x81\x00\x00" + bytes([0x80 | 0x02]) + head + b"".join(frames)
        )
    elif lacing == "ebml":
        head = bytes([len(frames) - 1]) + _ebml_size_field(len(frames[0]))
        for prev, f in zip(frames, frames[1:-1]):
            # signed delta in an EXPLICIT 2-byte vint: the bias is
            # 2^(7n-1)-1 for the emitted length n, so the length must
            # be pinned, not shortest-fit
            delta = len(f) - len(prev)
            head += ((delta + (1 << 13) - 1) | (1 << 14)).to_bytes(2, "big")
        blocks = _ebml_el(
            b"\xa3", b"\x81\x00\x00" + bytes([0x80 | 0x06]) + head + b"".join(frames)
        )
    elif lacing == "fixed":
        eq = frames[0]
        frames = [eq] * 3
        data3 = eq * 3
        blocks = _ebml_el(
            b"\xa3", b"\x81\x00\x00" + bytes([0x80 | 0x04]) + b"\x03" + data3
        )
        # fixed lacing repeats the first frame — callers wanting the
        # contract stream use the other modes
    else:
        raise ValueError(f"unknown lacing mode {lacing!r}")
    # wrap a BlockGroup around the last plain block for walk coverage
    if lacing == "none" and len(frames) > 1:
        last = frames[-1]
        blocks = b""
        for f in frames[:-1]:
            blocks += _ebml_el(b"\xa3", b"\x81\x00\x00\x80" + f)
        blocks += _ebml_el(
            b"\xa0", _ebml_el(b"\xa1", b"\x81\x00\x00\x00" + last)
        )
    cluster = _ebml_el(
        b"\x1f\x43\xb6\x75", _ebml_el(b"\xe7", b"\x00") + blocks
    )
    tracks = _ebml_el(b"\x16\x54\xae\x6b", track)
    seg_body = info + tracks + cluster
    if unknown_segment_size:
        segment = b"\x18\x53\x80\x67" + b"\xff" + seg_body
    else:
        segment = _ebml_el(b"\x18\x53\x80\x67", seg_body)
    header = _ebml_el(
        b"\x1a\x45\xdf\xa3",
        _ebml_el(b"\x42\x82", doctype.encode("ascii"))
        + _ebml_el(b"\x42\x86", b"\x01"),
    )
    return header + segment


def _mkv_vorbis_payload(samples, rate: int = 8000, **twin_kw) -> bytes:
    """Matroska A_VORBIS builder twin (r13): the SAME packets the Ogg
    Vorbis twin emits, re-wrapped — three headers Xiph-laced into
    CodecPrivate, one plain block per audio packet — so the Ogg and
    Matroska decode paths can be cross-checked for exact agreement."""
    import numpy as np

    from .audio import _ogg_packets
    from .vorbis import _vorbis_payload

    samples = np.asarray(samples, dtype=np.float64)
    packets, _, _ = _ogg_packets(_vorbis_payload(samples, rate, **twin_kw))
    private = bytearray([2])
    for pk in packets[:2]:
        sz = len(pk)
        private += b"\xff" * (sz // 255) + bytes([sz % 255])
    private += packets[0] + packets[1] + packets[2]
    n_ch = samples.shape[1] if samples.ndim == 2 else 1
    audio = (
        _ebml_el(b"\xb5", struct.pack(">f", float(rate)))
        + _ebml_el(b"\x9f", bytes([n_ch]))
    )
    track = _ebml_el(
        b"\xae",
        _ebml_el(b"\xd7", b"\x01")
        + _ebml_el(b"\x83", b"\x02")
        + _ebml_el(b"\x86", b"A_VORBIS")
        + _ebml_el(b"\x63\xa2", bytes(private))
        + _ebml_el(b"\xe1", audio),
    )
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", _ebml_uint_body(1_000_000))
        + _ebml_el(b"\x44\x89", struct.pack(">f", float(len(samples)))),
    )
    blocks = b"".join(
        _ebml_el(b"\xa3", b"\x81\x00\x00\x80" + pk) for pk in packets[3:]
    )
    cluster = _ebml_el(
        b"\x1f\x43\xb6\x75", _ebml_el(b"\xe7", b"\x00") + blocks
    )
    segment = _ebml_el(
        b"\x18\x53\x80\x67",
        info + _ebml_el(b"\x16\x54\xae\x6b", track) + cluster,
    )
    header = _ebml_el(
        b"\x1a\x45\xdf\xa3",
        _ebml_el(b"\x42\x82", b"matroska") + _ebml_el(b"\x42\x86", b"\x01"),
    )
    return header + segment


# ------------------------------------------------------------------ #
# WebP (RIFF) / VP8L lossless bitstream — r11. The web-crawl staple:  #
# the container walk is real for every chunk layout (VP8L, VP8,       #
# VP8X extended, ANIM/ANMF animation) and VP8L pixels decode for     #
# REAL from the public lossless bitstream spec (RFC 9649): canonical #
# prefix codes (simple + code-length-coded forms), meta prefix      #
# groups, color cache, LZ77 backward references with the 120-entry   #
# 2D distance map, and all four transforms inverted (predictor x14,  #
# cross-color, subtract-green, color-indexing with sub-byte packing).#
# VP8 lossy frames get honest header triage (dims from the keyframe  #
# header; pixel access needs a codec library and quarantines).       #
# ------------------------------------------------------------------ #


class _Vp8lReader:
    """LSB-first bit reader (the RIFF convention — opposite of the
    JPEG/FLAC readers above). Accumulator-based for the same hot-loop
    reason."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            self.buf |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.buf & ((1 << k) - 1)
        self.buf >>= k
        self.n -= k
        return v


class _Vp8lWriter:
    """LSB-first bit writer; prefix-code bits are emitted MSB-of-code
    first (the DEFLATE convention VP8L shares)."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, k: int, v: int) -> None:
        self.buf |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.n -= 8

    def write_code(self, n: int, code: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write(1, (code >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.n = 0
        return bytes(self.out)


# code-length-code symbol order (RFC 9649 §5.2.1.2)
_VP8L_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D offsets for the 120 short distance codes (RFC 9649 §4.4.2):
# (dx, dy) with dist = dy*xsize + dx, clamped to >= 1
_VP8L_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _vp8l_canonical(lengths: list[int]):
    """(codes, single) decode form of a canonical prefix code given
    per-symbol bit lengths (the DEFLATE assignment VP8L shares):
    codes maps (len, code) → symbol; a one-symbol code decodes with
    zero bits read and is returned via ``single``. Over- or under-
    subscribed length sets are corrupt."""
    used = [(length, s) for s, length in enumerate(lengths) if length]
    if not used:
        raise ValueError("empty VP8L prefix code")
    if len(used) == 1:
        return {}, used[0][1]
    kraft = sum(1 << (15 - length) for length, _ in used)
    if kraft != 1 << 15:
        raise ValueError("corrupt VP8L prefix code (incomplete/oversubscribed)")
    codes: dict[tuple[int, int], int] = {}
    code = 0
    for length in range(1, 16):
        for s, sym_len in enumerate(lengths):
            if sym_len == length:
                codes[(length, code)] = s
                code += 1
        code <<= 1
    return codes, None


def _vp8l_decode_sym(r: _Vp8lReader, table) -> int:
    codes, single = table
    if single is not None:
        return single
    code = 0
    for n in range(1, 16):
        code = (code << 1) | r.read(1)
        sym = codes.get((n, code))
        if sym is not None:
            return sym
    raise ValueError("invalid VP8L prefix code in stream")


def _vp8l_read_prefix_code(r: _Vp8lReader, alphabet_size: int):
    """One prefix code from the stream: the 1-or-2-symbol 'simple'
    form, or the normal form whose symbol lengths are themselves
    coded by a 19-symbol code-length code with 16/17/18 repeats."""
    if r.read(1):  # simple
        n_sym = r.read(1) + 1
        sym0 = r.read(8) if r.read(1) else r.read(1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of range")
        if n_sym == 1:
            return {}, sym0
        sym1 = r.read(8)
        if sym1 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of range")
        return {(1, 0): sym0, (1, 1): sym1}, None
    clc_lengths = [0] * 19
    num_codes = r.read(4) + 4
    for i in range(num_codes):
        clc_lengths[_VP8L_CLC_ORDER[i]] = r.read(3)
    clc = _vp8l_canonical(clc_lengths)
    lengths = [0] * alphabet_size
    if r.read(1):  # explicit cap on coded symbols
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L max_symbol exceeds the alphabet")
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        code_len = _vp8l_decode_sym(r, clc)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, value = 3 + r.read(2), prev_len
            elif code_len == 17:
                repeat, value = 3 + r.read(3), 0
            else:
                repeat, value = 11 + r.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns the alphabet")
            for _ in range(repeat):
                lengths[symbol] = value
                symbol += 1
    return _vp8l_canonical(lengths)


def _vp8l_prefix_value(r: _Vp8lReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.4.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


def _vp8l_decode_pixels(
    r: _Vp8lReader, w: int, h: int, allow_meta: bool, payload_len: int
) -> list[int]:
    """Flat row-major ARGB pixels of one VP8L image stream level
    (spatial image, entropy image, transform data, or palette)."""
    if w < 1 or h < 1:
        raise ValueError("VP8L zero-dimension image level")
    # VP8L's LZ77 + single-symbol (zero-bit) codes make amplification
    # formally unbounded, so a strict bits-per-pixel bound (the
    # JPEG/PNG rule) would reject legitimate highly-compressed
    # streams. Instead: a payload-proportional bound (2040x, the GIF
    # shape) with a 1M-pixel floor — a ~90-byte uniform-color
    # 1000x1000 stream is legitimate VP8L (r12 advice) and must not
    # read as corrupt — and a hard 4M-pixel ceiling that alone bounds
    # per-level decode output at 16 MB; a corpus of genuinely larger
    # images wants a real codec, like the PNG Paeth note.
    if w * h > max(2040 * payload_len, 1 << 20) or w * h > (1 << 22):
        raise ValueError("VP8L dimensions exceed what the stream can encode")
    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    meta_idx = None
    meta_bits = 0
    mw = 1
    n_groups = 1
    if allow_meta and r.read(1):
        meta_bits = r.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _vp8l_decode_pixels(r, mw, mh, False, payload_len)
        meta_idx = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta_idx) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _vp8l_read_prefix_code(r, 256 + 24 + cache_size),
                _vp8l_read_prefix_code(r, 256),
                _vp8l_read_prefix_code(r, 256),
                _vp8l_read_prefix_code(r, 256),
                _vp8l_read_prefix_code(r, 40),
            )
        )
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    out: list[int] = [0] * (w * h)
    npix = w * h
    pos = 0
    grp = groups[0]
    while pos < npix:
        if meta_idx is not None:
            y, x = divmod(pos, w)
            gi = meta_idx[(y >> meta_bits) * mw + (x >> meta_bits)]
            if gi >= n_groups:
                raise ValueError("VP8L meta group index out of range")
            grp = groups[gi]
        s = _vp8l_decode_sym(r, grp[0])
        if s < 256:
            red = _vp8l_decode_sym(r, grp[1])
            blue = _vp8l_decode_sym(r, grp[2])
            alpha = _vp8l_decode_sym(r, grp[3])
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
            out[pos] = px
            pos += 1
        elif s < 280:
            length = _vp8l_prefix_value(r, s - 256)
            dval = _vp8l_prefix_value(r, _vp8l_decode_sym(r, grp[4]))
            if dval > 120:
                dist = dval - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dval - 1]
                dist = max(dy * w + dx, 1)
            if dist > pos or pos + length > npix:
                raise ValueError("VP8L backward reference out of bounds")
            for _ in range(length):
                px = out[pos - dist]
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
                out[pos] = px
                pos += 1
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


def _vp8l_channels(flat: list[int], w: int, h: int) -> np.ndarray:
    """(h, w, 4) uint8 [A, R, G, B] planes from flat ARGB ints."""
    arr = np.asarray(flat, dtype=np.uint32).reshape(h, w)
    return np.stack(
        [
            (arr >> 24).astype(np.uint8),
            ((arr >> 16) & 0xFF).astype(np.uint8),
            ((arr >> 8) & 0xFF).astype(np.uint8),
            (arr & 0xFF).astype(np.uint8),
        ],
        axis=-1,
    )


def _vp8l_avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.int64) + b.astype(np.int64)) >> 1).astype(np.int64)


def _vp8l_avg2_t(a: tuple, b: tuple) -> tuple:
    return tuple((u + v) >> 1 for u, v in zip(a, b))


def _vp8l_inv_predictor(px: np.ndarray, bits: int, timg: list[int], tw: int) -> None:
    """In-place inverse of the predictor transform (RFC 9649 §4.2.2):
    residuals become pixels by adding one of 14 block-selected
    predictions mod 256 per channel. Sequential by construction —
    each prediction reads already-reconstructed neighbors (the PNG
    unfilter argument); per-payload parallel under mapInPandas, and
    the loop runs on plain-int tuples, not per-pixel numpy ops (the
    Paeth-unfilter constant-factor lesson). The top-right neighbor of
    a last-column pixel wraps, by flat-array arithmetic, to the
    CURRENT row's first pixel — the spec's behavior, kept without
    special-casing."""
    h, w = px.shape[:2]
    modes = [(int(v) >> 8) & 0xFF for v in timg]
    rows: list[list[tuple]] = [
        [tuple(int(c) for c in px[y, x]) for x in range(w)] for y in range(h)
    ]
    for y in range(h):
        cur = rows[y]
        above = rows[y - 1] if y else None
        for x in range(w):
            if y == 0 and x == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = cur[x - 1]
            elif x == 0:
                pred = above[0]
            else:
                mode = modes[(y >> bits) * tw + (x >> bits)]
                left = cur[x - 1]
                top = above[x]
                tl = above[x - 1]
                # flat-array top-right: current row's first pixel at
                # the last column, row above otherwise
                tr = cur[0] if x == w - 1 else above[x + 1]
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _vp8l_avg2_t(_vp8l_avg2_t(left, tr), top)
                elif mode == 6:
                    pred = _vp8l_avg2_t(left, tl)
                elif mode == 7:
                    pred = _vp8l_avg2_t(left, top)
                elif mode == 8:
                    pred = _vp8l_avg2_t(tl, top)
                elif mode == 9:
                    pred = _vp8l_avg2_t(top, tr)
                elif mode == 10:
                    pred = _vp8l_avg2_t(
                        _vp8l_avg2_t(left, tl), _vp8l_avg2_t(top, tr)
                    )
                elif mode == 11:
                    pt = pl = 0
                    for t_c, l_c, c_c in zip(top, left, tl):
                        est = t_c + l_c - c_c
                        pt += abs(est - t_c)
                        pl += abs(est - l_c)
                    pred = top if pt <= pl else left
                elif mode == 12:
                    pred = tuple(
                        min(255, max(0, l_c + t_c - c_c))
                        for l_c, t_c, c_c in zip(left, top, tl)
                    )
                elif mode == 13:
                    pred = []
                    for l_c, t_c, c_c in zip(left, top, tl):
                        ave = (l_c + t_c) >> 1
                        d = ave - c_c
                        # C-truncating /2 (toward zero), per the spec
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        pred.append(min(255, max(0, ave + half)))
                    pred = tuple(pred)
                else:
                    raise ValueError(f"VP8L predictor mode {mode} out of range")
            res = cur[x]
            cur[x] = (
                (res[0] + pred[0]) & 0xFF,
                (res[1] + pred[1]) & 0xFF,
                (res[2] + pred[2]) & 0xFF,
                (res[3] + pred[3]) & 0xFF,
            )
    px[:] = np.asarray(rows, dtype=np.uint8)


def _vp8l_inv_color(px: np.ndarray, bits: int, timg: list[int], tw: int) -> None:
    """In-place inverse cross-color transform: per-block int8
    multipliers green→red, green→blue, red→blue at >>5 (RFC 9649
    §4.2.3). Red reconstructs first and feeds blue — but both are
    per-pixel local, so the whole pass vectorizes."""
    h, w = px.shape[:2]
    t = np.asarray(timg, dtype=np.uint32).reshape(-1, tw)
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    blk = t[np.ix_(ys, xs)]
    g2r = ((blk & 0xFF).astype(np.int64) + 128) % 256 - 128
    g2b = (((blk >> 8) & 0xFF).astype(np.int64) + 128) % 256 - 128
    r2b = (((blk >> 16) & 0xFF).astype(np.int64) + 128) % 256 - 128
    green = ((px[:, :, 2].astype(np.int64)) + 128) % 256 - 128
    red = (px[:, :, 1].astype(np.int64) + ((g2r * green) >> 5)) & 0xFF
    red_s = (red + 128) % 256 - 128
    blue = (
        px[:, :, 3].astype(np.int64)
        + ((g2b * green) >> 5)
        + ((r2b * red_s) >> 5)
    ) & 0xFF
    px[:, :, 1] = red.astype(np.uint8)
    px[:, :, 3] = blue.astype(np.uint8)


def _vp8l_inv_palette(
    px: np.ndarray, wbits: int, palette: list[int], full_w: int
) -> np.ndarray:
    """Inverse color-indexing: unpack sub-byte indices from the green
    channel (1/2/4/8 bpp by palette size) and look up the delta-
    decoded palette. Returns the widened (h, full_w, 4) image."""
    h = px.shape[0]
    pal = np.asarray(palette, dtype=np.uint32)
    green = px[:, :, 2].astype(np.int64)
    if wbits:
        ppb = 1 << wbits
        bpp = 8 >> wbits
        xs = np.arange(full_w)
        packed = green[:, xs >> wbits]
        idx = (packed >> ((xs & (ppb - 1)) * bpp)) & ((1 << bpp) - 1)
    else:
        idx = green[:, :full_w]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("VP8L palette index out of range")
    return _vp8l_channels(pal[idx].reshape(-1).tolist(), full_w, h)


def _vp8l_decode_stream(r: _Vp8lReader, w: int, h: int, payload_len: int) -> np.ndarray:
    """(h, w, 4) uint8 ARGB planes of a top-level VP8L image stream:
    read the transform list, decode the (possibly packed) spatial
    image, then invert transforms in reverse stream order."""
    transforms = []
    seen = set()
    xsize = w
    while r.read(1):
        t = r.read(2)
        if t in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(t)
        if t in (0, 1):  # predictor / cross-color
            bits = r.read(3) + 2
            tw = -(-xsize // (1 << bits))
            th = -(-h // (1 << bits))
            timg = _vp8l_decode_pixels(r, tw, th, False, payload_len)
            transforms.append((t, bits, timg, tw))
        elif t == 2:  # subtract-green
            transforms.append((2, 0, None, 0))
        else:  # color indexing
            n_colors = r.read(8) + 1
            praw = _vp8l_decode_pixels(r, n_colors, 1, False, payload_len)
            # palette entries are component-wise delta-coded
            pal = []
            prev = 0
            for v in praw:
                cur = 0
                for sh in (0, 8, 16, 24):
                    cur |= (((v >> sh) + (prev >> sh)) & 0xFF) << sh
                pal.append(cur)
                prev = cur
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            full = xsize
            xsize = -(-xsize // (1 << wbits))
            transforms.append((3, wbits, pal, full))
    flat = _vp8l_decode_pixels(r, xsize, h, True, payload_len)
    px = _vp8l_channels(flat, xsize, h)
    for t, bits, data, extra in reversed(transforms):
        if t == 0:
            _vp8l_inv_predictor(px, bits, data, extra)
        elif t == 1:
            _vp8l_inv_color(px, bits, data, extra)
        elif t == 2:
            g = px[:, :, 2].astype(np.int64)
            px[:, :, 1] = ((px[:, :, 1] + g) & 0xFF).astype(np.uint8)
            px[:, :, 3] = ((px[:, :, 3] + g) & 0xFF).astype(np.uint8)
        else:
            px = _vp8l_inv_palette(px, bits, data, extra)
    return px


def _webp_chunks(payload: bytes) -> Iterator[tuple[bytes, int, int]]:
    """(fourcc, body_start, body_end) for each RIFF chunk of a WebP
    container; a declared size overrunning the payload clamps (the
    truncated-RIFF doctrine of the WAV walk)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    (rsize,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + rsize)
    pos = 12
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        yield cid, body, min(body + csize, end)
        pos = body + csize + (csize & 1)


def _vp8_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from a VP8 lossy keyframe header — the 3-byte
    frame tag, the 9D 01 2A start code, then 14-bit dims. Real
    metadata, honestly shallow: sample decode needs a codec library."""
    if len(data) < 10:
        raise ValueError("truncated VP8 frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe without a keyframe")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = struct.unpack_from("<H", data, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", data, 8)[0] & 0x3FFF
    if not w or not h:
        raise ValueError("zero-dimension VP8 frame")
    return w, h


def _vp8l_pixels_from_chunk(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    r = _Vp8lReader(data, 1)
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    return _vp8l_decode_stream(r, w, h, len(data))


def _webp_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB pixels of a WebP: VP8L decodes for real (alpha
    dropped, the PNG-RGBA rule); VP8 lossy quarantines as
    NotImplementedError — not a library dependency but a verification
    boundary: its entropy layer needs ~2.2 KB of arbitrary normative
    probability tables with no structural validator and no on-box
    ground truth (SCALE.md residue map). Animations decode the first
    frame's VP8L. ValueError on corrupt bytes (the uniform contract)."""
    try:
        chunks = list(_webp_chunks(payload))
        for cid, b, e in chunks:
            if cid == b"VP8L":
                px = _vp8l_pixels_from_chunk(payload[b:e])
                return px[:, :, 1:4].copy()
            if cid == b"ANMF" or cid == b"ANIM":
                continue
        for cid, b, e in chunks:
            if cid == b"ANMF":
                # 16 bytes of frame params, then the frame's chunks
                sub = payload[b + 16 : e]
                if sub[:4] == b"VP8L":
                    (ssz,) = struct.unpack_from("<I", sub, 4)
                    return _vp8l_pixels_from_chunk(sub[8 : 8 + ssz])[:, :, 1:4].copy()
                if sub[:4] == b"VP8 ":
                    raise NotImplementedError(
                        "VP8 lossy frame decode not implemented here: RFC 6386 is "
                    "public, but its entropy layer rests on ~2.2 KB of "
                    "arbitrary normative probability tables that admit no "
                    "structural validation (unlike the MP3 Kraft/PR gates) "
                    "and no on-box ground truth — see SCALE.md residue map"
                    )
        for cid, b, e in chunks:
            if cid == b"VP8 ":
                _vp8_dims(payload[b:e])  # validate before quarantining
                raise NotImplementedError(
                    "VP8 lossy frame decode not implemented here: RFC 6386 is "
                    "public, but its entropy layer rests on ~2.2 KB of "
                    "arbitrary normative probability tables that admit no "
                    "structural validation (unlike the MP3 Kraft/PR gates) "
                    "and no on-box ground truth — see SCALE.md residue map"
                )
        raise ValueError("WebP container has no VP8/VP8L image chunk")
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as exc:
        raise ValueError(f"corrupt WebP stream ({type(exc).__name__}: {exc})") from exc


def _riff_subchunks(payload: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """(fourcc, body_start, body_end) of bare RIFF chunks in a slice —
    the layout ANMF frame data uses (no RIFF/WEBP preamble)."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        yield cid, body, min(body + csize, end)
        pos = body + csize + (csize & 1)


def _webp_frames(payload: bytes) -> list[np.ndarray]:
    """Composed playback frames of an animated WebP as (h, w, 3) RGB
    — ANMF regions (even-pixel offsets stored /2, dims minus one)
    decode through the VP8L machinery with their alpha, then
    composite per the container's B (no-blend/alpha-blend) and D
    (none/background) flags on an RGBA canvas — the APNG/_gif_frames
    playback twin. A still WebP returns its single image; lossy VP8
    frames quarantine honestly."""
    chunks = list(_webp_chunks(payload))
    if not any(c[0] == b"ANMF" for c in chunks):
        return [_webp_pixels(payload)]
    for cid, b, e in chunks:
        if cid == b"VP8X" and e - b >= 10:
            cw = 1 + int.from_bytes(payload[b + 4 : b + 7], "little")
            ch = 1 + int.from_bytes(payload[b + 7 : b + 10], "little")
            break
    else:
        raise ValueError("animated WebP missing its VP8X header")
    if cw * ch > _IMG_MAX_PIXELS:
        raise ValueError(f"WebP canvas {cw}x{ch} exceeds the decode cap")
    # data-backed COMPOSED-volume bound (fuzz r12: a 796-byte mutant
    # declared a 4194328x8 canvas — inside the absolute cap, but each
    # COMPOSED playback frame is a canvas-sized copy, so a small
    # payload could amplify by ~100000x). The amplification vector is
    # frames x canvas, not the canvas alone (r12 advice: VP8L encodes
    # a large uniform canvas in far fewer bytes than 1 B / 2040 px),
    # so the budget scales by ANMF count with a floor that admits
    # legitimate tiny-payload large-canvas animations.
    n_anmf = sum(1 for c in chunks if c[0] == b"ANMF")
    if n_anmf * cw * ch > max(2040 * len(payload), 1 << 24):
        raise ValueError(
            "animated WebP composed volume exceeds what the payload can back"
        )
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    out: list[np.ndarray] = []
    for cid, b, e in chunks:
        if cid != b"ANMF":
            continue
        if len(out) >= 1024:
            raise ValueError("animated WebP exceeds the playback cap")
        if e - b < 16:
            raise ValueError("truncated ANMF frame header")
        hdr = payload[b : b + 16]
        x = 2 * int.from_bytes(hdr[0:3], "little")
        y = 2 * int.from_bytes(hdr[3:6], "little")
        w = 1 + int.from_bytes(hdr[6:9], "little")
        h = 1 + int.from_bytes(hdr[9:12], "little")
        flags = hdr[15]
        if x + w > cw or y + h > ch:
            raise ValueError("ANMF frame region outside the canvas")
        region = None
        for scid, sb, se in _riff_subchunks(payload, b + 16, e):
            if scid == b"VP8L":
                argb = _vp8l_pixels_from_chunk(payload[sb:se])
                region = argb[:, :, [1, 2, 3, 0]]  # ARGB planes → RGBA
                break
            if scid == b"VP8 ":
                raise NotImplementedError(
                    "VP8 lossy frame decode not implemented here: RFC 6386 is "
                    "public, but its entropy layer rests on ~2.2 KB of "
                    "arbitrary normative probability tables that admit no "
                    "structural validation (unlike the MP3 Kraft/PR gates) "
                    "and no on-box ground truth — see SCALE.md residue map"
                )
        if region is None:
            raise ValueError("ANMF frame without an image chunk")
        if region.shape[:2] != (h, w):
            raise ValueError("ANMF frame dims disagree with its header")
        if flags & 0x02:  # B=1: do not blend — replace
            canvas[y : y + h, x : x + w] = region
        else:  # B=0: alpha-blend over the canvas
            _alpha_over(canvas[y : y + h, x : x + w], region)
        out.append(canvas[:, :, :3].copy())
        if flags & 0x01:  # D=1: dispose to transparent black
            canvas[y : y + h, x : x + w] = 0
    if not out:
        raise ValueError("animated WebP carries no frames")
    return out


def encode_webp_anim(frames: list, duration_ms: int = 40) -> bytes:
    """Animated-WebP encoder twin: each entry is a full (h, w, 3)
    frame or an (x, y, array) region update (even offsets, B=no-blend,
    D=none — the deterministic subset the tests pin); every frame
    rides as a lossless VP8L chunk built by ``encode_webp``."""
    if not frames:
        raise ValueError("encode_webp_anim needs at least one frame")

    def _norm(f):
        if isinstance(f, tuple):
            fx, fy, arr = f
            return int(fx), int(fy), np.asarray(arr)
        return 0, 0, np.asarray(f)

    first = _norm(frames[0])[2]
    if first.ndim != 3 or first.shape[2] != 3:
        raise ValueError("encode_webp_anim frames are (h, w, 3) RGB")
    ch, cw = first.shape[:2]
    body = b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + bytes(3)
    body += (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    body += b"ANIM" + struct.pack("<I", 6) + bytes(6)
    for f in frames:
        x, y, arr = _norm(f)
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even pixels")
        h, w = arr.shape[:2]
        if x + w > cw or y + h > ch:
            raise ValueError("ANMF frame region outside the canvas")
        vp8l_chunk = encode_webp(arr)[12:]
        hdr = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + int(duration_ms).to_bytes(3, "little")
            + bytes([0x02])  # B=1 no-blend, D=0 none
        )
        anmf = hdr + vp8l_chunk
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp(payload: bytes) -> dict:
    """Container-level metadata + real VP8L pixel stats. Lossy VP8
    gets the metadata-before-decode routing (dims from the keyframe
    header, no pixel means — the AVI/MP4 codec-triage shape);
    VP8X/ANIM report canvas dims and ANMF frame count."""
    try:
        chunks = list(_webp_chunks(payload))
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt WebP container ({exc})") from exc
    kinds = [c[0] for c in chunks]
    n_frames = sum(1 for k in kinds if k == b"ANMF") or 1
    out: dict = {"kind": "image", "n_frames": n_frames}
    if b"VP8L" in kinds or any(k == b"ANMF" for k in kinds):
        try:
            px = _webp_pixels(payload)
        except NotImplementedError:
            px = None
        if px is not None:
            mean_rgb = px.reshape(-1, 3).mean(axis=0)
            out.update(
                {
                    "codec": "vp8l",
                    "width": int(px.shape[1]),
                    "height": int(px.shape[0]),
                    "mean_r": float(mean_rgb[0]),
                    "mean_g": float(mean_rgb[1]),
                    "mean_b": float(mean_rgb[2]),
                }
            )
            return out
    for cid, b, e in chunks:
        if cid == b"VP8 ":
            w, h = _vp8_dims(payload[b:e])
            out.update({"codec": "vp8", "width": w, "height": h})
            return out
        if cid == b"VP8X" and e - b >= 10:
            w = 1 + int.from_bytes(payload[b + 4 : b + 7], "little")
            h = 1 + int.from_bytes(payload[b + 7 : b + 10], "little")
            out.update({"codec": "vp8x", "width": w, "height": h})
    if "codec" in out:
        return out
    raise ValueError("WebP container has no image chunk")


def _vp8l_limited_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths (boundary package-
    merge), Kraft-complete — the decoder validates completeness, so a
    depth-capped heuristic would be rejected. Needs >= 2 symbols."""
    leaves = sorted((f, (s,)) for s, f in freqs.items())
    level: list[tuple[int, tuple]] = list(leaves)
    for _ in range(limit - 1):
        packages = [
            (
                level[i][0] + level[i + 1][0],
                level[i][1] + level[i + 1][1],
            )
            for i in range(0, len(level) - 1, 2)
        ]
        level = sorted(leaves + packages)
    counts: dict[int, int] = {s: 0 for s in freqs}
    for _, syms in level[: 2 * len(leaves) - 2]:
        for s in syms:
            counts[s] += 1
    return counts


def _vp8l_emit_prefix_code(
    wtr: _Vp8lWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix-code definition; returns {symbol: (len, code)}
    for the entropy stage. 1-2 distinct symbols use the simple form;
    otherwise lengths go through a full 19-entry code-length code
    with an explicit max_symbol cap (no repeat codes — fixture-scale
    streams don't need them and the decoder handles both)."""
    used = sorted(s for s, f in freqs.items() if f)
    if not used:
        used = [0]
    if len(used) <= 2 and used[-1] < 256:
        wtr.write(1, 1)
        wtr.write(1, len(used) - 1)
        wtr.write(1, 1)  # 8-bit first symbol
        wtr.write(8, used[0])
        if len(used) == 1:
            return {used[0]: (0, 0)}
        wtr.write(8, used[1])
        return {used[0]: (1, 0), used[1]: (1, 1)}
    lengths_map = _vp8l_limited_lengths({s: freqs[s] for s in used}, 15)
    lengths = [0] * alphabet_size
    for s, n in lengths_map.items():
        lengths[s] = n
    clc_freq: dict[int, int] = {}
    top = used[-1] + 1
    for n in lengths[:top]:
        clc_freq[n] = clc_freq.get(n, 0) + 1
    if len(clc_freq) == 1:
        # a 1-entry CLC can't be canonical-complete; pad with a dummy
        only = next(iter(clc_freq))
        clc_lengths = _vp8l_limited_lengths({only: 1, 0 if only else 1: 1}, 7)
    else:
        clc_lengths = _vp8l_limited_lengths(clc_freq, 7)
    wtr.write(1, 0)  # normal form
    wtr.write(4, 19 - 4)
    clc_full = [0] * 19
    for s, n in clc_lengths.items():
        clc_full[s] = n
    for i in range(19):
        wtr.write(3, clc_full[_VP8L_CLC_ORDER[i]])
    # explicit cap: emit exactly `top` code-length symbols
    wtr.write(1, 1)
    nbits = 2
    while (1 << nbits) - 1 < top - 2:
        nbits += 2
    if nbits > 16:
        raise ValueError("VP8L alphabet too large for max_symbol field")
    wtr.write(3, (nbits - 2) // 2)
    wtr.write(nbits, top - 2)
    clc_codes = _vp8l_codes_from_lengths(clc_full)
    for n in lengths[:top]:
        ln, code = clc_codes[n]
        wtr.write_code(ln, code)
    return _vp8l_codes_from_lengths(lengths)


def _vp8l_codes_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (len, code)} canonical assignment — the encoder-side
    mirror of ``_vp8l_canonical``."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    for length in range(1, 16):
        for s, sym_len in enumerate(lengths):
            if sym_len == length:
                out[s] = (length, code)
                code += 1
        code <<= 1
    return out


def _vp8l_forward_predict(
    a: np.ndarray, r: np.ndarray, g: np.ndarray, b: np.ndarray, mode: int
) -> tuple[np.ndarray, ...]:
    """Forward uniform-mode predictor transform (encoder side):
    residual = (pixel - prediction) mod 256, where predictions read
    ORIGINAL neighbors (reconstruction is exact, so they equal the
    decoder's). Border rules as in the inverse."""
    h, w = a.shape
    chans = np.stack([a, r, g, b], axis=-1).astype(np.int64)
    res = np.zeros_like(chans)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = chans[0, x - 1]
            elif x == 0:
                pred = chans[y - 1, 0]
            else:
                left = chans[y, x - 1]
                top = chans[y - 1, x]
                tl = chans[y - 1, x - 1]
                tr = chans[y, 0] if x == w - 1 else chans[y - 1, x + 1]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _vp8l_avg2(_vp8l_avg2(left, tr), top)
                elif mode == 6:
                    pred = _vp8l_avg2(left, tl)
                elif mode == 7:
                    pred = _vp8l_avg2(left, top)
                elif mode == 8:
                    pred = _vp8l_avg2(tl, top)
                elif mode == 9:
                    pred = _vp8l_avg2(top, tr)
                elif mode == 10:
                    pred = _vp8l_avg2(_vp8l_avg2(left, tl), _vp8l_avg2(top, tr))
                elif mode == 11:
                    est = top + left - tl
                    pred = (
                        top
                        if np.abs(est - top).sum() <= np.abs(est - left).sum()
                        else left
                    )
                elif mode == 12:
                    pred = np.clip(left + top - tl, 0, 255)
                elif mode == 13:
                    ave = _vp8l_avg2(left, top)
                    delta = ave - tl
                    pred = np.clip(
                        ave + np.sign(delta) * (np.abs(delta) // 2), 0, 255
                    )
                else:
                    raise ValueError(f"predictor mode {mode} out of range")
            res[y, x] = (chans[y, x] - pred) & 0xFF
    return res[:, :, 0], res[:, :, 1], res[:, :, 2], res[:, :, 3]


def _vp8l_emit_uniform_subimage(wtr: _Vp8lWriter, pixel: int, bits: int,
                                w: int, h: int) -> None:
    """Emit a constant transform sub-image (one block value for the
    whole image): no cache, five single-symbol simple codes — every
    'pixel' of the sub-image then costs zero entropy bits."""
    del bits, w, h  # dims are implied by the caller's header fields
    wtr.write(1, 0)  # no color cache
    for chan_sym in (
        (pixel >> 8) & 0xFF,
        (pixel >> 16) & 0xFF,
        pixel & 0xFF,
        (pixel >> 24) & 0xFF,
        0,
    ):
        wtr.write(1, 1)  # simple
        wtr.write(1, 0)  # one symbol
        wtr.write(1, 1)  # 8-bit
        wtr.write(8, chan_sym)


def _vp8l_emit_literal_image(wtr: _Vp8lWriter, argb: list[int]) -> None:
    """Emit a literal-only sub-image stream (used for the delta-coded
    palette): no cache, per-channel prefix codes, then the pixels."""
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    for v in argb:
        gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
        rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
        bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
        af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
    wtr.write(1, 0)  # no color cache
    gc = _vp8l_emit_prefix_code(wtr, gf, 280)
    rc = _vp8l_emit_prefix_code(wtr, rf, 256)
    bc = _vp8l_emit_prefix_code(wtr, bf, 256)
    ac = _vp8l_emit_prefix_code(wtr, af, 256)
    dc = _vp8l_emit_prefix_code(wtr, {}, 40)
    del dc
    for v in argb:
        wtr.write_code(*gc[(v >> 8) & 0xFF])
        wtr.write_code(*rc[(v >> 16) & 0xFF])
        wtr.write_code(*bc[v & 0xFF])
        wtr.write_code(*ac[(v >> 24) & 0xFF])


def encode_webp(
    px: np.ndarray,
    subtract_green: bool = False,
    use_lz77: bool = False,
    predictor: int | None = None,
    cross_color: tuple[int, int, int] | None = None,
    color_cache_bits: int = 0,
    palette: bool = False,
) -> bytes:
    """VP8L lossless encoder — the test/synthesizer twin of
    ``_webp_pixels`` (the encode_png/encode_jpeg_lossless
    discipline). Literal pixels under per-channel canonical prefix
    codes (package-merge length-limited, Kraft-complete), plus
    optional coverage of every decoder path: subtract-green;
    uniform-mode predictor transform (one block value, modes 0-13);
    uniform cross-color multipliers (g2r, g2b, r2b as int8); a real
    color cache (pixels found in the running cache emit cache
    symbols); color-indexing (palette) with sub-byte packed indices;
    and LZ77 run coding of repeated pixels (distance 1 through the
    2D map). Grayscale (h,w) or RGB (h,w,3); always lossless."""
    px = np.asarray(px)
    if not (px.ndim == 2 or (px.ndim == 3 and px.shape[2] == 3)):
        raise ValueError(f"encode_webp takes (h,w) or (h,w,3), got {px.shape}")
    if px.size == 0:
        raise ValueError("encode_webp: empty image")
    _check_u8_pixels(px, "encode_webp")
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    if w > (1 << 14) or h > (1 << 14):
        raise ValueError("VP8L dimensions exceed 14 bits")
    if palette and (subtract_green or predictor is not None or cross_color):
        raise ValueError("palette composes with cache/lz77 only")
    if not 0 <= color_cache_bits <= 11:
        raise ValueError("color_cache_bits out of range")
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    a = np.full_like(g, 255)
    pal_list: list[int] = []
    pal_wbits = 0
    full_w = w
    if palette:
        argb_img = (a << 24) | (r << 16) | (g << 8) | b
        colors = sorted(set(argb_img.reshape(-1).tolist()))
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        pal_list = colors
        lookup = {c: i for i, c in enumerate(colors)}
        idx = np.vectorize(lookup.__getitem__)(argb_img)
        n_colors = len(colors)
        if n_colors <= 2:
            pal_wbits = 3
        elif n_colors <= 4:
            pal_wbits = 2
        elif n_colors <= 16:
            pal_wbits = 1
        else:
            pal_wbits = 0
        if pal_wbits:
            ppb = 1 << pal_wbits
            bpp = 8 >> pal_wbits
            packed_w = -(-w // ppb)
            packed = np.zeros((h, packed_w), dtype=np.int64)
            for x in range(w):
                packed[:, x >> pal_wbits] |= idx[:, x] << ((x & (ppb - 1)) * bpp)
        else:
            packed_w = w
            packed = idx
        w = packed_w
        r = np.zeros_like(packed)
        g = packed
        b = np.zeros_like(packed)
        a = np.full_like(packed, 255)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    if cross_color is not None:
        g2r, g2b, r2b = cross_color
        for v in cross_color:
            if not -128 <= v <= 127:
                raise ValueError("cross-color multipliers are int8")
        gs = (g + 128) % 256 - 128
        rs = (r + 128) % 256 - 128
        b = (b - ((g2b * gs) >> 5) - ((r2b * rs) >> 5)) & 0xFF
        r = (r - ((g2r * gs) >> 5)) & 0xFF
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode must be 0-13")
        a, r, g, b = _vp8l_forward_predict(a, r, g, b, predictor)
    argb = (
        (a.reshape(-1) << 24)
        | (r.reshape(-1) << 16)
        | (g.reshape(-1) << 8)
        | b.reshape(-1)
    ).tolist()
    # tokenize: literals, cache hits, and dist-1 runs as LZ77 copies
    tokens: list[tuple] = []  # ("lit", argb) | ("copy", length) | ("cache", idx)
    cache_size = (1 << color_cache_bits) if color_cache_bits else 0
    cache = [None] * cache_size
    shift = 32 - color_cache_bits if color_cache_bits else 0

    def _cache_key(p: int) -> int:
        return (0x1E35A7BD * p & 0xFFFFFFFF) >> shift

    i = 0
    npix = len(argb)
    while i < npix:
        if use_lz77 and i and argb[i] == argb[i - 1]:
            run = 1
            while i + run < npix and argb[i + run] == argb[i - 1] and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run))
                if cache_size:
                    cache[_cache_key(argb[i - 1])] = argb[i - 1]
                i += run
                continue
        px_v = argb[i]
        if cache_size and cache[_cache_key(px_v)] == px_v:
            tokens.append(("cache", _cache_key(px_v)))
        else:
            tokens.append(("lit", px_v))
            if cache_size:
                cache[_cache_key(px_v)] = px_v
        i += 1
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def _len_prefix(v: int) -> tuple[int, int, int]:
        """(prefix_code, extra_bits, extra_value) for an LZ77 value."""
        if v <= 4:
            return v - 1, 0, 0
        bits = (v - 1).bit_length() - 1
        code = 2 * bits + ((v - 1) >> (bits - 1)) - 2
        extra = bits - 1
        offset = (2 + (code & 1)) << extra
        return code, extra, v - offset - 1

    for kind, val in tokens:
        if kind == "lit":
            gf[(val >> 8) & 0xFF] = gf.get((val >> 8) & 0xFF, 0) + 1
            rf[(val >> 16) & 0xFF] = rf.get((val >> 16) & 0xFF, 0) + 1
            bf[val & 0xFF] = bf.get(val & 0xFF, 0) + 1
            af[(val >> 24) & 0xFF] = af.get((val >> 24) & 0xFF, 0) + 1
        elif kind == "copy":
            code, _, _ = _len_prefix(val)
            gf[256 + code] = gf.get(256 + code, 0) + 1
            # distance 1 = 2D map entry (1, 0) = code 2 → prefix 1
            df[1] = df.get(1, 0) + 1
        else:
            gf[280 + val] = gf.get(280 + val, 0) + 1
    if not rf:
        rf, bf, af = {0: 1}, {0: 1}, {0: 1}
    wtr = _Vp8lWriter()
    wtr.write(8, 0x2F)
    wtr.write(14, full_w - 1)
    wtr.write(14, h - 1)
    wtr.write(1, 0)  # alpha hint
    wtr.write(3, 0)  # version
    # transform stream order is the REVERSE of inverse-application
    # order: the decoder inverts last-read first, and the forward
    # pipeline above ran subtract-green → cross-color → predictor
    if subtract_green:
        wtr.write(1, 1)
        wtr.write(2, 2)
    if cross_color is not None:
        g2r, g2b, r2b = cross_color
        wtr.write(1, 1)
        wtr.write(2, 1)
        wtr.write(3, 9 - 2)  # 512-pixel blocks: one block value
        _vp8l_emit_uniform_subimage(
            wtr,
            (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF),
            9, w, h,
        )
    if predictor is not None:
        wtr.write(1, 1)
        wtr.write(2, 0)
        wtr.write(3, 9 - 2)
        _vp8l_emit_uniform_subimage(wtr, (0xFF << 24) | (predictor << 8), 9, w, h)
    if palette:
        wtr.write(1, 1)
        wtr.write(2, 3)
        wtr.write(8, len(pal_list) - 1)
        # the palette rides as a (n,1) literal image, delta-coded
        deltas = []
        prev = 0
        for c in pal_list:
            d = 0
            for sh in (0, 8, 16, 24):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _vp8l_emit_literal_image(wtr, deltas)
    wtr.write(1, 0)  # end of transforms
    if color_cache_bits:
        wtr.write(1, 1)
        wtr.write(4, color_cache_bits)
    else:
        wtr.write(1, 0)
    wtr.write(1, 0)  # no meta prefix codes
    gc = _vp8l_emit_prefix_code(wtr, gf, 280 + cache_size)
    rc = _vp8l_emit_prefix_code(wtr, rf, 256)
    bc = _vp8l_emit_prefix_code(wtr, bf, 256)
    ac = _vp8l_emit_prefix_code(wtr, af, 256)
    dc = _vp8l_emit_prefix_code(wtr, df, 40)
    for kind, val in tokens:
        if kind == "lit":
            wtr.write_code(*gc[(val >> 8) & 0xFF])
            wtr.write_code(*rc[(val >> 16) & 0xFF])
            wtr.write_code(*bc[val & 0xFF])
            wtr.write_code(*ac[(val >> 24) & 0xFF])
        elif kind == "copy":
            code, extra, ev = _len_prefix(val)
            wtr.write_code(*gc[256 + code])
            if extra:
                wtr.write(extra, ev)
            wtr.write_code(*dc[1])  # distance prefix 1 → value 2 → map (1,0)
        else:
            wtr.write_code(*gc[280 + val])
    data = wtr.flush()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _image_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB pixels of any really-decodable image format,
    sniffed by magic: 24-bit BMP (BGR converted here), 8-bit RGB/RGBA
    PNG, baseline/progressive JPEG, or GIF87a/89a (LZW) — so
    aHash/resize run format-agnostic."""
    if payload[:2] == b"BM":
        return _bmp_pixels(payload)[:, :, ::-1]
    if payload[:8] == _PNG_MAGIC:
        return _png_pixels(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return _jpeg_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_pixels(payload)
    if payload[:4] == b"\x59\xa6\x6a\x95":
        return _ras_pixels(payload)
    if payload[:7] == b"#define":
        return _xbm_pixels(payload)
    if len(payload) >= 2 and payload[0:1] == b"P" and payload[1] in range(0x31, 0x37):
        return _pnm_pixels(payload)
    if payload[:4] == _QOI_MAGIC:
        return _qoi_pixels(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return _webp_pixels(payload)
    if payload[:4] == b"DDS ":
        return _dds_pixels(payload)
    if payload[:2] == b"\x01\xda":
        return _sgi_pixels(payload)
    if payload[4:8] == b"ftyp" and payload[8:12] in _HEIF_BRANDS:
        info = _heif_info(payload)  # real container walk first
        raise NotImplementedError(
            f"HEIF/AVIF pixel decode ({info['codec']}) requires a codec library"
        )
    if len(payload) >= 128 and payload[0] == 0x0A and payload[2] == 1:
        return _pcx_pixels(payload)
    if payload.endswith(_TGA_FOOTER):
        # TGA has no leading magic; only the v2 footer is sniffable.
        # Checked BEFORE the ICO prefix: a raw truecolor TGA header
        # starts 00 00 02 00 — byte-identical to the CUR magic — and
        # the 18-byte trailing footer is the stronger signature.
        return _tga_pixels(payload)
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return _ico_pixels(payload)
    raise ValueError("unsupported image container (expected BMP, PNG, JPEG, or GIF)")


def _mp4_boxes(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """(type, payload_start, payload_end) for each ISO-BMFF box in
    buf[start:end]. Handles 32-bit sizes, size==1 (64-bit largesize)
    and size==0 (box extends to end of the enclosing scope)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", buf, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError(f"MP4 box {btype!r} overruns its scope")
        yield btype, body, box_end
        pos = box_end


def _mp4_child(buf: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, b, e in _mp4_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


_HEIF_BRANDS = (b"heic", b"heix", b"heim", b"heis", b"mif1", b"msf1",
                b"avif", b"avis")


def _heif_info(payload: bytes) -> dict:
    """Container triage for HEIF/HEIC and AVIF stills (r11 late — the
    phone-photo and modern-web staples): the ISO-BMFF 'meta' FullBox
    walk resolves the primary codec (infe item types: hvc1/av01/...),
    the canvas dims (largest 'ispe' property — grid-tiled images
    carry one per tile plus the full-size one), and the coded-item
    count. HEVC/AV1 payload decode needs a codec library — the
    metadata-before-decode honesty contract of the MP4/AVI arms."""
    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    brand = payload[8:12]
    if brand not in _HEIF_BRANDS:
        raise ValueError(f"not a HEIF/AVIF brand ({brand!r})")
    try:
        return _heif_info_impl(payload, brand)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt HEIF container ({exc})") from exc


def _heif_info_impl(payload: bytes, brand: bytes) -> dict:
    meta = _mp4_child(payload, 0, len(payload), b"meta")
    if meta is None:
        raise ValueError("HEIF container missing its meta box")
    mb, me = meta[0] + 4, meta[1]  # meta is a FullBox: skip version/flags
    item_types: list[bytes] = []
    dims: list[tuple[int, int]] = []
    for btype, b, e in _mp4_boxes(payload, mb, me):
        if btype == b"iinf":
            version = payload[b]
            pos = b + 4 + (2 if version == 0 else 4)
            for itype, ib, ie in _mp4_boxes(payload, pos, e):
                if itype != b"infe" or ie - ib < 12:
                    continue
                iversion = payload[ib]
                if iversion >= 2:
                    # infe v2/v3: vf(4) + item_id(2 or 4) +
                    # protection(2) + item_type(4)
                    off = ib + 4 + (2 if iversion == 2 else 4) + 2
                    item_types.append(payload[off : off + 4])
        elif btype == b"iprp":
            ipco = _mp4_child(payload, b, e, b"ipco")
            if ipco is not None:
                for ptype, pb, pe in _mp4_boxes(payload, ipco[0], ipco[1]):
                    if ptype == b"ispe" and pe - pb >= 12:
                        w, h = struct.unpack_from(">II", payload, pb + 4)
                        dims.append((w, h))
    coded = [t for t in item_types if t in (b"hvc1", b"av01", b"avc1", b"jpeg")]
    if not dims and not coded:
        raise ValueError("HEIF meta carries no image items")
    w, h = max(dims, default=(None, None), key=lambda d: (d[0] or 0) * (d[1] or 0))
    codec = None
    if coded:
        codec = {b"hvc1": "hevc", b"av01": "av1", b"avc1": "avc",
                 b"jpeg": "jpeg"}[coded[0]]
    elif brand in (b"avif", b"avis"):
        codec = "av1"
    elif brand.startswith(b"hei"):
        codec = "hevc"
    return {
        "kind": "image",
        "codec": codec,
        "width": w,
        "height": h,
        "n_frames": max(len(coded), 1),
    }


def decode_heif(payload: bytes) -> dict:
    return _heif_info(payload)


def _mp4_video_track(payload: bytes) -> dict:
    """Parsed header fields of the first 'vide'-handler trak of an
    ISO-BMFF container: tkhd 16.16 dims, mdhd timescale+duration (v0
    32-bit and v1 64-bit layouts), stsd first sample-entry fourcc,
    stsz sample count, plus the stbl bounds for the sample-table walk.
    Raises ValueError on anything that is not a video-bearing MP4
    (struct.error from truncated fixed-layout boxes is wrapped, the
    WAV/AVI discipline, so quarantine matching stays uniform)."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) container")
    try:
        return _mp4_video_track_impl(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt MP4 container ({exc})") from exc


def _mp4_traks(payload: bytes, handler: bytes) -> Iterator[tuple[int, int, tuple[int, int]]]:
    """(trak_start, trak_end, mdia bounds) of every trak whose hdlr
    matches ``handler`` (b'vide' / b'soun') — the shared trak-selection
    walk under the video AND audio track parsers."""
    moov = _mp4_child(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    for ttype, tb, te in _mp4_boxes(payload, *moov):
        if ttype != b"trak":
            continue
        mdia = _mp4_child(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_child(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != handler:
            continue
        yield tb, te, mdia


def _mp4_mdhd(payload: bytes, mdia: tuple[int, int], what: str) -> tuple[int, int]:
    """(timescale, duration) from the trak's mdhd — v0 32-bit and v1
    64-bit field layouts."""
    mdhd = _mp4_child(payload, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError(f"{what} trak missing mdhd")
    if payload[mdhd[0]] == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, mdhd[0] + 20)
    else:
        timescale, duration = struct.unpack_from(">II", payload, mdhd[0] + 12)
    return int(timescale), int(duration)


def _mp4_stbl(payload: bytes, mdia: tuple[int, int], what: str) -> tuple[int, int]:
    stbl_scope = _mp4_child(payload, *mdia, b"minf")
    stbl = _mp4_child(payload, *stbl_scope, b"stbl") if stbl_scope else None
    if stbl is None:
        raise ValueError(f"{what} trak missing minf/stbl")
    return stbl


def _mp4_video_track_impl(payload: bytes) -> dict:
    for tb, te, mdia in _mp4_traks(payload, b"vide"):
        # tkhd: width/height as 16.16 fixed point at the tail.
        tkhd = _mp4_child(payload, tb, te, b"tkhd")
        if tkhd is None:
            raise ValueError("video trak missing tkhd")
        (tw,) = struct.unpack_from(">I", payload, tkhd[1] - 8)
        (th,) = struct.unpack_from(">I", payload, tkhd[1] - 4)
        timescale, duration = _mp4_mdhd(payload, mdia, "video")
        stbl = _mp4_stbl(payload, mdia, "video")
        stsd = _mp4_child(payload, *stbl, b"stsd")
        codec = "unknown"
        if stsd is not None:
            (n_entries,) = struct.unpack_from(">I", payload, stsd[0] + 4)
            if n_entries >= 1:
                codec = payload[stsd[0] + 12 : stsd[0] + 16].decode("ascii", "replace")
        stsz = _mp4_child(payload, *stbl, b"stsz")
        if stsz is None:
            raise ValueError("video trak missing stsz")
        (n_frames,) = struct.unpack_from(">I", payload, stsz[0] + 8)
        return {
            "n_frames": int(n_frames),
            "width": tw >> 16,
            "height": th >> 16,
            "codec": codec,
            "timescale": timescale,
            "duration": duration,
            "stbl": stbl,
            "stsz": stsz,
        }
    raise ValueError("MP4 has no video track")


def _mp4_audio_track(payload: bytes) -> dict:
    """Parsed header fields of the first 'soun'-handler trak — the
    audio twin of ``_mp4_video_track`` (r8 verdict #4): mdhd
    timescale+duration, stsd AudioSampleEntry fourcc + channelcount +
    sample size + 16.16 sample rate, stsz sample count. This is the
    metadata-before-decode routing an MP4 audio corpus triages on;
    the mp4a (AAC) SAMPLE payload needs codec libraries absent here
    and stays behind the NotImplementedError quarantine."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) container")
    try:
        return _mp4_audio_track_impl(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt MP4 container ({exc})") from exc


def _mp4_audio_track_impl(payload: bytes) -> dict:
    for _tb, _te, mdia in _mp4_traks(payload, b"soun"):
        timescale, duration = _mp4_mdhd(payload, mdia, "audio")
        stbl = _mp4_stbl(payload, mdia, "audio")
        stsd = _mp4_child(payload, *stbl, b"stsd")
        codec, n_ch, samp_size, rate = "unknown", 0, 0, 0
        lpcm_flags = None
        if stsd is not None:
            (n_entries,) = struct.unpack_from(">I", payload, stsd[0] + 4)
            entry = stsd[0] + 8
            if n_entries >= 1 and entry + 8 <= stsd[1]:
                (esz,) = struct.unpack_from(">I", payload, entry)
                codec = payload[entry + 4 : entry + 8].decode("ascii", "replace")
                # AudioSampleEntry: 8B SampleEntry header fields, 8B
                # reserved, then channelcount/samplesize u16s, 2+2B
                # pre_defined/reserved, samplerate as 16.16 — present
                # only when the entry declares (and the box holds) the
                # full 36-byte fixed layout.
                if esz >= 36 and entry + 36 <= stsd[1]:
                    n_ch, samp_size = struct.unpack_from(">HH", payload, entry + 24)
                    (rate_fx,) = struct.unpack_from(">I", payload, entry + 32)
                    rate = rate_fx >> 16
                    # QuickTime SoundDescription v2 ('lpcm', r11): the
                    # v0 channelcount/samplesize/rate are placeholders
                    # and the real layout lives in the v2 extension —
                    # float64 rate, u32 channels/bits, and the
                    # isFloat/isBigEndian/isSignedInteger flags word
                    (version,) = struct.unpack_from(">H", payload, entry + 16)
                    if codec == "lpcm" and version == 2 and (
                        esz >= 72 and entry + 72 <= stsd[1]
                    ):
                        (rate_f,) = struct.unpack_from(">d", payload, entry + 40)
                        nch2, _a, bits2, flags2 = struct.unpack_from(
                            ">IIII", payload, entry + 48
                        )
                        n_ch, samp_size = nch2, bits2
                        rate = (
                            int(round(rate_f))
                            if np.isfinite(rate_f) and 0 < rate_f < 1e7
                            else 0
                        )
                        lpcm_flags = flags2
        stsz = _mp4_child(payload, *stbl, b"stsz")
        if stsz is None:
            raise ValueError("audio trak missing stsz")
        (n_samples,) = struct.unpack_from(">I", payload, stsz[0] + 8)
        return {
            "codec": codec,
            "n_channels": int(n_ch),
            "sample_size": int(samp_size),
            "sample_rate": int(rate),
            "n_samples": int(n_samples),
            "lpcm_flags": lpcm_flags,
            "timescale": timescale,
            "duration": duration,
            # the sample-table handles _mp4_sample_ranges needs — PCM
            # ('twos'/'sowt') audio resolves and decodes through the
            # same machinery as the video trak (r9)
            "stbl": stbl,
            "stsz": stsz,
        }
    raise ValueError("MP4 has no audio track")


def _mp4_audio_stats(payload: bytes, trk: dict | None = None) -> dict:
    """Audio stats from the ISO-BMFF walk — the same dict shape as
    ``decode_wav`` minus rms/peak (those need the AAC sample decode
    the environment can't do), plus the codec fourcc the triage pass
    routes on."""
    if trk is None:
        trk = _mp4_audio_track(payload)
    return {
        "kind": "audio",
        "n_channels": trk["n_channels"],
        "sample_rate": trk["sample_rate"],
        "n_frames": trk["n_samples"],
        "codec": trk["codec"],
        "duration_s": (
            trk["duration"] / trk["timescale"] if trk["timescale"] else 0.0
        ),
    }


# raw sample entries _mp4_pcm_samples decodes without codec
# libraries: (storage bytes per sample, numpy dtype or None for the
# hand-assembled 24-bit / G.711 table paths). One table keeps the
# routing, stats, and fingerprint support matrices in sync.
_MP4_PCM_LAYOUTS = {
    "twos": (2, ">i2"),
    "sowt": (2, "<i2"),
    "ulaw": (1, None),
    "alaw": (1, None),
    "in24": (3, None),
    "in32": (4, ">i4"),
    "fl32": (4, ">f4"),
    "fl64": (8, ">f8"),
}


def _mp4_pcm_samples(
    payload: bytes, trk: dict | None = None
) -> tuple[np.ndarray, int, int]:
    """(interleaved samples, rate, n_channels) of a raw-PCM audio
    trak — the audio twin of MJPEG-in-MP4: 'twos'/'sowt' sample
    entries carry uncompressed 16-bit PCM, 'ulaw'/'alaw' entries
    (r10) expand through the same G.711 tables as the WAV arm, and
    the wide QuickTime entries (r11, mirroring the WAV width matrix):
    'in24'/'in32' are big-endian integer PCM returned in their NATIVE
    domain (int32, like the 24/32-bit AIFF arms), 'fl32'/'fl64' are
    big-endian IEEE floats expanded to the int16 grid exactly like
    the float WAV rule (round(clip(v)·32767), non-finite raises).
    The REAL sample-table resolution (stsz×stsc×stco) yields the
    bytes in every case. Anything else (mp4a/AAC, alac, the v2 'lpcm'
    entry whose layout lives in flags this walk doesn't parse, ...)
    raises NotImplementedError and quarantines upstream, exactly like
    non-JPEG video codecs."""
    if trk is None:
        trk = _mp4_audio_track(payload)
    codec = trk["codec"]
    if codec == "lpcm":
        if trk.get("lpcm_flags") is None:
            # v0/v1 'lpcm' entries put the layout in places this walk
            # doesn't parse — quarantine rather than guess a byte order
            raise NotImplementedError(
                "MP4 'lpcm' decode requires the SoundDescription v2 "
                "flags layout"
            )
        return _mp4_lpcm_samples(payload, trk)
    layout = _MP4_PCM_LAYOUTS.get(codec)
    if layout is None:
        raise NotImplementedError(
            f"MP4 audio sample decode for codec {codec!r} requires codec "
            "libraries not present; only raw PCM ('twos'/'sowt'/'in24'/"
            "'in32'/v2 'lpcm'), IEEE float ('fl32'/'fl64'), and G.711 "
            "('ulaw'/'alaw') sample entries decode here"
        )
    width, dt = layout
    n_ch, bits = trk["n_channels"], trk["sample_size"]
    # QuickTime's sample_size field declares the DECODED width for
    # non-16-bit entries (it writes 16 for µ-law and often for the
    # wide PCM types too) — accept the natural width or 16, plus 8
    # for the G.711 codewords
    ok_bits = {16, width * 8} | ({8} if width == 1 else set())
    if n_ch not in (1, 2) or bits not in ok_bits:
        raise ValueError(f"unsupported MP4 PCM layout ({n_ch} ch, {bits}-bit)")
    buf = bytearray()
    for off, size in _mp4_sample_ranges(payload, trk):
        buf += payload[off : off + size]
    if len(buf) % (width * n_ch):
        raise ValueError("MP4 PCM data is not frame-aligned")
    rate = trk["sample_rate"]
    if width == 1:
        table = _G711_ULAW if codec == "ulaw" else _G711_ALAW
        return table[np.frombuffer(bytes(buf), dtype=np.uint8)].astype(
            np.int16
        ), rate, n_ch
    if codec == "in24":
        b = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(-1, 3)
        v = (
            (b[:, 0].astype(np.int64) << 16)
            | (b[:, 1].astype(np.int64) << 8)
            | b[:, 2]
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.int32), rate, n_ch
    samples = np.frombuffer(bytes(buf), dtype=dt)
    if codec in ("fl32", "fl64"):
        v = samples.astype(np.float64)
        if v.size and not np.isfinite(v).all():
            raise ValueError("MP4 float samples non-finite")
        return np.rint(np.clip(v, -1.0, 1.0) * 32767.0).astype(np.int16), rate, n_ch
    if codec == "in32":
        return samples.astype(np.int32), rate, n_ch
    return samples.astype(np.int16), rate, n_ch


def _mp4_lpcm_samples(
    payload: bytes, trk: dict
) -> tuple[np.ndarray, int, int]:
    """(interleaved samples, rate, n_channels) of a v2 'lpcm' trak —
    QuickTime's fully-general PCM entry: the formatSpecificFlags word
    declares float/endianness/signedness and constBitsPerChannel the
    width. Signed ints 16/24/32 (either byte order; 24-bit assembled
    with sign extension) follow the in24/in32 native-domain rule;
    floats 32/64 expand to the int16 grid; unsigned or other widths
    quarantine as unsupported layouts."""
    flags = trk["lpcm_flags"]
    n_ch, bits = trk["n_channels"], trk["sample_size"]
    is_float, is_be, is_signed = flags & 1, flags & 2, flags & 4
    ok = (bits in (32, 64)) if is_float else (is_signed and bits in (16, 24, 32))
    if n_ch not in (1, 2) or not ok:
        raise ValueError(
            f"unsupported MP4 lpcm layout ({n_ch} ch, {bits}-bit, "
            f"flags={flags:#x})"
        )
    width = bits // 8
    buf = bytearray()
    for off, size in _mp4_sample_ranges(payload, trk):
        buf += payload[off : off + size]
    if len(buf) % (width * n_ch):
        raise ValueError("MP4 PCM data is not frame-aligned")
    rate = trk["sample_rate"]
    e = ">" if is_be else "<"
    if is_float:
        v = np.frombuffer(bytes(buf), dtype=f"{e}f{width}").astype(np.float64)
        if v.size and not np.isfinite(v).all():
            raise ValueError("MP4 float samples non-finite")
        return np.rint(np.clip(v, -1.0, 1.0) * 32767.0).astype(np.int16), rate, n_ch
    if bits == 24:
        b = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = (
            (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
            if is_be
            else (b[:, 2] << 16) | (b[:, 1] << 8) | b[:, 0]
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.int32), rate, n_ch
    samples = np.frombuffer(bytes(buf), dtype=f"{e}i{width}")
    return samples.astype(np.int16 if bits == 16 else np.int32), rate, n_ch


def decode_mp4_pcm(payload: bytes, trk: dict | None = None) -> dict:
    """Full audio stats for PCM-in-MP4 — the same dict shape as
    ``decode_wav`` (real sample decode: rms/peak) plus the codec
    fourcc, mirroring ``decode_mp4_mjpeg`` on the video side."""
    if trk is None:
        trk = _mp4_audio_track(payload)
    samples, rate, n_ch = _mp4_pcm_samples(payload, trk)
    s = samples.astype(np.float64)
    n_frames = len(samples) // n_ch if n_ch else 0
    return {
        "kind": "audio",
        "n_channels": n_ch,
        "sample_rate": rate,
        "n_frames": n_frames,
        "codec": trk["codec"],
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(s**2))) if s.size else 0.0,
        "peak": float(np.max(np.abs(s))) if s.size else 0.0,
    }


def _mp4_video_stats(payload: bytes, trk: dict | None = None) -> dict:
    """Video stats from a REAL ISO-BMFF (MP4) container walk — see
    ``_mp4_video_track``. For a non-JPEG codec this is as deep as the
    container honestly goes here: the H.264/HEVC bitstream needs codec
    libraries absent in this environment, so FRAME access raises and
    quarantines — but this already parses the metadata a 100 TB
    video-corpus triage pass actually scans (duration/dims/codec
    routing before any expensive decode).

    Parity anchor: the reference has no video path; this extends the
    decode_media family (same dict shape as ``decode_avi_mjpeg``,
    minus pixel means which require sample decode)."""
    if trk is None:
        trk = _mp4_video_track(payload)
    return {
        "kind": "video",
        "n_frames": trk["n_frames"],
        "width": trk["width"],
        "height": trk["height"],
        "codec": trk["codec"],
        "duration_s": (
            trk["duration"] / trk["timescale"] if trk["timescale"] else 0.0
        ),
    }


def _mp4_sample_ranges(payload: bytes, trk: dict) -> list[tuple[int, int]]:
    """(absolute_offset, size) of every sample of the video trak, in
    sample order — the real ISO-BMFF sample-table resolution: stsz
    (per-sample or uniform sizes) × stsc (sample→chunk run-length
    map) × stco/co64 (chunk offsets). This is the layer that turns
    'container metadata' into addressable frame bytes. Every table is
    bounds-checked against its own box so a corrupt count raises
    ValueError instead of leaking struct.error."""
    try:
        return _mp4_sample_ranges_impl(payload, trk)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt MP4 sample tables ({exc})") from exc


def _mp4_sample_ranges_impl(payload: bytes, trk: dict) -> list[tuple[int, int]]:
    stbl, stsz = trk["stbl"], trk["stsz"]
    (uniform, n_samples) = struct.unpack_from(">II", payload, stsz[0] + 4)
    if uniform:
        # Bound the allocation BEFORE building the list: samples are
        # disjoint byte ranges of the file, so uniform * n_samples can
        # never legitimately exceed the payload — a hostile 2^32-1 count
        # would otherwise materialize a multi-GB list ahead of the
        # per-sample range check.
        if uniform * n_samples > len(payload):
            raise ValueError("uniform stsz sizes exceed file size")
        sizes = [uniform] * n_samples
    else:
        if stsz[0] + 12 + 4 * n_samples > stsz[1]:
            raise ValueError("stsz table truncated")
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, stsz[0] + 12))
        # Samples are disjoint byte ranges of the file, so their TOTAL
        # can never legitimately exceed it either — without this, a
        # hostile per-sample table whose chunks overlap resolves each
        # range in-bounds while the concatenated output (MJPEG frame
        # list, PCM buffer) grows quadratic in the payload size.
        if sum(sizes) > len(payload):
            raise ValueError("stsz total exceeds file size")
    stco = _mp4_child(payload, *stbl, b"stco")
    if stco is not None:
        (n_chunks,) = struct.unpack_from(">I", payload, stco[0] + 4)
        if stco[0] + 8 + 4 * n_chunks > stco[1]:
            raise ValueError("stco table truncated")
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco[0] + 8))
    else:
        co64 = _mp4_child(payload, *stbl, b"co64")
        if co64 is None:
            raise ValueError("video trak missing stco/co64")
        (n_chunks,) = struct.unpack_from(">I", payload, co64[0] + 4)
        if co64[0] + 8 + 8 * n_chunks > co64[1]:
            raise ValueError("co64 table truncated")
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, co64[0] + 8))
    stsc = _mp4_child(payload, *stbl, b"stsc")
    if stsc is None:
        raise ValueError("video trak missing stsc")
    (n_runs,) = struct.unpack_from(">I", payload, stsc[0] + 4)
    if stsc[0] + 8 + 12 * n_runs > stsc[1]:
        raise ValueError("stsc table truncated")
    runs = [
        struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)[:2]
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk)
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")
    # first_chunk must be strictly increasing (spec) — a 0 or repeated
    # value would Python-negative-index offsets[] below and silently
    # resolve sample ranges from the wrong chunk with ok=True.
    for ri in range(1, len(runs)):
        if runs[ri][0] <= runs[ri - 1][0]:
            raise ValueError("stsc first_chunk not strictly increasing")
    ranges: list[tuple[int, int]] = []
    s = 0
    for ri, (first, spc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        for ci in range(first, last + 1):
            if s >= n_samples:
                break
            if ci > n_chunks:
                raise ValueError("stsc references a chunk past stco")
            pos = offsets[ci - 1]
            for _ in range(min(spc, n_samples - s)):
                size = sizes[s]
                if pos + size > len(payload):
                    raise ValueError("sample range past end of file")
                ranges.append((pos, size))
                pos += size
                s += 1
    if s != n_samples:
        raise ValueError(f"sample tables resolve {s} of {n_samples} samples")
    return ranges


def _mp4_mjpeg_frames(payload: bytes, trk: dict | None = None) -> list[bytes]:
    """JPEG frame payloads of an MJPEG-in-MP4 file — the ISO-BMFF
    twin of ``_avi_mjpeg_frames``: resolve the video trak's sample
    tables to byte ranges and return each sample, which for the
    'jpeg' sample-entry fourcc is a complete baseline JPEG. Any other
    codec raises NotImplementedError (H.264/HEVC need codec libraries
    absent here) and quarantines upstream."""
    if trk is None:
        trk = _mp4_video_track(payload)
    if trk["codec"] != "jpeg":
        raise NotImplementedError(
            f"MP4 sample decode for codec {trk['codec']!r} requires codec "
            "libraries not present; only MJPEG ('jpeg' sample entries) "
            "decodes here"
        )
    frames = []
    for off, size in _mp4_sample_ranges(payload, trk):
        f = payload[off : off + size]
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG sample does not start with a JPEG SOI")
        frames.append(f)
    if not frames:
        raise ValueError("MP4 video trak has no samples")
    return frames


def decode_mp4_mjpeg(payload: bytes, trk: dict | None = None) -> dict:
    """Full video stats for MJPEG-in-MP4 — same shape as
    ``decode_avi_mjpeg`` (real frame decode: count, first-frame dims,
    mean RGB) plus the container's codec/duration metadata. The track
    dict is parsed once and threaded through (the box walk + sample
    tables would otherwise be re-parsed per layer)."""
    if trk is None:
        trk = _mp4_video_track(payload)
    frames = _mp4_mjpeg_frames(payload, trk)
    px = _jpeg_pixels(frames[0])
    mean_rgb = px.reshape(-1, 3).mean(axis=0) if px.size else np.zeros(3)
    meta = _mp4_video_stats(payload, trk)
    return {
        **meta,
        "n_frames": len(frames),
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "mean_r": float(mean_rgb[0]),
        "mean_g": float(mean_rgb[1]),
        "mean_b": float(mean_rgb[2]),
    }

