"""Vorbis I sample decode — lib-free, from the public Xiph Vorbis I
specification (r13; the r12 verdict ranked it the largest remaining
quarantine that is *doctrine-compatible*).

Why the r12 verification doctrine admits Vorbis where it quarantines
VP8/Layer II: Vorbis ships its huffman codebooks IN-STREAM (setup
header), so there is no normative-table transcription to trust — the
spec's own decode rules force structural validation (a codebook whose
length list is over- or under-specified is a hard stream error), and
codeword assignment from lengths is the spec's deterministic canonical
algorithm. The remaining constants are closed-form: the lapped window
sin(pi/2 * sin^2), the IMDCT kernel, and the floor1 inverse-dB table,
derived here as the geometric sequence table[i] = 1.0649863e-07 *
1.0649863**i (each step 20*log10(1.0649863) ~ 0.547 dB, ~140 dB over
the range; endpoints pinned in tests). Deviation bound, stated
honestly: the published rendering of that table is float32 and our
closed form meets it at the quoted first-entry/ratio precision, so
per-entry amplitude deviation is < 1% (< 0.09 dB) — irrelevant to the
twin round trip (both sides share the table) and far below any
fingerprint threshold for real streams; this is Vorbis's ONE
transcription-shaped constant, against MP3's 512.
Floor type 0 (LSP) is quarantined BY NAME — it is spec math too but
appears in no modern encoder output, and landing it untested would be
claim inflation.

Verification story (no real Vorbis fixture exists on this box —
checked): a deterministic encoder twin (`_vorbis_payload`) emits real
Vorbis-in-Ogg streams — identification + comment + setup with
in-stream codebooks (ordered and unordered length lists, lookup types
1 and 2), floor1 curves, residue types 0/1/2, square-polar coupling,
and both single- and dual-blocksize modes — and the round trip gates
silence->silence EXACT, tone recovery within one FFT bin, SNR floors
at the twin's quantizer resolution, and granule-position sample-count
exactness. Fuzz families mutate twin streams so the packet walk,
codebook reader, and floor/residue decoders see hostile input.

The reference repo (aws_etl_dados_publicos_cnpj) has no audio code;
this backs the [EXT] multimodal surface (SURVEY.md section 2.3).
"""

from __future__ import annotations

import struct

import numpy as np

from .audio import _ogg_packets, _ogg_pages


# --- bit reader (Vorbis packs LSB-first within bytes) ------------------------


class _VBitReader:
    """LSB-first bit reader over one packet. Reading past the end is a
    hard stream error per spec section 4 ('end of packet' during header
    decode is an error; during audio decode the spec says the partial
    packet result stands, which the callers handle)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("Vorbis packet overread")
        self.pos = p + n
        out = 0
        shift = 0
        while n > 0:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n)
            out |= ((byte >> (p & 7)) & ((1 << take) - 1)) << shift
            shift += take
            p += take
            n -= take
        return out

    def read_flag(self) -> bool:
        return bool(self.read(1))

    def eof(self) -> bool:
        return self.pos >= self.nbits


def _ilog(x: int) -> int:
    """ilog per spec section 9.2.1: position of the highest set bit,
    ilog(0) = 0, ilog(1) = 1."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def _float32_unpack(x: int) -> float:
    """Vorbis packed float (section 9.2.2): 21-bit mantissa, sign,
    10-bit exponent biased by 788."""
    mantissa = x & 0x1FFFFF
    if x & 0x80000000:
        mantissa = -mantissa
    exponent = (x & 0x7FE00000) >> 21
    return float(mantissa) * 2.0 ** (exponent - 788)


def _lookup1_values(entries: int, dim: int) -> int:
    """Greatest integer v with v**dim <= entries (section 9.2.3)."""
    v = int(entries ** (1.0 / dim))
    while (v + 1) ** dim <= entries:
        v += 1
    while v > 0 and v ** dim > entries:
        v -= 1
    return v


# --- codebooks ----------------------------------------------------------------


class _Codebook:
    __slots__ = ("dim", "entries", "lengths", "decode_tree", "vq", "seq_p")

    def __init__(self, dim, entries, lengths, vq, seq_p):
        self.dim = dim
        self.entries = entries
        self.lengths = lengths  # None for unused entries
        self.vq = vq            # (entries, dim) float array or None
        self.seq_p = seq_p
        self.decode_tree = _huffman_table(lengths)

    def decode_scalar(self, r: _VBitReader) -> int:
        """Entry number by walking the canonical code LSB-first bit by
        bit (Vorbis codewords transmit MSB of the codeword first, which
        in the packet arrives as successive bits)."""
        node = self.decode_tree
        while True:
            node = node[r.read(1)]
            if isinstance(node, int):
                return node
            if node is None:
                raise ValueError("Vorbis codeword walks off the tree")

    def decode_vq(self, r: _VBitReader) -> np.ndarray:
        if self.vq is None:
            # spec 3.3: a codebook without a value mapping may only be
            # used in a scalar context — a residue referencing it is
            # corruption (r13 fuzz finding: bitflip in the setup header
            # leaked a TypeError here)
            raise ValueError(
                "Vorbis residue uses a scalar-only codebook in VQ context"
            )
        entry = self.decode_scalar(r)
        return self.vq[entry]


def _canonical_codewords(lengths: list[int | None]) -> list[tuple[int, int] | None]:
    """(length, codeword) per entry via the spec's assignment: each used
    entry, in entry order, takes the lowest unused codeword of its
    length (section 3.2.1; the 'marker' construction). Over- or
    under-specified length lists are hard errors, except the special
    single-entry codebook which gets the zero-length codeword per the
    errata (decoded as zero bits... the spec assigns it one 1-bit word;
    we follow the reference: a single used entry of length 1).
    """
    used = [(i, l) for i, l in enumerate(lengths) if l is not None]
    if not used:
        raise ValueError("Vorbis codebook has no used entries")
    out: list[tuple[int, int] | None] = [None] * len(lengths)
    if len(used) == 1:
        i, l = used[0]
        out[i] = (l, 0)
        return out
    marker = [0] * 33
    for i, l in used:
        if marker[l] >> l:
            raise ValueError("Vorbis codebook length list is overspecified")
        word = marker[l]
        out[i] = (l, word)
        # propagate: increment this length's marker and all longer ones
        # that were aligned under it
        for j in range(l, 0, -1):
            if marker[j] & 1:
                if j == 1:
                    marker[1] += 1
                else:
                    marker[j] = marker[j - 1] << 1
                break
            marker[j] += 1
        for j in range(l + 1, 33):
            if (marker[j] >> 1) == word:
                word = marker[j]
                marker[j] = marker[j - 1] << 1
            else:
                break
    # underspecification check: the tree must be exactly full (Kraft==1)
    kraft = sum(1 << (32 - l) for _, l in used)
    if kraft != 1 << 32:
        raise ValueError("Vorbis codebook length list is underspecified")
    return out


def _huffman_table(lengths):
    """Binary tree (nested 2-lists, leaves = entry numbers) from the
    canonical codewords, walked MSB-first."""
    words = _canonical_codewords(lengths)
    root: list = [None, None]
    for entry, lw in enumerate(words):
        if lw is None:
            continue
        l, w = lw
        node = root
        for bitpos in range(l - 1, -1, -1):
            bit = (w >> bitpos) & 1
            if bitpos == 0:
                if node[bit] is not None:
                    raise ValueError("Vorbis codeword collision")
                node[bit] = entry
            else:
                if node[bit] is None:
                    node[bit] = [None, None]
                node = node[bit]
                if isinstance(node, int):
                    raise ValueError("Vorbis codeword under a leaf")
    return root


def _read_codebook(r: _VBitReader) -> _Codebook:
    if r.read(24) != 0x564342:  # 'BCV'
        raise ValueError("Vorbis codebook sync lost")
    dim = r.read(16)
    entries = r.read(24)
    if dim < 1 or entries < 1:
        raise ValueError("Vorbis codebook with zero dim/entries")
    # bounded-work cap (fuzz r13: one flipped setup byte declared a
    # multi-million-entry ordered length list — 24-bit entries admit
    # 16.7M — and the length/assignment walk became a >30 s stall).
    # Real-world books are a few thousand entries; the cap is generous
    # and the error is a named quarantine, the _IMG_MAX_PIXELS shape.
    if entries > (1 << 15):
        raise ValueError("Vorbis codebook exceeds the decode cap")
    lengths: list[int | None] = []
    if r.read_flag():  # ordered
        current_length = r.read(5) + 1
        while len(lengths) < entries:
            number = r.read(_ilog(entries - len(lengths)))
            if current_length > 32:
                raise ValueError("Vorbis ordered codebook length > 32")
            lengths.extend([current_length] * number)
            current_length += 1
        if len(lengths) > entries:
            raise ValueError("Vorbis ordered codebook overruns entries")
    else:
        sparse = r.read_flag()
        for _ in range(entries):
            if sparse and not r.read_flag():
                lengths.append(None)
            else:
                lengths.append(r.read(5) + 1)
    lookup = r.read(4)
    vq = None
    seq_p = False
    if lookup in (1, 2):
        # second bounded-work cap (fuzz r13): dim is a 16-bit field,
        # so entries*dim admits ~2G VQ cells from a tiny setup packet
        if entries * dim > (1 << 18):
            raise ValueError("Vorbis VQ table exceeds the decode cap")
        minimum = _float32_unpack(r.read(32))
        delta = _float32_unpack(r.read(32))
        value_bits = r.read(4) + 1
        seq_p = r.read_flag()
        if lookup == 1:
            lv = _lookup1_values(entries, dim)
        else:
            lv = entries * dim
        mults = np.array([r.read(value_bits) for _ in range(lv)], dtype=np.float64)
        if lookup == 1:
            e = np.arange(entries)
            vq = np.empty((entries, dim))
            idx_div = 1
            for j in range(dim):
                vq[:, j] = mults[(e // idx_div) % lv] * delta + minimum
                idx_div *= lv
        else:
            vq = mults[: entries * dim].reshape(entries, dim) * delta + minimum
        if seq_p:
            vq = np.cumsum(vq, axis=1)
    elif lookup != 0:
        raise ValueError(f"Vorbis codebook lookup type {lookup} reserved")
    return _Codebook(dim, entries, lengths, vq, seq_p)


# --- floor 1 ------------------------------------------------------------------

# inverse dB table, closed form (geometric; see module docstring)
_FLOOR1_RATIO = 1.0649863
FLOOR1_INVERSE_DB = (1.0649863e-07 * _FLOOR1_RATIO ** np.arange(256)).astype(
    np.float64
)


def _read_floor1(r: _VBitReader, n_books: int) -> dict:
    partitions = r.read(5)
    classes = [r.read(4) for _ in range(partitions)]
    n_classes = (max(classes) + 1) if classes else 0
    class_dims = []
    class_subs = []
    class_master = []
    subclass_books = []
    for _ in range(n_classes):
        class_dims.append(r.read(3) + 1)
        sub = r.read(2)
        class_subs.append(sub)
        if sub:
            mb = r.read(8)
            if mb >= n_books:
                raise ValueError("floor1 masterbook out of range")
            class_master.append(mb)
        else:
            class_master.append(-1)
        books = []
        for _ in range(1 << sub):
            b = r.read(8) - 1
            if b >= n_books:
                raise ValueError("floor1 subclass book out of range")
            books.append(b)
        subclass_books.append(books)
    multiplier = r.read(2) + 1
    rangebits = r.read(4)
    xs = [0, 1 << rangebits]
    for p in range(partitions):
        for _ in range(class_dims[classes[p]]):
            xs.append(r.read(rangebits))
    if len(set(xs)) != len(xs):
        raise ValueError("floor1 X list has duplicates")
    return {
        "type": 1,
        "partitions": partitions,
        "classes": classes,
        "class_dims": class_dims,
        "class_subs": class_subs,
        "class_master": class_master,
        "subclass_books": subclass_books,
        "multiplier": multiplier,
        "xs": xs,
    }


_FLOOR1_RANGES = [256, 128, 86, 64]


def _floor1_decode(r: _VBitReader, fl: dict, books: list[_Codebook]):
    """Y list of a floor1 packet header, or None for an unused channel."""
    if not r.read_flag():
        return None
    rng = _FLOOR1_RANGES[fl["multiplier"] - 1]
    bits = _ilog(rng - 1)
    ys = [r.read(bits), r.read(bits)]
    for p in range(fl["partitions"]):
        cls = fl["classes"][p]
        cdim = fl["class_dims"][cls]
        csub = fl["class_subs"][cls]
        csubbits = 1 << csub
        cval = 0
        if csub:
            cval = books[fl["class_master"][cls]].decode_scalar(r)
        for _ in range(cdim):
            book = fl["subclass_books"][cls][cval & (csubbits - 1)]
            cval >>= csub
            if book >= 0:
                ys.append(books[book].decode_scalar(r))
            else:
                ys.append(0)
    return ys


def _render_point(x0, y0, x1, y1, x):
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _low_neighbor(v, x):
    best = None
    for i in range(x):
        if v[i] < v[x] and (best is None or v[i] > v[best]):
            best = i
    return best


def _high_neighbor(v, x):
    best = None
    for i in range(x):
        if v[i] > v[x] and (best is None or v[i] < v[best]):
            best = i
    return best


def _floor1_curve(fl: dict, ys: list[int], n: int) -> np.ndarray:
    """Synthesize the floor curve (section 7.2.4): amplitude value
    synthesis with predicted-value splitting, then integer line render
    through the inverse dB table."""
    rng = _FLOOR1_RANGES[fl["multiplier"] - 1]
    xs = fl["xs"]
    values = len(xs)
    step2 = [False] * values
    final_y = [0] * values
    step2[0] = step2[1] = True
    final_y[0] = ys[0]
    final_y[1] = ys[1]
    for i in range(2, values):
        lo = _low_neighbor(xs, i)
        hi = _high_neighbor(xs, i)
        predicted = _render_point(xs[lo], final_y[lo], xs[hi], final_y[hi], xs[i])
        val = ys[i]
        high_room = rng - predicted
        low_room = predicted
        room = 2 * min(high_room, low_room)
        if val:
            step2[lo] = True
            step2[hi] = True
            step2[i] = True
            if val >= room:
                final_y[i] = (
                    predicted + val - low_room
                    if high_room > low_room
                    else predicted - (val - high_room) - 1
                )
            else:
                # spec 7.2.4: odd -> predicted - (val+1)/2, even -> + val/2
                final_y[i] = (
                    predicted - ((val + 1) >> 1)
                    if val & 1
                    else predicted + (val >> 1)
                )
        else:
            step2[i] = False
            final_y[i] = predicted
        final_y[i] = max(0, min(rng - 1, final_y[i]))
    # curve synthesis: sort by X, render lines between step2 points
    order = sorted(range(values), key=lambda i: xs[i])
    floor_y = np.zeros(n, dtype=np.int64)
    hx = 0
    lx = 0
    ly = final_y[order[0]] * fl["multiplier"]
    for i in order[1:]:
        if not step2[i]:
            continue
        hy = final_y[i] * fl["multiplier"]
        hx = xs[i]
        _render_line(lx, ly, hx, hy, floor_y, n)
        lx, ly = hx, hy
    if hx < n:
        floor_y[hx:] = ly
    out = np.zeros(n)
    idx = np.minimum(floor_y, 255)
    out[:] = FLOOR1_INVERSE_DB[idx]
    return out


def _render_line(x0, y0, x1, y1, buf, n):
    """Integer Bresenham exactly per spec section 9.2.7 — note the
    spec's integer division truncates toward zero (C semantics), which
    differs from Python's floor division for negative dy."""
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = -((-dy) // adx) if dy < 0 else dy // adx
    sy = base - 1 if dy < 0 else base + 1
    ady -= abs(base) * adx
    y = y0
    err = 0
    if x0 < n:
        buf[x0] = min(y, 255)
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        buf[x] = min(y, 255)


# --- residues -----------------------------------------------------------------


def _read_residue(r: _VBitReader, n_books: int) -> dict:
    rtype = r.read(16)
    if rtype > 2:
        raise ValueError(f"Vorbis residue type {rtype} reserved")
    begin = r.read(24)
    end = r.read(24)
    psize = r.read(24) + 1
    classifications = r.read(6) + 1
    classbook = r.read(8)
    if classbook >= n_books:
        raise ValueError("residue classbook out of range")
    cascade = []
    for _ in range(classifications):
        low = r.read(3)
        high = r.read(5) if r.read_flag() else 0
        cascade.append((high << 3) | low)
    books = []
    for c in range(classifications):
        row = []
        for p in range(8):
            if cascade[c] & (1 << p):
                b = r.read(8)
                if b >= n_books:
                    raise ValueError("residue book out of range")
                row.append(b)
            else:
                row.append(-1)
        books.append(row)
    return {
        "type": rtype,
        "begin": begin,
        "end": end,
        "psize": psize,
        "classifications": classifications,
        "classbook": classbook,
        "books": books,
    }


def _residue_decode(
    r: _VBitReader,
    res: dict,
    books: list[_Codebook],
    do_not_decode: list[bool],
    ch: int,
    n: int,
) -> np.ndarray:
    """Decoded residue vectors, shape (ch, n//2). Type 2 interleaves
    all channels into one long vector first (section 8.6.4)."""
    half = n // 2
    rtype = res["type"]
    if rtype == 2:
        out = np.zeros((1, half * ch))
        dnd = [all(do_not_decode)]
        eff_ch = 1
        size = half * ch
    else:
        out = np.zeros((ch, half))
        dnd = do_not_decode
        eff_ch = ch
        size = half
    begin = min(res["begin"], size)
    end = min(res["end"], size)
    n_read = end - begin
    if n_read:
        classbook = books[res["classbook"]]
        cwords = classbook.dim
        psize = res["psize"]
        parts = n_read // psize
        classifs = [[0] * (parts + cwords) for _ in range(eff_ch)]
        for p in range(8):
            pi = 0
            while pi < parts:
                if p == 0:
                    for j in range(eff_ch):
                        if dnd[j]:
                            continue
                        temp = classbook.decode_scalar(r)
                        for k in range(cwords - 1, -1, -1):
                            classifs[j][pi + k] = temp % res["classifications"]
                            temp //= res["classifications"]
                for _ in range(cwords):
                    if pi >= parts:
                        break
                    for j in range(eff_ch):
                        if dnd[j]:
                            continue
                        c = classifs[j][pi]
                        b = res["books"][c][p]
                        if b < 0:
                            continue
                        book = books[b]
                        offset = begin + pi * psize
                        if rtype == 0:
                            step = psize // book.dim
                            for k in range(step):
                                v = book.decode_vq(r)
                                out[j, offset + k : offset + k + psize : step] += v
                        else:  # type 1 body (also used by type 2)
                            k = 0
                            while k < psize:
                                v = book.decode_vq(r)
                                out[j, offset + k : offset + k + book.dim] += v
                                k += book.dim
                    pi += 1
    if rtype == 2:
        # de-interleave channels
        full = out[0]
        res_out = np.zeros((ch, half))
        for j in range(ch):
            res_out[j] = full[j::ch]
        return res_out
    return out


# --- setup / stream state -----------------------------------------------------


class _VorbisStream:
    """Parsed header state: codebooks, floors, residues, mappings,
    modes, block sizes, channel count, rate."""

    def __init__(self, packets: list[bytes]):
        if len(packets) < 3:
            raise ValueError("Vorbis stream lacks its three headers")
        ident, comment, setup = packets[0], packets[1], packets[2]
        if ident[:7] != b"\x01vorbis" or setup[:7] != b"\x05vorbis":
            raise ValueError("Vorbis header packets out of order")
        if comment[:7] != b"\x03vorbis":
            raise ValueError("Vorbis comment header missing")
        if len(ident) < 30:
            raise ValueError("Vorbis identification header truncated")
        version = struct.unpack_from("<I", ident, 7)[0]
        if version != 0:
            raise ValueError(f"Vorbis version {version} unknown")
        self.channels = ident[11]
        self.rate = struct.unpack_from("<I", ident, 12)[0]
        if self.channels < 1 or self.rate == 0:
            raise ValueError("Vorbis identification header invalid")
        bs = ident[28]
        self.bs0 = 1 << (bs & 0x0F)
        self.bs1 = 1 << (bs >> 4)
        if not (64 <= self.bs0 <= 8192 and self.bs0 <= self.bs1 <= 8192):
            raise ValueError("Vorbis block sizes out of range")
        if not ident[29] & 1:
            raise ValueError("Vorbis identification framing bit unset")

        r = _VBitReader(setup[7:])
        n_books = r.read(8) + 1
        self.books = [_read_codebook(r) for _ in range(n_books)]
        # time domain transforms: placeholder zeros
        for _ in range(r.read(6) + 1):
            if r.read(16) != 0:
                raise ValueError("Vorbis time transform nonzero")
        self.floors = []
        for _ in range(r.read(6) + 1):
            ftype = r.read(16)
            if ftype == 1:
                self.floors.append(_read_floor1(r, n_books))
            elif ftype == 0:
                raise NotImplementedError(
                    "Vorbis floor type 0 (LSP) not implemented: spec math "
                    "but absent from modern encoder output; quarantined by "
                    "name rather than landed untested"
                )
            else:
                raise ValueError(f"Vorbis floor type {ftype} reserved")
        self.residues = [
            _read_residue(r, n_books) for _ in range(r.read(6) + 1)
        ]
        # spec 8.6.2: residue value books are VQ contexts — a book
        # with no value mapping (maptype 0) listed there renders the
        # stream undecodable. Reject at setup (fail-fast twin of the
        # decode_vq guard; r13 fuzz finding).
        for res in self.residues:
            for row in res["books"]:
                for b in row:
                    if b >= 0 and self.books[b].vq is None:
                        raise ValueError(
                            "Vorbis residue lists a scalar-only codebook"
                        )
        self.mappings = []
        for _ in range(r.read(6) + 1):
            if r.read(16) != 0:
                raise ValueError("Vorbis mapping type nonzero")
            submaps = r.read(4) + 1 if r.read_flag() else 1
            coupling = []
            if r.read_flag():
                steps = r.read(8) + 1
                bits = _ilog(self.channels - 1)
                for _ in range(steps):
                    mag = r.read(bits)
                    ang = r.read(bits)
                    if mag == ang or mag >= self.channels or ang >= self.channels:
                        raise ValueError("Vorbis coupling step invalid")
                    coupling.append((mag, ang))
            if r.read(2) != 0:
                raise ValueError("Vorbis mapping reserved bits set")
            if submaps > 1:
                mux = [r.read(4) for _ in range(self.channels)]
                if any(m >= submaps for m in mux):
                    raise ValueError("Vorbis mux out of range")
            else:
                mux = [0] * self.channels
            submap_floor = []
            submap_res = []
            for _ in range(submaps):
                r.read(8)  # unused time config
                fl = r.read(8)
                re = r.read(8)
                if fl >= len(self.floors) or re >= len(self.residues):
                    raise ValueError("Vorbis submap floor/residue range")
                submap_floor.append(fl)
                submap_res.append(re)
            self.mappings.append(
                {
                    "submaps": submaps,
                    "coupling": coupling,
                    "mux": mux,
                    "floor": submap_floor,
                    "residue": submap_res,
                }
            )
        self.modes = []
        for _ in range(r.read(6) + 1):
            blockflag = r.read_flag()
            if r.read(16) != 0 or r.read(16) != 0:
                raise ValueError("Vorbis mode window/transform nonzero")
            mapping = r.read(8)
            if mapping >= len(self.mappings):
                raise ValueError("Vorbis mode mapping out of range")
            self.modes.append((blockflag, mapping))
        if not r.read_flag():
            raise ValueError("Vorbis setup framing bit unset")


def _vorbis_window(n: int, left_n: int, right_n: int) -> np.ndarray:
    """The lapped window for one block: left slope over the first
    left_n samples (centered in the left half), right slope mirrored,
    ones between (section 4.3.1 window shape rules)."""
    w = np.ones(n)
    ls = _window_slope(left_n)
    rs = _window_slope(right_n)
    left_start = n // 4 - left_n // 2
    w[:left_start] = 0.0
    w[left_start : left_start + left_n] = ls
    right_start = 3 * n // 4 - right_n // 2
    w[right_start : right_start + right_n] = rs[::-1]
    w[right_start + right_n :] = 0.0
    return w


def _window_slope(n: int) -> np.ndarray:
    x = (np.arange(n) + 0.5) / n * (np.pi / 2.0)
    return np.sin(np.pi / 2.0 * np.sin(x) ** 2)


def _imdct_direct(spec: np.ndarray) -> np.ndarray:
    """Textbook O(n^2) IMDCT (section 1.3.2): the exactness oracle the
    FFT path is tested against."""
    half = spec.shape[-1]
    n = 2 * half
    j = np.arange(n)[:, None]
    k = np.arange(half)[None, :]
    M = np.cos(np.pi / (2.0 * n) * (2 * j + 1 + n // 2) * (2 * k + 1))
    return M @ spec


def _imdct(spec: np.ndarray) -> np.ndarray:
    """IMDCT via a zero-padded odd-bin IFFT, O(n log n) (r13):
    y[j] = sum_k X[k] cos(pi/(2n) (2j+1+n/2)(2k+1)) — absorb the
    j-independent phase into a twiddle c_k = X_k e^{i a (1+n/2) q},
    q = 2k+1, and the rest is Re of a length-2n inverse DFT evaluated
    on odd bins. Correct by construction (no index gymnastics) and it
    avoids caching an n x n/2 matrix per block size (268 MB at the
    spec's 8192 cap). Matches _imdct_direct to ~3e-10 at n=8192
    (pinned in tests)."""
    half = spec.shape[-1]
    n = 2 * half
    a = np.pi / (2.0 * n)
    q = 2 * np.arange(half) + 1
    c = spec * np.exp(1j * a * (1 + n // 2) * q)
    z = np.zeros(2 * n, dtype=complex)
    z[1:n:2] = c
    return np.real(np.fft.ifft(z)[:n]) * (2 * n)


def _vorbis_decode_packet(st: _VorbisStream, packet: bytes):
    """One audio packet -> (windowed_pcm (ch, n), right_slope_n); the
    caller does positional overlap-add."""
    r = _VBitReader(packet)
    if r.read(1) != 0:
        raise ValueError("header packet where audio expected")
    mode_n = r.read(_ilog(len(st.modes) - 1)) if len(st.modes) > 1 else 0
    if mode_n >= len(st.modes):
        raise ValueError("Vorbis mode number out of range")
    blockflag, mapping_n = st.modes[mode_n]
    mp = st.mappings[mapping_n]
    n = st.bs1 if blockflag else st.bs0
    long_prev = long_next = True
    if blockflag:
        long_prev = r.read_flag()
        long_next = r.read_flag()

    ch = st.channels
    half = n // 2
    # floor decode
    floors = []
    no_residue = []
    for c in range(ch):
        fl = st.floors[mp["floor"][mp["mux"][c]]]
        ys = _floor1_decode(r, fl, st.books)
        floors.append((fl, ys))
        no_residue.append(ys is None)
    # coupling: a coupled pair decodes if either side has a floor
    for mag, ang in mp["coupling"]:
        if not (no_residue[mag] and no_residue[ang]):
            no_residue[mag] = False
            no_residue[ang] = False
    # residue decode per submap
    spectra = np.zeros((ch, half))
    for s in range(mp["submaps"]):
        chans = [c for c in range(ch) if mp["mux"][c] == s]
        dnd = [no_residue[c] for c in chans]
        res = st.residues[mp["residue"][s]]
        dec = _residue_decode(r, res, st.books, dnd, len(chans), n)
        for i, c in enumerate(chans):
            spectra[c] = dec[i]
    # inverse coupling (square polar, section 4.3.6), last step first
    for mag, ang in reversed(mp["coupling"]):
        M = spectra[mag].copy()
        A = spectra[ang].copy()
        pos = M > 0
        apos = A > 0
        out_m = np.where(
            pos, np.where(apos, M, M + A), np.where(apos, M, M - A)
        )
        out_a = np.where(
            pos, np.where(apos, M - A, M), np.where(apos, M + A, M)
        )
        spectra[mag] = out_m
        spectra[ang] = out_a
    # floor curve multiply + IMDCT + window
    pcm = np.zeros((ch, n))
    left_n = st.bs0 // 2 if (blockflag and not long_prev) else n // 2
    right_n = st.bs0 // 2 if (blockflag and not long_next) else n // 2
    win = _vorbis_window(n, left_n, right_n)
    for c in range(ch):
        fl, ys = floors[c]
        if ys is None:
            continue
        curve = _floor1_curve(fl, ys, half)
        pcm[c] = _imdct(spectra[c] * curve)
    pcm *= win
    return pcm, right_n


def vorbis_samples(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Float samples in [-1, 1) of an Ogg Vorbis payload as
    (frames, channels); returns (samples, rate, channels).

    Overlap-add is positional: consecutive blocks sit so the center of
    the current block's left slope aligns with the center of the
    previous block's right slope (start offset = 3*prev_n/4 -
    cur_n/4 — the window shape rules of section 4.3.1 make the lapped
    slopes power-complementary there). A sample is final once no
    future block can touch it, i.e. before the current block's right
    slope begins; the first packet therefore emits nothing, per spec.
    The final page's granule position truncates the tail (section
    A.2)."""
    packets, last_granule, _ = _ogg_packets(payload)
    return vorbis_samples_from_packets(packets, last_granule)


def vorbis_samples_from_packets(
    packets: list[bytes], last_granule: int
) -> tuple[np.ndarray, int, int]:
    """Container-agnostic core of ``vorbis_samples``: three header
    packets + audio packets, however they were carried (Ogg pages or
    Matroska CodecPrivate + blocks)."""
    st = _VorbisStream(packets[:3])
    chunks: list[np.ndarray] = []
    acc: np.ndarray | None = None  # pending, starts at emit boundary
    acc_start = 0  # absolute position of acc[0]
    prev_start = None
    prev_n = 0
    emitted = 0
    for pk in packets[3:]:
        if not pk:
            continue
        block, right_n = _vorbis_decode_packet(st, pk)
        n = block.shape[1]
        if prev_start is None:
            cur_start = 0
        else:
            cur_start = prev_start + 3 * prev_n // 4 - n // 4
        end = cur_start + n
        if acc is None:
            acc = np.zeros((st.channels, n))
            acc_start = cur_start
        elif acc_start + acc.shape[1] < end:
            pad = end - (acc_start + acc.shape[1])
            acc = np.concatenate(
                [acc, np.zeros((st.channels, pad))], axis=1
            )
        # a long block after a short one REACHES BACK past the emit
        # boundary (start = prev + 3*prev_n/4 - n/4 can decrease); the
        # reached-back region is window-zero by the shape rules, so
        # clipping it is lossless
        lo = max(cur_start, acc_start)
        acc[:, lo - acc_start : end - acc_start] += block[:, lo - cur_start :]
        final_until = cur_start + 3 * n // 4 - right_n // 2
        if prev_start is None:
            # first packet primes the lap; nothing is emitted
            emitted = final_until
        elif final_until > emitted:
            chunks.append(acc[:, emitted - acc_start : final_until - acc_start])
            emitted = final_until
        # drop the emitted prefix
        acc = acc[:, emitted - acc_start :]
        acc_start = emitted
        prev_start, prev_n = cur_start, n
    if chunks:
        pcm = np.concatenate(chunks, axis=1).T  # (frames, ch)
    else:
        pcm = np.zeros((0, st.channels))
    if 0 <= last_granule < pcm.shape[0]:
        pcm = pcm[: int(last_granule)]
    return pcm, st.rate, st.channels


def decode_vorbis(payload: bytes) -> dict:
    """decode_wav-keyed stats for an Ogg Vorbis payload: REAL sample
    decode (floor1 + residues 0/1/2 + coupling + IMDCT), rms/peak on
    the int16 grid like the MP3 arm. Raises NotImplementedError for
    floor0 streams (named quarantine)."""
    s, rate, ch = vorbis_samples(payload)
    g = np.clip(np.round(s.reshape(-1) * 32768.0), -32768, 32767)
    return {
        "kind": "audio",
        "codec": "vorbis",
        "n_channels": ch,
        "sample_rate": rate,
        "n_frames": int(s.shape[0]),
        "duration_s": s.shape[0] / rate,
        "rms": float(np.sqrt(np.mean(g**2))) if g.size else 0.0,
        "peak": float(np.max(np.abs(g))) if g.size else 0.0,
    }


# --- encoder twin --------------------------------------------------------------
# Deterministic Vorbis encoder for round-trip gating (the progressive-
# JPEG / MP3-twin precedent): real in-stream codebooks, floor1, residue
# type 0, one short-block mode. The forward MDCT uses the same lapped
# window; calibration: IMDCT(MDCT(x)) with 50% lap reconstructs n/4 * x
# exactly (TDAC), so the encoder scales spectra by 4/n.


class _VBitWriter:
    """LSB-first bit writer (the Vorbis packing convention)."""

    __slots__ = ("buf", "bit", "cur")

    def __init__(self):
        self.buf = bytearray()
        self.bit = 0
        self.cur = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.bit
            self.bit += 1
            if self.bit == 8:
                self.buf.append(self.cur)
                self.cur = 0
                self.bit = 0

    def write_code(self, word: int, length: int) -> None:
        """Huffman codeword: MSB of the word is transmitted first."""
        for i in range(length - 1, -1, -1):
            self.write((word >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.buf) + (
            bytes([self.cur]) if self.bit else b""
        )
        return out


def _float32_pack(mantissa: int, exponent: int, neg: bool) -> int:
    """Inverse of _float32_unpack for exactly-representable values."""
    return (0x80000000 if neg else 0) | ((exponent + 788) << 21) | mantissa


def _uniform_lengths(n_entries: int) -> list[int]:
    """A complete prefix code over n_entries (Kraft == 1): 2**l - N
    entries at length l-1, the rest at l, l = ceil(log2 N)."""
    l = max(1, (n_entries - 1).bit_length())
    m = (1 << l) - n_entries
    return [l - 1] * m + [l] * (n_entries - m)


_TWIN_PSIZE = 32


def _twin_codes(n_entries: int):
    """Spec-canonical (length, codeword) pairs of the twin's uniform
    complete code — the same assignment the decoder derives from the
    transmitted length list."""
    return _canonical_codewords(_uniform_lengths(n_entries))


def _twin_value_book(w: _VBitWriter, levels: int, lookup2: bool, ordered: bool):
    """Residue value codebook: dim 2 over ``levels`` uniform quant
    levels in [-1, 1]; delta = 2/(levels-1) must be a power of two so
    the packed float is exact. Lookup type 1 (implicit lattice) or 2
    (explicit multiplicands); unordered or ordered length list."""
    L = levels
    entries = L * L
    dlog = (L - 1).bit_length() - 1  # levels-1 == 2**dlog
    if (1 << dlog) != L - 1:
        raise ValueError("twin levels-1 must be a power of two")
    w.write(0x564342, 24)
    w.write(2, 16)
    w.write(entries, 24)
    lengths = _uniform_lengths(entries)
    if ordered:
        # lengths are nondecreasing by construction: emit as the spec's
        # ordered list (initial length + per-length entry counts)
        w.write(1, 1)
        w.write(lengths[0] - 1, 5)
        cur = lengths[0]
        idx = 0
        while idx < entries:
            count = sum(1 for l in lengths[idx:] if l == cur)
            w.write(count, _ilog(entries - idx))
            idx += count
            cur += 1
    else:
        w.write(0, 1)
        w.write(0, 1)  # not sparse
        for length in lengths:
            w.write(length - 1, 5)
    vb = _ilog(L - 1)
    if lookup2:
        w.write(2, 4)
        w.write(_float32_pack(1, 0, True), 32)          # -1.0
        w.write(_float32_pack(1, 1 - dlog, False), 32)  # 2/(L-1)
        w.write(vb - 1, 4)
        w.write(0, 1)
        # explicit per-component multiplicands: entry e, dim j ->
        # mults[e*2+j]; component j=0 = e % L, j=1 = e // L
        for e in range(entries):
            w.write(e % L, vb)
            w.write(e // L, vb)
    else:
        w.write(1, 4)
        w.write(_float32_pack(1, 0, True), 32)
        w.write(_float32_pack(1, 1 - dlog, False), 32)
        w.write(vb - 1, 4)
        w.write(0, 1)
        for i in range(L):
            w.write(i, vb)


def _twin_headers(
    n_ch: int,
    rate: int,
    bs0: int,
    bs1: int,
    res_type: int,
    couple: bool,
    levels: int,
    lookup2: bool,
    ordered: bool,
) -> list[bytes]:
    ident = (
        b"\x01vorbis"
        + struct.pack("<IBI", 0, n_ch, rate)
        + struct.pack("<III", 0, 0, 0)
        + bytes([(bs0.bit_length() - 1) | ((bs1.bit_length() - 1) << 4), 1])
    )
    vendor = b"spark-graft vorbis twin"
    comment = (
        b"\x03vorbis"
        + struct.pack("<I", len(vendor))
        + vendor
        + struct.pack("<I", 0)
        + b"\x01"
    )
    w = _VBitWriter()
    w.write(2 - 1, 8)  # two codebooks
    # book 0: residue classbook, dim 2 over 2 classifications
    w.write(0x564342, 24)
    w.write(2, 16)
    w.write(4, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(4):
        w.write(2 - 1, 5)
    w.write(0, 4)
    _twin_value_book(w, levels, lookup2, ordered)  # book 1
    w.write(0, 6)      # one time transform
    w.write(0, 16)
    w.write(0, 6)      # one floor
    w.write(1, 16)     # floor type 1
    w.write(0, 5)      # zero partitions: the curve is one line
    w.write(0, 2)      # multiplier 1 -> range 256
    w.write(8, 4)      # rangebits: X1 = 256
    w.write(0, 6)      # one residue
    w.write(res_type, 16)
    w.write(0, 24)     # begin
    # residue vector size: bs1/2 per channel; type 2 interleaves
    end = (bs1 // 2) * (n_ch if res_type == 2 else 1)
    w.write(end, 24)
    w.write(_TWIN_PSIZE - 1, 24)
    w.write(2 - 1, 6)  # two classifications
    w.write(0, 8)      # classbook 0
    w.write(0, 3)      # class 0 cascade: nothing
    w.write(0, 1)
    w.write(1, 3)      # class 1 cascade: pass 0 only
    w.write(0, 1)
    w.write(1, 8)      # class 1 pass 0 book: 1
    w.write(0, 6)      # one mapping
    w.write(0, 16)
    w.write(0, 1)      # 1 submap
    if couple:
        w.write(1, 1)
        w.write(0, 8)  # one coupling step
        bits = _ilog(n_ch - 1)
        w.write(0, bits)  # magnitude channel 0
        w.write(1, bits)  # angle channel 1
    else:
        w.write(0, 1)
    w.write(0, 2)      # reserved
    w.write(0, 8)      # time placeholder
    w.write(0, 8)      # floor 0
    w.write(0, 8)      # residue 0
    n_modes = 2 if bs1 != bs0 else 1
    w.write(n_modes - 1, 6)
    w.write(0, 1)      # mode 0: short
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)
    if n_modes == 2:
        w.write(1, 1)  # mode 1: long
        w.write(0, 16)
        w.write(0, 16)
        w.write(0, 8)
    w.write(1, 1)      # framing
    setup = b"\x05vorbis" + w.bytes()
    return [ident, comment, setup]


_TWIN_FWD_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _twin_forward(n: int, left_n: int, right_n: int) -> np.ndarray:
    key = (n, left_n, right_n)
    M = _TWIN_FWD_CACHE.get(key)
    if M is None:
        j = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        win = _vorbis_window(n, left_n, right_n)
        M = (
            np.cos(np.pi / (2.0 * n) * (2 * j + 1 + n // 2) * (2 * k + 1))
            * win[:, None]
        ).T
        _TWIN_FWD_CACHE[key] = M
    return M


def _couple_forward(left: np.ndarray, right: np.ndarray):
    """Per-bin (magnitude, angle) whose square-polar inverse (section
    4.3.6) is exactly (left, right) — derived case by case:
      left > 0, left >  right: (L, L-R)   [M>0, A>0  -> (M, M-A)]
      left > 0, right >= left: (R, L-R)   [M>0, A<=0 -> (M+A, M)]
      left <= 0, right > left: (L, R-L)   [M<=0, A>0 -> (M, M+A)]
      left <= 0, right <= left:(R, R-L)   [M<=0, A<=0 -> (M-A, M)]
    Called on DEQUANTIZED grid values so encoder and decoder see the
    same floats and take the same branches (coupling floats before
    quantization would flip branches near A=0 with O(M) error)."""
    M = np.where(left > 0, np.where(left > right, left, right),
                 np.where(right > left, left, right))
    A = np.where(left > 0, left - right, right - left)
    return M, A


def _vorbis_payload(
    samples: np.ndarray,
    rate: int = 8000,
    blocksize: int = 512,
    res_type: int = 0,
    couple: bool = False,
    dual: bool = False,
    levels: int = 65,
    lookup2: bool = False,
    ordered: bool = False,
) -> bytes:
    """Real Ogg Vorbis stream carrying ``samples`` (float (frames, ch)
    in [-1, 1], or (frames,) mono): in-stream codebooks, flat floor1
    per channel per block, residue type 0/1/2 with a uniform quantizer
    (``levels`` odd, levels-1 a power of two; 65 -> ~32 dB floor),
    optional square-polar coupling (stereo), optional dual-blocksize
    mode schedule exercising all four window transitions, silence
    blocks class-coded to EXACT zeros. Granule truncates to the input
    frame count."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, n_ch = samples.shape
    if np.max(np.abs(samples), initial=0.0) > 1.0:
        raise ValueError("twin input exceeds [-1, 1]")
    if couple and n_ch != 2:
        raise ValueError("coupling twin is stereo-only")
    bs0 = blocksize
    bs1 = blocksize * 4 if dual else blocksize
    headers = _twin_headers(
        n_ch, rate, bs0, bs1, res_type, couple, levels, lookup2, ordered
    )
    L = levels
    delta = 2.0 / (L - 1)
    zero_q = (L - 1) // 2  # index of the exact-zero level
    class_words = _twin_codes(4)
    value_words = _twin_codes(L * L)

    # mode schedule: all-short unless dual; dual exercises s->l, l->l,
    # l->s and s->s transitions deterministically
    def mode_of(i: int) -> int:
        if not dual:
            return 0
        return [0, 1, 1, 0, 1, 0][i % 6]

    # positional layout (mirrors the decoder): s_i = s_{i-1} +
    # 3n_{i-1}/4 - n_i/4; samples are final before the right slope
    sizes = []
    starts = []
    pos = 0
    total_needed = frames + 2 * bs1  # generous tail pad
    i = 0
    while True:
        n = bs1 if mode_of(i) else bs0
        if i == 0:
            start = 0
        else:
            start = starts[-1] + 3 * sizes[-1] // 4 - n // 4
        sizes.append(n)
        starts.append(start)
        if i > 0 and start > total_needed:
            break
        i += 1
    n_blocks = len(sizes)

    def slope_ns(i: int):
        n = sizes[i]
        if n == bs0:
            return n // 2, n // 2
        left = bs0 // 2 if (i > 0 and sizes[i - 1] == bs0) else n // 2
        right = (
            bs0 // 2 if (i + 1 < n_blocks and sizes[i + 1] == bs0) else n // 2
        )
        return left, right

    # first emitted sample position (block 0 primes the lap); a guard
    # prefix of bs1 zeros absorbs long-after-short reach-back (starts
    # can go negative by up to n/4)
    l0, r0 = slope_ns(0)
    e0 = starts[0] + 3 * sizes[0] // 4 - r0 // 2
    x_off = bs1
    x_len = x_off + max(s + n for s, n in zip(starts, sizes)) + 1
    x = np.zeros((x_len, n_ch))
    x[x_off + e0 : x_off + e0 + frames] = samples

    packets = []
    granules = [0, 0, 0]
    emitted = 0
    for b in range(n_blocks):
        n = sizes[b]
        half = n // 2
        w = _VBitWriter()
        w.write(0, 1)  # audio packet
        long_blk = n == bs1 and dual
        if dual:
            w.write(1 if long_blk else 0, 1)
        left_n, right_n = slope_ns(b)
        if long_blk:
            w.write(1 if (b > 0 and sizes[b - 1] == bs1) else 0, 1)
            w.write(1 if (b + 1 < n_blocks and sizes[b + 1] == bs1) else 0, 1)
        blk = x[x_off + starts[b] : x_off + starts[b] + n]
        fwd = _twin_forward(n, left_n, right_n)
        spec = (fwd @ blk) / (n / 4.0)  # (half, ch)
        # floors: one shared index when coupling (the residues must
        # live in one amplitude domain); headroom 2x for the angle
        peaks = np.max(np.abs(spec), axis=0, initial=0.0)
        if couple:
            peaks = np.repeat(max(float(np.max(peaks)) * 2.0, 0.0), n_ch)
        floors = []
        for c in range(n_ch):
            if peaks[c] == 0.0:
                w.write(0, 1)
                floors.append(None)
                continue
            w.write(1, 1)
            f = min(int(np.searchsorted(FLOOR1_INVERSE_DB, peaks[c])), 255)
            w.write(f, 8)
            w.write(f, 8)
            floors.append(f)
        live = [c for c in range(n_ch) if floors[c] is not None]
        # residual vectors on the quant grid
        resid = np.zeros((n_ch, half))
        for c in live:
            resid[c] = spec[:, c] / FLOOR1_INVERSE_DB[floors[c]]
        q = np.clip(np.round((resid + 1.0) / delta), 0, L - 1).astype(int)
        if couple and len(live) == 2:
            # couple on the GRID: dequantize, transform, re-index —
            # exact by construction (the 2x floor headroom keeps the
            # angle inside [-1, 1])
            # blocks hotter than the floor table's ceiling would push
            # the angle off the grid (fuzz r13 finding): clip into the
            # centered half-range first — distortion only on blocks
            # already beyond the representable flat-floor amplitude
            lo, hi = (L - 1) // 4, 3 * ((L - 1) // 4)
            qc = np.clip(q[:2], lo, hi)
            v_l = qc[0] * delta - 1.0
            v_r = qc[1] * delta - 1.0
            m_v, a_v = _couple_forward(v_l, v_r)
            q[0] = np.rint((m_v + 1.0) / delta).astype(int)
            q[1] = np.rint((a_v + 1.0) / delta).astype(int)
            if q.min() < 0 or q.max() > L - 1:
                raise AssertionError("coupled residue escaped the grid")
        # vectors to emit: type 2 interleaves live... per spec ALL
        # channels of the submap interleave when any is live
        if res_type == 2:
            if live:
                inter = np.empty(half * n_ch, dtype=int)
                for c in range(n_ch):
                    inter[c::n_ch] = q[c] if c in live else zero_q
                vecs = [inter]
            else:
                vecs = []
        else:
            vecs = [q[c] for c in live]
        psize = _TWIN_PSIZE
        parts = (half * n_ch if res_type == 2 else half) // psize
        classes = []
        for v in vecs:
            cl = [
                1 if np.any(v[p * psize : (p + 1) * psize] != zero_q) else 0
                for p in range(parts)
            ]
            classes.append(cl)
            for p in range(parts):  # class-0 partitions decode to zero
                if cl[p] == 0:
                    v[p * psize : (p + 1) * psize] = zero_q
        if vecs:
            pi = 0
            while pi < parts:
                for j in range(len(vecs)):
                    cl = classes[j]
                    entry = cl[pi] * 2 + (cl[pi + 1] if pi + 1 < parts else 0)
                    lw = class_words[entry]
                    w.write_code(lw[1], lw[0])
                for _ in range(2):  # classwords per group
                    if pi >= parts:
                        break
                    for j in range(len(vecs)):
                        if classes[j][pi] != 1:
                            continue
                        v = vecs[j]
                        offset = pi * psize
                        if res_type == 0:
                            step = psize // 2
                            for i2 in range(step):
                                e = v[offset + i2] + L * v[offset + i2 + step]
                                lw = value_words[e]
                                w.write_code(lw[1], lw[0])
                        else:
                            for k in range(0, psize, 2):
                                e = v[offset + k] + L * v[offset + k + 1]
                                lw = value_words[e]
                                w.write_code(lw[1], lw[0])
                    pi += 1
        packets.append(w.bytes())
        final_until = starts[b] + 3 * n // 4 - right_n // 2
        emitted = max(0, final_until - e0) if b > 0 else 0
        granules.append(min(emitted, frames))
    granules[-1] = frames
    return _ogg_pages(headers + packets, granules=granules)
