"""Dependency-free baseline JPEG codec (pure numpy + stdlib).

Scope — ITU-T T.81 baseline sequential DCT, 8-bit:

- **decode**: grayscale (1 component) and YCbCr color (3 components) with
  4:4:4 or 4:2:0/4:2:2 sampling, restart markers, multiple DQT/DHT
  segments. Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
  modes raise ``NotImplementedError`` with actionable messages.
- **encode**: grayscale and 4:4:4 YCbCr, spec Annex K quantization tables
  (quality-scaled per the libjpeg convention) and Annex K typical Huffman
  tables — enough to round-trip the decoder in tests and to generate
  deterministic fixtures for the multimodal pipeline.

Cited parity target: the reference repo has no media codecs at all (its
scope is state estimation); this module serves the training-data-pipeline
side of SURVEY.md §2 — real corpora are overwhelmingly JPEG, and the
Spark-side decode runs inside the same Arrow-batched ``mapInPandas``
pipeline as the other codecs (plans/multimodal.py). The entropy decode is
an inherently serial bit walk, so it is per-image Python; parallelism
comes from Spark partitioning across images, which is the right axis at
corpus scale.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — part of the published spec)
# ---------------------------------------------------------------------------

# K.1 luminance / K.2 chrominance quantization tables (natural row order)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan order: ZIGZAG[i] = natural index of the i-th zigzag element
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# K.3 typical Huffman tables: (bits per code length 1..16, value list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): returns
    {value: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, vals):
    """Decoder lookup: {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# 2-D DCT-II / DCT-III via the orthonormal 8x8 basis matrix
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    mat = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    mat *= np.sqrt(2.0 / 8.0)
    mat[0] *= np.sqrt(0.5)
    return mat


_DCT = _dct_matrix()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> frequency."""
    return _DCT @ blocks @ _DCT.T


def _idct(blocks: np.ndarray) -> np.ndarray:
    return _DCT.T @ blocks @ _DCT


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of a base table (public, widely
    documented: scale = 5000/q below 50, 200-2q above)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC magnitude category and the appended-bits code (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    av = abs(v)
    size = av.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(pixels, quality: int = 90) -> bytes:
    """Encode a 2-D uint8 array as a baseline sequential grayscale JPEG."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    qt = _quality_scale(QUANT_LUMA, quality)
    return _encode(
        [px.astype(np.float64)], [(1, 1)], [0], h, w, [qt], one_qt=True
    )


def encode_jpeg_rgb(pixels, quality: int = 90, subsample: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline YCbCr JPEG —
    4:4:4 by default, 4:2:0 (2x2 luma sampling, chroma quarter-res via
    box averaging — the dominant in-the-wild layout) with
    ``subsample=True``."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w, _ = px.shape
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qts = [_quality_scale(QUANT_LUMA, quality), _quality_scale(QUANT_CHROMA, quality)]
    if not subsample:
        return _encode([y, cb, cr], [(1, 1)] * 3, [0, 1, 1], h, w, qts, one_qt=False)

    def box2(p):
        he, we = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
        pp = np.pad(p, ((0, he - p.shape[0]), (0, we - p.shape[1])), mode="edge")
        return pp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))

    return _encode(
        [y, box2(cb), box2(cr)], [(2, 2), (1, 1), (1, 1)], [0, 1, 1], h, w, qts, one_qt=False
    )


def _encode(planes, sampling, qt_ids, h, w, qts, one_qt):
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT segments (zigzag order on the wire)
    for tid, qt in enumerate(qts):
        out += _seg(0xFFDB, bytes([tid]) + bytes(qt.ravel()[ZIGZAG].astype(np.uint8)))
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qt_ids[ci]])
    out += _seg(0xFFC0, sof)
    # DHT segments
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if ncomp > 1:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tclass, bits, vals in tables:
        out += _seg(0xFFC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        dc_ac = 0x00 if qt_ids[ci] == 0 else 0x11
        sos += bytes([ci + 1, dc_ac])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    dc_codes_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_codes_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_codes_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # pre-block every plane padded to its MCU-grid size: edge replication,
    # fdct, quantize, zigzag — indexed (block_row, block_col)
    comp_blocks, comp_bw = [], []
    for ci, plane in enumerate(planes):
        hs, vs = sampling[ci]
        bh_, bw_ = mcuy * vs, mcux * hs
        padded = np.pad(
            plane,
            ((0, bh_ * 8 - plane.shape[0]), (0, bw_ * 8 - plane.shape[1])),
            mode="edge",
        ).astype(np.float64) - 128.0
        blocks = padded.reshape(bh_, 8, bw_, 8).swapaxes(1, 2).reshape(bh_ * bw_, 8, 8)
        coeff = _fdct(blocks)
        qt = qts[qt_ids[ci]].astype(np.float64)
        quant = np.round(coeff / qt).astype(np.int64)
        comp_blocks.append(quant.reshape(bh_ * bw_, 64)[:, ZIGZAG])
        comp_bw.append(bw_)

    def emit_block(zz, dc_codes, ac_codes, pred_v):
        diff = int(zz[0]) - pred_v
        size, bits = _magnitude(diff)
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | size]
            bw.write(code, ln)
            bw.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
        return int(zz[0])

    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                dc_codes = dc_codes_l if qt_ids[ci] == 0 else dc_codes_c
                ac_codes = ac_codes_l if qt_ids[ci] == 0 else ac_codes_c
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * comp_bw[ci] + (mx * hs + bx)
                        pred[ci] = emit_block(
                            comp_blocks[ci][bi], dc_codes, ac_codes, pred[ci]
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and marker stop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24 and self.pos < len(d):
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resets
                    break
                else:  # EOI or next segment
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0  # spec: pad past the end with zero bits
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Skip to just past the next RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of the appended bits."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG to float64 planes.

    Returns (planes, h, w) where planes is [Y] for grayscale or
    [Y, Cb, Cr] upsampled to full resolution for color. Truncated or
    corrupt streams raise ``ValueError`` (never a bare struct/index
    error — the decode sits inside batch pipelines that classify parser
    rejections)."""
    try:
        return _decode_jpeg_impl(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or corrupt JPEG: {e}") from None


def _decode_jpeg_impl(payload: bytes):
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", d[pos : pos + 2])
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(ish)
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "qt": qid})
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported by the built-in decoder")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG coding process not supported")
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tclass = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                huff[(tclass >> 4, tclass & 0xF)] = _build_decode_table(bits, vals)
                p += 17 + nvals
        elif marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables not supported")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                qts[tq] = zz[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy data follows
            ncomp_s = seg[0]
            scomp = []
            for ci in range(ncomp_s):
                cid, tsel = seg[1 + 2 * ci : 3 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                comp["dc"] = tsel >> 4
                comp["ac"] = tsel & 0xF
                scomp.append(comp)
            data_start = pos + seglen
            return _decode_scan(d, data_start, scomp, qts, huff, h, w, restart_interval)
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(d, pos, comps, qts, huff, h, w, restart_interval):
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient buffers in units of their own blocks
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)
        c["pred"] = 0

    br = _BitReader(d, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                dct = huff.get((0, c["dc"]))
                act = huff.get((1, c["ac"]))
                if dct is None or act is None:
                    raise ValueError("JPEG scan references a missing Huffman table")
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _huff_decode(br, dct)
                        diff = _extend(br.receive(size), size) if size else 0
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        bi = (my * c["vs"] + by) * c["bw"] + (mx * c["hs"] + bx)
                        c["coef"][bi] = zz
    planes = []
    for c in comps:
        qt = qts[c["qt"]]
        blocks = c["coef"][:, UNZIGZAG].reshape(-1, 8, 8) * qt
        spatial = _idct(blocks) + 128.0
        bh_, bw_ = c["bh"], c["bw"]
        img = (
            spatial.reshape(bh_, bw_, 8, 8).swapaxes(1, 2).reshape(bh_ * 8, bw_ * 8)
        )
        # upsample subsampled components to full resolution (nearest)
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        planes.append(np.clip(img[:h, :w], 0.0, 255.0))
    return planes, h, w


def jpeg_gray(payload: bytes) -> np.ndarray:
    """Grayscale pixel array from a baseline JPEG — the multimodal
    ``_GRAY_DECODERS`` contract (channel mean of reconstructed RGB for
    color images; Y plane directly for grayscale)."""
    planes, h, w = decode_jpeg(payload)
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, b], axis=2), 0.0, 255.0)
    return rgb.mean(axis=2)
