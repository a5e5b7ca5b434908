"""Container/stream metadata probing without full decode — the ffprobe
step of a corpus pipeline.

At 100 TB most media work is TRIAGE: route by codec, drop corrupt or
over-long items, bucket by resolution/duration — none of which needs
pixel/sample decode. ``probe_media`` extracts that metadata with pure
``struct`` parsing:

- **audio/wav**: fmt chunk -> channels, sample rate, exact duration.
- **image/bmp / png / jpeg / netpbm**: header dims (JPEG: SOF scan across
  segments, no entropy decode).
- **video/x-yuv4mpeg**: stream header dims + FRAME count walk.
- **image/tiff**: header + IFD walk (both byte orders) -> dims, bits,
  samples/pixel, compression scheme, page count from the next-IFD chain.
- **video/mp4** (NEW — full decode genuinely needs codec libs, the BOX
  STRUCTURE does not): ISO BMFF box walk -> mvhd duration/timescale,
  per-trak tkhd dims, stsd sample-entry fourcc, track count.
- **audio/mpeg (MP3)** (NEW): first frame sync -> MPEG version/layer,
  bitrate, sample rate; duration estimated from payload size at that
  bitrate (exact for CBR, the dominant case).

Unknown/corrupt payloads yield a NULL-metadata row rather than failing
the batch — triage must not die on the corpus's junk tail. The Spark
side is the same Arrow-batched ``mapInPandas`` shape as ``decode_media``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from artan_spark.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("n_streams", LongType(), True),
        StructField("codec", StringType(), True),
        StructField("payload_len", LongType()),
    ]
)

_NULL = (None, None, None, None, None)


def _probe_wav(p: bytes):
    pos = 12
    channels = rate = bits = None
    data_len = 0
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        (clen,) = struct.unpack("<I", p[pos + 4 : pos + 8])
        if cid == b"fmt ":
            _fmt, channels, rate = struct.unpack("<HHI", p[pos + 8 : pos + 16])
            bits = struct.unpack("<H", p[pos + 22 : pos + 24])[0]
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if not rate:
        return _NULL
    n_samples = data_len // max(1, (bits or 8) // 8 * (channels or 1))
    return (None, None, 1000.0 * n_samples / rate, channels, f"pcm_{bits or 8}bit")


def _probe_bmp(p: bytes):
    w, h = struct.unpack("<ii", p[18:26])
    bpp = struct.unpack("<H", p[28:30])[0]
    return (w, abs(h), None, 1, f"bmp_{bpp}bpp")


def _probe_png(p: bytes):
    if p[12:16] != b"IHDR":
        return _NULL
    w, h, depth, color_type = struct.unpack(">IIBB", p[16:26])
    kind = {0: "gray", 2: "rgb", 3: "palette", 4: "gray_alpha", 6: "rgba"}.get(color_type, "?")
    return (w, h, None, 1, f"png_{kind}{depth}")


def _probe_jpeg(p: bytes):
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return _NULL
        while pos + 1 < len(p) and p[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = p[pos + 1]
        pos += 2
        if marker == 0xD9 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        (seglen,) = struct.unpack(">H", p[pos : pos + 2])
        if marker in (0xC0, 0xC1, 0xC2):
            _prec, h, w, ncomp = struct.unpack(">BHHB", p[pos + 2 : pos + 8])
            kind = "baseline" if marker != 0xC2 else "progressive"
            return (w, h, None, 1, f"jpeg_{kind}_{ncomp}c")
        if marker == 0xDA:
            break
        pos += seglen
    return _NULL


def _probe_pnm(p: bytes):
    tokens, pos = [], 2
    while len(tokens) < 2 and pos < len(p):
        c = p[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            pos = p.find(b"\n", pos) + 1
        else:
            end = pos
            while end < len(p) and p[end] not in b" \t\r\n":
                end += 1
            tokens.append(int(p[pos:end]))
            pos = end
    w, h = tokens
    return (w, h, None, 1, "ppm" if p[:2] == b"P6" else "pgm")


def _probe_y4m(p: bytes):
    head = p[: p.find(b"\x0a")].split(b" ")
    w = h = None
    fn, fd = 30, 1
    for tok in head[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fn, fd = (int(x) for x in tok[1:].split(b":"))
    n_frames = p.count(b"FRAME", len(head))
    dur = 1000.0 * n_frames * fd / fn if fn else None
    return (w, h, dur, 1, "y4m")


def _walk_boxes(p: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", p[pos : pos + 4])
        btype = p[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", p[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr:
            return
        yield btype, pos + hdr, pos + size
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _probe_mp4(p: bytes):
    """ISO BMFF box walk: mvhd duration, tkhd dims, stsd sample fourccs."""
    duration_ms = None
    w = h = None
    n_trak = 0
    codecs: list[str] = []

    def walk(start, end):
        nonlocal duration_ms, w, h, n_trak
        for btype, bs, be in _walk_boxes(p, start, end):
            if btype in _MP4_CONTAINERS:
                if btype == b"trak":
                    n_trak += 1
                walk(bs, be)
            elif btype == b"mvhd":
                ver = p[bs]
                if ver == 1:
                    timescale, dur = struct.unpack(">IQ", p[bs + 20 : bs + 32])
                else:
                    timescale, dur = struct.unpack(">II", p[bs + 12 : bs + 20])
                if timescale:
                    duration_ms = 1000.0 * dur / timescale
            elif btype == b"tkhd":
                ver = p[bs]
                off = be - 8  # width/height are the LAST two 16.16 fields
                tw, th = struct.unpack(">II", p[off : off + 8])
                tw, th = tw >> 16, th >> 16
                if tw and th:
                    w, h = tw, th
            elif btype == b"stsd":
                (n_entries,) = struct.unpack(">I", p[bs + 4 : bs + 8])
                epos = bs + 8
                for _ in range(n_entries):
                    if epos + 8 > be:
                        break
                    (esize,) = struct.unpack(">I", p[epos : epos + 4])
                    codecs.append(p[epos + 4 : epos + 8].decode("latin1"))
                    epos += max(esize, 8)

    walk(0, len(p))
    return (w, h, duration_ms, n_trak or None, ",".join(codecs) or "mp4")


# ISO 11172-3 / 13818-3 bitrate tables, keyed (version, layer) with the
# header encoding: version 3=MPEG1, 2=MPEG2(.5 shares MPEG2 rows); layer
# bits 3=I, 2=II, 1=III. MPEG2/2.5 Layers II and III share one table.
_MP3_BITRATES = {
    (3, 3): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (3, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (3, 1): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 3): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 1): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _probe_mp3(p: bytes):
    """First frame-sync header: version/layer/bitrate/samplerate; CBR
    duration estimate from payload size (skips a leading ID3v2 tag)."""
    pos = 0
    if p[:3] == b"ID3":
        size = (p[6] << 21) | (p[7] << 14) | (p[8] << 7) | p[9]
        pos = 10 + size
    while pos + 4 <= len(p):
        if p[pos] == 0xFF and (p[pos + 1] & 0xE0) == 0xE0:
            ver = (p[pos + 1] >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (p[pos + 1] >> 1) & 0x3  # 1=III, 2=II, 3=I
            br_idx = (p[pos + 2] >> 4) & 0xF
            sr_idx = (p[pos + 2] >> 2) & 0x3
            if ver == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
                pos += 1
                continue
            rates = _MP3_RATES[ver]
            # version 0 (MPEG2.5) uses the MPEG2 bitrate rows
            bitrate = _MP3_BITRATES[(3 if ver == 3 else 2, layer)][br_idx]
            channels = 1 if ((p[pos + 3] >> 6) & 0x3) == 3 else 2
            dur = 8.0 * (len(p) - pos) / (bitrate * 1000.0) * 1000.0 if bitrate else None
            names = {3: "mp3v1", 2: "mp3v2", 0: "mp3v2.5"}
            layers = {1: "l3", 2: "l2", 3: "l1"}
            return (None, None, dur, channels, f"{names[ver]}{layers[layer]}_{bitrate}kbps_{rates[sr_idx]}hz")
        pos += 1
    return _NULL


def _probe_gif(p: bytes):
    """Header dims + a block walk for ANIMATION metadata: frame count
    (image descriptors) and duration (sum of Graphic Control Extension
    delays, centiseconds) — no LZW decode."""
    if p[:4] != b"GIF8":
        return _NULL
    w, h = struct.unpack("<HH", p[6:10])
    flags = p[10]
    gct = 2 ** ((flags & 0x7) + 1) if flags & 0x80 else 0
    ver = p[3:6].decode("latin1")
    pos = 13 + (3 * gct if flags & 0x80 else 0)
    n_frames = 0
    delay_cs = 0
    while pos < len(p):
        b0 = p[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            if p[pos + 1] == 0xF9 and pos + 5 < len(p):  # GCE: delay at +4
                delay_cs += struct.unpack("<H", p[pos + 4 : pos + 6])[0]
            pos += 2
            while pos < len(p) and p[pos] != 0:
                pos += 1 + p[pos]
            pos += 1
            continue
        if b0 != 0x2C:  # unknown block: stop walking, keep what we have
            break
        n_frames += 1
        iflags = p[pos + 9]
        pos += 10
        if iflags & 0x80:  # local color table
            pos += 3 * (2 ** ((iflags & 0x7) + 1))
        pos += 1  # LZW min code size
        while pos < len(p) and p[pos] != 0:  # data sub-blocks
            pos += 1 + p[pos]
        pos += 1
    dur = 10.0 * delay_cs if delay_cs else None  # cs -> ms
    return (w, h, dur, 1, f"gif{ver}_{gct}colors_{max(n_frames, 1)}f")


def _probe_tiff(p: bytes):
    """Baseline TIFF 6.0 IFD walk (both byte orders): dims / bits /
    samples-per-pixel / compression from the FIRST IFD, page count from
    the next-IFD chain (multi-page TIFFs are stacks of IFDs). Tag values
    respect the inline-vs-offset rule (count*size <= 4 is inline)."""
    if len(p) < 8:
        return _NULL
    if p[:4] == b"II*\x00":
        e = "<"
    elif p[:4] == b"MM\x00*":
        e = ">"
    else:
        return _NULL
    (off,) = struct.unpack(e + "I", p[4:8])
    w = h = bits = None
    spp, comp, pages = 1, 1, 0
    first, seen = True, set()
    while off and off + 2 <= len(p) and off not in seen and pages < 10_000:
        seen.add(off)
        (n,) = struct.unpack(e + "H", p[off : off + 2])
        if first:
            for i in range(n):
                ent = p[off + 2 + 12 * i : off + 14 + 12 * i]
                if len(ent) < 12:
                    break
                tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
                if typ not in (3, 4):  # SHORT / LONG carry all probed tags
                    continue
                size, fmt = (2, "H") if typ == 3 else (4, "I")
                if cnt * size <= 4:
                    (val,) = struct.unpack(e + fmt, ent[8 : 8 + size])
                else:  # value field is an offset to the array; take [0]
                    (ptr,) = struct.unpack(e + "I", ent[8:12])
                    if ptr + size > len(p):
                        continue
                    (val,) = struct.unpack(e + fmt, p[ptr : ptr + size])
                if tag == 256:
                    w = val
                elif tag == 257:
                    h = val
                elif tag == 258:
                    bits = val
                elif tag == 259:
                    comp = val
                elif tag == 277:
                    spp = val
            first = False
        pages += 1
        nxt = off + 2 + 12 * n
        if nxt + 4 > len(p):
            break
        (off,) = struct.unpack(e + "I", p[nxt : nxt + 4])
    if w is None or h is None:
        return _NULL
    cname = {
        1: "raw", 2: "ccitt_g3_1d", 3: "ccitt_g3", 4: "ccitt_g4", 5: "lzw",
        6: "jpeg_old", 7: "jpeg", 8: "deflate", 32773: "packbits", 32946: "deflate",
    }.get(comp, f"c{comp}")
    return (w, h, None, pages, f"tiff_{cname}_{spp}x{bits or 1}bit")


_PROBES = {
    "image/tiff": _probe_tiff,
    "image/gif": _probe_gif,
    "audio/wav": _probe_wav,
    "image/bmp": _probe_bmp,
    "image/png": _probe_png,
    "image/jpeg": _probe_jpeg,
    "image/x-portable-graymap": _probe_pnm,
    "image/x-portable-pixmap": _probe_pnm,
    "video/x-yuv4mpeg": _probe_y4m,
    "video/mp4": _probe_mp4,
    "audio/mpeg": _probe_mp3,
}


def probe_media(media: DataFrame) -> DataFrame:
    """(doc_id, payload[, media_type]) -> per-item container metadata.

    Sniffs the type when the column is absent; a payload that fails its
    parser (or matches no signature) yields NULL metadata instead of
    failing the batch — junk tolerance is the point of a triage pass.
    """
    from pyspark.sql import functions as F

    from artan_spark.plans.multimodal import sniff_media_type

    if "media_type" not in media.columns:
        media = media.withColumn("media_type", sniff_media_type(F.col("payload")))
    media = media.select("doc_id", "media_type", "payload")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in PROBE_SCHEMA.fields}
            for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                fn = _PROBES.get(mtype)
                if fn is None:
                    meta = _NULL
                else:
                    try:
                        meta = fn(payload)
                    except Exception:
                        meta = _NULL
                w, h, dur, n_streams, codec = meta
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
                out["n_streams"].append(n_streams)
                out["codec"].append(codec)
                out["payload_len"].append(len(payload))
            yield pd.DataFrame(out)

    return media.mapInPandas(probe, PROBE_SCHEMA)
