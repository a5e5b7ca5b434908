"""probe_media: ffprobe-style container metadata without decode — every
built-in codec's header, the ISO-BMFF (MP4) box walk, MP3 frame headers,
and junk tolerance."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from artan_spark.plans.mediaprobe import (
    _probe_mp3,
    _probe_mp4,
    probe_media,
)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _minimal_mp4(duration_s=7.5, timescale=1000, w=640, h=360, fourcc=b"avc1"):
    mvhd = (
        bytes([0]) + b"\x00\x00\x00"                       # version/flags
        + struct.pack(">II", 0, 0)                         # times
        + struct.pack(">II", timescale, int(duration_s * timescale))
        + bytes(80)                                        # rate..next_track
    )
    tkhd = (
        bytes([0]) + b"\x00\x00\x00"
        + bytes(76)                                        # up to width/height
        + struct.pack(">II", w << 16, h << 16)
    )
    entry = struct.pack(">I", 16) + fourcc + bytes(8)
    stsd = bytes([0]) + b"\x00\x00\x00" + struct.pack(">I", 1) + entry
    stbl = _box(b"stbl", _box(b"stsd", stsd))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def _mp3_cbr(bitrate_idx=9, seconds=2.0):
    # MPEG1 Layer III header: FF FB = sync + v1 + L3 + no CRC
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (0 << 2), 0xC0])  # 44100 Hz, mono
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][bitrate_idx]
    body_len = int(kbps * 1000 / 8 * seconds)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    return id3 + hdr + bytes(body_len - 4)


def test_mp4_box_walk():
    w, h, dur, n_streams, codec = _probe_mp4(_minimal_mp4())
    assert (w, h) == (640, 360)
    assert abs(dur - 7500.0) < 1e-6
    assert n_streams == 1
    assert codec == "avc1"


def test_mp3_frame_header():
    w, h, dur, ch, codec = _probe_mp3(_mp3_cbr(bitrate_idx=9, seconds=2.0))
    assert (w, h) == (None, None)
    assert ch == 1
    assert codec == "mp3v1l3_128kbps_44100hz"
    assert abs(dur - 2000.0) < 50.0  # CBR estimate within the header frame


def test_mp3_layer2_bitrate_table():
    """Layer II frames must use the Layer II bitrate rows (idx 9 = 160 kbps
    for V1L2, not the 128 the L3 table would give) — and the CBR duration
    estimate must follow."""
    hdr = bytes([0xFF, 0xFD, (9 << 4) | (0 << 2), 0xC0])  # V1, Layer II, 44100, mono
    payload = hdr + bytes(int(160_000 / 8 * 2.0) - 4)
    w, h, dur, ch, codec = _probe_mp3(payload)
    assert codec == "mp3v1l2_160kbps_44100hz"
    assert abs(dur - 2000.0) < 50.0

    # MPEG2 Layer I has its own row per ISO 13818-3: idx 9 -> 144 kbps
    hdr = bytes([0xFF, 0xF7, (9 << 4) | (0 << 2), 0xC0])  # V2, Layer I, 22050 Hz
    _, _, _, _, codec = _probe_mp3(hdr + bytes(4000))
    assert codec == "mp3v2l1_144kbps_22050hz"


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker:
    both the probe and the full decoder must skip them."""
    from artan_spark.plans.jpeg import decode_jpeg, encode_jpeg_gray
    from artan_spark.plans.mediaprobe import _probe_jpeg

    img = np.arange(13 * 11, dtype=np.uint8).reshape(13, 11)
    clean = encode_jpeg_gray(img)
    padded = clean[:2] + b"\xff\xff\xff" + clean[2:]  # fills before the first DQT
    assert _probe_jpeg(padded)[:2] == (11, 13)
    planes, h, w = decode_jpeg(padded)
    ref = decode_jpeg(clean)[0][0]
    assert (h, w) == (13, 11)
    np.testing.assert_array_equal(planes[0], ref)


def test_probe_media_all_types(spark):
    from pyspark.sql import functions as F

    from artan_spark.plans.jpeg import encode_jpeg_gray
    from artan_spark.plans.multimodal import (
        encode_bmp,
        encode_png,
        encode_pnm,
        encode_wav_pcm,
        encode_y4m,
    )

    from artan_spark.plans.multimodal import encode_gif

    img = np.arange(15 * 9, dtype=np.uint8).reshape(15, 9)
    frames = [np.zeros((6, 8), dtype=np.uint8)] * 4
    rows = [
        (10, bytearray(encode_gif(img))),
        (1, bytearray(encode_wav_pcm(np.zeros(16000, dtype=np.int16), sample_rate=16000))),
        (2, bytearray(encode_bmp(img))),
        (3, bytearray(encode_png(img))),
        (4, bytearray(encode_jpeg_gray(img))),
        (5, bytearray(encode_pnm(img))),
        (6, bytearray(encode_y4m(frames, fps=(20, 1)))),
        (7, bytearray(_minimal_mp4())),
        (8, bytearray(_mp3_cbr())),
        (9, bytearray(b"definitely not media")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in probe_media(df).collect()}
    assert len(out) == 10

    assert (out[10].width, out[10].height, out[10].codec) == (9, 15, "gif89a_256colors_1f")
    assert out[1].media_type == "audio/wav"
    assert abs(out[1].duration_ms - 1000.0) < 1e-6 and out[1].codec == "pcm_16bit"
    assert (out[2].width, out[2].height, out[2].codec) == (9, 15, "bmp_24bpp")
    assert (out[3].width, out[3].height, out[3].codec) == (9, 15, "png_gray8")
    assert (out[4].width, out[4].height) == (9, 15)
    assert out[4].codec == "jpeg_baseline_1c"
    assert (out[5].width, out[5].height, out[5].codec) == (9, 15, "pgm")
    assert (out[6].width, out[6].height) == (8, 6)
    assert abs(out[6].duration_ms - 4 * 1000.0 / 20) < 1e-6
    assert (out[7].width, out[7].height, out[7].codec) == (640, 360, "avc1")
    assert out[8].codec.startswith("mp3v1l3_128kbps")
    # junk: sniffed NULL type, NULL metadata, batch survives
    assert out[9].media_type is None and out[9].width is None and out[9].codec is None
    assert out[9].payload_len == len(b"definitely not media")

    # triage composition: route on probe output with plain Catalyst filters
    big = probe_media(df).filter((F.col("width") >= 100) | (F.col("duration_ms") > 1500))
    assert {r.doc_id for r in big.collect()} == {7, 8}


def test_probe_corrupt_payload_yields_null_row(spark):
    rows = [
        (1, bytearray(b"BM" + bytes(6))),            # truncated BMP header
        (2, bytearray(b"\x89PNG\r\n\x1a\x0abad")),   # PNG magic, no IHDR
        (3, bytearray(b"\x00\x00\x00 ftypisom")),    # MP4 ftyp only, no moov
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in probe_media(df).collect()}
    assert out[1].width is None  # parser raised -> caught -> NULL row
    assert out[2].width is None
    assert out[3].media_type == "video/mp4" and out[3].duration_ms is None


def test_gif_animation_probe():
    """Animated GIF metadata without LZW decode: frame count from image
    descriptors, duration from summed Graphic Control Extension delays."""
    import struct

    import numpy as np

    from artan_spark.plans.mediaprobe import _probe_gif
    from artan_spark.plans.multimodal import encode_gif

    img = np.arange(8 * 6, dtype=np.uint8).reshape(6, 8)
    single = encode_gif(img)
    # splice a 2-frame animation: header+GCT, then (GCE + image) x 2
    hdr_end = 13 + 3 * 256
    image_block = single[hdr_end:-1]  # descriptor..terminator, minus trailer
    gce = b"\x21\xf9\x04\x00" + struct.pack("<H", 50) + b"\x00\x00"  # 50 cs
    anim = single[:hdr_end] + gce + image_block + gce + image_block + b"\x3b"
    w, h, dur, n_streams, codec = _probe_gif(anim)
    assert (w, h) == (8, 6)
    assert codec.endswith("_2f")
    assert dur == 1000.0  # 2 x 50 cs
    assert n_streams == 1


def _mk_tiff(endian="<", pages=1, bits_array=False):
    """Hand-assembled minimal TIFF 6.0: header + one IFD per page, first
    IFD carrying dims 64x48, 3 samples/pixel, LZW compression; bits-per-
    sample inline (count 1) or as an offset-stored SHORT[3] array."""
    import struct

    e = endian
    magic = b"II*\x00" if e == "<" else b"MM\x00*"

    def entry(tag, typ, cnt, val_bytes):
        return struct.pack(e + "HHI", tag, typ, cnt) + val_bytes.ljust(4, b"\x00")

    short = lambda v: struct.pack(e + "H", v)
    ifds = b""
    off = 8
    # layout: header(8) | ifd0 | [bits array] | ifd1 ...
    n_entries = 5
    ifd_size = 2 + 12 * n_entries + 4
    bits_off = off + ifd_size * pages
    for pg in range(pages):
        nxt = off + ifd_size if pg < pages - 1 else 0
        if bits_array:
            bits_val = struct.pack(e + "I", bits_off)
            bits_cnt = 3
        else:
            bits_val = short(8)
            bits_cnt = 1
        ifd = struct.pack(e + "H", n_entries)
        ifd += entry(256, 3, 1, short(64))  # ImageWidth
        ifd += entry(257, 3, 1, short(48))  # ImageLength
        ifd += entry(258, 3, bits_cnt, bits_val)  # BitsPerSample
        ifd += entry(259, 3, 1, short(5))  # Compression = LZW
        ifd += entry(277, 3, 1, short(3))  # SamplesPerPixel
        ifd += struct.pack(e + "I", nxt)
        ifds += ifd
        off += ifd_size
    tail = short(8) * 3 if bits_array else b""
    return magic + struct.pack(e + "I", 8) + ifds + tail


def test_tiff_probe_both_endians_and_pages():
    from artan_spark.plans.mediaprobe import _NULL, _probe_tiff
    from artan_spark.plans.multimodal import detect_media_type

    for e in ("<", ">"):
        p = _mk_tiff(endian=e)
        assert detect_media_type(p) == "image/tiff"
        w, h, dur, pages, codec = _probe_tiff(p)
        assert (w, h, dur, pages) == (64, 48, None, 1)
        assert codec == "tiff_lzw_3x8bit"

    # multi-page: page count from the next-IFD chain
    assert _probe_tiff(_mk_tiff(pages=3))[3] == 3
    # offset-stored BitsPerSample array: first element read through the ptr
    assert _probe_tiff(_mk_tiff(bits_array=True))[4] == "tiff_lzw_3x8bit"
    # junk and truncation yield NULL, never raise
    assert _probe_tiff(b"II*\x00\x99\x99") == _NULL
    assert _probe_tiff(_mk_tiff()[:14]) == _NULL
