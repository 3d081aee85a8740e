"""Multimodal plumbing: Arrow-batched decode stubs over binary columns —
schemas, batch shapes, 1→N frame explosion (decode itself is stubbed,
pdfspark/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from pdfspark.multimodal import (
    _decode_image_stub,
    decode_image_meta,
    decode_image_pixels,
    sample_frames,
)


def _binary_df(spark, n=20):
    rows = [(i, bytes([i % 251]) * (10 + i * 7)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_meta_schema_and_determinism(spark):
    df = _binary_df(spark)
    out = decode_image_meta(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "width", "height", "n_frames",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 20
    for i in range(20):
        n = 10 + i * 7
        assert rows[i].width == 1 + n % 640
        assert rows[i].height == 1 + (n * 7) % 480
        assert rows[i].n_frames == 1 + n % 16


def test_frame_sampling_one_to_many(spark):
    df = _binary_df(spark, n=10)
    frames = sample_frames(df, every=4)
    got = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    for r in got:
        n_payload = 10 + r.doc_id * 7
        n_frames = 1 + n_payload % 16
        expected = (n_frames + 3) // 4
        assert r.n == expected, r.doc_id
    one = frames.filter("doc_id = 3 AND frame_idx = 0").collect()[0]
    assert isinstance(one.frame_bytes, (bytes, bytearray))
    assert len(one.frame_bytes) <= 16


def test_pixel_decode_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image_pixels(b"\x89PNG...")


def test_stub_is_deterministic():
    assert _decode_image_stub(b"abc") == _decode_image_stub(b"abc")
    assert _decode_image_stub(b"") == (1, 1, 1)


def test_resize_fixed_output_dims(spark):
    """resize_images: every payload (any length, incl. empty/null)
    lands at exactly out_w*out_h bytes; stride resampling is
    deterministic (first byte preserved, monotone source indices)."""
    from pdfspark.multimodal import resize_images

    df = _binary_df(spark).unionByName(
        spark.createDataFrame([(100, b""), (101, None)],
                              "doc_id long, payload binary"))
    out = resize_images(df, out_w=8, out_h=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 22
    for r in rows.values():
        assert (r.out_w, r.out_h) == (8, 4)
        assert len(r.resized) == 32
    # payload of constant byte k resamples to constant k
    assert bytes(rows[5].resized) == bytes([5]) * 32
    assert bytes(rows[100].resized) == bytes(32)
    assert bytes(rows[101].resized) == bytes(32)
    # deterministic across runs
    again = {r.doc_id: bytes(r.resized)
             for r in resize_images(df, 8, 4).collect()}
    assert again == {k: bytes(v.resized) for k, v in rows.items()}


def test_wav_header_parse_and_bomb_guards():
    """REAL RIFF/WAVE walking (no codec): exact field readback on the
    deterministic generator; garbage/truncation/crafted chunk sizes
    are soft Nones, never exceptions or loops."""
    from pdfspark.multimodal import parse_wav_header, synth_wav

    assert parse_wav_header(synth_wav(7)) == (2, 16000, 16, 359, 22)
    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"RIFF\xff\xff\xff\xffWAVE") is None
    assert parse_wav_header(synth_wav(7)[:40]) is None
    # crafted chunk size: huge size must not over-read or loop
    import struct
    evil = (b"RIFF" + struct.pack("<I", 1 << 30) + b"WAVE"
            + b"fmt " + struct.pack("<I", 1 << 30))
    assert parse_wav_header(evil) is None
    # extra unknown chunks before fmt/data still parse
    w = synth_wav(3)
    injected = w[:12] + b"LIST" + struct.pack("<I", 4) + b"info" + w[12:]
    injected = (b"RIFF" + struct.pack("<I", len(injected) - 8)
                + injected[8:])
    assert parse_wav_header(injected) == parse_wav_header(w)


def test_decode_audio_meta_distributed(spark):
    """The mapInPandas stage: good + malformed payloads in one batch —
    error rows, never task failures."""
    from pdfspark.multimodal import decode_audio_meta, synth_wav

    rows = [(0, bytearray(synth_wav(0))), (1, bytearray(b"junk")),
            (2, bytearray(synth_wav(2)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.channels, r.error)
           for r in decode_audio_meta(df).collect()}
    assert got[0] == (1, None)
    assert got[1] == (None, "bad-wav")
    assert got[2] == (1, None)


def test_mp4_box_walk_and_bomb_guards():
    """REAL ISO-BMFF walking: exact readback, version-1 mvhd layout,
    64-bit largesize, crafted sizes and truncation all soft-fail."""
    import struct

    from pdfspark.multimodal import parse_mp4_header, synth_mp4

    assert parse_mp4_header(synth_mp4(7)) == ("isom", 1000, 1371, 1371)
    assert parse_mp4_header(b"") is None
    assert parse_mp4_header(synth_mp4(7)[:16]) is None
    # crafted size 0xffffffff must not over-read
    evil = b"\xff\xff\xff\xffftyp" + b"isom" * 4
    assert parse_mp4_header(evil) is None
    # version-1 mvhd (64-bit duration at +24, timescale at +20)
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p
    mvhd1 = box(b"mvhd", bytes([1, 0, 0, 0]) + bytes(16)
                + struct.pack(">I", 1000) + struct.pack(">Q", 2500)
                + bytes(80))
    mp4 = box(b"ftyp", b"mp42" + bytes(8)) + box(b"moov", mvhd1)
    assert parse_mp4_header(mp4) == ("mp42", 1000, 2500, 2500)
    # ADVICE r4 #1: a truncated mvhd whose declared size is shorter
    # than its version's field layout must be None (error row), NOT a
    # silent read of the NEXT box's bytes as metadata
    short_v0 = box(b"mvhd", bytes(8))  # 12 bytes < 20-byte v0 layout
    decoy = box(b"free", struct.pack(">II", 1000, 2500) + bytes(8))
    assert parse_mp4_header(
        box(b"ftyp", b"mp42" + bytes(8)) + box(b"moov", short_v0 + decoy)
    ) is None
    short_v1 = box(b"mvhd", bytes([1, 0, 0, 0]) + bytes(20))  # 24 < 32
    assert parse_mp4_header(
        box(b"ftyp", b"mp42" + bytes(8)) + box(b"moov", short_v1 + decoy)
    ) is None


def test_image_header_walk_and_bomb_guards():
    """REAL image header parsing: exact readback for all three synth
    formats, and crafted/truncated headers all soft-fail (None), never
    raise or over-read."""
    import struct

    from pdfspark.multimodal import (
        _image_dims,
        parse_image_header,
        synth_bmp,
        synth_image,
        synth_jpeg,
        synth_png,
    )

    # exact readback, format cycling, channel derivation
    for doc_id in range(24):
        w, h = _image_dims(doc_id)
        meta = parse_image_header(synth_image(doc_id))
        assert meta is not None, doc_id
        fmt, mw, mh, depth, ch = meta
        assert (mw, mh, depth) == (w, h, 8)
        if doc_id % 3 == 0:
            assert fmt == "png"
            assert ch == (1, 3, 4)[(doc_id // 3) % 3]
        elif doc_id % 3 == 1:
            assert fmt == "jpeg"
            assert ch == (3 if doc_id % 2 else 1)
        else:
            assert fmt == "bmp"
            assert ch == (1, 3, 4)[(doc_id // 3) % 3]

    assert parse_image_header(b"") is None
    assert parse_image_header(b"not an image at all") is None
    # truncation at every byte boundary must soft-fail or parse, never raise
    for synth in (synth_png, synth_jpeg, synth_bmp):
        full = synth(5)
        for cut in range(len(full)):
            parse_image_header(full[:cut])  # must not raise
    # PNG whose first chunk is not IHDR
    sig = b"\x89PNG\r\n\x1a\n"
    evil = sig + struct.pack(">I", 13) + b"tEXt" + bytes(17)
    assert parse_image_header(evil) is None
    # PNG with an invalid color type
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 9, 0, 0, 0)
    evil = sig + struct.pack(">I", 13) + b"IHDR" + ihdr + bytes(4)
    assert parse_image_header(evil) is None
    # JPEG: segment length larger than the payload must not over-read
    evil = b"\xff\xd8\xff\xe0\xff\xff"
    assert parse_image_header(evil) is None
    # JPEG: SOS before any SOF → no dims available
    evil = b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 4) + bytes(2)
    assert parse_image_header(evil) is None
    # JPEG: an endless run of fill bytes hits the marker-count guard
    assert parse_image_header(b"\xff\xd8" + b"\xff\x01" * 1000) is None
    # BMP: zero bpp / zero dims / unknown DIB header size
    bad_dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 0, 0, 0, 0, 0, 0, 0)
    evil = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + bad_dib
    assert parse_image_header(evil) is None
    evil = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack("<I", 17)
    assert parse_image_header(evil) is None
    # BMP: negative (top-down) height is normalized, not rejected
    dib = struct.pack("<IiiHHIIiiII", 40, 6, -9, 1, 24, 0, 0, 0, 0, 0, 0)
    bmp = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib
    assert parse_image_header(bmp) == ("bmp", 6, 9, 8, 3)
    # legal non-synth bit depths map correctly; illegal ones are error
    # rows, never invented metadata (review r5 #4)
    def bmp_with(bpp):
        d = struct.pack("<IiiHHIIiiII", 40, 6, 9, 1, bpp,
                        0, 0, 0, 0, 0, 0)
        return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + d
    assert parse_image_header(bmp_with(16)) == ("bmp", 6, 9, 5, 3)
    assert parse_image_header(bmp_with(4)) == ("bmp", 6, 9, 4, 1)
    assert parse_image_header(bmp_with(0)) is None
    assert parse_image_header(bmp_with(13)) is None


def test_gif_webp_header_walks():
    """GIF + WebP header walks (r7): hand-built headers read back
    exactly for every variant (GIF 87a/89a palette depth; WebP VP8
    lossy sync, VP8L lossless bit-pack incl. the alpha bit, VP8X
    24-bit canvas incl. the alpha flag); truncations and corrupted
    signatures soft-fail, never raise. These formats are deliberately
    NOT in synth_image — the driver-visible multimodal_image_meta
    output must not change without a window slot — so the pin lives
    here."""
    import struct

    from pdfspark.multimodal import parse_image_header

    # GIF: logical screen descriptor, packed byte 0b1_001_0_010
    # (GCT present, size exponent 2 -> depth 3)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes([0x92, 0, 0])
    assert parse_image_header(gif) == ("gif", 320, 200, 3, 1)
    assert parse_image_header(
        b"GIF87a" + struct.pack("<HH", 7, 9) + bytes([0x00, 0, 0])
    ) == ("gif", 7, 9, 1, 1)
    assert parse_image_header(
        b"GIF89a" + struct.pack("<HH", 0, 9) + bytes(3)) is None
    # WebP VP8 (lossy): frame tag + 9D 01 2A sync + 14-bit dims
    def riff(fourcc, body):
        chunk = fourcc + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    vp8 = riff(b"VP8 ", bytes(3) + b"\x9d\x01\x2a"
               + struct.pack("<HH", 640, 480) + bytes(4))
    assert parse_image_header(vp8) == ("webp", 640, 480, 8, 3)
    # corrupted sync → None
    bad = bytearray(vp8)
    bad[23] ^= 1
    assert parse_image_header(bytes(bad)) is None
    # VP8L: 14-bit minus-one dims + alpha bit 28
    for alpha in (0, 1):
        bits = (100 - 1) | ((50 - 1) << 14) | (alpha << 28)
        vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits) + bytes(2))
        assert parse_image_header(vp8l) == (
            "webp", 100, 50, 8, 4 if alpha else 3)
    assert parse_image_header(
        riff(b"VP8L", b"\x30" + bytes(6))) is None  # bad signature
    # VP8X: flags byte + 24-bit le minus-one canvas
    for flags, ch in ((0x10, 4), (0x00, 3)):
        body = (bytes([flags]) + bytes(3)
                + (4096 - 1).to_bytes(3, "little")
                + (2160 - 1).to_bytes(3, "little"))
        assert parse_image_header(riff(b"VP8X", body)) == (
            "webp", 4096, 2160, 8, ch)
    # unknown first chunk / truncation at every boundary: soft-fail
    assert parse_image_header(riff(b"ANIM", bytes(8))) is None
    for full in (gif, vp8):
        for cut in range(len(full)):
            parse_image_header(full[:cut])  # must not raise
