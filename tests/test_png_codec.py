"""Pure-stdlib PNG codec tests.

The filter tests build PNGs BY HAND with a test-side implementation of
the spec's forward filter functions (RFC 2083 §6.1) — independent of the
codec's unfiltering code — so a decode match proves the decoder inverts
the real filters, not just its own encoder's filter-0 output.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from stock_streaming_data_pipeline_spark.operators import multimodal, png_codec
from stock_streaming_data_pipeline_spark.operators.png_codec import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _hand_png(width, height, channels, pixels, filter_types, color_type=None):
    """Build a PNG with per-row forward filtering implemented from the
    spec, independently of the codec under test."""
    ct = {1: 0, 3: 2, 4: 6, 2: 4}[channels] if color_type is None else color_type
    stride = width * channels
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row = bytearray(pixels[y * stride : (y + 1) * stride])
        ft = filter_types[y]
        out = bytearray(stride)
        for i in range(stride):
            left = row[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if ft == 0:
                out[i] = row[i]
            elif ft == 1:
                out[i] = (row[i] - left) & 0xFF
            elif ft == 2:
                out[i] = (row[i] - up) & 0xFF
            elif ft == 3:
                out[i] = (row[i] - ((left + up) >> 1)) & 0xFF
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[i] = (row[i] - pred) & 0xFF
        raw += bytes([ft]) + out
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ct, 0, 0, 0)
    return (
        png_codec.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(channels):
    rng = random.Random(42 + channels)
    w, h = 13, 7
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    blob = encode_png(px, w, h, channels=channels)
    assert is_png(blob)
    gw, gh, gch, gpx = decode_png(blob)
    assert (gw, gh, gch) == (w, h, channels)
    assert bytes(gpx) == px


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decoder_inverts_each_spec_filter(ftype):
    """Every scanline filtered with the same type, RGB pixels."""
    rng = random.Random(100 + ftype)
    w, h, ch = 9, 5, 3
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    blob = _hand_png(w, h, ch, px, [ftype] * h)
    gw, gh, gch, gpx = decode_png(blob)
    assert (gw, gh, gch) == (w, h, ch)
    assert bytes(gpx) == px


def test_decoder_inverts_mixed_filters_per_row():
    rng = random.Random(7)
    w, h, ch = 16, 10, 1
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    filters = [rng.randrange(5) for _ in range(h)]
    blob = _hand_png(w, h, ch, px, filters)
    assert bytes(decode_png(blob)[3]) == px


def test_palette_expansion():
    # 2 palette entries: red-ish and blue-ish; 4x2 image of indexes
    palette = bytes([200, 10, 20, 5, 15, 250])
    idx = bytes([0, 1, 1, 0, 1, 0, 0, 1])
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[:4] + b"\x00" + idx[4:]
    blob = (
        png_codec.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch) == (4, 2, 3)
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert bytes(px) == expect


def test_crc_corruption_rejected():
    blob = bytearray(encode_png(bytes(range(16)), 4, 4))
    # flip one bit inside the IDAT payload (after magic+IHDR chunk)
    idat_at = blob.find(b"IDAT")
    blob[idat_at + 6] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_interlace_and_16bit_rejected():
    px = bytes(range(16))
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    raw = b"".join(b"\x00" + px[i * 4 : (i + 1) * 4] for i in range(4))
    blob_i = (
        png_codec.PNG_MAGIC
        + _chunk(b"IHDR", ihdr_i)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(blob_i)
    ihdr_16 = struct.pack(">IIBBBBB", 4, 2, 16, 0, 0, 0, 0)
    blob_16 = (
        png_codec.PNG_MAGIC
        + _chunk(b"IHDR", ihdr_16)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(blob_16)


def test_not_png_rejected():
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")
    assert not is_png(None) and not is_png(b"GIF89a")


def test_resize_nearest_is_floor_index_map():
    # 8x8 gradient gray: pixel(y,x) = y*16+x  -> 4x4 takes every 2nd
    px = bytes((y * 16 + x) & 0xFF for y in range(8) for x in range(8))
    blob = encode_png(px, 8, 8)
    out = resize_nearest(blob, 4, 4)
    w, h, ch, got = decode_png(out)
    assert (w, h, ch) == (4, 4, 1)
    expect = bytes(px[(2 * y) * 8 + 2 * x] for y in range(4) for x in range(4))
    assert bytes(got) == expect


def test_decode_image_dispatch():
    blob = encode_png(bytes(range(8)), 4, 2)
    assert multimodal.decode_image(blob)[:3] == (4, 2, 1)
    # JPEG signatures route to the real baseline codec now (jpeg_codec);
    # malformed JPEG bytes are a codec error, not an unimplemented format
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 not a real jpeg")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"GIF89a not supported")


def test_png_feature_extraction_real_path(spark):
    """extract_features' default decoder takes the real-pixel path for
    PNG payloads end-to-end through mapInPandas."""
    from stock_streaming_data_pipeline_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = multimodal.documents_as_png_media(docs, width=8, height=8)
    feats = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert feats and set(feats) == set(raw)
    for did, text in raw.items():
        b = text.encode()[:64].ljust(64, b" ")
        f = feats[did]
        assert f[0] == 8.0 and f[1] == 8.0 and f[2] == 1.0 and f[3] == 64.0
        assert abs(f[4] - sum(b) / 64 / 255.0) < 1e-12
        assert f[5] == min(b) / 255.0 and f[6] == max(b) / 255.0


# ---------------------------------------------------------------------------
# PSEQ video container
# ---------------------------------------------------------------------------


def test_pngseq_container_walk_selects_correct_frame():
    from stock_streaming_data_pipeline_spark.operators import multimodal, png_codec

    frames = [
        png_codec.encode_png(bytes([i] * 4), 2, 2) for i in (10, 20, 30)
    ]
    seq = multimodal.encode_pngseq(frames)
    for i, want in enumerate((10, 20, 30)):
        got = multimodal.decode_pngseq_frame(seq, i)
        assert got == frames[i]
        _, _, _, px = png_codec.decode_png(got)
        assert list(px) == [want] * 4


def test_pngseq_rejects_bad_magic_and_range():
    import pytest

    from stock_streaming_data_pipeline_spark.operators import multimodal, png_codec

    seq = multimodal.encode_pngseq(
        [png_codec.encode_png(b"\x00" * 4, 2, 2)]
    )
    with pytest.raises(ValueError, match="PSEQ"):
        multimodal.decode_pngseq_frame(b"JUNK" + seq[4:], 0)
    with pytest.raises(IndexError):
        multimodal.decode_pngseq_frame(seq, 1)
