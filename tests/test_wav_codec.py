"""Pure-stdlib WAV codec: round-trip, malformed-input rejection, and the
chunk-walking tolerance the RIFF spec requires."""

from __future__ import annotations

import struct

import pytest

from stock_streaming_data_pipeline_spark.operators import wav_codec


def test_roundtrip_preserves_samples_and_rate():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    payload = wav_codec.encode_wav(samples, sample_rate=44100)
    rate, out = wav_codec.decode_wav(payload)
    assert rate == 44100
    assert out == samples


def test_empty_clip_roundtrip():
    payload = wav_codec.encode_wav([], sample_rate=8000)
    rate, out = wav_codec.decode_wav(payload)
    assert (rate, out) == (8000, [])


def test_out_of_range_sample_rejected():
    with pytest.raises(ValueError, match="int16"):
        wav_codec.encode_wav([40000])


def test_decoder_tolerates_extra_chunks():
    # insert a LIST chunk between fmt and data — decoders must skip it
    payload = wav_codec.encode_wav([5, -5], sample_rate=8000)
    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    rate, out = wav_codec.decode_wav(patched)
    assert out == [5, -5]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda p: b"JUNK" + p[4:], "RIFF"),
        (lambda p: p[:-2], "length mismatch"),
        (lambda p: p[:4] + struct.pack("<I", len(p) - 9) + p[8:-1], "truncated|odd|missing"),
    ],
)
def test_decoder_rejects_malformed(mutate, msg):
    payload = wav_codec.encode_wav([1, 2, 3])
    with pytest.raises(ValueError, match=msg):
        wav_codec.decode_wav(mutate(payload))


def test_decoder_rejects_stereo():
    payload = bytearray(wav_codec.encode_wav([1, 2]))
    # channels field lives at offset fmt_body+2; find fmt chunk
    i = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, i + 2, 2)  # channels = 2
    with pytest.raises(ValueError, match="mono"):
        wav_codec.decode_wav(bytes(payload))


def test_resample_audio_decimates(spark):
    import pandas as pd

    from stock_streaming_data_pipeline_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "abcdefgh" * 8)], "doc_id long, text string"
    )
    media = multimodal.documents_as_wav_media(docs, n_samples=64)
    out = multimodal.resample_audio(media, factor=4).collect()[0]
    rate, samples = wav_codec.decode_wav(bytes(out["payload"]))
    assert rate == 2000
    raw = ("abcdefgh" * 8).encode()
    want = [(b - 100) * 128 for b in raw[:64]][::4]
    assert samples == want
    assert out["meta"]["n_frames"] == 16


def test_media_derivation_ascii_sanitized_non_ascii_parity(spark, duck):
    """Non-ASCII corpus parity for the media derivation (r3 advice): the
    Spark side slices UTF-8 BYTES while DuckDB's substr/ascii are
    code-point based, so both sides sanitize to ASCII first. Pin that a
    doc containing multi-byte characters produces identical WAV stats
    through the sanitized Spark path and a sanitized DuckDB replay."""
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.operators import multimodal
    from stock_streaming_data_pipeline_spark.plans.llmdata import (
        _ascii_text_docs,
    )

    docs = spark.createDataFrame(
        [(1, "héllo wörld 日本語 data"), (2, "plain ascii text")],
        "doc_id long, text string",
    )
    got = {
        r["media_id"]: (r["sum_s"], r["zero_crossings"])
        for r in multimodal.wav_audio_stats(
            multimodal.documents_as_wav_media(_ascii_text_docs(docs), n_samples=64)
        )
        .select("media_id", "sum_s", "zero_crossings")
        .collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        "(1, 'héllo wörld 日本語 data'), (2, 'plain ascii text')"
        ") t(doc_id, text)"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
WITH t AS (
  SELECT doc_id AS media_id,
         substr(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g')
                || repeat(' ', 64), 1, 64) AS s
  FROM d
),
sm AS (
  SELECT media_id, u.i AS pos,
         (ascii(substr(s, CAST(u.i AS INT), 1)) - 100) * 128 AS v
  FROM t, unnest(range(1, 65)) AS u(i)
),
lagd AS (
  SELECT media_id, v, lag(v) OVER (PARTITION BY media_id ORDER BY pos) AS pv
  FROM sm
)
SELECT media_id, CAST(sum(v) AS BIGINT),
       CAST(sum(CASE WHEN pv IS NOT NULL AND (pv < 0) != (v < 0)
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lagd GROUP BY media_id
"""
        ).fetchall()
    }
    assert got == want
