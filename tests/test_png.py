"""Real PNG codec (functions/png.py) + the Spark decode path.

The codec is spec-correct for the 8-bit grayscale subset: round-trips
through every filter type, validates CRCs/signature/geometry, and the
Spark path (attach_png_payload → decode_png_stats) recovers the
arithmetically-known stats — proving the bytes genuinely pass through
zlib + filter reconstruction, not a fake.
"""

import zlib

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.functions.png import (
    encode_png_gray,
    decode_png_gray,
    encode_png_rgb,
    decode_png_rgb,
)
from gcp_food_delivery_data_pipeline_spark.operators.multimodal import (
    attach_png_payload,
    attach_png_rgb_payload,
    decode_png_stats,
    decode_png_rgb_stats,
)


def _gradient(w, h, c):
    return bytes(c + x + y for y in range(h) for x in range(w))


def test_roundtrip_all_filter_types():
    # cycle mode filters row y with type y % 5 → h ≥ 5 hits all five
    px = _gradient(7, 6, 30)
    for mode in ("cycle", "none"):
        data = encode_png_gray(7, 6, px, filter_mode=mode)
        assert decode_png_gray(data) == (7, 6, px)


def test_roundtrip_randomized():
    import random

    rng = random.Random(42)
    for _ in range(25):
        w, h = rng.randint(1, 33), rng.randint(1, 33)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        assert decode_png_gray(encode_png_gray(w, h, px)) == (w, h, px)


def test_signature_and_crc_validation():
    data = encode_png_gray(3, 2, bytes(6))
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"JFIF" + data)
    corrupt = bytearray(data)
    corrupt[20] ^= 0xFF  # inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(corrupt))


def test_unsupported_color_type_gated():
    data = bytearray(encode_png_gray(2, 2, bytes(4)))
    # IHDR body starts at offset 16; color type is byte 9 of the body.
    body = bytearray(data[16:29])
    body[9] = 3  # palette — outside the implemented {gray, RGB} subset
    crc = zlib.crc32(b"IHDR" + bytes(body[:13])) & 0xFFFFFFFF
    data[16:29] = body[:13]
    data[29:33] = crc.to_bytes(4, "big")
    with pytest.raises(NotImplementedError, match="color_type=3"):
        decode_png_gray(bytes(data))


def test_gray_rgb_cross_decode_gated():
    # A valid PNG of the OTHER color type raises the typed gate, not a
    # silent mis-decode.
    gray = encode_png_gray(2, 2, bytes(4))
    rgb = encode_png_rgb(2, 2, bytes(12))
    with pytest.raises(NotImplementedError, match="RGB only"):
        decode_png_rgb(gray)
    with pytest.raises(NotImplementedError, match="grayscale only"):
        decode_png_gray(rgb)


def test_rgb_roundtrip_all_filter_types():
    # h ≥ 5 cycles through all five filters at bpp=3 (the "left"
    # reference 3 bytes back — a branch the grayscale path never takes)
    px = bytes(
        b & 0xFF for y in range(6) for x in range(7) for b in (x, y, x + y)
    )
    for mode in ("cycle", "none"):
        data = encode_png_rgb(7, 6, px, filter_mode=mode)
        assert decode_png_rgb(data) == (7, 6, px)


def test_rgb_roundtrip_randomized():
    import random

    rng = random.Random(99)
    for _ in range(15):
        w, h = rng.randint(1, 21), rng.randint(1, 21)
        px = bytes(rng.randrange(256) for _ in range(w * h * 3))
        assert decode_png_rgb(encode_png_rgb(w, h, px)) == (w, h, px)


def test_multiple_idat_chunks():
    # Writers may split IDAT arbitrarily; decoder must concatenate.
    import struct

    px = _gradient(5, 4, 10)
    data = encode_png_gray(5, 4, px)
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    out = sig
    for tag, body in chunks:
        if tag == b"IDAT":
            mid = len(body) // 2
            out += chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
        else:
            out += chunk(tag, body)
    assert decode_png_gray(out) == (5, 4, px)


def test_spark_decode_stats_match_arithmetic(spark):
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    out = decode_png_stats(attach_png_payload(docs)).orderBy("doc_id")
    for row in out.collect():
        i = row["doc_id"]
        w, h, c = i % 16 + 1, i % 12 + 1, i % 200
        assert (row["width"], row["height"]) == (w, h)
        assert row["mean_px"] == pytest.approx(
            c + (w - 1) / 2 + (h - 1) / 2, abs=1e-9
        )


def test_spark_rgb_decode_stats_match_arithmetic(spark):
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    out = decode_png_rgb_stats(attach_png_rgb_payload(docs)).orderBy("doc_id")
    for row in out.collect():
        i = row["doc_id"]
        w, h = i % 12 + 1, i % 9 + 1
        cg, cb = i % 180, i % 80
        assert (row["width"], row["height"]) == (w, h)
        assert row["mean_r"] == pytest.approx(cg + (w - 1) / 2, abs=1e-9)
        assert row["mean_g"] == pytest.approx(cg + (h - 1) / 2, abs=1e-9)
        assert row["mean_b"] == pytest.approx(
            cb + (w - 1) / 2 + (h - 1) / 2, abs=1e-9
        )


def test_wav_roundtrip_and_validation():
    from gcp_food_delivery_data_pipeline_spark.functions.wav import (
        encode_wav_pcm16,
        decode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 1234]
    data = encode_wav_pcm16(samples, 12000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert decode_wav_pcm16(data) == (12000, 6, samples)
    with pytest.raises(ValueError, match="WAV"):
        decode_wav_pcm16(b"\x89PNG not audio at all")
    # stereo is outside the implemented subset → gated, not wrong
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(8))
    with pytest.raises(NotImplementedError, match="mono"):
        decode_wav_pcm16(buf.getvalue())


def test_spark_wav_stats_match_arithmetic(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav_stats,
    )

    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    for row in decode_wav_stats(attach_wav_payload(docs)).collect():
        i = row["doc_id"]
        n, c = i % 50 + 10, i % 1000
        assert row["sample_rate"] == 8000 + (i % 3) * 4000
        assert row["n_samples"] == n
        assert row["sum_samples"] == n * c + n * (n - 1) // 2


def test_spark_payloads_are_real_pngs(spark):
    docs = spark.range(0, 5).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    rows = attach_png_payload(docs).collect()
    for row in rows:
        p = bytes(row["payload"])
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, px = decode_png_gray(p)
        assert (w, h) == (row["meta"]["width"], row["meta"]["height"])
        assert len(px) == w * h


def test_truncated_crc_and_zero_area_raise_value_error():
    """Framing damage must surface as the documented ValueError, not a
    struct.error/ZeroDivisionError escaping from unpack/stats."""
    import struct
    import zlib as _zlib

    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        decode_png_gray,
        encode_png_gray,
    )

    good = encode_png_gray(2, 2, bytes([1, 2, 3, 4]))
    with pytest.raises(ValueError, match="truncated CRC"):
        decode_png_gray(good[:-2])  # cut inside the IEND CRC field

    # Structurally valid 0x0 PNG: signature + IHDR(0,0) + IDAT + IEND.
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    zero = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b""))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="zero-area"):
        decode_png_gray(zero)


def test_wav_truncated_data_chunk_raises_value_error():
    from gcp_food_delivery_data_pipeline_spark.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    good = encode_wav_pcm16([1, 2, 3, 4], 8000)
    with pytest.raises(ValueError):
        decode_wav_pcm16(good[:-3])  # frames shorter than header claims


def test_decode_stats_passthrough_equals_join_back(spark):
    """r15: ``passthrough`` must echo input columns row-aligned with
    the decoded stats — exactly the rows the old join-back produced
    (OPTIMIZATION_r15.md: it replaced a second full media scan +
    SortMergeJoin in s_media_source)."""
    docs = spark.range(0, 25).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("k"), (F.col("id") % 3).cast("string")).alias(
            "kind"
        ),
    )
    payloads = attach_png_payload(docs).join(
        docs.select("doc_id", "kind"), "doc_id"
    )
    through = decode_png_stats(payloads, passthrough=("kind",))
    joined = decode_png_stats(payloads).join(
        payloads.select("doc_id", "kind"), "doc_id"
    )
    cols = ["doc_id", "kind", "width", "height", "mean_px"]
    a = sorted(map(tuple, through.select(*cols).collect()))
    b = sorted(map(tuple, joined.select(*cols).collect()))
    assert a == b and len(a) == 25


def test_decode_stats_passthrough_rejects_collisions(spark):
    """ADVICE r15: a passthrough name equal to a stats column would
    silently overwrite the stats list (with a duplicate schema field);
    one equal to id/payload duplicates the select. Both must raise."""
    docs = spark.range(0, 3).select(F.col("id").alias("doc_id"))
    payloads = attach_png_payload(docs)
    for bad in ("width", "mean_px", "doc_id", "payload"):
        with pytest.raises(ValueError, match="collides"):
            decode_png_stats(payloads, passthrough=(bad,))
