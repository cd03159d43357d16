"""GIF codec tests: byte-level container checks, LZW round-trips
(incl. the KwKwK case and width growth), rejection of unsupported
features, and the Spark attach→decode end-to-end."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gcp_food_delivery_data_pipeline_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_gray,
    encode_gif_gray,
)


def test_container_structure():
    data = encode_gif_gray(3, 2, [bytes(range(6))])
    assert data[:6] == b"GIF89a"
    w, h, packed, _, _ = struct.unpack("<HHBBB", data[6:13])
    assert (w, h) == (3, 2)
    assert packed & 0x80  # global color table present
    assert data[-1] == 0x3B  # trailer
    # palette is the grayscale identity
    pal = data[13 : 13 + 768]
    assert pal[0:3] == b"\x00\x00\x00" and pal[765:768] == b"\xff\xff\xff"


def test_roundtrip_multiframe():
    frames = [bytes((f * 40 + i) % 256 for i in range(12)) for f in range(4)]
    w, h, out = decode_gif_gray(encode_gif_gray(4, 3, frames))
    assert (w, h) == (4, 3)
    assert out == frames


def test_lzw_general_decoder_handles_real_compression():
    """Feed the decoder a hand-built stream that EXERCISES dictionary
    codes (which our simple encoder never emits): 'aba' + dict-entry
    reuse, including the KwKwK self-reference."""
    # min_code_size 2: literals 0..3, clear=4, eoi=5, next=6, width 3
    def pack(codes, mcs=2):
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        acc = nbits = 0
        out = bytearray()
        width = mcs + 1
        next_code = eoi + 1
        first = True  # decoders add NO entry for the first post-clear code
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            if c == clear:
                width, next_code, first = mcs + 1, eoi + 1, True
            elif c != eoi:
                if first:
                    first = False
                else:
                    next_code += 1
                    if next_code == (1 << width):
                        width += 1
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    # clear, 0, 1, 6 (=0+1 -> "01"... dict[6]="01"), 8 (KwKwK), eoi
    codes = [4, 0, 1, 6, 8, 5]
    got = _lzw_decode(pack(codes), 2)
    # 0, 1, dict[6]= b'\x00\x01'? walk: prev=0; code 1 -> add 6:'01';
    # code 6 -> '01', add 7:'10'; code 8 == next -> KwKwK: '01'+'0'
    assert got == bytes([0, 1, 0, 1, 0, 1, 0])


def test_lzw_roundtrip_long_stream_crosses_clear_boundary():
    data = bytes(i % 251 for i in range(1000))  # > 200-symbol clears
    assert _lzw_decode(_lzw_encode(data), 8) == data


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_gif_gray(2, 2, [])
    with pytest.raises(ValueError):
        encode_gif_gray(2, 2, [b"\x00"])  # wrong frame size
    with pytest.raises(ValueError):
        decode_gif_gray(b"NOTGIF" + b"\x00" * 20)
    # truncated stream (no trailer / EOI)
    good = encode_gif_gray(2, 2, [bytes(4)])
    with pytest.raises(ValueError):
        decode_gif_gray(good[:20])


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=9),
    nf=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_roundtrip_property(w, h, nf, seed):
    import random

    rng = random.Random(seed)
    frames = [
        bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(nf)
    ]
    assert decode_gif_gray(encode_gif_gray(w, h, frames)) == (w, h, frames)


def test_spark_attach_decode_end_to_end(spark):
    from pyspark.sql import functions as F

    from gcp_food_delivery_data_pipeline_spark.operators.multimodal import (
        attach_gif_payload,
        decode_gif_stats,
    )

    d = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    stats = decode_gif_stats(attach_gif_payload(d)).collect()
    assert len(stats) == 40
    for r in stats:
        i = r.doc_id
        assert r.n_frames == i % 5 + 1
        assert (r.width, r.height) == (i % 10 + 1, i % 7 + 1)
        want = (i % 150) + 5.0 * (i % 5) + (i % 10) / 2.0 + (i % 7) / 2.0
        assert abs(r.mean_px - want) < 1e-9


def test_roundtrip_at_sub_block_boundaries():
    """Frames whose LZW stream crosses exact 255-byte sub-block edges
    must round-trip (the block-reassembly seam)."""
    for w in (254, 255, 256, 510):
        frame = bytes(i % 256 for i in range(w))
        assert decode_gif_gray(encode_gif_gray(w, 1, [frame]))[2] == [frame]


def test_all_malformations_raise_valueerror():
    """The reject-loudly contract: truncation ANYWHERE surfaces as
    ValueError, never IndexError/struct.error."""
    good = encode_gif_gray(4, 3, [bytes(12), bytes(range(12))])
    for cut in (3, 7, 11, 13, 100, 790, len(good) - 2):
        with pytest.raises(ValueError):
            decode_gif_gray(good[:cut])


def test_palette_less_gif_uses_raw_indices():
    """Spec-legal GIF without a global color table: indices ARE the
    gray values."""
    good = bytearray(encode_gif_gray(2, 2, [bytes([7, 8, 9, 10])]))
    # clear the GCT flag and splice the 768-byte table out
    good[10] &= 0x7F
    stripped = bytes(good[:13]) + bytes(good[13 + 768 :])
    w, h, frames = decode_gif_gray(stripped)
    assert (w, h) == (2, 2)
    assert frames == [bytes([7, 8, 9, 10])]
