"""Media-directory Python Data Source tests: typed rows from raw
files, magic-byte kind sniffing, size-balanced partition planning,
and payload fidelity through the real codecs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.functions.png import (
    encode_png_gray,
)
from gcp_food_delivery_data_pipeline_spark.functions.wav import (
    encode_wav_pcm16,
)
from gcp_food_delivery_data_pipeline_spark.sources.media import (
    MediaDirReader,
    register_media_source,
    sniff_kind,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("media"))
    for i in range(6):
        w, h = i % 4 + 1, i % 3 + 1
        px = bytes((i + x + y) % 200 for y in range(h) for x in range(w))
        with open(os.path.join(d, f"img_{i}.png"), "wb") as fh:
            fh.write(encode_png_gray(w, h, px))
    for i in range(3):
        with open(os.path.join(d, f"clip_{i}.wav"), "wb") as fh:
            fh.write(encode_wav_pcm16([i, i + 1, i + 2], 8000))
    with open(os.path.join(d, "notes.txt"), "wb") as fh:
        fh.write(b"not media")
    return d


@pytest.fixture(scope="module")
def media_df(spark, media_dir):
    register_media_source(spark)
    return spark.read.format("media_dir").load(media_dir)


def test_rows_kinds_and_sizes(media_df, media_dir):
    rows = {r.file_name: r for r in media_df.collect()}
    assert len(rows) == 10
    assert all(rows[f"img_{i}.png"].kind == "png" for i in range(6))
    assert all(rows[f"clip_{i}.wav"].kind == "wav" for i in range(3))
    assert rows["notes.txt"].kind == "unknown"
    for name, r in rows.items():
        assert r.n_bytes == os.path.getsize(os.path.join(media_dir, name))
        assert len(r.payload) == r.n_bytes


def test_payload_bytes_roundtrip_through_codec(media_df):
    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        decode_png_gray,
    )

    pngs = media_df.filter(F.col("kind") == "png").collect()
    assert len(pngs) == 6
    for r in pngs:
        i = int(r.file_name.split("_")[1].split(".")[0])
        w, h, pixels = decode_png_gray(bytes(r.payload))
        assert (w, h) == (i % 4 + 1, i % 3 + 1)
        assert pixels == bytes(
            (i + x + y) % 200 for y in range(h) for x in range(w)
        )


def test_pattern_option_filters_listing(spark, media_dir):
    register_media_source(spark)
    only_wav = (
        spark.read.format("media_dir")
        .option("pattern", "*.wav")
        .load(media_dir)
    )
    assert only_wav.count() == 3
    assert only_wav.filter(F.col("kind") != "wav").count() == 0


def test_partition_planning_balances_by_bytes(media_dir):
    """Driver-side planning: a small byte target must split the
    listing into multiple partitions, each within ~target of the cap
    (single oversized files still get their own split)."""
    reader = MediaDirReader(
        {"path": media_dir, "targetPartitionBytes": "150"}
    )
    parts = reader.partitions()
    assert len(parts) > 1
    all_files = [f for p in parts for f in p.files]
    assert len(all_files) == len(set(all_files)) == 10
    for p in parts[:-1]:
        total = sum(os.path.getsize(f) for f in p.files)
        assert total <= 150 or len(p.files) == 1


def test_empty_directory_yields_empty_frame(spark, tmp_path):
    register_media_source(spark)
    df = spark.read.format("media_dir").load(str(tmp_path))
    assert df.count() == 0


def test_sniff_kind_magic_bytes():
    assert sniff_kind(b"\x89PNG\r\n\x1a\nXXXX") == "png"
    assert sniff_kind(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_kind(b"RIFF\x00\x00\x00\x00AVI LIST") == "unknown"
    assert sniff_kind(b"") == "unknown"


def test_missing_path_rejected():
    with pytest.raises(ValueError, match="load\\(path\\)"):
        MediaDirReader({})
