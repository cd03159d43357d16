"""Multimodal column support: opaque binary payloads + typed metadata.

An LLM-data pipeline carries images/audio/video as ``binary`` columns
with a metadata struct alongside. This module provides the Spark-side
plumbing — schema, partition-aware batching, Arrow-batched UDF
signatures — with the actual codec calls STUBBED (image/audio libs are
not in this container): ``decode_mode="fake"`` produces deterministic
features so the full pipeline is testable end-to-end;
``decode_mode="real"`` raises ``NotImplementedError`` at the exact
point a codec library would be invoked.

Design rules that hold at 100 TB:

* Payload bytes NEVER pass through a row-at-a-time Python UDF — all
  Python crossings are Arrow batches via ``mapInPandas``.
* Metadata predicates (format/width/size filters) are plain Column
  expressions on the struct, so Catalyst pushes them into the parquet
  scan and prunes the (huge) payload column when it isn't selected.
* Feature extraction emits a bounded-size vector per row; the payload
  column is dropped before any shuffle (shuffling raw media is the #1
  scale-killer for multimodal tables).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

META_FIELDS = ["media_type", "format", "width", "height", "n_bytes"]

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_fake_payload(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a multimodal-shaped frame from the documents table:
    payload = UTF-8 bytes of the text (a deterministic stand-in for
    image bytes), metadata = typed struct derived from the content.

    Real pipelines read these columns straight from parquet; this
    exists so tests and the driver tables can exercise the plumbing.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(F.col(text_col)).cast("long")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.when((n_bytes % 2) == 0, F.lit("png")).otherwise(F.lit("jpeg")).alias(
            "format"
        ),
        ((n_bytes % 64) + 1).cast("int").alias("width"),
        ((n_bytes % 48) + 1).cast("int").alias("height"),
        n_bytes.alias("n_bytes"),
    )
    return documents.select(
        F.col(id_col), payload.alias("payload"), meta.alias("meta")
    )


def filter_by_meta(
    df: DataFrame,
    formats: list[str] | None = None,
    min_width: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Metadata predicate pushdown path — struct-field filters only.

    Selecting from ``meta.*`` never touches ``payload``: with payload
    and meta in separate parquet columns the scan skips the media bytes
    entirely (verify with ``.explain`` → ReadSchema).
    """
    out = df
    if formats is not None:
        out = out.filter(F.col("meta.format").isin(formats))
    if min_width is not None:
        out = out.filter(F.col("meta.width") >= min_width)
    if max_bytes is not None:
        out = out.filter(F.col("meta.n_bytes") <= max_bytes)
    return out


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in featurizer: byte-histogram folded to dim."""
    acc = [0.0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] += float(byte) / 255.0
    return acc


def extract_features(
    df: DataFrame,
    dim: int = 16,
    decode_mode: str = "fake",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each Arrow batch crosses to Python ONCE; the
    output drops the payload (features only), so nothing downstream
    ever shuffles media bytes. ``decode_mode="real"`` marks where a
    codec (PIL/ffmpeg/...) would decode — not available here, raises.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real media decode needs a codec library (PIL/ffmpeg); "
                    "not available in this environment — use decode_mode='fake'"
                )
            feats = [
                _fake_features(p, dim) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, FEATURE_SCHEMA)
