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

from gcp_food_delivery_data_pipeline_spark.operators.scale import (
    ensure_min_partitions,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
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

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, FEATURE_SCHEMA)


RESIZE_FLAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_payload(
    df: DataFrame,
    width: int,
    height: int,
    decode_mode: str = "fake",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize every payload to ``width x height`` — Arrow-batched, same
    (payload, meta) contract out as in, so resizes chain with the other
    multimodal ops.

    ``fake`` mode byte-cycles the source payload to exactly
    ``width*height`` bytes (empty payload → zero bytes), a
    deterministic stand-in with the real op's shape: output size is
    target-determined, content is source-determined. ``real`` marks the
    codec call site (PIL/libvips) and raises here. Output payload size
    is FIXED per call — downstream batch sizing (maxRecordsPerFile,
    Arrow batch bytes) can rely on it, which is the property a real
    thumbnailing stage is deployed for at scale.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")
    n_out = width * height

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real image resize needs a codec library (PIL/libvips); "
                    "not available in this environment — use decode_mode='fake'"
                )
            resized = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    resized.append(bytes(n_out))
                else:
                    reps = n_out // len(p) + 1
                    resized.append((bytes(p) * reps)[:n_out])
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": resized,
                    "media_type": meta["media_type"],
                    "format": meta["format"],
                    "width": width,
                    "height": height,
                    "n_bytes": n_out,
                }
            )

    flat = ensure_min_partitions(
        df.select(id_col, "payload", "meta")
    ).mapInPandas(process, RESIZE_FLAT_SCHEMA)
    return flat.select(
        "doc_id",
        "payload",
        F.struct(*META_FIELDS).alias("meta"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    decode_mode: str = "fake",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample ``n_frames`` frames from each (video-shaped) payload —
    the explode-shaped multimodal op: one input row → n output rows,
    each carrying a bounded frame payload instead of the whole video.

    ``fake`` mode emits ``n_frames`` contiguous even byte-slices
    (earlier frames get the remainder bytes), preserving the real op's
    cardinality and size arithmetic; ``real`` marks the demuxer call
    site (ffmpeg) and raises. The full payload never leaves the scan
    stage: the fan-out happens inside the same Arrow pass, and only
    frame-sized slices flow on.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"unknown decode_mode: {decode_mode!r}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real frame sampling needs a demuxer (ffmpeg); "
                    "not available in this environment — use decode_mode='fake'"
                )
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p) if p is not None else b""
                base, rem = divmod(len(p), n_frames)
                off = 0
                for i in range(n_frames):
                    size = base + (1 if i < rem else 0)
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(p[off : off + size])
                    off += size
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, FRAME_SCHEMA)


PNG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
    ]
)


def attach_png_payload(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize REAL PNG payloads (not byte fakes) from the documents
    table: each doc gets an 8-bit grayscale gradient image whose
    geometry and base shade derive from ``doc_id`` —
    ``width = id % 16 + 1``, ``height = id % 12 + 1``,
    ``pixel(x, y) = id % 200 + x + y`` (≤ 226, so no wrap). Encoding
    goes through ``functions.png.encode_png_gray`` with cycling row
    filters, so the bytes are standards-compliant PNGs any viewer
    opens, and decode exercises every PNG filter type.

    Arrow-batched like every payload producer; the meta struct carries
    the same typed fields as ``attach_fake_payload``.
    """
    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        encode_png_gray,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs, sizes = [], [], [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h, c = i % 16 + 1, i % 12 + 1, i % 200
                pixels = bytes(
                    c + x + y for y in range(h) for x in range(w)
                )
                png = encode_png_gray(w, h, pixels, filter_mode="cycle")
                ids.append(i)
                payloads.append(png)
                ws.append(w)
                hs.append(h)
                sizes.append(len(png))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "width": ws,
                    "height": hs,
                    "n_bytes": sizes,
                }
            )

    flat = ensure_min_partitions(documents.select(id_col)).mapInPandas(
        gen, out_schema
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("png").alias("format"),
            "width",
            "height",
            "n_bytes",
        ).alias("meta"),
    )


def decode_png_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """REAL image decode over the payload column: parse the PNG
    (signature, chunks, CRCs), inflate IDAT with zlib, reconstruct all
    five scanline filter types, and emit per-image stats —
    ``(doc_id, width, height, mean_px)``. This is the end-to-end form
    of the decode stage the ``decode_mode="real"`` gates elsewhere
    stub: same Arrow batching, same payload-drop-before-shuffle shape,
    but the bytes actually round-trip through a working codec
    (``functions.png``).

    ``passthrough`` names extra input columns echoed onto each output
    row (appended after the stats columns). When a caller needs scan
    metadata (e.g. the media source's ``kind``) alongside the decoded
    stats, carrying it through the Arrow batch costs a few bytes per
    row — versus the join-back alternative, which re-scans the whole
    media source (the Python Data Source API has no column pruning, so
    the "metadata" scan re-reads every payload byte) and shuffles both
    sides (guide §4.1: pass the columns the plan needs; §2.4: remove
    the join's exchanges outright).
    """
    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        decode_png_gray,
    )

    # A passthrough name that collides with a stats column would
    # silently overwrite the stats list while the schema appends a
    # duplicate field; one equal to id/payload duplicates the select
    # (ADVICE r15) — refuse both.
    reserved = {"doc_id", "width", "height", "mean_px", id_col, payload_col}
    dup = sorted(set(passthrough) & reserved)
    if dup:
        raise ValueError(
            "decode_png_stats: passthrough collides with stats/id/"
            f"payload columns: {dup}"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, pixels = decode_png_gray(bytes(p))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                means.append(sum(pixels) / (w * h))
            out = {
                "doc_id": ids, "width": ws, "height": hs, "mean_px": means
            }
            for c in passthrough:
                # row-aligned with the id/stat lists: the loop above
                # consumes pdf rows in order and never drops any
                out[c] = list(pdf[c])
            yield pd.DataFrame(out)

    src = ensure_min_partitions(
        df.select(id_col, payload_col, *passthrough)
    )
    schema = StructType(
        PNG_STATS_SCHEMA.fields
        + [df.schema[c] for c in passthrough]
    )
    return src.mapInPandas(process, schema)


PNG_RGB_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def attach_png_rgb_payload(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize REAL truecolor PNG payloads (color type 2) from the
    documents table: each doc gets an 8-bit RGB gradient whose
    geometry and base shades derive from ``doc_id`` —
    ``width = id % 12 + 1``, ``height = id % 9 + 1``,
    ``r(x,y) = id % 180 + x``, ``g(x,y) = id % 180 + y``,
    ``b(x,y) = id % 80 + x + y`` (maxima 190/187/98, so no wrap).
    Encoding goes through ``functions.png.encode_png_rgb`` with
    cycling row filters, so the bytes are standards-compliant
    truecolor PNGs and decode exercises every filter type at bpp=3
    (the "left" reference 3 bytes back — the branch the grayscale
    codec never takes).
    """
    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        encode_png_rgb,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs, sizes = [], [], [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = i % 12 + 1, i % 9 + 1
                cg, cb = i % 180, i % 80
                pixels = bytearray()
                for y in range(h):
                    for x in range(w):
                        pixels += bytes((cg + x, cg + y, cb + x + y))
                png = encode_png_rgb(w, h, bytes(pixels), filter_mode="cycle")
                ids.append(i)
                payloads.append(png)
                ws.append(w)
                hs.append(h)
                sizes.append(len(png))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "width": ws,
                    "height": hs,
                    "n_bytes": sizes,
                }
            )

    flat = ensure_min_partitions(documents.select(id_col)).mapInPandas(
        gen, out_schema
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("png").alias("format"),
            "width",
            "height",
            "n_bytes",
        ).alias("meta"),
    )


def decode_png_rgb_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL truecolor decode over the payload column: parse the PNG,
    CRC-check, inflate, reconstruct bpp=3 filters, and emit per-image
    per-channel stats ``(doc_id, width, height, mean_r, mean_g,
    mean_b)`` — the color sibling of ``decode_png_stats``, same Arrow
    batching and payload-drop-before-shuffle shape.
    """
    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        decode_png_rgb,
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, pixels = decode_png_rgb(bytes(p))
                n = w * h
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                mr.append(sum(pixels[0::3]) / n)
                mg.append(sum(pixels[1::3]) / n)
                mb.append(sum(pixels[2::3]) / n)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "mean_r": mr,
                    "mean_g": mg,
                    "mean_b": mb,
                }
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, PNG_RGB_STATS_SCHEMA)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
    ]
)


def attach_wav_payload(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize REAL WAV payloads from the documents table: each doc
    gets a mono 16-bit PCM ramp whose geometry derives from ``doc_id``
    — ``n_samples = id % 50 + 10``, ``sample_rate = 8000 + (id % 3) *
    4000``, ``sample[i] = id % 1000 + i``. Encoding goes through the
    stdlib ``wave`` writer (``functions.wav``), so the bytes are
    standards-compliant RIFF/PCM any audio tool opens.
    """
    from gcp_food_delivery_data_pipeline_spark.functions.wav import (
        encode_wav_pcm16,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, rates, sizes = [], [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                n, rate, c = i % 50 + 10, 8000 + (i % 3) * 4000, i % 1000
                wav = encode_wav_pcm16([c + k for k in range(n)], rate)
                ids.append(i)
                payloads.append(wav)
                rates.append(rate)
                sizes.append(len(wav))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "sample_rate": rates,
                    "n_bytes": sizes,
                }
            )

    flat = ensure_min_partitions(documents.select(id_col)).mapInPandas(
        gen, out_schema
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("format"),
            F.col("sample_rate").alias("width"),
            F.lit(1).alias("height"),
            "n_bytes",
        ).alias("meta"),
    )


def decode_wav_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode over the payload column: parse the RIFF
    container with the stdlib ``wave`` reader, unpack the PCM frames,
    and emit per-clip stats ``(doc_id, sample_rate, n_samples,
    sum_samples)`` — the audio twin of ``decode_png_stats``, same
    Arrow batching, same payload-drop-before-shuffle shape.
    """
    from gcp_food_delivery_data_pipeline_spark.functions.wav import (
        decode_wav_pcm16,
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, counts, sums = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                rate, n, samples = decode_wav_pcm16(bytes(p))
                ids.append(doc_id)
                rates.append(rate)
                counts.append(n)
                sums.append(sum(samples))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": rates,
                    "n_samples": counts,
                    "sum_samples": sums,
                }
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, WAV_STATS_SCHEMA)


GIF_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
    ]
)


def attach_gif_payload(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize REAL animated-GIF payloads (functions/gif.py) from
    the documents table — the VIDEO-shaped media column: ``n_frames =
    id % 5 + 1`` grayscale frames of ``(id % 10 + 1) × (id % 7 + 1)``,
    frame f's pixel(x, y) = ``id % 150 + 10·f + x + y`` (≤ 204, no
    wrap). Bytes are standards-compliant GIF89a any viewer animates;
    the arithmetic construction is what lets the oracle pin decode
    stats in closed form."""
    from gcp_food_delivery_data_pipeline_spark.functions.gif import (
        encode_gif_gray,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("n_frames", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, nfs, ws, hs, sizes = [], [], [], [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                nf, w, h, c = i % 5 + 1, i % 10 + 1, i % 7 + 1, i % 150
                frames = [
                    bytes(
                        c + 10 * f + x + y
                        for y in range(h)
                        for x in range(w)
                    )
                    for f in range(nf)
                ]
                gif = encode_gif_gray(w, h, frames)
                ids.append(i)
                payloads.append(gif)
                nfs.append(nf)
                ws.append(w)
                hs.append(h)
                sizes.append(len(gif))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "n_bytes": sizes,
                }
            )

    flat = ensure_min_partitions(documents.select(id_col)).mapInPandas(
        gen, out_schema
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("gif").alias("format"),
            "n_frames",
            "width",
            "height",
            "n_bytes",
        ).alias("meta"),
    )


def decode_gif_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL multi-frame decode over the payload column: parse the GIF
    container, LZW-decode EVERY frame, and emit
    ``(doc_id, n_frames, width, height, mean_px)`` where ``mean_px``
    averages over all frames' pixels — the working form of the
    frame-sampling stage the ``decode_mode="real"`` gates stub."""
    from gcp_food_delivery_data_pipeline_spark.functions.gif import (
        decode_gif_gray,
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, ws, hs, means = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, frames = decode_gif_gray(bytes(p))
                ids.append(doc_id)
                nfs.append(len(frames))
                ws.append(w)
                hs.append(h)
                means.append(
                    sum(sum(f) for f in frames) / (w * h * len(frames))
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "mean_px": means,
                }
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, GIF_STATS_SCHEMA)


def attach_gif_scene_payload(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize animated GIFs with SCENE STRUCTURE: ``n_frames =
    id % 6 + 2`` grayscale frames of ``(id % 10 + 1) × (id % 7 + 1)``;
    frame f's pixel(x, y) = ``base_f + x + y`` where ``base_0 =
    id % 40`` and each transition adds 25 (a cut) when
    ``(id + f) % 3 == 0``, else 2 (intra-scene drift). Max pixel
    40 + 6·25 + 9 + 6 = 205 — no wrap. Same closed-form-construction
    contract as ``attach_gif_payload``: the bytes are real GIF89a,
    and the cut schedule is pure doc_id arithmetic the oracle
    replays."""
    from gcp_food_delivery_data_pipeline_spark.functions.gif import (
        encode_gif_gray,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("n_frames", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, nfs, ws, hs = [], [], [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                nf, w, h = i % 6 + 2, i % 10 + 1, i % 7 + 1
                base = i % 40
                frames = []
                for f in range(nf):
                    if f > 0:
                        base += 25 if (i + f) % 3 == 0 else 2
                    frames.append(
                        bytes(
                            base + x + y
                            for y in range(h)
                            for x in range(w)
                        )
                    )
                ids.append(i)
                payloads.append(encode_gif_gray(w, h, frames))
                nfs.append(nf)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                }
            )

    return ensure_min_partitions(documents.select(id_col)).mapInPandas(
        gen, out_schema
    )


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("n_cuts", IntegerType()),
        StructField("max_jump", LongType()),
    ]
)


def gif_scene_cuts(
    df: DataFrame,
    threshold_px: int = 20,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Scene-cut detection over REAL decoded GIF payloads: LZW-decode
    every frame, take each frame's EXACT integer pixel sum, and call
    a transition a cut when the per-pixel jump exceeds
    ``threshold_px`` — compared ALL-INTEGER as
    ``|S_f − S_{f−1}| > threshold_px · w · h``, so no float mean ever
    enters the decision (the pHash rule). Emits ``(doc_id, n_frames,
    n_cuts, max_jump)`` with ``max_jump`` the largest per-pixel jump
    (exact: sum deltas here are integer multiples of w·h).

    This is the video-pipeline sampling primitive: shot boundaries
    pick the frames worth featurizing. Arrow-batched ``mapInPandas``;
    payloads stay inside their partition — only the 4-column stats
    frame ever shuffles.
    """
    from gcp_food_delivery_data_pipeline_spark.functions.gif import (
        decode_gif_gray,
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, cuts, jumps = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, frames = decode_gif_gray(bytes(p))
                sums = [sum(f) for f in frames]
                deltas = [
                    abs(b - a) for a, b in zip(sums, sums[1:])
                ]
                ids.append(doc_id)
                nfs.append(len(frames))
                cuts.append(
                    sum(1 for d in deltas if d > threshold_px * w * h)
                )
                jumps.append(
                    max(deltas) // (w * h) if deltas else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfs,
                    "n_cuts": cuts,
                    "max_jump": jumps,
                }
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, SCENE_CUT_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("phash", LongType()),
    ]
)


def phash_png(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual (average) hash of REAL decoded PNG payloads: decode
    the image (full codec path — chunks, CRCs, zlib, filters), sample
    a fixed 7x7 grid (x_i = i*w//7, y_j = j*h//7), and set bit
    k = 7*i + j when the sample exceeds the grid mean. 49 bits fit a
    positive BIGINT, and the comparison is ALL-INTEGER
    (49*sample > sum-of-samples) — no float mean, so the hash is
    engine- and platform-exact.

    This is the image twin of SimHash: near-identical images differ in
    few bits, so hamming-band bucketing (group by hash bands) finds
    visual near-duplicates without pairwise comparison — the
    image-dedup stage of a multimodal corpus pipeline. Same Arrow
    batching and payload-drop-before-shuffle shape as the decode
    stats; downstream grouping shuffles only (id, hash).
    """
    from gcp_food_delivery_data_pipeline_spark.functions.png import (
        decode_png_gray,
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, pixels = decode_png_gray(bytes(p))
                xs = [(i * w) // 7 for i in range(7)]
                ys = [(j * h) // 7 for j in range(7)]
                samples = [
                    pixels[y * w + x] for x in xs for y in ys
                ]  # k = 7*i + j order
                total = sum(samples)
                hv = 0
                for k, s in enumerate(samples):
                    if 49 * s > total:
                        hv |= 1 << k
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                hashes.append(hv)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, PHASH_SCHEMA)


def phash_groups(phashed: DataFrame) -> DataFrame:
    """Visual-duplicate groups by exact perceptual-hash identity:
    ``(phash, n_images, min_doc_id)`` for hashes shared by 2+ images
    — the keep-first dedup view over the perceptual key (hamming-
    tolerant matching bands the hash like SimHash; exact identity is
    the zero-distance special case and the common case for re-encoded
    identical images). One combinable groupBy."""
    return (
        phashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_images") >= 2)
    )


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("max_frame_energy", LongType()),
        StructField("total_energy", LongType()),
    ]
)


def audio_frame_features(
    df: DataFrame,
    frame_size: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-level audio features over REAL WAV decode: split each
    clip's PCM samples into fixed ``frame_size`` windows and emit per
    clip ``(n_frames, max_frame_energy, total_energy)`` where a
    frame's energy is its integer sum of squared samples — the
    short-time-energy primitive under VAD / silence trimming /
    loudness normalization in an audio-corpus pipeline. Clips shorter
    than one full frame are dropped (a partial window has no
    comparable energy); the trailing partial frame is discarded,
    standard hop=frame framing.

    All-integer arithmetic end to end, so the SQL oracle (which
    regenerates the deterministic ramp samples and aggregates them
    relationally) matches bit-for-bit — no float summation order to
    diverge. Same Arrow-batched ``mapInPandas`` shape as
    ``decode_wav_stats``: payload bytes never cross a shuffle, one
    output row per clip.
    """
    from gcp_food_delivery_data_pipeline_spark.functions.wav import (
        decode_wav_pcm16,
    )

    if frame_size < 1:
        raise ValueError(
            f"audio_frame_features: frame_size must be >= 1, got {frame_size}"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, mx, tot = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                _rate, n, samples = decode_wav_pcm16(bytes(p))
                full = n // frame_size
                if not full:
                    continue
                energies = [
                    sum(
                        v * v
                        for v in samples[f * frame_size : (f + 1) * frame_size]
                    )
                    for f in range(full)
                ]
                ids.append(doc_id)
                nfr.append(full)
                mx.append(max(energies))
                tot.append(sum(energies))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nfr, dtype="int32"),
                    "max_frame_energy": pd.Series(mx, dtype="int64"),
                    "total_energy": pd.Series(tot, dtype="int64"),
                }
            )

    src = ensure_min_partitions(df.select(id_col, payload_col))
    return src.mapInPandas(process, AUDIO_FRAME_SCHEMA)
