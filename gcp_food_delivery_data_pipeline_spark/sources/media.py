"""Media-directory data source (Spark 4 Python Data Source API):
read a directory of raw media files (PNG / WAV / anything) as a typed
DataFrame — one row per file with sniffed kind, size, and the payload
bytes as a ``binary`` column.

The reference's source surface is CSV-in-a-bucket (SURVEY.md §2.1);
a training-data pipeline's inputs also arrive as directories of media
blobs that Spark has no built-in reader for. This source supplies
that missing scan while keeping Spark's execution model:

* **Planning is metadata-only.** The driver lists file paths (names +
  sizes, never contents) and packs them into ``InputPartition``s by
  cumulative byte size, so one 2 GB video and two thousand 1 MB
  images both come out as balanced splits.
* **Bytes are read executor-side.** Each partition opens only its own
  files inside ``read()`` — payloads never pass through the driver,
  which is what lets the same code fan a 100 TB media lake across
  1000 executors. (At that scale the file LISTING itself becomes the
  bottleneck — swap the glob for a manifest table and keep the same
  partition/read shape.)
* **Typed downstream.** The payload column feeds the existing
  multimodal operators directly (``decode_png_stats`` /
  ``decode_wav_stats`` — real codecs, Arrow-batched), so
  "directory of blobs → features" is one declarative plan.

Register once per session, then it's a normal format::

    spark.dataSource.register(MediaDirDataSource)
    df = spark.read.format("media_dir").load("/data/images")
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

MEDIA_SCHEMA = (
    "path string, file_name string, kind string, n_bytes long, "
    "payload binary"
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_kind(head: bytes) -> str:
    """Container type from magic bytes (extension-independent)."""
    if head.startswith(_PNG_MAGIC):
        return "png"
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return "wav"
    return "unknown"


class _FilesPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class MediaDirReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("media_dir: .load(path) is required")
        self.pattern = options.get("pattern", "*")
        self.root = path
        self.target_bytes = int(
            options.get("targetPartitionBytes", 32 * 1024 * 1024)
        )

    def partitions(self) -> list[_FilesPartition]:
        """Size-balanced file groups from a names+sizes listing only."""
        files = sorted(
            f
            for f in _glob.glob(os.path.join(self.root, self.pattern))
            if os.path.isfile(f)
        )
        parts: list[_FilesPartition] = []
        cur: list[str] = []
        cur_bytes = 0
        for f in files:
            sz = os.path.getsize(f)
            if cur and cur_bytes + sz > self.target_bytes:
                parts.append(_FilesPartition(cur))
                cur, cur_bytes = [], 0
            cur.append(f)
            cur_bytes += sz
        if cur:
            parts.append(_FilesPartition(cur))
        # Empty dir still needs one (empty) split: Spark requires >= 1.
        return parts or [_FilesPartition([])]

    def read(self, partition: _FilesPartition):
        for path in partition.files:
            with open(path, "rb") as fh:
                data = fh.read()
            yield (
                path,
                os.path.basename(path),
                sniff_kind(data[:16]),
                len(data),
                data,
            )


class MediaDirDataSource(DataSource):
    """``spark.read.format("media_dir").load(dir)`` — options:
    ``pattern`` (glob within the dir, default ``*``) and
    ``targetPartitionBytes`` (split size target, default 32 MB)."""

    @classmethod
    def name(cls) -> str:
        return "media_dir"

    def schema(self) -> str:
        return MEDIA_SCHEMA

    def reader(self, schema) -> MediaDirReader:
        return MediaDirReader(self.options)


def register_media_source(spark) -> None:
    spark.dataSource.register(MediaDirDataSource)
