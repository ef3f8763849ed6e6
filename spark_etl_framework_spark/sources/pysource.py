"""Custom Python data sources (Spark 4 DataSource API).

The reference ships JVM connectors for its exotic inputs; Spark 4's
Python DataSource API is the idiomatic way to add a format without a
jar: implement ``DataSource``/``DataSourceReader``, register with
``spark.dataSource.register``, and ``spark.read.format(name)`` plans it
like any scan — one task per :class:`InputPartition`, so parallelism is
the partition list, not a driver loop.

:class:`TarDataSource` reads tar archives as relations — the container
format training corpora actually ship in (WebDataset-style: one tar of
many members). Schema: (archive string, member_name string, size long,
payload binary). One input partition PER ARCHIVE FILE: at 100 TB the
archive list is the parallelism unit, each task streams its own tar
(stdlib ``tarfile``; contents never concentrate on the driver). The
member walk itself is the same USTAR parsing family as
operators/multimodal.py's tar index — this class is the SOURCE form of
it (usable from ``spark.read``), the operator form handles tar blobs
already inside a column.
"""

from __future__ import annotations

import glob as _glob
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

TAR_SCHEMA = "archive string, member_name string, size long, payload binary"


class _TarPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TarDataSourceReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("tar data source requires a path option")
        self._paths = sorted(_glob.glob(path)) if any(
            c in path for c in "*?[") else [path]
        if not self._paths:
            raise FileNotFoundError(f"tar data source: no archives match {path!r}")
        for p in self._paths:
            if not os.path.exists(p):
                raise FileNotFoundError(f"tar data source: {p!r} does not exist")

    def partitions(self):
        # one task per archive: the scan parallelism IS the archive list
        return [_TarPartition(p) for p in self._paths]

    def read(self, partition: _TarPartition) -> Iterator[tuple]:
        with tarfile.open(partition.path, "r") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                f = tf.extractfile(m)
                payload = f.read() if f is not None else b""
                yield (partition.path, m.name, m.size, payload)


class TarDataSource(DataSource):
    """``spark.read.format("tar").load(path_or_glob)``."""

    @classmethod
    def name(cls) -> str:
        return "tar"

    def schema(self) -> str:
        return TAR_SCHEMA

    def reader(self, schema) -> TarDataSourceReader:
        return TarDataSourceReader(self.options)


def register_python_sources(spark) -> None:
    """Register all custom Python data sources on ``spark`` (idempotent)."""
    spark.dataSource.register(TarDataSource)
