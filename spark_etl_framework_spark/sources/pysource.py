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
    def __init__(self, path: str, pushed=()):
        self.path = path
        self.pushed = list(pushed)


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
        self._pushed = []

    def pushFilters(self, filters):
        """Accept member_name equality/prefix and size bounds; everything
        else is returned to Spark to evaluate post-scan. A pushed filter
        is applied DURING the member walk (read below) BEFORE
        ``extractfile`` — so filtered members' payload bytes are never
        read off disk, which is the whole point of pushdown on a format
        whose per-member metadata (name, size) lives in the header."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            LessThan,
            StringStartsWith,
        )

        for f in filters:
            attr = ".".join(f.attribute) if hasattr(f, "attribute") else None
            if isinstance(f, (EqualTo, StringStartsWith)) and attr == "member_name":
                self._pushed.append(f)
            elif isinstance(f, (GreaterThan, LessThan)) and attr == "size":
                self._pushed.append(f)
            else:
                yield f  # unsupported — Spark evaluates it after the scan

    def _keep(self, name: str, size: int) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            LessThan,
            StringStartsWith,
        )

        for f in self._pushed:
            if isinstance(f, EqualTo) and name != f.value:
                return False
            if isinstance(f, StringStartsWith) and not name.startswith(f.value):
                return False
            if isinstance(f, GreaterThan) and not size > f.value:
                return False
            if isinstance(f, LessThan) and not size < f.value:
                return False
        return True

    def partitions(self):
        # one task per archive: the scan parallelism IS the archive list
        return [_TarPartition(p, self._pushed) for p in self._paths]

    def read(self, partition: _TarPartition) -> Iterator[tuple]:
        self._pushed = partition.pushed
        with tarfile.open(partition.path, "r") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                if not self._keep(m.name, m.size):
                    continue  # header-only skip: payload never read
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

    def writer(self, schema, overwrite: bool) -> "TarDataSourceWriter":
        return TarDataSourceWriter(self.options, overwrite)

    def streamReader(self, schema) -> "TarStreamReader":
        return TarStreamReader(self.options)




# ---------------------------------------------------------------------------
# Streaming source: offset-managed document feed
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402

DOCFEED_SCHEMA = "doc_id bigint, text string"


class _DocFeedPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class DocFeedStreamReader(DataSourceStreamReader):
    """Offset-managed micro-batch reader over a documents parquet file.

    The full streaming-connector contract — the part every real source
    (Kafka, Kinesis, a CDC log) implements and the gated jar connectors
    could not demonstrate here: ``initialOffset`` starts at row 0,
    ``latestOffset`` advances by at most ``maxRowsPerBatch`` per trigger
    (rate limiting), ``partitions(start, end)`` splits each batch into
    row-range tasks executed on EXECUTORS (pyarrow reads the slice — the
    driver never touches row data), and an unfinished batch replays
    exactly (offsets are deterministic row positions), which is the
    at-least-once recovery story checkpoints depend on."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("docfeed requires a path option (documents parquet)")
        self._batch = int(options.get("maxRowsPerBatch", "2000"))
        self._tasks = int(options.get("tasksPerBatch", "4"))
        # reader-side position WAL: offset management runs on the DRIVER,
        # and a RESTARTED query whose batches were all committed calls
        # latestOffset() FIRST — before any partitions()/commit() could
        # feed the checkpointed position back into a fresh counter. With
        # no durable position the counter restarts at 0, latestOffset
        # returns an offset BELOW the checkpoint, the engine WALs it, and
        # a later batch re-serves already-delivered rows (round-6 ADVICE).
        # The position file closes that hole; on a real cluster it lives
        # next to the checkpoint dir (shared storage).
        self._posfile = options.get("positionFile")
        import pyarrow.parquet as pq

        self._n = pq.ParquetFile(self._path).metadata.num_rows

    def _load_pos(self) -> int:
        if not self._posfile or not os.path.exists(self._posfile):
            return 0
        try:
            with open(self._posfile) as f:
                return int(f.read().strip() or 0)
        except (OSError, ValueError):
            return 0

    def _save_pos(self, pos: int) -> None:
        if not self._posfile:
            return
        tmp = self._posfile + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(pos))
        os.replace(tmp, self._posfile)  # atomic — no torn position

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        # Advance by one rate-limited batch per trigger until exhausted.
        # The counter is seeded from the position WAL on the first call
        # (restart safety, above) and partitions()/commit() keep feeding
        # the engine's authoritative offsets back in, so latestOffset
        # never goes backward within or across incarnations.
        if not hasattr(self, "_cur"):
            self._cur = self._load_pos()
        self._cur = min(self._cur + self._batch, self._n)
        return {"row": self._cur}

    def commit(self, end) -> None:
        self._cur = max(getattr(self, "_cur", 0), end["row"])
        self._save_pos(self._cur)

    def partitions(self, start, end):
        # the engine's offsets are authoritative (checkpoint WAL) — sync
        # the rate-limit counter so a recovered reader resumes, not rewinds
        self._cur = max(getattr(self, "_cur", 0), start["row"], end["row"])
        lo, hi = start["row"], end["row"]
        if lo >= hi:
            return []
        step = max(1, (hi - lo + self._tasks - 1) // self._tasks)
        return [
            _DocFeedPartition(self._path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _DocFeedPartition):
        import pyarrow.parquet as pq

        # Row-group-pruned slice off the columnar file (executor-side):
        # only row groups overlapping [start, end) are decoded, so a task
        # reading rows 2000–3000 of a 10M-row file touches one group's
        # pages, not the whole file — the difference between O(batch) and
        # O(file) work per micro-batch at scale.
        pf = pq.ParquetFile(partition.path)
        md = pf.metadata
        groups, first = [], 0
        for g in range(md.num_row_groups):
            n = md.row_group(g).num_rows
            if first < partition.end and first + n > partition.start:
                groups.append((g, first))
            first += n
        if not groups:
            return iter(())
        base = groups[0][1]  # file-absolute row index of the first group
        t = pf.read_row_groups(
            [g for g, _ in groups], columns=["doc_id", "text"]
        )
        sl = t.slice(
            partition.start - base, partition.end - partition.start
        )
        ids = sl.column("doc_id").to_pylist()
        txts = sl.column("text").to_pylist()
        return iter(zip(ids, txts))


class DocFeedDataSource(DataSource):
    """``spark.readStream.format("docfeed").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "docfeed"

    def schema(self) -> str:
        return DOCFEED_SCHEMA

    def streamReader(self, schema) -> DocFeedStreamReader:
        return DocFeedStreamReader(self.options)




# ---------------------------------------------------------------------------
# Batch writer: WebDataset-style tar shards with two-phase commit
# ---------------------------------------------------------------------------

import dataclasses

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


@dataclasses.dataclass
class _TarCommit(WriterCommitMessage):
    tmp_path: str
    n_members: int


class TarDataSourceWriter(DataSourceWriter):
    """Write (member_name string, payload binary) rows as tar shards —
    one shard per task — under the OFFICIAL two-phase commit contract:
    each task writes to a ``_tmp_<uuid>`` file and returns a commit
    message; only if EVERY task succeeds does the driver's ``commit``
    rename the temporaries to ``shard_<i>.tar`` (plus a ``_SUCCESS``
    marker), and ``abort`` removes them — so a half-failed job never
    leaves a readable partial dataset. This is the job-commit protocol
    every real sink implements (the FileOutputCommitter story), here in
    ~40 lines of Python."""

    def __init__(self, options, overwrite: bool):
        import uuid as _uuid

        self._path = options.get("path")
        if not self._path:
            raise ValueError("tar writer requires a path option")
        self._overwrite = overwrite
        # per-job unique shard-name component: two append jobs into the
        # same directory must not collide on shard_0000.tar (the second
        # silently destroyed the first's data — round-6 ADVICE)
        self._job = _uuid.uuid4().hex[:12]

    def write(self, rows) -> _TarCommit:
        import io
        import tarfile as _tar
        import uuid as _uuid

        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f"_tmp_{_uuid.uuid4().hex}.tar")
        n = 0
        with _tar.open(tmp, "w") as tf:
            for r in rows:
                data = bytes(r.payload)
                ti = _tar.TarInfo(name=r.member_name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
                n += 1
        return _TarCommit(tmp_path=tmp, n_members=n)

    def commit(self, messages) -> None:
        # rename the NEW shards in first (their per-job names cannot
        # collide with any previous job's), THEN remove the previous
        # job's shards. Ordering matters for crash safety: a failure
        # before commit() leaves the old dataset untouched, and a crash
        # INSIDE commit() can only leave old+new side by side (duplicate
        # rows, recoverable by re-running the overwrite) — never data
        # loss, which the old delete-first ordering risked if the crash
        # landed between the removal loop and the renames
        new_names: set[str] = set()
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.tmp_path
        )):
            dst = os.path.join(self._path, f"shard_{self._job}_{i:04d}.tar")
            os.replace(m.tmp_path, dst)
            new_names.add(dst)
        if self._overwrite:
            for old in _glob.glob(os.path.join(self._path, "shard_*.tar")):
                if old not in new_names:
                    os.remove(old)
        with open(os.path.join(self._path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.tmp_path)
                except FileNotFoundError:
                    pass


class _TarStreamPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TarStreamReader(DataSourceStreamReader):
    """Auto-loader over tar shards: each micro-batch ingests up to
    ``maxFilesPerBatch`` NEWLY-ARRIVED archives — the cloud-files
    ingestion pattern (new shards land in a directory; the stream picks
    each up exactly once), with one executor task per archive.

    Archives are tracked by FILENAME IDENTITY, never by position in the
    sorted listing: an offset that meant "the first N sorted names" shifts
    when a lexicographically-earlier archive lands late, re-ingesting an
    old shard and permanently skipping the new one (round-6 ADVICE). The
    design here is Spark's own FileStreamSource contract: the offset
    payload is a plain batch counter, and the reader keeps its own
    batch→file-list log (in memory, and — when ``stateDir`` is set —
    persisted as one JSON file per batch with atomic rename), so
    ``partitions(start, end)`` replays exactly the files those batches
    contained regardless of what the directory looks like now. The
    persisted log also seeds the counter on restart, so a fresh reader's
    ``latestOffset`` can never regress below the checkpoint (the docfeed
    lesson); on a real cluster ``stateDir`` lives next to the query
    checkpoint on shared storage. ``stateDir`` is therefore effectively
    REQUIRED for any query that must survive restart — without it a
    restarted reader has no log to replay and ``partitions()`` fails
    loudly rather than guessing. ``commit()`` prunes the log up to the
    committed offset (in memory and on disk), folding pruned batches into
    one compact ``seen.json`` snapshot, so a long-running stream's state
    is O(live batches + one file-name set), not O(triggers)."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("tar stream source requires a path option")
        self._glob = path
        self._per_batch = int(options.get("maxFilesPerBatch", "1"))
        self._state_dir = options.get("stateDir")
        self._batches: dict[int, list[str]] = {}
        self._seen: set[str] = set()
        self._cur = 0
        self._load_state()

    def _load_state(self) -> None:
        import json as _json

        if not self._state_dir:
            return
        os.makedirs(self._state_dir, exist_ok=True)
        # compact snapshot first: the committed-and-pruned history folded
        # into one {batch, files} record by commit() — seeds both the
        # seen-set and the counter floor
        snap = os.path.join(self._state_dir, "seen.json")
        if os.path.exists(snap):
            with open(snap) as f:
                d = _json.load(f)
            self._seen.update(d["files"])
            self._cur = max(self._cur, d["batch"])
        for p in _glob.glob(os.path.join(self._state_dir, "batch-*.json")):
            k = int(os.path.basename(p)[len("batch-") : -len(".json")])
            with open(p) as f:
                files = _json.load(f)
            self._batches[k] = files
            self._seen.update(files)
            self._cur = max(self._cur, k)

    def _save_batch(self, k: int, files: list[str]) -> None:
        import json as _json

        if not self._state_dir:
            return
        final = os.path.join(self._state_dir, f"batch-{k}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(files, f)
        os.replace(tmp, final)  # atomic: a torn log entry never exists

    def _archives(self) -> list[str]:
        return sorted(_glob.glob(self._glob))

    def initialOffset(self):
        return {"batch": 0}

    def latestOffset(self):
        # identity-based discovery: whatever is on disk MINUS what any
        # prior batch ingested, in sorted order for determinism — a
        # late-arriving lexically-earlier name is simply new
        fresh = [p for p in self._archives() if p not in self._seen]
        fresh = fresh[: self._per_batch]
        if fresh:
            self._cur += 1
            self._batches[self._cur] = fresh
            self._save_batch(self._cur, fresh)  # WAL before the offset escapes
            self._seen.update(fresh)
        return {"batch": self._cur}

    def commit(self, end) -> None:
        import json as _json

        self._cur = max(self._cur, end["batch"])
        # prune the log up to the committed offset: per-batch file lists
        # (memory + one JSON per trigger on disk) would otherwise grow
        # without bound over a long-running stream. Fold the pruned
        # batches' files into ONE compact seen-snapshot BEFORE deleting
        # their log entries — a crash between the two leaves both records,
        # which re-load merges harmlessly (sets union)
        done = end["batch"]
        pruned = sorted(k for k in self._batches if k <= done)
        if not pruned:
            return
        if self._state_dir:
            snap = os.path.join(self._state_dir, "seen.json")
            prev = {"batch": 0, "files": []}
            if os.path.exists(snap):
                with open(snap) as f:
                    prev = _json.load(f)
            files = set(prev["files"])
            for k in pruned:
                files.update(self._batches[k])
            tmp = snap + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(
                    {"batch": max(done, prev["batch"]), "files": sorted(files)}, f
                )
            os.replace(tmp, snap)
            for k in pruned:
                try:
                    os.remove(os.path.join(self._state_dir, f"batch-{k}.json"))
                except FileNotFoundError:
                    pass
        for k in pruned:
            del self._batches[k]

    def partitions(self, start, end):
        self._cur = max(self._cur, start["batch"], end["batch"])
        files: list[str] = []
        for k in range(start["batch"] + 1, end["batch"] + 1):
            if k not in self._batches:
                raise RuntimeError(
                    f"tar stream source: batch {k} is not in the reader's "
                    "file log — a restarted query needs the stateDir "
                    "option (persisted batch→file log) to replay offsets"
                )
            files.extend(self._batches[k])
        return [_TarStreamPartition(p) for p in files]

    def read(self, partition: _TarStreamPartition):
        with tarfile.open(partition.path, "r") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                f = tf.extractfile(m)
                yield (partition.path, m.name, m.size, f.read() if f else b"")


def register_python_source(spark, cls) -> None:
    """Register one Python data source on ``spark``, robust to Spark
    4.1's split registries: ``newSession()`` SHARES the duplicate-check
    registry with its parent but NOT the lookup registry, so on a child
    session the public ``spark.dataSource.register`` raises
    DATA_SOURCE_ALREADY_EXISTS while ``format(name)`` still fails with
    DATA_SOURCE_NOT_FOUND (observed with the pipeline runner's per-job
    sessions: the read half of a flight roundtrip resolved, the write
    half did not). When the public route trips the duplicate check,
    register straight into THIS session's ``DataSourceManager`` — the
    registry lookup actually consults."""
    name = cls.name()
    try:
        spark.dataSource.register(cls)
        return
    except Exception as e:  # noqa: BLE001
        if "ALREADY_EXISTS" not in str(e):
            raise
    mgr = spark._jsparkSession.sessionState().dataSourceManager()
    if mgr.dataSourceExists(name):
        return
    from pyspark.sql.udf import _wrap_function

    sc = spark.sparkContext
    wrapped = _wrap_function(sc, cls)
    ds = getattr(
        sc._jvm,
        "org.apache.spark.sql.execution.datasources.v2.python.UserDefinedPythonDataSource",
    )(wrapped)
    mgr.registerDataSource(name, ds)


def register_python_sources(spark) -> None:
    """Register all custom Python data sources on ``spark`` (idempotent).

    Also enables Python-source filter pushdown (off by default in
    Spark 4.1, and a reader implementing ``pushFilters`` hard-errors
    without it — runtime-settable, so pinned here where the sources are
    registered)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_python_source(spark, TarDataSource)
    register_python_source(spark, DocFeedDataSource)
