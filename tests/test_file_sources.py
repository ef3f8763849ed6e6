from __future__ import annotations

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sources.file import (
    BinaryFileReader,
    FileReader,
    FlatFileReader,
    parse_delimited_ddl,
    parse_positional_ddl,
)


@pytest.fixture
def jctx(spark):
    return JobContext(PipelineContext(), spark)


def test_parse_positional_ddl():
    fields = parse_positional_ddl("user:1-9 string, event:10-10 long")
    assert fields == [("user", 1, 9, "string"), ("event", 10, 10, "long")]


def test_parse_delimited_ddl():
    assert parse_delimited_ddl("user:0 string, invited:2 int") == [
        ("user", 0, "string"),
        ("invited", 2, "int"),
    ]


def test_file_reader_parquet(spark, jctx, sf_dir):
    r = FileReader(format="parquet", fileUri=f"{sf_dir}/region.parquet")
    df = r.run(jctx, spark)
    assert df.count() == 5


def test_file_reader_csv_with_schema(spark, jctx, tmp_path):
    p = tmp_path / "u.csv"
    p.write_text("1,1990,male\n2,1985,female\n")
    r = FileReader(
        format="csv",
        fileUri=str(p),
        ddlSchemaString="user_id long, birth_year int, gender string",
    )
    df = r.run(jctx, spark)
    assert df.collect()[0]["user_id"] in (1, 2)
    assert [f.name for f in df.schema.fields] == ["user_id", "birth_year", "gender"]


def test_file_reader_fallback_empty(spark, jctx):
    r = FileReader(
        format="parquet",
        fileUri="/nonexistent/xyz.parquet",
        fallbackRead="true",
        ddlSchemaString="a int, b string",
    )
    df = r.run(jctx, spark)
    assert df.count() == 0 and len(df.schema.fields) == 2


def test_file_reader_fallback_glob_uri_still_reads(spark, jctx, tmp_path):
    """Round-14 ADVICE (high): the driver-side existence pre-check must
    expand glob URIs (fs.globStatus), not probe them as literal paths —
    a fallback-configured reader over 'dir/*.parquet' with matching files
    must return the DATA, not the silent fallback frame."""
    spark.createDataFrame([(1, "a"), (2, "b")], "a int, b string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "g"))
    r = FileReader(
        format="parquet",
        fileUri=f"{tmp_path}/g/*.parquet",
        fallbackRead="true",
        ddlSchemaString="a int, b string",
    )
    df = r.run(jctx, spark)
    assert df.count() == 2


def test_file_reader_fallback_glob_uri_no_match_falls_back(spark, jctx, tmp_path):
    (tmp_path / "empty").mkdir()
    r = FileReader(
        format="parquet",
        fileUri=f"{tmp_path}/empty/*.parquet",
        fallbackRead="true",
        ddlSchemaString="a int, b string",
    )
    df = r.run(jctx, spark)
    assert df.count() == 0 and len(df.schema.fields) == 2


def test_file_reader_rejects_bad_format(spark, jctx):
    with pytest.raises(ValueError, match="unsupported format"):
        FileReader(format="exotic", fileUri="/x").run(jctx, spark)


def test_flat_file_positional_with_header(spark, jctx, tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(
        "HDR20240211\n"
        "user00001 5         2012-10-02 15:53:05.7540001\n"
        "user00002 7         2012-10-03 15:53:05.7540000\n"
    )
    r = FlatFileReader(
        fileUri=str(p),
        ddlFieldsString="user:1-9 string, event:11-1 long, interested:47-1 int",
        header={"rowNo": 1, "view": "train_header"},
        row={"noField": "seq"},
    )
    df = r.run(jctx, spark)
    rows = {r["user"]: r for r in df.collect()}
    assert set(rows) == {"user00001", "user00002"}
    assert rows["user00001"]["event"] == 5 and rows["user00001"]["interested"] == 1
    assert rows["user00001"]["seq"] == 2  # header was row 1
    hdr = spark.table("train_header").collect()
    assert len(hdr) == 1 and hdr[0][0].startswith("HDR")


def test_flat_file_trailer_regex(spark, jctx, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("a,1\nb,2\nTRL,end\n")
    r = FlatFileReader(
        fileUri=str(p),
        ddlDelimitedString="name:0 string, v:1 int",
        trailer={"matchRegex": "^TRL", "view": "d_trailer"},
    )
    df = r.run(jctx, spark)
    assert {r["name"] for r in df.collect()} == {"a", "b"}
    assert spark.table("d_trailer").count() == 1


def test_binary_reader_fixed_records(spark, jctx, tmp_path):
    p = tmp_path / "rec.bin"
    p.write_bytes(b"AAA01BBB02CCC03")
    r = BinaryFileReader(
        fileUri=str(p),
        recordLength=5,
        ddlFieldsString="tag:1-3 string, num:4-2 int",
    )
    df = r.run(jctx, spark)
    rows = sorted((r["tag"], r["num"]) for r in df.collect())
    assert rows == [("AAA", 1), ("BBB", 2), ("CCC", 3)]


def test_jdbc_reader_dbapi_path(spark, tmp_path):
    """JdbcReader's connect-hook read: rows land with cursor column names."""
    import sqlite3

    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sources.jdbc import JdbcReader

    db = str(tmp_path / "r.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    conn.executemany("INSERT INTO t VALUES (?, ?)", [(1, "a"), (2, "b")])
    conn.commit()
    conn.close()

    r = JdbcReader(
        connect="spark_etl_framework_spark.testing.sqlite_connect",
        connection={"url": db, "dbtable": "t"},
    )
    out = r.run(JobContext(PipelineContext(), spark), spark)
    assert out.columns == ["k", "v"]
    assert sorted(tuple(x) for x in out.collect()) == [(1, "a"), (2, "b")]

    import pytest

    with pytest.raises(ValueError, match="dbtable"):
        JdbcReader(
            connect="spark_etl_framework_spark.testing.sqlite_connect",
            connection={"url": db},
        ).run(JobContext(PipelineContext(), spark), spark)


def test_jdbc_reader_dbapi_guards(spark, tmp_path):
    """The DBAPI path's small-relation contract is enforced: maxRows raises
    past the cap, non-identifier dbtable is rejected before any SQL is built,
    an empty table needs an explicit schema (and returns a typed empty DF
    with one)."""
    import sqlite3

    import pytest

    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sources.jdbc import JdbcReader

    db = str(tmp_path / "g.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE big (k INTEGER)")
    conn.executemany("INSERT INTO big VALUES (?)", [(i,) for i in range(10)])
    conn.execute("CREATE TABLE empty (k INTEGER, v TEXT)")
    conn.commit()
    conn.close()
    jctx = JobContext(PipelineContext(), spark)

    def reader(**kw):
        return JdbcReader(
            connect="spark_etl_framework_spark.testing.sqlite_connect", **kw
        )

    with pytest.raises(ValueError, match="maxRows"):
        reader(connection={"url": db, "dbtable": "big"}, maxRows=5).run(jctx, spark)
    # at the cap exactly: fine
    assert reader(connection={"url": db, "dbtable": "big"}, maxRows=10).run(
        jctx, spark
    ).count() == 10
    with pytest.raises(ValueError, match="identifier"):
        reader(
            connection={"url": db, "dbtable": "big; DROP TABLE big"}
        ).run(jctx, spark)
    with pytest.raises(ValueError, match="ddlSchemaString"):
        reader(connection={"url": db, "dbtable": "empty"}).run(jctx, spark)
    out = reader(
        connection={"url": db, "dbtable": "empty"},
        ddlSchemaString="k int, v string",
    ).run(jctx, spark)
    assert out.count() == 0 and out.columns == ["k", "v"]


def test_jdbc_reader_loops_small_fetchmany_batches(spark, tmp_path):
    """DB-API drivers may return fewer rows per fetchmany than requested
    ('should try'); the reader must loop to exhaustion, so a tiny-batch
    driver neither truncates the relation nor dodges the maxRows guard."""
    import sqlite3

    import pytest

    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sources.jdbc import JdbcReader

    db = str(tmp_path / "tb.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE big (k INTEGER)")
    conn.executemany("INSERT INTO big VALUES (?)", [(i,) for i in range(10)])
    conn.commit()
    conn.close()
    jctx = JobContext(PipelineContext(), spark)

    def reader(**kw):
        return JdbcReader(
            connect="spark_etl_framework_spark.testing.sqlite_connect_tiny_batches",
            **kw,
        )

    # full relation arrives despite 3-row batches
    out = reader(connection={"url": db, "dbtable": "big"}).run(jctx, spark)
    assert sorted(r["k"] for r in out.collect()) == list(range(10))
    # and the cap still trips even though no single batch exceeds it
    with pytest.raises(ValueError, match="maxRows"):
        reader(connection={"url": db, "dbtable": "big"}, maxRows=5).run(jctx, spark)


def test_jdbc_reader_ddl_schema_reorders_by_name(spark, tmp_path):
    """ddlSchemaString fields in a different order than the table's columns
    bind BY NAME (not positionally), so compatible adjacent types can't be
    silently swapped; a field-count mismatch errors."""
    import sqlite3

    import pytest

    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sources.jdbc import JdbcReader

    db = str(tmp_path / "ro.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (a INTEGER, b INTEGER)")
    conn.execute("INSERT INTO t VALUES (1, 2)")
    conn.commit()
    conn.close()
    jctx = JobContext(PipelineContext(), spark)
    out = JdbcReader(
        connect="spark_etl_framework_spark.testing.sqlite_connect",
        connection={"url": db, "dbtable": "t"},
        ddlSchemaString="b int, a int",
    ).run(jctx, spark)
    r = out.collect()[0]
    assert (r["a"], r["b"]) == (1, 2)  # values follow names, not positions
    with pytest.raises(ValueError, match="fields"):
        JdbcReader(
            connect="spark_etl_framework_spark.testing.sqlite_connect",
            connection={"url": db, "dbtable": "t"},
            ddlSchemaString="a int, b int, c int",
        ).run(jctx, spark)


def test_jdbc_reader_ddl_schema_partial_overlap_raises(spark, tmp_path):
    """A typo'd DDL field (partial name overlap with the cursor) must raise,
    not silently shift data positionally; fully disjoint names stay a
    wholesale positional rename."""
    import sqlite3

    import pytest

    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sources.jdbc import JdbcReader

    db = str(tmp_path / "po.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (a INTEGER, b INTEGER)")
    conn.execute("INSERT INTO t VALUES (1, 2)")
    conn.commit()
    conn.close()
    jctx = JobContext(PipelineContext(), spark)

    def reader(ddl):
        return JdbcReader(
            connect="spark_etl_framework_spark.testing.sqlite_connect",
            connection={"url": db, "dbtable": "t"},
            ddlSchemaString=ddl,
        )

    with pytest.raises(ValueError, match="partially overlap"):
        reader("b int, c int").run(jctx, spark)
    out = reader("x int, y int").run(jctx, spark)  # disjoint: rename
    r = out.collect()[0]
    assert (r["x"], r["y"]) == (1, 2)


def test_tar_python_datasource(spark, tmp_path):
    """Spark 4 custom Python DataSource: one scan task per archive, files
    streamed member-by-member; globs resolve; missing paths fail loudly."""
    import io
    import tarfile

    import pytest as _pt

    from spark_etl_framework_spark.sources.pysource import register_python_sources

    register_python_sources(spark)
    for a in range(3):
        with tarfile.open(tmp_path / f"d{a}.tar", "w") as tf:
            for i in range(2):
                data = f"payload {a}/{i}".encode()
                ti = tarfile.TarInfo(name=f"m_{a}_{i}.bin")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
    df = spark.read.format("tar").load(str(tmp_path / "d*.tar"))
    rows = df.collect()
    assert len(rows) == 6
    assert df.rdd.getNumPartitions() == 3  # one task per archive
    by_name = {r.member_name: r for r in rows}
    assert bytes(by_name["m_2_1.bin"].payload) == b"payload 2/1"
    assert by_name["m_0_0.bin"].size == len(b"payload 0/0")

    with _pt.raises(Exception, match="no archives match|does not exist"):
        spark.read.format("tar").load(str(tmp_path / "missing_*.tar")).collect()


def test_docfeed_stream_reader_offset_contract(spark, sf_dir):
    """DocFeedStreamReader: rate limiting caps each batch, partitions()
    tile an offset range without gap/overlap, and replaying the same
    range yields identical rows (the checkpoint-recovery property)."""
    from spark_etl_framework_spark.sources.pysource import DocFeedStreamReader

    r = DocFeedStreamReader(
        {"path": f"{sf_dir}/documents.parquet", "maxRowsPerBatch": "150",
         "tasksPerBatch": "3"}
    )
    assert r.initialOffset() == {"row": 0}
    o1, o2 = r.latestOffset(), r.latestOffset()
    assert o1 == {"row": 150} and o2 == {"row": 300}
    parts = r.partitions({"row": 0}, {"row": 150})
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 150
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))  # no gap/overlap
    rows1 = [row for p in parts for row in r.read(p)]
    rows2 = [row for p in r.partitions({"row": 0}, {"row": 150}) for row in r.read(p)]
    assert rows1 == rows2 and len(rows1) == 150  # deterministic replay
    assert r.partitions({"row": 10}, {"row": 10}) == []

    import pytest as _pt

    with _pt.raises(ValueError, match="requires a path"):
        DocFeedStreamReader({})


def test_tar_writer_two_phase_commit(spark, tmp_path):
    """TarDataSourceWriter: a successful job leaves shard_*.tar plus
    _SUCCESS and no temporaries; abort() removes staged files so a failed
    job leaves nothing readable."""
    import os

    from pyspark.sql import functions as F

    from spark_etl_framework_spark.sources.pysource import (
        TarDataSourceWriter,
        _TarCommit,
        register_python_sources,
    )

    register_python_sources(spark)
    out = str(tmp_path / "shards")
    df = spark.range(6).select(
        F.concat(F.lit("m_"), F.col("id").cast("string")).alias("member_name"),
        F.encode(F.concat(F.lit("p"), F.col("id").cast("string")), "utf-8").alias(
            "payload"
        ),
    )
    df.repartition(2).write.format("tar").option("path", out).mode("append").save()
    names = sorted(os.listdir(out))
    assert names[0] == "_SUCCESS"
    shards = [n for n in names if n != "_SUCCESS"]
    assert len(shards) == 2
    assert all(n.startswith("shard_") and n.endswith(".tar") for n in shards)
    back = spark.read.format("tar").load(f"{out}/shard_*.tar")
    assert back.count() == 6

    # append is ADDITIVE: a second job must not clobber the first's shards
    # (per-job unique shard names — the round-6 ADVICE data-loss finding)
    df.repartition(2).write.format("tar").option("path", out).mode("append").save()
    assert spark.read.format("tar").load(f"{out}/shard_*.tar").count() == 12

    # overwrite clears previous shards at commit time, leaving only its own
    df.repartition(2).write.format("tar").option("path", out).mode(
        "overwrite"
    ).save()
    assert spark.read.format("tar").load(f"{out}/shard_*.tar").count() == 6

    # abort path: staged temporaries are removed
    w = TarDataSourceWriter({"path": out}, overwrite=False)
    staged = str(tmp_path / "shards" / "_tmp_deadbeef.tar")
    open(staged, "wb").write(b"partial")
    w.abort([_TarCommit(tmp_path=staged, n_members=1), None])
    assert not os.path.exists(staged)

    import pytest as _pt

    with _pt.raises(ValueError, match="requires a path"):
        TarDataSourceWriter({}, overwrite=False)


def test_tar_source_filter_pushdown(spark, tmp_path):
    """pushFilters: member_name prefix/equality and size bounds apply
    during the header walk (payloads of filtered members never read);
    unsupported filters are returned to Spark and still enforced."""
    import io
    import tarfile

    from pyspark.sql import functions as F

    from spark_etl_framework_spark.sources.pysource import (
        TarDataSourceReader,
        register_python_sources,
    )

    register_python_sources(spark)
    with tarfile.open(tmp_path / "a.tar", "w") as tf:
        for i in range(6):
            data = b"x" * (i + 1)
            ti = tarfile.TarInfo(name=f"{'img' if i % 2 else 'txt'}_{i}.bin")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    df = spark.read.format("tar").load(str(tmp_path / "a.tar"))
    got = sorted(
        (r.member_name, r.size)
        for r in df.filter(
            F.col("member_name").startswith("img") & (F.col("size") > 2)
        ).collect()
    )
    assert got == [("img_3.bin", 4), ("img_5.bin", 6)]
    # equality + an unsupported filter (payload contains) together
    got2 = df.filter(
        (F.col("member_name") == "txt_4.bin") & (F.octet_length("payload") == 5)
    ).collect()
    assert [(r.member_name, r.size) for r in got2] == [("txt_4.bin", 5)]

    # unit: the reader keeps supported filters and yields back the rest
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

    r = TarDataSourceReader({"path": str(tmp_path / "a.tar")})
    leftover = list(
        r.pushFilters(
            [
                EqualTo(("member_name",), "img_1.bin"),
                GreaterThan(("size",), 1),
                LessThan(("size",), 99),
                EqualTo(("archive",), "zzz"),  # unsupported attribute
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["EqualTo"]
    assert len(r._pushed) == 3
    assert [t for t in r.read(r.partitions()[0])] == [
        (str(tmp_path / "a.tar"), "img_1.bin", 2, b"xx")
    ]


def _mk_tar(path, member: str, data: bytes) -> None:
    import io
    import tarfile

    with tarfile.open(path, "w") as tf:
        ti = tarfile.TarInfo(name=member)
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))


def test_tar_stream_reader_paces_one_archive_per_batch(spark, tmp_path):
    """TarStreamReader: offsets are batch counters over a file-identity
    log — maxFilesPerBatch new archives per trigger, deterministic replay
    of a batch range, no advance when nothing new arrived."""
    from spark_etl_framework_spark.sources.pysource import TarStreamReader

    for a in range(3):
        _mk_tar(tmp_path / f"s{a}.tar", f"m{a}", f"x{a}".encode())
    r = TarStreamReader({"path": str(tmp_path / "s*.tar"), "maxFilesPerBatch": "1"})
    assert r.initialOffset() == {"batch": 0}
    assert r.latestOffset() == {"batch": 1}
    assert r.latestOffset() == {"batch": 2}
    parts = r.partitions({"batch": 0}, {"batch": 2})
    assert [p.path.endswith(f"s{i}.tar") for i, p in enumerate(parts)] == [True, True]
    rows = [row for p in parts for row in r.read(p)]
    assert [(r2[1], bytes(r2[3])) for r2 in rows] == [("m0", b"x0"), ("m1", b"x1")]
    assert r.latestOffset() == {"batch": 3}
    # exhausted: no new files → the offset must NOT advance
    assert r.latestOffset() == {"batch": 3}
    assert r.partitions({"batch": 3}, {"batch": 3}) == []


def test_tar_stream_late_lexically_earlier_archive(spark, tmp_path):
    """The round-6 ADVICE bug: with index-into-sorted-list offsets, an
    'aaa.tar' landing AFTER 'zzz.tar' was committed shifted the mapping —
    re-ingesting an old archive and permanently skipping the new one.
    File-identity tracking must ingest exactly the new archive."""
    from spark_etl_framework_spark.sources.pysource import TarStreamReader

    _mk_tar(tmp_path / "zzz.tar", "mz", b"zz")
    r = TarStreamReader({"path": str(tmp_path / "*.tar"), "maxFilesPerBatch": "4"})
    assert r.latestOffset() == {"batch": 1}
    assert [p.path for p in r.partitions({"batch": 0}, {"batch": 1})] == [
        str(tmp_path / "zzz.tar")
    ]
    # a lexically-earlier archive lands late
    _mk_tar(tmp_path / "aaa.tar", "ma", b"aa")
    assert r.latestOffset() == {"batch": 2}
    parts = r.partitions({"batch": 1}, {"batch": 2})
    assert [p.path for p in parts] == [str(tmp_path / "aaa.tar")]  # only the new one
    rows = [row for p in parts for row in r.read(p)]
    assert [(x[1], bytes(x[3])) for x in rows] == [("ma", b"aa")]


def test_tar_stream_restart_all_committed_does_not_rewind(spark, tmp_path):
    """A restarted query whose batches were ALL committed calls
    latestOffset() on a fresh reader before any partitions()/commit()
    sync. With stateDir the persisted batch log seeds the counter, so the
    offset never regresses and nothing is re-served; replaying a logged
    range returns the identical files."""
    from spark_etl_framework_spark.sources.pysource import TarStreamReader

    state = str(tmp_path / "state")
    opts = {
        "path": str(tmp_path / "*.tar"),
        "maxFilesPerBatch": "1",
        "stateDir": state,
    }
    _mk_tar(tmp_path / "b.tar", "mb", b"b")
    _mk_tar(tmp_path / "c.tar", "mc", b"c")
    r = TarStreamReader(opts)
    assert r.latestOffset() == {"batch": 1}
    assert r.latestOffset() == {"batch": 2}
    r.commit({"batch": 2})
    # restart 1: all committed — fresh reader must resume at 2, not 1
    r2 = TarStreamReader(opts)
    assert r2.latestOffset() == {"batch": 2}  # nothing new, no rewind
    # restart 2 (the double-restart poison path): still no rewind
    r3 = TarStreamReader(opts)
    assert r3.latestOffset() == {"batch": 2}
    # committed batches were PRUNED from the log (commit() folds them into
    # the compact seen-snapshot) — the engine never replans a committed
    # batch, and asking for one fails loudly instead of guessing
    import pytest as _pt

    with _pt.raises(RuntimeError, match="not in the reader's"):
        r3.partitions({"batch": 0}, {"batch": 1})
    # and a late lexically-earlier file is new data after restart
    _mk_tar(tmp_path / "a.tar", "ma", b"a")
    assert r3.latestOffset() == {"batch": 3}
    assert [p.path for p in r3.partitions({"batch": 2}, {"batch": 3})] == [
        str(tmp_path / "a.tar")
    ]


def test_tar_stream_commit_prunes_log_bounded_state(spark, tmp_path):
    """The round-7 ADVICE unbounded-state finding: commit() must prune
    per-batch log entries (memory AND the one-JSON-per-trigger disk log)
    up to the committed offset, folding them into one compact seen.json —
    a month-long stream's state is O(live batches), not O(triggers). The
    snapshot must still carry file identity (no re-ingest) and the
    counter floor (no offset rewind on restart)."""
    import json
    import os

    from spark_etl_framework_spark.sources.pysource import TarStreamReader

    state = str(tmp_path / "state")
    opts = {
        "path": str(tmp_path / "*.tar"),
        "maxFilesPerBatch": "1",
        "stateDir": state,
    }
    r = TarStreamReader(opts)
    for i in range(5):
        _mk_tar(tmp_path / f"s{i}.tar", f"m{i}", f"x{i}".encode())
        assert r.latestOffset() == {"batch": i + 1}
        r.commit({"batch": i + 1})
        # disk log: never more than the snapshot after each commit
        logs = [n for n in os.listdir(state) if n.startswith("batch-")]
        assert logs == [], f"uncommitted log entries left: {logs}"
        assert r._batches == {}
    with open(os.path.join(state, "seen.json")) as f:
        snap = json.load(f)
    assert snap["batch"] == 5
    assert len(snap["files"]) == 5
    # restart: snapshot alone seeds identity + counter
    r2 = TarStreamReader(opts)
    assert r2.latestOffset() == {"batch": 5}  # nothing new, no rewind
    _mk_tar(tmp_path / "s5.tar", "m5", b"x5")
    assert r2.latestOffset() == {"batch": 6}
    assert [p.path for p in r2.partitions({"batch": 5}, {"batch": 6})] == [
        str(tmp_path / "s5.tar")
    ]


def test_tar_overwrite_commit_renames_before_delete(spark, tmp_path, monkeypatch):
    """The round-7 ADVICE crash-window finding: overwrite commit() must
    rename the new shards IN before deleting the old ones, so a crash
    inside commit() can only leave old+new side by side (duplicates,
    recoverable) — never lose the previous dataset. Simulated by making
    the delete step explode: the new shards must already be on disk."""
    import os

    from spark_etl_framework_spark.sources.pysource import TarDataSourceWriter

    out = str(tmp_path / "shards")
    os.makedirs(out)
    # a previously-committed dataset
    w0 = TarDataSourceWriter({"path": out}, overwrite=False)
    m0 = w0.write(iter([]))
    w0.commit([m0])
    old = [n for n in os.listdir(out) if n.endswith(".tar")]
    assert len(old) == 1

    w1 = TarDataSourceWriter({"path": out}, overwrite=True)
    m1 = w1.write(iter([]))
    real_remove = os.remove

    def exploding_remove(p):
        raise OSError(f"simulated crash deleting {p}")

    monkeypatch.setattr(os, "remove", exploding_remove)
    try:
        import pytest as _pt

        with _pt.raises(OSError, match="simulated crash"):
            w1.commit([m1])
    finally:
        monkeypatch.setattr(os, "remove", real_remove)
    names = [n for n in os.listdir(out) if n.endswith(".tar")]
    # new shard IS in place despite the crash; old shard also still there
    assert len(names) == 2, names
    assert any(w1._job in n for n in names)
    # a clean re-run of the overwrite converges: only the new job's shards
    w2 = TarDataSourceWriter({"path": out}, overwrite=True)
    w2.commit([w2.write(iter([]))])
    names = [n for n in os.listdir(out) if n.endswith(".tar")]
    assert len(names) == 1 and w2._job in names[0]


def test_docfeed_restart_all_committed_does_not_rewind(spark, sf_dir, tmp_path):
    """The round-6 ADVICE docfeed finding: on an all-committed restart the
    engine's FIRST call is latestOffset(), so a fresh reader's counter
    must seed from the position WAL — otherwise it returns an offset
    below the checkpoint and a later batch re-serves delivered rows."""
    from spark_etl_framework_spark.sources.pysource import DocFeedStreamReader

    pos = str(tmp_path / "pos.txt")
    opts = {
        "path": f"{sf_dir}/documents.parquet",
        "maxRowsPerBatch": "100",
        "positionFile": pos,
    }
    r = DocFeedStreamReader(opts)
    assert r.latestOffset() == {"row": 100}
    assert r.latestOffset() == {"row": 200}
    r.commit({"row": 200})
    # restart 1: seeded from the WAL — continues forward, never below 200
    r2 = DocFeedStreamReader(opts)
    assert r2.latestOffset() == {"row": 300}
    r2.commit({"row": 300})
    # restart 2: same invariant (the double-restart poison path)
    r3 = DocFeedStreamReader(opts)
    assert r3.latestOffset() == {"row": 400}


def test_docfeed_read_prunes_row_groups(spark, tmp_path):
    """read() must decode only row groups overlapping the task's range —
    O(batch) not O(file) per micro-batch — and still return exactly the
    requested rows across group boundaries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_etl_framework_spark.sources.pysource import (
        DocFeedStreamReader,
        _DocFeedPartition,
    )

    path = str(tmp_path / "docs.parquet")
    t = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "text": [f"t{i}" for i in range(1000)],
        }
    )
    pq.write_table(t, path, row_group_size=100)  # 10 groups of 100
    r = DocFeedStreamReader({"path": path})
    # spans groups 2..4 (rows 250..450): exact rows, in order
    rows = list(r.read(_DocFeedPartition(path, 250, 450)))
    assert [x[0] for x in rows] == list(range(250, 450))
    assert rows[0][1] == "t250" and rows[-1][1] == "t449"
    # empty range
    assert list(r.read(_DocFeedPartition(path, 70, 70))) == []
    # aligned exactly on a group boundary
    rows2 = list(r.read(_DocFeedPartition(path, 100, 200)))
    assert [x[0] for x in rows2] == list(range(100, 200))
