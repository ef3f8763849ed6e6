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
    assert names == ["_SUCCESS", "shard_0000.tar", "shard_0001.tar"]
    back = spark.read.format("tar").load(f"{out}/shard_*.tar")
    assert back.count() == 6

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


def test_tar_stream_reader_paces_one_archive_per_batch(spark, tmp_path):
    """TarStreamReader: offsets advance maxFilesPerBatch archives per
    trigger; restart-safe (never below engine offsets); partitions slice
    the sorted archive list."""
    import io
    import tarfile

    from spark_etl_framework_spark.sources.pysource import TarStreamReader

    for a in range(3):
        with tarfile.open(tmp_path / f"s{a}.tar", "w") as tf:
            data = f"x{a}".encode()
            ti = tarfile.TarInfo(name=f"m{a}")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    r = TarStreamReader({"path": str(tmp_path / "s*.tar"), "maxFilesPerBatch": "1"})
    assert r.initialOffset() == {"idx": 0}
    assert r.latestOffset() == {"idx": 1}
    assert r.latestOffset() == {"idx": 2}
    parts = r.partitions({"idx": 0}, {"idx": 2})
    assert [p.path.endswith(f"s{i}.tar") for i, p in enumerate(parts)] == [True, True]
    rows = [row for p in parts for row in r.read(p)]
    assert [(r2[1], bytes(r2[3])) for r2 in rows] == [("m0", b"x0"), ("m1", b"x1")]
    # restart: a fresh reader fed the checkpointed offset resumes past it
    r2 = TarStreamReader({"path": str(tmp_path / "s*.tar"), "maxFilesPerBatch": "1"})
    r2.partitions({"idx": 2}, {"idx": 2})
    assert r2.latestOffset() == {"idx": 3}  # not a rewind to 1
