"""Sink actors: DML via SqlWriter on a catalog table, JDBC merge via a real
DBAPI (sqlite), parameterized-SQL rewriting, FileWriter emptyWrite policy."""

from __future__ import annotations

import os
import sqlite3

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sinks.file import FileWriter
from spark_etl_framework_spark.sinks.jdbc import JdbcWriter, rewrite_param_sql


@pytest.fixture
def jctx(spark):
    return JobContext(PipelineContext(), spark)


def test_rewrite_param_sql():
    sql, fields = rewrite_param_sql(
        "insert into f(user_id, ts) values(@user_id, @ts) "
        "on conflict do update set ts = @ts"
    )
    assert sql == "insert into f(user_id, ts) values(?, ?) on conflict do update set ts = ?"
    # one entry per placeholder occurrence, in order (repeats repeat)
    assert fields == ["user_id", "ts", "ts"]


def test_sql_writer_dml_on_catalog_table(spark, jctx, sf_dir, tmp_path):
    """The reference's SqlWriter path: DML (INSERT INTO) through spark.sql
    against a catalog table (reference: etl/sink/SqlWriter.scala:14-21)."""
    from spark_etl_framework_spark.operators.sql import SqlActor, SqlWriter

    spark.sql("DROP TABLE IF EXISTS dml_target")
    SqlActor(
        sqlString="CREATE TABLE dml_target (k INT, name STRING) USING parquet"
    ).run(jctx, spark)
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region_dml")
    SqlWriter(
        sqlString="INSERT INTO dml_target SELECT r_regionkey, r_name FROM region_dml"
    ).run(jctx, spark)
    assert spark.table("dml_target").count() == 5
    spark.sql("DROP TABLE dml_target")


def test_jdbc_merge_via_sqlite(spark, jctx, tmp_path):
    """merge mode: @field-parameterized batched executemany through a DBAPI
    connection per partition (reference: JdbcContinuousWriter.scala:96-221)."""
    db = str(tmp_path / "sink.db")
    os.environ["SPARK_ETL_SQLITE_PATH"] = db
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE features (user_id INT PRIMARY KEY, score REAL)"
    )
    conn.execute("INSERT INTO features VALUES (1, 0.0)")  # will be upserted
    conn.commit()
    conn.close()

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.7)], ["user_id", "score"]
    ).coalesce(1)
    df.createOrReplaceTempView("features_src")
    w = JdbcWriter(
        mode="merge",
        view="features_src",
        sinkStatement=(
            "INSERT INTO features(user_id, score) VALUES(@user_id, @score) "
            "ON CONFLICT(user_id) DO UPDATE SET score = excluded.score"
        ),
        connect="spark_etl_framework_spark.testing.sqlite_connect",
        connection={"url": db},
        numPartitions=1,
        batchSize=2,
    )
    w.run(jctx, spark)
    got = dict(
        sqlite3.connect(db).execute("SELECT user_id, score FROM features").fetchall()
    )
    assert got == {1: 0.9, 2: 0.5, 3: 0.7}


def test_jdbc_writer_rejects_bad_mode(spark, jctx):
    spark.range(1).createOrReplaceTempView("one")
    with pytest.raises(ValueError, match="bad mode"):
        JdbcWriter(mode="exotic", view="one").run(jctx, spark)


def test_file_writer_empty_write_skip(spark, jctx, tmp_path):
    spark.range(0).createOrReplaceTempView("empty_view")
    out = tmp_path / "never"
    FileWriter(
        format="parquet", fileUri=str(out), view="empty_view", emptyWrite="no"
    ).run(jctx, spark)
    assert not out.exists()


def test_file_writer_partition_by(spark, jctx, sf_dir, tmp_path):
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation_w")
    out = tmp_path / "part_out"
    FileWriter(
        format="parquet",
        fileUri=str(out),
        view="nation_w",
        partitionBy="n_regionkey",
        mode="overwrite",
    ).run(jctx, spark)
    # hive-style directory partitioning → partition pruning for readers
    assert (out / "n_regionkey=0").exists()
    back = spark.read.parquet(str(out))
    assert back.count() == 25
