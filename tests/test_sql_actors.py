from __future__ import annotations

import pytest

from spark_etl_framework_spark.operators.sql import (
    SqlReader,
    SqlTableReader,
    SqlTransformer,
    SqlWriter,
)
from spark_etl_framework_spark.plans.context import JobContext, PipelineContext


@pytest.fixture
def jctx(spark):
    return JobContext(PipelineContext(), spark)


def test_sql_transformer_multi_statement_with_set_and_setrun(spark, jctx, sf_dir):
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region")
    sql = """
    -- pick a region count at runtime
    set min_key = ${floor_key};
    setrun n_regions = select count(*) from region;
    select r_regionkey, r_name from region
    where r_regionkey >= ${min_key} and ${n_regions} = 5
    """
    t = SqlTransformer(sqlString=sql)
    jctx.variables["floor_key"] = "2"
    df = t.run(jctx, spark)
    assert df.count() == 3  # keys 2,3,4
    # variables recorded for later actors
    assert jctx.variables["min_key"] == "2"
    assert jctx.variables["n_regions"] == "5"


def test_sql_reader_rejects_dml(spark, jctx):
    with pytest.raises(ValueError, match="only accepts queries"):
        SqlReader(sqlString="insert into t values (1)").run(jctx, spark)


def test_sql_writer_rejects_query(spark, jctx):
    with pytest.raises(ValueError, match="only accepts DML"):
        SqlWriter(sqlString="select 1").run(jctx, spark)


def test_sql_table_reader_with_filter(spark, jctx, sf_dir):
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation")
    df = SqlTableReader(table="nation", filter="n_regionkey = 0").run(jctx, spark)
    assert df.count() == 5


def test_refcount_autocache(spark, sf_dir):
    """2nd reference of a view persists it (reference JobContext.scala:74-85)."""
    jctx = JobContext(PipelineContext(), spark)
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    jctx.register_view("r_cache_test", df)
    jctx.reference("r_cache_test")
    assert df.storageLevel.useMemory is False
    jctx.reference("r_cache_test")
    assert df.storageLevel.useMemory is True
    jctx.cleanup()
    assert df.storageLevel.useMemory is False
