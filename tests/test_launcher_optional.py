"""Launcher CLI + optional-connector actor contracts."""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.launcher import parse_conf_files
from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.plans.registry import _BUILTIN, resolve_actor
from spark_etl_framework_spark.plans.runner import run_pipeline_file
from spark_etl_framework_spark.sinks.optional import HBaseWriter
from spark_etl_framework_spark.sources.optional import HBaseReader, MongoReader


def test_parse_conf_files(tmp_path):
    c1 = tmp_path / "a.conf"
    c1.write_text('application.name = "etl"\n# comment\nk = 1\n')
    c2 = tmp_path / "b.conf"
    c2.write_text("k = 2\n")
    conf = parse_conf_files([str(c1), str(c2)])
    assert conf["application.name"] == "etl" and conf["k"] == "2"  # later overrides


def test_registry_resolves_every_builtin():
    for alias in _BUILTIN:
        assert resolve_actor(alias) is not None


def test_registry_alias_indirection():
    cls = resolve_actor("my-reader", aliases={"my-reader": "file-reader"})
    assert cls.__name__ == "FileReader"


def test_launcher_cli_runs_pipeline(spark, sf_dir, tmp_path):
    """Drive the CLI surface minus the session build (shared test session)."""
    ypath = tmp_path / "p.yaml"
    ypath.write_text(
        f"""
version: 1.0.0
jobs:
  - name: main
    actions:
      - name: load
        actor:
          type: file-reader
          properties: {{format: parquet, fileUri: "{sf_dir}/region.parquet"}}
        output-view: {{name: r_cli}}
"""
    )
    run_pipeline_file(
        spark, str(ypath), staging_uri=str(tmp_path / "staging"), staging_actions=["load"]
    )
    # CLI staging override dumped the action output as csv
    staged = spark.read.option("header", "true").csv(str(tmp_path / "staging" / "load"))
    assert staged.count() == 5


def test_optional_connectors_error_clearly(spark):
    jctx = JobContext(PipelineContext(), spark)
    spark.range(1).createOrReplaceTempView("one_row")
    with pytest.raises(RuntimeError, match="unavailable"):
        HBaseReader(connection={"table": "t"}).run(jctx, spark)
    with pytest.raises(RuntimeError, match="unavailable"):
        MongoReader(host="h", database="d", collection="c").run(jctx, spark)
    with pytest.raises(RuntimeError, match="unavailable"):
        HBaseWriter(connection={"table": "t"}, view="one_row").run(jctx, spark)


def test_hbase_rowkey_contract(spark):
    """Rowkey = concatenated columns, or UUID when unspecified
    (reference: HBaseWriteActor.scala:69-71)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    w = HBaseWriter(rowKey={"columns": "k,v", "concatenator": ":"})
    out = w.prepared_df(df).collect()
    assert {r["__rowKey"] for r in out} == {"1:a", "2:b"}
    w2 = HBaseWriter()
    keys = [r["__rowKey"] for r in w2.prepared_df(df).collect()]
    assert len(set(keys)) == 2 and all(len(k) == 36 for k in keys)
