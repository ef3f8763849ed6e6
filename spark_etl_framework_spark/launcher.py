"""CLI launcher (reference: com.qwshen.etl.Launcher — src/main/scala/com/
qwshen/etl/Launcher.scala:96-98; argument surface per etl/configuration/
ArgumentParser.scala:21-91).

    python -m spark_etl_framework_spark.launcher \
        --pipeline-def pipeline.yaml#job1;job2 \
        --application-conf app.conf,override.conf \
        --var name=value --vars a=1,b=2

Application conf files are flat ``key = value`` lines (HOCON-lite); later
files override earlier ones (reference: ArgumentParser.scala:73-75). Spark
session settings come from ``application.runtime.spark.*`` keys.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from pyspark.sql import SparkSession

from .plans.runner import run_pipeline_file
from .session import DEFAULT_CONFS


def parse_conf_files(paths: list[str]) -> dict[str, str]:
    conf: dict[str, str] = {}
    for p in paths:
        for line in Path(p).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith(("#", "//")):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                conf[k.strip()] = v.strip().strip('"')
    return conf


def build_session(app_conf: dict[str, str]) -> SparkSession:
    """Session from ``application.runtime.spark.*`` conf keys + optional hive
    support (reference: Launcher.scala:65-87)."""
    builder = SparkSession.builder.appName(
        app_conf.get("application.name", "spark_etl_framework_spark")
    )
    for k, v in {**DEFAULT_CONFS, **app_conf}.items():
        if k.startswith("application.runtime.spark."):
            builder = builder.config(k.removeprefix("application.runtime."), v)
    if app_conf.get("application.runtime.hiveSupport", "false") == "true":
        builder = builder.enableHiveSupport()
    return builder.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spark-etl-framework-spark")
    ap.add_argument("--pipeline-def", required=True, help="pipeline file[#job1;job2]")
    ap.add_argument(
        "--application-conf", default="", help="comma list of conf files, later overrides"
    )
    ap.add_argument("--var", action="append", default=[], help="name=value (repeatable)")
    ap.add_argument("--vars", default="", help="comma list of name=value")
    ap.add_argument("--staging-uri", default=None)
    ap.add_argument("--staging-actions", default=None, help="comma list of action names")
    args = ap.parse_args(argv)

    app_conf = parse_conf_files([p for p in args.application_conf.split(",") if p])
    cli_vars: dict[str, str] = {}
    for pair in args.var + [v for v in args.vars.split(",") if v]:
        k, _, v = pair.partition("=")
        cli_vars[k.strip()] = v.strip()

    spark = build_session(app_conf)
    try:
        run_pipeline_file(
            spark,
            args.pipeline_def,
            cli_vars=cli_vars,
            app_conf=app_conf,
            staging_uri=args.staging_uri,
            staging_actions=args.staging_actions.split(",") if args.staging_actions else None,
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
