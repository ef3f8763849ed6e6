"""Driver-contract environment simulation.

The external harness imports ``__spark_entry__`` with its OWN vanilla
SparkSession from an arbitrary cwd — no PYTHONPATH for executor workers,
no session confs. Round 5's simulation found 7 window queries dying with
ModuleNotFoundError inside the Python worker (module-level Arrow-UDF
helpers unpickle by reference). This test reproduces that environment in
a clean subprocess and pins the shipping.py fix.
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_vanilla_session_runs_worker_udf_queries():
    code = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as E
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[2]").getOrCreate()
qs = E.queries()
# one module-level-helper mapInPandas query and the stateful stream that
# loads its processor by dotted path on the worker
assert qs["multimodal_decode_bmp"](spark, {sf!r}).count() > 0
assert qs["stream_stateful_ewma"](spark, {sf!r}).count() > 0
# ANSI is ON by default in a vanilla Spark 4 session; the registry
# wrapper must pin non-ANSI semantics or edge-case divisors hard-error
assert qs["events_ab_ztest"](spark, {sf!r}).count() == 1
print("VANILLA_OK")
""".format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        sf="/root/testdata/sf0.001",
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/tmp",
        env=env,
        timeout=300,
    )
    assert "VANILLA_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
