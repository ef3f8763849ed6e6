"""Make the package importable on executor Python workers.

Arrow-batched operators (multimodal codecs, stateful streaming
processors) reference module-level helpers; cloudpickle serializes those
BY REFERENCE, so the worker process must be able to ``import
spark_etl_framework_spark``. Under this repo's own sessions that works
because tests/session set PYTHONPATH before the JVM starts — but the
driver contract imports ``__spark_entry__`` with its OWN vanilla
SparkSession, whose workers inherit no such path, and the affected
queries die with ModuleNotFoundError inside the worker (found by the
round-5 vanilla-session simulation; closures that capture everything by
value, like the round-4 netpbm decoder, masked this until module-level
helpers appeared).

:func:`ensure_worker_imports` closes the gap portably: zip the package
once and ``addPyFile`` it — Spark distributes the zip to every worker
and prepends it to the worker's ``sys.path``, independent of how the
session was built. Idempotent per application; the zip is rebuilt at
most once per driver process.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_SHIPPED: set[str] = set()
_ZIP: str | None = None


def ensure_worker_imports(spark) -> None:
    """Ship this package to ``spark``'s executors once per application."""
    global _ZIP
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        return  # session already stopped — nothing to ship to
    if app_id in _SHIPPED:
        return
    if _ZIP is None or not os.path.exists(_ZIP):
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        base = tempfile.mkdtemp(prefix="spark_etl_pkg_")
        _ZIP = shutil.make_archive(
            os.path.join(base, "spark_etl_framework_spark"),
            "zip",
            root_dir=os.path.dirname(pkg_dir),
            base_dir="spark_etl_framework_spark",
        )
    spark.sparkContext.addPyFile(_ZIP)
    _SHIPPED.add(app_id)
