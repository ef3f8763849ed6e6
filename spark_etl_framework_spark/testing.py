"""Test-support hooks that must be importable by executor Python workers
(dotted-path plug-ins resolved via functions.registration.load_class).

``sqlite_connect`` is the DBAPI connect callable for exercising the JDBC
merge/stream writers against a real database without JDBC jars: sqlite uses
qmark parameter style, exactly what ``rewrite_param_sql`` produces. The db
path comes from the SPARK_ETL_SQLITE_PATH env var (executor workers inherit
the driver environment in local mode).
"""

from __future__ import annotations

import os
import sqlite3


def sqlite_connect(options: dict | None = None):
    """DBAPI connect hook: db path from connection options (``url``) or the
    SPARK_ETL_SQLITE_PATH env var."""
    path = (options or {}).get("url") or os.environ["SPARK_ETL_SQLITE_PATH"]
    conn = sqlite3.connect(path, timeout=60)
    # serialize writers across partitions; fine for tests
    conn.execute("PRAGMA busy_timeout=60000")
    return conn
