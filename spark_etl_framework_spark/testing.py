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


def sqlite_connect_tiny_batches(options: dict | None = None):
    """Like :func:`sqlite_connect`, but fetchmany returns AT MOST 3 rows per
    call regardless of the requested size — the DB-API-legal driver behavior
    ("should try to fetch as many as indicated") that a single fetchmany()
    call would silently truncate. Exercises JdbcReader's fetch loop."""
    conn = sqlite_connect(options)

    class _TinyCursor:
        def __init__(self, cur):
            self._cur = cur

        def __getattr__(self, name):
            return getattr(self._cur, name)

        def fetchmany(self, size=None):
            return self._cur.fetchmany(min(3, size or 3))

    class _TinyConn:
        def cursor(self):
            return _TinyCursor(conn.cursor())

        def __getattr__(self, name):
            return getattr(conn, name)

    return _TinyConn()
