"""Structured Streaming actors: stream readers/writers + stateful transform."""

from __future__ import annotations

import json
import os
import time


def drain_until_current(
    query, table: str, kind: str = "auto",
    timeout: float = 120.0, poll: float = 0.2,
) -> int:
    """Poll a RUNNING stream until its last completed batch's offset
    reaches the table's current head — the one-shot drain for the
    rate-limited log stream sources (round 13).

    Why this exists: the Python ``DataSourceStreamReader`` API has no
    admission control (``reportLatestOffset``), so with
    ``maxVersionsPerTrigger`` / ``maxSnapshotsPerTrigger`` set,
    ``availableNow`` terminates and ``processAllAvailable`` may return
    BETWEEN paced micro-batches — "no data available right now" is
    indistinguishable from "caught up". This helper closes the gap by
    comparing the query's committed end offset against the table's head
    read straight from table metadata (delta: latest log version;
    iceberg: snapshot count), re-reading the head each round so a table
    still being written converges on its moving tip.

    ``query`` must be running under the default or a processingTime
    trigger (an availableNow query terminates between paced batches —
    exactly the failure mode this replaces). Returns the offset
    reached. Raises TimeoutError if the stream stops advancing."""
    if kind == "auto":
        if os.path.isdir(os.path.join(table, "_delta_log")):
            kind = "delta"
        elif os.path.isdir(os.path.join(table, "metadata")):
            kind = "iceberg"
        else:
            raise ValueError(
                f"drain_until_current: {table!r} is neither a delta table "
                "(_delta_log) nor an iceberg table (metadata/) — pass "
                "kind='delta' or kind='iceberg'"
            )
    if kind not in ("delta", "iceberg"):
        raise ValueError(f"drain_until_current: unknown kind {kind!r}")

    def _head() -> int:
        if kind == "delta":
            from ..sources.deltalog import latest_version

            return latest_version(table)
        from ..sources.iceberg import load_metadata

        return len(load_metadata(table).get("snapshots", []))

    key = "version" if kind == "delta" else "pos"

    def _committed() -> int:
        p = query.lastProgress
        if not p or not p.get("sources"):
            return -1
        if len(p["sources"]) != 1:
            # which source's offset should be compared against `table`'s
            # head? Reading sources[0] silently would drain the WRONG
            # source for a union/join-of-streams query (round-14 order
            # item 7: fail loudly instead)
            raise ValueError(
                "drain_until_current supports single-source queries only "
                f"— this query reports {len(p['sources'])} sources; drain "
                "each source's query separately"
            )
        end = p["sources"][0].get("endOffset")
        if end is None:
            return -1
        if isinstance(end, str):
            try:
                end = json.loads(end)
            except json.JSONDecodeError:
                # Python data-source offsets serialize as a dict repr
                # (single quotes), not JSON
                import ast

                end = ast.literal_eval(end)
        return int(end.get(key, -1))

    deadline = time.time() + timeout
    while True:
        if not query.isActive:
            raise RuntimeError(
                "drain_until_current needs a RUNNING query (default or "
                "processingTime trigger) — an availableNow query "
                "terminates between paced batches, which is the gap this "
                "helper closes"
            )
        query.processAllAvailable()
        off = _committed()
        if off >= _head():
            return off
        if time.time() > deadline:
            raise TimeoutError(
                f"drain_until_current: stream at offset {off} < head "
                f"{_head()} after {timeout}s"
            )
        time.sleep(poll)
