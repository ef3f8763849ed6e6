"""SQL text utilities for the SQL actors.

Re-implements the reference's SQL statement handling
(reference: etl/common/SqlActor.scala:121-194):
- comment stripping (block comments except ``/*+`` hints, ``--`` line tails)
- splitting multi-statement scripts on ``;``
- classifying ``set name = value`` / ``setrun name = <query>`` / plain SQL
- ``${var}`` substitution
- relation-name extraction (for the runner's reference-count auto-cache —
  the reference parses the plan; we tokenize FROM/JOIN targets and subtract
  CTE aliases, same observable behavior on the SQL the framework accepts).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_BLOCK_COMMENT = re.compile(r"/\*(?!\+).*?\*/", re.DOTALL)
_LINE_COMMENT = re.compile(r"--[^\n]*")
_VAR = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_.]*)\}")
_SET = re.compile(r"^\s*set\s+([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.+)$", re.IGNORECASE | re.DOTALL)
_SETRUN = re.compile(
    r"^\s*setrun\s+([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.+)$", re.IGNORECASE | re.DOTALL
)
_RELATION = re.compile(
    r"\b(?:from|join)\s+((?:[A-Za-z_][A-Za-z0-9_]*\.)?[A-Za-z_][A-Za-z0-9_]*)",
    re.IGNORECASE,
)
_CTE_ALIAS = re.compile(r"(?:\bwith|,)\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\([^)]*\))?\s+as\s*\(", re.IGNORECASE)
_QUERY_START = re.compile(r"^\s*(select|with|values)\b", re.IGNORECASE)
_DML_START = re.compile(r"^\s*(insert|update|merge|delete)\b", re.IGNORECASE)


def strip_comments(sql: str) -> str:
    """Blank out /*...*/ (keeping /*+ hints) and -- line comments
    (reference: etl/common/SqlActor.scala:162-174)."""
    return _LINE_COMMENT.sub("", _BLOCK_COMMENT.sub("", sql))


def split_statements(sql: str) -> list[str]:
    """Split on ';' outside quotes; drop empties."""
    out, buf, quote = [], [], None
    for ch in sql:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return [s.strip() for s in out if s.strip()]


def substitute(text: str, variables: dict[str, str], *, keep_unknown: bool = True) -> str:
    """Resolve ``${name}`` placeholders; unknown names left intact (they may
    be runtime SQL variables resolved later —
    reference: etl/common/SqlActor.scala:133-141)."""

    def repl(m: re.Match) -> str:
        name = m.group(1)
        if name in variables:
            return str(variables[name])
        if keep_unknown:
            return m.group(0)
        raise KeyError(f"unresolved variable ${{{name}}}")

    return _VAR.sub(repl, text)


@dataclass
class SqlStatement:
    kind: str  # "set" | "setrun" | "sql"
    text: str  # for set/setrun: the value / query; for sql: the statement
    name: str | None = None  # variable name for set/setrun


def classify_statements(sql: str, variables: dict[str, str]) -> list[SqlStatement]:
    """Strip comments, split, and classify each statement
    (reference: etl/common/SqlActor.scala:131-155). ``set`` values are
    ``${var}``-resolved immediately; ``setrun`` queries and plain SQL keep
    their placeholders for run-time resolution."""
    stmts: list[SqlStatement] = []
    for raw in split_statements(strip_comments(sql)):
        m = _SETRUN.match(raw)
        if m:
            stmts.append(SqlStatement("setrun", m.group(2).strip(), m.group(1)))
            continue
        m = _SET.match(raw)
        if m:
            stmts.append(
                SqlStatement("set", substitute(m.group(2).strip(), variables), m.group(1))
            )
            continue
        stmts.append(SqlStatement("sql", raw))
    return stmts


def extract_relations(sql: str) -> set[str]:
    """Table/view names a statement reads (FROM/JOIN targets minus CTE
    aliases) — drives reference-count auto-caching
    (reference: etl/common/SqlActor.scala:94-109)."""
    body = strip_comments(sql)
    ctes = {m.group(1).lower() for m in _CTE_ALIAS.finditer(body)}
    rels = {m.group(1) for m in _RELATION.finditer(body)}
    return {r for r in rels if r.lower() not in ctes}


def is_query(sql: str) -> bool:
    """select/with/values — gate for SqlReader
    (reference: etl/source/SqlReader.scala:10-21)."""
    return bool(_QUERY_START.match(strip_comments(sql)))


def is_dml(sql: str) -> bool:
    """insert/update/merge/delete — gate for SqlWriter
    (reference: etl/common/SqlActor.scala:191-194)."""
    return bool(_DML_START.match(strip_comments(sql)))
