"""Statement-type permission gate — the one nontrivial in-repo semantic of the
reference (SURVEY.md §2.C).

The reference configures snowflake-labs-mcp with a statement classifier
permission list (`/root/reference/images/snowflake-mcp/entrypoint.sh:199-233`):

- Allowed:  Select, Show, Describe, Explain, Use        (lines 212-216)
- Denied:   Create, Alter, Drop, Insert, Update, Delete, Merge, TruncateTable,
            Grant, Revoke, Commit, Rollback, Transaction, Command, Comment,
            Unknown                                      (lines 217-232)

`Unknown: false` makes the gate **default-deny**: anything we cannot classify
is rejected, not passed through. This is a pre-execution check on the SQL text,
not a Catalyst rule — classification happens before `spark.sql()` is called.

The classifier is a lightweight lexer: strip comments and string literals,
then look at the first top-level keyword (descending into WITH to find the
statement the CTE chain feeds). It never executes anything.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Statement classes and their verdicts, mirroring entrypoint.sh:211-232.
ALLOWED_CLASSES: frozenset[str] = frozenset(
    {"Select", "Show", "Describe", "Explain", "Use"}
)
DENIED_CLASSES: frozenset[str] = frozenset(
    {
        "Create",
        "Alter",
        "Drop",
        "Insert",
        "Update",
        "Delete",
        "Merge",
        "TruncateTable",
        "Grant",
        "Revoke",
        "Commit",
        "Rollback",
        "Transaction",
        "Command",
        "Comment",
        "Unknown",
    }
)

# First-keyword → statement class. SELECT-equivalent entry points (VALUES,
# TABLE) classify as Select: they are read-only row producers in Spark SQL.
_KEYWORD_CLASS: dict[str, str] = {
    "SELECT": "Select",
    "VALUES": "Select",
    "TABLE": "Select",
    "SHOW": "Show",
    "DESCRIBE": "Describe",
    "DESC": "Describe",
    "EXPLAIN": "Explain",
    "USE": "Use",
    "CREATE": "Create",
    "ALTER": "Alter",
    "DROP": "Drop",
    "INSERT": "Insert",
    "UPDATE": "Update",
    "DELETE": "Delete",
    "MERGE": "Merge",
    "TRUNCATE": "TruncateTable",
    "GRANT": "Grant",
    "REVOKE": "Revoke",
    "COMMIT": "Commit",
    "ROLLBACK": "Rollback",
    "BEGIN": "Transaction",
    "START": "Transaction",
    "COMMENT": "Comment",
    # Spark/warehouse side-effecting commands → Command (denied).
    "SET": "Command",
    "RESET": "Command",
    "CACHE": "Command",
    "UNCACHE": "Command",
    "REFRESH": "Command",
    "ANALYZE": "Command",
    "MSCK": "Command",
    "LOAD": "Command",
    "CALL": "Command",
    "COPY": "Command",
    "EXPORT": "Command",
    "IMPORT": "Command",
    "VACUUM": "Command",
    "OPTIMIZE": "Command",
}

_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)
# Single/double-quoted literals (with '' and \' escapes) and backtick idents.
_STRING_RE = re.compile(r"'(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.)*\"|`[^`]*`")
_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class StatementDenied(PermissionError):
    """Raised when the gate rejects a statement (denied or unclassifiable)."""

    def __init__(self, statement_class: str, sql: str):
        self.statement_class = statement_class
        self.sql = sql
        super().__init__(
            f"statement class {statement_class!r} is not permitted "
            f"(allowed: {sorted(ALLOWED_CLASSES)})"
        )


@dataclass(frozen=True)
class Classification:
    statement_class: str
    allowed: bool


def _normalize(sql: str) -> str:
    """Strip comments and blank out string literals (keeps token positions
    honest: a DELETE inside a string must not classify the statement)."""
    sql = _COMMENT_RE.sub(" ", sql)
    sql = _STRING_RE.sub("''", sql)
    return sql


def _top_level_words(sql: str) -> list[str]:
    """Uppercased identifiers/keywords appearing at paren-depth 0."""
    out: list[str] = []
    depth = 0
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "(":
            depth += 1
            i += 1
        elif ch == ")":
            depth = max(0, depth - 1)
            i += 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            m = _WORD_RE.match(sql, i)
            if m is None:
                # unicode letter outside [A-Za-z_] — never a keyword; the
                # statement will classify Unknown (default-deny) unless a
                # real keyword leads
                i += 1
                continue
            out.append(m.group(0).upper())
            i = m.end()
        else:
            i += 1
    return out


def classify(sql: str) -> Classification:
    """Classify a single SQL statement; default-deny on anything unknown."""
    if not isinstance(sql, str) or not sql.strip():
        return Classification("Unknown", False)
    norm = _normalize(sql).strip()
    # Multiple statements → Unknown (default-deny): the reference binds one
    # statement per tool call (images/redshift/redshift.yaml:44-48).
    if ";" in norm.rstrip(" \n\t;"):
        return Classification("Unknown", False)
    words = _top_level_words(norm)
    if not words:
        return Classification("Unknown", False)
    first = words[0]
    if first == "WITH":
        # CTE chain: the statement class is the first statement keyword that
        # appears at top level after the CTE definitions (whose bodies are
        # parenthesized, hence not top-level words).
        for w in words[1:]:
            if w in ("SELECT", "INSERT", "UPDATE", "DELETE", "MERGE", "VALUES", "TABLE"):
                cls = _KEYWORD_CLASS[w]
                return Classification(cls, cls in ALLOWED_CLASSES)
        return Classification("Unknown", False)
    cls = _KEYWORD_CLASS.get(first, "Unknown")
    return Classification(cls, cls in ALLOWED_CLASSES)


def check(sql: str) -> str:
    """Gate a statement; return its class or raise StatementDenied."""
    c = classify(sql)
    if not c.allowed:
        raise StatementDenied(c.statement_class, sql)
    return c.statement_class
