"""YAML tool-file loader — the reference's extension surface, on Spark.

The reference's ONLY way to add custom tools is a YAML tools file
(`/root/reference/CONTRIBUTING.md:219-254`;
`/root/reference/images/redshift/redshift.yaml`,
`/root/reference/tests/sqlite/sqlite.yaml` are the two in-repo instances;
selected via `--tools-file`, `images/redshift/entrypoint.sh:80-82`). This
module loads the same file shape and registers each tool in the registry,
implementing all three statement-binding modes the reference exercises
(SURVEY.md §3, entry point 2):

- positional `$1` / `$1::text` (postgres kind,
  images/redshift/redshift.yaml:27-31) — rewritten to Spark named parameter
  markers `:p1` (casts become `CAST(:p1 AS <type>)`), bound positionally
  from the declared parameter order;
- named `:table_names` (sqlite kind, tests/sqlite/sqlite.yaml:19-22) —
  Spark's native named markers, passed straight to `spark.sql(..., args=)`;
- raw `{{sql}}` template (tests/sqlite/sqlite.yaml:34) — textual
  substitution BEFORE the permission gate, i.e. execute_sql passthrough
  semantics.

Every statement — bound or substituted — passes the default-deny gate
before execution. Statements are written in Spark SQL (the engine here);
`sources:` entries are validated for env completeness
(`${VAR}` substitution, images/redshift/redshift.yaml:1-8) but carry no
connection to open — Spark's registered views are the data.
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

from database_toolbox_spark import executor, registry
from database_toolbox_spark.config import ConfigError

_ENV_REF = re.compile(r"\$\{(\w+)\}")
_POSITIONAL = re.compile(r"\$(\d+)(?:::(\w+))?")
_TEMPLATE = re.compile(r"\{\{(\w+)\}\}")

# postgres cast names seen in reference statements → Spark SQL types
_PG_TYPES = {"text": "STRING", "int": "INT", "integer": "INT",
             "bigint": "BIGINT", "float": "DOUBLE", "boolean": "BOOLEAN"}


def _substitute_env(raw: str, env: dict[str, str]) -> str:
    """`${VAR}` → value; any missing variable fails fast (mirrors the
    entrypoints' required-param validation,
    images/snowflake-mcp/entrypoint.sh:121-130)."""
    missing = sorted({m.group(1) for m in _ENV_REF.finditer(raw)} - env.keys())
    if missing:
        raise ConfigError(f"tools file references unset env vars: {missing}")
    return _ENV_REF.sub(lambda m: env[m.group(1)], raw)


def _positional_to_named(stmt: str) -> str:
    """`$1` / `$1::text` → `:p1` / `CAST(:p1 AS STRING)`."""
    def repl(m: re.Match[str]) -> str:
        name = f":p{m.group(1)}"
        if m.group(2):
            return f"CAST({name} AS {_PG_TYPES.get(m.group(2).lower(), 'STRING')})"
        return name

    return _POSITIONAL.sub(repl, stmt)


def _make_fn(statement: str | None, params: list[dict[str, Any]]):
    """Build the tool callable for one YAML tool entry."""
    declared = [p["name"] for p in params]

    def fn(spark, **kwargs):
        if statement is None:
            # execute-sql kind without a statement: the argument IS the SQL
            return executor.execute_sql(spark, kwargs["sql"])
        stmt = statement
        if _TEMPLATE.search(stmt):
            # raw template mode: substitute, then gate like execute_sql
            stmt = _TEMPLATE.sub(lambda m: str(kwargs.get(m.group(1), "")), stmt)
            return executor.execute_sql(spark, stmt)
        args: dict[str, Any] = {}
        if _POSITIONAL.search(stmt):
            stmt = _positional_to_named(stmt)
            for i, name in enumerate(declared, start=1):
                args[f"p{i}"] = kwargs.get(name)
        else:
            args = {name: kwargs.get(name) for name in declared}
        # Spark rejects an args dict whose keys never appear in the statement
        used = {m for m in re.findall(r":(\w+)", stmt)}
        args = {k: v for k, v in args.items() if k in used}
        return executor.execute_sql(spark, stmt.rstrip().rstrip(";"), args=args or None)

    return fn


def load_tools_file(path: str, env: dict[str, str] | None = None
                    ) -> list[registry.ToolSpec]:
    """Parse a reference-shaped tools file and register every tool. Returns
    the registered specs (also callable via registry.call_tool)."""
    env = dict(os.environ if env is None else env)
    raw = _substitute_env(open(path).read(), env)
    doc = yaml.safe_load(raw)
    if not isinstance(doc, dict) or "tools" not in doc:
        raise ConfigError(f"{path}: not a tools file (missing 'tools' mapping)")
    sources = doc.get("sources") or {}
    for sname, sdef in sources.items():
        # JDBC connections are deployment-time config (this file), never
        # tool arguments — register them for register_jdbc_table to
        # reference by name (reference source concept,
        # images/redshift/redshift.yaml:1-8)
        if isinstance(sdef, dict) and str(sdef.get("kind", "")) == "jdbc":
            for req in ("url", "driver_class"):
                if not sdef.get(req):
                    raise ConfigError(
                        f"jdbc source {sname!r}: missing {req!r}"
                    )
            registry.register_jdbc_source(
                sname, str(sdef["url"]), str(sdef["driver_class"])
            )
    specs: list[registry.ToolSpec] = []
    for name, tool in (doc["tools"] or {}).items():
        src = tool.get("source")
        if src is not None and src not in sources:
            raise ConfigError(f"tool {name!r} references unknown source {src!r}")
        params = tool.get("parameters") or []
        statement = tool.get("statement")
        if statement is None and not str(tool.get("kind", "")).endswith("execute-sql"):
            raise ConfigError(f"tool {name!r}: no statement and not an "
                              "execute-sql kind")
        if statement is None and not params:
            params = [{"name": "sql", "type": "string",
                       "description": "SQL statement"}]
        spec = registry.ToolSpec(
            name=name,
            description=str(tool.get("description", "")).strip(),
            fn=_make_fn(statement, params),
            parameters=tuple(
                registry.ToolParam(
                    p["name"], p.get("type", "string"),
                    p.get("description", ""),
                )
                for p in params
            ),
        )
        registry.register(spec)
        specs.append(spec)
    return specs
