"""CLI entry point.

    python -m database_toolbox_spark [--max-rows N] "SELECT ..."
        one-shot gated SQL against the configured data dir; prints one JSON
        row per line (the reference's result contract). --max-rows caps the
        printed rows (the tool surface is capped at 10,000 by default; the
        bare CLI prints everything unless capped here)
    python -m database_toolbox_spark --serve
        MCP-style stdio JSON-RPC server (initialize / tools/list / tools/call)
    python -m database_toolbox_spark --list-tables [csv]
        the list_tables tool from the shell
    python -m database_toolbox_spark --tool NAME ['{"arg": "value"}']
        call any registry tool (incl. the Looker/Dataplex toolsets) with
        JSON arguments; prints one JSON row per line
    python -m database_toolbox_spark --list-tools
        registered tool names with their parameter declarations

Prepend `--tools-file <path>` to register custom YAML tools (the
reference's extension surface, images/redshift/entrypoint.sh:80-82)
before any of the modes above.

Data dir / parallelism come from SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
(see config.resolve_env for aliases).
"""

from __future__ import annotations

import sys

from database_toolbox_spark import registry
from database_toolbox_spark.config import resolve_env
from database_toolbox_spark.executor import execute_sql, rows_as_json
from database_toolbox_spark.gate import StatementDenied
from database_toolbox_spark.server import serve
from database_toolbox_spark.session import get_spark, load_tables


def main(argv: list[str]) -> int:
    cfg = resolve_env()
    spark = get_spark(app_name="dts-cli", cpus=cfg.cpus,
                      shuffle_partitions=cfg.shuffle_partitions)
    load_tables(spark, cfg.sf_dir)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__.strip())
        return 0
    if argv[0] == "--tools-file":
        from database_toolbox_spark.tools_file import load_tools_file  # noqa: PLC0415

        load_tools_file(argv[1])
        argv = argv[2:]
        if not argv:
            for spec in registry.list_tools():
                print(spec.name)
            return 0
    if argv[0] == "--serve":
        serve(spark)
        return 0
    if argv[0] == "--list-tables":
        csv = argv[1] if len(argv) > 1 else ""
        for item in registry.call_tool(spark, "list_tables", {"table_names": csv}):
            print(item["text"])
        return 0
    if argv[0] == "--list-tools":
        for spec in registry.list_tools():
            params = ", ".join(
                f"{p.name}:{p.type}" + ("*" if p.required else "")
                for p in spec.parameters
            )
            print(f"{spec.name}({params})")
        return 0
    if argv[0] == "--tool":
        import json as _json  # noqa: PLC0415

        if len(argv) < 2:
            print("error: --tool requires a tool name", file=sys.stderr)
            return 2
        try:
            args = _json.loads(argv[2]) if len(argv) > 2 else {}
        except _json.JSONDecodeError as exc:
            print(f"error: --tool arguments are not valid JSON: {exc}",
                  file=sys.stderr)
            return 2
        try:
            items = registry.call_tool(spark, argv[1], args)
        except StatementDenied as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 2
        except KeyError as exc:
            print(f"error: unknown tool or argument {exc}", file=sys.stderr)
            return 2
        except TypeError as exc:
            # kwargs that don't bind to the tool signature land here
            print(f"error: bad tool arguments: {exc}", file=sys.stderr)
            return 2
        except ValueError as exc:
            # tool-raised validation (bad view name, unknown source, ...)
            print(f"error: {exc}", file=sys.stderr)
            return 2
        for item in items:
            print(item["text"])
        return 0
    max_rows = None
    if argv[0] == "--max-rows":
        if len(argv) < 3:
            print("error: --max-rows requires a count and a statement",
                  file=sys.stderr)
            return 2
        try:
            max_rows = int(argv[1])
        except ValueError:
            print(f"error: --max-rows: not an integer: {argv[1]!r}",
                  file=sys.stderr)
            return 2
        argv = argv[2:]
    try:
        rows = rows_as_json(execute_sql(spark, argv[0]), limit=max_rows)
    except StatementDenied as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    for line in rows:
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
