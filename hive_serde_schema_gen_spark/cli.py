"""CLI entry point — the Spark twin of ``Generator.main``
(``/root/reference/Generator.scala:4-11``): ``file [tableName]`` →
Hive DDL script on stdout; default table name ``data``
(``Schemer.scala:117``)."""

from __future__ import annotations

import argparse
import sys

from .schema_infer import SchemaGenError, infer_path
from .session import get_spark


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="hive-serde-schema-gen-spark",
        description="Infer the strictest Hive schema for an NDJSON file and "
        "emit a CREATE TABLE script (distributed via Spark).",
    )
    p.add_argument("file", help="NDJSON input path/glob (local or any Hadoop FS)")
    p.add_argument("table", nargs="?", default="data", help="table name (default: data)")
    p.add_argument(
        "--mode",
        choices=["FAILFAST", "PERMISSIVE"],
        default="FAILFAST",
        help="FAILFAST aborts on the first bad line (reference behavior); "
        "PERMISSIVE skips bad rows",
    )
    p.add_argument("--sampling-ratio", type=float, default=None)
    p.add_argument(
        "--detect-dates",
        action="store_true",
        help="type ISO-8601 strings as DATE/TIMESTAMP (opt-in deviation; "
        "default keeps the reference's strings-stay-strings behavior)",
    )
    p.add_argument(
        "--infer-maps",
        type=int,
        default=None,
        metavar="N",
        help="rewrite nested structs with >= N keys of one unified value "
        "type as MAP<STRING, T> (opt-in deviation for key-as-data objects "
        "— per-user dicts, counters — whose key set never converges; the "
        "reference has no MAP type, so the default output is unchanged)",
    )
    p.add_argument(
        "--evolve-from",
        metavar="OLD_FILE",
        default=None,
        help="also infer OLD_FILE's schema and print ALTER TABLE statements "
        "migrating it to FILE's schema (instead of a CREATE TABLE script)",
    )
    args = p.parse_args(argv)

    spark = get_spark("hive-serde-schema-gen")
    try:
        result = infer_path(
            spark, args.file, mode=args.mode, sampling_ratio=args.sampling_ratio,
            detect_dates=args.detect_dates,
        )
        if args.infer_maps is not None:
            from .schema_infer.lattice import structs_to_maps

            result.schema = structs_to_maps(result.schema, args.infer_maps)
        if args.evolve_from is not None:
            from .schema_infer import alter_statements

            old = infer_path(
                spark, args.evolve_from, mode=args.mode,
                sampling_ratio=args.sampling_ratio,
                detect_dates=args.detect_dates,
            )
            if args.infer_maps is not None:
                # both sides rewritten, or every mapped column would
                # show up as a spurious STRUCT->MAP type change
                old.schema = structs_to_maps(old.schema, args.infer_maps)
            stmts = alter_statements(args.table, old.schema, result.schema)
            print(
                "\n".join(stmts)
                if stmts
                else f"-- no changes: {args.table} already fits the new data"
            )
            return 0
    except SchemaGenError as e:
        print(str(e), file=sys.stderr)
        return 1
    except Exception as e:  # e.g. missing input path surfacing from the JVM
        lines = [ln.strip(" :") for ln in str(e).splitlines() if ln.strip()]
        # Py4J wraps the real cause: prefer the first line naming an
        # exception/cause over the generic "An error occurred while calling"
        cause = next(
            (ln for ln in lines if "Exception" in ln and "error occurred" not in ln),
            lines[0] if lines else type(e).__name__,
        )
        print(f"error: {cause}", file=sys.stderr)
        return 1
    print(result.table(args.table, args.file))
    for err in result.errors:
        print(f"skipped line {err.line}: {err.message}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
