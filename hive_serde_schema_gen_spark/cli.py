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
    args = p.parse_args(argv)

    spark = get_spark("hive-serde-schema-gen")
    try:
        result = infer_path(
            spark, args.file, mode=args.mode, sampling_ratio=args.sampling_ratio
        )
    except SchemaGenError as e:
        print(str(e), file=sys.stderr)
        return 1
    except Exception as e:  # e.g. missing input path surfacing from the JVM
        first = str(e).splitlines()[0] if str(e) else type(e).__name__
        print(f"error: {first}", file=sys.stderr)
        return 1
    print(result.table(args.table, args.file))
    for err in result.errors:
        print(f"skipped line {err.line}: {err.message}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
