"""CLI entry point (reference R15: bin/build-graph-db, 16-line argparse
wrapper). Usage:

    python -m graphdbetl_spark build -f config.yml -o out/ [--format csv]
                                     [--skip-bad-sources] [--neo4j]
    python -m graphdbetl_spark bench
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="graphdbetl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build a graph database from a YAML config")
    b.add_argument("-f", "--config", required=True, help="YAML config file")
    b.add_argument("-o", "--out", required=True, help="output directory")
    b.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    b.add_argument("-m", "--mysql-config-file", default=None,
                   help="MySQL option file (~/.my.cnf dialect) used as the "
                        "default 'config file' for mysql sources (reference "
                        "bin/build-graph-db -m)")
    b.add_argument("--skip-bad-sources", action="store_true",
                   help="warn and skip unreachable sources (reference soft-fail)")
    b.add_argument("--neo4j", action="store_true",
                   help="also emit neo4j-admin import CSVs under <out>/neo4j")
    b.add_argument("--cpus", type=int, default=None)

    sub.add_parser("bench", help="run the headline benchmark (prints one JSON line)")

    args = parser.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from graphdbetl_spark.etl.builder import GraphDBBuilder
    from graphdbetl_spark.session import get_spark

    spark = get_spark("graphdbetl-build", cpus=args.cpus)
    builder = GraphDBBuilder.from_config_file(
        spark, args.config, mysql_config_file=args.mysql_config_file
    )
    builder.build(skip_bad_sources=args.skip_bad_sources)
    builder.write(args.out, fmt=args.format)
    if args.neo4j:
        from graphdbetl_spark.etl.neo4j_export import export_for_neo4j_admin

        export_for_neo4j_admin(builder, f"{args.out}/neo4j")
    print(
        f"built {len(builder.nodes)} node type(s), "
        f"{len(builder.relationships)} relationship type(s) -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
