"""CLI entry points mirroring the reference's four pipeline mains, so a
user of the reference can run the same jobs against this engine:

    python -m apache_beam_challange_spark.cli sql-cycle-rides --sf-dir D --output P
    python -m apache_beam_challange_spark.cli cycle-rides     --sf-dir D --output P [--top-n N]
    python -m apache_beam_challange_spark.cli stations        --sf-dir D --output P
    python -m apache_beam_challange_spark.cli total-distance  --sf-dir D --output P [--input-col id|name]

Flag parity with the reference: ``--top-n`` (``pipelines/cycle_rides.py:23``,
default 100000) and ``--input-col`` (``pipelines/total_distance.py:65``,
id/name family). Sinks mirror the reference's choices: header CSV for
cycle-rides (``cycle_rides.py:61-63``), plain text for sql-cycle-rides and
stations (``sql_cycle_rides.py:47``, ``stations.py:77``), single-file CSV
for total-distance (``total_distance.py:130-133``).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="apache_beam_challange_spark")
    sub = p.add_subparsers(dest="pipeline", required=True)

    def common(sp: argparse.ArgumentParser) -> None:
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        sp.add_argument("--output", required=True)

    common(sub.add_parser("sql-cycle-rides", help="top-100 ride pairs via the SQL facade"))

    cr = sub.add_parser("cycle-rides", help="top-N ride pairs via operators")
    common(cr)
    cr.add_argument("--top-n", type=int, default=100000)
    cr.add_argument(
        "--faithful",
        action="store_true",
        help="byte-compatible reference output: swapped (end, start, count) "
        "column order under the (start, end, amount) header "
        "(cycle_rides.py:55 vs :63)",
    )

    common(sub.add_parser("stations", help="all-pairs station distances"))

    td = sub.add_parser("total-distance", help="total km per station pair")
    common(td)
    td.add_argument("--input-col", choices=("id", "name"), default="id")
    td.add_argument(
        "--faithful",
        action="store_true",
        help="byte-compatible reference DoFn zero-fill: zero BOTH columns "
        "when either side is missing (total_distance.py:16-29); id family "
        "only",
    )

    q = sub.add_parser(
        "query",
        help="run ANY registry query by name (driver or extended tier) "
        "and write parquet; --list prints the catalog",
    )
    q.add_argument("name", nargs="?", help="registry query name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--output", help="parquet output dir (omit to just show)")
    q.add_argument("--show", type=int, default=0, metavar="N", help="print first N rows")
    q.add_argument("--list", action="store_true", help="list all registry queries")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    from apache_beam_challange_spark.plans import registry
    from apache_beam_challange_spark.session import get_spark
    from apache_beam_challange_spark.sources.sinks import (
        write_csv,
        write_csv_single,
        write_text,
    )

    args = _build_parser().parse_args(argv)
    registry.load_all()

    if args.pipeline == "query":
        catalog = registry.all_queries()
        if args.list or not args.name:
            ext = registry.extended_names()
            for name in sorted(catalog):
                tier = "extended" if name in ext else "driver"
                print(f"{name}\t{tier}")
            return 0
        if args.name not in catalog:
            print(f"unknown query: {args.name} (try --list)", file=sys.stderr)
            return 2
        spark = spark or get_spark(f"cli-query-{args.name}")
        df = catalog[args.name](spark, args.sf_dir)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"{args.name}: wrote {args.output}")
        if args.show or not args.output:
            df.show(args.show or 20, truncate=False)
        return 0

    spark = spark or get_spark(f"cli-{args.pipeline}")

    if args.pipeline == "sql-cycle-rides":
        df = registry.QUERIES["q1_sql_top_pairs"](spark, args.sf_dir)
        write_text(df, args.output)
    elif args.pipeline == "cycle-rides":
        # the SAME driver-verified query, parameterized — the CLI must
        # never drift from what the gate checks (it previously inlined a
        # copy of the project/count/top-k/faithful-swap block)
        from apache_beam_challange_spark.plans.canonical import q2_top_pairs_ops

        df = q2_top_pairs_ops(
            spark, args.sf_dir, faithful=args.faithful, k=args.top_n
        )
        write_csv(df, args.output, header=True)
    elif args.pipeline == "stations":
        df = registry.QUERIES["q3_station_distances"](spark, args.sf_dir)
        write_text(df, args.output)
    elif args.pipeline == "total-distance":
        if args.input_col == "id":
            from apache_beam_challange_spark.plans.canonical import q4_total_distance

            df = q4_total_distance(spark, args.sf_dir, faithful=args.faithful)
        else:
            df = registry.QUERIES["q4_total_distance_by_name"](spark, args.sf_dir)
        write_csv_single(df, args.output, header=True)
    print(f"{args.pipeline}: wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
