"""CLI entry point — drop-in shape of the reference binary.

The reference runs as ``baseline_magician -networks_list=a,b,c`` with
config at /etc/fastnetmon/baseline_magician.conf (main.go:54, 75-86).
Here:

    python -m baseline_magician_spark \
        --config /etc/fastnetmon/baseline_magician.conf \
        --metrics-path /data/host_metrics \
        --networks_list 10.0.0.0/24,10.1.0.0/16 \
        [--dry-run]

``--metrics-path`` points at the parquet fact table (the ClickHouse
connection fields in the config are accepted but unused — the Spark
engine reads the lakehouse copy). ``--dry-run`` prints the generated
host groups as JSON instead of publishing to the API.
"""

from __future__ import annotations

import argparse
import json
import sys

import logging

from .config import BaselineConfig
from .job import run_baseline_job
from .plans.baseline import REFERENCE_METRICS
from .session import get_spark

log = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="baseline_magician_spark")
    ap.add_argument(
        "--config",
        default="/etc/fastnetmon/baseline_magician.conf",
        help="JSON config (reference-compatible keys)",
    )
    ap.add_argument(
        "--metrics-path", default=None, help="parquet path of the fact table"
    )
    ap.add_argument(
        "--run-query",
        default=None,
        metavar="NAME",
        help="run a registered engine query by name instead of the "
        "baseline job; prints the result as JSON lines",
    )
    ap.add_argument(
        "--run-sql",
        default=None,
        metavar="SQL",
        help="run a ClickHouse-dialect SQL string against the --sf-dir "
        "tables (plans/ch_sql.py front end); prints JSON lines",
    )
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="table directory for --run-query/--run-sql (parquet per table)",
    )
    ap.add_argument(
        "--networks_list",
        default="",
        help="comma-separated CIDRs (reference -networks_list flag)",
    )
    ap.add_argument("--host-col", default="host")
    ap.add_argument("--time-col", default="metricDateTime")
    ap.add_argument("--date-col", default=None)
    ap.add_argument(
        "--dry-run", action="store_true", help="print host groups, don't publish"
    )
    args = ap.parse_args(argv)

    if args.run_query is not None:
        from .registry import get_queries

        queries = get_queries()
        if args.run_query not in queries:
            ap.error(
                f"unknown query {args.run_query!r}; registered: "
                + ", ".join(sorted(queries)[:8])
                + ", ..."
            )
        spark = get_spark(app_name=f"bms-query-{args.run_query}")
        df = queries[args.run_query](spark, args.sf_dir)
        for row in df.collect():
            json.dump(row.asDict(recursive=True), sys.stdout, default=str)
            sys.stdout.write("\n")
        return 0

    if args.run_sql is not None:
        from .catalog import TABLES, load_table
        from .plans.ch_insert import run_ch_statement

        spark = get_spark(app_name="bms-sql")
        tables = {t: load_table(spark, args.sf_dir, t) for t in TABLES}
        # statement-level routing: INSERT text takes the driver's
        # isInsert path (VALUES block / INSERT SELECT), everything
        # else is a SELECT-family query
        df = run_ch_statement(args.run_sql, tables)
        for row in df.collect():
            json.dump(row.asDict(recursive=True), sys.stdout, default=str)
            sys.stdout.write("\n")
        return 0

    if args.metrics_path is None:
        ap.error("--metrics-path is required (unless --run-query/--run-sql)")

    with open(args.config) as f:
        config = BaselineConfig.from_json(f.read())

    spark = get_spark(app_name="baseline-magician-job")
    metrics = spark.read.parquet(args.metrics_path)
    # aggregate whichever of the reference's 26 counters the table has
    # (the reference hard-fails on a missing column; a lakehouse table
    # with a metric subset is a normal deployment here)
    metric_cols = tuple(c for c in REFERENCE_METRICS if c in metrics.columns)
    missing = set(REFERENCE_METRICS) - set(metric_cols)
    if missing:
        log.warning("metrics table lacks %d reference counters: %s",
                    len(missing), ", ".join(sorted(missing)[:5]) + "...")
    groups = run_baseline_job(
        spark,
        config,
        metrics,
        cli_networks_list=args.networks_list,
        metric_cols=metric_cols,
        host_col=args.host_col,
        time_col=args.time_col,
        date_col=args.date_col,
        publish=not args.dry_run,
    )
    if args.dry_run:
        json.dump(groups, sys.stdout, indent=2, default=str)
        print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
