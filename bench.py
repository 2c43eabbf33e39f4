#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Each query is timed end-to-end (plan + execute + collect), after one
warm-up action that amortizes JVM/session startup out of the numbers.
Two full passes run and the per-query MIN is recorded (both passes are
kept in BENCH_DETAIL.json): one-shot numbers on a shared box carry
±20% contention noise, and min-of-2 makes the 2×-baseline gate and
round-over-round regression comparisons trustworthy.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def _materialize(df) -> int:
    """Force full evaluation of every output column.

    Narrow results are collected outright. Wide results (>8 columns)
    used to be measured with ``df.count()``, but Catalyst prunes
    computed projections under a count, so pure-projection queries
    (e.g. text_gopher_quality) timed little more than the scan. A
    checksum aggregate over a struct of ALL columns keeps every
    expression in the timed path while still returning one row.
    Map-typed columns are not hashable in Spark, so they are rendered
    to JSON first; if the checksum still cannot be planned, fall back
    to a real collect (never to count).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    if len(df.columns) <= 8:
        return len(df.collect())
    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, MapType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    # decimal(38,0) sum: exact and overflow-free under ANSI mode
    # (a long sum of xxhash64 values overflows almost immediately)
    checksum = F.sum(F.xxhash64(F.struct(*cols)).cast("decimal(38,0)"))
    try:
        return len(df.agg(checksum).collect())
    except Exception:
        return len(df.collect())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from baseline_magician_spark.registry import get_queries
    from baseline_magician_spark.session import get_spark

    spark = get_spark(app_name="bms-bench")

    # Warm-up: touch the fact table so JVM/classloader startup is not
    # attributed to the first query.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    passes: dict[str, list[float]] = {}
    for _pass in range(2):
        for name, fn in sorted(get_queries().items()):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            _ = _materialize(df)
            passes.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

    timings = {name: min(ts) for name, ts in passes.items()}
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Per-query budget gate (round-3 advice): every query's min-of-2
    # is compared against the recorded best (BENCH_BUDGETS.json); a
    # query over 2x budget + 0.4s absolute slack is a regression that
    # fails LOUDLY here instead of hiding inside the total. Budgets
    # ratchet DOWN automatically (a faster run tightens them); set
    # SPARK_GRAFT_UPDATE_BUDGETS=1 to also admit slower numbers after
    # an intentional change.
    budget_path = os.path.join(REPO_DIR, "BENCH_BUDGETS.json")
    try:
        with open(budget_path) as f:
            budgets: dict[str, float] = json.load(f)
    except (OSError, ValueError):
        budgets = {}
    # Ratchet FLOORS (round 7): queries whose cost is dominated by
    # fixed engine lifecycle (streaming query start / checkpoint /
    # state-store commit, ~1.3 s at any data size) get a minimum
    # budget. Without a floor, one exceptionally fast idle run
    # ratchets the budget so low that ordinary scheduler contention
    # on the fixed part alone trips the 2x gate — the r6
    # streaming_baseline_windows violation was exactly this (4.12 s
    # under loadavg 5-9 vs a 1.69 s best-ever budget; the data work
    # in that query is ~0.2 s). ch_sql_insert_select is the same
    # class: three sequential jobs with two parquet commit rounds
    # (INSERT SELECT write, VALUES append, read-back) — 1.6 s idle
    # floor against a 0.8 s best-ever budget. Cause and numbers:
    # BASELINE.md.
    # similarity_lsh_bucket_histogram joined the class in r8: the
    # embeddings table is 2,000 rows at sf0.1, so the query is ~ms of
    # data work behind ~0.3-0.5 s of scan/schedule lifecycle; its
    # 0.78 s best-ever budget (an idle r4 run) left the 2x gate
    # within scheduler-contention range and it tripped at 2.5 s under
    # loadavg 3-5 while measuring 1.1 s warm standalone.
    # streaming_funnel_levels joined in r9: four sequential
    # foreachBatch micro-batches with state-store commits put its
    # steady wall at 2.8-3.6 s while the best-ever (idle r5) was
    # 1.45 s, leaving the 2x gate at 3.3 s — inside ordinary
    # contention range (tripped at 3.53 s under loadavg ~3-5 with
    # no streaming code change in the round).
    # dedup_connected_components joined the class in r11: the driver
    # union-find path is a fixed multi-job lifecycle (eager pair
    # checkpoint, bounded limit-collect, local-relation
    # materialization, final collect) over a Python-stage pair
    # subtree — ~1.2 s idle, but every job boundary is exposed to
    # scheduler/steal contention, and its best-ever budget (1.19 s,
    # an idle run) left the 2x gate at 2.8 s while the same code
    # measured 4.4-9.8 s under loadavg ~8 with 2-8% hypervisor CPU
    # steal the same day. text_eval_decontamination is the same
    # class at smaller scale: two Arrow-batched Python subtrees + a
    # broadcast build (0.99 s idle vs a 0.74 s best-ever budget,
    # tripped at 2.3 s under the same load).
    _BUDGET_FLOORS = {
        "streaming_baseline_windows": 2.0,
        "ch_sql_insert_select": 1.3,
        "similarity_lsh_bucket_histogram": 1.2,
        "streaming_funnel_levels": 2.0,
        "dedup_connected_components": 2.0,
        "text_eval_decontamination": 1.1,
    }
    for _n, _floor in _BUDGET_FLOORS.items():
        if _n in budgets:
            budgets[_n] = max(budgets[_n], _floor)
    violations = {
        name: {"sec": t, "budget": budgets[name]}
        for name, t in timings.items()
        if name in budgets and t > 2.0 * budgets[name] + 0.4
    }
    # Merge over the existing budgets dict: a query not benched this
    # run (e.g. a filtered run) keeps its recorded budget instead of
    # being silently dropped.
    new_budgets = dict(budgets)
    new_budgets.update(
        {
            name: round(min(t, budgets.get(name, t)), 3)
            if not (
                os.environ.get("SPARK_GRAFT_UPDATE_BUDGETS")
                and name in violations
            )
            else round(t, 3)
            for name, t in timings.items()
        }
    )
    for name, floor in _BUDGET_FLOORS.items():
        if name in new_budgets:
            new_budgets[name] = max(new_budgets[name], floor)
    try:
        with open(budget_path, "w") as f:
            json.dump(new_budgets, f, indent=1, sort_keys=True)
    except OSError:
        pass
    try:
        loadavg = list(os.getloadavg())
    except OSError:
        loadavg = []
    for name, v in sorted(violations.items()):
        print(
            f"BUDGET VIOLATION: {name} {v['sec']:.2f}s > "
            f"2 x {v['budget']:.2f}s + 0.4s",
            file=sys.stderr,
        )
    detail = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": passes,
        "sf": sf_val,
        "loadavg": loadavg,
        "budget_violations": violations,
    }
    # Full per-query detail: one (long) line + a file copy. The FINAL
    # stdout line is the compact summary — the caller captures a
    # bounded tail of stdout, and the detail line exceeds it.
    print(json.dumps(detail))
    try:
        with open(os.path.join(REPO_DIR, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError:
        pass
    # Final one-line JSON: per the driver contract it must carry the
    # per-query min map ("queries") — PERF/scaling comparisons in r10/r11
    # were blind because only the total was emitted here (the detail line
    # above exceeds the bounded stdout tail the caller captures). The map
    # is ~8 KB for 238 queries, well within a captured tail line.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                "sf": sf_val,
                "loadavg": loadavg,
                "n_budget_violations": len(violations),
            }
        )
    )
    spark.stop()
    # Budget violations print above; with SPARK_GRAFT_STRICT_BUDGETS
    # set they also fail the process. Default stays exit-0 because the
    # per-round bench runs on a shared box where contention noise can
    # trip the gate without a real regression (re-time in isolation
    # before believing a flag).
    if violations and os.environ.get("SPARK_GRAFT_STRICT_BUDGETS"):
        sys.exit(1)


if __name__ == "__main__":
    main()
