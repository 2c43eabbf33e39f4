#!/usr/bin/env python
"""Optimization-round profiler (guide §1): per query, split wall time
into BUILD (the Python call that returns the DataFrame — dialect
compile, eager driver round-trips, analysis probes) and EXEC (noop
sink, which computes every column of every row without the collect /
checksum cost), and dump `.explain("formatted")` per query.

Not the driver bench — bench.py stays the contract. This exists so
optimization targets the right phase: at sf0.1 many queries are
driver/compile bound, and a plan-shape fix looks identical to noise
unless the phases are separated.

Usage: python profile_bench.py [name-substring ...]
  env SPARK_GRAFT_PROFILE_PASSES=2   passes (min is reported)
  env SPARK_GRAFT_PROFILE_PLANS=dir  where to write explain files
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.environ.get("SPARK_GRAFT_PROFILE_PLANS", "")
    passes = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "2"))
    pats = sys.argv[1:]

    from baseline_magician_spark.registry import get_queries
    from baseline_magician_spark.session import get_spark

    spark = get_spark(app_name="bms-profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    queries = {
        n: f
        for n, f in sorted(get_queries().items())
        if not pats or any(p in n for p in pats)
    }
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict[str, float]] = {}
    for _p in range(passes):
        for name, fn in queries.items():
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec = out.setdefault(name, {"build": 1e9, "exec": 1e9})
            rec["build"] = round(min(rec["build"], t1 - t0), 3)
            rec["exec"] = round(min(rec["exec"], t2 - t1), 3)
            if plans_dir and _p == 0:
                try:
                    txt = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception as ex:  # pragma: no cover
                    txt = f"explain failed: {ex}"
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(txt)
    spark.sparkContext.setJobDescription(None)

    rows = sorted(
        out.items(), key=lambda kv: -(kv[1]["build"] + kv[1]["exec"])
    )
    total_b = sum(v["build"] for v in out.values())
    total_e = sum(v["exec"] for v in out.values())
    for name, v in rows:
        print(
            f"{v['build'] + v['exec']:8.2f}  build {v['build']:7.2f}"
            f"  exec {v['exec']:7.2f}  {name}"
        )
    print(
        f"TOTAL {total_b + total_e:.1f}s  build {total_b:.1f}s "
        f"exec {total_e:.1f}s  n={len(out)}"
    )
    with open("/tmp/profile_bench.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
