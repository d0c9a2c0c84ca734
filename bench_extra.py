"""Isolation bench (guide §1.4): time individual contract queries with
the noop sink and optionally dump .explain("formatted") plans.

Usage:
  SPARK_GRAFT_SF_DIR=/root/sf1 python bench_extra.py [-n N] [--explain DIR] q1 q2 ...

Same session/layout/conf discipline as bench.py (frozen); this file is
the round-6 measurement side-car. Prints one JSON line per query:
{"query": name, "walls": [...], "min": s, "cpu_core_s": [...], "gc_s": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to write <q>.txt plans")
    ap.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from webxtract import contract
    from webxtract.session import get_spark
    import bench

    spark = get_spark(
        "webxtract-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4051",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    ui_base = spark.sparkContext.uiWebUrl

    def _exec_totals():
        try:
            url = f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
            data = json.load(urllib.request.urlopen(url, timeout=10))
            cpu = sum(s["executorCpuTime"] for s in data) / 1e9
            gc = sum(s["jvmGcTime"] for s in data) / 1e3
            run = sum(s["executorRunTime"] for s in data) / 1e3
            return cpu, gc, run
        except Exception:
            return (0.0, 0.0, 0.0)

    layout = bench._layout_dir(sf_dir)
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = getattr(contract, f"q_{name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, layout)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        if args.n <= 0:  # explain-only mode
            continue
        walls, cpus_, gcs, runs = [], [], [], []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            c0, g0, r0 = _exec_totals()
            t0 = time.perf_counter()
            _force(fn(spark, layout))
            walls.append(round(time.perf_counter() - t0, 3))
            c1, g1, r1 = _exec_totals()
            cpus_.append(round(max(0.0, c1 - c0), 2))
            gcs.append(round(max(0.0, g1 - g0), 2))
            runs.append(round(max(0.0, r1 - r0), 2))
        print(
            json.dumps(
                {
                    "query": name,
                    "min": min(walls),
                    "walls": walls,
                    "cpu_core_s": cpus_,
                    "gc_s": gcs,
                    "run_core_s": runs,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
