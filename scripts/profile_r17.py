#!/usr/bin/env python
"""Round-16 optimization measurement harness (guide §1).

For each named query: builds the DataFrame (construction timed
separately — the eager-build boundary bench.py documents), runs the
noop-sink action N times (cold plan per rep, same as bench.py's
methodology), prints min/median, and optionally dumps
``.explain("formatted")`` to plans/r17/<query>_<tag>.txt.

Usage:
    python scripts/profile_r17.py [--sf SF_DIR] [--reps N] [--plans TAG] q1 q2 ...
    python scripts/profile_r17.py --top 20          # slowest r16-bench legs
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain(formatted) to plans/r17/<q>_<TAG>.txt")
    ap.add_argument("--top", type=int, default=0, help="profile the N slowest legs of BENCH_LOCAL_r16.json")
    args = ap.parse_args()

    from apache_beam_java_firestore_batch_dataflow_spark.session import build_session
    import __spark_entry__ as entrymod

    names = list(args.queries)
    if args.top:
        ref = json.load(open(os.path.join(REPO, "BENCH_LOCAL_r16.json")))
        names += [k for k, _ in sorted(ref["queries"].items(), key=lambda kv: -kv[1])[: args.top]]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="profile_r17", master=f"local[{cpus}]")
    registry = entrymod.queries()

    # Same JVM/codegen + Python-pool warmup bench.py uses, so first-query
    # numbers are comparable to the bench's.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    small = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.01")
    warm_dir = small if os.path.isdir(small) else args.sf
    li = spark.read.parquet(os.path.join(warm_dir, "lineitem.parquet"))
    orr = spark.read.parquet(os.path.join(warm_dir, "orders.parquet"))
    (
        li.join(orr, li.l_orderkey == orr.o_orderkey)
        .groupBy("l_returnflag")
        .agg(_F.sum("l_quantity").alias("s"), _F.count(_F.lit(1)).alias("n"))
        .withColumn("r", _F.row_number().over(_W.orderBy("l_returnflag")))
        .write.format("noop").mode("overwrite").save()
    )
    import bench as benchmod

    benchmod.python_worker_probe(spark)
    spark.catalog.clearCache()

    plan_dir = os.path.join(REPO, "plans", "r17")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = registry[name]
        samples, builds = [], []
        for _ in range(args.reps):
            b0 = time.monotonic()
            df = fn(spark, args.sf)
            builds.append(time.monotonic() - b0)
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            samples.append(time.monotonic() - t0)
        if args.plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        med = sorted(samples)[len(samples) // 2]
        results[name] = {
            "build_med": round(sorted(builds)[len(builds) // 2], 3),
            "action_med": round(med, 3),
            "action_min": round(min(samples), 3),
            "reps": [round(s, 3) for s in samples],
        }
        print(
            f"{name:40s} build={results[name]['build_med']:7.3f} "
            f"action_med={med:7.3f} min={min(samples):7.3f} reps={results[name]['reps']}",
            flush=True,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
