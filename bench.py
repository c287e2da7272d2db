#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a ``noop``-format write — full
computation on the executors, zero driver-side collect — which is how a
cluster job would be measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Representative slice of the registry: TPC-H-style relational core,
# windows, text analysis, dedup (exact + all three near-dup families),
# and similarity search (exact + ANN).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_window_topk_per_group",
    "q_wordcount_documents",
    "q_text_token_stats",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_knn_bruteforce",
    "q_ann_lsh",
]


def main() -> None:
    from apache_beam_java_firestore_batch_dataflow_spark.session import build_session
    import __spark_entry__ as entrymod

    spark = build_session(app_name="bench", master=f"local[{CPUS}]")
    registry = entrymod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        df = fn(spark, SF_DIR)
        start = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - start, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
