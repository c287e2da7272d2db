#!/usr/bin/env python
"""Stage-level profiles for the two round-10 scaling watch items
(VERDICT r10 item 4): q_graph_kcore2 (5.28x raw on 10x data) and
q_text_rake_keywords (5.75x raw).  For each stage the harness times the
stage's own action cold (cache cleared between stages) and prints the
stage's OUTPUT ROW COUNT next to the time — the row counts are the
input-shape facts that explain (or indict) a ratio.

Replicates each operator's stage boundaries by calling the SAME
internal helpers the operator uses (no second implementation —
`_pr_edges`/`kcore_peel` for kcore2; the RAKE stages are re-declared
with the operator's own constants and the module tokenizer).

Usage:  python scripts/profile_stages.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 and /root/testdata/sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.session import build_session


def timed(label, df, results):
    start = time.monotonic()
    n = df.count()
    dt = time.monotonic() - start
    results.append((label, round(dt, 3), n))
    return n


def profile_kcore2(spark, sf_dir, results):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.graph import (
        KCORE_K,
        _pr_edges,
    )

    start = time.monotonic()
    arcs = _pr_edges(spark, sf_dir)  # eager checkpoint inside
    results.append(("edge_build(checkpoint)", round(time.monotonic() - start, 3), arcs.count()))
    cur = arcs
    for rnd in (1, 2):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("src")
        )
        timed(f"round{rnd}_keep_census", keep, results)
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        timed(f"round{rnd}_surviving_arcs", nxt, results)
        cur = nxt
    final = cur.groupBy("src").agg(F.count(F.lit(1)).alias("residual_degree"))
    timed("final_degree_agg", final, results)


def profile_rake(spark, sf_dir, results):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.text import (
        RAKE_STOP_K,
        _docs,
        tokens_col,
    )

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("p0", "w0")
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("bigint").alias("p"),
        F.lower(F.col("w0")).alias("w"),
    ).persist()
    timed("token_explode", toks, results)
    cw = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    timed("vocab_census", cw, results)
    stop = cw.orderBy(F.desc("c"), F.asc("w")).limit(RAKE_STOP_K)
    timed("stop_topk", stop, results)
    marked = (
        toks.join(F.broadcast(stop.select("w", F.lit(1).alias("is_stop"))), "w", "left")
        .select(
            "doc_id",
            "p",
            "w",
            F.coalesce("is_stop", F.lit(0)).alias("is_stop"),
        )
        .withColumn(
            "pid",
            F.sum("is_stop").over(
                Window.partitionBy("doc_id").orderBy("p")
            ),
        )
    )
    content = marked.filter(F.col("is_stop") == 0).persist()
    timed("running_sum_segments", content, results)
    phr = content.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    timed("phrase_agg", phr, results)
    occ = content.join(phr, ["doc_id", "pid"])
    ws = occ.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("f"))
    timed("word_scores", ws, results)
    toks.unpersist()
    content.unpersist()


def profile_contamination(spark, sf_dir, results):
    """Stage profile for the round-12 contamination kernel: the eval
    gram census, the Bloom build, the Bloom-gated candidate stream (the
    stage whose row count proves the corpus never joins itself), and
    the exact verify + per-doc rollup."""
    from apache_beam_java_firestore_batch_dataflow_spark.functions.bloom import (
        bloom_build,
        bloom_member,
    )
    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        CONTAM_BLOOM_BITS,
        CONTAM_BLOOM_K,
        CONTAM_K,
        split_col,
    )
    from apache_beam_java_firestore_batch_dataflow_spark.operators.text import tokens_col
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(
        "doc_id",
        split_col(F.col("doc_id")).alias("split"),
        tokens_col(F.col("text")).alias("t"),
    )
    gram_arr = F.when(
        F.size("t") >= CONTAM_K,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (CONTAM_K - 1)),
            lambda i: F.concat_ws(" ", F.slice("t", i, CONTAM_K)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = tokd.select(
        "doc_id", "split", F.explode(F.array_distinct(gram_arr)).alias("g")
    )
    timed("corpus_gram_stream", grams.filter(F.col("split") != "test"), results)
    eval_g = grams.filter(F.col("split") == "test").select("g").distinct()
    timed("eval_gram_census", eval_g, results)
    start = time.monotonic()
    words = bloom_build(eval_g, F.col("g"), CONTAM_BLOOM_BITS, CONTAM_BLOOM_K)
    results.append(
        ("bloom_build(collect)", round(time.monotonic() - start, 3),
         sum(1 for w in words if w))
    )
    cand = grams.filter(F.col("split") != "test").filter(
        bloom_member(F.col("g"), words, CONTAM_BLOOM_BITS, CONTAM_BLOOM_K)
    )
    timed("bloom_survivors", cand, results)
    hits = (
        cand.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    timed("verify_and_rollup", hits, results)


def profile_exact_substring(spark, sf_dir, results):
    """Stage profile for the round-13 exact-substring dedup: posting
    build (token-linear, in-row hashing), the fingerprint equi-join
    (whose OUTPUT row count — matched postings — is the claim that
    span verification is O(matched postings), not O(corpus²)), and the
    verified pair/span report.  Stages re-declared with the operator's
    own constants and helpers (dedup.SPAN_K / h56 / tokens_col)."""
    from apache_beam_java_firestore_batch_dataflow_spark.functions.hashing import h56
    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        SPAN_K,
        q_dedup_exact_substring,
    )
    from apache_beam_java_firestore_batch_dataflow_spark.operators.text import tokens_col
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select("doc_id", tokens_col(F.col("text")).alias("t")).filter(
        F.size("t") >= SPAN_K
    )
    posting_arr = F.transform(
        F.sequence(F.lit(1), F.size("t") - (SPAN_K - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            h56(F.concat_ws(" ", F.slice("t", i, SPAN_K))).alias("gh"),
        ),
    )
    postings = tokd.select("doc_id", F.explode(posting_arr).alias("u")).select(
        "doc_id", F.col("u.pos").alias("pos"), F.col("u.gh").alias("gh")
    )
    timed("posting_build", postings, results)
    a = postings.alias("a")
    b = postings.alias("b")
    cand = a.join(
        b,
        (F.col("a.gh") == F.col("b.gh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    timed("matched_postings(fp_join)", cand, results)
    timed("verified_pairs(end_to_end)", q_dedup_exact_substring(spark, sf_dir), results)


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = build_session(app_name="profile-stages", master="local[32]")
    report = {}
    for which, fn in (("kcore2", profile_kcore2), ("rake", profile_rake), ("contamination", profile_contamination), ("exact_substring", profile_exact_substring)):
        for d in dirs:
            results = []
            fn(spark, d, results)
            spark.catalog.clearCache()
            report[(which, d)] = results
    for (which, d), results in report.items():
        print(f"\n== {which} @ {d}")
        for label, dt, n in results:
            print(f"  {label:28s} {dt:8.3f}s  rows={n}")
    # cross-sf ratios per stage
    for which in ("kcore2", "rake", "contamination", "exact_substring"):
        if len(dirs) == 2:
            small = dict((l, (t, n)) for l, t, n in report[(which, dirs[0])])
            large = dict((l, (t, n)) for l, t, n in report[(which, dirs[1])])
            print(f"\n== {which} stage ratios ({dirs[1]} / {dirs[0]})")
            for label in small:
                ts, ns = small[label]
                tl_, nl = large[label]
                print(
                    f"  {label:28s} time x{tl_ / max(ts, 1e-3):6.2f}  "
                    f"rows x{nl / max(ns, 1):6.2f}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
