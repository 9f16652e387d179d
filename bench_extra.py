"""Per-query isolation bench + plan capture (guide §1.4/§1.5).

NOT the driver's bench — ``bench.py`` is frozen for measurement.  This
harness exists for the optimization loop:

* time any subset of ``queries()`` with the noop sink, min-of-N,
  labelled jobs (``setJobDescription``), one JSON line per query;
* dump ``explain("formatted")`` for each query to ``plans/r06/``
  (``--plans [suffix]``), which is the before/after evidence the round
  report cites.

Usage::

    python bench_extra.py q1 q2 ...        # time queries (min-of-3)
    python bench_extra.py --plans before q1 q2 ...
    python bench_extra.py --runs 5 q1
    python bench_extra.py --crawl          # crawl_bench only (same as bench.py's)

Environment: same contract as bench.py (`SPARK_GRAFT_SF_DIR`,
`SPARK_GRAFT_CPUS`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench set)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--plans",
        metavar="SUFFIX",
        help="dump explain('formatted') to plans/r06/<q>_<SUFFIX>.txt",
    )
    ap.add_argument("--crawl", action="store_true", help="run the crawl bench only")
    args = ap.parse_args()

    import bench as benchmod
    import __spark_entry__ as entrymod

    spark = benchmod.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if args.crawl:
        import pyarrow.dataset as pads

        n_docs = pads.dataset(os.path.join(SF_DIR, "documents.parquet")).count_rows()
        crawl = benchmod.crawl_bench(
            spark, n_pages=max(2000, n_docs * 4), waves=benchmod.CRAWL_WAVES
        )
        print(json.dumps({"crawl_loop": crawl}))
        spark.stop()
        return

    queries = entrymod.queries()
    names = args.names or [
        "crawl_extract_links", "selector_caption_xpath", "doc_exact_dedup",
        "doc_minhash_pairs", "doc_simhash_pairs", "emb_near_dup_lsh",
        "img_phash_near_dup", "doc_token_stats", "doc_lang_id",
        "emb_knn_bruteforce", "emb_knn_lsh", "emb_knn_ivf", "doc_ngram_dedup",
        "doc_decontaminate", "doc_main_text", "doc_quality_filter",
        "crawl_host_pagerank", "emb_semantic_dedup", "img_training_batches",
        "doc_corpus_build", "q_pricing_summary", "q_revenue_by_nation",
        "q_top_orders_per_customer",
    ]
    if any(n.startswith("emb_knn") or n == "emb_semantic_dedup" for n in names):
        entrymod._ivf_index_for(spark, SF_DIR)

    out: dict[str, object] = {}
    for name in names:
        fn = queries[name]
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = f"plans/r06/{name}_{args.plans}.txt"
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}", file=sys.stderr)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            start = time.perf_counter()
            benchmod.run_noop(fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - start, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"runs": runs, "min": min(runs)}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
