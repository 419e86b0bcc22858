"""spark-submit entry point: build (or resume) an index generation and run
a query batch, reporting per-stage metrics as JSON lines.

Cluster usage (the north-rule deployment shape):

    python scripts/package.py                      # -> dist/lucene_solr_spark.zip
    spark-submit --py-files dist/lucene_solr_spark.zip \
        scripts/submit_job.py \
        --input  s3://bucket/pages/ \
        --index  s3://bucket/index/gen1/ \
        --queries "merge" "spark AND table"

Sandbox smoke (local mode — same code path):

    spark-submit --master 'local[8]' --py-files dist/lucene_solr_spark.zip \
        scripts/submit_job.py --input /tmp/spark_graft_scale/pages_100000.parquet \
        --index /tmp/spark_graft_idx
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", nargs="*", default=None,
                    help="default: derived from the index's top-df terms")
    ap.add_argument("--grid", type=int, default=1 << 17)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    # imports AFTER spark-submit has set up --py-files on sys.path
    from pyspark.sql import SparkSession

    from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.index import catalog
    from lucene_solr_spark.search import Searcher, parse_query

    spark = SparkSession.builder.appName("lucene-solr-spark-job").getOrCreate()
    docs = spark.read.parquet(args.input).select("doc_id", "text")
    builder = IndexBuilder(ENGLISH_ANALYZER, grid=args.grid,
                           with_positions=True)
    idx, manifest = catalog.build_or_resume(spark, docs, builder, args.index)
    print(json.dumps({"stage": "index", "manifest_key": manifest["key"],
                      "generation": manifest["generation"],
                      "timings": manifest.get("timings", {}),
                      "stats": idx.stats}))

    queries = args.queries
    if not queries:
        from pyspark.sql import functions as F
        t = [r["term"] for r in idx.terms.orderBy(
            F.desc("df"), F.asc("term")).limit(6).collect()]
        queries = [t[0], f"{t[1]} {t[2]} {t[3]}", f"{t[2]} AND {t[3]}",
                   f"({t[4]} OR {t[5]}) AND {t[1]}"]

    searcher = Searcher(spark, idx)
    for qs in queries:
        t0 = time.perf_counter()
        top = searcher.top_k(parse_query(qs, ENGLISH_ANALYZER), k=args.k)
        print(json.dumps({
            "stage": "query", "q": qs,
            "sec": round(time.perf_counter() - t0, 4),
            "top": [[int(r.doc_id), float(r.score)]
                    for r in top.itertuples(index=False)]}))
    spark.stop()


if __name__ == "__main__":
    main()
