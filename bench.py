"""Headline benchmark: index build + BM25 top-k query latency.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_build_sec": ..., "docs_per_sec": ..., "p95_query_sec": ...}

Query set mirrors the reference's benchmark harness shape
(EnwikiQueryMaker.java:45-71: bare terms, multi-term OR/AND, quoted
phrases; ReadTask.java:228 default k=10).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# reference-shaped query set (terms / OR / AND / phrase / nested bool)
QUERY_SET = [
    ("q_term", "merge"),
    ("q_term2", "spark"),
    ("q_or2", "spark merge"),
    ("q_or3", "spark merge fast"),
    ("q_and2", "spark AND table"),
    ("q_and3", "sort AND hash AND join"),
    ("q_phrase", '"key agg"'),
    ("q_sloppy", '"key agg"~2'),
    ("q_nested", "(spark OR merge) AND fast"),
    ("q_deep", "(spark AND table) OR (merge AND fast)"),  # tree-plan path
    ("q_not", "spark NOT dup"),
    ("q_wide_or", "batch part line column order small sort"),
]


def _control_job(spark) -> float:
    """Fixed pure-JVM control: a parquet scan-agg (xxhash64 fold over
    lineitem) with NO Python, NO engine code, and constant work per sf.
    Timed in the same process as the queries, it makes every BENCH_rN
    self-normalizing against hypervisor steal (VERDICT r3 #2): a future
    reader divides query times by the control to separate host noise
    from plan regressions."""
    t0 = time.perf_counter()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (li.select(F.xxhash64(*li.columns).alias("h"))
     .agg(F.expr("bit_xor(h)")).collect())
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    control_runs = [_control_job(spark)]   # sample 1: before the build

    t_all = time.perf_counter()

    # --- index build (cache() materializes postings + terms) ---
    t0 = time.perf_counter()
    # grid sized so bucket-parallelism ~= 4-20x cores at this corpus size
    # (production default 1<<17 assumes ~10^9+ docs per index generation)
    grid = max(128, n_docs // (CPUS * 4))
    builder = IndexBuilder(ENGLISH_ANALYZER, grid=grid, head_df=512,
                           salt_target=512, with_positions=True)
    # serving partitions = 1x cores: one task wave per query job. The
    # round-2 guidance (2x cores) measured ~0.50 s/query on this host;
    # a straggler in wave 2 adds a full scheduling round-trip, and 1x
    # measures ~0.31 s (r5 profiling). At cluster scale this knob is
    # executor-count-x-cores, same reasoning.
    idx = builder.build(spark, docs).cache(serving_partitions=CPUS)
    idx.norms.count()
    build_sec = time.perf_counter() - t0

    searcher = Searcher(spark, idx, k1=1.2, b=0.75)

    # --- query latency (top-10, block-max pruned, float32 path) ---
    # min of 3 runs per query (VERDICT r3 #2): the sandbox host shows
    # hypervisor steal, and min is the standard noise-robust estimator.
    # CO-TIMED control (VERDICT r4 #2): each query iteration is
    # immediately followed by one control iteration, so the per-query
    # ratio compares temporally-paired numbers — a steal burst mid-run
    # inflates both sides of the SAME pair instead of poisoning the
    # whole draw (r4 of record: query mins taken early under steal
    # divided by a control min taken late in a calm window -> 3.82,
    # while four calm draws measured 1.02-1.42). Reference protocol
    # model: benchmark/byTask/ReportTask.java:66 reports per-task
    # rates, not wall totals.
    per_query: dict[str, float] = {}
    sec_over_control: dict[str, float] = {}
    for name, qstr in QUERY_SET:
        q = parse_query(qstr, ENGLISH_ANALYZER)
        best = float("inf")
        ratios = []
        for _ in range(3):
            t0 = time.perf_counter()
            searcher.top_k(q, k=10, mode="f32", prune=True)
            q_sec = time.perf_counter() - t0
            c_sec = _control_job(spark)          # paired, adjacent
            best = min(best, q_sec)
            ratios.append(q_sec / c_sec)
        per_query[name] = round(best, 4)
        # median of the 3 paired ratios: robust to a burst that clips
        # only one side of a single pair (min would underestimate)
        sec_over_control[name] = round(sorted(ratios)[1], 2)

    control_runs.append(_control_job(spark))   # sample 2: mid-run

    # batch mode: the whole query set in ONE job (query-log throughput)
    qs = [parse_query(q, ENGLISH_ANALYZER) for _, q in QUERY_SET]
    batch_ratios = []
    batch_best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        searcher.top_k_many(qs, k=10, mode="f32", prune=True)
        b_sec = time.perf_counter() - t0
        batch_ratios.append(b_sec / _control_job(spark))
        batch_best = min(batch_best, b_sec)
    per_query["batch_all"] = round(batch_best, 4)
    sec_over_control["batch_all"] = round(min(batch_ratios), 2)

    lat = sorted(v for k, v in per_query.items() if k != "batch_all")
    p95 = lat[min(len(lat) - 1, int(0.95 * len(lat)))]
    rat = sorted(v for k, v in sec_over_control.items() if k != "batch_all")
    p95_ratio = rat[min(len(rat) - 1, int(0.95 * len(rat)))]

    # training-pipeline operators (dedup / ANN) on the same sf tables
    from lucene_solr_spark.pipeline import dedup as dd
    from lucene_solr_spark.pipeline import similarity as sim
    t0 = time.perf_counter()
    n_pairs = dd.minhash_dedup(docs, threshold=0.8).count()
    per_query["op_dedup_minhash"] = round(time.perf_counter() - t0, 4)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    t0 = time.perf_counter()
    sim.cosine_topk(emb, qv, 10).collect()
    per_query["op_ann_cosine"] = round(time.perf_counter() - t0, 4)
    # persisted IVF: build once (amortized), time the pruned probe
    import tempfile
    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    sim.build_ivf_index(spark, emb, ivf_dir, n_cells=8, iters=1)
    t0 = time.perf_counter()
    sim.ivf_topk_persisted(spark, ivf_dir, qv, n_probe=2, k=10).collect()
    per_query["op_ann_ivf_probe"] = round(time.perf_counter() - t0, 4)

    # the headline total keeps the SAME composition as BENCH_r02/r03
    # (build + query set + dedup/ANN ops) so "value" stays comparable
    # across rounds; the round-4 hygiene ops below are timed separately
    total = time.perf_counter() - t_all

    # SQ8 two-stage ANN (round 5): codebook trained once (amortized,
    # like the IVF build), timed as the quantized scan + exact re-rank.
    # Kept OUT of the headline total for r2/r3 "value" comparability.
    sq8_cb = sim.sq8_train(emb)
    t0 = time.perf_counter()
    sim.sq8_topk(emb, qv, k=10, candidates=100, codebook=sq8_cb).collect()
    per_query["op_ann_sq8"] = round(time.perf_counter() - t0, 4)

    # PQ two-stage ANN (round 5): codebook is the deterministic seed
    # rule (amortized like IVF/SQ8 training); timed as encode + ADC
    # candidate scan + exact re-rank. Out of the headline total.
    pq_cb = sim.pq_train(emb, n_centroids=16)
    t0 = time.perf_counter()
    sim.pq_topk(emb, qv, k=10, m=16, candidates=100,
                codebook=pq_cb).collect()
    per_query["op_ann_pq"] = round(time.perf_counter() - t0, 4)

    # DSIR data selection (round 5): train + score + Gumbel-top-k over
    # the full corpus; timed separately like the other pipeline ops
    from lucene_solr_spark.pipeline import dsir as ds
    t0 = time.perf_counter()
    ds.dsir_select(ds.dsir_weights(docs, F.col("lang") == "en",
                                   buckets=64), n=50).collect()
    per_query["op_dsir_select"] = round(time.perf_counter() - t0, 4)

    # hybrid RRF (round 5): BM25 top-50 + cosine top-50 fused; the
    # retrievers dominate, the fuse itself is candidate-list-sized
    from lucene_solr_spark.search.ast import TermQuery as _TQ
    from lucene_solr_spark.search.hybrid import rrf_fuse
    t0 = time.perf_counter()
    bm_l = (searcher.score_all(_TQ("key"), mode="f32")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(50)
            .select("doc_id", "score"))
    ann_l = (sim.cosine_topk(emb, qv, 50)
             .select(F.col("vec_id").alias("doc_id"), "cos"))
    rrf_fuse([bm_l, ann_l], k=60) \
        .orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10).collect()
    per_query["op_hybrid_rrf"] = round(time.perf_counter() - t0, 4)

    # round-5 session-2 pipeline ops: URL dedup (one codegen projection
    # + one agg) and the BPE corpus pass (word freqs + pair counts)
    from lucene_solr_spark.pipeline.bpe import pair_counts, word_freqs
    from lucene_solr_spark.pipeline.urldedup import url_dedup
    import __spark_entry__ as _e
    t0 = time.perf_counter()
    url_dedup(docs.withColumn("url", F.expr(_e._URL_SYNTH_SQL)),
              "url", "doc_id", "n_chars").count()
    per_query["op_url_dedup"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    pair_counts(word_freqs(docs)).orderBy(F.desc("count")).limit(20).count()
    per_query["op_bpe_pair_counts"] = round(time.perf_counter() - t0, 4)

    # round-5 session-4: the web-ingest front stage — HTML strip +
    # tokenize + term count as ONE codegen pass (the strip chain fuses
    # with the scan; this is the throughput every 100-TB ingest pays
    # before inversion)
    from lucene_solr_spark.analysis.charfilters import html_strip_expr
    t0 = time.perf_counter()
    (docs.select(html_strip_expr(F.expr(_e._HTML_SYNTH_SQL)).alias("s"))
     .select(F.explode(F.expr(
         "regexp_extract_all(s, '[a-z0-9&]+', 0)")).alias("t"))
     .groupBy("t").count().orderBy(F.desc("count")).limit(20).count())
    per_query["op_html_strip"] = round(time.perf_counter() - t0, 4)

    # corpus hygiene (round 4): exact-substring dup + decontamination —
    # corpus-scale scans (every 13-token window / every 8-gram), an
    # order of magnitude more work than one top-k query; reported as
    # their own component, NOT folded into the cross-round headline
    t0 = time.perf_counter()
    dd.substring_dup_stats(docs, width=13, hashed=True) \
        .filter("dup_windows > 0").count()
    per_query["op_substring_dup"] = round(time.perf_counter() - t0, 4)
    from lucene_solr_spark.pipeline import scrub as sc
    t0 = time.perf_counter()
    bench_grams = sc.benchmark_grams(docs.filter("doc_id % 97 = 0"), n=8,
                                     hashed=True)
    sc.decontaminate(docs, bench_grams, n=8,
                     hashed=True).filter("contaminated").count()
    per_query["op_decontaminate"] = round(time.perf_counter() - t0, 4)
    hygiene = per_query["op_substring_dup"] + per_query["op_decontaminate"]

    control_runs.append(_control_job(spark))   # sample 3: after the ops
    control = min(control_runs)

    print(json.dumps({
        "metric": "index_build_plus_topk_bm25",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "n_docs": n_docs,
        "index_build_sec": round(build_sec, 3),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "p95_query_sec": round(p95, 4),
        # round-4 corpus-hygiene ops (full-corpus window/gram scans),
        # timed but kept OUT of "value" for r2/r3 comparability
        "hygiene_ops_sec": round(hygiene, 3),
        # host-noise control: fixed JVM-only parquet scan-agg. Each
        # query's ratio pairs it with an ADJACENT control run (r4 #2);
        # p95_over_control is the p95 of those per-query paired ratios.
        # Compare ratios ACROSS rounds — steal inflates both sides of a
        # pair, a plan regression inflates only the numerator.
        "control_scan_sec": round(control, 4),
        "control_runs_sec": [round(c, 4) for c in control_runs],
        "sec_over_control": sec_over_control,
        "p95_over_control": round(p95_ratio, 2),
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
