"""Distributed query execution: IndexSearcher → grid-sharded scoring kernel.

Plan shape (the Spark restatement of `IndexSearcher.search`,
`search/IndexSearcher.java:513,654-700`):

  driver   rewrite(query) → collect term stats (tiny broadcast) → weights
  scan     postings.filter(term ∈ query) — Catalyst pushes the predicate
           into the Parquet scan; the (bucket, term) sort order makes this
           the FST/BlockTree seek analog (row-group pruning). The index
           layout is doc-sharded (bucket-major, whole grid cells per
           partition — Solr's shard model, QueryComponent.java:810), so
           the query plan is SHUFFLE-FREE: filter is narrow and every
           bucket's blocks are already contiguous.
  kernel   per partition, buckets in sequence: decode → vectorized
           TAAT scatter-add with block-max pruning (the WANDScorer /
           BlockMaxConjunctionScorer / BooleanScorer roles in one numpy
           kernel) → per-bucket top-k with a partition-carried threshold
  reduce   driver merges tiny per-bucket top-k frames with the reference
           tie-break: score desc, doc_id asc (HitQueue.java:76-81,
           TopDocs.merge TopDocs.java:34,70)

Because blocks never span grid cells (builder invariant), bucket sharding
is exact: every (term, doc) pair lands in exactly one bucket, so AND / OR
/ NOT / minShouldMatch semantics are local to the kernel.

Scoring modes:
  f32 — Lucene-exact float32 (BM25Similarity.java:222-235 order of ops)
  f64 — double precision on decoded lengths, for DuckDB-oracle parity
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bm25
from ..functions.smallfloat import LENGTH_TABLE
from ..index.builder import (InvertedIndex, decode_positions_blob,
                             decode_postings_block)
from .ast import (BooleanQuery, MatchAllQuery, MatchNoQuery, Occur,
                  PhraseQuery, TermQuery, collect_terms, rewrite)

KERNEL_SCHEMA = "doc_id long, score double"


class Searcher:
    def __init__(self, spark: SparkSession, index: InvertedIndex,
                 k1: float = 1.2, b: float = 0.75):
        self.spark = spark
        self.index = index
        self.k1, self.b = k1, b
        self.stats = index.stats
        # driver-side term-stats cache: the index is immutable, queries
        # repeat terms, and each miss costs a (tiny but job-scheduling-
        # bound) filtered collect — the TermStates caching analog
        self._term_stats_cache: dict[str, tuple[int, int]] = {}

    # -- driver-side stats (collectionStatistics/termStatistics analog) ----
    def term_stats(self, terms: list[str]) -> dict:
        if not terms:
            return {}
        cache = self._term_stats_cache
        missing = [t for t in terms if t not in cache]
        if missing:
            rows = (self.index.terms
                    .filter(F.col("term").isin(missing))
                    .select("term", "df", "ttf").collect())
            found = {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
            for t in missing:
                cache[t] = found.get(t, (0, 0))
        return {t: cache[t] for t in terms if cache[t][0] > 0}

    def _plan(self, query):
        """Normalize the AST into flat kernel spec lists."""
        query = rewrite(query)
        if isinstance(query, MatchNoQuery):
            return None
        if isinstance(query, MatchAllQuery):
            return "ALL"
        must, should, must_not, phrases = [], [], [], []
        msm = 0
        if isinstance(query, TermQuery):
            should = [query.term]
        elif isinstance(query, PhraseQuery):
            phrases = [(Occur.SHOULD, query.terms)]
        elif isinstance(query, BooleanQuery):
            msm = query.min_should_match
            for c in query.clauses:
                q = c.query
                if isinstance(q, TermQuery):
                    if c.occur in (Occur.MUST, Occur.FILTER):
                        must.append([q.term])
                    elif c.occur == Occur.SHOULD:
                        should.append(q.term)
                    else:
                        must_not.append(q.term)
                elif isinstance(q, PhraseQuery):
                    phrases.append((c.occur, q.terms))
                elif isinstance(q, BooleanQuery):
                    # one nesting level: MUST(pure-SHOULD) → ≥1-of group
                    # (Lucene keeps the tree; our kernel flattens to groups)
                    inner = q.grouped()
                    pure_should = (not inner[Occur.MUST] and not inner[Occur.MUST_NOT]
                                   and not inner[Occur.FILTER]
                                   and q.min_should_match <= 1
                                   and all(isinstance(x, TermQuery)
                                           for x in inner[Occur.SHOULD]))
                    if c.occur in (Occur.MUST, Occur.FILTER) and pure_should:
                        must.append([x.term for x in inner[Occur.SHOULD]])
                    elif c.occur == Occur.MUST_NOT and pure_should:
                        must_not.extend(x.term for x in inner[Occur.SHOULD])
                    else:
                        raise ValueError(
                            "v0 kernel supports one nesting level: "
                            "MUST/NOT of a pure-OR group")
        else:
            raise ValueError(f"unsupported query {query!r}")
        return must, should, must_not, phrases, msm

    def _weights(self, terms_needed, scoring_terms, phrases, mode):
        st = self.term_stats(list(terms_needed))
        N, sttf = self.stats["doc_count"], self.stats["sum_ttf"]
        avgdl32 = bm25.avg_field_length(sttf, N)
        cache32 = bm25.norm_inverse_cache(avgdl32, self.k1, self.b)
        spec = {}
        for i, t in enumerate(scoring_terms):
            df, _ = st.get(t, (0, 0))
            if df == 0:
                continue
            w32 = float(np.float32(bm25.idf(df, N)))
            spec[t] = {"idx": i, "df": df, "w32": w32}
        phrase_spec = []
        for occ, pterms in phrases:
            dfs = [st.get(t, (0, 0))[0] for t in pterms]
            if any(d == 0 for d in dfs):
                phrase_spec.append({"occur": occ.value, "terms": list(pterms),
                                    "w32": 0.0, "dead": True})
                continue
            w32 = float(np.float32(sum(np.float32(bm25.idf(d, N)) for d in dfs)))
            phrase_spec.append({"occur": occ.value, "terms": list(pterms),
                                "w32": w32, "dead": False})
        return {
            "terms": spec, "phrases": phrase_spec,
            "cache32": cache32, "N": N,
            "avgdl64": sttf / float(N),
            "idf64": {t: math.log(1.0 + (N - st[t][0] + 0.5) / (st[t][0] + 0.5))
                      for t in st},
            "dfs": {t: st.get(t, (0, 0))[0] for t in terms_needed},
            "k1": self.k1, "b": self.b, "mode": mode,
        }

    # ------------------------------------------------------------------
    def _run_kernel(self, must, should, must_not, phrases, msm,
                    mode="f32", collect_all=False, k=10,
                    prune=True) -> DataFrame:
        """must: list of term-groups (each group = ≥1 term must match);
        should/must_not: flat term lists."""
        plan = (must, should, must_not, phrases, msm)
        spec, live, dead = self._spec_for_plan(
            plan, mode, k, prune, collect_all=collect_all)
        if dead:
            return self.spark.createDataFrame([], KERNEL_SCHEMA)
        blocks = self.index.postings.filter(F.col("term").isin(live))
        if not self.index.with_positions:
            blocks = blocks.drop("pos_blob")

        def kernel(batches):
            yield from _bucket_kernel(batches, spec)

        # No shuffle: the index layout is bucket-major (whole grid cells per
        # partition, sorted by bucket/term/block), so the narrow filter keeps
        # every bucket's blocks contiguous within its partition.
        return blocks.mapInPandas(kernel, schema=KERNEL_SCHEMA)

    def _spec_for_plan(self, plan, mode, k, prune, collect_all=False):
        must, should, must_not, phrases, msm = plan
        must_flat = [t for g in must for t in g]
        terms_needed = list(dict.fromkeys(
            must_flat + should + must_not + [t for _, p in phrases for t in p]))
        scoring_terms = list(dict.fromkeys(must_flat + should))
        w = self._weights(terms_needed, scoring_terms, phrases, mode)
        dead = (all(w["dfs"].get(t, 0) == 0 for t in must_flat + should)
                and not any(not p["dead"] for p in w["phrases"]))
        dead = dead or any(all(w["dfs"].get(t, 0) == 0 for t in g)
                           for g in must)
        dead = dead or any(
            p["dead"] and p["occur"] not in ("MUST_NOT", "SHOULD")
            for p in w["phrases"])
        spec = dict(
            must=[list(g) for g in must], should=list(should),
            must_not=list(must_not), msm=msm,
            phrases=w["phrases"], terms=w["terms"],
            scoring_order=scoring_terms,
            cache32=w["cache32"], idf64=w["idf64"], avgdl64=w["avgdl64"],
            k1=self.k1, b=self.b, grid=self.stats["grid"], mode=mode, k=k,
            collect_all=collect_all, prune=prune and not collect_all,
            with_positions=self.index.with_positions,
        )
        live = [t for t in terms_needed if w["dfs"].get(t, 0) > 0]
        return spec, live, dead

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def top_k_many(self, queries: list, k: int = 10, mode: str = "f32",
                   prune: bool = True) -> list:
        """Batch top-k: ALL queries in ONE Spark job — one term-filtered
        scan over the union of query terms, one pass over each bucket
        scoring every query from the same Arrow batches, per-query heaps
        and thresholds. → list of pandas DataFrames (rank, doc_id,
        score), parallel to `queries`. The throughput mode for query
        logs (the benchmark harness shape, ReadTask.java:54)."""
        empty = pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        results: dict[int, pd.DataFrame] = {}
        specs, live_union, qids = [], [], []
        for qi, query in enumerate(queries):
            plan = self._plan(query)
            if plan is None:
                results[qi] = empty
                continue
            if plan == "ALL":
                results[qi] = self.top_k(query, k=k, mode=mode, prune=prune)
                continue
            spec, live, dead = self._spec_for_plan(plan, mode, k, prune)
            if dead:
                results[qi] = empty
                continue
            specs.append(spec)
            live_union.extend(live)
            qids.append(qi)
        if specs:
            live_union = list(dict.fromkeys(live_union))
            blocks = self.index.postings.filter(
                F.col("term").isin(live_union))
            if not self.index.with_positions:
                blocks = blocks.drop("pos_blob")

            def kernel(batches):
                yield from _bucket_kernel_multi(batches, specs)

            pdf = blocks.mapInPandas(
                kernel, schema="query_id int, doc_id long, score double"
            ).toPandas()
            for local_qi, qi in enumerate(qids):
                sub = pdf[pdf["query_id"] == local_qi]
                if len(sub) == 0:
                    results[qi] = empty
                    continue
                sub = (sub.sort_values(["score", "doc_id"],
                                       ascending=[False, True],
                                       kind="mergesort")
                       .head(k).reset_index(drop=True))
                sub["rank"] = np.arange(1, len(sub) + 1)
                if mode == "f32":
                    sub["score"] = sub["score"].astype(np.float32)
                results[qi] = sub[["rank", "doc_id", "score"]]
        return [results[qi] for qi in range(len(queries))]

    def top_k(self, query, k: int = 10, mode: str = "f32", prune: bool = True):
        """→ pandas DataFrame (rank, doc_id, score) — TopDocs.merge analog."""
        plan = self._plan(query)
        if plan is None:
            return pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        if plan == "ALL":
            pdf = (self.index.norms.select("doc_id").orderBy("doc_id")
                   .limit(k).toPandas())
            pdf["score"] = np.float32(1.0)
            pdf["rank"] = np.arange(1, len(pdf) + 1)
            return pdf[["rank", "doc_id", "score"]]
        must, should, must_not, phrases, msm = plan
        df = self._run_kernel(must, should, must_not, phrases, msm,
                              mode=mode, collect_all=False, k=k, prune=prune)
        pdf = df.toPandas()
        if len(pdf) == 0:
            return pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)
        pdf["rank"] = np.arange(1, len(pdf) + 1)
        if mode == "f32":
            pdf["score"] = pdf["score"].astype(np.float32)
        return pdf[["rank", "doc_id", "score"]]

    def score_all(self, query, mode: str = "f64") -> DataFrame:
        """All matching docs with scores, as a Spark DataFrame (exhaustive,
        ScoreMode.COMPLETE analog). Used by the DuckDB-oracle queries."""
        plan = self._plan(query)
        if plan is None:
            return self.spark.createDataFrame([], KERNEL_SCHEMA)
        if plan == "ALL":
            # MatchAllDocsQuery: every doc with at least one indexed term,
            # constant score 1 (ConstantScore semantics)
            return self.index.norms.select(
                "doc_id", F.lit(1.0).alias("score"))
        must, should, must_not, phrases, msm = plan
        return self._run_kernel(must, should, must_not, phrases, msm,
                                mode=mode, collect_all=True)

    def match_docs(self, query) -> DataFrame:
        """Just the matching doc_ids (FILTER semantics / ConstantScore)."""
        return self.score_all(query, mode="f64").select("doc_id")

    def count(self, query) -> int:
        """TotalHitCountCollector analog."""
        return self.score_all(query).count()


# ---------------------------------------------------------------------------
# the per-partition kernel
# ---------------------------------------------------------------------------

def _bucket_kernel(batches, spec):
    """Iterate bucket-sorted block rows; score one bucket at a time.

    Carries the pruning threshold across buckets within the partition
    (the per-slice MaxScoreAccumulator analog — thresholds don't cross
    partitions, which only costs pruning efficiency, never correctness).
    """
    buf = None
    threshold = -np.inf
    heap: list = []  # (score, -doc_id) min-heap of partition-local top-k
    k = spec["k"]
    for pdf in batches:
        if len(pdf) == 0:
            continue
        if buf is not None:
            pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
        bucket_vals = pdf["bucket"].to_numpy()
        last_bucket = bucket_vals[-1]
        tail_mask = bucket_vals == last_bucket
        buf = pdf[tail_mask]
        head = pdf[~tail_mask]
        if len(head):
            for _, grp in head.groupby("bucket", sort=True):
                out, threshold = _score_bucket(grp, spec, threshold, heap)
                if out is not None:
                    yield out
    if buf is not None and len(buf):
        out, threshold = _score_bucket(buf, spec, threshold, heap)
        if out is not None:
            yield out


def _bucket_kernel_multi(batches, specs):
    """Multi-query variant of _bucket_kernel: one pass over the bucket-
    sorted rows scores every spec, with independent heaps/thresholds."""
    buf = None
    states = [{"threshold": -np.inf, "heap": []} for _ in specs]

    def run_bucket(grp):
        outs = []
        for qi, spec in enumerate(specs):
            st = states[qi]
            out, st["threshold"] = _score_bucket(
                grp, spec, st["threshold"], st["heap"])
            if out is not None and len(out):
                out = out.copy()
                out.insert(0, "query_id", np.int32(qi))
                outs.append(out)
        return outs

    for pdf in batches:
        if len(pdf) == 0:
            continue
        if buf is not None:
            pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
        bucket_vals = pdf["bucket"].to_numpy()
        tail_mask = bucket_vals == bucket_vals[-1]
        buf = pdf[tail_mask]
        head = pdf[~tail_mask]
        if len(head):
            for _, grp in head.groupby("bucket", sort=True):
                yield from run_bucket(grp)
    if buf is not None and len(buf):
        yield from run_bucket(buf)


def _push_heap(heap, k, scores, docs, threshold):
    for s, d in zip(scores, docs):
        item = (float(s), -int(d))
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    if len(heap) >= k:
        threshold = heap[0][0]
    return threshold


def _score_bucket(grp: pd.DataFrame, spec, threshold, heap):
    grid = spec["grid"]
    bucket = int(grp["bucket"].iloc[0])
    off = bucket * grid
    mode = spec["mode"]
    dtype = np.float32 if mode == "f32" else np.float64
    by_term = {t: g for t, g in grp.groupby("term", sort=False)}

    must_groups = spec["must"]          # list of term lists, ≥1 must match
    n_phrase_must = sum(1 for p in spec["phrases"]
                        if p["occur"] in ("MUST", "FILTER") and not p["dead"])
    total_must = len(must_groups) + n_phrase_must
    msm = spec["msm"]

    # ---- bucket-level upper bound (block-max data) -----------------------
    term_bucket_max = {}
    if spec["prune"]:
        for t, g in by_term.items():
            tw = spec["terms"].get(t)
            if tw is None:
                continue
            m = 0.0
            for fr, no in zip(g["imp_freqs"], g["imp_norms"]):
                m = max(m, float(_max_impact_score(np.asarray(fr), np.asarray(no),
                                                   t, spec)))
            term_bucket_max[t] = m
        ub = sum(term_bucket_max.values()) + sum(
            p["w32"] for p in spec["phrases"]
            if not p["dead"] and p["occur"] != "MUST_NOT")
        # AND: a bucket missing an entire required group is dead
        if any(all(t not in by_term for t in g) for g in must_groups):
            return None, threshold
        if not spec["collect_all"] and ub < threshold:
            return None, threshold
    elif any(all(t not in by_term for t in g) for g in must_groups):
        return None, threshold

    score = np.zeros(grid, dtype=dtype)
    grp_matched = (np.zeros((len(must_groups), grid), dtype=bool)
                   if must_groups else None)
    should_cnt = np.zeros(grid, dtype=np.int16) if (msm > 0 or total_must == 0) else None
    excl = None

    term_groups: dict = {}
    for gi, g in enumerate(must_groups):
        for t in g:
            term_groups.setdefault(t, []).append(gi)
    should_set = set(spec["should"])
    ub_other = {t: (sum(term_bucket_max.values()) - term_bucket_max.get(t, 0.0))
                for t in by_term} if spec["prune"] else {}

    # ---- per-term scatter-add, in query order (float determinism) -------
    for t in spec["scoring_order"]:
        g = by_term.get(t)
        if g is None:
            continue
        tw = spec["terms"].get(t)
        if tw is None:
            continue
        for row in g.itertuples(index=False):
            r = row._asdict()
            if (spec["prune"] and not spec["collect_all"] and total_must == 0
                    and msm <= 1):
                bm = float(_max_impact_score(np.asarray(r["imp_freqs"]),
                                             np.asarray(r["imp_norms"]), t, spec))
                if bm + ub_other.get(t, 0.0) < threshold:
                    continue  # block-max skip: cannot be competitive
            docs, freqs, norms = decode_postings_block(r)
            idxs = docs - off
            s = _score_arrays(freqs, norms, t, spec, dtype)
            score[idxs] += s
            for gi in term_groups.get(t, ()):
                grp_matched[gi, idxs] = True
            if should_cnt is not None and t in should_set:
                should_cnt[idxs] += 1

    # must_not terms never score:
    for t in spec["must_not"]:
        g = by_term.get(t)
        if g is None:
            continue
        if excl is None:
            excl = np.zeros(grid, dtype=bool)
        for row in g.itertuples(index=False):
            docs, _, _ = decode_postings_block(row._asdict())
            excl[docs - off] = True

    # ---- phrases ---------------------------------------------------------
    phrase_must_matched = []
    for p in spec["phrases"]:
        if p["dead"]:
            continue
        pdocs, pfreqs = _phrase_match(p["terms"], by_term, spec)
        if p["occur"] == "MUST_NOT":
            if len(pdocs):
                if excl is None:
                    excl = np.zeros(grid, dtype=bool)
                excl[pdocs - off] = True
            continue
        if len(pdocs):
            idxs = pdocs - off
            norms_arr = _norms_for_docs(p["terms"][0], by_term, pdocs)
            s = _score_phrase(pfreqs, norms_arr, p, spec, dtype)
            score[idxs] += s
            if p["occur"] in ("MUST", "FILTER"):
                m = np.zeros(grid, dtype=bool)
                m[idxs] = True
                phrase_must_matched.append(m)
            if should_cnt is not None and p["occur"] == "SHOULD":
                should_cnt[idxs] += 1
        elif p["occur"] in ("MUST", "FILTER"):
            return None, threshold

    # ---- combine masks ----------------------------------------------------
    if total_must > 0:
        mask = np.ones(grid, dtype=bool)
        if grp_matched is not None and len(must_groups):
            mask &= grp_matched.all(axis=0)
        for m in phrase_must_matched:
            mask &= m
        if msm > 0:
            mask &= should_cnt >= msm
    else:
        mask = should_cnt >= max(1, msm)
    if excl is not None:
        mask &= ~excl
    hit = np.flatnonzero(mask)
    if len(hit) == 0:
        return None, threshold
    docs_out = hit + off
    scores_out = score[hit]
    if spec["collect_all"]:
        return pd.DataFrame({"doc_id": docs_out,
                             "score": scores_out.astype(np.float64)}), threshold
    # per-bucket top-k (score desc, doc asc)
    k = spec["k"]
    if len(hit) > k:
        sel = np.lexsort((docs_out, -scores_out))[:k]
        docs_out, scores_out = docs_out[sel], scores_out[sel]
    threshold = _push_heap(heap, k, scores_out, docs_out, threshold)
    return pd.DataFrame({"doc_id": docs_out,
                         "score": scores_out.astype(np.float64)}), threshold


def _score_arrays(freqs, norms, term, spec, dtype):
    tw = spec["terms"][term]
    if dtype is np.float32:
        w = np.float32(tw["w32"])
        ni = spec["cache32"][norms & 0xFF]
        return (w - w / (np.float32(1.0) + freqs.astype(np.float32) * ni))
    w = spec["idf64"][term]
    dl = LENGTH_TABLE[norms & 0xFF].astype(np.float64)
    f = freqs.astype(np.float64)
    return w * f / (f + spec["k1"] * (1.0 - spec["b"] + spec["b"] * dl / spec["avgdl64"]))


def _max_impact_score(imp_freqs, imp_norms, term, spec):
    if len(imp_freqs) == 0:
        return 0.0
    s = _score_arrays(imp_freqs.astype(np.int64), imp_norms.astype(np.int64),
                      term, spec, np.float32 if spec["mode"] == "f32" else np.float64)
    return float(np.max(s))


def _score_phrase(pfreqs, norms, p, spec, dtype):
    if dtype is np.float32:
        w = np.float32(p["w32"])
        ni = spec["cache32"][norms & 0xFF]
        return (w - w / (np.float32(1.0) + pfreqs.astype(np.float32) * ni))
    w = sum(spec["idf64"][t] for t in p["terms"])
    dl = LENGTH_TABLE[norms & 0xFF].astype(np.float64)
    f = pfreqs.astype(np.float64)
    return w * f / (f + spec["k1"] * (1.0 - spec["b"] + spec["b"] * dl / spec["avgdl64"]))


def _decode_term_bucket(term, by_term, want_positions=False):
    """All (docs, freqs, norms[, positions]) of a term within the bucket."""
    g = by_term.get(term)
    if g is None:
        return None
    docs_l, freqs_l, norms_l, pos_l = [], [], [], []
    for row in g.itertuples(index=False):
        r = row._asdict()
        d, f, n = decode_postings_block(r)
        docs_l.append(d)
        freqs_l.append(f)
        norms_l.append(n)
        if want_positions:
            pos_l.append(decode_positions_blob(r["pos_blob"], f))
    docs = np.concatenate(docs_l)
    order = np.argsort(docs, kind="stable")
    docs = docs[order]
    freqs = np.concatenate(freqs_l)[order]
    norms = np.concatenate(norms_l)[order]
    if want_positions:
        flat_pos = [p for sub in pos_l for p in sub]
        flat_pos = [flat_pos[i] for i in order]
        return docs, freqs, norms, flat_pos
    return docs, freqs, norms, None


def _norms_for_docs(term, by_term, docs):
    d, _, n, _ = _decode_term_bucket(term, by_term)
    idx = np.searchsorted(d, docs)
    return n[idx]


def _phrase_match(terms, by_term, spec):
    """Exact phrase within the bucket → (docs, phrase_freqs)."""
    if not spec["with_positions"]:
        raise ValueError("phrase query requires an index built with positions")
    per = []
    for t in terms:
        r = _decode_term_bucket(t, by_term, want_positions=True)
        if r is None:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        per.append(r)
    cand = per[0][0]
    for d, *_ in per[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if len(cand) == 0:
        return cand, cand
    out_docs, out_freqs = [], []
    for doc in cand:
        pos_sets = []
        ok = True
        for i, (d, f, n, ps) in enumerate(per):
            j = int(np.searchsorted(d, doc))
            pos_sets.append(ps[j])
        base = pos_sets[0]
        cnt = 0
        sets = [set(p.tolist()) for p in pos_sets[1:]]
        for p in base:
            if all((int(p) + i + 1) in sets[i] for i in range(len(sets))):
                cnt += 1
        if cnt > 0:
            out_docs.append(int(doc))
            out_freqs.append(cnt)
    return np.array(out_docs, dtype=np.int64), np.array(out_freqs, dtype=np.int64)
