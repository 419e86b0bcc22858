"""Distributed query execution: IndexSearcher → grid-sharded scoring kernel.

Plan shape (the Spark restatement of `search/IndexSearcher.java:513,
654-700`):

  driver   rewrite(query) → expand multi-term leaves against the
           dictionary → collect (field, term) stats (tiny broadcast) →
           per-CLAUSE weights (BooleanWeight builds one scorer per
           clause, so a term in both MUST and SHOULD scores twice)
  scan     postings.filter(field/term ∈ query) — Catalyst pushes the
           predicate into the Parquet scan; the (bucket, field, term)
           sort order makes this the FST/BlockTree seek analog
           (row-group pruning). The index layout is doc-sharded
           (bucket-major, whole grid cells per partition — Solr's shard
           model, QueryComponent.java:810), so the query plan is
           SHUFFLE-FREE: filter is narrow and every bucket's blocks are
           already contiguous.
  kernel   per partition, buckets in sequence: decode → vectorized
           TAAT scatter-add with block-max pruning (the WANDScorer /
           BlockMaxConjunctionScorer / BooleanScorer roles in one numpy
           kernel) → per-bucket top-k with a partition-carried threshold
  reduce   driver merges tiny per-bucket top-k frames with the reference
           tie-break: score desc, doc_id asc (HitQueue.java:76-81,
           TopDocs.merge TopDocs.java:34,70)

Because blocks never span grid cells (builder invariant), bucket sharding
is exact: every (field, term, doc) triple lands in exactly one bucket, so
AND / OR / NOT / minShouldMatch semantics are local to the kernel.

Clause kinds the kernel scores:
  term     TermQuery/BoostQuery(TermQuery) — BM25, weight = boost × idf
  phrase   PhraseQuery slop=0 (ExactPhraseMatcher.java:36) and slop>0
           (SloppyPhraseMatcher.java:56 semantics: a phrase occurrence
           anchored at each position p0 of the first term matches when
           the minimal total displacement Σᵢ min|posᵢ − (p0+i)| ≤ slop,
           contributing sloppyWeight = 1/(1+matchLength) to the phrase
           freq — the reference's sloppy weight formula; the matcher is
           fully vectorized, no per-doc Python)
  span     ordered SpanNearQuery (NearSpansOrdered.java:36 role):
           greedy first-term-anchored chain to each later term's first
           occurrence after the previous link, matchLength ≤ slop
  dismax   DisjunctionMaxQuery.java:45,51 — max + tie×(sum−max), over
           ARBITRARY disjuncts (term/phrase/span/nested boolean)

Plans come in two shapes: the FLAT clause-keyed plan (one nesting
level — per-block skipping, the fast common path) and the RECURSIVE
tree plan for arbitrary boolean composition (`build_tree`, evaluated
as nested mask/score reduction with bucket-level pruning); both emit
per-PARTITION top-k heaps flushed once at iterator exhaustion, so the
driver merge reads at most partitions × k rows.

Scoring modes:
  f32 — Lucene-exact float32 (BM25Similarity.java:222-235 order of ops)
  f64 — double precision on decoded lengths, for DuckDB-oracle parity

Pruning safety: upper bounds are computed in float64 and inflated by a
relative epsilon before comparison (the WANDScorer.java:52-104 scaled-
long guard restated for floats), so mixed f32/f64 rounding can never
over-prune; pruned ≡ exhaustive is pinned by tests.
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
from ..index.builder import (InvertedIndex, decode_positions_flat,
                             decode_postings_block)
from .ast import (DEFAULT_FIELD, MULTI_TERM_NODES, SPAN_NODES, BooleanQuery,
                  BoostQuery, Clause, DisjunctionMaxQuery,
                  FieldMaskingSpanQuery, FuzzyQuery,
                  IntervalAfter, IntervalBefore, IntervalBlock,
                  IntervalContainedBy, IntervalContaining,
                  IntervalMaxGaps, IntervalMaxWidth, IntervalNonOverlapping,
                  IntervalNotContainedBy, IntervalNotContaining,
                  IntervalNotWithin, IntervalOr, IntervalOrdered,
                  IntervalOverlapping, IntervalQuery, IntervalTerm,
                  IntervalUnordered, IntervalWithin,
                  FieldExistsQuery,
                  MatchAllQuery, MatchNoQuery, MultiPhraseQuery, Occur,
                  PhraseQuery, PrefixQuery,
                  RegexpQuery, SpanContainingQuery, SpanFirstQuery,
                  SpanNearQuery, SpanNotQuery,
                  SpanPositionRangeQuery, SpanWithinQuery,
                  SpanOrQuery, SpanTermQuery, TermQuery, TermRangeQuery,
                  WildcardQuery, rewrite)

KERNEL_SCHEMA = "doc_id long, score double"

# relative safety margin on float upper bounds (never over-prune)
_UB_EPS = 1e-6


class Searcher:
    """similarity: "bm25" (default; the float32 rank-identity path),
    "classic" (TFIDFSimilarity/ClassicSimilarity.java:39-63 — score =
    (ln((docCount+1)/(df+1))+1) × √freq × boost / √dl), or
    "lmdirichlet" (LMDirichletSimilarity.java:73-77 — boost ×
    (ln(1 + freq/(μ·cp)) + ln(μ/(dl+μ))) clamped at 0, cp =
    (ttf+1)/(sumTotalTermFreq+1), LMSimilarity.java:155),
    "lmjelinekmercer" (LMJelinekMercerSimilarity.java:63-69 — boost ×
    ln(1 + ((1−λ)·freq/dl)/(λ·cp)), λ = ``lam``), or "boolean"
    (BooleanSimilarity.java:38 — score == boost, tf/idf/norms ignored),
    "dfr" (DFRSimilarity.java:80 with BasicModelIn + AfterEffectB +
    NormalizationH2(c) — score = boost × log2((N+1)/(df+0.5)) ×
    ((ttf+2)/(df+1)) × (1 − 1/(1+tfn)), tfn = freq·log2(1 + c·avgdl/dl),
    BasicModelIn.java:30, AfterEffectB.java:29, NormalizationH2.java:53),
    "f2exp" (AxiomaticF2EXP.java — score = boost ×
    ((N+1)/df)^k × freq/(freq + s + s·dl/avgdl), Axiomatic.java:52
    defaults s=0.25, k=0.35), "ib" (IBSimilarity.java:105 with
    DistributionLL + LambdaDF + NormalizationH2(c) — score = boost ×
    ln((tfn+λ)/λ), λ = (df+1)/(N+1), LambdaDF.java:30,
    DistributionLL.java:29), or "dfi" (DFISimilarity.java:61 with
    IndependenceStandardized — expected = (ttf+1)·dl/(sumTTF+1);
    score = 0 when freq ≤ expected else boost ×
    log2((freq−expected)/√expected + 1)).
    Non-BM25 similarities run in f64 mode over TERM clauses and their
    boolean compositions (the pluggable-Similarity surface);
    phrase/span leaves remain BM25-only."""

    SIMILARITIES = ("bm25", "classic", "lmdirichlet", "lmjelinekmercer",
                    "boolean", "dfr", "f2exp", "ib", "dfi", "sweetspot")

    def __init__(self, spark: SparkSession, index: InvertedIndex,
                 k1: float = 1.2, b: float = 0.75,
                 similarity: str = "bm25", mu: float = 2000.0,
                 lam: float = 0.1, dfr_c: float = 1.0,
                 ax_s: float = 0.25, ax_k: float = 0.35,
                 ss_min: int = 1, ss_max: int = 1,
                 ss_steep: float = 0.5, ss_tf_base: float = 0.0,
                 ss_tf_min: float = 0.0):
        if similarity not in self.SIMILARITIES:
            raise ValueError(f"unknown similarity {similarity!r}")
        self.spark = spark
        self.index = index
        self.k1, self.b = k1, b
        self.sim = similarity
        self.mu = float(mu)
        self.lam = float(lam)
        self.dfr_c = float(dfr_c)
        self.ax_s = float(ax_s)
        self.ax_k = float(ax_k)
        # SweetSpotSimilarity.java:41-51 lengthNorm plateau + baselineTf
        self.ss_min, self.ss_max = int(ss_min), int(ss_max)
        self.ss_steep = float(ss_steep)
        self.ss_tf_base = float(ss_tf_base)
        self.ss_tf_min = float(ss_tf_min)
        self.stats = index.stats
        # driver-side stats cache keyed by (field, term): the index is
        # immutable, queries repeat terms, and each miss costs a (tiny but
        # job-scheduling-bound) filtered collect — the TermStates analog
        self._term_stats_cache: dict[tuple[str, str], tuple[int, int]] = {}
        self._gram_index = None

    @property
    def gram_index(self):
        """Dictionary q-gram index (multiterm.build_gram_index), built
        lazily on first wildcard query and cached for the searcher's
        lifetime — the automaton∩dictionary intersection analog."""
        if self._gram_index is None:
            from . import multiterm as mt
            self._gram_index = mt.build_gram_index(self.index.terms).cache()
        return self._gram_index

    # -- driver-side stats (collectionStatistics/termStatistics analog) ----
    def term_stats(self, keys: list[tuple[str, str]]) -> dict:
        """{(field, term): (df, ttf)} for keys present in the dictionary."""
        if not keys:
            return {}
        cache = self._term_stats_cache
        missing = [k for k in keys if k not in cache]
        if missing:
            cond = _key_filter(missing)
            rows = (self.index.terms.filter(cond)
                    .select("field", "term", "df", "ttf").collect())
            found = {(r["field"], r["term"]): (int(r["df"]), int(r["ttf"]))
                     for r in rows}
            for k in missing:
                cache[k] = found.get(k, (0, 0))
        return {k: cache[k] for k in keys if cache[k][0] > 0}

    def field_stats(self, fld: str) -> dict:
        return self.index.field_stats(fld)

    # ------------------------------------------------------------------
    # multi-term expansion (MultiTermQuery.rewrite analog)
    # ------------------------------------------------------------------
    def expand_multiterm(self, q):
        """Replace prefix/wildcard/regexp/fuzzy/range leaves with the OR
        of their dictionary expansions (SCORING_BOOLEAN rewrite,
        `search/ScoringRewrite.java:30`); expansion runs executor-side
        over the terms table, the driver receives only matches."""
        from . import multiterm as mt
        if isinstance(q, MULTI_TERM_NODES):
            if isinstance(q, PrefixQuery):
                ts = mt.prefix_terms(self.index.terms, q.prefix, field=q.field)
            elif isinstance(q, WildcardQuery):
                ts = mt.wildcard_terms_ngram(self.index.terms,
                                             self.gram_index, q.pattern,
                                             field=q.field)
            elif isinstance(q, RegexpQuery):
                ts = mt.regexp_terms(self.index.terms, q.pattern, field=q.field)
            elif isinstance(q, FuzzyQuery):
                ts = mt.fuzzy_terms(self.index.terms, q.term,
                                    max_edits=q.max_edits, field=q.field)
            else:
                ts = mt.range_terms(self.index.terms, q.lower, q.upper,
                                    q.include_lower, q.include_upper,
                                    field=q.field)
            if not ts:
                return MatchNoQuery()
            return mt.expanded_or(ts, field=q.field)
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                tuple(Clause(c.occur, self.expand_multiterm(c.query))
                      for c in q.clauses), q.min_should_match)
        if isinstance(q, BoostQuery):
            return BoostQuery(self.expand_multiterm(q.query), q.boost)
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                tuple(self.expand_multiterm(d) for d in q.disjuncts),
                q.tie_breaker)
        if isinstance(q, IntervalQuery):
            return IntervalQuery(
                self._expand_interval_source(q.source, q.field),
                q.field, q.pivot)
        return q

    def _expand_interval_source(self, src, field: str):
        """Replace IntervalPrefix/IntervalWildcard with the IntervalOr
        of their dictionary expansions (MultiTermIntervalsSource role;
        Intervals.java DEFAULT_MAX_EXPANSIONS — past the cap the
        highest-df terms are kept, the top-terms posture, instead of
        the reference's IllegalStateException)."""
        from . import multiterm as mt
        from .ast import (IntervalContainedBy, IntervalContaining,
                          IntervalMaxGaps, IntervalMaxWidth,
                          IntervalNotContainedBy, IntervalNotContaining,
                          IntervalOr, IntervalOrdered, IntervalPrefix,
                          IntervalUnordered, IntervalWildcard)
        # (relative-position filters are imported at module level)
        s = src
        if isinstance(s, (IntervalPrefix, IntervalWildcard)):
            if isinstance(s, IntervalPrefix):
                ts = mt.prefix_terms(self.index.terms, s.prefix,
                                     field=field, size=s.max_expansions)
            else:
                ts = mt.wildcard_terms_ngram(self.index.terms,
                                             self.gram_index, s.pattern,
                                             field=field,
                                             size=s.max_expansions)
            if not ts:
                # unmatched expansion: an impossible term — the source
                # (and any conjunction over it) matches nothing
                return IntervalTerm("\0")
            if len(ts) == 1:
                return IntervalTerm(ts[0])
            return IntervalOr(tuple(IntervalTerm(t) for t in ts))
        rec = lambda x: self._expand_interval_source(x, field)  # noqa: E731
        if isinstance(s, (IntervalOrdered, IntervalUnordered, IntervalOr)):
            return type(s)(tuple(rec(ch) for ch in s.sources))
        if isinstance(s, (IntervalMaxGaps, IntervalMaxWidth)):
            return type(s)(rec(s.source),
                           s.gaps if isinstance(s, IntervalMaxGaps)
                           else s.width)
        if isinstance(s, IntervalContaining):
            return IntervalContaining(rec(s.big), rec(s.small))
        if isinstance(s, IntervalNotContaining):
            return IntervalNotContaining(rec(s.minuend), rec(s.subtrahend))
        if isinstance(s, IntervalContainedBy):
            return IntervalContainedBy(rec(s.small), rec(s.big))
        if isinstance(s, IntervalNotContainedBy):
            return IntervalNotContainedBy(rec(s.small), rec(s.big))
        if isinstance(s, (IntervalBefore, IntervalAfter,
                          IntervalOverlapping)):
            return type(s)(rec(s.source), rec(s.reference))
        if isinstance(s, IntervalNonOverlapping):
            return IntervalNonOverlapping(rec(s.minuend), rec(s.subtrahend))
        if isinstance(s, IntervalNotWithin):
            return IntervalNotWithin(rec(s.minuend), s.positions,
                                     rec(s.subtrahend))
        if isinstance(s, IntervalWithin):
            return IntervalWithin(rec(s.source), s.positions,
                                  rec(s.reference))
        return s

    # ------------------------------------------------------------------
    # plan: AST → clause list
    # ------------------------------------------------------------------
    def _plan(self, query):
        query = rewrite(self.expand_multiterm(rewrite(query)))
        ex = _split_exists(query)
        if ex is not None:
            return {"exists": ex}
        plan = flatten_plan(query)
        if isinstance(plan, dict) and "tree" in plan \
                and not tree_grounded(plan["tree"]):
            # the kernel scans only the plan's term blocks; an
            # unanchored match set (pure negation at the root) needs
            # the all-docs composition instead
            ub = unbounded_parts(query)
            if ub is None:
                raise ValueError(
                    "unbounded query: the match set is not anchored by "
                    "any positive clause and is not a top-level "
                    "pure-negation union — add a grounding clause "
                    "(Solr's fix-up handles exactly the same top-level "
                    "shapes)")
            return {"unbounded": ub}
        return plan

    # ------------------------------------------------------------------
    def _clause_keys(self, c) -> list[tuple[str, str]]:
        return _leaf_keys(c)

    def _stat_env(self, all_keys):
        """Shared per-query stat environment: term stats, per-field BM25
        caches and idf weights (IndexSearcher.java:914-933)."""
        st = self.term_stats(all_keys)
        fields = sorted({f for f, _ in all_keys})
        fstats = {f: self.field_stats(f) for f in fields}
        cache32 = {f: bm25.norm_inverse_cache(
            bm25.avg_field_length(fstats[f]["sum_ttf"], fstats[f]["doc_count"])
            if fstats[f]["doc_count"] else np.float32(1.0),
            self.k1, self.b) for f in fields}
        avgdl64 = {f: (fstats[f]["sum_ttf"] / float(fstats[f]["doc_count"])
                       if fstats[f]["doc_count"] else 1.0) for f in fields}

        def idf32(key):
            f, _ = key
            return bm25.idf(st[key][0], fstats[f]["doc_count"])

        def idf64(key):
            f, _ = key
            n, df = fstats[f]["doc_count"], st[key][0]
            return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

        weights = {}
        for key in all_keys:
            if key in st:
                f = key[0]
                n = fstats[f]["doc_count"]
                df, ttf = st[key]
                weights[key] = {
                    "df": df,
                    "idf32": float(idf32(key)),
                    "idf64": idf64(key),
                    # ClassicSimilarity.idf (ClassicSimilarity.java:61-63)
                    "cidf64": math.log((n + 1) / (df + 1.0)) + 1.0,
                    # LM collection probability (LMSimilarity.java:155)
                    "cp64": (ttf + 1.0) / (fstats[f]["sum_ttf"] + 1.0),
                    # DFR InB2 per-term constant: A × aeTimes1pTfn
                    # (BasicModelIn.java:30 A=log2((N+1)/(df+0.5));
                    #  AfterEffectB.java:29 ae=(F+2)/(n+1))
                    "dfrw64": (math.log2((n + 1) / (df + 0.5))
                               * (ttf + 2.0) / (df + 1.0)),
                    # AxiomaticF2EXP idf component ((N+1)/df)^k
                    "f2w64": ((n + 1.0) / df) ** self.ax_k,
                    # IB LambdaDF (LambdaDF.java:30; the ==1 guard only
                    # bites on a 1-doc corpus)
                    "ibl64": min((df + 1.0) / (n + 1.0), 1.0 - 1e-12),
                    # DFI expected-rate: expected = rate × dl
                    # (DFISimilarity.java:63 with numberOfFieldTokens)
                    "dfir64": (ttf + 1.0) / (fstats[f]["sum_ttf"] + 1.0),
                }
        return st, cache32, avgdl64, weights

    def _spec_for_plan(self, plan, mode, k, prune, collect_all=False):
        """→ (spec, live_keys, dead). Computes per-clause weights from
        per-field collection stats (IndexSearcher.java:914-933) and drops
        clauses that cannot match (df == 0), propagating deadness.
        Dispatches to the recursive-tree spec for nested plans."""
        if "tree" in plan:
            return self._spec_for_tree(plan, mode, k, prune, collect_all)
        clauses, must_not, msm = plan["clauses"], plan["must_not"], plan["msm"]
        all_keys = []
        for c in clauses + must_not:
            all_keys.extend(self._clause_keys(c))
        all_keys = list(dict.fromkeys(all_keys))
        st, cache32, avgdl64, weights = self._stat_env(all_keys)

        n_groups = plan["n_groups"]
        group_alive = [False] * n_groups
        live_clauses = []
        n_should_alive = 0
        for c in clauses:
            ann = _annotate_leaf(c, st, weights, sim=self.sim)
            if ann is not None:
                live_clauses.append(ann)
                if ann["group"] is not None:
                    group_alive[ann["group"]] = True
                elif ann["should"]:
                    n_should_alive += 1
        dead = (n_groups > 0 and not all(group_alive)) or not live_clauses
        if n_groups == 0:
            dead = dead or n_should_alive == 0
        dead = dead or (msm > 0 and msm > n_should_alive)

        # MUST_NOT leaves are match-only (weights still annotated so the
        # same eval kernels run); a dismax under MUST_NOT excludes the
        # UNION of its disjuncts' matches — previously silently dropped
        live_mn = []
        for c in must_not:
            ann = _annotate_leaf(c, st, weights, sim=self.sim)
            if ann is not None:
                live_mn.append(ann)

        deleted = getattr(self.index, "deleted_array", None)
        spec = dict(
            clauses=live_clauses, must_not=live_mn, msm=msm,
            n_groups=n_groups,
            deleted=deleted,
            cache32={f: c for f, c in cache32.items()},
            avgdl64=avgdl64,
            k1=self.k1, b=self.b, sim=self.sim, mu=self.mu, lam=self.lam,
            dfr_c=self.dfr_c, ax_s=self.ax_s,
            ss=(self.ss_min, self.ss_max, self.ss_steep,
                self.ss_tf_base, self.ss_tf_min),
            grid=self.stats["grid"], mode=mode, k=k,
            collect_all=collect_all, prune=prune and not collect_all,
            with_positions=self.index.with_positions,
        )
        live = [k for k in all_keys if k in st]
        return spec, live, dead

    def _spec_for_tree(self, plan, mode, k, prune, collect_all=False):
        """Tree-plan spec: same stat environment, recursive annotation.
        Pruning on tree plans is bucket-level only (conservative tree
        upper bound); per-block skipping stays a flat-plan optimization."""
        root = plan["tree"]
        all_keys = list(dict.fromkeys(_tree_keys(root)))
        st, cache32, avgdl64, weights = self._stat_env(all_keys)
        root = _annotate_tree(root, st, weights, sim=self.sim)
        deleted = getattr(self.index, "deleted_array", None)
        spec = dict(
            tree=root, deleted=deleted, cache32=cache32, avgdl64=avgdl64,
            k1=self.k1, b=self.b, sim=self.sim, mu=self.mu, lam=self.lam,
            dfr_c=self.dfr_c, ax_s=self.ax_s,
            ss=(self.ss_min, self.ss_max, self.ss_steep,
                self.ss_tf_base, self.ss_tf_min),
            grid=self.stats["grid"], mode=mode, k=k,
            collect_all=collect_all, prune=prune and not collect_all,
            with_positions=self.index.with_positions,
        )
        live = [key for key in all_keys if key in st]
        return spec, live, root is None

    # ------------------------------------------------------------------
    def _run_kernel(self, plan, mode="f32", collect_all=False, k=10,
                    prune=True) -> DataFrame:
        spec, live, dead = self._spec_for_plan(
            plan, mode, k, prune, collect_all=collect_all)
        if dead:
            return self.spark.createDataFrame([], KERNEL_SCHEMA)
        blocks = self.index.postings.filter(_key_filter(live))
        if not self.index.with_positions:
            blocks = blocks.drop("pos_blob")
        blocks = blocks.drop("off_blob", "pay_blob")   # kernel-unused
        blocks = self._with_del_col(blocks)

        def kernel(batches):
            yield from _bucket_kernel(batches, spec)

        # No shuffle: the index layout is bucket-major (whole grid cells per
        # partition, sorted by bucket/field/term/block), so the narrow filter
        # keeps every bucket's blocks contiguous within its partition.
        return blocks.mapInPandas(kernel, schema=KERNEL_SCHEMA)

    def _with_del_col(self, blocks):
        """Attach the per-cell tombstone column when the index carries a
        distributed delete table (liveDocs-file analog): a left join on
        ``bucket`` — unique on the table side, so per-partition row
        order is preserved and every bucket group sees its own
        ``del_offsets``. Bounded sets keep the in-spec array (no join)."""
        dtab = getattr(self.index, "del_table", None)
        if dtab is None:
            return blocks
        return blocks.join(dtab, "bucket", "left")

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
        if self.sim != "bm25":
            mode = "f64"      # non-BM25 similarities are f64-only
        empty = pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        results: dict[int, pd.DataFrame] = {}
        specs, live_union, qids = [], [], []
        for qi, query in enumerate(queries):
            plan = self._plan(query)
            if plan is None:
                results[qi] = empty
                continue
            if plan == "ALL" or (isinstance(plan, dict)
                                 and ("unbounded" in plan
                                      or "exists" in plan)):
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
            blocks = self.index.postings.filter(_key_filter(live_union))
            if not self.index.with_positions:
                blocks = blocks.drop("pos_blob")
            blocks = blocks.drop("off_blob", "pay_blob")
            blocks = self._with_del_col(blocks)

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
        if self.sim != "bm25":
            mode = "f64"      # non-BM25 similarities are f64-only
        plan = self._plan(query)
        if plan is None:
            return pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        if plan == "ALL":
            pdf = self._all_live_docs().orderBy("doc_id").limit(k).toPandas()
            pdf["score"] = np.float32(1.0)
            pdf["rank"] = np.arange(1, len(pdf) + 1)
            return pdf[["rank", "doc_id", "score"]]
        if isinstance(plan, dict) and ("unbounded" in plan
                                       or "exists" in plan):
            df = (self._score_unbounded(plan["unbounded"])
                  if "unbounded" in plan
                  else self._score_exists(plan["exists"]))
            pdf = (df.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
                   .toPandas())
            pdf["rank"] = np.arange(1, len(pdf) + 1)
            if mode == "f32":
                pdf["score"] = pdf["score"].astype(np.float32)
            return pdf[["rank", "doc_id", "score"]]
        df = self._run_kernel(plan, mode=mode, collect_all=False, k=k,
                              prune=prune)
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
        if self.sim != "bm25":
            mode = "f64"      # non-BM25 similarities are f64-only
        plan = self._plan(query)
        if plan is None:
            return self.spark.createDataFrame([], KERNEL_SCHEMA)
        if plan == "ALL":
            # MatchAllDocsQuery: every doc with at least one indexed term,
            # constant score 1 (ConstantScore semantics); tombstoned docs
            # excluded (liveDocs)
            return (self._all_live_docs()
                    .select("doc_id", F.lit(1.0).alias("score")))
        if isinstance(plan, dict) and "unbounded" in plan:
            return self._score_unbounded(plan["unbounded"])
        if isinstance(plan, dict) and "exists" in plan:
            return self._score_exists(plan["exists"])
        return self._run_kernel(plan, mode=mode, collect_all=True)

    def _all_live_docs(self) -> DataFrame:
        """Every doc with at least one indexed term, minus tombstones
        (liveDocs): the corpus stream the clause-keyed kernel never
        scans."""
        alldocs = self.index.norms.select("doc_id").distinct()
        dels = getattr(self.index, "deletes", None)
        if dels is not None:
            # broadcast only the bounded (driver-array) carrier; a
            # distributed tombstone set anti-joins without the hint
            small = getattr(self.index, "deleted_array", None) is not None
            alldocs = alldocs.join(
                F.broadcast(dels) if small else dels,
                "doc_id", "left_anti")
        return alldocs

    def _field_exists_docs(self, fld: str) -> DataFrame:
        """doc_ids with ≥1 indexed token in ``fld`` — one row per
        (field, doc) in the norms table, so no distinct needed."""
        return self.index.norms.filter(F.col("field") == fld) \
                               .select("doc_id")

    def _score_exists(self, ex) -> DataFrame:
        """FieldExistsQuery composition: semi-/anti-/left-join the
        (per-field) norms doc-set onto the scored rest — no collect,
        one join per exists clause; the joins broadcast or shuffle on
        doc_id exactly like the tombstone path."""
        rest = list(ex["rest"])
        pos_must = [c for c in rest if c.occur in (Occur.MUST, Occur.FILTER)]
        pos_should = [c for c in rest if c.occur is Occur.SHOULD]
        negs = [c.query for c in rest if c.occur is Occur.MUST_NOT]
        anchored = bool(ex["must"]) or bool(pos_must)
        if ex["should"] and (ex["msm"] > 1
                             or (anchored and ex["msm"] > 0)):
            raise ValueError(
                "SHOULD FieldExistsQuery under min_should_match needs "
                "per-doc SHOULD tallies the kernel does not track — "
                "rewrite with MUST/FILTER clauses instead")
        const = sum(b for _, b in ex["must"])
        if anchored:
            if pos_must or (pos_should and ex["msm"] > 0):
                # the kernel's own must/should/msm semantics apply to
                # the residue; exists clauses then intersect/exclude
                rest_q = rewrite(BoostQuery(
                    BooleanQuery(tuple(rest), ex["msm"]), ex["boost"]))
                df = self.score_all(rest_q, mode="f64")
            else:
                # must-exists is the only anchor: SHOULD residue is
                # optional (BooleanWeight with a MUST present), scored
                # via left join; MUST_NOT residue excludes the base
                df = self._all_live_docs().select(
                    "doc_id", F.lit(0.0).alias("score"))
                if pos_should:
                    rq = rewrite(BoostQuery(
                        BooleanQuery(tuple(pos_should), 0), ex["boost"]))
                    sdf = (self.score_all(rq, mode="f64")
                           .withColumnRenamed("score", "_s"))
                    df = (df.join(sdf, "doc_id", "left")
                          .select("doc_id",
                                  (F.col("score")
                                   + F.coalesce(F.col("_s"), F.lit(0.0)))
                                  .alias("score")))
                for nq in negs:
                    df = df.join(self.match_docs(nq), "doc_id", "left_anti")
            for fld, _ in ex["must"]:
                df = df.join(self._field_exists_docs(fld),
                             "doc_id", "left_semi")
        else:
            # pure-SHOULD union (msm ≤ 1): ALL live docs carry the
            # grounded-should scores and per-field exists flags; a doc
            # matches when any part does (same frame as
            # _score_unbounded, one join per part)
            df = self._all_live_docs()
            matched = F.lit(False)
            score = F.lit(0.0)
            if pos_should:
                rq = rewrite(BoostQuery(
                    BooleanQuery(tuple(pos_should), 0), ex["boost"]))
                sdf = (self.score_all(rq, mode="f64")
                       .withColumnRenamed("score", "_s"))
                df = df.join(sdf, "doc_id", "left")
                score = score + F.coalesce(F.col("_s"), F.lit(0.0))
                matched = matched | F.col("_s").isNotNull()
            for i, (fld, b) in enumerate(ex["should"]):
                edf = (self._field_exists_docs(fld)
                       .withColumn(f"_e{i}", F.lit(True)))
                df = df.join(edf, "doc_id", "left")
                hit = F.coalesce(F.col(f"_e{i}"), F.lit(False))
                score = score + F.when(hit, F.lit(float(b))) \
                                 .otherwise(F.lit(0.0))
                matched = matched | hit
            df = (df.filter(matched)
                  .select("doc_id", score.alias("score")))
            for nq in negs:
                df = df.join(self.match_docs(nq), "doc_id", "left_anti")
        # SHOULD exists alongside MUST anchors: optional constant add
        if anchored:
            for i, (fld, b) in enumerate(ex["should"]):
                edf = (self._field_exists_docs(fld)
                       .withColumn(f"_e{i}", F.lit(True)))
                df = df.join(edf, "doc_id", "left")
                df = df.select(
                    "doc_id",
                    (F.col("score") + F.when(F.col(f"_e{i}"), F.lit(float(b)))
                     .otherwise(F.lit(0.0))).alias("score"))
        for fld in ex["not"]:
            df = df.join(self._field_exists_docs(fld), "doc_id", "left_anti")
        if const:
            df = df.select(
                "doc_id", (F.col("score") + F.lit(float(const)))
                .alias("score"))
        return df

    def _score_unbounded(self, parts) -> DataFrame:
        """Pure-negation composition (the shape the kernel cannot scan):
        ALL live docs, minus each wrapper's excludes, plus grounded
        SHOULD siblings — one anti-joinable left join per part over the
        doc_id stream; no collect, scales as ordinary joins.

        Lucene scoring carried exactly: a wrapper contributes its
        MatchAll boost to every non-excluded doc; a grounded sibling
        contributes its own score where it matches; a doc matches when
        ANY part does (msm ≤ 1 — enforced by unbounded_parts)."""
        from .ast import BooleanQuery, Clause, Occur
        df = self._all_live_docs()
        score = F.lit(0.0)
        matched = F.lit(False)
        for i, (excl, const) in enumerate(parts["wrappers"]):
            if excl:
                exq = (excl[0] if len(excl) == 1 else BooleanQuery(
                    tuple(Clause(Occur.SHOULD, e) for e in excl)))
                mdf = (self.match_docs(exq)
                       .withColumn(f"_x{i}", F.lit(True)))
                df = df.join(mdf, "doc_id", "left")
                hit = F.coalesce(F.col(f"_x{i}"), F.lit(False))
            else:
                hit = F.lit(False)
            score = score + F.when(~hit, F.lit(float(const))) \
                             .otherwise(F.lit(0.0))
            matched = matched | ~hit
        for j, g in enumerate(parts["grounded"]):
            sdf = (self.score_all(g, mode="f64")
                   .withColumnRenamed("score", f"_s{j}"))
            df = df.join(sdf, "doc_id", "left")
            score = score + F.coalesce(F.col(f"_s{j}"), F.lit(0.0))
            matched = matched | F.col(f"_s{j}").isNotNull()
        return (df.filter(matched)
                .select("doc_id", score.alias("score")))

    def match_docs(self, query) -> DataFrame:
        """Just the matching doc_ids (FILTER semantics / ConstantScore)."""
        return self.score_all(query, mode="f64").select("doc_id")

    def count(self, query) -> int:
        """TotalHitCountCollector analog."""
        return self.score_all(query).count()


def flatten_plan(query):
    """Normalize a REWRITTEN AST into a kernel plan.

    Flat plans (the common shapes — one nesting level of MUST/FILTER/
    MUST_NOT over pure-OR groups, leaf dismax) keep the clause-keyed
    {"clauses", "must_not", "msm", "n_groups"} form with per-block
    pruning. Any deeper composition — `(a AND b) OR (c AND d)`, MUST of
    a mixed phrase/term group, nested minShouldMatch, dismax over
    booleans — falls through to the recursive tree plan
    ({"tree": node}), the Boolean2ScorerSupplier.java:100-127 recursive
    scorer composition restated as nested mask/score reduction.

    → None (MatchNo), "ALL" (MatchAll), a flat plan, or a tree plan.
    Shared with the pure-Python oracle so clause ordering — and
    therefore float32 accumulation order — agrees by construction.
    """
    try:
        return _flat_plan(query)
    except ValueError:
        return {"tree": build_tree(query)}


def _split_exists(query):
    """FieldExistsQuery composition → parts dict, or None when the
    query has no exists clause.

    Supported envelope (Solr's shapes — fq=field:*, `+field:* +scored`,
    `field:* OR scored`, `field:* -scored`): standalone/boosted exists,
    and exists as MUST / FILTER / SHOULD / MUST_NOT clauses of a
    top-level BooleanQuery. A MUST or matching SHOULD exists clause
    contributes its constant score (1 × boost) to the sum like
    Lucene's BooleanWeight; FILTER contributes 0. Outside the
    envelope (raises): SHOULD exists under min_should_match > 1 or
    alongside MUST anchors with msm > 0 — per-doc SHOULD tallies
    would need kernel support."""
    boost = 1.0
    q = query
    while isinstance(q, BoostQuery):
        boost *= q.boost
        q = q.query
    if isinstance(q, FieldExistsQuery):
        return {"must": [(q.field, boost)], "not": [], "should": [],
                "rest": (), "msm": 0, "boost": boost}
    if not isinstance(q, BooleanQuery):
        return None
    must, not_, should, rest = [], [], [], []
    for cl in q.clauses:
        inner, bb = cl.query, 1.0
        while isinstance(inner, BoostQuery):
            bb *= inner.boost
            inner = inner.query
        if not isinstance(inner, FieldExistsQuery):
            rest.append(cl)
            continue
        if cl.occur is Occur.MUST:
            must.append((inner.field, boost * bb))
        elif cl.occur is Occur.FILTER:
            must.append((inner.field, 0.0))
        elif cl.occur is Occur.MUST_NOT:
            not_.append(inner.field)
        else:
            should.append((inner.field, boost * bb))
    if not must and not not_ and not should:
        return None
    return {"must": must, "not": not_, "should": should,
            "rest": tuple(rest), "msm": q.min_should_match,
            "boost": boost}


def _wrapper_parts(q):
    """Canonical pure-negation wrapper — BQ(MUST_NOT x…, SHOULD/MUST
    MatchAll…) with no other positive clause (the shape
    SimpleQueryParser emits for NOT, :439-444, and Solr's top-level
    pure-negative fix-up) → (exclude ASTs, const score) or None."""
    from .ast import BooleanQuery, BoostQuery, MatchAllQuery, Occur
    if isinstance(q, MatchAllQuery):
        return [], 1.0
    if not isinstance(q, BooleanQuery):
        return None
    const, n_all, excl = 0.0, 0, []
    for cl in q.clauses:
        inner, bb = cl.query, 1.0
        while isinstance(inner, BoostQuery):
            bb *= inner.boost
            inner = inner.query
        if isinstance(inner, MatchAllQuery) and cl.occur in (
                Occur.MUST, Occur.SHOULD, Occur.FILTER):
            n_all += 1
            if cl.occur is not Occur.FILTER:
                const += bb
        elif cl.occur is Occur.MUST_NOT:
            excl.append(cl.query)
        else:
            return None
    if n_all == 0 or q.min_should_match > n_all:
        return None
    return excl, const


def unbounded_parts(query):
    """Decompose a top-level UNGROUNDED query the kernel cannot scan
    into DataFrame-composable parts: {"wrappers": [(excludes, const)],
    "grounded": [ASTs]} for (a) a single negation wrapper or (b) a
    pure-SHOULD union (msm ≤ 1) mixing wrappers with ordinary grounded
    children. Returns None for shapes outside this envelope."""
    from .ast import BooleanQuery, Occur
    w = _wrapper_parts(query)
    if w is not None:
        return {"wrappers": [w], "grounded": []}
    if not isinstance(query, BooleanQuery) or query.min_should_match > 1:
        return None
    wrappers, grounded = [], []
    for cl in query.clauses:
        if cl.occur is not Occur.SHOULD:
            return None
        w = _wrapper_parts(cl.query)
        if w is not None:
            wrappers.append(w)
            continue
        try:
            sub = flatten_plan(cl.query)
        except ValueError:
            return None
        if isinstance(sub, dict) and "tree" in sub \
                and not tree_grounded(sub["tree"]):
            return None
        grounded.append(cl.query)
    if not wrappers:
        return None
    return {"wrappers": wrappers, "grounded": grounded}


def _span_op(q):
    """Compile a span AST node → span-op dict (the spantree IR):
      {"op": "sterm", "key": (f, t)}
      {"op": "sor",   "children": [...]}
      {"op": "snear", "children": [...], "slop": int, "ordered": bool}
      {"op": "snot",  "include": ..., "exclude": ..., "pre": i, "post": i}
      {"op": "sfirst","child": ..., "end": int}
    All leaves must share one field (SpanNearQuery.java:73 enforces
    same-field clauses); validated by the caller via span_leaf_keys."""
    if isinstance(q, SpanTermQuery):
        return {"op": "sterm", "key": (q.field, q.term)}
    if isinstance(q, SpanNearQuery):
        if bool(q.terms) == bool(q.clauses):
            raise ValueError(
                "SpanNearQuery takes exactly one of terms= or clauses=")
        children = ([{"op": "sterm", "key": (q.field, t)} for t in q.terms]
                    or [_span_op(ch) for ch in q.clauses])
        if len(children) < 2:
            raise ValueError("span-near needs >= 2 children")
        return {"op": "snear", "children": children, "slop": int(q.slop),
                "ordered": bool(q.in_order)}
    if isinstance(q, SpanOrQuery):
        if not q.clauses:
            raise ValueError("span-or needs >= 1 child")
        return {"op": "sor", "children": [_span_op(ch) for ch in q.clauses]}
    if isinstance(q, SpanNotQuery):
        return {"op": "snot", "include": _span_op(q.include),
                "exclude": _span_op(q.exclude),
                "pre": int(q.pre), "post": int(q.post)}
    if isinstance(q, SpanFirstQuery):
        return {"op": "sfirst", "child": _span_op(q.match),
                "end": int(q.end)}
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        op = ("scontain" if isinstance(q, SpanContainingQuery)
              else "swithin")
        return {"op": op, "big": _span_op(q.big),
                "little": _span_op(q.little)}
    if isinstance(q, SpanPositionRangeQuery):
        return {"op": "sposrange", "child": _span_op(q.match),
                "start": int(q.start), "end": int(q.end)}
    if isinstance(q, FieldMaskingSpanQuery):
        # FieldMaskingSpanQuery.java:61 — getSpans delegates verbatim;
        # the mask only affects getField() (validation + scoring field)
        return _span_op(q.match)
    raise ValueError(f"not a span query: {q!r}")


def _span_leaf(q, boost: float):
    """Span AST → kernel leaf clause. A plain ordered term-near keeps the
    legacy vectorized fast path ({"kind": "span"}); every composite
    shape compiles to {"kind": "spantree"}."""
    from .ast import span_leaf_keys
    if isinstance(q, SpanNearQuery):
        if bool(q.terms) == bool(q.clauses):
            raise ValueError(
                "SpanNearQuery takes exactly one of terms= or clauses=")
        if len(q.terms or q.clauses) < 2:
            raise ValueError("span-near needs >= 2 children")
    if isinstance(q, SpanNearQuery) and q.terms and q.in_order:
        return {"kind": "span", "keys": [(q.field, t) for t in q.terms],
                "slop": int(q.slop), "boost": boost}
    keys = span_leaf_keys(q)
    from .ast import span_effective_fields
    fields = span_effective_fields(q)
    if len(fields) > 1:
        raise ValueError(
            f"span query clauses must share one field, got {sorted(fields)}"
            " (wrap cross-field clauses in FieldMaskingSpanQuery)")
    # scoring field = the EFFECTIVE field (under masking this is the
    # mask, so norms/stats of the masking field apply — the reference's
    # documented caveat)
    eff = next(iter(fields)) if fields else getattr(q, "field", None)
    if keys and eff not in {f for f, _ in keys}:
        raise ValueError(
            "fully-masked span query: no clause actually reads the "
            f"masking field {eff!r}, so its norms/stats are not on any "
            "leaf posting — include at least one unmasked clause of the "
            "masking field (FieldMaskingSpanQuery.java pairs a masked "
            "clause WITH native ones)")
    return {"kind": "spantree", "root": _span_op(q), "boost": boost,
            "field": eff}


def _interval_op(src, field: str):
    """Compile an interval source AST → iv-op dict with its static
    minExtent (OrderedIntervalsSource.java:83-88 — Σ child minExtents;
    filters delegate to the wrapped source)."""
    if isinstance(src, IntervalTerm):
        return {"op": "iterm", "key": (field, src.term), "min_extent": 1}
    if isinstance(src, IntervalBlock):
        if len(src.terms) < 2:
            raise ValueError("interval block needs >= 2 terms")
        return {"op": "iblock", "keys": [(field, t) for t in src.terms],
                "min_extent": len(src.terms)}
    if isinstance(src, IntervalOrdered):
        if len(src.sources) < 2:
            raise ValueError("ordered intervals need >= 2 sources")
        kids = [_interval_op(ch, field) for ch in src.sources]
        return {"op": "iord", "children": kids,
                "min_extent": sum(k["min_extent"] for k in kids)}
    if isinstance(src, IntervalUnordered):
        if len(src.sources) != 2:
            raise ValueError(
                "the kernel supports unordered intervals over exactly 2 "
                "sources (the k-source queue shape is not vectorized)")
        kids = [_interval_op(ch, field) for ch in src.sources]
        return {"op": "iunord", "children": kids,
                "min_extent": sum(k["min_extent"] for k in kids)}
    if isinstance(src, IntervalOr):
        if len(src.sources) < 2:
            raise ValueError("interval or needs >= 2 sources")
        kids = [_interval_op(ch, field) for ch in src.sources]
        return {"op": "ior", "children": kids,
                "min_extent": min(k["min_extent"] for k in kids)}
    if isinstance(src, IntervalContaining):
        big = _interval_op(src.big, field)
        small = _interval_op(src.small, field)
        return {"op": "icontaining", "big": big, "small": small,
                "min_extent": big["min_extent"]}
    if isinstance(src, IntervalNotContaining):
        big = _interval_op(src.minuend, field)
        small = _interval_op(src.subtrahend, field)
        return {"op": "inotcontaining", "big": big, "small": small,
                "min_extent": big["min_extent"]}
    if isinstance(src, IntervalContainedBy):
        small = _interval_op(src.small, field)
        big = _interval_op(src.big, field)
        return {"op": "icontainedby", "small": small, "big": big,
                "min_extent": small["min_extent"]}
    if isinstance(src, IntervalNotContainedBy):
        small = _interval_op(src.small, field)
        big = _interval_op(src.big, field)
        return {"op": "inotcontainedby", "small": small, "big": big,
                "min_extent": small["min_extent"]}
    if isinstance(src, (IntervalBefore, IntervalAfter,
                        IntervalOverlapping)):
        s_op = _interval_op(src.source, field)
        r_op = _interval_op(src.reference, field)
        name = {IntervalBefore: "ibefore", IntervalAfter: "iafter",
                IntervalOverlapping: "ioverlap"}[type(src)]
        return {"op": name, "src": s_op, "ref": r_op, "positions": 0,
                "min_extent": s_op["min_extent"]}
    if isinstance(src, IntervalNonOverlapping):
        return {"op": "inonoverlap",
                "src": _interval_op(src.minuend, field),
                "ref": _interval_op(src.subtrahend, field), "positions": 0,
                "min_extent": _interval_op(src.minuend,
                                           field)["min_extent"]}
    if isinstance(src, IntervalNotWithin):
        # Intervals.java: nonOverlapping(minuend, extend(sub, p, p))
        s_op = _interval_op(src.minuend, field)
        return {"op": "inonoverlap", "src": s_op,
                "ref": _interval_op(src.subtrahend, field),
                "positions": int(src.positions),
                "min_extent": s_op["min_extent"]}
    if isinstance(src, IntervalWithin):
        # containedBy(source, extend(reference, p, p))
        s_op = _interval_op(src.source, field)
        return {"op": "iwithin", "src": s_op,
                "ref": _interval_op(src.reference, field),
                "positions": int(src.positions),
                "min_extent": s_op["min_extent"]}
    if isinstance(src, IntervalMaxGaps):
        kid = _interval_op(src.source, field)
        return {"op": "imaxgaps", "child": kid, "gaps": int(src.gaps),
                "min_extent": kid["min_extent"]}
    if isinstance(src, IntervalMaxWidth):
        kid = _interval_op(src.source, field)
        return {"op": "imaxwidth", "child": kid, "width": int(src.width),
                "min_extent": kid["min_extent"]}
    raise ValueError(f"not an interval source: {src!r}")


def _interval_leaf(q: IntervalQuery, boost: float):
    """IntervalQuery AST → kernel leaf clause (kind "interval")."""
    if not (q.pivot > 0):
        raise ValueError(f"pivot must be > 0, got {q.pivot}")
    return {"kind": "interval", "root": _interval_op(q.source, q.field),
            "boost": boost, "pivot": float(q.pivot), "field": q.field}


def _flat_plan(query):
    """The one-nesting-level clause-keyed plan (raises ValueError on
    shapes it cannot express; flatten_plan then builds a tree plan).

    Clauses are kept per-CLAUSE (not per-term): Lucene's BooleanWeight
    builds one scorer per clause, so `+spark spark` scores the term
    twice (`search/BooleanQuery.java` clause model).
    """
    if isinstance(query, MatchNoQuery):
        return None
    if isinstance(query, MatchAllQuery):
        return "ALL"
    # top-level boost distributes multiplicatively over every scoring
    # clause (scores are linear in the clause weight)
    boost_all = 1.0
    while isinstance(query, BoostQuery):
        boost_all *= query.boost
        query = query.query

    groups: list[list[dict]] = []   # group i = list of member clauses
    shoulds: list[dict] = []
    must_not: list[dict] = []
    msm = 0

    def leaf_clause(q, boost=1.0):
        """term/phrase/dismax leaf → clause dict (no occur fields yet)."""
        if isinstance(q, BoostQuery):
            return leaf_clause(q.query, boost * q.boost)
        if isinstance(q, TermQuery):
            return {"kind": "term", "key": (q.field, q.term),
                    "boost": boost}
        if isinstance(q, PhraseQuery):
            return {"kind": "phrase",
                    "keys": [(q.field, t) for t in q.terms],
                    "slop": int(q.slop), "boost": boost,
                    "matcher": q.matcher,
                    "positions": (list(q.positions)
                                  if q.positions is not None else None)}
        if isinstance(q, MultiPhraseQuery):
            return {"kind": "multiphrase",
                    "slots": [[(q.field, t) for t in slot]
                              for slot in q.slots],
                    "slop": int(q.slop), "boost": boost}
        if isinstance(q, SPAN_NODES):
            return _span_leaf(q, boost)
        if isinstance(q, IntervalQuery):
            return _interval_leaf(q, boost)
        if isinstance(q, DisjunctionMaxQuery):
            children = []
            for d in q.disjuncts:
                c = leaf_clause(d, 1.0)
                if c["kind"] not in ("term", "phrase", "multiphrase",
                                     "span", "spantree", "interval"):
                    # dismax of nested booleans → recursive tree plan
                    raise ValueError("flat dismax disjuncts must be leaves")
                children.append(c)
            return {"kind": "dismax", "children": children,
                    "tie": float(q.tie_breaker), "boost": boost}
        raise ValueError(f"unsupported leaf {q!r}")

    def add_group(q, scoring, boost=1.0):
        """MUST/FILTER clause → one match-group; pure-OR boolean
        members each become a scoring member of the same group."""
        if isinstance(q, BoostQuery):
            add_group(q.query, scoring, boost * q.boost)
            return
        if isinstance(q, BooleanQuery):
            inner = q.grouped()
            pure_should = (not inner[Occur.MUST] and not inner[Occur.MUST_NOT]
                           and not inner[Occur.FILTER]
                           and q.min_should_match <= 1)
            if not pure_should:
                raise ValueError(
                    "kernel supports one nesting level: MUST/NOT of a "
                    "pure-OR group")
            members = [leaf_clause(x, boost) for x in inner[Occur.SHOULD]]
        else:
            members = [leaf_clause(q, boost)]
        gi = len(groups)
        for m in members:
            m.update(scoring=scoring, group=gi, should=False)
        groups.append(members)

    if isinstance(query, (TermQuery, PhraseQuery, MultiPhraseQuery,
                          BoostQuery, DisjunctionMaxQuery,
                          IntervalQuery) + SPAN_NODES):
        c = leaf_clause(query, boost_all)
        c.update(scoring=True, group=None, should=True)
        shoulds.append(c)
    elif isinstance(query, BooleanQuery):
        msm = query.min_should_match
        for cl in query.clauses:
            q = cl.query
            if cl.occur in (Occur.MUST, Occur.FILTER):
                add_group(q, scoring=(cl.occur == Occur.MUST),
                          boost=boost_all)
            elif cl.occur == Occur.SHOULD:
                c = leaf_clause(q, boost_all)
                c.update(scoring=True, group=None, should=True)
                shoulds.append(c)
            else:  # MUST_NOT
                if isinstance(q, BooleanQuery):
                    inner = q.grouped()
                    if (inner[Occur.MUST] or inner[Occur.MUST_NOT]
                            or inner[Occur.FILTER]):
                        raise ValueError("MUST_NOT of a non-pure-OR group")
                    for x in inner[Occur.SHOULD]:
                        must_not.append(leaf_clause(x))
                else:
                    must_not.append(leaf_clause(q))
    else:
        raise ValueError(f"unsupported query {query!r}")

    # clause order: groups (appearance order) then shoulds — the
    # float32 accumulation order the pyoracle replicates
    clauses = [m for g in groups for m in g] + shoulds
    return {"clauses": clauses, "must_not": must_not, "msm": msm,
            "n_groups": len(groups)}


def build_tree(query, boost: float = 1.0):
    """AST → recursive kernel plan node (arbitrary boolean nesting).

    The reference composes scorers recursively
    (`search/Boolean2ScorerSupplier.java:100-127`); here every node
    evaluates to a (match mask, score array) pair over the bucket grid:
    bool nodes AND their MUST/FILTER masks, count SHOULD matches against
    minShouldMatch, and subtract MUST_NOT. Boosts distribute
    multiplicatively into leaf weights (BM25 scores are linear in the
    leaf weight and dismax is positively homogeneous, so the fold is
    exact — `search/BoostQuery.java:34`).

    Node kinds: the same term/phrase leaf dicts the flat plan uses,
    dismax nodes whose children may be ANY node, and
    {"kind": "bool", "must": [...], "filter": [...], "should": [...],
     "must_not": [...], "msm": int}.
    """
    if isinstance(query, BoostQuery):
        return build_tree(query.query, boost * query.boost)
    if isinstance(query, TermQuery):
        return {"kind": "term", "key": (query.field, query.term),
                "boost": boost}
    if isinstance(query, PhraseQuery):
        return {"kind": "phrase",
                "keys": [(query.field, t) for t in query.terms],
                "slop": int(query.slop), "boost": boost,
                "matcher": query.matcher,
                "positions": (list(query.positions)
                              if query.positions is not None else None)}
    if isinstance(query, MultiPhraseQuery):
        return {"kind": "multiphrase",
                "slots": [[(query.field, t) for t in slot]
                          for slot in query.slots],
                "slop": int(query.slop), "boost": boost}
    if isinstance(query, SPAN_NODES):
        return _span_leaf(query, boost)
    if isinstance(query, IntervalQuery):
        return _interval_leaf(query, boost)
    if isinstance(query, DisjunctionMaxQuery):
        return {"kind": "dismax",
                "children": [build_tree(d, boost) for d in query.disjuncts],
                "tie": float(query.tie_breaker)}
    if isinstance(query, BooleanQuery):
        node = {"kind": "bool", "must": [], "filter": [], "should": [],
                "must_not": [], "msm": int(query.min_should_match),
                "const": 0.0, "all_should": 0, "all_must": 0,
                "never": False}
        slot = {Occur.MUST: "must", Occur.FILTER: "filter",
                Occur.SHOULD: "should", Occur.MUST_NOT: "must_not"}
        for cl in query.clauses:
            b = boost if cl.occur in (Occur.MUST, Occur.SHOULD) else 1.0
            # MatchAll/MatchNo clauses fold into node constants instead
            # of leaves (the clause-keyed kernel has no all-docs stream;
            # MatchAllDocsQuery scores its boost — ConstantScore
            # semantics). This is the SimpleQueryParser NOT-wrapper
            # shape: BQ(MUST_NOT x, SHOULD MatchAll).
            inner, bb = cl.query, b
            while isinstance(inner, BoostQuery):
                bb *= inner.boost
                inner = inner.query
            if isinstance(inner, MatchAllQuery):
                if cl.occur is Occur.MUST:
                    node["all_must"] += 1
                    node["const"] += bb
                elif cl.occur is Occur.FILTER:
                    node["all_must"] += 1
                elif cl.occur is Occur.SHOULD:
                    node["all_should"] += 1
                    node["const"] += bb
                else:                       # MUST_NOT all → never matches
                    node["never"] = True
                continue
            if isinstance(inner, MatchNoQuery):
                if cl.occur in (Occur.MUST, Occur.FILTER):
                    node["never"] = True    # required no-match
                continue                    # SHOULD/MUST_NOT no-op
            node[slot[cl.occur]].append(build_tree(cl.query, b))
        return node
    raise ValueError(f"unsupported query in nested plan: {query!r}")


def tree_grounded(node) -> bool:
    """True when the node's match set is bounded by scanned postings —
    the clause-keyed kernel only sees blocks of the plan's keys, so an
    UNGROUNDED node (one whose mask covers docs carrying none of those
    keys, e.g. a NOT-wrapper at the root) must not be evaluated by the
    kernel alone. Nested ungrounded nodes are fine: the parent
    conjunction bounds them."""
    if node["kind"] != "bool":
        if node["kind"] == "dismax":
            return all(tree_grounded(ch) for ch in node["children"])
        return True
    if node.get("never"):
        return True                          # matches nothing — bounded
    if any(tree_grounded(ch)
           for ch in node["must"] + node["filter"]):
        return True
    if node.get("all_must"):
        return False                         # required-everything mask
    need = max(1, node["msm"])
    if node.get("all_should", 0) >= need:
        return False                         # baseline satisfies msm
    return bool(node["should"]) and all(tree_grounded(ch)
                                        for ch in node["should"])


def _leaf_keys(c) -> list:
    """All (field, term) keys under a leaf clause (dismax recurses;
    spantree includes exclude-branch keys — their postings are needed
    for evaluation even though they don't score)."""
    if c["kind"] == "term":
        return [c["key"]]
    if c["kind"] in ("phrase", "span"):
        return list(c["keys"])
    if c["kind"] == "multiphrase":
        return [k for slot in c["slots"] for k in slot]
    if c["kind"] == "spantree":
        return _span_op_keys(c["root"], scoring_only=False)
    if c["kind"] == "interval":
        return _interval_op_keys(c["root"])
    out = []
    for ch in c["children"]:
        out.extend(_leaf_keys(ch))
    return out


def _interval_op_keys(op) -> list:
    """ALL leaf keys of an iv-op tree (postings to fetch)."""
    o = op["op"]
    if o == "iterm":
        return [op["key"]]
    if o == "iblock":
        return list(op["keys"])
    if o in ("iord", "iunord", "ior"):
        return [k for ch in op["children"] for k in _interval_op_keys(ch)]
    if o in ("icontaining", "inotcontaining"):
        return _interval_op_keys(op["big"]) + _interval_op_keys(op["small"])
    if o in ("icontainedby", "inotcontainedby"):
        return _interval_op_keys(op["small"]) + _interval_op_keys(op["big"])
    if o in ("ibefore", "iafter", "ioverlap", "inonoverlap", "iwithin"):
        return _interval_op_keys(op["src"]) + _interval_op_keys(op["ref"])
    return _interval_op_keys(op["child"])    # imaxgaps / imaxwidth


def _interval_required_keys(op) -> list:
    """Keys that MUST exist for the op to emit any interval — the
    presence/death analysis: ordered/unordered/block are conjunctions,
    ior alternatives contribute none, a NOT-side (subtrahend /
    non-containing big) contributes none, but containing/contained-by
    need BOTH sides."""
    o = op["op"]
    if o == "iterm":
        return [op["key"]]
    if o == "iblock":
        return list(op["keys"])
    if o in ("iord", "iunord"):
        return [k for ch in op["children"]
                for k in _interval_required_keys(ch)]
    if o == "ior":
        return []
    if o == "icontaining":
        return (_interval_required_keys(op["big"])
                + _interval_required_keys(op["small"]))
    if o == "inotcontaining":
        return _interval_required_keys(op["big"])
    if o == "icontainedby":
        return (_interval_required_keys(op["small"])
                + _interval_required_keys(op["big"]))
    if o == "inotcontainedby":
        return _interval_required_keys(op["small"])
    if o in ("ibefore", "iafter", "ioverlap", "iwithin"):
        # positive relative filters need BOTH sides to emit anything
        return (_interval_required_keys(op["src"])
                + _interval_required_keys(op["ref"]))
    if o == "inonoverlap":
        return _interval_required_keys(op["src"])
    return _interval_required_keys(op["child"])


def _span_op_keys(op, scoring_only: bool) -> list:
    """Leaf keys of a span-op tree, appearance order. With
    scoring_only=True, snot exclude branches are skipped — the
    reference builds the SimWeight from include terms only
    (SpanNotQuery.java:126-128 extractTermStates)."""
    o = op["op"]
    if o == "sterm":
        return [op["key"]]
    if o in ("sor", "snear"):
        return [k for ch in op["children"]
                for k in _span_op_keys(ch, scoring_only)]
    if o == "snot":
        out = _span_op_keys(op["include"], scoring_only)
        if not scoring_only:
            out += _span_op_keys(op["exclude"], scoring_only)
        return out
    if o in ("scontain", "swithin"):
        # both sides feed the SimWeight (SpanContainQuery
        # extractTermStates collects big AND little)
        return (_span_op_keys(op["big"], scoring_only)
                + _span_op_keys(op["little"], scoring_only))
    return _span_op_keys(op["child"], scoring_only)    # sfirst/sposrange


def _span_required_keys(op) -> list:
    """Keys that MUST be present for the op to produce any span — the
    presence/death analysis (sor alternatives contribute none; snot
    excludes contribute none)."""
    o = op["op"]
    if o == "sterm":
        return [op["key"]]
    if o == "snear":
        return [k for ch in op["children"] for k in _span_required_keys(ch)]
    if o == "sor":
        return []
    if o == "snot":
        return _span_required_keys(op["include"])
    if o in ("scontain", "swithin"):
        # positive filters: no span without both streams emitting
        return (_span_required_keys(op["big"])
                + _span_required_keys(op["little"]))
    return _span_required_keys(op["child"])            # sfirst/sposrange


def _annotate_span_op(op, st):
    """Stats-level simplification of a span-op tree → op or None (the
    op cannot match anywhere: a required leaf has df == 0). Dead sor
    children are dropped; a dead snot exclude leaves plain include
    (SpanNotQuery.java:136-139 — null excludeSpans → includeSpans)."""
    o = op["op"]
    if o == "sterm":
        return op if op["key"] in st else None
    if o == "snear":
        kids = [_annotate_span_op(ch, st) for ch in op["children"]]
        if any(k is None for k in kids):
            return None
        return dict(op, children=kids)
    if o == "sor":
        kids = [x for x in (_annotate_span_op(ch, st)
                            for ch in op["children"]) if x is not None]
        if not kids:
            return None
        return dict(op, children=kids)
    if o == "snot":
        inc = _annotate_span_op(op["include"], st)
        if inc is None:
            return None
        exc = _annotate_span_op(op["exclude"], st)
        if exc is None:
            return inc
        return dict(op, include=inc, exclude=exc)
    if o in ("scontain", "swithin"):
        big = _annotate_span_op(op["big"], st)
        little = _annotate_span_op(op["little"], st)
        if big is None or little is None:
            return None
        return dict(op, big=big, little=little)
    ch = _annotate_span_op(op["child"], st)             # sfirst/sposrange
    return None if ch is None else dict(op, child=ch)


def _tree_keys(node) -> list:
    """All (field, term) keys under a tree node (including MUST_NOT)."""
    if node["kind"] != "bool":
        return _leaf_keys(node) if node["kind"] != "dismax" else [
            k for ch in node["children"] for k in _tree_keys(ch)]
    out = []
    for part in ("must", "filter", "should", "must_not"):
        for ch in node[part]:
            out.extend(_tree_keys(ch))
    return out


def _annotate_leaf(c, st, weights, outer_boost: float = 1.0,
                   sim: str = "bm25"):
    """Attach f32/f64 weights to a term/phrase/dismax leaf, or return
    None if a required key has df == 0 (the clause cannot match). An
    outer boost folds multiplicatively into the weight — exact, because
    scores are linear in the weight and dismax is positively
    homogeneous (BoostQuery.java:34). Non-BM25 similarities carry their
    own per-key values (classic idf / LM collection probability)."""
    kind = c["kind"]
    if kind == "term":
        key = c["key"]
        if key not in st:
            return None
        b = c["boost"] * outer_boost
        w = weights[key]
        if sim in ("classic", "sweetspot"):
            return dict(c, w32=None, w64=b * w["cidf64"])
        if sim == "dfr":
            # the freq/dl-dependent factor (1 − 1/(1+tfn)) < 1, so the
            # per-term constant A·ae IS the impact upper bound too
            return dict(c, w32=None, w64=b * w["dfrw64"])
        if sim == "f2exp":
            # tfln component freq/(freq+s+s·dl/avgdl) < 1 likewise
            return dict(c, w32=None, w64=b * w["f2w64"])
        if sim in ("lmdirichlet", "lmjelinekmercer"):
            return dict(c, w32=None, w64=b, cp64=w["cp64"])
        if sim == "ib":
            # cp64 carries the per-key collection constant (λ here)
            return dict(c, w32=None, w64=b, cp64=w["ibl64"])
        if sim == "dfi":
            return dict(c, w32=None, w64=b, cp64=w["dfir64"])
        if sim == "boolean":
            # BooleanSimilarity.java:38 — score == boost, tf/idf ignored
            return dict(c, w32=None, w64=b)
        return dict(c, w32=float(np.float32(
            np.float32(b) * np.float32(w["idf32"]))),
            w64=b * w["idf64"])
    if kind in ("phrase", "span"):
        if sim != "bm25":
            raise ValueError(
                "phrase/span clauses support the BM25 similarity only")
        keys = c["keys"]
        if not all(k in st for k in keys):
            return None
        b = c["boost"] * outer_boost
        w32 = float(np.float32(np.float32(b) * np.float32(
            sum(np.float32(weights[k]["idf32"]) for k in keys))))
        w64 = b * sum(weights[k]["idf64"] for k in keys)
        return dict(c, w32=w32, w64=w64)
    if kind == "interval":
        # saturation scoring is norm/idf-free (IntervalScorer scores via
        # the score function, never the session Similarity) — the only
        # weight is the boost, which also bounds the score from above:
        # boost × (1 − pivot/(pivot+freq)) < boost for any finite freq
        keys = _interval_required_keys(c["root"])
        if not all(k in st for k in keys):
            return None    # a required interval key is dead
        b = c["boost"] * outer_boost
        return dict(c, w32=float(np.float32(b)), w64=b)
    if kind == "multiphrase":
        if sim != "bm25":
            raise ValueError(
                "phrase/span clauses support the BM25 similarity only")
        # MultiPhraseWeight ctor: one SimScorer over ALL terms' stats →
        # weight = boost × Σ idf, slot-major order (f32 sum order shared
        # with the pyoracle). Engine spec: df == 0 terms are dropped
        # from both the weight and matching; an empty slot kills the
        # clause (pinned in tests/test_multiphrase.py).
        slots = [[k for k in slot if k in st] for slot in c["slots"]]
        if any(not slot for slot in slots):
            return None
        keys = [k for slot in slots for k in slot]
        b = c["boost"] * outer_boost
        w32 = float(np.float32(np.float32(b) * np.float32(
            sum(np.float32(weights[k]["idf32"]) for k in keys))))
        w64 = b * sum(weights[k]["idf64"] for k in keys)
        return dict(c, slots=slots, w32=w32, w64=w64)
    if kind == "spantree":
        if sim != "bm25":
            raise ValueError(
                "phrase/span clauses support the BM25 similarity only")
        root = _annotate_span_op(c["root"], st)
        if root is None:
            return None
        # SpanWeight.buildSimWeight (SpanWeight.java:100-118): one
        # SimScorer over the DISTINCT scoring terms' aggregated stats —
        # weight = boost × Σ idf over distinct include-branch keys
        keys = list(dict.fromkeys(_span_op_keys(root, scoring_only=True)))
        keys = [k for k in keys if k in st]
        if not keys:
            return None
        b = c["boost"] * outer_boost
        w32 = float(np.float32(np.float32(b) * np.float32(
            sum(np.float32(weights[k]["idf32"]) for k in keys))))
        w64 = b * sum(weights[k]["idf64"] for k in keys)
        return dict(c, root=root, w32=w32, w64=w64,
                    required=_span_required_keys(root))
    # dismax — the outer boost folds into each disjunct's weight
    children = []
    for ch in c["children"]:
        ann = _annotate_leaf(ch, st, weights,
                             c.get("boost", 1.0) * outer_boost, sim)
        if ann is not None:
            children.append(ann)
    if not children:
        return None
    return dict(c, children=children)


def _annotate_tree(node, st, weights, sim: str = "bm25"):
    """Weight-annotate a tree plan; → annotated node or None (the node
    cannot match: a required child is dead, or msm exceeds the live
    SHOULD count — the stats-level analog of the rewrite rules)."""
    kind = node["kind"]
    if kind in ("term", "phrase", "multiphrase", "span", "spantree",
                "interval"):
        return _annotate_leaf(node, st, weights, sim=sim)
    if kind == "dismax":
        kids = [_annotate_tree(ch, st, weights, sim)
                for ch in node["children"]]
        kids = [x for x in kids if x is not None]
        if not kids:
            return None
        return dict(node, children=kids)
    if node.get("never"):
        return None
    must, filt, should, mn = [], [], [], []
    for ch in node["must"]:
        a = _annotate_tree(ch, st, weights, sim)
        if a is None:
            return None
        must.append(a)
    for ch in node["filter"]:
        a = _annotate_tree(ch, st, weights, sim)
        if a is None:
            return None
        filt.append(a)
    for ch in node["should"]:
        a = _annotate_tree(ch, st, weights, sim)
        if a is not None:
            should.append(a)
    for ch in node["must_not"]:
        a = _annotate_tree(ch, st, weights, sim)
        if a is not None:
            mn.append(a)
    if (not must and not filt and not should
            and not node.get("all_should") and not node.get("all_must")):
        return None
    if node["msm"] > len(should) + node.get("all_should", 0):
        return None
    return dict(node, must=must, filter=filt, should=should, must_not=mn)


def _key_filter(keys: list[tuple[str, str]]):
    """Pushed-down Parquet predicate for a set of (field, term) keys:
    OR of per-field (field = f AND term IN (...)) conjunctions."""
    byf: dict[str, list[str]] = {}
    for f, t in keys:
        byf.setdefault(f, []).append(t)
    cond = None
    for f, ts in byf.items():
        c = (F.col("field") == f) & F.col("term").isin(ts)
        cond = c if cond is None else (cond | c)
    return cond if cond is not None else F.lit(False)


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
                out, threshold = _score_bucket(grp, spec, threshold, heap)
                if out is not None:
                    yield out
    if buf is not None and len(buf):
        out, threshold = _score_bucket(buf, spec, threshold, heap)
        if out is not None:
            yield out
    # top-k mode: ONE flush of the partition heap — the driver receives
    # at most partitions × k rows, never buckets × k (scale posture)
    if not spec["collect_all"]:
        out = _flush_heap(heap)
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
    # one heap flush per query: driver receives ≤ partitions × k × queries
    for qi, spec in enumerate(specs):
        if spec["collect_all"]:
            continue
        out = _flush_heap(states[qi]["heap"])
        if out is not None:
            out.insert(0, "query_id", np.int32(qi))
            yield out


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


class _BucketData:
    """Lazy per-bucket decode cache: each (field, term) key decodes at
    most once per bucket regardless of how many clauses reference it."""

    __slots__ = ("by_key", "spec", "off", "dec", "decp")

    def __init__(self, grp: pd.DataFrame, spec, off: int):
        self.by_key = {k: g for k, g in grp.groupby(["field", "term"],
                                                    sort=False)}
        self.spec = spec
        self.off = off
        self.dec: dict = {}
        self.decp: dict = {}

    def decode(self, key):
        """(docs, freqs, norms) for the key within the bucket, or None."""
        if key in self.dec:
            return self.dec[key]
        g = self.by_key.get(key)
        if g is None:
            self.dec[key] = None
            return None
        docs_l, freqs_l, norms_l = [], [], []
        for row in g.itertuples(index=False):
            d, f, n = decode_postings_block(row._asdict())
            docs_l.append(d)
            freqs_l.append(f)
            norms_l.append(n)
        docs = np.concatenate(docs_l)
        order = np.argsort(docs, kind="stable")
        out = (docs[order], np.concatenate(freqs_l)[order],
               np.concatenate(norms_l)[order])
        self.dec[key] = out
        return out

    def decode_positions(self, key):
        """(docs, freqs, norms, flat_local_doc, flat_pos) — flat arrays
        repeat the local doc index per occurrence, positions ascending
        within each doc (fully vectorized, no per-doc loop)."""
        if key in self.decp:
            return self.decp[key]
        g = self.by_key.get(key)
        if g is None:
            self.decp[key] = None
            return None
        docs_l, freqs_l, norms_l, pos_l = [], [], [], []
        for row in g.itertuples(index=False):
            r = row._asdict()
            d, f, n = decode_postings_block(r)
            docs_l.append(d)
            freqs_l.append(f)
            norms_l.append(n)
            pos_l.append(decode_positions_flat(r["pos_blob"], f))
        # blocks of one (key, bucket) run are doc-ordered already, but
        # generation seams (incremental appends) may interleave: sort.
        docs = np.concatenate(docs_l)
        freqs = np.concatenate(freqs_l)
        norms = np.concatenate(norms_l)
        order = np.argsort(docs, kind="stable")
        if not np.array_equal(order, np.arange(len(docs))):
            # reorder the flat position stream per block-doc
            lens = freqs
            starts = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            flat = np.concatenate(pos_l) if pos_l else np.zeros(0, np.int64)
            pieces = [flat[starts[i]:starts[i + 1]] for i in order]
            flat = (np.concatenate(pieces) if pieces
                    else np.zeros(0, np.int64))
            docs, freqs, norms = docs[order], freqs[order], norms[order]
        else:
            flat = np.concatenate(pos_l) if pos_l else np.zeros(0, np.int64)
        flat_doc = np.repeat(docs - self.off, freqs)
        out = (docs, freqs, norms, flat_doc, flat)
        self.decp[key] = out
        return out


def _score_bucket(grp: pd.DataFrame, spec, threshold, heap):
    if "tree" in spec:
        return _score_bucket_tree(grp, spec, threshold, heap)
    grid = spec["grid"]
    bucket = int(grp["bucket"].iloc[0])
    off = bucket * grid
    mode = spec["mode"]
    dtype = np.float32 if mode == "f32" else np.float64
    data = _BucketData(grp, spec, off)

    clauses = spec["clauses"]
    n_groups = spec["n_groups"]
    msm = spec["msm"]

    # ---- group-death + bucket-level upper bound (block-max data) ---------
    group_present = [False] * n_groups
    for c in clauses:
        if c["group"] is not None and _clause_present(c, data):
            group_present[c["group"]] = True
    if n_groups and not all(group_present):
        return None, threshold   # a required group is absent from the bucket

    clause_ub = {}
    if spec["prune"]:
        ub = 0.0
        for ci, c in enumerate(clauses):
            u = _clause_bucket_ub(c, data, spec)
            clause_ub[ci] = u
            ub += u
        ub = ub * (1.0 + _UB_EPS) + _UB_EPS
        if not spec["collect_all"] and ub < threshold:
            return None, threshold
        ub_total = ub
    else:
        ub_total = np.inf

    score = np.zeros(grid, dtype=dtype)
    grp_matched = (np.zeros((n_groups, grid), dtype=bool) if n_groups else None)
    need_should = msm > 0 or n_groups == 0
    should_cnt = np.zeros(grid, dtype=np.int16) if need_should else None

    # Block-max skipping (WANDScorer + BlockMaxConjunctionScorer roles):
    # a block may be skipped whenever every doc in it has
    #   blockmax(this clause) + Σ other scoring clauses' bucket max
    # below the current top-k threshold — such a doc can never enter the
    # final top-k, so dropping it from scoring AND from match/msm
    # tracking only removes rows that the driver merge would discard
    # anyway (masks only shrink; surviving docs' scores are exact).
    # MUST_NOT blocks are never skipped (skipping would un-exclude).
    block_skip = spec["prune"] and not spec["collect_all"]

    for ci, c in enumerate(clauses):
        if c["kind"] == "term":
            res = _eval_term(c, data, spec, dtype,
                             skip=block_skip,
                             ub_other=(ub_total - clause_ub.get(ci, 0.0)
                                       if block_skip else 0.0),
                             threshold=threshold)
        elif c["kind"] == "phrase":
            res = _eval_phrase(c, data, spec, dtype)
        elif c["kind"] == "multiphrase":
            res = _eval_multiphrase(c, data, spec, dtype)
        elif c["kind"] == "span":
            res = _eval_span(c, data, spec, dtype)
        elif c["kind"] == "spantree":
            res = _eval_spantree(c, data, spec, dtype)
        elif c["kind"] == "interval":
            res = _eval_interval(c, data, spec, dtype)
        else:
            res = _eval_dismax(c, data, spec, dtype, grid)
        if res is None:
            continue
        idxs, s = res
        if len(idxs) == 0:
            continue
        if c["scoring"]:
            score[idxs] += s.astype(dtype, copy=False)
        if c["group"] is not None:
            grp_matched[c["group"], idxs] = True
        elif c["should"] and should_cnt is not None:
            should_cnt[idxs] += 1

    # must_not exclusion (+ liveDocs tombstones, LeafReader.getLiveDocs)
    excl = None
    doffs = _bucket_deleted(grp, spec, off, grid)
    if doffs is not None:
        excl = np.zeros(grid, dtype=bool)
        excl[doffs] = True
    for c in spec["must_not"]:
        # MUST_NOT excludes the clause's full match set — term, phrase,
        # or dismax (union of disjunct matches; previously dismax under
        # MUST_NOT was silently dropped)
        if c["kind"] == "term":
            d = data.decode(c["key"])
            res = None if d is None else (d[0] - off, None)
        else:
            res = _eval_leaf(c, data, spec, dtype, grid)
        if res is None or len(res[0]) == 0:
            continue
        if excl is None:
            excl = np.zeros(grid, dtype=bool)
        excl[res[0]] = True

    # ---- combine masks ----------------------------------------------------
    if n_groups:
        mask = grp_matched.all(axis=0)
        if msm > 0:
            mask &= should_cnt >= msm
    else:
        mask = should_cnt >= max(1, msm)
    if excl is not None:
        mask &= ~excl
    hit = np.flatnonzero(mask)
    if len(hit) == 0:
        return None, threshold
    return _emit_hits(hit, score, off, spec, threshold, heap)


def _bucket_deleted(grp: pd.DataFrame, spec, off: int, grid: int):
    """In-bucket offsets of tombstoned docs, from whichever carrier the
    index uses: the in-spec sorted array (small delete sets, sliced by
    searchsorted) or the co-located ``del_offsets`` column (per-cell
    bitmap table joined onto the queried blocks — the liveDocs-file
    analog; the driver never sees doc_ids). → int array or None."""
    deleted = spec.get("deleted")
    if deleted is not None and len(deleted):
        lo = int(np.searchsorted(deleted, off))
        hi = int(np.searchsorted(deleted, off + grid))
        if hi > lo:
            return deleted[lo:hi] - off
        return None
    if "del_offsets" in grp.columns:
        v = grp["del_offsets"].iloc[0]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        a = np.asarray(v, dtype=np.int64)
        if len(a):
            return a
    return None


def _emit_hits(hit, score, off, spec, threshold, heap):
    """Shared result emission: exhaustive mode returns the bucket's rows;
    top-k mode only feeds the PARTITION-level heap (nothing is emitted
    per bucket — the kernel flushes the heap once at partition
    exhaustion, bounding driver input to partitions × k rows)."""
    docs_out = hit + off
    scores_out = score[hit]
    if spec["collect_all"]:
        return pd.DataFrame({"doc_id": docs_out,
                             "score": scores_out.astype(np.float64)}), threshold
    # per-bucket top-k (score desc, doc asc) before the heap push
    k = spec["k"]
    if len(hit) > k:
        sel = np.lexsort((docs_out, -scores_out))[:k]
        docs_out, scores_out = docs_out[sel], scores_out[sel]
    threshold = _push_heap(heap, k, scores_out, docs_out, threshold)
    return None, threshold


def _flush_heap(heap):
    """Partition top-k heap → one output frame (or None if empty)."""
    if not heap:
        return None
    return pd.DataFrame({
        "doc_id": np.array([-nd for _, nd in heap], dtype=np.int64),
        "score": np.array([s for s, _ in heap], dtype=np.float64)})


def _eval_leaf(c, data: "_BucketData", spec, dtype, grid):
    """Evaluate a term/phrase/span/dismax leaf → (idxs, scores) or None."""
    if c["kind"] == "term":
        return _eval_term(c, data, spec, dtype)
    if c["kind"] == "phrase":
        return _eval_phrase(c, data, spec, dtype)
    if c["kind"] == "multiphrase":
        return _eval_multiphrase(c, data, spec, dtype)
    if c["kind"] == "span":
        return _eval_span(c, data, spec, dtype)
    if c["kind"] == "spantree":
        return _eval_spantree(c, data, spec, dtype)
    if c["kind"] == "interval":
        return _eval_interval(c, data, spec, dtype)
    return _eval_dismax(c, data, spec, dtype, grid)


def _score_bucket_tree(grp: pd.DataFrame, spec, threshold, heap):
    """Recursive-plan variant of _score_bucket: evaluate the annotated
    tree to a (mask, score) pair over the bucket grid. Pruning is
    bucket-level only (conservative tree upper bound from the block-max
    skylines); per-block skipping inside nested plans is not attempted —
    correctness-safe, costs only pruning efficiency on deep plans."""
    grid = spec["grid"]
    bucket = int(grp["bucket"].iloc[0])
    off = bucket * grid
    dtype = np.float32 if spec["mode"] == "f32" else np.float64
    data = _BucketData(grp, spec, off)
    root = spec["tree"]
    if not _tree_present(root, data):
        return None, threshold
    if spec["prune"] and not spec["collect_all"]:
        ub = _tree_ub(root, data, spec, dtype) * (1.0 + _UB_EPS) + _UB_EPS
        if ub < threshold:
            return None, threshold
    mask, score = _eval_tree(root, data, spec, dtype, grid, scoring=True)
    doffs = _bucket_deleted(grp, spec, off, grid)
    if doffs is not None:
        mask = mask.copy()
        mask[doffs] = False
    hit = np.flatnonzero(mask)
    if len(hit) == 0:
        return None, threshold
    return _emit_hits(hit, score, off, spec, threshold, heap)


def _tree_present(node, data: "_BucketData") -> bool:
    """Cheap dictionary-presence check: can the node match in-bucket?"""
    kind = node["kind"]
    if kind in ("term", "phrase", "multiphrase", "span", "spantree",
                "interval"):
        return _clause_present(node, data)
    if kind == "dismax":
        return any(_tree_present(ch, data) for ch in node["children"])
    if node.get("never"):
        return False
    for ch in node["must"] + node["filter"]:
        if not _tree_present(ch, data):
            return False
    anchored = (node["must"] or node["filter"] or node.get("all_must"))
    if node["should"] or node.get("all_should"):
        n_present = (node.get("all_should", 0)
                     + sum(1 for ch in node["should"]
                           if _tree_present(ch, data)))
        if node["msm"] > 0 and n_present < node["msm"]:
            return False
        if not anchored and n_present == 0:
            return False
    elif not anchored:
        return False
    return True


def _tree_ub(node, data: "_BucketData", spec, dtype) -> float:
    """Conservative max-score upper bound of a tree node in the bucket
    (block-max skylines; FILTER/MUST_NOT contribute nothing)."""
    kind = node["kind"]
    if kind in ("term", "phrase", "multiphrase", "span", "spantree",
                "interval", "dismax"):
        return _leaf_ub(node, data, spec, dtype)
    return (sum(_tree_ub(ch, data, spec, dtype) for ch in node["must"])
            + sum(_tree_ub(ch, data, spec, dtype) for ch in node["should"])
            + node.get("const", 0.0))


def _eval_tree(node, data: "_BucketData", spec, dtype, grid,
               scoring: bool = True):
    """Recursive evaluation → (mask bool[grid], score dtype[grid]);
    score is zeroed outside the mask, so a parent may blindly add it.
    f32 accumulation order (children in appearance order, MUST before
    SHOULD) is replicated by the pure-Python oracle's tree interpreter."""
    kind = node["kind"]
    if kind in ("term", "phrase", "multiphrase", "span", "spantree",
                "interval"):
        if kind == "term":
            res = _eval_term(node, data, spec, dtype)
        elif kind == "phrase":
            res = _eval_phrase(node, data, spec, dtype)
        elif kind == "multiphrase":
            res = _eval_multiphrase(node, data, spec, dtype)
        elif kind == "span":
            res = _eval_span(node, data, spec, dtype)
        elif kind == "interval":
            res = _eval_interval(node, data, spec, dtype)
        else:
            res = _eval_spantree(node, data, spec, dtype)
        mask = np.zeros(grid, dtype=bool)
        score = np.zeros(grid, dtype=dtype)
        if res is not None and len(res[0]):
            idxs, s = res
            mask[idxs] = True
            if scoring:
                score[idxs] = s.astype(dtype, copy=False)
        return mask, score
    if kind == "dismax":
        # max + tie × (sum − max) over matching children (any node kind)
        mx = np.zeros(grid, dtype=dtype)
        sm = np.zeros(grid, dtype=dtype)
        mask = np.zeros(grid, dtype=bool)
        for ch in node["children"]:
            m, s = _eval_tree(ch, data, spec, dtype, grid, scoring)
            mask |= m
            if scoring:
                sm += s                       # s is zero outside m
                np.maximum(mx, s, out=mx)     # scores are >= 0
        score = np.zeros(grid, dtype=dtype)
        if scoring and mask.any():
            idxs = np.flatnonzero(mask)
            tie = dtype(node["tie"])
            score[idxs] = mx[idxs] + tie * (sm[idxs] - mx[idxs])
        return mask, score
    # bool node
    score = np.zeros(grid, dtype=dtype)
    if node.get("never"):
        return np.zeros(grid, dtype=bool), score
    req = None
    for ch in node["must"]:
        m, s = _eval_tree(ch, data, spec, dtype, grid, scoring)
        req = m if req is None else (req & m)
        if scoring:
            score += s
    for ch in node["filter"]:
        m, _ = _eval_tree(ch, data, spec, dtype, grid, False)
        req = m if req is None else (req & m)
    if req is None and node.get("all_must"):
        # MatchAll MUST/FILTER: required-everything (sound only nested
        # under a grounding parent — tree_grounded guards the root)
        req = np.ones(grid, dtype=bool)
    cnt = None
    if node["should"] or node.get("all_should"):
        # MatchAll SHOULD clauses satisfy the counter for every slot
        cnt = np.full(grid, node.get("all_should", 0), dtype=np.int16)
        for ch in node["should"]:
            m, s = _eval_tree(ch, data, spec, dtype, grid, scoring)
            cnt += m
            if scoring:
                score += s
    if req is not None:
        mask = req
        if node["msm"] > 0 and cnt is not None:
            mask = mask & (cnt >= node["msm"])
    elif cnt is not None:
        mask = cnt >= max(1, node["msm"])
    else:
        mask = np.zeros(grid, dtype=bool)
    for ch in node["must_not"]:
        m, _ = _eval_tree(ch, data, spec, dtype, grid, False)
        mask = mask & ~m
    if scoring:
        score[~mask] = 0
        if node.get("const"):
            # MatchAll clauses score their boost on every matching doc
            # (accumulated last, after the children — the pyoracle
            # mirrors this f32 order)
            score[mask] += dtype(node["const"])
    return mask, score


def _clause_present(c, data: _BucketData) -> bool:
    if c["kind"] == "term":
        return c["key"] in data.by_key
    if c["kind"] in ("phrase", "span"):
        return all(k in data.by_key for k in c["keys"])
    if c["kind"] == "multiphrase":
        return all(any(k in data.by_key for k in slot)
                   for slot in c["slots"])
    if c["kind"] == "spantree":
        # required-leaf presence (sor alternatives / snot excludes are
        # optional); conservative — never skips a matchable bucket
        return all(k in data.by_key for k in c["required"])
    if c["kind"] == "interval":
        return all(k in data.by_key
                   for k in _interval_required_keys(c["root"]))
    return any(_clause_present(ch, data) for ch in c["children"])


def _term_w(c, spec, dtype):
    return np.float32(c["w32"]) if dtype is np.float32 else c["w64"]


def _score_freqs(freqs, norms, w, field, spec, dtype, cp=None):
    """Similarity scoring on decoded (freq, norm byte) arrays with
    clause weight w. BM25 in f32 (Lucene-exact order) or f64; classic
    TF-IDF and LMDirichlet in f64 (doc length = decoded norm byte,
    exactly the SimilarityBase norm table)."""
    sim = spec.get("sim", "bm25")
    if sim != "bm25":
        if dtype is np.float32:
            raise ValueError(
                f"similarity {sim!r} supports f64 mode only")
        dl = LENGTH_TABLE[np.asarray(norms, dtype=np.int64)
                          & 0xFF].astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        if sim == "classic":
            # tf(f)=sqrt(f) × queryWeight × 1/sqrt(dl)
            # (TFIDFSimilarity.java:562-566, ClassicSimilarity.java:39-47)
            return w * np.sqrt(f) / np.sqrt(dl)
        if sim == "sweetspot":
            # SweetSpotSimilarity.java: ClassicSimilarity idf with
            # baselineTf (:121 — freq<=min ? base : sqrt(freq+base²−min))
            # and the lengthNorm plateau (:100 — flat 1.0 on [min,max],
            # hyperbolic falloff at steepness s outside it)
            l, h, st_, tb, tm = spec["ss"]
            tf = np.where(f <= tm, tb, np.sqrt(f + tb * tb - tm))
            ln = 1.0 / np.sqrt(
                st_ * (np.abs(dl - l) + np.abs(dl - h) - (h - l)) + 1.0)
            return w * tf * ln
        if sim == "boolean":
            # BooleanSimilarity.java:38 — constant boost per match
            return np.full(len(f), w, dtype=np.float64)
        if sim == "dfr":
            # DFR InB2 (DFRSimilarity.java:149 score path): w carries
            # boost × A × aeTimes1pTfn; tfn = f·log2(1 + c·avgdl/dl)
            # (NormalizationH2.java:53)
            tfn = f * np.log2(1.0 + spec["dfr_c"]
                              * spec["avgdl64"][field] / dl)
            return w * (1.0 - 1.0 / (1.0 + tfn))
        if sim == "f2exp":
            # AxiomaticF2EXP (Axiomatic.java:52): w carries
            # boost × ((N+1)/df)^k; tfln = f/(f + s + s·dl/avgdl)
            s = spec["ax_s"]
            return w * f / (f + s + s * dl / spec["avgdl64"][field])
        if sim == "ib":
            # IB LL-DF-H2 (IBSimilarity.java:105): cp carries λ;
            # tfn shares the H2 normalization (and its c) with DFR
            tfn = f * np.log2(1.0 + spec["dfr_c"]
                              * spec["avgdl64"][field] / dl)
            return w * np.log((tfn + cp) / cp)
        if sim == "dfi":
            # DFI standardized (DFISimilarity.java:61): cp carries the
            # expected rate; clamp at 0 when freq <= expected
            expected = cp * dl
            m = np.maximum((f - expected) / np.sqrt(expected), 0.0)
            return w * np.log2(m + 1.0)
        if sim == "lmjelinekmercer":
            # LMJelinekMercerSimilarity.java:63-69:
            # boost × ln(1 + ((1−λ)·freq/dl) / (λ·cp))
            lam = spec["lam"]
            return w * np.log(1.0 + ((1.0 - lam) * f / dl) / (lam * cp))
        mu = spec["mu"]
        # LMDirichletSimilarity.java:73-77, clamped at 0
        sc = w * (np.log(1.0 + f / (mu * cp)) + np.log(mu / (dl + mu)))
        return np.maximum(sc, 0.0)
    if dtype is np.float32:
        w = np.float32(w)
        ni = spec["cache32"][field][np.asarray(norms, dtype=np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float32)
        return (w - w / (np.float32(1.0) + f * ni))
    dl = LENGTH_TABLE[np.asarray(norms, dtype=np.int64) & 0xFF].astype(np.float64)
    f = np.asarray(freqs, dtype=np.float64)
    k1, b = spec["k1"], spec["b"]
    return w * f / (f + k1 * (1.0 - b + b * dl / spec["avgdl64"][field]))


def _max_impact(imp_freqs, imp_norms, w, field, spec, dtype, cp=None):
    if len(imp_freqs) == 0:
        return 0.0
    if spec.get("sim") == "sweetspot":
        # SweetSpot's lengthNorm is NOT anti-monotone in doc length (it
        # RISES toward the [min,max] plateau), so the pareto skyline's
        # (freq↑, norm↓) guarantee does not bound it — bound with the
        # plateau value ln=1.0 (the global max), monotone in freq only.
        l, h, st_, tb, tm = spec["ss"]
        f = np.asarray(imp_freqs, dtype=np.float64)
        tf = np.where(f <= tm, tb, np.sqrt(f + tb * tb - tm))
        return float(np.max(w * tf))
    s = _score_freqs(np.asarray(imp_freqs, dtype=np.int64),
                     np.asarray(imp_norms, dtype=np.int64),
                     w, field, spec, dtype, cp=cp)
    return float(np.max(s))


def _clause_bucket_ub(c, data: _BucketData, spec) -> float:
    """Float64 upper bound of a FLAT clause's max contribution in the
    bucket (per-block competitive-impact skylines); 0 for non-scoring."""
    if not c.get("scoring", True):
        return 0.0
    dtype = np.float32 if spec["mode"] == "f32" else np.float64
    return _leaf_ub(c, data, spec, dtype)


def _leaf_ub(c, data: _BucketData, spec, dtype) -> float:
    """Upper bound of a term/phrase/dismax leaf (recursing disjuncts)."""
    if c["kind"] == "term":
        g = data.by_key.get(c["key"])
        if g is None:
            return 0.0
        w = _term_w(c, spec, dtype)
        m = 0.0
        for fr, no in zip(g["imp_freqs"], g["imp_norms"]):
            m = max(m, _max_impact(fr, no, w, c["key"][0], spec, dtype,
                                   cp=c.get("cp64")))
        return m
    if c["kind"] in ("phrase", "span"):
        if not _clause_present(c, data):
            return 0.0
        # phrase/span freq <= min term freq in doc; bound by the weight
        # applied at the max min-term impact (cheap, safe bound)
        w = np.float32(c["w32"]) if dtype is np.float32 else c["w64"]
        field = c["keys"][0][0]
        m = 0.0
        g = data.by_key.get(c["keys"][0])
        for fr, no in zip(g["imp_freqs"], g["imp_norms"]):
            m = max(m, _max_impact(fr, no, w, field, spec, dtype))
        return m
    if c["kind"] in ("multiphrase", "spantree", "interval"):
        if not _clause_present(c, data):
            return 0.0
        # BM25 is bounded by the clause weight for ANY freq:
        # f32 w − w/(1+f·ni) < w; f64 w·f/(f+k1(…)) < w — cheap, safe
        return float(c["w32"] if dtype is np.float32 else c["w64"])
    if c["kind"] == "bool":        # dismax child may be a nested bool
        return _tree_ub(c, data, spec, dtype)
    # dismax: max_child_ub + tie * (sum_others_ub)
    ubs = [_leaf_ub(ch, data, spec, dtype) for ch in c["children"]]
    ubs = [u for u in ubs if u > 0.0]
    if not ubs:
        return 0.0
    mx, sm = max(ubs), sum(ubs)
    return mx + c["tie"] * (sm - mx)


def _eval_term(c, data: _BucketData, spec, dtype, skip=False,
               ub_other=0.0, threshold=-np.inf):
    key = c["key"]
    field = key[0]
    w = _term_w(c, spec, dtype)
    if skip and key not in data.dec:
        g = data.by_key.get(key)
        if g is None:
            return None
        # per-block skip: a block whose max possible TOTAL score is below
        # the current threshold cannot contribute a top-k doc
        idx_l, s_l = [], []
        for row in g.itertuples(index=False):
            r = row._asdict()
            bm = _max_impact(r["imp_freqs"], r["imp_norms"], w, field,
                             spec, dtype, cp=c.get("cp64"))
            if (bm + ub_other) * (1.0 + _UB_EPS) + _UB_EPS < threshold:
                continue
            d, f, n = decode_postings_block(r)
            idx_l.append(d - data.off)
            s_l.append(_score_freqs(f, n, w, field, spec, dtype,
                                    cp=c.get("cp64")))
        if not idx_l:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype)
        return np.concatenate(idx_l), np.concatenate(s_l)
    d = data.decode(key)
    if d is None:
        return None
    docs, freqs, norms = d
    return docs - data.off, _score_freqs(freqs, norms, w, field, spec, dtype,
                                         cp=c.get("cp64"))


_POS_SHIFT = np.int64(33)
_POS_PAD = np.int64(512)    # covers adjusted positions down to -(phrase len)
_BIG = np.iinfo(np.int64).max // 4


def _eval_phrase(c, data: _BucketData, spec, dtype):
    """Vectorized exact/sloppy phrase matcher (no per-doc Python).

    Encodes each (local doc, position) occurrence as doc<<33 | (pos+pad);
    for every occurrence p0 of the first term, finds the nearest position
    of each later term to its expected offset via searchsorted and sums
    the displacements — matchLength ≤ slop matches, contributing
    1/(1+matchLength) to the phrase freq (SloppyPhraseMatcher.java:56
    sloppy weight; slop=0 degenerates to ExactPhraseMatcher semantics).
    """
    if not spec["with_positions"]:
        raise ValueError("phrase query requires an index built with positions")
    keys = c["keys"]
    per = []
    for k in keys:
        r = data.decode_positions(k)
        if r is None:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype)
        per.append(r)
    if c.get("matcher") == "lucene":
        return _eval_phrase_lucene(c, per, data, spec, dtype)
    d0, f0, n0, fd0, fp0 = per[0]
    rest = [(p[3], p[4]) for p in per[1:]]
    return _phrase_chain_score((d0, n0, fd0, fp0), rest, c, data, spec,
                               dtype, keys[0][0])


def _eval_phrase_lucene(c, per, data: _BucketData, spec, dtype):
    """FIDELITY sloppy matcher: per-candidate-doc port of Lucene's
    SloppyPhraseMatcher enumeration (search/sloppy_lucene.py — pinned
    against TestSloppyPhraseQuery.java behaviors), selected with
    PhraseQuery(matcher="lucene"). Per-doc Python over the conjunction
    candidates only — the documented trade: exact Lucene freq on
    repeated-term/out-of-order phrases vs the default vectorized
    min-displacement spec."""
    from .sloppy_lucene import sloppy_freq
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype))
    cand = per[0][0]
    for p in per[1:]:
        cand = np.intersect1d(cand, p[0], assume_unique=True)
    if len(cand) == 0:
        return empty
    offs = list(range(len(c["keys"])))
    slop = c.get("slop", 0)
    pf = np.zeros(len(cand), dtype=np.float64)
    for i, doc in enumerate(cand):
        ld = doc - data.off
        lists = []
        for _, _, _, fd, fp in per:
            lo = int(np.searchsorted(fd, ld, side="left"))
            hi = int(np.searchsorted(fd, ld, side="right"))
            lists.append(fp[lo:hi])
        pf[i] = sloppy_freq(offs, lists, slop)
    m = pf > 0
    if not m.any():
        return empty
    d0, _, n0 = per[0][0], per[0][1], per[0][2]
    ni = np.searchsorted(d0, cand[m])
    norms = n0[ni]
    w = np.float32(c["w32"]) if dtype is np.float32 else c["w64"]
    field = c["keys"][0][0]
    idxs = (cand[m] - data.off).astype(np.int64)
    s = _score_freqs(pf[m], norms, w, field, spec, dtype)
    return idxs, s.astype(dtype, copy=False)


def _union_slot(rs):
    """Union a multiphrase slot's decoded postings — (docs, norms,
    flat_docs, flat_pos), flat pairs sorted by (doc, pos); the
    UnionPostingsEnum role (each index position holds one term, so the
    streams are disjoint and the union is a merge, not a dedup)."""
    if len(rs) == 1:
        d, _, n, fd, fp = rs[0]
        return d, n, fd, fp
    fd = np.concatenate([r[3] for r in rs])
    fp = np.concatenate([r[4] for r in rs])
    o = np.lexsort((fp, fd))
    d = np.concatenate([r[0] for r in rs])
    n = np.concatenate([r[2] for r in rs])
    du, ui = np.unique(d, return_index=True)
    return du, n[ui], fd[o], fp[o]


def _eval_multiphrase(c, data: _BucketData, spec, dtype):
    """MultiPhraseQuery (`search/MultiPhraseQuery.java:58`): per slot,
    union the alternative terms' position streams (_union_slot), then
    run the exact/sloppy chain of _eval_phrase unchanged over the
    unioned streams."""
    if not spec["with_positions"]:
        raise ValueError("phrase query requires an index built with positions")
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype))
    slots = []
    for slot in c["slots"]:
        rs = []
        for k in slot:
            r = data.decode_positions(k)
            if r is not None:
                rs.append(r)
        if not rs:
            return empty
        slots.append(_union_slot(rs))
    d0, n0, fd0, fp0 = slots[0]
    rest = [(s[2], s[3]) for s in slots[1:]]
    return _phrase_chain_score((d0, n0, fd0, fp0), rest, c, data, spec,
                               dtype, c["slots"][0][0][0])


def _phrase_chain_score(slot0, rest, c, data, spec, dtype, field):
    """Shared exact/sloppy phrase chain + BM25 scoring over per-slot
    (doc, pos) streams; slot0 = (docs, norms, flat_docs, flat_pos),
    rest = [(flat_docs, flat_pos), …] for slots 1..n−1."""
    slop = c.get("slop", 0)
    # explicit positions (NGramPhraseQuery rewrite / gapped builder):
    # slot i sits at displacement positions[i] - positions[0], not i
    disps = c.get("positions")
    d0, n0, fd0, fp0 = slot0
    if len(fd0) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype)
    base = (fd0 << _POS_SHIFT) + fp0 + _POS_PAD
    tot = np.zeros(len(base), dtype=np.float64)
    for i in range(1, len(rest) + 1):
        fdi, fpi = rest[i - 1]
        if len(fdi) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype)
        arr = (fdi << _POS_SHIFT) + fpi + _POS_PAD
        target = base + ((disps[i] - disps[0]) if disps else i)
        j = np.searchsorted(arr, target)
        jr = np.minimum(j, len(arr) - 1)
        right_ok = (j < len(arr)) & ((arr[jr] >> _POS_SHIFT)
                                     == (target >> _POS_SHIFT))
        right_d = np.where(right_ok, arr[jr] - target, _BIG)
        jl = np.maximum(j - 1, 0)
        left_ok = (j > 0) & ((arr[jl] >> _POS_SHIFT)
                             == (target >> _POS_SHIFT))
        left_d = np.where(left_ok, target - arr[jl], _BIG)
        d_i = np.minimum(right_d, left_d).astype(np.float64)
        d_i[d_i >= _BIG] = np.inf
        tot += d_i
    match = tot <= slop
    if not match.any():
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype)
    wts = 1.0 / (1.0 + tot[match])
    docs_m = fd0[match]
    pf_grid = np.bincount(docs_m, weights=wts, minlength=spec["grid"])
    idxs = np.flatnonzero(pf_grid > 0)
    pf = pf_grid[idxs]
    if slop == 0:
        pf = np.round(pf)       # integral counts, exact
    # norms of matched docs from term0's postings
    norm_grid = np.zeros(spec["grid"], dtype=np.int64)
    norm_grid[d0 - data.off] = n0
    norms = norm_grid[idxs]
    w = np.float32(c["w32"]) if dtype is np.float32 else c["w64"]
    if dtype is np.float32:
        ni = spec["cache32"][field][norms & 0xFF]
        f = pf.astype(np.float32)
        s = (np.float32(w) - np.float32(w) / (np.float32(1.0) + f * ni))
    else:
        dl = LENGTH_TABLE[norms & 0xFF].astype(np.float64)
        f = pf.astype(np.float64)
        k1, b = spec["k1"], spec["b"]
        s = w * f / (f + k1 * (1.0 - b + b * dl / spec["avgdl64"][field]))
    return idxs, s


def _eval_span(c, data: _BucketData, spec, dtype):
    """Vectorized ordered span-near (the NearSpansOrdered.java:36 role).

    One candidate span per occurrence p0 of the FIRST term: each later
    term chains (searchsorted) to its first occurrence STRICTLY AFTER
    the previous link within the same doc; the anchor matches when
    matchLength = (p_last - p0) - (n-1) <= slop, contributing
    1/(1+matchLength) to the span freq (SpanWeight sloppy weight). No
    per-doc Python. Spec shared with pyoracle._span_scores and the SQL
    oracle; divergence from Lucene's minimal-span enumeration on
    overlapping repeats is pinned in tests."""
    if not spec["with_positions"]:
        raise ValueError("span query requires an index built with positions")
    keys = c["keys"]
    slop = c.get("slop", 0)
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype))
    per = []
    for k in keys:
        r = data.decode_positions(k)
        if r is None:
            return empty
        per.append(r)
    d0, f0, n0, fd0, fp0 = per[0]
    if len(fd0) == 0:
        return empty
    base = (fd0 << _POS_SHIFT) + fp0 + _POS_PAD
    cur = base.copy()
    alive = np.ones(len(cur), dtype=bool)
    for i in range(1, len(keys)):
        _, _, _, fdi, fpi = per[i]
        if len(fdi) == 0:
            return empty
        arr = (fdi << _POS_SHIFT) + fpi + _POS_PAD
        j = np.searchsorted(arr, cur + 1, side="left")
        jr = np.minimum(j, len(arr) - 1)
        ok = (j < len(arr)) & ((arr[jr] >> _POS_SHIFT)
                               == (cur >> _POS_SHIFT))
        alive &= ok
        cur = np.where(ok, arr[jr], cur)
    ml = (cur - base).astype(np.float64) - (len(keys) - 1)
    match = alive & (ml <= slop)
    if not match.any():
        return empty
    wts = 1.0 / (1.0 + ml[match])
    docs_m = fd0[match]
    pf_grid = np.bincount(docs_m, weights=wts, minlength=spec["grid"])
    idxs = np.flatnonzero(pf_grid > 0)
    pf = pf_grid[idxs]
    norm_grid = np.zeros(spec["grid"], dtype=np.int64)
    norm_grid[d0 - data.off] = n0
    norms = norm_grid[idxs]
    w = np.float32(c["w32"]) if dtype is np.float32 else c["w64"]
    field = keys[0][0]
    if dtype is np.float32:
        ni = spec["cache32"][field][norms & 0xFF]
        f = pf.astype(np.float32)
        s = (np.float32(w) - np.float32(w) / (np.float32(1.0) + f * ni))
    else:
        dl = LENGTH_TABLE[norms & 0xFF].astype(np.float64)
        f = pf.astype(np.float64)
        k1, b = spec["k1"], spec["b"]
        s = w * f / (f + k1 * (1.0 - b + b * dl / spec["avgdl64"][field]))
    return idxs, s


_SPAN_EMPTY = (np.zeros(0, np.int64), np.zeros(0, np.int64),
               np.zeros(0, np.int64), np.zeros(0, np.int64))


def _span_lexsort(fd, fs, fe, fw):
    order = np.lexsort((fe, fs, fd))
    return fd[order], fs[order], fe[order], fw[order]


def _eval_span_op(op, data: _BucketData):
    """Recursively evaluate a span-op tree within the bucket → flat span
    arrays (fd local doc, fs start, fe end, fw width), lex-sorted by
    (fd, fs, fe). Widths follow the reference: 0 for term spans
    (TermSpans.java:110), pass-through for or/not/first
    (SpanOrQuery.java:360, FilterSpans.java:114), gap sum for ordered
    near (NearSpansOrdered.java:100-119), window extent for unordered
    near (NearSpansUnordered.java:163). Fully vectorized — the same
    doc<<33|pos encoding as the phrase kernel; no per-doc Python."""
    o = op["op"]
    if o == "sterm":
        r = data.decode_positions(op["key"])
        if r is None:
            return _SPAN_EMPTY
        _, _, _, fdoc, fpos = r
        return (fdoc, fpos, fpos + 1, np.zeros(len(fpos), np.int64))
    if o == "sor":
        parts = [_eval_span_op(ch, data) for ch in op["children"]]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _SPAN_EMPTY
        if len(parts) == 1:
            return parts[0]
        fd = np.concatenate([p[0] for p in parts])
        fs = np.concatenate([p[1] for p in parts])
        fe = np.concatenate([p[2] for p in parts])
        fw = np.concatenate([p[3] for p in parts])
        return _span_lexsort(fd, fs, fe, fw)
    if o == "sfirst":
        fd, fs, fe, fw = _eval_span_op(op["child"], data)
        m = fe <= op["end"]
        return fd[m], fs[m], fe[m], fw[m]
    if o == "snot":
        fd, fs, fe, fw = _eval_span_op(op["include"], data)
        if len(fd) == 0:
            return _SPAN_EMPTY
        xd, xs, xe, _ = _eval_span_op(op["exclude"], data)
        if len(xd) == 0:
            return fd, fs, fe, fw
        pre, post = op["pre"], op["post"]
        # reject include span [s,e) iff ∃ exclude with start < e+post AND
        # end > s−pre (SpanNotQuery.java:180-191). Exclude spans sorted by
        # (doc, start); the running max of doc<<33|end over that order
        # stays within the current doc block (earlier docs encode lower),
        # so one searchsorted + one gather answers the window query.
        enc_xs = (xd << _POS_SHIFT) + xs
        runmax_end = np.maximum.accumulate((xd << _POS_SHIFT) + xe)
        j = np.searchsorted(enc_xs, (fd << _POS_SHIFT) + fe + post,
                            side="left")
        thr = (fd << _POS_SHIFT) + np.maximum(fs - pre, 0)
        jr = np.maximum(j - 1, 0)
        rejected = (j > 0) & (runmax_end[jr] > thr)
        keep = ~rejected
        return fd[keep], fs[keep], fe[keep], fw[keep]
    if o == "sposrange":
        fd, fs, fe, fw = _eval_span_op(op["child"], data)
        m = (fs >= op["start"]) & (fe <= op["end"])
        return fd[m], fs[m], fe[m], fw[m]
    if o in ("scontain", "swithin"):
        bd, bs, be, bw = _eval_span_op(op["big"], data)
        ld, ls, le, lw = _eval_span_op(op["little"], data)
        if len(bd) == 0 or len(ld) == 0:
            return _SPAN_EMPTY
        if o == "scontain":
            # keep big [S,E) with ∃ little s≥S, e≤E. Littles sorted by
            # (doc, start); any little with s > E has e > E, so the
            # suffix-min of doc-encoded ends from the first little with
            # s ≥ S answers "min end among s ≥ S" — later docs encode
            # HIGHER and cannot lower a same-doc min below threshold
            enc_ls = (ld << _POS_SHIFT) + ls
            sufmin = np.minimum.accumulate(
                ((ld << _POS_SHIFT) + le)[::-1])[::-1]
            j = np.searchsorted(enc_ls, (bd << _POS_SHIFT) + bs,
                                side="left")
            jr = np.minimum(j, len(enc_ls) - 1)
            ok = (j < len(enc_ls)) & (sufmin[jr]
                                      <= (bd << _POS_SHIFT) + be)
            return bd[ok], bs[ok], be[ok], bw[ok]
        # swithin: keep little [s,e) with ∃ big S≤s, E≥e. Prefix-max of
        # doc-encoded big ends over start order; earlier docs encode
        # LOWER than the little's threshold, so no cross-doc leak
        enc_bs = (bd << _POS_SHIFT) + bs
        prefmax = np.maximum.accumulate((bd << _POS_SHIFT) + be)
        j = np.searchsorted(enc_bs, (ld << _POS_SHIFT) + ls,
                            side="right") - 1
        jr = np.maximum(j, 0)
        ok = (j >= 0) & (prefmax[jr] >= (ld << _POS_SHIFT) + le)
        return ld[ok], ls[ok], le[ok], lw[ok]
    # snear
    kids = [_eval_span_op(ch, data) for ch in op["children"]]
    if any(len(k[0]) == 0 for k in kids):
        return _SPAN_EMPTY
    fd0, fs0, fe0, _ = kids[0]
    if op["ordered"]:
        # greedy chain: child i advances to its first span with
        # start >= previous end (NearSpansOrdered.advancePosition);
        # matchWidth accumulates the gaps
        cur_end = fe0.copy()
        width = np.zeros(len(fd0), np.int64)
        alive = np.ones(len(fd0), dtype=bool)
        for fdi, fsi, fei, _ in kids[1:]:
            enc = (fdi << _POS_SHIFT) + fsi
            j = np.searchsorted(enc, (fd0 << _POS_SHIFT) + cur_end,
                                side="left")
            jr = np.minimum(j, len(enc) - 1)
            ok = (j < len(enc)) & (fdi[jr] == fd0)
            alive &= ok
            width = np.where(ok, width + fsi[jr] - cur_end, width)
            cur_end = np.where(ok, fei[jr], cur_end)
        m = alive & (width <= op["slop"])
        return _span_lexsort(fd0[m], fs0[m], cur_end[m], width[m])
    # unordered: per anchor span of child 0, each other child
    # contributes its span NEAREST by start; the window matches when
    # extent − Σ span lengths ≤ slop (NearSpansUnordered.atMatch);
    # width = extent (NearSpansUnordered.width)
    win_s, win_e = fs0.copy(), fe0.copy()
    total_len = fe0 - fs0
    alive = np.ones(len(fd0), dtype=bool)
    enc0 = (fd0 << _POS_SHIFT) + fs0
    for fdi, fsi, fei, _ in kids[1:]:
        enc = (fdi << _POS_SHIFT) + fsi
        j = np.searchsorted(enc, enc0, side="left")
        jr = np.minimum(j, len(enc) - 1)
        right_ok = (j < len(enc)) & (fdi[jr] == fd0)
        right_d = np.where(right_ok, fsi[jr] - fs0, _BIG)
        jl = np.maximum(j - 1, 0)
        left_ok = (j > 0) & (fdi[jl] == fd0)
        left_d = np.where(left_ok, fs0 - fsi[jl], _BIG)
        take_left = left_d < right_d
        sel = np.where(take_left, jl, jr)
        ok = left_ok | right_ok
        alive &= ok
        s_i, e_i = fsi[sel], fei[sel]
        win_s = np.where(ok, np.minimum(win_s, s_i), win_s)
        win_e = np.where(ok, np.maximum(win_e, e_i), win_e)
        total_len = np.where(ok, total_len + e_i - s_i, total_len)
    m = alive & ((win_e - win_s - total_len) <= op["slop"])
    return _span_lexsort(fd0[m], win_s[m], win_e[m], (win_e - win_s)[m])


def _eval_spantree(c, data: _BucketData, spec, dtype):
    """Composite span query (spantree leaf): evaluate the span-op tree,
    then score freq(doc) = Σ 1/(1+width) over its spans with the BM25
    weight over the distinct scoring terms (SpanScorer.java:106-112
    setFreqCurrentDoc / scoreCurrentDoc)."""
    if not spec["with_positions"]:
        raise ValueError("span query requires an index built with positions")
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype))
    fd, fs, fe, fw = _eval_span_op(c["root"], data)
    if len(fd) == 0:
        return empty
    wts = 1.0 / (1.0 + fw.astype(np.float64))
    pf_grid = np.bincount(fd, weights=wts, minlength=spec["grid"])
    idxs = np.flatnonzero(pf_grid > 0)
    pf = pf_grid[idxs]
    # norms: gather per doc from leaf postings. Under FieldMaskingSpan
    # the scoring field is the MASK — leaves of the scoring field write
    # LAST (deterministic precedence), so any matched doc carrying a
    # native leaf scores with the mask field's norm byte exactly as
    # Lucene does; a doc matched ONLY through masked branches (possible
    # under sor unions) keeps the wrapped field's byte — the pinned
    # divergence envelope (_span_leaf raises on fully-masked trees).
    norm_grid = np.zeros(spec["grid"], dtype=np.int64)
    keys_ordered = sorted(_span_op_keys(c["root"], scoring_only=False),
                          key=lambda k: k[0] == c["field"])
    for key in keys_ordered:
        d = data.decode(key)
        if d is not None:
            norm_grid[d[0] - data.off] = d[2]
    norms = norm_grid[idxs]
    w = np.float32(c["w32"]) if dtype is np.float32 else c["w64"]
    field = c["field"]
    if dtype is np.float32:
        ni = spec["cache32"][field][norms & 0xFF]
        f = pf.astype(np.float32)
        s = (np.float32(w) - np.float32(w) / (np.float32(1.0) + f * ni))
    else:
        dl = LENGTH_TABLE[norms & 0xFF].astype(np.float64)
        f = pf.astype(np.float64)
        k1, b = spec["k1"], spec["b"]
        s = w * f / (f + k1 * (1.0 - b + b * dl / spec["avgdl64"][field]))
    return idxs, s


_IV_EMPTY = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.int64), np.zeros(0, np.int64))


def _iv_minimalize(fd, fs, fe, fl):
    """Canonical minimal-interval filter: drop every interval that
    (non-strictly) contains another enumerated interval. Input need not
    be sorted; output sorted by (doc, start) with starts AND ends
    strictly increasing within each doc — the invariant every iv-op
    relies on."""
    if len(fd) == 0:
        return _IV_EMPTY
    # sort (doc, start asc, end asc, Σwidths desc): equal envelopes
    # keep the MAX child-width sum (fewest gaps — deterministic fl when
    # the same envelope arises from different child combos)
    order = np.lexsort((-fl, fe, fs, fd))
    fd, fs, fe, fl = fd[order], fs[order], fe[order], fl[order]
    # same (doc, start): keep the smallest end
    ks = np.ones(len(fd), dtype=bool)
    ks[1:] = (fd[1:] != fd[:-1]) | (fs[1:] != fs[:-1])
    fd, fs, fe, fl = fd[ks], fs[ks], fe[ks], fl[ks]
    # drop i when a LATER start in the same doc closes at e ≤ e_i: the
    # suffix min of doc<<33|end answers the window query in one pass
    # (later docs encode strictly larger, so cross-doc minima are inert)
    enc_e = (fd << _POS_SHIFT) + fe
    sufmin = np.minimum.accumulate(enc_e[::-1])[::-1]
    keep = np.ones(len(fd), dtype=bool)
    keep[:-1] = enc_e[:-1] < sufmin[1:]
    return fd[keep], fs[keep], fe[keep], fl[keep]


def _iv_combine_ordered(left, right):
    """One fold step of minimal ORDERED intervals
    (OrderedIntervalsSource.java:133-165 restated): for every right
    interval j, the tightest left interval strictly before it (largest
    end < right start — in a minimal stream largest end ⇔ largest
    start); keeping the FIRST right per chosen left then yields exactly
    the minimal set. Carries fl = Σ child actual widths for gaps()."""
    ld, ls, le, ll = left
    rd, rs, re, rl = right
    if len(ld) == 0 or len(rd) == 0:
        return _IV_EMPTY
    enc_le = (ld << _POS_SHIFT) + le
    tgt = (rd << _POS_SHIFT) + rs
    i = np.searchsorted(enc_le, tgt, side="left") - 1
    ir = np.maximum(i, 0)
    ok = (i >= 0) & (ld[ir] == rd)
    if not ok.any():
        return _IV_EMPTY
    ii = ir[ok]
    fd, fs, fe = rd[ok], ls[ii], re[ok]
    fl = ll[ii] + rl[ok]
    # rights are sorted by (doc, start) → ii is non-decreasing within a
    # doc; the first right per (doc, left) is the minimal one
    first = np.ones(len(fd), dtype=bool)
    first[1:] = (fd[1:] != fd[:-1]) | (ii[1:] != ii[:-1])
    return fd[first], fs[first], fe[first], fl[first]


def _iv_combine_unordered(left, right):
    """Minimal UNORDERED intervals of two sources
    (UnorderedIntervalsSource.java queue semantics, overlaps allowed):
    candidates anchor each stream's interval to the other stream's
    tightest preceding-or-equal start, both directions, then the
    generic minimality filter removes dominated envelopes."""
    ld, ls, le, ll = left
    rd, rs, re, rl = right
    if len(ld) == 0 or len(rd) == 0:
        return _IV_EMPTY
    outs = []
    for (ad, as_, ae, al), (bd, bs, be, bl) in (
            ((ld, ls, le, ll), (rd, rs, re, rl)),
            ((rd, rs, re, rl), (ld, ls, le, ll))):
        # for each b interval: the a with the largest start ≤ b start
        enc_as = (ad << _POS_SHIFT) + as_
        tgt = (bd << _POS_SHIFT) + bs
        i = np.searchsorted(enc_as, tgt, side="right") - 1
        ir = np.maximum(i, 0)
        ok = (i >= 0) & (ad[ir] == bd)
        if not ok.any():
            continue
        ii = ir[ok]
        outs.append((bd[ok], as_[ii], np.maximum(ae[ii], be[ok]),
                     al[ii] + bl[ok]))
    if not outs:
        return _IV_EMPTY
    fd = np.concatenate([o[0] for o in outs])
    fs = np.concatenate([o[1] for o in outs])
    fe = np.concatenate([o[2] for o in outs])
    fl = np.concatenate([o[3] for o in outs])
    return _iv_minimalize(fd, fs, fe, fl)


def _eval_interval_op(op, data: _BucketData):
    """Recursively evaluate an iv-op tree within the bucket → flat
    interval arrays (fd local doc, fs start, fe INCLUSIVE end, fl = Σ
    child actual widths), sorted by (fd, fs) with the minimal-stream
    invariant (starts and ends strictly increasing per doc). Fully
    vectorized — no per-doc Python."""
    o = op["op"]
    if o == "iterm":
        r = data.decode_positions(op["key"])
        if r is None:
            return _IV_EMPTY
        _, _, _, fdoc, fpos = r
        return (fdoc, fpos, fpos, np.ones(len(fpos), np.int64))
    if o == "iblock":
        # contiguous run (BlockIntervalsSource): term i exactly at
        # anchor + i — the exact-phrase membership chain
        per = []
        for k in op["keys"]:
            r = data.decode_positions(k)
            if r is None:
                return _IV_EMPTY
            per.append(r)
        _, _, _, fd0, fp0 = per[0]
        if len(fd0) == 0:
            return _IV_EMPTY
        enc0 = (fd0 << _POS_SHIFT) + fp0
        alive = np.ones(len(enc0), dtype=bool)
        for i in range(1, len(op["keys"])):
            _, _, _, fdi, fpi = per[i]
            if len(fdi) == 0:
                return _IV_EMPTY
            enc = (fdi << _POS_SHIFT) + fpi
            j = np.searchsorted(enc, enc0 + i, side="left")
            jr = np.minimum(j, len(enc) - 1)
            alive &= (j < len(enc)) & (enc[jr] == enc0 + i)
        k = len(op["keys"])
        fd, fs = fd0[alive], fp0[alive]
        return (fd, fs, fs + (k - 1), np.full(len(fd), k, np.int64))
    if o == "iord":
        cur = _eval_interval_op(op["children"][0], data)
        for ch in op["children"][1:]:
            cur = _iv_combine_ordered(cur, _eval_interval_op(ch, data))
            if len(cur[0]) == 0:
                return _IV_EMPTY
        return cur
    if o == "iunord":
        return _iv_combine_unordered(
            _eval_interval_op(op["children"][0], data),
            _eval_interval_op(op["children"][1], data))
    if o == "ior":
        parts = [_eval_interval_op(ch, data) for ch in op["children"]]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _IV_EMPTY
        if len(parts) == 1:
            return parts[0]
        return _iv_minimalize(np.concatenate([p[0] for p in parts]),
                              np.concatenate([p[1] for p in parts]),
                              np.concatenate([p[2] for p in parts]),
                              np.concatenate([p[3] for p in parts]))
    if o in ("icontaining", "inotcontaining"):
        fd, fs, fe, fl = _eval_interval_op(op["big"], data)
        if len(fd) == 0:
            return _IV_EMPTY
        sd, ss, se, _ = _eval_interval_op(op["small"], data)
        if len(sd) == 0:
            ok = np.zeros(len(fd), dtype=bool)
        else:
            # ∃ small with start ≥ big.start and end ≤ big.end: smalls
            # sorted by (doc, start); the suffix min of doc<<33|end over
            # that order answers the 2-sided window in one searchsorted
            enc_ss = (sd << _POS_SHIFT) + ss
            sufmin = np.minimum.accumulate(
                ((sd << _POS_SHIFT) + se)[::-1])[::-1]
            i = np.searchsorted(enc_ss, (fd << _POS_SHIFT) + fs,
                                side="left")
            ir = np.minimum(i, len(enc_ss) - 1)
            ok = (i < len(enc_ss)) & (sufmin[ir]
                                      <= (fd << _POS_SHIFT) + fe)
        m = ok if o == "icontaining" else ~ok
        return fd[m], fs[m], fe[m], fl[m]
    if o in ("icontainedby", "inotcontainedby"):
        fd, fs, fe, fl = _eval_interval_op(op["small"], data)
        if len(fd) == 0:
            return _IV_EMPTY
        bd, bs, be, _ = _eval_interval_op(op["big"], data)
        if len(bd) == 0:
            ok = np.zeros(len(fd), dtype=bool)
        else:
            # ∃ big with start ≤ small.start and end ≥ small.end: bigs
            # sorted by (doc, start); prefix max of doc<<33|end
            enc_bs = (bd << _POS_SHIFT) + bs
            prefmax = np.maximum.accumulate((bd << _POS_SHIFT) + be)
            i = np.searchsorted(enc_bs, (fd << _POS_SHIFT) + fs,
                                side="right") - 1
            ir = np.maximum(i, 0)
            ok = (i >= 0) & (prefmax[ir] >= (fd << _POS_SHIFT) + fe)
        m = ok if o == "icontainedby" else ~ok
        return fd[m], fs[m], fe[m], fl[m]
    if o in ("ibefore", "iafter"):
        fd, fs, fe, fl = _eval_interval_op(op["src"], data)
        if len(fd) == 0:
            return _IV_EMPTY
        rd, rs, re, _ = _eval_interval_op(op["ref"], data)
        if len(rd) == 0:
            return _IV_EMPTY
        if o == "ibefore":
            # ∃ ref with start > s.end ⟺ s.end < per-doc MAX ref start;
            # starts increase per doc → the doc's LAST ref row carries it
            i = np.searchsorted(rd, fd, side="right") - 1
            ir = np.maximum(i, 0)
            ok = (i >= 0) & (rd[ir] == fd) & (fe < rs[ir])
        else:
            # ∃ ref with end < s.start ⟺ s.start > per-doc MIN ref end;
            # ends increase per doc → the doc's FIRST ref row carries it
            i = np.searchsorted(rd, fd, side="left")
            ir = np.minimum(i, len(rd) - 1)
            ok = (i < len(rd)) & (rd[ir] == fd) & (fs > re[ir])
        return fd[ok], fs[ok], fe[ok], fl[ok]
    if o in ("ioverlap", "inonoverlap"):
        fd, fs, fe, fl = _eval_interval_op(op["src"], data)
        if len(fd) == 0:
            return _IV_EMPTY
        rd, rs, re, _ = _eval_interval_op(op["ref"], data)
        pos = op["positions"]
        if len(rd) == 0:
            ok = np.zeros(len(fd), dtype=bool)
        else:
            # overlap with refs extended ±pos: rs−pos ≤ s.end AND
            # re+pos ≥ s.start. Refs sorted by (doc, start) with ends
            # increasing per doc (minimal stream): the prefix of refs
            # with start ≤ s.end+pos has its max end at its LAST row
            i = np.searchsorted((rd << _POS_SHIFT) + rs,
                                (fd << _POS_SHIFT) + fe + pos,
                                side="right") - 1
            ir = np.maximum(i, 0)
            ok = (i >= 0) & (rd[ir] == fd) & (re[ir] >= fs - pos)
        if o == "inonoverlap":
            ok = ~ok
        return fd[ok], fs[ok], fe[ok], fl[ok]
    if o == "iwithin":
        fd, fs, fe, fl = _eval_interval_op(op["src"], data)
        if len(fd) == 0:
            return _IV_EMPTY
        rd, rs, re, _ = _eval_interval_op(op["ref"], data)
        pos = op["positions"]
        if len(rd) == 0:
            return _IV_EMPTY
        # containedBy vs refs extended ±pos: the icontainedby sweep with
        # shifted bounds; threshold floors at the doc base so a previous
        # doc's prefix-max can never leak in
        enc_rs = (rd << _POS_SHIFT) + rs
        prefmax = np.maximum.accumulate((rd << _POS_SHIFT) + re)
        i = np.searchsorted(enc_rs, (fd << _POS_SHIFT) + fs + pos,
                            side="right") - 1
        ir = np.maximum(i, 0)
        thr = (fd << _POS_SHIFT) + np.maximum(fe - pos, 0)
        ok = (i >= 0) & (prefmax[ir] >= thr)
        return fd[ok], fs[ok], fe[ok], fl[ok]
    fd, fs, fe, fl = _eval_interval_op(op["child"], data)
    if len(fd) == 0:
        return _IV_EMPTY
    if o == "imaxgaps":
        m = (fe - fs + 1 - fl) <= op["gaps"]
    else:    # imaxwidth
        m = (fe - fs + 1) <= op["width"]
    return fd[m], fs[m], fe[m], fl[m]


def _eval_interval(c, data: _BucketData, spec, dtype):
    """IntervalQuery leaf: freq(doc) = Σ 1/max(length − minExtent + 1, 1)
    over the enumerated minimal intervals (IntervalScorer.java:66-72),
    score = boost × (1 − pivot/(pivot + freq))
    (IntervalScoreFunction.java:69-73 SaturationFunction). Norm-free —
    the session similarity is never consulted. Engine spec: freq is
    accumulated in f64 (bincount); the f32 mode applies the saturation
    in float32 on the f64 freq (Lucene accumulates freq itself in f32 —
    divergence is below the 4-decimal gate and pinned in tests)."""
    if not spec["with_positions"]:
        raise ValueError(
            "interval query requires an index built with positions")
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=dtype))
    fd, fs, fe, fl = _eval_interval_op(c["root"], data)
    if len(fd) == 0:
        return empty
    me = c["root"]["min_extent"]
    contrib = 1.0 / np.maximum((fe - fs + 1) - me + 1, 1).astype(np.float64)
    pf_grid = np.bincount(fd, weights=contrib, minlength=spec["grid"])
    idxs = np.flatnonzero(pf_grid > 0)
    freq = pf_grid[idxs]
    pivot = c["pivot"]
    if dtype is np.float32:
        w = np.float32(c["w32"])
        p = np.float32(pivot)
        f = freq.astype(np.float32)
        s = w * (np.float32(1.0) - p / (p + f))
    else:
        s = c["w64"] * (1.0 - pivot / (pivot + freq))
    return idxs, s


def _eval_dismax(c, data: _BucketData, spec, dtype, grid):
    """DisjunctionMaxQuery: score = max + tie × (sum − max) over matching
    disjuncts (DisjunctionMaxQuery.java:51,61). Disjuncts may be any
    leaf kind — term, phrase, or nested dismax."""
    mx = np.zeros(grid, dtype=dtype)
    sm = np.zeros(grid, dtype=dtype)
    matched = np.zeros(grid, dtype=bool)
    any_child = False
    for ch in c["children"]:
        res = _eval_leaf(ch, data, spec, dtype, grid)
        if res is None:
            continue
        idxs, s = res
        if len(idxs) == 0:
            continue
        any_child = True
        sm[idxs] += s.astype(dtype, copy=False)
        np.maximum.at(mx, idxs, s.astype(dtype, copy=False))
        matched[idxs] = True
    if not any_child:
        return None
    idxs = np.flatnonzero(matched)
    tie = dtype(c["tie"])
    s = mx[idxs] + tie * (sm[idxs] - mx[idxs])
    return idxs, s
