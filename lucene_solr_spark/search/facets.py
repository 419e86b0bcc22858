"""Faceting over a match set: field, range, and pivot facets.

References (semantics only):
- `lucene/facet/src/java/org/apache/lucene/facet/FacetsCollector.java:40`
  — facets count over the docs matched by a query, not the whole corpus.
- `facet/SortedSetDocValuesFacetCounts` / Solr `facet.field` — counts
  per distinct value of a docvalue field.
- `facet/range/LongRangeFacetCounts.java:40` and `range/LongRange.java`
  — fixed ranges [min, max) with inclusive/exclusive ends; a doc counts
  in every range containing its value.
- Solr `facet.pivot` (org.apache.solr.handler.component.FacetComponent)
  — hierarchical value1→value2 counts, depth-first, pruned by mincount.

Spark shape: the match set (doc_id) semi-joins the docvalue table, then
one map-side-combined groupBy per facet — counts never leave the
executors until the final (tiny) per-value frame. Range membership is a
CASE expression evaluated in whole-stage codegen, so a range facet costs
one narrow projection + one agg, independent of range count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _matched(docs: DataFrame, matches: DataFrame | None) -> DataFrame:
    if matches is None:
        return docs
    return docs.join(matches.select("doc_id").distinct(), "doc_id",
                     "left_semi")


def facet_counts(docs: DataFrame, matches: DataFrame | None,
                 field: str, min_count: int = 1) -> DataFrame:
    """Per-value doc counts of ``field`` over the match set →
    (value, count), descending count then value (the facet module's
    top-children order, FacetResult.labelValues)."""
    return (_matched(docs, matches)
            .groupBy(F.col(field).alias("value"))
            .agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("value")))


def facet_field_params(docs: DataFrame, matches: DataFrame | None,
                       field: str, prefix: str | None = None,
                       mincount: int = 1, limit: int = 100,
                       offset: int = 0, sort: str = "count",
                       missing: bool = False) -> DataFrame:
    """The classic Solr facet.field parameter block
    (`solr/core/src/java/org/apache/solr/request/SimpleFacets.java:432`):
    facet.prefix filters values BEFORE pagination, facet.mincount prunes,
    facet.sort is "count" (count desc, value asc) or "index" (value asc),
    facet.offset/facet.limit paginate the sorted buckets, and
    facet.missing appends one NULL-valued bucket counting docs WITHOUT
    the field — after pagination, exempt from mincount and prefix
    (SimpleFacets.java:748 adds it unconditionally).

    One map-side-combined groupBy; prefix becomes a pushed startswith on
    the grouped values; the missing count is a second tiny agg over the
    same match set. Driver sees ≤ limit+1 rows."""
    if sort not in ("count", "index"):
        raise ValueError("facet.sort must be 'count' or 'index'")
    m = _matched(docs, matches)
    base = m.filter(F.col(field).isNotNull())
    if prefix is not None:
        base = base.filter(F.col(field).startswith(prefix))
    counts = (base.groupBy(F.col(field).cast("string").alias("value"))
              .agg(F.count(F.lit(1)).alias("count"))
              .filter(F.col("count") >= mincount))
    if sort == "count":
        counts = counts.orderBy(F.desc("count"), F.asc("value"))
    else:
        counts = counts.orderBy(F.asc("value"))
    page = counts.offset(offset).limit(limit) if offset else \
        counts.limit(limit)
    if missing:
        miss = (m.agg(F.sum(F.when(F.col(field).isNull(), 1).otherwise(0))
                      .cast("long").alias("count"))
                .select(F.lit(None).cast("string").alias("value"), "count"))
        page = page.unionByName(miss)
    return page


def relatedness_facets(docs: DataFrame, fg_matches: DataFrame,
                       bg_matches: DataFrame | None, field: str,
                       mincount: int = 1, limit: int = 20) -> DataFrame:
    """JSON-facet ``relatedness(fg, bg)`` — Solr's Semantic Knowledge
    Graph edge scoring (`solr/core/src/java/org/apache/solr/search/facet/
    RelatednessAgg.java:699`; Grainger et al. 2016, arXiv:1609.00464
    "Scoring Semantic Relationships").

    Per bucket of ``field`` over the FOREGROUND match set:
    an approximated z-score of the foreground count against the
    background probability, squashed by the reference's 5-sigmoid blend

        z = (fg_count − fg_size·p) / sqrt(fg_size·p·(1−p)),
        p = bg_count / bg_size
        relatedness = Σ 0.2·sig(z, off, scale) for
                      (off, scale) ∈ {(−80,50),(−30,30),(0,30),(30,30),(80,50)}
        sig(x, o, s) = (x+o) / (s + |x+o|)

    fg_pop / bg_pop = count/bg_size, all three rounded to 5 digits with
    Java ``Math.round`` semantics (floor(x·1e5 + 0.5)/1e5 — NOT Spark's
    HALF_UP, which differs on negative values).

    Spark shape: two map-side-combined groupBys (fg buckets, bg buckets)
    + a broadcast-sized outer join on the bucket value; the z-score and
    sigmoid blend are one codegen projection. At 100 TB the corpus is
    read twice (fg is usually a pushed filter of bg) and nothing wider
    than the bucket table ever shuffles."""
    bg = _matched(docs, bg_matches)
    fg = _matched(docs, fg_matches)
    fg_size = fg.count()
    bg_size = bg.count()
    fgc = (fg.filter(F.col(field).isNotNull())
           .groupBy(F.col(field).cast("string").alias("value"))
           .agg(F.count(F.lit(1)).alias("fg_count")))
    bgc = (bg.filter(F.col(field).isNotNull())
           .groupBy(F.col(field).cast("string").alias("value"))
           .agg(F.count(F.lit(1)).alias("bg_count")))
    j = (bgc.join(fgc, "value", "left")
         .select("value", F.coalesce("fg_count", F.lit(0)).alias("fg_count"),
                 "bg_count"))

    def _round5(col):
        # Java Math.round: floor(x + 0.5) — differs from HALF_UP below 0
        return F.floor(col * 1e5 + F.lit(0.5)) / 1e5

    def _sig(x, off, scale):
        return (x + F.lit(off)) / (F.lit(scale) + F.abs(x + F.lit(off)))

    p = F.col("bg_count").cast("double") / F.lit(float(bg_size))
    num = F.col("fg_count").cast("double") - F.lit(float(fg_size)) * p
    denom_raw = F.sqrt(F.lit(float(fg_size)) * p * (F.lit(1.0) - p))
    denom = F.when(denom_raw == 0, F.lit(1e-10)).otherwise(denom_raw)
    z = num / denom
    rel = _round5(F.lit(0.2) * _sig(z, -80, 50) + F.lit(0.2) * _sig(z, -30, 30)
                  + F.lit(0.2) * _sig(z, 0, 30) + F.lit(0.2) * _sig(z, 30, 30)
                  + F.lit(0.2) * _sig(z, 80, 50))
    out = (j.select(
        "value", "fg_count", F.lit(fg_size).alias("fg_size"),
        "bg_count", F.lit(bg_size).alias("bg_size"),
        _round5(F.col("fg_count").cast("double") / F.lit(float(bg_size)))
        .alias("fg_pop"),
        _round5(F.col("bg_count").cast("double") / F.lit(float(bg_size)))
        .alias("bg_pop"),
        rel.alias("relatedness"))
        .filter(F.col("fg_count") >= mincount))
    return out.orderBy(F.desc("relatedness"), F.asc("value")).limit(limit)


def range_facets(docs: DataFrame, matches: DataFrame | None, field: str,
                 ranges: list[tuple[str, float, float]]) -> DataFrame:
    """LongRangeFacetCounts analog: ``ranges`` is [(label, lo, hi)) —
    lo inclusive, hi exclusive (LongRange with minInclusive=true,
    maxInclusive=false). → (label, count) in the given range order;
    empty ranges report count 0 (the reference materializes every
    requested range)."""
    m = _matched(docs, matches)
    v = F.col(field)
    aggs = [F.sum(F.when((v >= F.lit(lo)) & (v < F.lit(hi)), 1)
                  .otherwise(0)).cast("long").alias(label)
            for label, lo, hi in ranges]
    wide = m.agg(*aggs)
    # unpivot to (label, count), preserving range order
    pairs = F.array(*[
        F.struct(F.lit(label).alias("label"), F.col(label).alias("count"),
                 F.lit(i).alias("_o"))
        for i, (label, _, _) in enumerate(ranges)])
    return (wide.select(F.explode(pairs).alias("r"))
            .select("r.label", "r.count", "r._o")
            .orderBy("_o").drop("_o"))


def solr_range_facets(docs: DataFrame, matches: DataFrame | None,
                      field: str, start: float, end: float, gap: float,
                      other: tuple = (), hardend: bool = False) -> DataFrame:
    """Solr facet.range (`org.apache.solr.request.SimpleFacets` range
    mode / `RangeFacetRequest`): buckets are GENERATED from
    start/end/gap — [start, start+gap), [start+gap, start+2·gap), … up
    to ``end``; with ``hardend`` the last bucket is clipped to
    [last_lo, end) instead of running a full gap past it. ``other`` may
    include any of "before" (v < start), "after" (v ≥ actual upper
    bound), "between" (start ≤ v < bound) — Solr's FacetRangeOther
    buckets, appended after the gap buckets in that order.

    Compiles to the same one-projection + one-agg CASE plan as
    range_facets: bucket count is a plan-time constant, so the whole
    facet is a single codegen pass regardless of how many buckets the
    gap generates."""
    if gap <= 0:
        raise ValueError("gap must be positive")
    ranges = []
    lo = float(start)
    while lo < end:
        hi = min(lo + gap, end) if hardend else lo + gap
        label = f"{_fmt_edge(lo)}"
        ranges.append((label, lo, hi))
        lo = hi
    bound = ranges[-1][2] if ranges else float(start)
    out = range_facets(docs, matches, field, ranges)
    m = _matched(docs, matches)
    v = F.col(field)
    extras = []
    for name in other:
        if name == "before":
            cond = v < F.lit(float(start))
        elif name == "after":
            cond = v >= F.lit(float(bound))
        elif name == "between":
            cond = (v >= F.lit(float(start))) & (v < F.lit(float(bound)))
        else:
            raise ValueError(f"unknown facet.range.other value: {name}")
        extras.append(
            m.agg(F.sum(F.when(cond, 1).otherwise(0)).cast("long")
                  .alias("count"))
            .select(F.lit(name).alias("label"), "count"))
    for e in extras:
        out = out.unionByName(e)
    return out


def _fmt_edge(x: float) -> str:
    return str(int(x)) if float(x).is_integer() else str(x)


def pivot_facets(docs: DataFrame, matches: DataFrame | None,
                 fields: list[str], min_count: int = 1) -> DataFrame:
    """Solr facet.pivot analog, flattened: one row per leaf path →
    (``fields``... , count), ordered by the pivot path. A single
    groupBy on the full path computes every leaf; parent totals are
    prefix sums the caller can roll up (count is additive), so no
    second pass over the data is needed."""
    if not fields:
        raise ValueError("pivot_facets needs at least one field")
    return (_matched(docs, matches)
            .groupBy(*[F.col(f) for f in fields])
            .agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") >= min_count)
            .orderBy(*[F.asc(f) for f in fields]))


def taxonomy_facets(docs: DataFrame, matches: DataFrame | None,
                    path_col, sep: str = "/",
                    min_count: int = 1) -> DataFrame:
    """Taxonomy facet counts with path-prefix ROLLUP
    (`lucene/facet/.../taxonomy/FastTaxonomyFacetCounts.java:39`: a doc
    labeled dim/a/b increments dim/a/b, dim/a AND dim — the ancestor
    ordinal chain the taxonomy writer records): → (path, count), path
    asc; every prefix of every matched doc's path is one bucket, so a
    parent's count = Σ over docs whose path passes through it (= Σ of
    its children when all docs are labeled at leaves).

    Spark shape: ONE explode of the per-doc prefix chain (depth ≈ 2-4
    entries — bounded by taxonomy depth, not corpus size) + one
    map-side-combined agg; no join against a taxonomy table, no second
    pass for ancestors. ``path_col`` may be a column name or a Column
    expression (synthesized paths)."""
    m = _matched(docs, matches)
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    parts = F.split(p, sep)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, F.lit(1), i), sep))
    return (m.select(F.explode(prefixes).alias("path"))
            .groupBy("path").agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") >= min_count)
            .orderBy(F.asc("path")))


def taxonomy_facet_sum(docs: DataFrame, matches: DataFrame | None,
                       path_col, value_col, sep: str = "/") -> DataFrame:
    """Association facets: per-path SUM of a per-doc association value
    (`lucene/facet/.../taxonomy/TaxonomyFacetSumIntAssociations.java:34`
    + `TaxonomyFacetSumFloatAssociations.java`: each doc carries an
    AssociationFacetField(value, dim, path...) and the facet aggregates
    Σ value per ordinal instead of a count; hierarchical dims roll the
    sums up the ancestor chain, so a parent's sum = Σ children when all
    docs are labeled at leaves). → (path, sum), path asc.

    Spark shape: identical to :func:`taxonomy_facets` — ONE explode of
    the per-doc prefix chain weighted by the association value + one
    map-side-combined SUM; no taxonomy-table join, no ancestor second
    pass. ``value_col`` may be a name or Column (synthesized values)."""
    m = _matched(docs, matches)
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    parts = F.split(p, sep)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, F.lit(1), i), sep))
    return (m.select(F.explode(prefixes).alias("path"), v.alias("_v"))
            .groupBy("path").agg(F.sum("_v").alias("sum"))
            .orderBy(F.asc("path")))


def facet_queries(searcher, base_matches: DataFrame,
                  named: dict) -> DataFrame:
    """Solr ``facet.query`` (FacetComponent / SimpleFacets
    getFacetQueryCount): per named sub-query, the count of base-result
    docs also matching it — |docset(q) ∩ docset(facet.query)|.

    → (name, count), one row per entry (zero counts kept — Solr returns
    every requested facet.query), ordered by name. Each sub-query runs
    the normal kernel once; the intersection is a semi-join on doc_id,
    so the counts reduce map-side and only |named| rows reach the
    driver."""
    base = base_matches.select("doc_id").distinct()
    parts = []
    for name, q in sorted(named.items()):
        sub = searcher.score_all(q, mode="f64").select("doc_id").distinct()
        parts.append(
            base.join(sub, "doc_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("count"))
            .select(F.lit(name).alias("name"), "count"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("name")


def facet_metrics(docs: DataFrame, matches: DataFrame | None, field: str,
                  metric_col: str, min_count: int = 1) -> DataFrame:
    """JSON Facet API terms facet with nested metric aggregates (Solr
    json.facet {type: terms, field, facet: {sum, avg, min, max}}): per
    ``field`` value over the match set, count plus sum/avg/min/max of
    ``metric_col``. → (value, count, sum, avg, min, max), count desc
    then value asc (the bucket order). One map-side-combined agg."""
    return (_matched(docs, matches)
            .groupBy(F.col(field).alias("value"))
            .agg(F.count(F.lit(1)).alias("count"),
                 F.sum(metric_col).alias("sum"),
                 F.avg(metric_col).alias("avg"),
                 F.min(metric_col).alias("min"),
                 F.max(metric_col).alias("max"))
            .filter(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("value")))


def interval_facets(docs: DataFrame, matches: DataFrame | None,
                    field: str, intervals: list[tuple]) -> DataFrame:
    """Solr ``facet.interval`` (org.apache.solr.request.IntervalFacets /
    IntervalFacets.FacetInterval parse semantics): arbitrary, possibly
    OVERLAPPING intervals with per-end inclusivity — ``intervals`` is
    [(key, lo, hi, lo_inc, hi_inc)], e.g. Solr's "[0,10)" ↔
    (key, 0, 10, True, False); a doc counts in EVERY interval that
    contains its value. → (key, count) in the requested order, empty
    intervals kept at 0 (Solr returns all requested intervals).

    Shape: per-interval conditional SUMs in one whole-stage-codegen agg
    (a single pass over the match set regardless of interval count),
    then an unpivot of the 1-row result — |intervals| rows total to the
    driver."""
    m = _matched(docs, matches)
    v = F.col(field)
    aggs = []
    for i, (key, lo, hi, lo_inc, hi_inc) in enumerate(intervals):
        cond = ((v >= F.lit(lo)) if lo_inc else (v > F.lit(lo))) & \
               ((v <= F.lit(hi)) if hi_inc else (v < F.lit(hi)))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(f"_i{i}"))
    wide = m.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(key).alias("key"), F.col(f"_i{i}").alias("count"),
                 F.lit(i).alias("_o"))
        for i, (key, *_rest) in enumerate(intervals)])
    return (wide.select(F.explode(pairs).alias("r"))
            .select("r.key", "r.count", "r._o")
            .orderBy("_o").drop("_o"))


def drill_sideways(docs: DataFrame, base_matches: DataFrame | None,
                   drill_downs: dict, min_count: int = 1):
    """DrillSideways (`lucene/facet/src/java/org/apache/lucene/facet/
    DrillSideways.java:56` / DrillSidewaysQuery): the drill-down query
    is base ∧ AND-of-dims (OR within a dim's values,
    DrillDownQuery.java:37); for each dim, the SIDEWAYS counts are the
    facet counts of that dim over docs matching base ∧ every OTHER
    dim's filter — "what would this dim offer if its own filter were
    lifted". → (hits_df, {dim: counts_df}).

    Shape: the base match set semi-joins the doc table ONCE and is
    reused (cheap reuse of the narrowed frame); each dim's sideways
    counts are one filter + one map-side-combined agg — d+1 scans of
    the already-filtered slice, never of the corpus."""
    m = _matched(docs, base_matches)
    dims = dict(drill_downs)

    def _filt(frame, skip=None):
        for dim, values in dims.items():
            if dim != skip:
                frame = frame.filter(F.col(dim).isin(list(values)))
        return frame

    hits = _filt(m)
    sideways = {}
    for dim in dims:
        sideways[dim] = (_filt(m, skip=dim)
                         .groupBy(F.col(dim).alias("value"))
                         .agg(F.count(F.lit(1)).alias("count"))
                         .filter(F.col("count") >= min_count)
                         .orderBy(F.desc("count"), F.asc("value")))
    return hits, sideways


def facet_percentiles(docs: DataFrame, matches: DataFrame | None,
                      field: str, metric_col: str,
                      percentiles: tuple = (0.25, 0.5, 0.75),
                      min_count: int = 1) -> DataFrame:
    """JSON Facet API ``percentile`` metric (Solr json.facet
    {type: terms, field, facet: {pXX: "percentile(col, 25,50,75)"}} —
    solr/search/facet/PercentileAgg.java). Solr estimates with a
    t-digest; here the EXACT interpolated percentile (Spark's sort-based
    ``percentile`` aggregate, = DuckDB quantile_cont) — exactness is
    affordable because the per-bucket sort is distributed, and it makes
    the result oracle-comparable. One map-side-combined agg over the
    match set. → (value, count, p25, p50, ... ) count desc, value asc."""
    aggs = [F.count(F.lit(1)).alias("count")]
    for p in percentiles:
        aggs.append(F.expr(f"percentile({metric_col}, {p})")
                    .alias(f"p{int(round(p * 100))}"))
    return (_matched(docs, matches)
            .groupBy(F.col(field).alias("value"))
            .agg(*aggs)
            .filter(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("value")))


def grouped_facet_counts(docs: DataFrame, matches: DataFrame | None,
                         field: str, group_field: str,
                         min_count: int = 1) -> DataFrame:
    """Solr grouped faceting (``group.facet=true`` —
    `solr/core/src/java/org/apache/solr/request/SimpleFacets.java`
    getGroupedCounts / TermGroupFacetCollector): each distinct GROUP
    counts once per facet value, instead of each matching document.
    One map-side-combined distinct-agg; at scale this is a single
    shuffle on (value, group) then a count — no per-group subquery."""
    return (_matched(docs, matches)
            .groupBy(F.col(field).alias("value"))
            .agg(F.countDistinct(group_field).alias("count"))
            .filter(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("value")))


def nested_facets(docs: DataFrame, matches: DataFrame | None,
                  outer: str, inner: str, metric_col: str,
                  outer_limit: int = 3, inner_limit: int = 2) -> DataFrame:
    """json.facet nested subfacets (Solr JSON Facet API,
    `solr/core/src/java/org/apache/solr/search/facet/FacetField.java`):
    top ``outer_limit`` buckets of ``outer`` by doc count, and within
    each, the top ``inner_limit`` buckets of ``inner`` ranked by a
    nested metric (``sum(metric_col)``) — the "sort by a sub-facet
    aggregation" shape that plain facet.pivot cannot express.

    Spark shape: one (outer, inner) agg, then two window row_numbers —
    the bucket ranking never materializes more than the distinct bucket
    pairs, and the windows run on the already-tiny agg output."""
    from pyspark.sql.window import Window
    base = (_matched(docs, matches)
            .groupBy(F.col(outer).alias("outer_val"),
                     F.col(inner).alias("inner_val"))
            .agg(F.count(F.lit(1)).alias("count"),
                 F.sum(metric_col).alias("metric")))
    totals = (base.groupBy("outer_val")
              .agg(F.sum("count").alias("outer_count")))
    w_out = Window.orderBy(F.desc("outer_count"), F.asc("outer_val"))
    top_outer = (totals
                 .withColumn("outer_rank", F.row_number().over(w_out))
                 .filter(F.col("outer_rank") <= outer_limit))
    w_in = (Window.partitionBy("outer_val")
            .orderBy(F.desc("metric"), F.asc("inner_val")))
    return (base.join(top_outer, "outer_val")
            .withColumn("inner_rank", F.row_number().over(w_in))
            .filter(F.col("inner_rank") <= inner_limit)
            .select("outer_val", F.col("outer_count").cast("long"),
                    "inner_val", F.col("count").cast("long").alias("count"),
                    F.col("metric").cast("long").alias("metric"),
                    F.col("outer_rank").cast("int"),
                    F.col("inner_rank").cast("int"))
            .orderBy("outer_rank", "inner_rank"))


def date_range_facets(docs: DataFrame, matches: DataFrame | None,
                      field: str, start: str, end: str, gap: str,
                      now=None) -> DataFrame:
    """Solr date range faceting (``facet.range`` over a date field —
    `solr/core/src/java/org/apache/solr/handler/component/
    RangeFacetProcessor.java` with DateMathParser gaps): buckets
    [b_i, b_{i+1}) whose edges come from re-applying ``gap`` as DATE
    MATH to the previous edge, so ``+1MONTH`` lands on true month
    starts. hardend=false (the default): the final bucket spans a full
    gap even when it overshoots ``end``. Every requested bucket is
    reported, empty ones with count 0.

    Spark shape: the boundary ladder is a driver-side constant (date
    math never touches the executors); membership is the same CASE-sum
    codegen aggregate as ``range_facets`` — one narrow projection + one
    agg regardless of bucket count. → (bucket ISO string, count) in
    bucket order."""
    from .datemath import date_boundaries
    bounds = date_boundaries(start, end, gap, now=now)
    ranges = []
    for lo, hi in zip(bounds, bounds[1:]):
        ranges.append((lo.strftime("%Y-%m-%dT%H:%M:%SZ"), lo, hi))
    m = _matched(docs, matches)
    v = F.col(field)
    aggs = [F.sum(F.when((v >= F.lit(lo)) & (v < F.lit(hi)), 1)
                  .otherwise(0)).cast("long").alias(f"_b{i}")
            for i, (_, lo, hi) in enumerate(ranges)]
    wide = m.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(label).alias("bucket"),
                 F.col(f"_b{i}").alias("count"),
                 F.lit(i).alias("_ord"))
        for i, (label, _, _) in enumerate(ranges)])
    return (wide.select(F.explode(pairs).alias("r"))
            .select("r.bucket", "r.count", "r._ord")
            .orderBy("_ord").drop("_ord"))


def sampled_facet_counts(docs: DataFrame, matches: DataFrame | None,
                         field: str, rate: float, seed: int = 0,
                         min_count: int = 1) -> DataFrame:
    """RandomSamplingFacetsCollector analog (`lucene/facet/src/java/org/
    apache/lucene/facet/RandomSamplingFacetsCollector.java`): count
    facets on a ~``rate`` sample of the match set, then amortize the
    counts by 1/rate (amortizeFacetCounts) — the 100-TB posture for
    facets whose consumers need shape, not exact counts: the agg input
    shrinks by 1/rate before any shuffle.

    Documented divergence: the reference samples with a seeded
    XORShift64 stream over hit ORDER (not reproducible across plans);
    here membership is the deterministic md5 hash of doc_id ⊕ seed
    (`pipeline/sampling.hash_frac`), so the sample — and therefore the
    amortized counts — is reshard-invariant and SQL-verifiable.
    → (value, sampled_count, estimate) by estimate desc, value asc."""
    from ..pipeline.sampling import hash_frac
    m = _matched(docs, matches)
    key = F.concat(F.lit(str(seed)), F.lit("|"),
                   F.col("doc_id").cast("string"))
    sampled = m.filter(hash_frac(key) < F.lit(float(rate)))
    return (sampled
            .groupBy(F.col(field).alias("value"))
            .agg(F.count(F.lit(1)).alias("sampled_count"))
            .filter(F.col("sampled_count") >= min_count)
            .withColumn("estimate",
                        F.round(F.col("sampled_count") / F.lit(float(rate)),
                                4))
            .orderBy(F.desc("estimate"), F.asc("value")))


def stats_field(docs: DataFrame, matches: DataFrame | None,
                col: str) -> DataFrame:
    """Solr StatsComponent (``stats.field`` —
    `solr/core/src/java/org/apache/solr/handler/component/
    StatsField.java` / StatsValuesFactory NumericStatsValues): one
    tuple of count / missing / min / max / sum / sumOfSquares / mean /
    stddev over the match set. count counts documents WITH a value,
    missing those without; stddev is the reference's exact formula
    (StatsValuesFactory.java:600): sqrt((count·sumsq − sum²) /
    (count·(count−1))), 0 when count ≤ 1 — the sample, not population,
    deviation. One map-side-combined aggregate; nothing leaves the
    executors but the 8 scalars."""
    m = _matched(docs, matches)
    v = F.col(col).cast("double")
    row = m.agg(
        F.count(v).alias("count"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long")
        .alias("missing"),
        F.min(v).alias("min"), F.max(v).alias("max"),
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("sumOfSquares"))
    c, s, sq = F.col("count"), F.col("sum"), F.col("sumOfSquares")
    return row.select(
        c, F.col("missing"), "min", "max",
        F.round(s, 4).alias("sum"),
        F.round(sq, 4).alias("sumOfSquares"),
        F.round(s / c, 4).alias("mean"),
        F.round(F.when(c <= 1, F.lit(0.0)).otherwise(
            F.sqrt((c * sq - s * s) / (c * (c - F.lit(1.0))))), 4)
        .alias("stddev"))


def facet_unique(docs: DataFrame, matches: DataFrame | None, field: str,
                 metric_field: str, approx: bool = False,
                 rsd: float = 0.05) -> DataFrame:
    """json.facet ``unique(field)`` / ``hll(field)`` bucket metrics
    (`solr/core/src/java/org/apache/solr/search/facet/UniqueAgg.java:35`,
    `HLLAgg.java:31`): per-bucket distinct count of another field over
    the match set.

    exact (UniqueAgg): COUNT(DISTINCT metric) — two-phase partial
    aggregation in codegen (per-partition distinct then merge), one
    shuffle on the bucket key.
    approx (HLLAgg): ``approx_count_distinct`` — Spark's HyperLogLog++
    is the same sketch family the reference uses; constant memory per
    bucket regardless of cardinality, which is what survives a head
    bucket with 10^9 distinct values at 100 TB (the exact path's
    per-bucket hash set does not).
    """
    base = _matched(docs, matches)
    agg = (F.approx_count_distinct(metric_field, rsd) if approx
           else F.countDistinct(metric_field))
    return (base.groupBy(F.col(field).alias("bucket"))
            .agg(agg.alias("unique"), F.count("*").alias("count")))
