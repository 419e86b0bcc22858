"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as declarative DataFrame plans (no Python in
the hot path — tokenize/shingle/hash/band run JVM-side inside whole-stage
codegen; the only shuffles are the groupBys/joins Catalyst plans):

- exact:        md5 content hash → groupBy → canonical id
- MinHash+LSH:  shingle → minhash sigs → banded buckets → candidate join
                → exact-Jaccard verify (the classic near-dup pipeline)
- SimHash:      weighted bit-vote signature → banded buckets → Hamming
- n-gram Jaccard: exact all-pairs-sharing-a-shingle intersection counts
                (with a df cutoff = prefix-filter analog for scale)
- embedding cosine near-dup lives in pipeline/similarity.py

Scale notes (100 TB posture):
- Shingle hashing is stateless (md5) — NO global dictionary shuffle.
- The LSH band join shuffles on (band, signature); bucket sizes are
  bounded by near-dup cluster sizes, not corpus size. Hot buckets (boiler-
  plate text) are the skew risk → ``max_bucket`` caps them, the same
  guard production near-dup pipelines use.
- Exact-Jaccard verification joins only candidate pairs, semi-joined down
  before touching shingle sets.
- ``df_cutoff`` in ngram_jaccard_pairs drops ubiquitous shingles before
  the pair join (bounds fanout exactly like prefix filtering).

Analog in the reference: none — Lucene has no dedup; this is the
training-pipeline extension the target engine needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import P31, md5h60, perm_col

TOKEN_RE = "[a-z0-9]+"


def tokens(text_col) -> "F.Column":
    return F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint, canonical_id, is_duplicate) — canonical is the
    min doc_id per identical content; one shuffle on the content hash."""
    fp = docs.select(F.col(id_col).alias("doc_id"),
                     F.md5(F.col(text_col).cast("binary")).alias("fingerprint"))
    canon = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("group_size"))
    return (fp.join(canon, "fingerprint")
            .withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_id")))


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Distinct k-token shingles per doc: (doc_id, shingle). JVM-side."""
    parts = ", ".join(f"ts[i+{d}]" for d in range(k))
    expr = (f"CASE WHEN size(ts) >= {k} THEN "
            f"transform(sequence(0, size(ts) - {k}), i -> concat_ws(' ', {parts})) "
            f"ELSE array() END")
    return (docs.select(F.col(id_col).alias("doc_id"),
                        tokens(F.col(text_col)).alias("ts"))
            .select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
            .distinct())


def minhash_signatures(sh: DataFrame, num_perms: int = 16) -> DataFrame:
    """(doc_id, mh0..mh{n-1}) — one aggregation, map-side combined."""
    h31 = (md5h60(F.col("shingle")) % P31).alias("h31")
    base = sh.select("doc_id", h31)
    aggs = [F.min(perm_col(F.col("h31"), j)).alias(f"mh{j}")
            for j in range(num_perms)]
    return base.groupBy("doc_id").agg(*aggs)


def banded_signatures(sigs: DataFrame, bands: int = 4,
                      rows: int = 4) -> DataFrame:
    """(doc_id, band, sig) — each doc's LSH bucket keys. At scale this
    is the table you PERSIST for a reference corpus: crawl increments
    sign themselves and equi-join into the same buckets without ever
    re-reading (or re-signing) the reference."""
    frames = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        frames.append(sigs.select(
            "doc_id", F.lit(b).alias("band"),
            F.concat_ws("_", *[c.cast("string") for c in cols]).alias("sig")))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def lsh_candidates(sigs: DataFrame, bands: int = 4, rows: int = 4,
                   max_bucket: int | None = 1000,
                   drop_stats: dict | None = None) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) sharing any band signature.

    ``max_bucket`` caps hot buckets (boilerplate skew guard) — but a
    dropped bucket is recall loss, so it is no longer silent: pass
    ``drop_stats={}`` and the dict is filled with
    ``{"dropped_buckets": n, "dropped_doc_slots": m}`` (an eager
    aggregation over bucket SIZES — rows = distinct buckets, not corpus
    rows; the signature table is persisted first so the heavy upstream
    shingle→minhash pipeline runs once, not twice) and a RuntimeWarning
    fires when n > 0, so pipelines can alert on recall loss instead of
    guessing. With ``drop_stats=None`` the plan stays fully lazy (no
    extra job) — the gated ``minhash_dedup`` surface opts in.
    """
    if max_bucket is not None and drop_stats is not None:
        sigs = sigs.persist()
    banded = banded_signatures(sigs, bands=bands, rows=rows)
    if max_bucket is not None:
        sizes = banded.groupBy("band", "sig").agg(F.count("*").alias("bn"))
        if drop_stats is not None:
            row = (sizes.filter(F.col("bn") > max_bucket)
                   .agg(F.count("*").alias("nb"),
                        F.coalesce(F.sum("bn"), F.lit(0)).alias("ns"))
                   .collect()[0])
            drop_stats["dropped_buckets"] = int(row["nb"])
            drop_stats["dropped_doc_slots"] = int(row["ns"])
            if row["nb"]:
                import warnings
                warnings.warn(
                    f"lsh_candidates: max_bucket={max_bucket} dropped "
                    f"{row['nb']} hot bucket(s) covering {row['ns']} "
                    "doc-slots — near-dup recall is reduced for docs in "
                    "those buckets (raise max_bucket or strip boilerplate "
                    "upstream)", RuntimeWarning, stacklevel=2)
        banded = (banded.join(sizes, ["band", "sig"])
                  .filter(F.col("bn") <= max_bucket).drop("bn"))
    a = banded.select("band", "sig", F.col("doc_id").alias("doc_a"))
    b = banded.select("band", "sig", F.col("doc_id").alias("doc_b"))
    return (a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def jaccard_verify(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs: (doc_a, doc_b, inter, na, nb,
    jaccard). Shingle sets are semi-joined to candidate docs first."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    docs_a = pairs.select(F.col("doc_a").alias("doc_id")).distinct()
    docs_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    sh_a = (sh.join(docs_a, "doc_id")
            .select(F.col("doc_id").alias("doc_a"), "shingle"))
    sh_b = (sh.join(docs_b, "doc_id")
            .select(F.col("doc_id").alias("doc_b"), "shingle"))
    inter = (pairs.join(sh_a, "doc_a").join(sh_b, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    return (pairs.join(inter, ["doc_a", "doc_b"], "left")
            .na.fill({"inter": 0})
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "na"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "nb"), "doc_b")
            .withColumn("jaccard", F.col("inter") /
                        (F.col("na") + F.col("nb") - F.col("inter"))))


def minhash_dedup(docs: DataFrame, k: int = 3, num_perms: int = 16,
                  bands: int = 4, rows: int = 4,
                  threshold: float = 0.8, max_bucket: int | None = 1000,
                  drop_stats: dict | None = None) -> DataFrame:
    """Full near-dup pipeline: (doc_a, doc_b, jaccard) with j >= threshold
    among LSH candidates. Pass ``drop_stats={}`` to surface hot-bucket
    recall loss (see lsh_candidates)."""
    sh = shingles(docs, k=k)
    sigs = minhash_signatures(sh, num_perms=num_perms)
    cand = lsh_candidates(sigs, bands=bands, rows=rows,
                          max_bucket=max_bucket, drop_stats=drop_stats)
    ver = jaccard_verify(sh, cand)
    return (ver.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


# ---------------------------------------------------------------------------
# near-dup clusters: connected components + canonicalization
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components of the near-dup pair graph → (doc_id,
    component) with component = min doc_id in the component.

    Iterative min-label propagation: each round every node takes the min
    label over itself and its neighbors; converges in O(diameter) rounds
    (near-dup clusters are shallow — boilerplate families, not long
    chains). Each round is one join + one aggregation; the frontier
    shrinks to zero and the loop exits on a zero-changed count, so the
    cost is bounded by the cluster diameter, never the corpus. (The
    doubling variants — large-star/small-star — drop in here if a
    pathological graph ever needs them.)

    If the labels have NOT converged after ``max_iter`` rounds (a chain
    graph longer than max_iter), this RAISES rather than silently
    returning wrong components — raise ``max_iter`` for deep graphs."""
    edges = (pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
             .unionByName(pairs.select(F.col("doc_b").alias("u"),
                                       F.col("doc_a").alias("v")))).persist()
    edges.count()   # pin: the upstream pair pipeline must run ONCE, not
    # once per propagation round
    # per-round localCheckpoint truncates lineage: without it the logical
    # plan doubles every round and a 10-round chain graph already blows
    # up plan stringification — checkpointing keeps round cost constant
    labels = (edges.select(F.col("u").alias("doc_id"))
              .distinct().withColumn("lbl", F.col("doc_id"))
              .localCheckpoint())
    converged = False
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges["v"] == labels["doc_id"])
                   .groupBy("u").agg(F.min("lbl").alias("nl")))
        new_labels = (labels.join(nbr_min, labels["doc_id"] == nbr_min["u"],
                                  "left")
                      .select("doc_id",
                              F.least("lbl", F.coalesce("nl", F.col("lbl")))
                              .alias("lbl"))).localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.lbl") != F.col("o.lbl")).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components: labels did not converge within "
            f"max_iter={max_iter} rounds (graph diameter exceeds the "
            "bound) — rerun with a larger max_iter; returning partial "
            "labels would silently mislabel components")
    return labels.select("doc_id", F.col("lbl").alias("component"))


def connected_components_star(pairs: DataFrame,
                              max_iter: int = 30) -> DataFrame:
    """Connected components via the ALTERNATING large-star/small-star
    algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond", Algorithm 2) → (doc_id, component), component = min
    doc_id.

    Converges in O(log² n) rounds regardless of graph DIAMETER — the
    100-TB insurance for adversarial chain graphs where min-label
    propagation (``connected_components``) needs O(diameter) rounds:

    - large-star: every node points its LARGER neighbors at the minimum
      of its closed neighborhood (one groupBy min + join per round);
    - small-star: every node gathers its smaller neighbors (edge keyed
      by the larger endpoint) and points them — and itself — at the
      minimum.

    Each round is two map-side-combined aggregations + two joins over
    the CURRENT edge set (which only shrinks toward the star forest);
    per-round localCheckpoint keeps the plan constant like the
    min-label loop. Convergence = exact edge-set fixpoint (anti-join
    count, not a hash)."""
    E = (pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
         .filter(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .distinct().persist())
    nodes = (E.select(F.col("a").alias("doc_id"))
             .unionByName(E.select(F.col("b").alias("doc_id")))
             .distinct().persist())
    nodes.count()

    def large_star(e):
        sym = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
               .unionByName(e.select(F.col("b").alias("u"),
                                     F.col("a").alias("v"))))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m")))
        return (sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.least("v", "m").alias("a"),
                        F.greatest("v", "m").alias("b"))
                .filter(F.col("a") != F.col("b")).distinct())

    def small_star(e):
        d = e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        j = d.join(mins, "u")
        out = (j.filter(F.col("v") != F.col("m"))
               .select(F.col("v").alias("x"), F.col("m"))
               .unionByName(mins.filter(F.col("u") != F.col("m"))
                            .select(F.col("u").alias("x"), F.col("m"))))
        return (out.select(F.least("x", "m").alias("a"),
                           F.greatest("x", "m").alias("b"))
                .filter(F.col("a") != F.col("b")).distinct())

    converged = False
    for _ in range(max_iter):
        new_e = small_star(large_star(E)).localCheckpoint()
        n_new = new_e.count()
        same = (n_new == E.count()
                and new_e.join(E, ["a", "b"], "left_anti").count() == 0)
        E.unpersist()
        E = new_e.persist()
        if same:
            converged = True
            break
    if not converged:
        E.unpersist()
        nodes.unpersist()
        raise RuntimeError(
            f"connected_components_star: no fixpoint within "
            f"max_iter={max_iter} rounds — raise max_iter")
    # star forest: every non-root has its root as smaller endpoint
    roots = E.groupBy(F.col("b").alias("doc_id")) \
             .agg(F.min("a").alias("component"))
    out = (nodes.join(roots, "doc_id", "left")
           .select("doc_id", F.coalesce("component", F.col("doc_id"))
                   .alias("component")))
    res = out.localCheckpoint()
    E.unpersist()
    nodes.unpersist()
    return res


def canonicalize_near_dups(pairs: DataFrame,
                           algorithm: str = "label") -> DataFrame:
    """(doc_id, canonical_id, is_duplicate) over every doc appearing in a
    near-dup pair: canonical = min doc_id of its connected component (the
    keep-first retention policy). ``algorithm``: "label" (min-label,
    O(diameter) rounds — right for shallow boilerplate families) or
    "star" (alternating star, O(log²) rounds — right for adversarial
    chains)."""
    if algorithm == "label":
        cc = connected_components(pairs)
    elif algorithm == "star":
        cc = connected_components_star(pairs)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return (cc.select("doc_id", F.col("component").alias("canonical_id"))
            .withColumn("is_duplicate",
                        F.col("doc_id") != F.col("canonical_id")))


def cross_corpus_neardups(new_docs: DataFrame, ref_docs: DataFrame,
                          k: int = 3, num_perms: int = 16,
                          bands: int = 4, rows: int = 4,
                          threshold: float = 0.8) -> DataFrame:
    """(new_id, ref_id, jaccard ≥ threshold) — near-dups of NEW docs
    against an existing REFERENCE corpus: the incremental-crawl dedup
    path (Lee et al. 2022 dedup a new crawl against the training set,
    not just within itself). At 100 TB the asymmetry is the point: the
    reference's :func:`banded_signatures` table is computed and
    persisted ONCE; each increment signs only itself, equi-joins into
    the same (band, sig) buckets, and the reference TEXT is touched
    only for the exact-Jaccard verify of candidate pairs — candidate-
    semi-joined like every verify in this module. MinHash signatures
    are per-doc (a min over the doc's own shingles), so per-side
    signing is bit-identical to whole-corpus signing. Doc ids may
    overlap between the corpora — sides are tracked by column, the
    ids never compare across sides."""
    sh_n = shingles(new_docs, k=k)
    sh_r = shingles(ref_docs, k=k)
    b_n = banded_signatures(minhash_signatures(sh_n, num_perms=num_perms),
                            bands=bands, rows=rows)
    b_r = banded_signatures(minhash_signatures(sh_r, num_perms=num_perms),
                            bands=bands, rows=rows)
    cand = (b_n.select("band", "sig", F.col("doc_id").alias("new_id"))
            .join(b_r.select("band", "sig", F.col("doc_id").alias("ref_id")),
                  ["band", "sig"])
            .select("new_id", "ref_id").distinct())
    sh_na = (sh_n.join(cand.select(F.col("new_id").alias("doc_id"))
                       .distinct(), "doc_id")
             .select(F.col("doc_id").alias("new_id"), "shingle"))
    sh_rb = (sh_r.join(cand.select(F.col("ref_id").alias("doc_id"))
                       .distinct(), "doc_id")
             .select(F.col("doc_id").alias("ref_id"), "shingle"))
    inter = (cand.join(sh_na, "new_id").join(sh_rb, ["ref_id", "shingle"])
             .groupBy("new_id", "ref_id").agg(F.count("*").alias("inter")))
    sz_n = sh_n.groupBy("doc_id").agg(F.count("*").alias("na")) \
               .withColumnRenamed("doc_id", "new_id")
    sz_r = sh_r.groupBy("doc_id").agg(F.count("*").alias("nb")) \
               .withColumnRenamed("doc_id", "ref_id")
    return (cand.join(inter, ["new_id", "ref_id"], "left")
            .na.fill({"inter": 0})
            .join(sz_n, "new_id").join(sz_r, "ref_id")
            .withColumn("jaccard", F.col("inter") /
                        (F.col("na") + F.col("nb") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("new_id", "ref_id", "jaccard"))


def component_representatives(components: DataFrame, quality: DataFrame,
                              quality_col: str = "quality",
                              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, component, rep_id, is_duplicate) — per near-dup
    component, the representative is the HIGHEST-QUALITY member (ties
    → lowest doc_id), not the arbitrary min-id one: CCNet/RealNews
    keep the best copy of a duplicate cluster (longest / cleanest),
    because boilerplate families usually contain one full article and
    many truncated mirrors.

    ``components`` is :func:`canonicalize_near_dups` output (the
    ``canonical_id`` column doubles as the component label);
    ``quality`` maps doc_id → ``quality_col`` (chars, tokens, or a
    model score). Cost on top of the CC run: one map-side-combinable
    ``max_by`` agg over component (components are tiny relative to
    the corpus) + an equi-join of component → rep back onto the
    membership rows — no new corpus-wide shuffle."""
    q = quality.select(F.col(id_col).alias("doc_id"),
                       F.col(quality_col).cast("double").alias("_q"))
    memb = (components
            .select("doc_id", F.col("canonical_id").alias("component"))
            .join(q, "doc_id"))
    reps = memb.groupBy("component").agg(
        F.max_by("doc_id", F.struct(F.col("_q").alias("q"),
                                    (-F.col("doc_id")).alias("nid")))
        .alias("rep_id"))
    return (memb.select("doc_id", "component").join(reps, "component")
            .withColumn("is_duplicate", F.col("doc_id") != F.col("rep_id")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, bits: int = 32,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit weighted bit-vote over term frequencies.

    Bit k of a term's md5h60 votes +freq / -freq; signature bit k is 1
    iff the vote sum is positive. One shuffle (groupBy doc_id), partial
    aggregation map-side.
    """
    tf = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens(F.col(text_col))).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("freq"))
          .withColumn("h", md5h60(F.col("term"))))
    votes = tf.groupBy("doc_id").agg(*[
        F.sum(F.col("freq") * (F.shiftright("h", k).bitwiseAND(F.lit(1))
                               * 2 - 1)).alias(f"v{k}")
        for k in range(bits)])
    sig = None
    for k in range(bits):
        term = F.when(F.col(f"v{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3,
                  bands: int | None = None) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within max_hamming, candidates via
    exact-match on any of `bands` contiguous bit-bands (standard
    pigeonhole: a pair with hamming < bands must agree on >= 1 band).

    The guarantee REQUIRES bands > max_hamming — ``bands=None``
    (default) derives ``max_hamming + 1`` automatically; an explicit
    ``bands <= max_hamming`` raises instead of silently returning false
    negatives. Band widths are the contiguous near-equal split of the
    32 signature bits, so any band count up to 32 works."""
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"simhash_pairs: bands={bands} <= max_hamming={max_hamming} "
            "voids the pigeonhole recall guarantee (a pair can differ in "
            "every band); pass bands > max_hamming or bands=None to derive")
    if bands > 32:
        raise ValueError("simhash_pairs: at most 32 bands over 32 bits")
    # contiguous near-equal split of 32 bits: widths differ by <= 1
    base, extra = divmod(32, bands)
    frames = []
    off = 0
    for b in range(bands):
        width = base + (1 if b < extra else 0)
        mask = (1 << width) - 1
        frames.append(sigs.select(
            "doc_id", "simhash", F.lit(b).alias("band"),
            F.shiftright("simhash", off).bitwiseAND(F.lit(mask))
            .alias("key")))
        off += width
    banded = frames[0]
    for f in frames[1:]:
        banded = banded.unionByName(f)
    a = banded.select("band", "key", F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sig_a"))
    b = banded.select("band", "key", F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sig_b"))
    cand = (a.join(b, ["band", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b").distinct())
    return (cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"))


def simhash_dedup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    return simhash_pairs(simhash_signatures(docs), max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (no LSH)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        threshold: float = 0.8,
                        df_cutoff: int | None = None) -> DataFrame:
    """All pairs with token-k-gram Jaccard >= threshold, via the shared-
    shingle inverted join.

    df_cutoff is the prefix-filter: CANDIDATE pairs come only from the
    join on shingles present in ≤ df_cutoff docs (bounding the self-join
    fanout on ubiquitous shingles — the scale guard), but the Jaccard is
    then verified EXACTLY on the full shingle sets, so reported values
    are true Jaccards. A qualifying pair is missed only if every one of
    its shared shingles exceeds the cutoff — vanishingly unlikely at
    j ≥ 0.8 unless the pair is pure boilerplate."""
    sh = shingles(docs, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    if df_cutoff is None:
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
                 .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
        return (inter
                .join(sizes.withColumnRenamed("doc_id", "doc_a")
                      .withColumnRenamed("n", "na"), "doc_a")
                .join(sizes.withColumnRenamed("doc_id", "doc_b")
                      .withColumnRenamed("n", "nb"), "doc_b")
                .withColumn("jaccard", F.col("inter") /
                            (F.col("na") + F.col("nb") - F.col("inter")))
                .filter(F.col("jaccard") >= threshold)
                .select("doc_a", "doc_b", "jaccard"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    rare = (sh.join(dfreq.filter(F.col("sdf") <= df_cutoff)
                    .select("shingle"), "shingle"))
    a = rare.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = rare.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    ver = jaccard_verify(sh, cand)
    return (ver.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def minhash_query(spark, docs: DataFrame, query_text: str,
                  num_perms: int = 16, k: int = 3, sim: float = 0.0,
                  top: int = 10, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """MinHash similarity QUERY (solr/search/MinHashQParser.java:40):
    the query text is minhashed with the SAME permutation family as the
    corpus; each signature component acts as a term and a document
    scores the fraction of components it shares — the unbiased Jaccard
    estimate; ``sim`` is the required fraction (the parser's
    min_should_match analog over hash terms). → (doc_id, est_jaccard)
    top-``top`` desc, doc_id asc.

    Scale shape: the query signature is num_perms integers (one tiny
    1-row job), then ONE codegen projection over the corpus signature
    table — Σ_j [mh_j == q_j] / num_perms — with no join, unpivot, or
    shuffle; TakeOrderedAndProject returns k rows."""
    sigs = minhash_signatures(
        shingles(docs, k=k, id_col=id_col, text_col=text_col), num_perms)
    qdf = spark.createDataFrame([(0, query_text)], "doc_id long, text string")
    qrow = minhash_signatures(shingles(qdf, k=k), num_perms).collect()
    if not qrow:
        raise ValueError(f"query needs at least {k} tokens for shingling")
    q = qrow[0]
    matches = None
    for j in range(num_perms):
        m = F.when(F.col(f"mh{j}") == int(q[f"mh{j}"]), 1).otherwise(0)
        matches = m if matches is None else matches + m
    est = (matches.cast("double") / float(num_perms)).alias("est_jaccard")
    return (sigs.select("doc_id", est)
            .filter(F.col("est_jaccard") >= float(sim))
            .orderBy(F.desc("est_jaccard"), F.asc("doc_id")).limit(top))


# ---------------------------------------------------------------------------
# exact-substring duplication (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — suffix-array ExactSubstr,
# re-expressed as rolling token windows)
# ---------------------------------------------------------------------------

def _gram_stream(docs: DataFrame, width: int, hashed: bool,
                 id_col: str, text_col: str) -> DataFrame:
    """(doc_id, gram) window stream shared by the ExactSubstr-style
    operators; hashed = 64-bit window hashes with NO gram-string
    materialization (scrub.word_ngram_hashes)."""
    from .scrub import word_ngram_hashes, word_ngrams
    grams = (word_ngram_hashes(F.col(text_col), width) if hashed
             else word_ngrams(F.col(text_col), width))
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(grams).alias("gram"))


def duplicate_windows(docs: DataFrame, width: int = 13,
                      min_docs: int = 2, hashed: bool = False,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Window-level exact-substring duplication: every ``width``-token
    window (stride 1) that appears in ≥ ``min_docs`` distinct docs →
    (gram, n_docs, n_occ).

    The suffix-array ExactSubstr pass of Lee et al. 2022 finds byte
    spans ≥50 tokens shared verbatim between documents; stride-1 token
    windows of width w find exactly the same spans (any shared span of
    ≥w tokens shares all its w-windows) at the cost of one groupBy
    instead of a distributed suffix array.

    Scale: the explode is map-side; the ONE wide shuffle groups by the
    window key. With ``hashed=True`` the key is a 64-bit window hash
    folded from per-token hashes (scrub.word_ngram_hashes — the window
    STRINGS are never built, and the shuffle key shrinks to 8 bytes
    from ~width×7; 64-bit collisions are negligible for stats) — keep
    strings when exact spans must be reported."""
    g = _gram_stream(docs, width, hashed, id_col, text_col)
    return (g.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occ"))
            .filter(F.col("n_docs") >= min_docs))


def substring_dup_stats(docs: DataFrame, width: int = 13,
                        hashed: bool = False, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document exact-substring duplication signal:
    (doc_id, n_windows, dup_windows, dup_frac) where a window is "dup"
    if its exact token sequence also occurs in ANOTHER document. This
    is the per-doc score a pipeline thresholds on (Lee et al. cut
    documents whose duplicated-span fraction is high).

    Two shuffles: window counts (groupBy gram) and the per-doc rollup
    (groupBy doc_id). The join back is against ONLY the duplicated
    grams (n_docs ≥ 2) — on real corpora a small fraction of the
    window vocabulary — so the join side stays broadcastable far
    longer; a window missing from it is unique by construction."""
    g = _gram_stream(docs, width, hashed, id_col, text_col)
    dup = (g.groupBy("gram")
           .agg(F.countDistinct("doc_id").alias("n_docs"))
           .filter(F.col("n_docs") >= 2))
    return (g.join(dup, "gram", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_windows"),
                 F.count("n_docs").alias("dup_windows"))
            .withColumn("dup_frac",
                        F.col("dup_windows")
                        / F.greatest("n_windows", F.lit(1))))


def text_profile_signature(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           quant_rate: float = 0.01,
                           min_token_len: int = 2) -> DataFrame:
    """Solr SignatureUpdateProcessor's fuzzy signature
    (`solr/core/src/java/org/apache/solr/update/processor/
    TextProfileSignature.java`, Nutch lineage): a near-dup fingerprint
    robust to small edits without any pairwise join —

    1. tokens = maximal letter-or-digit runs, lowercased, kept when
       LONGER than ``min_token_len`` (strictly >, the reference's
       ``curToken.length() > minTokenLen``);
    2. per-doc counts; QUANT = round(maxFreq·quantRate), floored to 2
       (or 1 when maxFreq is 1);
    3. each count rounds DOWN to a QUANT multiple, tokens below QUANT
       drop — only the frequency PROFILE of dominant terms survives;
    4. profile lines "token count" sorted by count desc, md5 of the
       newline-joined text is the signature.

    Documented divergence: the reference breaks count ties in HashMap
    iteration order (JVM-internal, unspecified); ties here order by
    token asc so the signature is deterministic and SQL-verifiable.

    Spark shape: one explode + one (doc, term) groupBy (map-side
    combined), a per-doc max window-free rollup, and one collect_list
    per doc — the same two-exchange profile as token_counts; no
    pairwise anything. Grouping the output by ``signature`` is the
    exact-dedup shuffle. → (doc_id, signature)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                       F.lit(r"[\p{L}\p{Nd}]+"), 0))
        .alias("term")).filter(F.length("term") > min_token_len)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("cnt"))
    maxf = tf.groupBy("doc_id").agg(F.max("cnt").alias("maxf"))
    q_raw = F.round(F.col("maxf") * F.lit(float(quant_rate)))
    quant = F.when(q_raw >= 2, q_raw).otherwise(
        F.when(F.col("maxf") > 1, F.lit(2.0)).otherwise(F.lit(1.0)))
    prof = (tf.join(maxf, "doc_id")
            .withColumn("_q", quant.cast("long"))
            .withColumn("qcnt",
                        (F.floor(F.col("cnt") / F.col("_q")) * F.col("_q")))
            .filter(F.col("qcnt") >= F.col("_q")))
    lines = (prof
             .groupBy("doc_id")
             .agg(F.array_sort(F.collect_list(
                 F.struct((-F.col("qcnt")).alias("nk"),
                          F.col("term").alias("term"),
                          F.col("qcnt").alias("qcnt")))).alias("p"))
             .select("doc_id",
                     F.md5(F.concat_ws(
                         "\n",
                         F.transform(F.col("p"),
                                     lambda x: F.concat_ws(
                                         " ", x["term"],
                                         x["qcnt"].cast("string")))))
                     .alias("signature")))
    # docs whose every token was dropped sign the empty profile
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(lines, "doc_id", "left")
            .withColumn("signature",
                        F.coalesce("signature", F.md5(F.lit("")))))


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet §3.1 / Dolma §4.1 — hash paragraphs,
# drop every later occurrence corpus-wide)
# ---------------------------------------------------------------------------

def _paragraphs(docs: DataFrame, id_col: str, text_col: str,
                sep: str) -> DataFrame:
    """(doc_id, idx, para, key) — trimmed non-empty paragraphs with the
    CCNet normalization key (lowercase, digits→0, whitespace collapsed)
    hashed to md5 so the key is 32 bytes however long the paragraph.
    ``sep`` is a LITERAL separator (\\Q…\\E-quoted for the regex split,
    so it round-trips with the literal array_join reassembly)."""
    paras = F.split(F.col(text_col), "\\Q" + sep + "\\E")
    norm = lambda p: F.md5(F.regexp_replace(F.regexp_replace(
        F.lower(F.trim(p)), "[0-9]", "0"), "\\s+", " "))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.posexplode(paras).alias("idx", "para"))
            .filter(F.trim("para") != "")
            .withColumn("key", norm(F.col("para"))))


def paragraph_dup_stats(docs: DataFrame, sep: str = "\n",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document paragraph-duplication profile — (doc_id, n_paras,
    dup_paras, dup_frac) where ``dup_paras`` counts this doc's
    paragraphs whose normalized hash occurs in ≥ 2 distinct documents
    (the signal CCNet/Dolma threshold on before dropping or demoting).

    Scale: one map-side paragraph explode, ONE wide shuffle on the
    32-byte md5 key (map-side-combined count), join back semi-bounded
    by the exploded stream. No driver collection, no windows."""
    p = _paragraphs(docs, id_col, text_col, sep)
    shared = (p.groupBy("key")
              .agg(F.countDistinct("doc_id").alias("n_docs"))
              .filter(F.col("n_docs") >= 2))
    flagged = (p.join(shared.select("key", F.lit(1).alias("_dup")),
                      "key", "left")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_paras"),
                    F.count("_dup").alias("dup_paras")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(flagged, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
                    F.coalesce("dup_paras", F.lit(0)).alias("dup_paras"))
            .withColumn("dup_frac",
                        F.when(F.col("n_paras") > 0,
                               F.col("dup_paras") / F.col("n_paras"))
                        .otherwise(F.lit(0.0))))


def drop_duplicate_paragraphs(docs: DataFrame, sep: str = "\n",
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """CCNet paragraph dedup proper: every paragraph keeps its FIRST
    occurrence in (doc_id, idx) order and later occurrences are
    removed; documents are reassembled from their surviving paragraphs
    (doc order preserved, possibly empty). → (doc_id, text, n_paras,
    kept_paras).

    Scale: first-occurrence = one min(struct(doc_id, idx)) aggregate
    per key — NOT a global sort and NOT a window over the corpus; the
    reassembly groupBy(doc_id) shuffles only surviving paragraphs.
    Deterministic on any partitioning/cluster size."""
    p = _paragraphs(docs, id_col, text_col, sep)
    first = (p.groupBy("key")
             .agg(F.min(F.struct("doc_id", "idx")).alias("f")))
    kept = (p.join(first, "key")
            .filter((F.col("doc_id") == F.col("f.doc_id"))
                    & (F.col("idx") == F.col("f.idx"))))
    stats = p.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.count("*").alias("kept_paras"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("idx", "para"))),
                            lambda x: x["para"]), sep).alias("text")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(stats, "doc_id", "left")
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
                    F.coalesce("kept_paras", F.lit(0))
                    .alias("kept_paras")))


def remove_duplicate_windows(docs: DataFrame, width: int = 13,
                             hashed: bool = True,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better" §3, restated over stride-1 token
    windows like ``substring_dup_stats``): whenever a ``width``-token
    window occurs more than once corpus-wide, the FIRST occurrence (in
    (doc_id, window index) order) stays and every other occurrence's
    token span [idx, idx+width) is excised from its document; documents
    are rebuilt from the surviving tokens. → (doc_id, text, n_tokens,
    kept_tokens).

    Scale shape: the window stream + ONE wide shuffle on the window key
    (8-byte hashes by default) + one min(struct) per key — the same
    keep-first primitive as ``drop_duplicate_paragraphs``, never a
    window function or global sort; interval union + token slicing are
    codegen array expressions per doc (intervals per doc are few —
    long repeated passages collapse into one merged span).

    Divergence (documented): the reference pipeline excises CHARACTER
    ranges found by a corpus suffix array; the stride-1 token-window
    restatement removes the same repeated passages with up to
    ``width − 1`` tokens of boundary slack, and is exactly
    SQL-restatable."""
    from .scrub import word_ngram_hashes, word_ngrams
    grams = (word_ngram_hashes(F.col(text_col), width) if hashed
             else word_ngrams(F.col(text_col), width))
    occ = docs.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(grams).alias("idx", "gram"))
    first = occ.groupBy("gram").agg(F.min(F.struct("doc_id", "idx"))
                                    .alias("f"),
                                    F.count("*").alias("n_occ"))
    kill = (occ.join(first.filter(F.col("n_occ") >= 2), "gram")
            .filter((F.col("doc_id") != F.col("f.doc_id"))
                    | (F.col("idx") != F.col("f.idx")))
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("idx").alias("s"),
                         (F.col("idx") + width).alias("e"))))
                 .alias("iv")))
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        toks.alias("toks"))
            .join(kill, "doc_id", "left"))
    keep_mask = F.filter(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: ~F.exists("iv", lambda v: (i >= v["s"]) & (i < v["e"])))
    rebuilt = F.array_join(
        F.transform(keep_mask, lambda i: F.element_at(
            F.col("toks"), (i + 1).cast("int"))), " ")
    return (base.withColumn(
        "kept_idx", F.when(F.col("iv").isNotNull(), keep_mask)
        .otherwise(F.sequence(F.lit(0), F.size("toks") - 1)))
        .select("doc_id",
                F.when(F.col("iv").isNotNull(), rebuilt)
                .otherwise(F.array_join("toks", " ")).alias("text"),
                F.size("toks").cast("long").alias("n_tokens"),
                F.size("kept_idx").cast("long").alias("kept_tokens")))
