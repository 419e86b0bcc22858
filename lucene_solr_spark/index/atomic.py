"""Atomic updates — Solr's partial-document update operations.

Reference: `solr/core/src/java/org/apache/solr/update/processor/
AtomicUpdateDocumentMerger.java:93-260` (UpdateRequestProcessor chain,
``{"id": X, "field": {"set"/"inc"/"add"/"add-distinct"/"remove"/
"removeregex": value}}``): the stored document is fetched, the listed
operations merge into it field by field, untouched fields carry over,
and the merged doc replaces the old one.

Operations (merge semantics per the reference):
- ``set``          — replace the value (null clears the field)
- ``inc``          — numeric increment (missing counts as 0)
- ``add``          — append value(s) to a multivalued field
- ``add-distinct`` — append only values not already present
- ``remove``       — drop all occurrences of the value(s)
- ``removeregex``  — drop values matching the regex(es)

Spark shape / 100-TB posture: an update batch is request-sized (the
Solr handler receives a few docs per call), so it pivots driver-side
into ONE small frame with a column per touched (field, op) and
BROADCAST-joins onto the store — the corpus never shuffles; every merge
rule is a codegen CASE/array expression. The result is a NEW full table
(write it as the next generation — same newest-wins overlay discipline
as ``index/dv_updates.py``; Solr likewise writes a new segment rather
than mutating in place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OPS = ("set", "inc", "add", "add-distinct", "remove", "removeregex")


def apply_atomic_updates(docs: DataFrame, updates: list[dict],
                         id_col: str = "doc_id") -> DataFrame:
    """``updates`` = [{"id": <doc id>, "<field>": {"<op>": value}, …}, …]
    (the Solr JSON update shape). → the merged table, same schema.

    One op per (doc, field) per batch (Solr applies a later op to the
    earlier result inside one doc dict; split such updates into two
    batches — raising beats silently reordering)."""
    if not updates:
        return docs
    field_ops: dict[tuple[str, str], dict] = {}
    seen: set[tuple] = set()
    for u in updates:
        if "id" not in u:
            raise ValueError(f"update without id: {u!r}")
        did = u["id"]
        for fld, spec in u.items():
            if fld == "id":
                continue
            if not isinstance(spec, dict) or len(spec) != 1:
                raise ValueError(
                    f"field {fld!r}: expected one {{op: value}}, "
                    f"got {spec!r}")
            (op, val), = spec.items()
            if op not in OPS:
                raise ValueError(f"unknown atomic op {op!r}")
            if (did, fld) in seen:
                raise ValueError(
                    f"multiple ops for doc {did!r} field {fld!r} in one "
                    f"batch — split into sequential batches")
            seen.add((did, fld))
            field_ops.setdefault((fld, op), {})[did] = val
    missing = {f for f, _ in field_ops} - set(docs.columns)
    if missing:
        raise ValueError(f"unknown fields: {sorted(missing)}")

    spark = docs.sparkSession
    id_type = dict(docs.dtypes)[id_col]
    out = docs
    for (fld, op), vals in sorted(field_ops.items()):
        ftype = dict(docs.dtypes)[fld]
        is_arr = ftype.startswith("array")
        if op in ("add", "add-distinct", "remove", "removeregex") \
                and not is_arr:
            raise ValueError(f"{op!r} needs a multivalued field; "
                             f"{fld!r} is {ftype}")
        vcol = "_v"
        if op in ("add", "add-distinct", "remove"):
            rows = [(k, v if isinstance(v, list) else [v])
                    for k, v in vals.items()]
            vschema = f"_k {id_type}, _v {ftype}"
        elif op == "removeregex":
            rows = [(k, v if isinstance(v, list) else [v])
                    for k, v in vals.items()]
            vschema = f"_k {id_type}, _v array<string>"
        elif op == "inc":
            rows = [(k, float(v)) for k, v in vals.items()]
            vschema = f"_k {id_type}, _v double"
        else:   # set — keep an explicit marker so set-to-null works
            rows = [(k, [v] if v is not None else [])
                    for k, v in vals.items()]
            elem = ftype if not is_arr else ftype  # value typed as field
            vschema = f"_k {id_type}, _v array<{elem}>" if not is_arr \
                else f"_k {id_type}, _v {ftype}, _set_null boolean"
            if is_arr:
                rows = [(k, v if v is not None else None, v is None)
                        for k, v in vals.items()]
        upd = spark.createDataFrame(rows, vschema)
        out = out.join(F.broadcast(upd),
                       out[id_col] == upd["_k"], "left")
        f = F.col(fld)
        v = F.col(vcol)
        hit = F.col("_k").isNotNull()
        if op == "set":
            if is_arr:
                merged = F.when(~hit, f).when(F.col("_set_null"),
                                              F.lit(None).cast(ftype)) \
                          .otherwise(v)
            else:
                # F.get is null-on-empty — the set-to-null clear under
                # ANSI mode
                merged = F.when(hit, F.get(v, 0)).otherwise(f)
        elif op == "inc":
            merged = F.when(
                hit, (F.coalesce(f.cast("double"), F.lit(0.0)) + v)
                .cast(ftype)).otherwise(f)
        elif op == "add":
            merged = F.when(hit, F.concat(
                F.coalesce(f, F.array().cast(ftype)), v)).otherwise(f)
        elif op == "add-distinct":
            merged = F.when(hit, F.concat(
                F.coalesce(f, F.array().cast(ftype)),
                F.array_except(v, F.coalesce(f, F.array().cast(ftype)))
            )).otherwise(f)
        elif op == "remove":
            merged = F.when(hit, F.array_except(f, v)).otherwise(f)
        else:   # removeregex
            merged = F.when(hit, F.filter(
                f, lambda x: ~F.exists(
                    v, lambda p: F.regexp_like(x, p)))).otherwise(f)
        out = (out.withColumn(fld, merged)
               .drop("_k", vcol, *(["_set_null"]
                                   if op == "set" and is_arr else [])))
    return out.select(*docs.columns)
