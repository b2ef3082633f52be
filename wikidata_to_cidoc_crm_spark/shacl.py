"""SHACL-derived validation compiled to Spark SQL checks.

The reference validates every module's output graph with pySHACL against
1,214 lines of shapes (``/root/reference/src/wiki2crm/authors.py:413-431``,
``works.py:600-619``, ``relations.py:908-927``, shapes in
``src/wiki2crm/shapes/*.ttl``). pySHACL is an in-memory rdflib validator —
it cannot run on a 10^12-triple table. This module re-expresses the
SHACL-core constraint surface those shape files actually use as
*distributed DataFrame checks* over the canonical triple table:

* ``sh:targetClass`` / ``sh:targetNode`` / SPARQLTarget-by-URI-prefix →
  focus-set DataFrames,
* ``sh:minCount`` / ``sh:maxCount`` → per-focus aggregation,
* ``sh:datatype`` / ``sh:languageIn`` / ``sh:pattern`` / ``sh:nodeKind``
  → per-value column predicates,
* ``sh:hasValue`` → existence anti-join,
* ``sh:class`` (and ``sh:or`` of classes) → anti-join against the typed
  set,
* ``sh:node <Shape>`` → membership in the referenced shape's focus set
  (the referenced shape's own target validation covers its inner
  constraints — the standard scalable approximation),
* the ``sh:sparql`` "owl:sameAs must start wd:Q" checks → value-prefix
  predicates,
* ``sh:inversePath`` → the same machinery with focus on the object side.

Every transcribed constraint cites the shape file line it implements.
Violations come back as a DataFrame ``(shape, constraint, focus)``; use
:func:`validate_summary` for per-constraint counts. The whole validator is
joins + aggregations — no Python in the hot path, shuffles keyed on focus
URIs (uniform), class/typed dimensions broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import RDF_TYPE

WD_Q = "http://www.wikidata.org/entity/Q"


@dataclass(frozen=True)
class Prop:
    """One ``sh:property`` block (or sh:sparql value check)."""

    path: str
    inverse: bool = False
    min_count: int = 0
    max_count: int | None = None
    datatype: str | None = None
    language_in: tuple[str, ...] | None = None
    pattern: str | None = None
    has_value: str | None = None                       # IRI object must exist
    has_literal: tuple[str, str | None] | None = None  # (value, lang) must exist
    node_kind: str | None = None                       # "IRI" | "Literal"
    cls_any: tuple[str, ...] | None = None             # sh:class / sh:or classes
    node: str | None = None                            # referenced shape name
    starts_with: str | None = None                     # sh:sparql STRSTARTS check
    ref: str = ""


@dataclass(frozen=True)
class Shape:
    name: str
    target_kind: str  # "class" | "node" | "prefix"
    target: str
    props: tuple[Prop, ...] = field(default_factory=tuple)
    ref: str = ""


def _focus(triples: DataFrame, typed: DataFrame, nodes: DataFrame,
           shape: Shape) -> DataFrame:
    if shape.target_kind == "class":
        return typed.filter(F.col("cls") == shape.target).select("focus")
    if shape.target_kind == "node":
        return (
            nodes.filter(F.col("focus") == shape.target).select("focus").distinct()
        )
    if shape.target_kind == "prefix":
        return nodes.filter(F.col("focus").startswith(shape.target)) \
            .select("focus").distinct()
    raise ValueError(shape.target_kind)


def validate(triples: DataFrame, shapes: list[Shape]) -> DataFrame:
    """triples(subj,pred,obj,obj_is_iri,lang,dtype) → violations
    ``(shape, constraint, focus)``. Empty result = conforms."""
    spark = triples.sparkSession
    # materialize ONCE: every constraint branch below re-scans the triple
    # table; without this each of the ~100s of branches would replay the
    # entire upstream plan that produced `triples`
    t = triples.select("subj", "pred", "obj", "obj_is_iri", "lang", "dtype") \
        .localCheckpoint(eager=True)
    typed = (
        t.filter(F.col("pred") == RDF_TYPE)
        .select(F.col("subj").alias("focus"), F.col("obj").alias("cls"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        t.select(F.col("subj").alias("focus"))
        .union(t.filter("obj_is_iri").select(F.col("obj").alias("focus")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    by_name = {s.name: s for s in shapes}
    out: list[DataFrame] = []

    def viol(df: DataFrame, shape: Shape, constraint: str) -> None:
        out.append(df.select(
            F.lit(shape.name).alias("shape"),
            F.lit(constraint).alias("constraint"),
            F.col("focus"),
        ).distinct())

    for shape in shapes:
        focus = _focus(t, typed, nodes, shape).localCheckpoint(eager=True)
        for p in shape.props:
            if p.inverse:
                edges = t.filter(F.col("pred") == p.path).select(
                    F.col("obj").alias("focus"), F.col("subj").alias("val"),
                    F.lit(True).alias("val_is_iri"),
                    F.lit(None).cast("string").alias("val_lang"),
                    F.lit(None).cast("string").alias("val_dtype"),
                )
            else:
                edges = t.filter(F.col("pred") == p.path).select(
                    F.col("subj").alias("focus"), F.col("obj").alias("val"),
                    F.col("obj_is_iri").alias("val_is_iri"),
                    F.col("lang").alias("val_lang"),
                    F.col("dtype").alias("val_dtype"),
                )
            fedges = edges.join(focus, "focus", "left_semi")
            cname = ("^" if p.inverse else "") + \
                p.path.rsplit("/", 1)[-1].rsplit("#", 1)[-1].rsplit(":", 1)[-1]

            if p.min_count > 0 or p.max_count is not None:
                cnt = fedges.groupBy("focus").agg(F.count("*").alias("_n"))
                withc = focus.join(cnt, "focus", "left").select(
                    "focus", F.coalesce("_n", F.lit(0)).alias("_n"))
                if p.min_count > 0:
                    viol(withc.filter(F.col("_n") < p.min_count),
                         shape, f"{cname}.minCount{p.min_count}")
                if p.max_count is not None:
                    viol(withc.filter(F.col("_n") > p.max_count),
                         shape, f"{cname}.maxCount{p.max_count}")

            if p.node_kind == "IRI":
                viol(fedges.filter(~F.col("val_is_iri")), shape,
                     f"{cname}.nodeKindIRI")
            elif p.node_kind == "Literal":
                viol(fedges.filter(F.col("val_is_iri")), shape,
                     f"{cname}.nodeKindLiteral")
            if p.datatype is not None:
                viol(fedges.filter(
                    F.col("val_is_iri")
                    | F.col("val_dtype").isNull()
                    | (F.col("val_dtype") != p.datatype)),
                    shape, f"{cname}.datatype")
            if p.language_in is not None:
                viol(fedges.filter(
                    F.col("val_is_iri")
                    | F.col("val_lang").isNull()
                    | ~F.col("val_lang").isin(list(p.language_in))),
                    shape, f"{cname}.languageIn")
            if p.pattern is not None:
                viol(fedges.filter(
                    F.col("val_is_iri") | ~F.col("val").rlike(p.pattern)),
                    shape, f"{cname}.pattern")
            if p.starts_with is not None:
                viol(fedges.filter(~F.col("val").startswith(p.starts_with)),
                     shape, f"{cname}.startsWith")
            if p.has_value is not None:
                have = fedges.filter(
                    F.col("val_is_iri") & (F.col("val") == p.has_value)
                ).select("focus")
                viol(focus.join(have, "focus", "left_anti"), shape,
                     f"{cname}.hasValue")
            if p.has_literal is not None:
                v, lg = p.has_literal
                cond = (~F.col("val_is_iri")) & (F.col("val") == v)
                cond = cond & (
                    F.col("val_lang").isNull() if lg is None
                    else (F.col("val_lang") == lg))
                have = fedges.filter(cond).select("focus")
                viol(focus.join(have, "focus", "left_anti"), shape,
                     f"{cname}.hasLiteral")
            if p.cls_any is not None:
                ok_set = typed.filter(F.col("cls").isin(list(p.cls_any))) \
                    .select(F.col("focus").alias("val")).distinct()
                bad = fedges.filter(F.col("val_is_iri")) \
                    .join(ok_set, "val", "left_anti") \
                    .union(fedges.filter(~F.col("val_is_iri"))
                           .select(fedges.columns))
                viol(bad, shape, f"{cname}.class")
            if p.node is not None:
                ref_shape = by_name[p.node]
                members = _focus(t, typed, nodes, ref_shape) \
                    .select(F.col("focus").alias("val")).distinct()
                bad = fedges.filter(F.col("val_is_iri")) \
                    .join(members, "val", "left_anti") \
                    .union(fedges.filter(~F.col("val_is_iri"))
                           .select(fedges.columns))
                viol(bad, shape, f"{cname}.node({p.node})")

    if not out:
        return spark.createDataFrame([], "shape string, constraint string, focus string")
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result


def validate_summary(triples: DataFrame, shapes: list[Shape]) -> DataFrame:
    """(shape, constraint, n_violations) — one row per violated constraint."""
    return (
        validate(triples, shapes)
        .groupBy("shape", "constraint")
        .agg(F.count("*").alias("n_violations"))
        .orderBy("shape", "constraint")
    )
