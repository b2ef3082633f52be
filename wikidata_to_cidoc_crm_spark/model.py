"""Canonical triple model + the rule-driven triple-emission operator.

The reference accumulates triples into an in-memory rdflib ``Graph``
(set semantics, row-at-a-time ``g.add`` calls — e.g.
``/root/reference/src/wiki2crm/authors.py:282-293``). The Spark engine
replaces that with:

* one canonical triple DataFrame schema ``(subj, pred, obj, obj_is_iri,
  lang, dtype)`` (SURVEY.md §1.2),
* a declarative :class:`Rule` table per mapping stage — one rule per
  reference ``g.add`` line — compiled into a single
  ``explode(filter(array(struct(...)...)))`` projection, i.e. a generated
  *triple fan-out* that stays entirely inside whole-stage codegen
  (SURVEY.md §2.2 P13),
* set semantics restored by ``dropDuplicates`` on the triple key.

Scale notes: the emission projection is narrow (strings only), shuffles
nothing by itself, and the dedup shuffle is keyed on the full triple so it
is uniformly distributed even when subjects are skewed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Namespaces (behavioral parity: authors.py:33-40, works.py:34-43,
#     relations.py:35-46, map_and_align.py:23-46) ---
CRM = "http://www.cidoc-crm.org/cidoc-crm/"
ECRM = "http://erlangen-crm.org/current/"
LRMOO = "http://iflastandards.info/ns/lrm/lrmoo/"
# owl:imports target used by the reference's ontology headers
# (works.py:38, relations.py:41, merge.py:21)
LRMOO_ONTO = "https://cidoc-crm.org/extensions/lrmoo/owl/1.0/LRMoo_v1.0.owl"
FRBROO = "http://iflastandards.info/ns/fr/frbr/frbroo/"
EFRBROO = "http://erlangen-crm.org/efrbroo/"
INTRO = "https://w3id.org/lso/intro/currentbeta#"
PROV = "http://www.w3.org/ns/prov#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
WD = "http://www.wikidata.org/entity/"
SAPPHO = "https://sappho-digital.com/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF + "type"
RDFS_LABEL = RDFS + "label"
RDFS_SEEALSO = RDFS + "seeAlso"
OWL_SAMEAS = OWL + "sameAs"
PROV_DERIVED = PROV + "wasDerivedFrom"

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_iri", T.BooleanType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("dtype", T.StringType(), True),
    ]
)

# Full RDF-term identity: an IRI and a plain literal with the same lexical
# form are *different* terms, so obj_is_iri is part of the dedup key. (It
# also makes dropDuplicates deterministic across partitionings — no
# arbitrary winner between an IRI-flagged and literal-flagged duplicate.)
TRIPLE_KEY = ["subj", "pred", "obj", "obj_is_iri", "lang", "dtype"]


def ecrm(term: str) -> str:
    return ECRM + term


def lrmoo(term: str) -> str:
    return LRMOO + term


def intro(term: str) -> str:
    return INTRO + term


@dataclass(frozen=True)
class Rule:
    """One triple-emission rule ≙ one ``g.add`` call in the reference.

    ``subj``/``obj`` are Column expressions over the wide entity DataFrame;
    ``pred`` is a constant IRI. ``lang`` may be a constant string or a
    Column (works.py:468 uses a data-dependent lang). ``cond`` adds an
    emission predicate beyond the implicit subj/obj non-null check.
    ``ref`` cites the reference line implemented, for parity audits.
    """

    subj: Column
    pred: str
    obj: Column
    obj_is_iri: bool = True
    lang: Column | str | None = None
    dtype: str | None = None
    cond: Column | None = None
    ref: str = ""


def _lang_col(lang: Column | str | None) -> Column:
    if lang is None:
        return F.lit(None).cast("string")
    if isinstance(lang, str):
        return F.lit(lang)
    return lang.cast("string")


def emit_triples(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Compile a rule table into one narrow fan-out projection.

    Produces ``len(rules)`` candidate structs per input row, drops the ones
    whose condition/nullability fails, explodes. No Python in the hot path;
    the whole operator is a single ``Project + Generate`` in the physical
    plan (verified via ``.explain``), so it rides whole-stage codegen and
    scales linearly with input rows.
    """
    structs = []
    for r in rules:
        subj = F.lit(r.subj) if isinstance(r.subj, str) else r.subj
        obj = F.lit(r.obj) if isinstance(r.obj, str) else r.obj
        cond = subj.isNotNull() & obj.isNotNull()
        if r.cond is not None:
            cond = cond & r.cond
        structs.append(
            F.when(
                cond,
                F.struct(
                    subj.cast("string").alias("subj"),
                    F.lit(r.pred).alias("pred"),
                    obj.cast("string").alias("obj"),
                    F.lit(bool(r.obj_is_iri)).alias("obj_is_iri"),
                    _lang_col(r.lang).alias("lang"),
                    F.lit(r.dtype).cast("string").alias("dtype"),
                ),
            )
        )
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    return df.select(F.explode(arr).alias("t")).select("t.*")


def const_triples(
    spark: SparkSession,
    triples: Iterable[tuple],
) -> DataFrame:
    """Constant triple block (ontology headers, equivalence axioms — e.g.
    authors.py:148-179). Accepts (s, p, o), (s, p, o, is_iri),
    (s, p, o, is_iri, lang) or full 6-tuples."""
    rows = []
    for t in triples:
        s, p, o = t[0], t[1], t[2]
        is_iri = t[3] if len(t) > 3 else True
        lang = t[4] if len(t) > 4 else None
        dtype = t[5] if len(t) > 5 else None
        rows.append((s, p, o, is_iri, lang, dtype))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def dedupe_triples(df: DataFrame) -> DataFrame:
    """Set semantics of the rdflib Graph (duplicate ``g.add`` is a no-op).

    Shuffle key is the full triple → uniform distribution even under
    subject skew (a head QID's triples differ in pred/obj)."""
    return df.dropDuplicates(TRIPLE_KEY)


def triples_to_python_set(df: DataFrame, max_rows: int = 1_000_000) -> set[tuple]:
    """Test-scale helper: collect to a comparable set of 6-tuples
    ``(subj, pred, obj, lang, dtype, obj_is_iri)`` — the IRI/literal flag is
    part of term identity, so golden comparisons catch IRI-vs-literal drift.

    Guarded like linking.py's surface collect: a misrouted production-scale
    graph must fail loudly here instead of OOMing the driver."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"triples_to_python_set: refusing to collect {n} rows "
            f"(> {max_rows}); this helper is for test-scale graphs only")
    return {
        (r["subj"], r["pred"], r["obj"], r["lang"], r["dtype"], bool(r["obj_is_iri"]))
        for r in df.select("subj", "pred", "obj", "lang", "dtype", "obj_is_iri").collect()
    }
