"""Authors stage — biographical CIDOC-CRM sub-graph.

Behavioral spec: ``/root/reference/src/wiki2crm/authors.py:254-363``
(``process_authors``); SPARQL optionals at authors.py:190-198. The
reference loops per QID and row; here it is one declarative plan:

    person QIDs ⟕ pivoted statements ⟕ labels → wide author DF
      → rule-driven triple fan-out (model.emit_triples)
      → union constant header → dropDuplicates

Determinism decision (SURVEY.md §4.4.7 / §2.4 A5): the reference keeps the
*first* SPARQL binding per person (arrival order — non-deterministic); this
engine takes the per-attribute ``min`` instead, a documented divergence.

Known reference bug honored as *intended* semantics (SURVEY.md §4.4.1):
authors.py:362-363 references an undefined ``visual_item_uri_uri`` — the
intended triples (seeAlso + wasDerivedFrom on ``visual_item/{qid}``, per
README.md:269-273) are emitted here.

Scale notes: statements are filtered to 6 pids *before* the pivot
(predicate pushdown to the parquet scan), the pivot is a single hash
aggregate keyed by subject QID, and label joins broadcast the dimension.
The person-QID side may be huge (every person linked in 10^12 docs) — it
shuffles only for the final dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import date_only
from ..functions.uris import mint, qid_from_uri, timespan_uri, wd_entity_uri
from ..model import (
    ECRM,
    OWL_SAMEAS,
    PROV_DERIVED,
    RDF_TYPE,
    RDFS_LABEL,
    RDFS_SEEALSO,
    SAPPHO,
    XSD,
    Rule,
    dedupe_triples,
    emit_triples,
)
from .constants import authors_header
from ..session import lazy_checkpoint

AUTHOR_PIDS = ["P21", "P19", "P20", "P569", "P570", "P18"]
XSD_DATE = XSD + "date"
ID_TYPE_WIKIDATA = SAPPHO + "id_type/wikidata"
GENDER_TYPE_WIKIDATA = SAPPHO + "gender_type/wikidata"


def wide_authors(
    person_qids: DataFrame,
    statements: DataFrame,
    labels: DataFrame,
    broadcast_labels: bool | None = None,
) -> DataFrame:
    """Build the wide author DataFrame (one row per person QID).

    Equivalent of the authors SPARQL SELECT (authors.py:187-200): each
    OPTIONAL property becomes a pivoted nullable column; the label service
    becomes broadcast joins against ``wd_labels``.
    """
    stmts = statements.filter(F.col("pid").isin(AUTHOR_PIDS)).join(
        person_qids.withColumnRenamed("qid", "subject_qid"),
        "subject_qid",
        "left_semi",
    )
    # deterministic first-binding rule: per-attribute min (SURVEY §2.4 A5)
    pivoted = (
        stmts.groupBy("subject_qid")
        .pivot("pid", AUTHOR_PIDS)
        .agg(F.min("object_value"))
        .withColumnRenamed("subject_qid", "qid")
    )
    wide = person_qids.join(pivoted, "qid", "left")

    # ONE canonical (qid, label) build side shared by all four label joins:
    # identical build-side subtrees let Spark reuse a single broadcast
    # exchange (ReusedExchange) instead of building the hash relation per
    # join site. The checkpoint pins the subtree so canonical equality is
    # structural, not incidental.
    lab_en = labels.filter(F.col("lang") == "en").select(
        F.col("qid").alias("_lqid"), F.col("label").alias("_label")
    ).transform(lazy_checkpoint)
    # gate the forced label broadcast on dimension size (shuffle-join
    # fallback for fact-sized label tables — same rule as relations_stage)
    from .relations import LABEL_BROADCAST_MAX

    if broadcast_labels is None:
        broadcast_labels = labels.count() <= LABEL_BROADCAST_MAX
    _maybe_bcast = F.broadcast if broadcast_labels else (lambda df: df)

    def attach_label(df: DataFrame, key: str, out: str) -> DataFrame:
        return df.join(
            _maybe_bcast(lab_en),
            F.col(key) == F.col("_lqid"),
            "left",
        ).withColumnRenamed("_label", out).drop("_lqid")

    wide = attach_label(wide, "qid", "item_label")
    wide = attach_label(wide, "P21", "gender_label")
    wide = attach_label(wide, "P19", "birth_place_label")
    wide = attach_label(wide, "P20", "death_place_label")

    return wide.select(
        "qid",
        # authors.py:273-275 label fallback
        F.coalesce("item_label", F.format_string("Unknown (%s)", "qid")).alias("label"),
        F.col("P21").alias("gender_qid"),
        "gender_label",
        date_only("P569").alias("birth_date"),
        date_only("P570").alias("death_date"),
        F.col("P19").alias("birth_place_qid"),
        "birth_place_label",
        F.col("P20").alias("death_place_qid"),
        "death_place_label",
        F.col("P18").alias("image_url"),
    )


def _event_rules(kind: str, date_col: str, place_qid: str, place_label: str,
                 cls: str, inverse_prop: str, direct_prop: str) -> list[Rule]:
    """Birth/death block (authors.py:299-335). Event exists iff date or place."""
    person = mint("person", "qid")
    event = mint(kind, "qid")
    has_event = F.col(date_col).isNotNull() | F.col(place_qid).isNotNull()
    ts = timespan_uri(date_col)
    place = mint("place", place_qid)
    ref = "authors.py:299-335"
    return [
        Rule(person, ECRM + inverse_prop, event, cond=has_event, ref=ref),
        Rule(event, ECRM + direct_prop, person, cond=has_event, ref=ref),
        Rule(event, RDF_TYPE, ECRM + cls, cond=has_event, ref=ref),
        Rule(event, RDFS_LABEL,
             F.format_string(f"{kind.capitalize()} of %s", "label"),
             obj_is_iri=False, lang="en", cond=has_event, ref="authors.py:309"),
        Rule(event, PROV_DERIVED, wd_entity_uri("qid"), cond=has_event,
             ref="authors.py:310"),
        # timespan (authors.py:313-321)
        Rule(ts, RDF_TYPE, ECRM + "E52_Time-Span", ref="authors.py:316"),
        Rule(ts, RDFS_LABEL, F.col(date_col), obj_is_iri=False,
             dtype=XSD_DATE, ref="authors.py:317"),
        Rule(event, ECRM + "P4_has_time-span", ts, ref="authors.py:319"),
        Rule(ts, ECRM + "P4i_is_time-span_of", event, ref="authors.py:320"),
        # place (authors.py:323-334)
        Rule(event, ECRM + "P7_took_place_at", place, ref="authors.py:327"),
        Rule(place, ECRM + "P7i_witnessed", event, ref="authors.py:328"),
        Rule(place, RDF_TYPE, ECRM + "E53_Place", ref="authors.py:329"),
        Rule(place, OWL_SAMEAS, wd_entity_uri(place_qid), ref="authors.py:330"),
        Rule(place, RDFS_LABEL, F.col(place_label), obj_is_iri=False,
             lang="en", ref="authors.py:332-334"),
    ]


def author_rules() -> list[Rule]:
    person = mint("person", "qid")
    identifier = mint("identifier", "qid")
    id_type = F.lit(ID_TYPE_WIKIDATA)
    rules = [
        # person core (authors.py:281-293)
        Rule(person, RDF_TYPE, ECRM + "E21_Person", ref="authors.py:281"),
        Rule(person, OWL_SAMEAS, wd_entity_uri("qid"), ref="authors.py:282"),
        Rule(person, RDFS_LABEL, F.col("label"), obj_is_iri=False, lang="en",
             ref="authors.py:283"),
        Rule(person, ECRM + "P1_is_identified_by", identifier, ref="authors.py:285"),
        Rule(identifier, ECRM + "P1i_identifies", person, ref="authors.py:286"),
        Rule(identifier, RDF_TYPE, ECRM + "E42_Identifier", ref="authors.py:287"),
        Rule(identifier, RDFS_LABEL, F.col("qid"), obj_is_iri=False,
             ref="authors.py:288"),
        Rule(identifier, ECRM + "P2_has_type", id_type, ref="authors.py:289"),
        Rule(id_type, ECRM + "P2i_is_type_of", identifier, ref="authors.py:290"),
        Rule(id_type, RDF_TYPE, ECRM + "E55_Type", ref="authors.py:291"),
        Rule(id_type, RDFS_LABEL, F.lit("Wikidata ID"), obj_is_iri=False,
             lang="en", ref="authors.py:292"),
    ]
    rules += _event_rules("birth", "birth_date", "birth_place_qid",
                          "birth_place_label", "E67_Birth",
                          "P98i_was_born", "P98_brought_into_life")
    rules += _event_rules("death", "death_date", "death_place_qid",
                          "death_place_label", "E69_Death",
                          "P100i_died_in", "P100_was_death_of")

    # gender block (authors.py:337-355) — requires gender AND genderLabel
    has_gender = F.col("gender_qid").isNotNull() & F.col("gender_label").isNotNull()
    gender = mint("gender", "gender_qid")
    gtype = F.lit(GENDER_TYPE_WIKIDATA)
    rules += [
        Rule(gender, RDF_TYPE, ECRM + "E55_Type", cond=has_gender, ref="authors.py:341"),
        Rule(gender, RDFS_LABEL, F.col("gender_label"), obj_is_iri=False,
             lang="en", cond=has_gender, ref="authors.py:342"),
        Rule(gender, OWL_SAMEAS, wd_entity_uri("gender_qid"), cond=has_gender,
             ref="authors.py:343"),
        Rule(gender, ECRM + "P2_has_type", gtype, cond=has_gender, ref="authors.py:344"),
        Rule(gtype, ECRM + "P2i_is_type_of", gender, cond=has_gender, ref="authors.py:345-349"),
        Rule(gtype, RDF_TYPE, ECRM + "E55_Type", cond=has_gender, ref="authors.py:351"),
        Rule(gtype, RDFS_LABEL, F.lit("Wikidata Gender"), obj_is_iri=False,
             lang="en", cond=has_gender, ref="authors.py:352"),
        Rule(mint("person", "qid"), ECRM + "P2_has_type", gender,
             cond=has_gender, ref="authors.py:354"),
        Rule(gender, ECRM + "P2i_is_type_of", mint("person", "qid"),
             cond=has_gender, ref="authors.py:355"),
    ]

    # image block (authors.py:357-363; intended semantics per SURVEY §4.4.1)
    has_image = F.col("image_url").isNotNull()
    visual = mint("visual_item", "qid")
    rules += [
        Rule(visual, RDF_TYPE, ECRM + "E36_Visual_Item", cond=has_image,
             ref="authors.py:359"),
        Rule(visual, RDFS_LABEL,
             F.format_string("Visual representation of %s", "label"),
             obj_is_iri=False, lang="en", cond=has_image, ref="authors.py:360"),
        Rule(visual, ECRM + "P138_represents", person, cond=has_image,
             ref="authors.py:361"),
        Rule(person, ECRM + "P138i_has_representation", visual, cond=has_image,
             ref="authors.py:361"),
        Rule(visual, RDFS_SEEALSO, F.col("image_url"), cond=has_image,
             ref="authors.py:362 (intended)"),
        Rule(visual, PROV_DERIVED, wd_entity_uri("qid"), cond=has_image,
             ref="authors.py:363 (intended)"),
    ]
    return rules


def authors_stage(
    spark: SparkSession,
    person_qids: DataFrame,
    statements: DataFrame,
    labels: DataFrame,
    include_header: bool = True,
    dedupe: bool = True,
    broadcast_labels: bool | None = None,
) -> DataFrame:
    import os as _os

    if _os.environ.get("SPARK_GRAFT_SQL_STAGES", "1") != "0":
        from .sql_stages import authors_stage_sql

        return authors_stage_sql(
            spark, person_qids, statements, labels,
            include_header=include_header, dedupe=dedupe,
            broadcast_labels=broadcast_labels)
    wide = wide_authors(person_qids, statements, labels, broadcast_labels)
    triples = emit_triples(wide, author_rules())
    if include_header:
        triples = triples.unionByName(authors_header(spark))
    # dedupe=False lets the pipeline defer set semantics to the merge stage
    # (one shuffle instead of four); the triple *set* is identical
    return dedupe_triples(triples) if dedupe else triples
