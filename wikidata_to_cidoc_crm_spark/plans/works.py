"""Works stage — bibliographic WEMI stack (F1 Work → F2 Expression →
F3 Manifestation → F5 Item + the four creation events).

Behavioral spec: ``/root/reference/src/wiki2crm/works.py:333-552`` with the
SPARQL optionals at works.py:251-269. The reference iterates *binding rows*
(one per combination of multi-valued optionals); this engine reproduces that
multiplicity with per-property left joins — triple-set dedup restores set
semantics, so multi-valued attributes emit exactly the reference's triples.

Determinism/bug positions (SURVEY.md §4.4):
* works.py:398 title self-loop ``(title, P190i_is_content_of, title)`` is
  replicated as-is (it is in the golden outputs).
* ``pub_date`` is ``MIN(P577)`` per work (works.py:252) — the reference's
  GROUP BY keys make the min per-combination, which equals per-work.
* label-service columns resolve en→de→QID (WDQS semantics).
* ``fetch_label`` (works.py:285-305) requires a *de* label, falling back to
  "Untitled"@en — replicated via a de-label join.

Scale notes: every property join is an equi-join on the work QID. The
statement slices are filtered by pid *before* joining (scan-level pushdown);
on a cluster the statements table is bucketed by subject_qid so these joins
co-partition without re-shuffling; label joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import year_of
from ..functions.uris import mint, qid_from_uri, wd_entity_uri
from ..model import (
    ECRM,
    LRMOO,
    OWL_SAMEAS,
    PROV_DERIVED,
    RDF_TYPE,
    RDFS_LABEL,
    RDFS_SEEALSO,
    SAPPHO,
    WD,
    XSD,
    Rule,
    dedupe_triples,
    emit_triples,
)
from .constants import works_header
from ..session import lazy_checkpoint

XSD_GYEAR = XSD + "gYear"
ID_TYPE_WIKIDATA = SAPPHO + "id_type/wikidata"
GENRE_TYPE_WIKIDATA = SAPPHO + "genre_type/wikidata"
# works.py:399 — note /wiki/, not /entity/ (reference oddity, replicated)
WIKIDATA_ID_TYPE_SAMEAS = "http://www.wikidata.org/wiki/Q43649390"


def _slice(statements: DataFrame, pid: str, out: str,
           entity_valued: bool = True) -> DataFrame:
    s = statements.filter(F.col("pid") == pid)
    return s.select(F.col("subject_qid").alias("qid"),
                    F.col("object_value").alias(out))


def wide_works(
    work_qids: DataFrame,
    statements: DataFrame,
    labels: DataFrame,
    broadcast_labels: bool | None = None,
) -> DataFrame:
    if broadcast_labels is None:
        # gate the forced label broadcast on dimension size — same
        # shuffle-join fallback as relations_stage (LABEL_BROADCAST_MAX);
        # at real-Wikidata label volume a forced broadcast would OOM.
        from .relations import LABEL_BROADCAST_MAX

        broadcast_labels = labels.count() <= LABEL_BROADCAST_MAX
    _maybe_bcast = F.broadcast if broadcast_labels else (lambda df: df)
    stmts = statements.join(
        work_qids.withColumnRenamed("qid", "subject_qid"), "subject_qid", "left_semi"
    )
    w = work_qids

    # P1476 titles with language filter (works.py:254-255)
    t = statements.filter(F.col("pid") == "P1476")
    title_de = t.filter(F.col("object_lang") == "de").select(
        F.col("subject_qid").alias("qid"), F.col("object_value").alias("title_de"))
    title_en = t.filter(F.col("object_lang") == "en").select(
        F.col("subject_qid").alias("qid"), F.col("object_value").alias("title_en"))
    w = w.join(title_de, "qid", "left").join(title_en, "qid", "left")

    for pid, out in [("P136", "genre_qid"), ("P50", "author_qid"),
                     ("P291", "pub_place_qid"), ("P123", "publisher_qid"),
                     ("P953", "digital_copy"), ("P98", "editor_qid"),
                     ("P1433", "published_in"), ("P361", "part_of")]:
        w = w.join(_slice(stmts, pid, out), "qid", "left")

    # MIN(pub_date) per work (works.py:252)
    pub = (
        stmts.filter(F.col("pid") == "P577")
        .groupBy("subject_qid")
        .agg(F.min("object_value").alias("pub_date_raw"))
        .withColumnRenamed("subject_qid", "qid")
    )
    w = w.join(pub, "qid", "left")

    # creation date = P571 ∪ P2754 (works.py:265) — union keeps multiplicity
    creation = (
        stmts.filter(F.col("pid").isin(["P571", "P2754"]))
        .select(F.col("subject_qid").alias("qid"),
                F.col("object_value").alias("creation_date_raw"))
    )
    w = w.join(creation, "qid", "left")

    # label-service joins: ONE canonical (qid, en, de) build side shared by
    # all six label joins — identical build-side subtrees let Spark reuse a
    # single broadcast exchange (ReusedExchange) instead of building the
    # label hash relation six times (the build is single-threaded and was
    # the works stage's dominant fixed cost at large label dimensions).
    svc_all = (
        labels.groupBy("qid").pivot("lang", ["en", "de"]).agg(F.min("label"))
        .select(F.col("qid").alias("_lq"), F.col("en").alias("_len"),
                F.col("de").alias("_lde"))
        .transform(lazy_checkpoint)
    )
    for key, out in [("qid", "work_label"), ("genre_qid", "genre_label"),
                     ("author_qid", "author_label"), ("pub_place_qid", "pub_place_label"),
                     ("publisher_qid", "publisher_label"), ("editor_qid", "editor_label")]:
        w = w.join(_maybe_bcast(svc_all), F.col(key) == F.col("_lq"), "left") \
            .withColumn(
                out,
                F.coalesce(F.col("_len"), F.col("_lde"),
                           F.col(key) if key != "qid" else F.col("qid")),
            ).drop("_lq", "_len", "_lde")

    # fetch_label for publishedIn/partOf parents: de label required,
    # else "Untitled"@en (works.py:285-305) — same shared-build-side shape
    dl_all = (
        labels.filter(F.col("lang") == "de")
        .select(F.col("qid").alias("_dq"), F.col("label").alias("_dl"))
        .transform(lazy_checkpoint)
    )
    for key, out in [("published_in", "published_in_de"), ("part_of", "part_of_de")]:
        w = w.join(_maybe_bcast(dl_all), F.col(key) == F.col("_dq"), "left") \
            .withColumnRenamed("_dl", out).drop("_dq")

    # label_for (works.py:308-316): title_de→de, title_en→en, workLabel→'de',
    # else Untitled→en. work_label is never null here (QID fallback), matching
    # the label service which always returns a value.
    label = F.coalesce("title_de", "title_en", "work_label", F.lit("Untitled"))
    lang = (
        F.when(F.col("title_de").isNotNull(), "de")
        .when(F.col("title_en").isNotNull(), "en")
        .when(F.col("work_label").isNotNull(), "de")
        .otherwise("en")
    )
    # manifestation label (works.py:318-330 + override at 452-462):
    # publishedIn → fetch_label(parent), elif partOf → fetch_label(parent),
    # else expression label
    manif_label = (
        F.when(F.col("published_in").isNotNull(),
               F.coalesce("published_in_de", F.lit("Untitled")))
        .when(F.col("part_of").isNotNull(),
              F.coalesce("part_of_de", F.lit("Untitled")))
        .otherwise(label)
    )
    manif_lang = (
        F.when(F.col("published_in").isNotNull(),
               F.when(F.col("published_in_de").isNotNull(), "de").otherwise("en"))
        .when(F.col("part_of").isNotNull(),
              F.when(F.col("part_of_de").isNotNull(), "de").otherwise("en"))
        .otherwise(lang)
    )
    return (
        w.withColumn("label", label)
        .withColumn("label_lang", lang)
        .withColumn("manif_label", manif_label)
        .withColumn("manif_lang", manif_lang)
        .withColumn("creation_year", year_of("creation_date_raw"))
        .withColumn("pub_year", year_of("pub_date_raw"))
    )


def work_rules() -> list[Rule]:
    work = mint("work", "qid")
    expr = mint("expression", "qid")
    wd_uri = wd_entity_uri("qid")
    lbl = F.col("label")
    rules = [
        # work core (works.py:361-364)
        Rule(work, RDF_TYPE, LRMOO + "F1_Work", ref="works.py:361"),
        Rule(work, RDFS_LABEL, F.format_string("Work of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:362"),
        Rule(work, LRMOO + "R3_is_realised_in", expr, ref="works.py:363"),
        Rule(expr, LRMOO + "R3i_realises", work, ref="works.py:364"),
    ]
    # work creation (works.py:367-372)
    wc = mint("work_creation", "qid")
    rules += [
        Rule(wc, RDF_TYPE, LRMOO + "F27_Work_Creation", ref="works.py:367"),
        Rule(wc, RDFS_LABEL, F.format_string("Work creation of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:368"),
        Rule(wc, LRMOO + "R16_created", work, ref="works.py:369"),
        Rule(work, LRMOO + "R16i_was_created_by", wc, ref="works.py:370"),
        Rule(wc, PROV_DERIVED, wd_uri, ref="works.py:371"),
    ]
    # author block (works.py:374-382)
    author = mint("person", "author_qid")
    rules += [
        Rule(wc, ECRM + "P14_carried_out_by", author, ref="works.py:376"),
        Rule(author, ECRM + "P14i_performed", wc, ref="works.py:377"),
        Rule(author, RDF_TYPE, ECRM + "E21_Person", ref="works.py:379"),
        Rule(author, RDFS_LABEL, F.col("author_label"), obj_is_iri=False,
             ref="works.py:380 (no lang tag)"),
        Rule(author, OWL_SAMEAS, wd_entity_uri("author_qid"), ref="works.py:381"),
    ]
    # expression core + identifier + id_type + title (works.py:385-403)
    ident = mint("identifier", "qid")
    id_type = F.lit(ID_TYPE_WIKIDATA)
    title = mint("title/expression", "qid")
    rules += [
        Rule(expr, RDF_TYPE, LRMOO + "F2_Expression", ref="works.py:385"),
        Rule(expr, RDFS_LABEL, F.format_string("Expression of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:386"),
        Rule(expr, ECRM + "P1_is_identified_by", ident, ref="works.py:388"),
        Rule(ident, ECRM + "P1i_identifies", expr, ref="works.py:389"),
        Rule(ident, RDF_TYPE, ECRM + "E42_Identifier", ref="works.py:390"),
        Rule(ident, RDFS_LABEL, F.col("qid"), obj_is_iri=False, ref="works.py:391"),
        Rule(ident, ECRM + "P2_has_type", id_type, ref="works.py:392"),
        Rule(id_type, ECRM + "P2i_is_type_of", ident, ref="works.py:393"),
        Rule(id_type, RDF_TYPE, ECRM + "E55_Type", ref="works.py:396"),
        Rule(id_type, RDFS_LABEL, F.lit("Wikidata ID"), obj_is_iri=False,
             lang="en", ref="works.py:397"),
        Rule(id_type, OWL_SAMEAS, F.lit(WIKIDATA_ID_TYPE_SAMEAS), ref="works.py:398"),
        Rule(expr, ECRM + "P102_has_title", title, ref="works.py:400"),
        Rule(title, ECRM + "P102i_is_title_of", expr, ref="works.py:401"),
        Rule(title, RDF_TYPE, ECRM + "E35_Title", ref="works.py:402"),
        # reference self-loop bug replicated (SURVEY §4.4.2)
        Rule(title, ECRM + "P190i_is_content_of", title, ref="works.py:403"),
        Rule(expr, OWL_SAMEAS, wd_uri, ref="works.py:421"),
        Rule(expr, PROV_DERIVED, wd_uri, ref="works.py:422"),
    ]
    # genre block (works.py:405-419)
    genre = mint("genre", "genre_qid")
    gtype = F.lit(GENRE_TYPE_WIKIDATA)
    has_genre = F.col("genre_qid").isNotNull()
    rules += [
        Rule(genre, RDF_TYPE, ECRM + "E55_Type", ref="works.py:410"),
        Rule(genre, RDFS_LABEL, F.col("genre_label"), obj_is_iri=False,
             lang="en", ref="works.py:411"),
        Rule(genre, OWL_SAMEAS, wd_entity_uri("genre_qid"), ref="works.py:412"),
        Rule(genre, ECRM + "P2_has_type", gtype, ref="works.py:413"),
        Rule(gtype, ECRM + "P2i_is_type_of", genre, ref="works.py:414"),
        Rule(gtype, RDF_TYPE, ECRM + "E55_Type", cond=has_genre, ref="works.py:415"),
        Rule(gtype, RDFS_LABEL, F.lit("Wikidata Genre"), obj_is_iri=False,
             lang="en", cond=has_genre, ref="works.py:416"),
        Rule(expr, ECRM + "P2_has_type", genre, ref="works.py:418"),
        Rule(genre, ECRM + "P2i_is_type_of", expr, ref="works.py:419"),
    ]
    # expression creation (works.py:425-436)
    ec = mint("expression_creation", "qid")
    rules += [
        Rule(ec, RDF_TYPE, LRMOO + "F28_Expression_Creation", ref="works.py:426"),
        Rule(ec, RDFS_LABEL, F.format_string("Expression creation of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:427"),
        Rule(ec, LRMOO + "R17_created", expr, ref="works.py:428"),
        Rule(expr, LRMOO + "R17i_was_created_by", ec, ref="works.py:429"),
        Rule(ec, LRMOO + "R19_created_a_realisation_of", work, ref="works.py:430"),
        Rule(work, LRMOO + "R19i_was_realised_through", ec, ref="works.py:431"),
        Rule(ec, PROV_DERIVED, wd_uri, ref="works.py:432"),
        # author carries out expression creation — direct only (works.py:435)
        Rule(ec, ECRM + "P14_carried_out_by", author, ref="works.py:435"),
    ]
    # creation timespan (works.py:437-446)
    cts = mint("timespan", "creation_year")
    rules += [
        Rule(cts, RDF_TYPE, ECRM + "E52_Time-Span", ref="works.py:441"),
        Rule(cts, RDFS_LABEL, F.col("creation_year"), obj_is_iri=False,
             dtype=XSD_GYEAR, ref="works.py:442"),
        Rule(ec, ECRM + "P4_has_time-span", cts, ref="works.py:444"),
        Rule(cts, ECRM + "P4i_is_time-span_of", ec, ref="works.py:445"),
    ]
    # manifestation + its title (works.py:449-467)
    manif = mint("manifestation", "qid")
    mtitle = mint("title/manifestation", "qid")
    mtstr = mint("title_string/manifestation", "qid")
    rules += [
        Rule(manif, RDF_TYPE, LRMOO + "F3_Manifestation", ref="works.py:450"),
        Rule(manif, RDFS_LABEL, F.format_string("Manifestation of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:451"),
        Rule(manif, LRMOO + "R4_embodies", expr, ref="works.py:452"),
        Rule(expr, LRMOO + "R4i_is_embodied_in", manif, ref="works.py:453"),
        Rule(manif, ECRM + "P102_has_title", mtitle, ref="works.py:463"),
        Rule(mtitle, ECRM + "P102i_is_title_of", manif, ref="works.py:464"),
        Rule(mtitle, RDF_TYPE, ECRM + "E35_Title", ref="works.py:465"),
        Rule(mtitle, ECRM + "P190_has_symbolic_content", mtstr, ref="works.py:466"),
        Rule(mtitle, RDFS_LABEL, F.col("manif_label"), obj_is_iri=False,
             lang=F.col("manif_lang"), ref="works.py:467"),
    ]
    # manifestation creation (works.py:470-479)
    mc = mint("manifestation_creation", "qid")
    rules += [
        Rule(mc, RDF_TYPE, LRMOO + "F30_Manifestation_Creation", ref="works.py:472"),
        Rule(mc, RDFS_LABEL,
             F.format_string("Manifestation creation of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:473"),
        Rule(mc, LRMOO + "R24_created", manif, ref="works.py:474"),
        Rule(manif, LRMOO + "R24i_was_created_through", mc, ref="works.py:475"),
        Rule(mc, PROV_DERIVED, wd_uri, ref="works.py:476"),
        Rule(mc, ECRM + "P14_carried_out_by", author, ref="works.py:478"),
        Rule(author, ECRM + "P14i_performed", mc, ref="works.py:479"),
    ]
    # publisher (works.py:481-490)
    publisher = mint("publisher", "publisher_qid")
    rules += [
        Rule(publisher, RDF_TYPE, ECRM + "E74_Group", ref="works.py:486"),
        Rule(publisher, RDFS_LABEL, F.col("publisher_label"), obj_is_iri=False,
             lang="en", ref="works.py:487"),
        Rule(publisher, OWL_SAMEAS, wd_entity_uri("publisher_qid"), ref="works.py:488"),
        Rule(mc, ECRM + "P14_carried_out_by", publisher, ref="works.py:489"),
        Rule(publisher, ECRM + "P14i_performed", mc, ref="works.py:490"),
    ]
    # publication timespan (works.py:492-501)
    pts = mint("timespan", "pub_year")
    rules += [
        Rule(pts, RDF_TYPE, ECRM + "E52_Time-Span", ref="works.py:497"),
        Rule(pts, RDFS_LABEL, F.col("pub_year"), obj_is_iri=False,
             dtype=XSD_GYEAR, ref="works.py:498"),
        Rule(mc, ECRM + "P4_has_time-span", pts, ref="works.py:500"),
        Rule(pts, ECRM + "P4i_is_time-span_of", mc, ref="works.py:501"),
    ]
    # publication place (works.py:503-512)
    pplace = mint("place", "pub_place_qid")
    rules += [
        Rule(pplace, RDF_TYPE, ECRM + "E53_Place", ref="works.py:508"),
        Rule(pplace, RDFS_LABEL, F.col("pub_place_label"), obj_is_iri=False,
             lang="en", ref="works.py:509"),
        Rule(pplace, OWL_SAMEAS, wd_entity_uri("pub_place_qid"), ref="works.py:510"),
        Rule(mc, ECRM + "P7_took_place_at", pplace, ref="works.py:511"),
        Rule(pplace, ECRM + "P7i_witnessed", mc, ref="works.py:512"),
    ]
    # editor (works.py:514-530)
    editor = mint("person", "editor_qid")
    eid = mint("identifier", "editor_qid")
    rules += [
        Rule(editor, RDF_TYPE, ECRM + "E21_Person", ref="works.py:517"),
        Rule(editor, RDFS_LABEL, F.col("editor_label"), obj_is_iri=False,
             ref="works.py:518 (no lang tag)"),
        Rule(editor, OWL_SAMEAS, wd_entity_uri("editor_qid"), ref="works.py:519"),
        Rule(editor, ECRM + "P1_is_identified_by", eid, ref="works.py:522"),
        Rule(eid, ECRM + "P1i_identifies", editor, ref="works.py:523"),
        Rule(eid, RDF_TYPE, ECRM + "E42_Identifier", ref="works.py:524"),
        Rule(eid, RDFS_LABEL, F.col("editor_qid"), obj_is_iri=False, ref="works.py:525"),
        Rule(eid, ECRM + "P2_has_type", id_type, ref="works.py:526"),
        Rule(id_type, ECRM + "P2i_is_type_of", eid, ref="works.py:527"),
        Rule(mc, ECRM + "P14_carried_out_by", editor, ref="works.py:529"),
        Rule(editor, ECRM + "P14i_performed", mc, ref="works.py:530"),
    ]
    # item production + item (works.py:532-546)
    ip = mint("item_production", "qid")
    item = mint("item", "qid")
    rules += [
        Rule(ip, RDF_TYPE, LRMOO + "F32_Item_Production_Event", ref="works.py:535"),
        Rule(ip, RDFS_LABEL,
             F.format_string("Item production event of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:536"),
        Rule(ip, LRMOO + "R27_materialized", manif, ref="works.py:537"),
        Rule(manif, LRMOO + "R27i_was_materialized_by", ip, ref="works.py:538"),
        Rule(ip, LRMOO + "R28_produced", item, ref="works.py:539"),
        Rule(item, LRMOO + "R28i_was_produced_by", ip, ref="works.py:540"),
        Rule(item, RDF_TYPE, LRMOO + "F5_Item", ref="works.py:542"),
        Rule(item, RDFS_LABEL, F.format_string("Item of %s", "label"),
             obj_is_iri=False, lang="en", ref="works.py:543"),
        Rule(item, LRMOO + "R7_exemplifies", manif, ref="works.py:544"),
        Rule(manif, LRMOO + "R7i_is_exemplified_by", item, ref="works.py:545"),
    ]
    # digital copy (works.py:548-554)
    digital = mint("digital", "qid")
    has_digital = F.col("digital_copy").isNotNull()
    rules += [
        Rule(digital, RDF_TYPE, ECRM + "E73_Information_Object",
             cond=has_digital, ref="works.py:549"),
        Rule(digital, RDFS_LABEL, F.format_string("Digital copy of %s", "label"),
             obj_is_iri=False, lang="en", cond=has_digital, ref="works.py:550"),
        Rule(digital, ECRM + "P138_represents", expr, cond=has_digital,
             ref="works.py:551"),
        Rule(expr, ECRM + "P138i_has_representation", digital,
             cond=has_digital, ref="works.py:552"),
        Rule(digital, RDFS_SEEALSO, F.col("digital_copy"), cond=has_digital,
             ref="works.py:553"),
    ]
    return rules


def works_stage(
    spark: SparkSession,
    work_qids: DataFrame,
    statements: DataFrame,
    labels: DataFrame,
    include_header: bool = True,
    dedupe: bool = True,
    broadcast_labels: bool | None = None,
) -> DataFrame:
    import os as _os

    if _os.environ.get("SPARK_GRAFT_SQL_STAGES", "1") != "0":
        from .sql_stages import works_stage_sql

        return works_stage_sql(
            spark, work_qids, statements, labels,
            include_header=include_header, dedupe=dedupe,
            broadcast_labels=broadcast_labels)
    wide = wide_works(work_qids, statements, labels, broadcast_labels)
    triples = emit_triples(wide, work_rules())
    if include_header:
        triples = triples.unionByName(works_header(spark))
    return dedupe_triples(triples) if dedupe else triples
