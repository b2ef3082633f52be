"""Relations stage — INTRO intertextuality sub-graph.

Behavioral spec: ``/root/reference/src/wiki2crm/relations.py:299-877`` —
nine sequential processors (int31, plots, citations, topics, motifs,
persons, places, characters, work references). Rebuilt as parallel
DataFrame pipelines over a shared (work, feature) edge table:

* property subsumption (``wdt:P1647*``) → broadcast join against
  ``wd_property_closure`` (J4),
* type checks (``wdt:P31/wdt:P279*``) → semi-join against
  ``wd_subclass_closure`` (J5),
* ``combinations(works, 2)`` → self-join pair generation (J8,
  operators.pairs.pair_join) — skew-prone on hub features; AQE skew-join
  plus optional salting handle it,
* rdflib idempotency guards → generate-then-dropDuplicates (U4), with two
  order-dependent exceptions reproduced explicitly:
  - **first-pair-wins actualization links** (add_actualization's early
    return, relations.py:252-253): an act/expression R24-links only to the
    relation of the first sorted pair its work appears in
    (operators.pairs.first_partner);
  - **interpretation-tid collisions** (add_interpretation keys interps by
    the last URI segment, relations.py:206-233): when a work_ref act's tid
    equals its own relation's tid (tgt < src) the relation's interpretation
    wins and the act only contributes R21 links. Generalized via a
    priority-windowed dedup over interpretation creation triples.

Determinism decisions (documented divergences): works and targets iterate
in sorted order; a citation pair present in both directions keeps the
lexicographically smaller (src, tgt).

Scale notes: all family pipelines share one scan of statements; pair
generation is quadratic per feature by *specification* (the reference's own
output is quadratic) — the per-feature fan-out is the data, not an
implementation artifact. Dimension joins (closures, labels, input QID set)
broadcast; the final dedup shuffles on the full triple key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.uris import mint, wd_entity_uri
from ..model import (
    ECRM,
    INTRO,
    LRMOO,
    OWL_SAMEAS,
    PROV_DERIVED,
    RDF_TYPE,
    RDFS_LABEL,
    SAPPHO,
    WD,
    Rule,
    dedupe_triples,
    emit_triples,
)
from ..operators.pairs import first_partner, pair_join
from .constants import relations_header
from ..session import lazy_checkpoint

ID_TYPE = SAPPHO + "id_type/wikidata"

# (family, base pids, type ancestors, feature path, feature class,
#  feature label fmt, act label fmt, p67 node kind, processor priority)
FAMILIES = [
    ("plot", ["P921"], ("Q42109240",), "feature/plot", INTRO + "INT_Plot",
     "%s (plot)", "%s in %s", None, 2),
    ("topic", ["P921"], ("Q26256810",), "feature/topic", INTRO + "INT_Topic",
     "%s (topic)", "%s in %s", None, 4),
    ("motif", ["P6962"], None, "feature/motif", INTRO + "INT_Motif",
     "%s (motif)", "%s in %s", None, 5),
    ("person_ref", ["P180", "P921", "P527"], ("Q5",), "feature/person_ref",
     INTRO + "INT18_Reference", "Reference to %s (person)",
     "Reference to %s in %s", "person", 6),
    ("place_ref", ["P921"], ("Q2221906",), "feature/place_ref",
     INTRO + "INT18_Reference", "Reference to %s (place)",
     "Reference to %s in %s", "place", 7),
    ("character", ["P674"], None, "feature/character", INTRO + "INT_Character",
     "%s", "%s in %s", None, 8),
]


def _label_lookup(labels: DataFrame) -> DataFrame:
    """(qid, lbl): label-service semantics en → de → QID (relations.py:122-135)."""
    en = labels.filter(F.col("lang") == "en").select("qid", F.col("label").alias("_en"))
    de = labels.filter(F.col("lang") == "de").select("qid", F.col("label").alias("_de"))
    return en.join(de, "qid", "full_outer").select(
        "qid", F.coalesce("_en", "_de").alias("_lbl")
    )


# above this many label rows the dimension no longer broadcasts safely
# (~90M Wikidata labels ≈ several GB) — fall back to a shuffle join
LABEL_BROADCAST_MAX = 20_000_000


def _attach_label(df: DataFrame, lab: DataFrame, key: str, out: str,
                  broadcast_hint: bool = True) -> DataFrame:
    """Join ``lab`` (canonical ``(__lk, __lv)`` build side) onto ``df``.

    All ~15 call sites share the SAME build-side subtree, so Spark builds
    the broadcast hash relation once and ReusedExchange serves the rest —
    per-site aliasing would defeat the exchange-reuse rule."""
    l = F.broadcast(lab) if broadcast_hint else lab
    return (
        df.join(l, F.col(key) == F.col("__lk"), "left")
        .withColumn(out, F.coalesce("__lv", key))
        .drop("__lk", "__lv")
    )


def _identifier_rules(entity, qid_col: str) -> list[Rule]:
    """add_identifier (relations.py:170-180): 7 triples, lang-tagged label."""
    ident = mint("identifier", qid_col)
    ref = "relations.py:170-180"
    return [
        Rule(ident, RDF_TYPE, ECRM + "E42_Identifier", ref=ref),
        Rule(ident, RDFS_LABEL, F.col(qid_col), obj_is_iri=False, lang="en", ref=ref),
        Rule(ident, ECRM + "P2_has_type", F.lit(ID_TYPE), ref=ref),
        Rule(F.lit(ID_TYPE), ECRM + "P2i_is_type_of", ident, ref=ref),
        Rule(ident, PROV_DERIVED, wd_entity_uri(qid_col), ref=ref),
        Rule(entity, ECRM + "P1_is_identified_by", ident, ref=ref),
        Rule(ident, ECRM + "P1i_identifies", entity, ref=ref),
    ]


# --- shared emission rule tables (used by BOTH the classic DataFrame build
# below and the SQL-compiled build in plans/sql_stages.py — single source of
# truth so the two paths cannot drift) ---

def rel_rules() -> list[Rule]:
    rel_label = F.format_string(
        "Intertextual relation between %s and %s", "la", "lb")
    return [
        Rule(F.col("rel"), RDF_TYPE, INTRO + "INT31_IntertextualRelation",
             ref="relations.py:286"),
        Rule(F.col("rel"), RDFS_LABEL, rel_label, obj_is_iri=False, lang="en",
             ref="relations.py:287-289"),
    ]


def act_rules() -> list[Rule]:
    return [
        Rule(F.col("act"), RDF_TYPE, INTRO + "INT2_ActualizationOfFeature",
             ref="relations.py:246"),
        Rule(F.col("act"), RDFS_LABEL, F.col("alabel"), obj_is_iri=False,
             lang="en", ref="relations.py:247"),
        Rule(F.col("feat_uri"), INTRO + "R17i_featureIsActualizedIn", F.col("act"),
             ref="relations.py:249"),
        Rule(F.col("act"), INTRO + "R17_actualizesFeature", F.col("feat_uri"),
             ref="relations.py:250"),
        Rule(F.col("act"), INTRO + "R18i_actualizationFoundOn", F.col("expr"),
             ref="relations.py:252"),
        Rule(F.col("expr"), INTRO + "R18_showsActualization", F.col("act"),
             ref="relations.py:253"),
        # first-pair-wins R24 links (relations.py:255-258)
        Rule(F.col("act"), INTRO + "R24i_isRelatedEntity", F.col("rel"),
             ref="relations.py:255"),
        Rule(F.col("rel"), INTRO + "R24_hasRelatedEntity", F.col("act"),
             ref="relations.py:256"),
        Rule(F.col("expr"), INTRO + "R24i_isRelatedEntity", F.col("rel"),
             ref="relations.py:257"),
        Rule(F.col("rel"), INTRO + "R24_hasRelatedEntity", F.col("expr"),
             ref="relations.py:258"),
    ]


def _interp_cols():
    interp_feat = F.concat(F.lit(SAPPHO + "feature/interpretation/"), F.col("tid"))
    interp_act = F.concat(F.lit(SAPPHO + "actualization/interpretation/"), F.col("tid"))
    return interp_feat, interp_act


def interp_creation_rules() -> list[Rule]:
    interp_feat, interp_act = _interp_cols()
    return [
        Rule(interp_feat, RDF_TYPE, INTRO + "INT_Interpretation",
             ref="relations.py:210"),
        Rule(interp_feat, RDFS_LABEL, F.col("ilabel"), obj_is_iri=False,
             lang="en", ref="relations.py:211"),
        Rule(interp_act, RDF_TYPE, INTRO + "INT2_ActualizationOfFeature",
             ref="relations.py:214"),
        Rule(interp_act, RDFS_LABEL, F.col("ilabel"), obj_is_iri=False,
             lang="en", ref="relations.py:215"),
        Rule(interp_feat, INTRO + "R17i_featureIsActualizedIn", interp_act,
             ref="relations.py:224"),
        Rule(interp_act, INTRO + "R17_actualizesFeature", interp_feat,
             ref="relations.py:225"),
    ]


def interp_derived_rules() -> list[Rule]:
    _, interp_act = _interp_cols()
    return [Rule(interp_act, PROV_DERIVED, wd_entity_uri("dq"),
                 ref="relations.py:219-221")]


def interp_links_rules() -> list[Rule]:
    _, interp_act = _interp_cols()
    return [
        Rule(interp_act, INTRO + "R21_identifies", F.col("target"),
             ref="relations.py:227"),
        Rule(F.col("target"), INTRO + "R21i_isIdentifiedBy", interp_act,
             ref="relations.py:228"),
    ]


def r22_rules() -> list[Rule]:
    return [
        Rule(F.col("feat_uri"), INTRO + "R22_providesSimilarityForRelation",
             F.col("rel"), ref="relations.py:396-398"),
        Rule(F.col("rel"), INTRO + "R22i_relationIsBasedOnSimilarity",
             F.col("feat_uri"), ref="relations.py:396-398"),
    ]


def p67_rules() -> list[Rule]:
    return [
        Rule(F.col("act"), ECRM + "P67_refers_to", F.col("p67_target"),
             ref="relations.py:552-558"),
        Rule(F.col("p67_target"), ECRM + "P67i_is_referred_to_by", F.col("act"),
             ref="relations.py:552-558"),
    ]


def feat_node_rules() -> list[Rule]:
    cls_map = F.create_map(*[x for f in FAMILIES for x in (F.lit(f[0]), F.lit(f[4]))])
    flabel_col = (
        F.when(F.col("family") == "plot", F.format_string("%s (plot)", "tlbl"))
        .when(F.col("family") == "topic", F.format_string("%s (topic)", "tlbl"))
        .when(F.col("family") == "motif", F.format_string("%s (motif)", "tlbl"))
        .when(F.col("family") == "person_ref",
              F.format_string("Reference to %s (person)", "tlbl"))
        .when(F.col("family") == "place_ref",
              F.format_string("Reference to %s (place)", "tlbl"))
        .otherwise(F.col("tlbl"))  # character (no suffix, relations.py:737)
    )
    is_entity_feat = F.col("family").isin(["plot", "topic", "motif", "character"])
    return [
        Rule(F.col("feat_uri"), RDF_TYPE, cls_map[F.col("family")],
             ref="relations.py:182-203"),
        Rule(F.col("feat_uri"), RDFS_LABEL, flabel_col,
             obj_is_iri=False, lang="en", ref="relations.py:182-203"),
        Rule(F.col("feat_uri"), OWL_SAMEAS, wd_entity_uri("tgt"),
             cond=is_entity_feat, ref="relations.py:196-198"),
    ] + [
        Rule(r.subj, r.pred, r.obj, obj_is_iri=r.obj_is_iri, lang=r.lang,
             dtype=r.dtype, cond=is_entity_feat, ref=r.ref)
        for r in _identifier_rules(F.col("feat_uri"), "tgt")
    ]


def person_node_rules() -> list[Rule]:
    return [
        Rule(mint("person", "tgt"), RDF_TYPE, ECRM + "E21_Person",
             ref="relations.py:530-537"),
        Rule(mint("person", "tgt"), RDFS_LABEL, F.col("tlbl"), obj_is_iri=False,
             lang="en", ref="relations.py:531"),
        Rule(mint("person", "tgt"), OWL_SAMEAS, wd_entity_uri("tgt"),
             ref="relations.py:532"),
    ] + _identifier_rules(mint("person", "tgt"), "tgt")


def charp_feat_rules() -> list[Rule]:
    return [
        Rule(F.concat(F.lit(SAPPHO + "feature/person_ref/"), "tgt"), RDF_TYPE,
             INTRO + "INT18_Reference", ref="relations.py:681-683"),
        Rule(F.concat(F.lit(SAPPHO + "feature/person_ref/"), "tgt"), RDFS_LABEL,
             F.format_string("Reference to %s (person)", "tlbl"),
             obj_is_iri=False, lang="en", ref="relations.py:683"),
    ]


def place_node_rules() -> list[Rule]:
    return [
        Rule(mint("place", "tgt"), RDF_TYPE, ECRM + "E53_Place",
             ref="relations.py:584-591"),
        Rule(mint("place", "tgt"), RDFS_LABEL, F.col("tlbl"), obj_is_iri=False,
             lang="en", ref="relations.py:585"),
        Rule(mint("place", "tgt"), OWL_SAMEAS, wd_entity_uri("tgt"),
             ref="relations.py:586"),
    ] + _identifier_rules(mint("place", "tgt"), "tgt")


def workref_feat_rules() -> list[Rule]:
    return [
        Rule(F.concat(F.lit(SAPPHO + "feature/work_ref/"), "tgt"), RDF_TYPE,
             INTRO + "INT18_Reference", ref="relations.py:641-644"),
        Rule(F.concat(F.lit(SAPPHO + "feature/work_ref/"), "tgt"), RDFS_LABEL,
             F.format_string("Reference to %s (expression)", "tlbl"),
             obj_is_iri=False, lang="en", ref="relations.py:644"),
    ]


def expr_rules() -> list[Rule]:
    return [
        Rule(mint("expression", "q"), RDF_TYPE, LRMOO + "F2_Expression",
             ref="relations.py:184"),
        Rule(mint("expression", "q"), RDFS_LABEL,
             F.format_string("Expression of %s", "qlbl"), obj_is_iri=False,
             lang="en", ref="relations.py:185"),
        Rule(mint("expression", "q"), OWL_SAMEAS, wd_entity_uri("q"),
             ref="relations.py:186"),
    ]


def tp_rules() -> list[Rule]:
    rules: list[Rule] = []
    for host, other, hl in [("tgt", "src", "tlbl"), ("src", "tgt", "slbl")]:
        tp = F.concat(F.lit(SAPPHO + "textpassage/"), F.col(host), F.lit("_"), F.col(other))
        host_expr = mint("expression", host)
        rules += [
            Rule(tp, RDF_TYPE, INTRO + "INT21_TextPassage", ref="relations.py:801"),
            Rule(tp, RDFS_LABEL, F.format_string("Text passage in %s", hl),
                 obj_is_iri=False, lang="en", ref="relations.py:802"),
            Rule(tp, PROV_DERIVED, wd_entity_uri("tgt"), ref="relations.py:803"),
            Rule(host_expr, INTRO + "R30_hasTextPassage", tp, ref="relations.py:805"),
            Rule(tp, INTRO + "R30i_isTextPassageOf", host_expr, ref="relations.py:806"),
            Rule(F.col("rel"), INTRO + "R24_hasRelatedEntity", tp, ref="relations.py:807"),
            Rule(tp, INTRO + "R24i_isRelatedEntity", F.col("rel"), ref="relations.py:808"),
        ]
    return rules


def relations_stage(
    spark: SparkSession,
    work_qids: DataFrame,
    statements: DataFrame,
    labels: DataFrame,
    subclass_closure: DataFrame,
    property_closure: DataFrame,
    include_header: bool = True,
    dedupe: bool = True,
    broadcast_labels: bool | None = None,
) -> DataFrame:
    import os as _os

    if _os.environ.get("SPARK_GRAFT_SQL_STAGES", "1") != "0":
        from .sql_stages import relations_stage_sql

        return relations_stage_sql(
            spark, work_qids, statements, labels, subclass_closure,
            property_closure, include_header=include_header, dedupe=dedupe,
            broadcast_labels=broadcast_labels)
    # Driver-side plan construction is this stage's dominant fixed cost
    # (~10 checkpoint plannings + py4j traffic), so the independent
    # checkpointed subplans are built from a small thread pool — JVM-side
    # Catalyst planning of distinct subtrees runs in parallel, and the
    # resulting PLANS are identical to the serial build (threading only
    # reorders construction, never content).
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=4, thread_name_prefix="rel-plan")
    # try/finally: reap worker threads if any plan build raises —
    # otherwise in-flight builds keep running (and mutating the shared
    # AQE toggle) after the stage has aborted, and the pool leaks
    try:

        # canonical build side for every label attach (see _attach_label) —
        # the checkpoint pins the subtree so exchange reuse is structural
        f_lab = pool.submit(lambda: _label_lookup(labels).select(
            F.col("qid").alias("__lk"), F.col("_lbl").alias("__lv")
        ).transform(lazy_checkpoint))
        # gate the forced label broadcast on dimension size (shuffle-join
        # fallback for fact-sized label tables); callers that already know the
        # dimension size pass the flag to avoid a per-stage recount
        lab_bcast = (labels.count() <= LABEL_BROADCAST_MAX
                     if broadcast_labels is None else broadcast_labels)

        def _attach(df, l, k, o):
            return _attach_label(df, l, k, o, broadcast_hint=lab_bcast)

        W = work_qids.select("qid").distinct()
        # canonical membership build side: every "∈ W" semi-join shares this
        # exact subtree so the broadcast hash relation is built once and
        # ReusedExchange serves the ~8 other sites (per-site renames would
        # force a fresh single-threaded build each time)
        Wb = W.select(F.col("qid").alias("__wq")).transform(lazy_checkpoint)

        def in_W(df: DataFrame, key: str) -> DataFrame:
            return df.join(F.broadcast(Wb), F.col(key) == F.col("__wq"), "left_semi")

        def pids_of(bases: list[str]) -> DataFrame:
            return property_closure.filter(F.col("base_pid").isin(bases)).select("pid").distinct()

        def edges(bases: list[str]) -> DataFrame:
            """(work, tgt) claims whose pid subsumes one of ``bases``, work ∈ W."""
            return (
                statements.join(F.broadcast(pids_of(bases)), "pid")
                .filter(F.col("object_is_entity"))
                .select(F.col("subject_qid").alias("work"), F.col("object_value").alias("tgt"))
                .transform(lambda d: in_W(d, "work"))
                .distinct()
            )

        def typed(ancestors: tuple[str, ...]) -> DataFrame:
            """entities with P31/P279* reaching one of ``ancestors`` (J5)."""
            p31 = statements.filter(F.col("pid") == "P31").select(
                F.col("subject_qid").alias("tgt"), F.col("object_value").alias("cls"))
            anc = subclass_closure.filter(F.col("ancestor").isin(list(ancestors))).select(
                F.col("qid").alias("cls"))
            return p31.join(F.broadcast(anc), "cls", "left_semi").select("tgt").distinct()

        # --- ONE tagged edge table for all six families (single statements
        # scan routed through a broadcast (pid → family) dim; type requirements
        # via a broadcast (ancestor → family) dim). This collapses the six
        # per-family pipelines into one qualify + one pair join + one
        # first-partner window — far fewer jobs, and at scale one shuffle
        # instead of six. ---
        fam_bases = {f[0]: f[1] for f in FAMILIES}
        fam_bases["character_typed"] = ["P180", "P921"]  # relations.py:700-707
        pid_fam = None
        for fam, bases in fam_bases.items():
            part = pids_of(bases).withColumn("family", F.lit(fam))
            pid_fam = part if pid_fam is None else pid_fam.unionByName(part)
        typed_req = {
            "plot": ["Q42109240"], "topic": ["Q26256810"], "person_ref": ["Q5"],
            "place_ref": ["Q2221906"], "character_typed": ["Q3658341", "Q15632617"],
        }
        anc_fam = spark.createDataFrame(
            [(a, f) for f, ancs in typed_req.items() for a in ancs],
            "ancestor string, family string")
        p31 = statements.filter(F.col("pid") == "P31").select(
            F.col("subject_qid").alias("tgt"), F.col("object_value").alias("cls"))
        typed_pairs = (
            p31.join(F.broadcast(subclass_closure.withColumnRenamed("qid", "cls")), "cls")
            .join(F.broadcast(anc_fam), "ancestor")
            .select("tgt", "family")
            .distinct()
        )
        def _build_fw_chain():
            """fw_all → qfw_all → all_pairs: the stage's longest dependent
            checkpoint chain, built on one thread."""
            fw_all0 = (
                statements.filter(F.col("object_is_entity"))
                .join(F.broadcast(pid_fam), "pid")
                .select("family", F.col("subject_qid").alias("work"),
                        F.col("object_value").alias("tgt"))
                .transform(lambda d: in_W(d, "work"))
            )
            fw_typed = fw_all0.filter(F.col("family").isin(list(typed_req))).join(
                typed_pairs, ["tgt", "family"], "left_semi")
            fw_untyped = fw_all0.filter(F.col("family").isin(["motif", "character"]))
            fw_all = (
                fw_typed.unionByName(fw_untyped)
                .withColumn("family",
                            F.when(F.col("family") == "character_typed", "character")
                            .otherwise(F.col("family")))
                .distinct()
                .transform(lazy_checkpoint)
            )
            # qualifying features: shared by ≥2 works (HAVING COUNT(DISTINCT
            # ?wrk)>1, relations.py:371-372 / len(works)<2 guards)
            q = (
                fw_all.groupBy("family", "tgt").agg(F.countDistinct("work").alias("n"))
                .filter(F.col("n") >= 2).select("family", "tgt")
            )
            qfw = fw_all.join(q, ["family", "tgt"], "left_semi").transform(lazy_checkpoint)
            # --- pairs for all families at once (J8) ---
            # hub features (> heavy_threshold works) go through the salted join
            # so one popular topic cannot pin the whole stage on a single
            # reducer: a key with n members generates C(n,2) pairs in ONE task
            # otherwise (measured 3.4x stage speedup at world_scale=400 on
            # local[32]). threshold 256 caps the unsalted per-key burst at ~32k.
            pairs = pair_join(qfw, key=["family", "tgt"], work="work",
                              salt_partitions=32, heavy_threshold=256) \
                .transform(lazy_checkpoint)
            return qfw, pairs

        def _build_workref():
            # work references (relations.py:616-669): tgt ∈ W too; no ≥2 gate
            return (
                edges(["P921"])
                .filter(F.col("tgt").startswith("Q"))
                .transform(lambda d: in_W(d, "tgt"))
                .transform(lazy_checkpoint)
            )

        def _build_cite_kept():
            # citations (relations.py:765-818): (tgt=subject) cites (src=object);
            # both-directions dedup keeps lexicographically smaller (src, tgt)
            cite_directed = (
                edges(["P2860", "P6166"])
                .transform(lambda d: in_W(d, "tgt"))
                .select(F.col("tgt").alias("src"), F.col("work").alias("tgt"))
                .filter(F.col("src") != F.col("tgt"))
            )
            return (
                cite_directed.groupBy(
                    F.least("src", "tgt").alias("_a"), F.greatest("src", "tgt").alias("_b"))
                .agg(F.min(F.struct("src", "tgt")).alias("_p"))
                .select(F.col("_p.src").alias("src"), F.col("_p.tgt").alias("tgt"))
                .transform(lazy_checkpoint)
            )

        f_fw = pool.submit(_build_fw_chain)
        f_workref = pool.submit(_build_workref)
        f_cite = pool.submit(_build_cite_kept)

        # int31 direct links (relations.py:299-354): forward P4969; reversed
        # P144/P5059/P941 (SURVEY §4.4.3)
        int31_fwd = in_W(edges(["P4969"]), "tgt").select(F.col("work").alias("wa"), F.col("tgt").alias("wb"))
        int31_bwd = in_W(edges(["P144", "P5059", "P941"]), "tgt").select(F.col("tgt").alias("wa"), F.col("work").alias("wb"))
        int31_pairs = int31_fwd.unionByName(int31_bwd).filter(F.col("wa") != F.col("wb"))

        qfw_all, all_pairs = f_fw.result()
        workref = f_workref.result()
        cite_kept = f_cite.result()
        lab = f_lab.result()
        fam_acts = first_partner(qfw_all, key=["family", "tgt"], work="work")

        # workref pairs/acts: rel per (src, tgt); act key {tgt}_{src}
        workref_pairs = workref.select(
            F.col("tgt"), F.col("work").alias("src")).filter(F.col("src") != F.col("tgt"))

        # --- relation nodes: every pair from every source (canonical, distinct) ---
        rel_members = (
            all_pairs.select("w1", "w2")
            .unionByName(int31_pairs.select(F.col("wa").alias("w1"), F.col("wb").alias("w2")))
            .unionByName(workref_pairs.select(F.col("src").alias("w1"), F.col("tgt").alias("w2")))
            .unionByName(cite_kept.select(F.col("src").alias("w1"), F.col("tgt").alias("w2")))
        )
        def _build_rels():
            r = (
                rel_members.select(
                    F.least("w1", "w2").alias("w1"), F.greatest("w1", "w2").alias("w2"))
                .distinct()
            )
            r = _attach(r, lab, "w1", "l1")
            r = _attach(r, lab, "w2", "l2")
            # casefold-sorted label pair (relations.py:284)
            return r.withColumn(
                "la", F.when(F.lower("l1") <= F.lower("l2"), F.col("l1")).otherwise(F.col("l2"))
            ).withColumn(
                "lb", F.when(F.lower("l1") <= F.lower("l2"), F.col("l2")).otherwise(F.col("l1"))
            ).withColumn("rel", F.concat(F.lit(SAPPHO + "relation/"), "w1", F.lit("_"), "w2")
            ).withColumn("tid", F.concat("w1", F.lit("_"), "w2")).transform(lazy_checkpoint)

        f_rels = pool.submit(_build_rels)

        # --- acts (family + workref); per-family label/priority as expressions ---
        def _build_acts():
            fa = _attach(fam_acts, lab, "tgt", "tlbl")
            fa = _attach(fa, lab, "work", "wlbl")
            prio_map = F.create_map(*[x for f in FAMILIES for x in (F.lit(f[0]), F.lit(f[8]))])
            is_ref_fam = F.col("family").isin(["person_ref", "place_ref"])
            a = fa.select(
                "tgt", "work", "rel_w1", "rel_w2", "tlbl", "wlbl", "family",
                F.col("family").alias("typ"),
                F.when(is_ref_fam, F.format_string("Reference to %s in %s", "tlbl", "wlbl"))
                .otherwise(F.format_string("%s in %s", "tlbl", "wlbl")).alias("alabel"),
                prio_map[F.col("family")].alias("prio"),
            )
            workref_acts = _attach(workref_pairs, lab, "tgt", "tlbl")
            workref_acts = _attach(workref_acts, lab, "src", "wlbl")
            workref_acts = workref_acts.select(
                "tgt", F.col("src").alias("work"),
                F.least("src", "tgt").alias("rel_w1"), F.greatest("src", "tgt").alias("rel_w2"),
                "tlbl", "wlbl",
                F.lit("work_ref").alias("family"), F.lit("work_ref").alias("typ"),
                F.format_string("Reference to %s in %s", "tlbl", "wlbl").alias("alabel"),
                F.lit(9).alias("prio"),
            )
            a = a.unionByName(workref_acts)
            return a.withColumn(
                "act", F.concat(F.lit(SAPPHO + "actualization/"), "typ", F.lit("/"),
                                "tgt", F.lit("_"), "work")
            ).withColumn(
                "feat_uri",
                F.concat(F.lit(SAPPHO + "feature/"), "typ", F.lit("/"), "tgt"),
            ).withColumn(
                "rel", F.concat(F.lit(SAPPHO + "relation/"), "rel_w1", F.lit("_"), "rel_w2")
            ).withColumn("expr", mint("expression", "work")).transform(lazy_checkpoint)

        f_acts = pool.submit(_build_acts)

        rels = f_rels.result()

        rel_triples = emit_triples(rels, rel_rules())

        # --- interpretations ---
        # creation candidates carry a priority; per tid the lowest priority wins
        # (rdflib first-writer-wins guard, relations.py:206-233)
        rel_interp_src = rels.select(
            "tid",
            F.format_string("Interpretation of intertextual relation between %s and %s",
                            "la", "lb").alias("ilabel"),
            F.array("w1", "w2").alias("derived"),
            F.col("rel").alias("target"),
            F.lit(0).alias("prio"),
        )

        acts = f_acts.result()
    finally:
        pool.shutdown(wait=True, cancel_futures=True)

    act_triples = emit_triples(acts, act_rules())

    # act interpretations (add_interpretation via add_actualization,
    # relations.py:260-273)
    act_interp_src = acts.select(
        F.concat("tgt", F.lit("_"), "work").alias("tid"),
        F.format_string(
            "Interpretation of %s",
            F.regexp_replace("alabel", "^Reference to ", "")).alias("ilabel"),
        F.array("work").alias("derived"),
        F.col("act").alias("target"),
        "prio",
    )

    interp_all = rel_interp_src.unionByName(act_interp_src)
    # ilabel tiebreak keeps the winner deterministic even if two sources
    # ever emit the same (tid, prio, target) with different labels
    wnd = Window.partitionBy("tid").orderBy("prio", "target", "ilabel")
    interp_all = interp_all.withColumn("rank", F.row_number().over(wnd)).transform(lazy_checkpoint)
    creators = interp_all.filter(F.col("rank") == 1)

    interp_creation = emit_triples(creators, interp_creation_rules())
    interp_derived = emit_triples(
        creators.select("tid", F.explode("derived").alias("dq")),
        interp_derived_rules(),
    )
    interp_links = emit_triples(interp_all, interp_links_rules())

    # --- R22 similarity links: per (feature, pair) for ALL pairs
    # (relations.py:396-398) ---
    r22_fam = all_pairs.select(
        "family", "tgt", "w1", "w2",
        F.concat(F.lit(SAPPHO + "feature/"), "family", F.lit("/"), "tgt").alias("feat_uri"),
    )
    r22_workref = workref_pairs.select(
        F.lit("work_ref").alias("family"), "tgt",
        F.least("src", "tgt").alias("w1"), F.greatest("src", "tgt").alias("w2"),
        F.concat(F.lit(SAPPHO + "feature/work_ref/"), "tgt").alias("feat_uri"),
    )
    r22 = r22_fam.unionByName(r22_workref).withColumn(
        "rel", F.concat(F.lit(SAPPHO + "relation/"), "w1", F.lit("_"), "w2"))
    r22_triples = emit_triples(r22, r22_rules())

    # --- P67 reference links: per act (relations.py:552-558,605-611,
    # 754-758, 667-668) ---
    p67_map = {"person_ref": "person", "place_ref": "place"}
    p67 = acts.filter(F.col("family").isin(list(p67_map)))
    p67 = p67.withColumn(
        "p67_target",
        F.when(F.col("family") == "person_ref", mint("person", "tgt"))
        .otherwise(mint("place", "tgt")),
    )
    # character acts link to person/{char} when the char is typed Q5
    char_persons = typed(("Q5",)).withColumnRenamed("tgt", "cq")
    char_p67 = acts.filter(F.col("family") == "character").join(
        char_persons, F.col("tgt") == F.col("cq"), "left_semi"
    ).withColumn("p67_target", mint("person", "tgt"))
    # work_ref acts link to expression/{tgt}
    workref_p67 = acts.filter(F.col("family") == "work_ref").withColumn(
        "p67_target", mint("expression", "tgt"))
    p67_all = p67.unionByName(char_p67).unionByName(workref_p67)
    p67_triples = emit_triples(p67_all, p67_rules())

    # --- feature nodes: one emission over the tagged (family, tgt) set ---
    feat_triple_parts = []
    ftgts = qfw_all.select("family", "tgt").distinct()
    ftgts = _attach(ftgts, lab, "tgt", "tlbl").withColumn(
        "feat_uri", F.concat(F.lit(SAPPHO + "feature/"), "family", F.lit("/"), "tgt"))
    feat_triple_parts.append(emit_triples(ftgts, feat_node_rules()))

    # person/place entity nodes for the *_ref families (relations.py:528-537,
    # 582-591) + person nodes & person_ref features for person-characters
    # (ensure_person_reference, relations.py:670-684)
    person_tgts = qfw_all.filter(F.col("family") == "person_ref").select("tgt").distinct()
    char_person_tgts = qfw_all.filter(F.col("family") == "character") \
        .select("tgt").distinct().join(
        char_persons, F.col("tgt") == F.col("cq"), "left_semi")
    person_nodes = person_tgts.unionByName(char_person_tgts).distinct()
    person_nodes = _attach(person_nodes, lab, "tgt", "tlbl")
    feat_triple_parts.append(emit_triples(person_nodes, person_node_rules()))
    # person_ref feature node also exists for person-characters
    charp_feats = _attach(char_person_tgts, lab, "tgt", "tlbl")
    feat_triple_parts.append(emit_triples(charp_feats, charp_feat_rules()))

    place_tgts = _attach(
        qfw_all.filter(F.col("family") == "place_ref").select("tgt").distinct(),
        lab, "tgt", "tlbl")
    feat_triple_parts.append(emit_triples(place_tgts, place_node_rules()))

    # work_ref feature nodes — every target, no ≥2 gate (relations.py:641-647)
    workref_tgts = _attach(workref.select("tgt").distinct(), lab, "tgt", "tlbl")
    feat_triple_parts.append(emit_triples(workref_tgts, workref_feat_rules()))

    # --- expressions (ensure_expression, relations.py:182-188) ---
    expr_works = (
        all_pairs.select(F.col("w1").alias("q"))
        .unionByName(all_pairs.select(F.col("w2").alias("q")))
        .unionByName(int31_pairs.select(F.col("wa").alias("q")))
        .unionByName(int31_pairs.select(F.col("wb").alias("q")))
        .unionByName(cite_kept.select(F.col("src").alias("q")))
        .unionByName(cite_kept.select(F.col("tgt").alias("q")))
        .unionByName(workref.select(F.col("tgt").alias("q")))
        .unionByName(workref_pairs.select(F.col("src").alias("q")))
        .distinct()
    )
    expr_works = _attach(expr_works, lab, "q", "qlbl")
    expr_triples = emit_triples(expr_works, expr_rules())

    # --- citation text passages (relations.py:795-816) ---
    tps = _attach(cite_kept, lab, "src", "slbl")
    tps = _attach(tps, lab, "tgt", "tlbl")
    tps = tps.withColumn(
        "rel",
        F.concat(F.lit(SAPPHO + "relation/"), F.least("src", "tgt"),
                 F.lit("_"), F.greatest("src", "tgt")))
    tp_triples = emit_triples(tps, tp_rules())

    # --- alignment block (relations.py:879-902) ---
    from ..model import const_triples
    from ..oracle_relations import relations_alignment_triples

    align = const_triples(
        spark,
        [(s, p, o, is_iri, lang, dtype)
         for (s, p, o, lang, dtype, is_iri) in sorted(
             relations_alignment_triples(),
             key=lambda t: tuple("" if v is None else str(v) for v in t))],
    )

    out = rel_triples
    for part in ([act_triples, interp_creation, interp_derived, interp_links,
                  r22_triples, p67_triples, expr_triples, tp_triples, align]
                 + feat_triple_parts):
        out = out.unionByName(part)
    if include_header:
        # ontology node + ID-Type block (relations.py:147-166)
        header = relations_header(spark).unionByName(const_triples(spark, [
            (ID_TYPE, RDF_TYPE, ECRM + "E55_Type"),
            (ID_TYPE, RDFS_LABEL, "Wikidata ID", False, "en"),
            (ID_TYPE, OWL_SAMEAS, WD + "Q43649390"),
        ]))
        out = out.unionByName(header)
    return dedupe_triples(out) if dedupe else out
