"""The full KG pipeline compiled to ANSI SQL — DuckDB twin of
``pipeline.run_pipeline`` (driver-contract oracle for ``kg_pipeline``).

Composes the already-twinned stages into one query over the ``documents``
parquet view plus the world-scale fixture dimensions embedded as VALUES:

    mentions  — map_sql.mentions_sql (corpus re-derivation + leftmost-
                longest matcher as a recursive CTE)
    linking   — distinct mention QIDs per entity kind (linking.linked_qids)
    mapping   — map_sql.authors_sql / works_sql / relations_sql with the
                linked QID CTEs as input (nested WITH subqueries; inner
                VALUES shadow outer names)
    merge     — per-subject label dedup (lang-tagged first, then lang, obj,
                dtype) + ontology-node rewrite (plans/merge.py:34-117)
    canon     — near-duplicate entity resolution: exact 2-word-shingle
                Jaccard ≥ 0.9 between same-class labels (the LSH blocking's
                verification step — see note below), connected components
                via a recursive CTE, min-URI representative rewrite +
                owl:sameAs merge links (plans/canonicalize.py)
    align     — enrichment sameAs, conditional SKOS/def blocks, chain
                properties, temporal direction (R12/R13), references,
                characters (plans/align.py, oracle_align.py)

LSH-recall note: the Spark canonicalizer blocks candidates with
MinHash-LSH (16 hashes / 8 bands) and verifies exact Jaccard on the
candidates; this twin computes exact Jaccard over all same-class label
pairs, i.e. it assumes the LSH blocking has 100% recall at threshold 0.9.
With 8 bands of 2 rows, P(candidate | J≥0.9) ≥ 1-(1-0.81)^8 ≈ 0.99998 per
pair, and the hashes are deterministic — the contract run at sf0.01 either
matches bit-for-bit (and then always will) or fails loudly.

Reference behavioral spec: map_and_align.py:207-1005 via align_spec;
merge.py:34-77; the engine-added linking/canonicalization stages follow
BASELINE.json's north_star.
"""

from __future__ import annotations

from .fixtures import World
from .model import (
    ECRM,
    INTRO,
    LRMOO,
    OWL_SAMEAS,
    RDF_TYPE,
    RDFS_LABEL,
    SAPPHO,
    WD,
)
from .map_sql import (
    _const6_sql,
    _q,
    _values,
    authors_sql,
    mentions_sql,
    relations_sql,
    works_sql,
)
from .plans.align_spec import (
    ABOUT_DEF,
    EXPR_REFERENCES_DEF,
    EXPR_RELATION_DEF,
    EXTERNAL_ID_TEMPLATES,
    HAS_CHARACTER_DEF,
    HAS_MANIFESTATION_DEF,
    HAS_PORTRAYAL_DEF,
    HAS_REPRESENTATION_DEF,
    POSSIBLY_CITES_DEF,
    SKOS_BLOCKS,
    SP,
)

L, I, E = LRMOO, INTRO, ECRM
OWL = "http://www.w3.org/2002/07/owl#"


def _to_oracle_order(spec_triples) -> list[tuple]:
    """align_spec 6-tuples (s,p,o,is_iri,lang,dtype) → the oracle order
    (s,p,o,lang,dtype,is_iri) that _const6_sql expects."""
    return [(s, p, o, lang, dtype, is_iri)
            for (s, p, o, is_iri, lang, dtype) in spec_triples]


def _exists_class(cls: str) -> str:
    return (f"EXISTS (SELECT 1 FROM can WHERE pred = {_q(RDF_TYPE)} "
            f"AND obj = {_q(cls)} AND obj_is_iri)")


def _exists_pred(p: str) -> str:
    return f"EXISTS (SELECT 1 FROM can WHERE pred = {_q(p)})"


def _block(spec_triples, cond: str) -> str:
    """Constant block emitted only when ``cond`` holds over ``can``."""
    return (f"SELECT * FROM ({_const6_sql(_to_oracle_order(spec_triples))}) b "
            f"WHERE {cond}")


def pipeline_sql(world: World) -> str:
    """run_pipeline twin for the world scale implied by the contract's
    sf directory (world_scale_for: sf0.01 → make_world_scaled(2))."""
    # --- linking dimension: qid → kind (distinct; duplicates collapse) ---
    kind_rows = sorted({(e["qid"], e["kind"]) for e in world.entities})

    # --- external-id enrichment rows, template-applied at generation time
    # (the templates are constants; filtering mirrors oracle_align:80-98) ---
    ext_rows = []
    for qid, id_type, value in world.external_ids:
        tmpl = EXTERNAL_ID_TEMPLATES.get(id_type)
        if not tmpl:
            continue
        uri = tmpl.replace("{v}", value)
        if uri.startswith("dbpedia:"):
            uri = "https://dbpedia.org/" + uri[len("dbpedia:"):]
        if not uri.startswith(("http://", "https://")):
            continue
        ext_rows.append((qid, uri))
    ext_rows = sorted(set(ext_rows))

    skos = "\n  UNION ALL\n  ".join(
        _block(triples,
               _exists_class(val) if kind == "class" else _exists_pred(val))
        for kind, val, triples in SKOS_BLOCKS)

    canon_classes = ", ".join(
        _q(c) for c in [E + "E21_Person", E + "E53_Place", L + "F2_Expression"])

    defs = "\n  UNION ALL\n  ".join([
        _block(HAS_MANIFESTATION_DEF,
               f"{_exists_class(L + 'F1_Work')} AND {_exists_class(L + 'F3_Manifestation')}"),
        _block(HAS_PORTRAYAL_DEF,
               f"{_exists_class(L + 'F1_Work')} AND {_exists_class(L + 'F5_Item')}"),
        _block(HAS_REPRESENTATION_DEF,
               f"{_exists_class(L + 'F2_Expression')} AND {_exists_class(L + 'F5_Item')}"),
        _block(ABOUT_DEF, _exists_class(I + "INT_Topic")),
        _block(EXPR_RELATION_DEF, _exists_class(I + "INT31_IntertextualRelation")),
        _block(POSSIBLY_CITES_DEF, _exists_pred(I + "R30i_isTextPassageOf")),
        _block(EXPR_REFERENCES_DEF, _exists_pred(E + "P67_refers_to")),
        _block(HAS_CHARACTER_DEF, _exists_class(I + "INT_Character")),
    ])

    def iri(subj: str, pred: str, obj: str, src: str,
            cond: str | None = None) -> str:
        w = f" WHERE {cond}" if cond else ""
        return (f"SELECT {subj} AS subj, {_q(pred)} AS pred, {obj} AS obj, "
                "TRUE AS obj_is_iri, CAST(NULL AS VARCHAR) AS lang, "
                f"CAST(NULL AS VARCHAR) AS dtype FROM {src}{w}")

    mapping_union = f"""SELECT * FROM (
{authors_sql(world, qids_from="SELECT qid FROM linked_persons")}
  ) am
  UNION ALL
  SELECT * FROM (
{works_sql(world, qids_from="SELECT qid FROM linked_works")}
  ) wm
  UNION ALL
  SELECT * FROM (
{relations_sql(world, qids_from="SELECT qid FROM linked_works")}
  ) rm"""

    onto_all = SAPPHO + "ontology/all"
    lrmoo_onto = "https://cidoc-crm.org/extensions/lrmoo/owl/1.0/LRMoo_v1.0.owl"

    return f"""WITH RECURSIVE mentions AS (
{mentions_sql(world)}
),
ent_kinds AS MATERIALIZED (
  {_values(kind_rows, ["qid", "kind"])}
),
linked_persons AS MATERIALIZED (
  SELECT DISTINCT m.qid FROM mentions m
  JOIN ent_kinds k ON k.qid = m.qid AND k.kind = 'person'),
linked_works AS MATERIALIZED (
  SELECT DISTINCT m.qid FROM mentions m
  JOIN ent_kinds k ON k.qid = m.qid AND k.kind = 'work'),
mapped AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj, obj_is_iri, lang, dtype FROM (
  {mapping_union}
  ) u),
-- merge (plans/merge.py; oracle.merge_triples): one label per subject,
-- lang-tagged preferred, deterministic order; ontology-node rewrite
lbl1 AS (
  SELECT subj, pred, obj, obj_is_iri, lang, dtype FROM (
    SELECT *, row_number() OVER (
      PARTITION BY subj
      ORDER BY (lang IS NULL), coalesce(lang, ''), obj, coalesce(dtype, '')
    ) AS rn FROM mapped WHERE pred = {_q(RDFS_LABEL)}
  ) WHERE rn = 1),
onto_subjects AS (
  SELECT DISTINCT subj FROM mapped
  WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(OWL + 'Ontology')}),
merged AS MATERIALIZED (
  SELECT * FROM (
    SELECT * FROM mapped WHERE pred <> {_q(RDFS_LABEL)}
    UNION ALL SELECT * FROM lbl1
  ) m WHERE m.subj NOT IN (SELECT subj FROM onto_subjects)
  UNION ALL
  SELECT subj, pred, obj, TRUE, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
  FROM (VALUES
    ({_q(onto_all)}, {_q(RDF_TYPE)}, {_q(OWL + 'Ontology')}),
    ({_q(onto_all)}, {_q(OWL + 'imports')}, {_q(E)}),
    ({_q(onto_all)}, {_q(OWL + 'imports')}, {_q(lrmoo_onto)}),
    ({_q(onto_all)}, {_q(OWL + 'imports')}, {_q(I)})
  ) oa(subj, pred, obj)),
-- canonicalize (plans/canonicalize.py): same-class label near-dups,
-- exact 2-word-shingle Jaccard >= 0.9, CC min-representative rewrite
ce_typed AS (
  SELECT DISTINCT subj AS uri, obj AS cls FROM merged
  WHERE pred = {_q(RDF_TYPE)} AND obj IN ({canon_classes})),
ce_lbl AS (
  SELECT subj AS uri, obj AS label FROM merged WHERE pred = {_q(RDFS_LABEL)}),
ce AS (
  SELECT t.uri, t.cls,
         list_filter(regexp_split_to_array(
           regexp_replace(trim(lower(l.label)), '\\s+', ' ', 'g'), ' '),
           x -> x != '') AS toks
  FROM ce_typed t JOIN ce_lbl l ON l.uri = t.uri),
ce_shingle AS (
  SELECT DISTINCT cls, uri, sh FROM (
    SELECT cls, uri,
           array_to_string(toks[i + 1 : i + 2], ' ') AS sh
    FROM (SELECT cls, uri, toks,
                 unnest(range(0, greatest(len(toks) - 2, 0) + 1)) AS i
          FROM ce)
  ) WHERE sh <> ''),
ce_sz AS (SELECT cls, uri, count(*) AS sz FROM ce_shingle GROUP BY 1, 2),
ce_pairs AS (
  SELECT a.cls, a.uri AS ua, b.uri AS ub, count(*) AS common
  FROM ce_shingle a JOIN ce_shingle b
    ON a.cls = b.cls AND a.sh = b.sh AND a.uri < b.uri
  GROUP BY 1, 2, 3),
ce_edges AS (
  SELECT p.ua, p.ub FROM ce_pairs p
  JOIN ce_sz sa ON sa.cls = p.cls AND sa.uri = p.ua
  JOIN ce_sz sb ON sb.cls = p.cls AND sb.uri = p.ub
  WHERE round(p.common * 1.0 / (sa.sz + sb.sz - p.common), 6) >= 0.9),
ce_sym AS (
  SELECT ua AS a, ub AS b FROM ce_edges
  UNION SELECT ub, ua FROM ce_edges),
ce_reach AS (
  SELECT a, b FROM ce_sym
  UNION
  SELECT r.a, s.b FROM ce_reach r JOIN ce_sym s ON r.b = s.a),
cmap AS MATERIALIZED (
  SELECT node AS uri, component AS canonical FROM (
    SELECT a AS node, least(a, min(b)) AS component FROM ce_reach GROUP BY a
  ) WHERE node <> component),
can AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj, obj_is_iri, lang, dtype FROM (
    SELECT coalesce(cs.canonical, t.subj) AS subj, t.pred,
           CASE WHEN t.obj_is_iri THEN coalesce(co.canonical, t.obj)
                ELSE t.obj END AS obj,
           t.obj_is_iri, t.lang, t.dtype
    FROM merged t
    LEFT JOIN cmap cs ON cs.uri = t.subj
    LEFT JOIN cmap co ON co.uri = t.obj
    UNION ALL
    SELECT canonical, {_q(OWL_SAMEAS)}, uri, TRUE,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM cmap
  ) c),
-- align (plans/align.py / oracle_align.py) over the canonical graph
ext_ids AS MATERIALIZED (
  {_values(ext_rows, ["qid", "uri"])}
),
wd_sameas AS (
  SELECT subj AS s, regexp_extract(obj,
    '^http://www\\.wikidata\\.org/entity/(Q[0-9]+)$', 1) AS qid
  FROM can WHERE pred = {_q(OWL_SAMEAS)} AND obj_is_iri
    AND regexp_matches(obj, '^http://www\\.wikidata\\.org/entity/Q[0-9]+$')),
po_r3 AS (SELECT subj AS s, obj AS o FROM can
          WHERE pred = {_q(L + 'R3_is_realised_in')}),
po_r4i AS (SELECT subj AS s, obj AS o FROM can
           WHERE pred = {_q(L + 'R4i_is_embodied_in')}),
po_r7i AS (SELECT subj AS s, obj AS o FROM can
           WHERE pred = {_q(L + 'R7i_is_exemplified_by')}),
po_r18 AS (SELECT subj AS s, obj AS o FROM can
           WHERE pred = {_q(I + 'R18_showsActualization')}),
po_r17 AS (SELECT subj AS s, obj AS o FROM can
           WHERE pred = {_q(I + 'R17_actualizesFeature')}),
po_p67 AS (SELECT subj AS s, obj AS o FROM can
           WHERE pred = {_q(E + 'P67_refers_to')}),
po_r24 AS (SELECT subj AS s, obj AS o FROM can
           WHERE pred = {_q(I + 'R24_hasRelatedEntity')}),
po_r30i AS (SELECT subj AS s, obj AS o FROM can
            WHERE pred = {_q(I + 'R30i_isTextPassageOf')}),
ty_f1 AS (SELECT DISTINCT subj AS u FROM can
          WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(L + 'F1_Work')}),
ty_f2 AS (SELECT DISTINCT subj AS u FROM can
          WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(L + 'F2_Expression')}),
ty_rel AS (SELECT DISTINCT subj AS u FROM can
           WHERE pred = {_q(RDF_TYPE)}
             AND obj = {_q(I + 'INT31_IntertextualRelation')}),
ty_topic AS (SELECT DISTINCT subj AS u FROM can
             WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(I + 'INT_Topic')}),
ty_char AS (SELECT DISTINCT subj AS u FROM can
            WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(I + 'INT_Character')}),
ty_person AS (SELECT DISTINCT subj AS u FROM can
              WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(E + 'E21_Person')}),
ty_place AS (SELECT DISTINCT subj AS u FROM can
             WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(E + 'E53_Place')}),
-- temporal direction (oracle_align:144-176): per INT31 rel with exactly
-- two (tp, expr) legs on distinct expressions, min-year per expression
-- (expression-creation timespans first, manifestation-creation fallback)
tpe AS (
  SELECT DISTINCT r.s AS rel, r.o AS tp, t.o AS expr
  FROM po_r24 r JOIN po_r30i t ON t.s = r.o
  WHERE r.s IN (SELECT u FROM ty_rel)),
tp_ok AS (
  SELECT rel FROM tpe GROUP BY rel
  HAVING count(*) = 2 AND count(DISTINCT expr) = 2),
tp_rank AS (
  SELECT *, row_number() OVER (PARTITION BY rel ORDER BY tp, expr) AS rn
  FROM tpe WHERE rel IN (SELECT rel FROM tp_ok)),
tp_wide AS (
  SELECT rel,
         max(CASE WHEN rn = 1 THEN tp END) AS tp1,
         max(CASE WHEN rn = 1 THEN expr END) AS e1,
         max(CASE WHEN rn = 2 THEN tp END) AS tp2,
         max(CASE WHEN rn = 2 THEN expr END) AS e2
  FROM tp_rank GROUP BY rel),
ts_lbl AS (SELECT subj AS ts, min(obj) AS lbl FROM can
           WHERE pred = {_q(RDFS_LABEL)} GROUP BY subj),
yr_ec AS (
  SELECT ec.obj AS expr, min(l.lbl) AS y
  FROM can ec
  JOIN can p4 ON p4.subj = ec.subj AND p4.pred = {_q(E + 'P4_has_time-span')}
  JOIN ts_lbl l ON l.ts = p4.obj
  WHERE ec.pred = {_q(L + 'R17_created')}
  GROUP BY ec.obj),
yr_mc AS (
  SELECT r4.s AS expr, min(l.lbl) AS y
  FROM po_r4i r4
  JOIN can mc ON mc.obj = r4.o AND mc.pred = {_q(L + 'R24_created')}
  JOIN can p4 ON p4.subj = mc.subj AND p4.pred = {_q(E + 'P4_has_time-span')}
  JOIN ts_lbl l ON l.ts = p4.obj
  GROUP BY r4.s),
yr AS (
  SELECT expr, CAST(y AS INTEGER) AS y FROM (
    SELECT *, row_number() OVER (PARTITION BY expr ORDER BY prio) AS rn
    FROM (SELECT expr, y, 1 AS prio FROM yr_ec
          UNION ALL SELECT expr, y, 2 FROM yr_mc)
  ) WHERE rn = 1),
dirs AS (
  SELECT w.rel,
         CASE WHEN ya.y < yb.y THEN w.e2 ELSE w.e1 END AS younger,
         CASE WHEN ya.y < yb.y THEN w.e1 ELSE w.e2 END AS older,
         CASE WHEN ya.y < yb.y THEN w.tp2 ELSE w.tp1 END AS ytp,
         CASE WHEN ya.y < yb.y THEN w.tp1 ELSE w.tp2 END AS otp
  FROM tp_wide w
  JOIN yr ya ON ya.expr = w.e1 JOIN yr yb ON yb.expr = w.e2),
a2e AS (SELECT o AS act, s AS expr FROM po_r18),
rel_exprs AS (
  SELECT DISTINCT r.s AS rel, a.expr
  FROM po_r24 r JOIN a2e a ON a.act = r.o
  WHERE r.s IN (SELECT u FROM ty_rel))
SELECT DISTINCT subj, pred, obj, obj_is_iri, lang, dtype FROM (
  SELECT * FROM can
  -- enrichment sameAs (map_and_align.py:984-1002)
  UNION ALL
  {iri("w.s", OWL_SAMEAS, "x.uri",
       "wd_sameas w JOIN ext_ids x ON x.qid = w.qid")}
  -- conditional SKOS blocks (map_and_align.py:294-576)
  UNION ALL
  {skos}
  -- derived-property definition blocks (map_and_align.py:580-991)
  UNION ALL
  {defs}
  -- has_manifestation / has_portrayal / has_representation chains
  UNION ALL
  {iri("f.u", SP + "has_manifestation", "m.o",
       "ty_f1 f JOIN po_r3 r ON r.s = f.u JOIN po_r4i m ON m.s = r.o",
       f"{_exists_class(L + 'F1_Work')} AND {_exists_class(L + 'F3_Manifestation')}")}
  UNION ALL
  {iri("f.u", SP + "has_portrayal", "i.o",
       "ty_f1 f JOIN po_r3 r ON r.s = f.u JOIN po_r4i m ON m.s = r.o "
       "JOIN po_r7i i ON i.s = m.o",
       f"{_exists_class(L + 'F1_Work')} AND {_exists_class(L + 'F5_Item')}")}
  UNION ALL
  {iri("f.u", SP + "has_representation", "i.o",
       "ty_f2 f JOIN po_r4i m ON m.s = f.u JOIN po_r7i i ON i.s = m.o",
       f"{_exists_class(L + 'F2_Expression')} AND {_exists_class(L + 'F5_Item')}")}
  -- about (topics on expressions)
  UNION ALL
  {iri("f.u", SP + "about", "ft.o",
       "ty_f2 f JOIN po_r18 a ON a.s = f.u JOIN po_r17 ft ON ft.s = a.o",
       f"ft.o IN (SELECT u FROM ty_topic) AND {_exists_class(I + 'INT_Topic')}")}
  -- expr_relation (pairwise within each INT31's related expressions)
  UNION ALL
  {iri("a.expr", SP + "expr_relation", "b.expr",
       "rel_exprs a JOIN rel_exprs b ON b.rel = a.rel AND b.expr <> a.expr",
       _exists_class(I + "INT31_IntertextualRelation"))}
  -- R12/R13 temporal direction
  UNION ALL
  {iri("d.rel", I + "R13_hasReferringEntity", "d.younger", "dirs d",
       _exists_class(I + "INT31_IntertextualRelation"))}
  UNION ALL
  {iri("d.younger", I + "R13i_isReferringEntity", "d.rel", "dirs d",
       _exists_class(I + "INT31_IntertextualRelation"))}
  UNION ALL
  {iri("d.rel", I + "R12_hasReferredToEntity", "d.older", "dirs d",
       _exists_class(I + "INT31_IntertextualRelation"))}
  UNION ALL
  {iri("d.older", I + "R12i_isReferredToEntity", "d.rel", "dirs d",
       _exists_class(I + "INT31_IntertextualRelation"))}
  -- possibly_cites (gated on text passages being present)
  UNION ALL
  {iri("d.younger", SP + "expr_possibly_cites", "d.older", "dirs d",
       _exists_pred(I + "R30i_isTextPassageOf"))}
  UNION ALL
  {iri("d.older", SP + "expr_possibly_cited_by", "d.younger", "dirs d",
       _exists_pred(I + "R30i_isTextPassageOf"))}
  UNION ALL
  {iri("d.younger", SP + "tp_possibly_cites", "d.otp", "dirs d",
       _exists_pred(I + "R30i_isTextPassageOf"))}
  UNION ALL
  {iri("d.otp", SP + "tp_possibly_cited_by", "d.younger", "dirs d",
       _exists_pred(I + "R30i_isTextPassageOf"))}
  -- expr_references + person/place split (elif: place only when not person)
  UNION ALL
  {iri("f.u", SP + "expr_references", "p.o",
       "ty_f2 f JOIN po_r18 a ON a.s = f.u JOIN po_p67 p ON p.s = a.o",
       _exists_pred(E + "P67_refers_to"))}
  UNION ALL
  {iri("f.u", SP + "references_person", "p.o",
       "ty_f2 f JOIN po_r18 a ON a.s = f.u JOIN po_p67 p ON p.s = a.o",
       f"p.o IN (SELECT u FROM ty_person) AND {_exists_pred(E + 'P67_refers_to')}")}
  UNION ALL
  {iri("f.u", SP + "references_place", "p.o",
       "ty_f2 f JOIN po_r18 a ON a.s = f.u JOIN po_p67 p ON p.s = a.o",
       f"p.o IN (SELECT u FROM ty_place) AND p.o NOT IN (SELECT u FROM ty_person) "
       f"AND {_exists_pred(E + 'P67_refers_to')}")}
  -- has_character / is_character_in
  UNION ALL
  {iri("f.u", SP + "has_character", "a.o",
       "ty_f2 f JOIN po_r18 a ON a.s = f.u JOIN po_r17 ft ON ft.s = a.o",
       f"ft.o IN (SELECT u FROM ty_char) AND {_exists_class(I + 'INT_Character')}")}
  UNION ALL
  {iri("a.o", SP + "is_character_in", "f.u",
       "ty_f2 f JOIN po_r18 a ON a.s = f.u JOIN po_r17 ft ON ft.s = a.o",
       f"ft.o IN (SELECT u FROM ty_char) AND {_exists_class(I + 'INT_Character')}")}
) final"""
