"""Pure-Python golden oracle for the map_and_align stage.

Mirrors map_and_align.py:207-1005 over a merged triple set, with the
engine's documented positions (plans/align.py docstring): intended R12/R13
attachment, skolemized chain bnodes, never-firing references_person/place
definition guards, deterministic tp ordering and min-year rule.
"""

from __future__ import annotations

from .model import ECRM, INTRO, LRMOO, OWL_SAMEAS, RDF_TYPE, RDFS_LABEL, WD
from .oracle import Triple, _iri
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

import re

_WD_RE = re.compile(r"^http://www\.wikidata\.org/entity/(Q\d+)$")


def _to5(t6: tuple) -> Triple:
    # align_spec constant blocks are (s, p, o, is_iri, lang, dtype);
    # reorder into the canonical (s, p, o, lang, dtype, is_iri) 6-tuple.
    s, p, o, is_iri, lang, dtype = t6
    return (s, p, o, lang, dtype, bool(is_iri))


class _Idx:
    def __init__(self, g: set[Triple]):
        self.g = g
        self.by_pred: dict[str, list[tuple[str, str]]] = {}
        self.types: dict[str, set[str]] = {}
        self.labels: dict[str, str] = {}
        for s, p, o, lang, dtype, _is_iri in g:
            self.by_pred.setdefault(p, []).append((s, o))
            if p == RDF_TYPE:
                self.types.setdefault(s, set()).add(o)
            if p == RDFS_LABEL:
                self.labels.setdefault(s, o)

    def po(self, p: str) -> list[tuple[str, str]]:
        return self.by_pred.get(p, [])

    def objs(self, p: str) -> dict[str, list[str]]:
        d: dict[str, list[str]] = {}
        for s, o in self.po(p):
            d.setdefault(s, []).append(o)
        return d

    def typed(self, cls: str) -> set[str]:
        return {s for s, ts in self.types.items() if cls in ts}


def align_triples(
    merged: set[Triple],
    external_ids: list[tuple[str, str, str]] | None = None,
) -> set[Triple]:
    g = set(merged)
    idx = _Idx(merged)
    types_present = {o for _, o in idx.po(RDF_TYPE)}
    preds_present = set(idx.by_pred)

    # enrichment
    if external_ids:
        by_qid: dict[str, list[str]] = {}
        for s, o in idx.po(OWL_SAMEAS):
            m = _WD_RE.match(o)
            if m:
                by_qid.setdefault(m.group(1), []).append(s)
        for qid, id_type, value in external_ids:
            tmpl = EXTERNAL_ID_TEMPLATES.get(id_type)
            if not tmpl:
                continue
            uri = tmpl.replace("{v}", value)
            if uri.startswith("dbpedia:"):
                # reference post-pass: dbpedia:X → https://dbpedia.org/X
                # (map_and_align.py:1002)
                uri = "https://dbpedia.org/" + uri[len("dbpedia:"):]
            if not uri.startswith(("http://", "https://")):
                continue
            for s in by_qid.get(qid, []):
                g.add(_iri(s, OWL_SAMEAS, uri))

    for kind, val, triples in SKOS_BLOCKS:
        if (kind == "class" and val in types_present) or (
                kind == "pred" and val in preds_present):
            g |= {_to5(t) for t in triples}

    r3 = idx.objs(L + "R3_is_realised_in")
    r4i = idx.objs(L + "R4i_is_embodied_in")
    r7i = idx.objs(L + "R7i_is_exemplified_by")
    r18 = idx.objs(I + "R18_showsActualization")
    r17 = idx.objs(I + "R17_actualizesFeature")
    p67 = idx.objs(E + "P67_refers_to")
    f1 = idx.typed(L + "F1_Work")
    f2 = idx.typed(L + "F2_Expression")

    if L + "F1_Work" in types_present and L + "F3_Manifestation" in types_present:
        g |= {_to5(t) for t in HAS_MANIFESTATION_DEF}
        for work in f1:
            for expr in r3.get(work, []):
                for mani in r4i.get(expr, []):
                    g.add(_iri(work, SP + "has_manifestation", mani))

    if L + "F1_Work" in types_present and L + "F5_Item" in types_present:
        g |= {_to5(t) for t in HAS_PORTRAYAL_DEF}
        for work in f1:
            for expr in r3.get(work, []):
                for mani in r4i.get(expr, []):
                    for item in r7i.get(mani, []):
                        g.add(_iri(work, SP + "has_portrayal", item))

    if L + "F2_Expression" in types_present and L + "F5_Item" in types_present:
        g |= {_to5(t) for t in HAS_REPRESENTATION_DEF}
        for expr in f2:
            for mani in r4i.get(expr, []):
                for item in r7i.get(mani, []):
                    g.add(_iri(expr, SP + "has_representation", item))

    # directions
    r24 = idx.objs(I + "R24_hasRelatedEntity")
    r30i = idx.objs(I + "R30i_isTextPassageOf")
    r17i = idx.objs(L + "R17i_was_created_by")
    p4 = idx.objs(E + "P4_has_time-span")
    r24c = idx.objs(L + "R24_created")
    mani_to_mc: dict[str, list[str]] = {}
    for mc, manis in r24c.items():
        for mani in manis:
            mani_to_mc.setdefault(mani, []).append(mc)

    def year_of(expr: str) -> int | None:
        ys = []
        for ec in r17i.get(expr, []):
            for ts in p4.get(ec, []):
                lbl = idx.labels.get(ts)
                if lbl is not None:
                    ys.append(lbl)
        if ys:
            return int(min(ys))
        for mani in r4i.get(expr, []):
            for mc in mani_to_mc.get(mani, []):
                for ts in p4.get(mc, []):
                    lbl = idx.labels.get(ts)
                    if lbl is not None:
                        ys.append(lbl)
        return int(min(ys)) if ys else None

    directions = []
    for rel in sorted(idx.typed(I + "INT31_IntertextualRelation")):
        tp_expr = sorted(
            {(tp, e) for tp in r24.get(rel, []) for e in r30i.get(tp, [])}
        )
        if len(tp_expr) != 2:
            continue
        if len({e for _, e in tp_expr}) != 2:
            continue
        (tp1, e1), (tp2, e2) = tp_expr
        y1, y2 = year_of(e1), year_of(e2)
        if y1 is None or y2 is None:
            continue
        if y1 < y2:
            directions.append((rel, e2, e1, tp2, tp1))  # younger, older
        else:
            directions.append((rel, e1, e2, tp1, tp2))

    if I + "INT_Topic" in types_present:
        g |= {_to5(t) for t in ABOUT_DEF}
        topics = idx.typed(I + "INT_Topic")
        for expr in f2:
            for act in r18.get(expr, []):
                for feat in r17.get(act, []):
                    if feat in topics:
                        g.add(_iri(expr, SP + "about", feat))

    if I + "INT31_IntertextualRelation" in types_present:
        g |= {_to5(t) for t in EXPR_RELATION_DEF}
        act_to_expr: dict[str, list[str]] = {}
        for expr, acts in r18.items():
            for act in acts:
                act_to_expr.setdefault(act, []).append(expr)
        for rel in idx.typed(I + "INT31_IntertextualRelation"):
            exprs = {e for ent in r24.get(rel, []) for e in act_to_expr.get(ent, [])}
            for a in exprs:
                for b in exprs:
                    if a != b:
                        g.add(_iri(a, SP + "expr_relation", b))
                        g.add(_iri(b, SP + "expr_relation", a))
        for rel, younger, older, ytp, otp in directions:
            g.add(_iri(rel, I + "R13_hasReferringEntity", younger))
            g.add(_iri(younger, I + "R13i_isReferringEntity", rel))
            g.add(_iri(rel, I + "R12_hasReferredToEntity", older))
            g.add(_iri(older, I + "R12i_isReferredToEntity", rel))

    if I + "R30i_isTextPassageOf" in preds_present:
        g |= {_to5(t) for t in POSSIBLY_CITES_DEF}
        for rel, younger, older, ytp, otp in directions:
            g.add(_iri(younger, SP + "expr_possibly_cites", older))
            g.add(_iri(older, SP + "expr_possibly_cited_by", younger))
            g.add(_iri(younger, SP + "tp_possibly_cites", otp))
            g.add(_iri(otp, SP + "tp_possibly_cited_by", younger))

    if E + "P67_refers_to" in preds_present:
        g |= {_to5(t) for t in EXPR_REFERENCES_DEF}
        persons = idx.typed(E + "E21_Person")
        places = idx.typed(E + "E53_Place")
        for expr in f2:
            for act in r18.get(expr, []):
                for target in p67.get(act, []):
                    g.add(_iri(expr, SP + "expr_references", target))
                    if target in persons:
                        g.add(_iri(expr, SP + "references_person", target))
                    elif target in places:
                        g.add(_iri(expr, SP + "references_place", target))

    if I + "INT_Character" in types_present:
        g |= {_to5(t) for t in HAS_CHARACTER_DEF}
        chars = idx.typed(I + "INT_Character")
        for expr in f2:
            for act in r18.get(expr, []):
                for feat in r17.get(act, []):
                    if feat in chars:
                        g.add(_iri(expr, SP + "has_character", act))
                        g.add(_iri(act, SP + "is_character_in", expr))
    return g
