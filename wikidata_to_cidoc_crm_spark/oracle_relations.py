"""Pure-Python golden oracle for the relations stage.

Sequential re-statement of relations.py:299-877 (nine processors) over the
fixture :class:`World`, with the engine's documented determinism decisions
(SURVEY.md §4.4): works/targets iterated in sorted order; when a citation
pair exists in both directions the lexicographically smaller (src, tgt)
wins. Guard behavior (ensure_*/add_* early returns, first-pair-wins
actualization links, interpretation-tid collisions) mirrors the reference's
in-graph membership tests.
"""

from __future__ import annotations

from itertools import combinations

from .fixtures import World
from .model import (
    ECRM,
    INTRO,
    LRMOO,
    LRMOO_ONTO,
    OWL_SAMEAS,
    PROV_DERIVED,
    RDF_TYPE,
    RDFS_LABEL,
    SAPPHO,
    WD,
)
from .oracle import Triple, _iri, _lit

SB = SAPPHO
ID_TYPE = SB + "id_type/wikidata"


class _Ctx:
    def __init__(self, world: World, work_qids: set[str]):
        self.g: set[Triple] = set()
        self.world = world
        self.W = work_qids
        # guards (≙ rdflib membership tests)
        self.expr_created: set[str] = set()
        self.node_created: set[str] = set()  # feature/person/place/char/tp nodes
        self.rel_created: set[str] = set()
        self.act_created: set[str] = set()
        self.interp_feat: set[str] = set()
        self.interp_act: set[str] = set()
        # label index
        self.en = {}
        self.de = {}
        for q, lg, l in world.labels:
            (self.en if lg == "en" else self.de).setdefault(q, l)
        # statement index by base pid via property closure
        self.by_base: dict[str, list[tuple[str, str]]] = {}
        base_of: dict[str, list[str]] = {}
        for pid, base in world.property_closure:
            base_of.setdefault(pid, []).append(base)
        for s, pid, o, is_ent, _lang in world.statements:
            for base in base_of.get(pid, []):
                self.by_base.setdefault(base, []).append((s, o))
        # type closure: qid -> set(ancestors of its P31 classes)
        anc: dict[str, set[str]] = {}
        for q, a in world.subclass_closure:
            anc.setdefault(q, set()).add(a)
        self.types: dict[str, set[str]] = {}
        for s, pid, o, is_ent, _lang in world.statements:
            if pid == "P31":
                self.types.setdefault(s, set()).update(anc.get(o, {o}))

    def label(self, qid: str) -> str:
        return self.en.get(qid) or self.de.get(qid) or qid

    def instance_of(self, qid: str, ancestors: tuple[str, ...]) -> bool:
        return bool(self.types.get(qid, set()) & set(ancestors))

    def edges(self, bases: list[str], work_subject: bool = True):
        out = []
        for b in bases:
            for s, o in self.by_base.get(b, []):
                if not work_subject or s in self.W:
                    out.append((s, o))
        return out

    # --- reference helpers ---
    def add_identifier(self, entity: str, qid: str) -> None:
        uri = f"{SB}identifier/{qid}"
        pure = qid.split("_")[-1]
        self.g.add(_iri(uri, RDF_TYPE, ECRM + "E42_Identifier"))
        self.g.add(_lit(uri, RDFS_LABEL, pure, "en"))
        self.g.add(_iri(uri, ECRM + "P2_has_type", ID_TYPE))
        self.g.add(_iri(ID_TYPE, ECRM + "P2i_is_type_of", uri))
        self.g.add(_iri(uri, PROV_DERIVED, WD + pure))
        self.g.add(_iri(entity, ECRM + "P1_is_identified_by", uri))
        self.g.add(_iri(uri, ECRM + "P1i_identifies", entity))

    def ensure_expression(self, qid: str) -> str:
        uri = f"{SB}expression/{qid}"
        if qid not in self.expr_created:
            self.expr_created.add(qid)
            self.g.add(_iri(uri, RDF_TYPE, LRMOO + "F2_Expression"))
            self.g.add(_lit(uri, RDFS_LABEL, f"Expression of {self.label(qid)}", "en"))
            self.g.add(_iri(uri, OWL_SAMEAS, WD + qid))
        return uri

    def add_interpretation(self, target: str, label: str, derived_qids: list[str]) -> None:
        tid = target.split("/")[-1]
        feat = f"{SB}feature/interpretation/{tid}"
        act = f"{SB}actualization/interpretation/{tid}"
        if feat not in self.interp_feat:
            self.interp_feat.add(feat)
            self.g.add(_iri(feat, RDF_TYPE, INTRO + "INT_Interpretation"))
            self.g.add(_lit(feat, RDFS_LABEL, label, "en"))
        if act not in self.interp_act:
            self.interp_act.add(act)
            self.g.add(_iri(act, RDF_TYPE, INTRO + "INT2_ActualizationOfFeature"))
            self.g.add(_lit(act, RDFS_LABEL, label, "en"))
            for q in derived_qids:
                self.g.add(_iri(act, PROV_DERIVED, WD + q))
            self.g.add(_iri(feat, INTRO + "R17i_featureIsActualizedIn", act))
            self.g.add(_iri(act, INTRO + "R17_actualizesFeature", feat))
        self.g.add(_iri(act, INTRO + "R21_identifies", target))
        self.g.add(_iri(target, INTRO + "R21i_isIdentifiedBy", act))

    def add_actualization(self, feature: str, typ: str, fqid: str, eid: str,
                          label: str, rel: str) -> str:
        act = f"{SB}actualization/{typ}/{fqid}_{eid}"
        if act in self.act_created:
            return act
        self.act_created.add(act)
        expr = f"{SB}expression/{eid}"
        self.g.add(_iri(act, RDF_TYPE, INTRO + "INT2_ActualizationOfFeature"))
        self.g.add(_lit(act, RDFS_LABEL, label, "en"))
        self.g.add(_iri(feature, INTRO + "R17i_featureIsActualizedIn", act))
        self.g.add(_iri(act, INTRO + "R17_actualizesFeature", feature))
        self.g.add(_iri(act, INTRO + "R18i_actualizationFoundOn", expr))
        self.g.add(_iri(expr, INTRO + "R18_showsActualization", act))
        self.g.add(_iri(act, INTRO + "R24i_isRelatedEntity", rel))
        self.g.add(_iri(rel, INTRO + "R24_hasRelatedEntity", act))
        self.g.add(_iri(expr, INTRO + "R24i_isRelatedEntity", rel))
        self.g.add(_iri(rel, INTRO + "R24_hasRelatedEntity", expr))
        interp_label = label
        if interp_label.startswith("Reference to "):
            interp_label = interp_label[len("Reference to "):]
        self.add_interpretation(act, f"Interpretation of {interp_label}", [eid])
        return act

    def get_or_create_rel(self, w1: str, w2: str) -> str | None:
        if w1 == w2:
            return None
        a, b = (w1, w2) if w1 < w2 else (w2, w1)
        rel = f"{SB}relation/{a}_{b}"
        l1, l2 = self.label(w1), self.label(w2)
        la, lb = sorted([l1, l2], key=str.casefold)
        if rel not in self.rel_created:
            self.rel_created.add(rel)
            self.g.add(_iri(rel, RDF_TYPE, INTRO + "INT31_IntertextualRelation"))
            self.g.add(_lit(rel, RDFS_LABEL,
                            f"Intertextual relation between {la} and {lb}", "en"))
            self.add_interpretation(
                rel,
                f"Interpretation of intertextual relation between {la} and {lb}",
                [w1, w2],
            )
        return rel

    def ensure_feature(self, fqid: str, cls: str, label: str, path: str) -> str:
        uri = f"{SB}{path}/{fqid}"
        if uri not in self.node_created:
            self.node_created.add(uri)
            self.g.add(_iri(uri, RDF_TYPE, cls))
            self.g.add(_lit(uri, RDFS_LABEL, label, "en"))
            if any(k in path for k in ("character", "plot", "motif", "topic")):
                self.g.add(_iri(uri, OWL_SAMEAS, WD + fqid))
            self.add_identifier(uri, fqid)
        return uri

    def ensure_person_reference(self, qid: str) -> tuple[str, str]:
        p_uri = f"{SB}person/{qid}"
        feat = f"{SB}feature/person_ref/{qid}"
        name = self.label(qid)
        if p_uri not in self.node_created:
            self.node_created.add(p_uri)
            self.g.add(_iri(p_uri, RDF_TYPE, ECRM + "E21_Person"))
            self.g.add(_lit(p_uri, RDFS_LABEL, name, "en"))
            self.g.add(_iri(p_uri, OWL_SAMEAS, WD + qid))
            self.add_identifier(p_uri, qid)
        if feat not in self.node_created:
            self.node_created.add(feat)
            self.g.add(_iri(feat, RDF_TYPE, INTRO + "INT18_Reference"))
            self.g.add(_lit(feat, RDFS_LABEL, f"Reference to {name} (person)", "en"))
        return p_uri, feat


def relations_header_triples() -> set[Triple]:
    onto = SB + "ontology/relations"
    g = {
        _iri(onto, RDF_TYPE, "http://www.w3.org/2002/07/owl#Ontology"),
        _iri(onto, "http://www.w3.org/2002/07/owl#imports", "http://erlangen-crm.org/current/"),
        _iri(onto, "http://www.w3.org/2002/07/owl#imports", LRMOO_ONTO),
        _iri(onto, "http://www.w3.org/2002/07/owl#imports", INTRO),
        _iri(ID_TYPE, RDF_TYPE, ECRM + "E55_Type"),
        _lit(ID_TYPE, RDFS_LABEL, "Wikidata ID", "en"),
        _iri(ID_TYPE, OWL_SAMEAS, WD + "Q43649390"),
    }
    return g


def relations_alignment_triples() -> set[Triple]:
    """relations.py:879-902 — post-processing alignment block."""
    OWL_ = "http://www.w3.org/2002/07/owl#"
    CRM = "http://www.cidoc-crm.org/cidoc-crm/"
    FRBROO = "http://iflastandards.info/ns/fr/frbr/frbroo/"
    EFRBROO = "http://erlangen-crm.org/efrbroo/"
    g: set[Triple] = set()
    for cls in ["E21_Person", "E42_Identifier", "E53_Place", "E55_Type"]:
        g.add(_iri(ECRM + cls, OWL_ + "equivalentClass", CRM + cls))
    for d, i in [("P1_is_identified_by", "P1i_identifies"),
                 ("P2_has_type", "P2i_is_type_of"),
                 ("P67_refers_to", "P67i_is_referred_to_by")]:
        g.add(_iri(ECRM + d, OWL_ + "equivalentProperty", CRM + d))
        g.add(_iri(ECRM + i, OWL_ + "equivalentProperty", CRM + i))
        g.add(_iri(ECRM + d, OWL_ + "inverseOf", ECRM + i))
        g.add(_iri(ECRM + i, OWL_ + "inverseOf", ECRM + d))
    g.add(_iri(LRMOO + "F2_Expression", OWL_ + "equivalentClass", FRBROO + "F2_Expression"))
    g.add(_iri(LRMOO + "F2_Expression", OWL_ + "equivalentClass", EFRBROO + "F2_Expression"))
    return g


def _feature_family(ctx: _Ctx, edges: list[tuple[str, str]], path: str,
                    cls: str, feat_label_fmt: str, act_label_fmt: str,
                    p67_node: str | None, min_works: int = 2,
                    node_builder=None) -> None:
    """Common processor shape for plots/topics/motifs/person/place/characters."""
    typ = path.split("/")[-1]
    mp: dict[str, set[str]] = {}
    for w, t in edges:
        mp.setdefault(t, set()).add(w)
    for tgt in sorted(mp):
        works = sorted(mp[tgt])
        if len(works) < min_works:
            continue
        raw = ctx.label(tgt)
        if node_builder:
            node_builder(ctx, tgt)
        feat = ctx.ensure_feature(tgt, cls, feat_label_fmt.format(l=raw), path) \
            if cls else None
        p67_target = p67_node.format(q=tgt) if p67_node else None
        for w1, w2 in combinations(works, 2):
            e1, e2 = ctx.ensure_expression(w1), ctx.ensure_expression(w2)
            rel = ctx.get_or_create_rel(w1, w2)
            if rel is None:
                continue
            ctx.g.add(_iri(feat, INTRO + "R22_providesSimilarityForRelation", rel))
            ctx.g.add(_iri(rel, INTRO + "R22i_relationIsBasedOnSimilarity", feat))
            for w, e in ((w1, e1), (w2, e2)):
                act = ctx.add_actualization(
                    feat, typ, tgt, w,
                    act_label_fmt.format(l=raw, wl=ctx.label(w)), rel)
                if p67_target:
                    ctx.g.add(_iri(act, ECRM + "P67_refers_to", p67_target))
                    ctx.g.add(_iri(p67_target, ECRM + "P67i_is_referred_to_by", act))


def relations_triples(world: World, work_qids: set[str] | None = None) -> set[Triple]:
    W = work_qids if work_qids is not None else {w["qid"] for w in world.works}
    ctx = _Ctx(world, W)
    ctx.g |= relations_header_triples()

    # 1. int31 — direct intertextual links (relations.py:299-354)
    pairs = []
    for s, o in ctx.edges(["P4969"]):
        if o in W and s != o:
            pairs.append((s, o))
    for s, o in ctx.edges(["P144", "P5059", "P941"]):
        if o in W and s != o:
            pairs.append((o, s))  # reversed (SURVEY §4.4.3)
    for w1, w2 in sorted(set(pairs)):
        ctx.ensure_expression(w1)
        ctx.ensure_expression(w2)
        ctx.get_or_create_rel(w1, w2)

    # 2. plots (relations.py:355-404)
    plot_edges = [(s, o) for s, o in ctx.edges(["P921"])
                  if ctx.instance_of(o, ("Q42109240",))]
    _feature_family(ctx, plot_edges, "feature/plot", INTRO + "INT_Plot",
                    "{l} (plot)", "{l} in {wl}", None)

    # 3. citations (relations.py:765-818)
    directed = sorted({
        (o, s) for s, o in ctx.edges(["P2860", "P6166"])  # ?tgt ?p ?src
        if o in W and s in W and s != o
    })
    seen_und = set()
    for src, tgt in directed:
        key = tuple(sorted((src, tgt)))
        if key in seen_und:
            continue
        seen_und.add(key)
        ctx.ensure_expression(src)
        ctx.ensure_expression(tgt)
        rel = ctx.get_or_create_rel(src, tgt)
        if rel is None:
            continue
        for host, other in ((tgt, src), (src, tgt)):
            host_lbl = ctx.label(host)
            host_expr = ctx.ensure_expression(host)
            tp = f"{SB}textpassage/{host}_{other}"
            if tp not in ctx.node_created:
                ctx.node_created.add(tp)
                ctx.g.add(_iri(tp, RDF_TYPE, INTRO + "INT21_TextPassage"))
                ctx.g.add(_lit(tp, RDFS_LABEL, f"Text passage in {host_lbl}", "en"))
                ctx.g.add(_iri(tp, PROV_DERIVED, WD + tgt))
            ctx.g.add(_iri(host_expr, INTRO + "R30_hasTextPassage", tp))
            ctx.g.add(_iri(tp, INTRO + "R30i_isTextPassageOf", host_expr))
            ctx.g.add(_iri(rel, INTRO + "R24_hasRelatedEntity", tp))
            ctx.g.add(_iri(tp, INTRO + "R24i_isRelatedEntity", rel))

    # 4. topics (relations.py:405-455)
    topic_edges = [(s, o) for s, o in ctx.edges(["P921"])
                   if ctx.instance_of(o, ("Q26256810",))]
    _feature_family(ctx, topic_edges, "feature/topic", INTRO + "INT_Topic",
                    "{l} (topic)", "{l} in {wl}", None)

    # 5. motifs (relations.py:456-503)
    _feature_family(ctx, ctx.edges(["P6962"]), "feature/motif",
                    INTRO + "INT_Motif", "{l} (motif)", "{l} in {wl}", None)

    # 6. persons (relations.py:505-560)
    person_edges = [(s, o) for s, o in ctx.edges(["P180", "P921", "P527"])
                    if ctx.instance_of(o, ("Q5",))]

    def build_person(ctx: _Ctx, qid: str) -> None:
        p_uri = f"{SB}person/{qid}"
        if p_uri not in ctx.node_created:
            ctx.node_created.add(p_uri)
            ctx.g.add(_iri(p_uri, RDF_TYPE, ECRM + "E21_Person"))
            ctx.g.add(_lit(p_uri, RDFS_LABEL, ctx.label(qid), "en"))
            ctx.g.add(_iri(p_uri, OWL_SAMEAS, WD + qid))
            ctx.add_identifier(p_uri, qid)

    def person_feat(ctx: _Ctx, qid: str) -> None:
        build_person(ctx, qid)
        feat = f"{SB}feature/person_ref/{qid}"
        if feat not in ctx.node_created:
            ctx.node_created.add(feat)
            ctx.g.add(_iri(feat, RDF_TYPE, INTRO + "INT18_Reference"))
            ctx.g.add(_lit(feat, RDFS_LABEL,
                           f"Reference to {ctx.label(qid)} (person)", "en"))

    # person_ref features are created by hand (no sameAs/identifier on feature)
    mp: dict[str, set[str]] = {}
    for w, t in person_edges:
        mp.setdefault(t, set()).add(w)
    for tgt in sorted(mp):
        works = sorted(mp[tgt])
        if len(works) < 2:
            continue
        person_feat(ctx, tgt)
        feat = f"{SB}feature/person_ref/{tgt}"
        p_uri = f"{SB}person/{tgt}"
        raw = ctx.label(tgt)
        for w1, w2 in combinations(works, 2):
            ctx.ensure_expression(w1)
            ctx.ensure_expression(w2)
            rel = ctx.get_or_create_rel(w1, w2)
            if rel is None:
                continue
            ctx.g.add(_iri(feat, INTRO + "R22_providesSimilarityForRelation", rel))
            ctx.g.add(_iri(rel, INTRO + "R22i_relationIsBasedOnSimilarity", feat))
            for w in (w1, w2):
                act = ctx.add_actualization(
                    feat, "person_ref", tgt, w,
                    f"Reference to {raw} in {ctx.label(w)}", rel)
                ctx.g.add(_iri(act, ECRM + "P67_refers_to", p_uri))
                ctx.g.add(_iri(p_uri, ECRM + "P67i_is_referred_to_by", act))

    # 7. places (relations.py:562-614)
    place_edges = [(s, o) for s, o in ctx.edges(["P921"])
                   if ctx.instance_of(o, ("Q2221906",))]
    mp = {}
    for w, t in place_edges:
        mp.setdefault(t, set()).add(w)
    for tgt in sorted(mp):
        works = sorted(mp[tgt])
        if len(works) < 2:
            continue
        raw = ctx.label(tgt)
        p_uri = f"{SB}place/{tgt}"
        if p_uri not in ctx.node_created:
            ctx.node_created.add(p_uri)
            ctx.g.add(_iri(p_uri, RDF_TYPE, ECRM + "E53_Place"))
            ctx.g.add(_lit(p_uri, RDFS_LABEL, raw, "en"))
            ctx.g.add(_iri(p_uri, OWL_SAMEAS, WD + tgt))
            ctx.add_identifier(p_uri, tgt)
        feat = f"{SB}feature/place_ref/{tgt}"
        if feat not in ctx.node_created:
            ctx.node_created.add(feat)
            ctx.g.add(_iri(feat, RDF_TYPE, INTRO + "INT18_Reference"))
            ctx.g.add(_lit(feat, RDFS_LABEL, f"Reference to {raw} (place)", "en"))
        for w1, w2 in combinations(works, 2):
            ctx.ensure_expression(w1)
            ctx.ensure_expression(w2)
            rel = ctx.get_or_create_rel(w1, w2)
            if rel is None:
                continue
            ctx.g.add(_iri(feat, INTRO + "R22_providesSimilarityForRelation", rel))
            ctx.g.add(_iri(rel, INTRO + "R22i_relationIsBasedOnSimilarity", feat))
            for w in (w1, w2):
                act = ctx.add_actualization(
                    feat, "place_ref", tgt, w,
                    f"Reference to {raw} in {ctx.label(w)}", rel)
                ctx.g.add(_iri(act, ECRM + "P67_refers_to", p_uri))
                ctx.g.add(_iri(p_uri, ECRM + "P67i_is_referred_to_by", act))

    # 8. characters (relations.py:686-763)
    char_edges = set(ctx.edges(["P674"]))
    char_edges |= {(s, o) for s, o in ctx.edges(["P180", "P921"])
                   if ctx.instance_of(o, ("Q3658341", "Q15632617"))}
    mp = {}
    for w, t in char_edges:
        mp.setdefault(t, set()).add(w)
    for char in sorted(mp):
        works = sorted(mp[char])
        if len(works) < 2:
            continue
        lbl = ctx.label(char)
        is_person = ctx.instance_of(char, ("Q5",))
        p_node = None
        if is_person:
            person_feat(ctx, char)
            p_node = f"{SB}person/{char}"
        feat = ctx.ensure_feature(char, INTRO + "INT_Character", lbl,
                                  "feature/character")
        for w1, w2 in combinations(works, 2):
            ctx.ensure_expression(w1)
            ctx.ensure_expression(w2)
            rel = ctx.get_or_create_rel(w1, w2)
            if rel is None:
                continue
            ctx.g.add(_iri(feat, INTRO + "R22_providesSimilarityForRelation", rel))
            ctx.g.add(_iri(rel, INTRO + "R22i_relationIsBasedOnSimilarity", feat))
            for w in (w1, w2):
                act = ctx.add_actualization(
                    feat, "character", char, w,
                    f"{lbl} in {ctx.label(w)}", rel)
                if p_node:
                    ctx.g.add(_iri(act, ECRM + "P67_refers_to", p_node))
                    ctx.g.add(_iri(p_node, ECRM + "P67i_is_referred_to_by", act))
                # extra add_interpretation (relations.py:757-763) is an exact
                # duplicate of the act's default interpretation → no-op

    # 9. work references (relations.py:616-669)
    by_target: dict[str, set[str]] = {}
    for s, o in ctx.edges(["P921"]):
        if o.startswith("Q") and s in W and o in W:
            by_target.setdefault(o, set()).add(s)
    for tgt in sorted(by_target):
        tgt_lbl = ctx.label(tgt)
        feat = f"{SB}feature/work_ref/{tgt}"
        if feat not in ctx.node_created:
            ctx.node_created.add(feat)
            ctx.g.add(_iri(feat, RDF_TYPE, INTRO + "INT18_Reference"))
            ctx.g.add(_lit(feat, RDFS_LABEL,
                           f"Reference to {tgt_lbl} (expression)", "en"))
        expr_tgt = ctx.ensure_expression(tgt)
        for src in sorted(by_target[tgt]):
            ctx.ensure_expression(src)
            rel = ctx.get_or_create_rel(src, tgt)
            if rel is None:
                continue
            ctx.g.add(_iri(feat, INTRO + "R22_providesSimilarityForRelation", rel))
            ctx.g.add(_iri(rel, INTRO + "R22i_relationIsBasedOnSimilarity", feat))
            act = ctx.add_actualization(
                feat, "work_ref", tgt, src,
                f"Reference to {tgt_lbl} in {ctx.label(src)}", rel)
            ctx.g.add(_iri(act, ECRM + "P67_refers_to", expr_tgt))
            ctx.g.add(_iri(expr_tgt, ECRM + "P67i_is_referred_to_by", act))

    ctx.g |= relations_alignment_triples()
    return ctx.g
