"""Pure-Python golden oracle for the mapping stages.

A tiny, network-free re-statement of the reference's emission semantics
(authors.py / works.py / relations.py) over the fixture :class:`World`.
Tests compare its triple set against the Spark stages' output — this is the
P/R ≥ 0.95 gate from BASELINE.json, evaluated at fixture scale.

Independent implementation detail: this module walks plain dicts and emits
6-tuples ``(subj, pred, obj, lang, dtype, obj_is_iri)``; it shares
URI/namespace constants with the Spark side (model.py) but no plan code.
"""

from __future__ import annotations

from .fixtures import World
from .model import (
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
)
from .plans.constants import AUTHOR_CLASSES, AUTHOR_PROPS, _equivalence_block

XSD_DATE = XSD + "date"

Triple = tuple[str, str, str, str | None, str | None, bool]


def _iri(s: str, p: str, o: str) -> Triple:
    return (s, p, o, None, None, True)


def _lit(s: str, p: str, o: str, lang: str | None = None,
         dtype: str | None = None) -> Triple:
    return (s, p, o, lang, dtype, False)


def authors_header_triples() -> set[Triple]:
    onto = SAPPHO + "ontology/authors"
    out = {
        _iri(onto, RDF_TYPE, "http://www.w3.org/2002/07/owl#Ontology"),
        _iri(onto, "http://www.w3.org/2002/07/owl#imports", ECRM),
    }
    for s, p, o in _equivalence_block(AUTHOR_CLASSES, AUTHOR_PROPS):
        out.add(_iri(s, p, o))
    return out


def authors_triples(world: World, person_qids: set[str] | None = None) -> set[Triple]:
    """Reference semantics of process_authors (authors.py:254-363), with the
    documented deterministic divergences (SURVEY.md §4.4.1/.7)."""
    g: set[Triple] = set(authors_header_triples())
    sb = SAPPHO
    for p in world.persons:
        qid = p["qid"]
        if person_qids is not None and qid not in person_qids:
            continue
        wd_uri = WD + qid
        label = p["label"] or f"Unknown ({qid})"
        person = f"{sb}person/{qid}"
        identifier = f"{sb}identifier/{qid}"
        id_type = f"{sb}id_type/wikidata"

        g.add(_iri(person, RDF_TYPE, ECRM + "E21_Person"))
        g.add(_iri(person, OWL_SAMEAS, wd_uri))
        g.add(_lit(person, RDFS_LABEL, label, "en"))
        g.add(_iri(person, ECRM + "P1_is_identified_by", identifier))
        g.add(_iri(identifier, ECRM + "P1i_identifies", person))
        g.add(_iri(identifier, RDF_TYPE, ECRM + "E42_Identifier"))
        g.add(_lit(identifier, RDFS_LABEL, qid))
        g.add(_iri(identifier, ECRM + "P2_has_type", id_type))
        g.add(_iri(id_type, ECRM + "P2i_is_type_of", identifier))
        g.add(_iri(id_type, RDF_TYPE, ECRM + "E55_Type"))
        g.add(_lit(id_type, RDFS_LABEL, "Wikidata ID", "en"))

        for kind, date_key, place_key, cls, inv, direct in [
            ("birth", "birth_date", "birth_place", "E67_Birth",
             "P98i_was_born", "P98_brought_into_life"),
            ("death", "death_date", "death_place", "E69_Death",
             "P100i_died_in", "P100_was_death_of"),
        ]:
            date = p.get(date_key)
            place_qid = p.get(place_key)
            if not date and not place_qid:
                continue
            event = f"{sb}{kind}/{qid}"
            g.add(_iri(person, ECRM + inv, event))
            g.add(_iri(event, ECRM + direct, person))
            g.add(_iri(event, RDF_TYPE, ECRM + cls))
            g.add(_lit(event, RDFS_LABEL, f"{kind.capitalize()} of {label}", "en"))
            g.add(_iri(event, PROV_DERIVED, wd_uri))
            if date:
                d = date.split("T")[0]
                ts = f"{sb}timespan/{d.replace('-', '')}"
                g.add(_iri(ts, RDF_TYPE, ECRM + "E52_Time-Span"))
                g.add(_lit(ts, RDFS_LABEL, d, None, XSD_DATE))
                g.add(_iri(event, ECRM + "P4_has_time-span", ts))
                g.add(_iri(ts, ECRM + "P4i_is_time-span_of", event))
            if place_qid:
                place = f"{sb}place/{place_qid}"
                g.add(_iri(event, ECRM + "P7_took_place_at", place))
                g.add(_iri(place, ECRM + "P7i_witnessed", event))
                g.add(_iri(place, RDF_TYPE, ECRM + "E53_Place"))
                g.add(_iri(place, OWL_SAMEAS, WD + place_qid))
                place_label = next(
                    (l for q, lg, l in world.labels if q == place_qid and lg == "en"),
                    None,
                )
                if place_label:
                    g.add(_lit(place, RDFS_LABEL, place_label, "en"))

        gender_qid = p.get("gender")
        gender_label = None
        if gender_qid:
            gender_label = next(
                (l for q, lg, l in world.labels if q == gender_qid and lg == "en"),
                None,
            )
        if gender_qid and gender_label:
            gender = f"{sb}gender/{gender_qid}"
            gtype = f"{sb}gender_type/wikidata"
            g.add(_iri(gender, RDF_TYPE, ECRM + "E55_Type"))
            g.add(_lit(gender, RDFS_LABEL, gender_label, "en"))
            g.add(_iri(gender, OWL_SAMEAS, WD + gender_qid))
            g.add(_iri(gender, ECRM + "P2_has_type", gtype))
            g.add(_iri(gtype, ECRM + "P2i_is_type_of", gender))
            g.add(_iri(gtype, RDF_TYPE, ECRM + "E55_Type"))
            g.add(_lit(gtype, RDFS_LABEL, "Wikidata Gender", "en"))
            g.add(_iri(person, ECRM + "P2_has_type", gender))
            g.add(_iri(gender, ECRM + "P2i_is_type_of", person))

        image = p.get("image")
        if image:
            visual = f"{sb}visual_item/{qid}"
            g.add(_iri(visual, RDF_TYPE, ECRM + "E36_Visual_Item"))
            g.add(_lit(visual, RDFS_LABEL, f"Visual representation of {label}", "en"))
            g.add(_iri(visual, ECRM + "P138_represents", person))
            g.add(_iri(person, ECRM + "P138i_has_representation", visual))
            g.add(_iri(visual, RDFS_SEEALSO, image))
            g.add(_iri(visual, PROV_DERIVED, wd_uri))
    return g


def _label_service(world: World, qid: str | None) -> str | None:
    """WDQS label service semantics: en → de → the QID itself."""
    if qid is None:
        return None
    en = de = None
    for q, lg, l in world.labels:
        if q == qid:
            if lg == "en":
                en = l
            elif lg == "de":
                de = l
    return en or de or qid


def _fetch_label(world: World, qid: str) -> tuple[str, str]:
    """works.py:285-305 — requires a de label, else 'Untitled'@en."""
    for q, lg, l in world.labels:
        if q == qid and lg == "de":
            return l, "de"
    return "Untitled", "en"


def works_header_triples_set() -> set[Triple]:  # noqa: D103
    from .plans.constants import works_header_triples

    return {_iri(s, p, o) for s, p, o in works_header_triples()}


def works_triples(world: World, work_qids: set[str] | None = None) -> set[Triple]:
    """Reference semantics of works.py process (works.py:333-554)."""
    g: set[Triple] = set(works_header_triples_set())
    sb = SAPPHO
    id_type = f"{sb}id_type/wikidata"
    for wk in world.works:
        qid = wk["qid"]
        if work_qids is not None and qid not in work_qids:
            continue
        wd_uri = WD + qid
        work = f"{sb}work/{qid}"
        expr = f"{sb}expression/{qid}"
        title_de, title_en = wk.get("title_de"), wk.get("title_en")
        work_label = _label_service(world, qid)
        if title_de:
            label, lang = title_de, "de"
        elif title_en:
            label, lang = title_en, "en"
        elif work_label:
            label, lang = work_label, "de"
        else:
            label, lang = "Untitled", "en"

        g.add(_iri(work, RDF_TYPE, LRMOO + "F1_Work"))
        g.add(_lit(work, RDFS_LABEL, f"Work of {label}", "en"))
        g.add(_iri(work, LRMOO + "R3_is_realised_in", expr))
        g.add(_iri(expr, LRMOO + "R3i_realises", work))

        wc = f"{sb}work_creation/{qid}"
        g.add(_iri(wc, RDF_TYPE, LRMOO + "F27_Work_Creation"))
        g.add(_lit(wc, RDFS_LABEL, f"Work creation of {label}", "en"))
        g.add(_iri(wc, LRMOO + "R16_created", work))
        g.add(_iri(work, LRMOO + "R16i_was_created_by", wc))
        g.add(_iri(wc, PROV_DERIVED, wd_uri))

        author_qid = wk.get("author")
        author = f"{sb}person/{author_qid}" if author_qid else None
        if author_qid:
            g.add(_iri(wc, ECRM + "P14_carried_out_by", author))
            g.add(_iri(author, ECRM + "P14i_performed", wc))
            g.add(_iri(author, RDF_TYPE, ECRM + "E21_Person"))
            g.add(_lit(author, RDFS_LABEL, _label_service(world, author_qid)))
            g.add(_iri(author, OWL_SAMEAS, WD + author_qid))

        ident = f"{sb}identifier/{qid}"
        title = f"{sb}title/expression/{qid}"
        g.add(_iri(expr, RDF_TYPE, LRMOO + "F2_Expression"))
        g.add(_lit(expr, RDFS_LABEL, f"Expression of {label}", "en"))
        g.add(_iri(expr, ECRM + "P1_is_identified_by", ident))
        g.add(_iri(ident, ECRM + "P1i_identifies", expr))
        g.add(_iri(ident, RDF_TYPE, ECRM + "E42_Identifier"))
        g.add(_lit(ident, RDFS_LABEL, qid))
        g.add(_iri(ident, ECRM + "P2_has_type", id_type))
        g.add(_iri(id_type, ECRM + "P2i_is_type_of", ident))
        g.add(_iri(id_type, RDF_TYPE, ECRM + "E55_Type"))
        g.add(_lit(id_type, RDFS_LABEL, "Wikidata ID", "en"))
        g.add(_iri(id_type, OWL_SAMEAS, "http://www.wikidata.org/wiki/Q43649390"))
        g.add(_iri(expr, ECRM + "P102_has_title", title))
        g.add(_iri(title, ECRM + "P102i_is_title_of", expr))
        g.add(_iri(title, RDF_TYPE, ECRM + "E35_Title"))
        g.add(_iri(title, ECRM + "P190i_is_content_of", title))
        g.add(_iri(expr, OWL_SAMEAS, wd_uri))
        g.add(_iri(expr, PROV_DERIVED, wd_uri))

        genre_qid = wk.get("genre")
        if genre_qid:
            genre = f"{sb}genre/{genre_qid}"
            gtype = f"{sb}genre_type/wikidata"
            g.add(_iri(genre, RDF_TYPE, ECRM + "E55_Type"))
            g.add(_lit(genre, RDFS_LABEL, _label_service(world, genre_qid), "en"))
            g.add(_iri(genre, OWL_SAMEAS, WD + genre_qid))
            g.add(_iri(genre, ECRM + "P2_has_type", gtype))
            g.add(_iri(gtype, ECRM + "P2i_is_type_of", genre))
            g.add(_iri(gtype, RDF_TYPE, ECRM + "E55_Type"))
            g.add(_lit(gtype, RDFS_LABEL, "Wikidata Genre", "en"))
            g.add(_iri(expr, ECRM + "P2_has_type", genre))
            g.add(_iri(genre, ECRM + "P2i_is_type_of", expr))

        ec = f"{sb}expression_creation/{qid}"
        g.add(_iri(ec, RDF_TYPE, LRMOO + "F28_Expression_Creation"))
        g.add(_lit(ec, RDFS_LABEL, f"Expression creation of {label}", "en"))
        g.add(_iri(ec, LRMOO + "R17_created", expr))
        g.add(_iri(expr, LRMOO + "R17i_was_created_by", ec))
        g.add(_iri(ec, LRMOO + "R19_created_a_realisation_of", work))
        g.add(_iri(work, LRMOO + "R19i_was_realised_through", ec))
        g.add(_iri(ec, PROV_DERIVED, wd_uri))
        if author_qid:
            g.add(_iri(ec, ECRM + "P14_carried_out_by", author))

        creation = wk.get("creation_date")
        if creation:
            year = creation[:4]
            ts = f"{sb}timespan/{year}"
            g.add(_iri(ts, RDF_TYPE, ECRM + "E52_Time-Span"))
            g.add(_lit(ts, RDFS_LABEL, year, None, XSD + "gYear"))
            g.add(_iri(ec, ECRM + "P4_has_time-span", ts))
            g.add(_iri(ts, ECRM + "P4i_is_time-span_of", ec))

        manif = f"{sb}manifestation/{qid}"
        mtitle = f"{sb}title/manifestation/{qid}"
        mtstr = f"{sb}title_string/manifestation/{qid}"
        g.add(_iri(manif, RDF_TYPE, LRMOO + "F3_Manifestation"))
        g.add(_lit(manif, RDFS_LABEL, f"Manifestation of {label}", "en"))
        g.add(_iri(manif, LRMOO + "R4_embodies", expr))
        g.add(_iri(expr, LRMOO + "R4i_is_embodied_in", manif))
        if wk.get("published_in"):
            m_label, m_lang = _fetch_label(world, wk["published_in"])
        elif wk.get("part_of"):
            m_label, m_lang = _fetch_label(world, wk["part_of"])
        else:
            m_label, m_lang = label, lang
        g.add(_iri(manif, ECRM + "P102_has_title", mtitle))
        g.add(_iri(mtitle, ECRM + "P102i_is_title_of", manif))
        g.add(_iri(mtitle, RDF_TYPE, ECRM + "E35_Title"))
        g.add(_iri(mtitle, ECRM + "P190_has_symbolic_content", mtstr))
        g.add(_lit(mtitle, RDFS_LABEL, m_label, m_lang))

        mc = f"{sb}manifestation_creation/{qid}"
        g.add(_iri(mc, RDF_TYPE, LRMOO + "F30_Manifestation_Creation"))
        g.add(_lit(mc, RDFS_LABEL, f"Manifestation creation of {label}", "en"))
        g.add(_iri(mc, LRMOO + "R24_created", manif))
        g.add(_iri(manif, LRMOO + "R24i_was_created_through", mc))
        g.add(_iri(mc, PROV_DERIVED, wd_uri))
        if author_qid:
            g.add(_iri(mc, ECRM + "P14_carried_out_by", author))
            g.add(_iri(author, ECRM + "P14i_performed", mc))

        pub_qid = wk.get("publisher")
        if pub_qid:
            publisher = f"{sb}publisher/{pub_qid}"
            g.add(_iri(publisher, RDF_TYPE, ECRM + "E74_Group"))
            g.add(_lit(publisher, RDFS_LABEL, _label_service(world, pub_qid), "en"))
            g.add(_iri(publisher, OWL_SAMEAS, WD + pub_qid))
            g.add(_iri(mc, ECRM + "P14_carried_out_by", publisher))
            g.add(_iri(publisher, ECRM + "P14i_performed", mc))

        if wk.get("pub_date"):
            pub_year = wk["pub_date"][:4]
            ts = f"{sb}timespan/{pub_year}"
            g.add(_iri(ts, RDF_TYPE, ECRM + "E52_Time-Span"))
            g.add(_lit(ts, RDFS_LABEL, pub_year, None, XSD + "gYear"))
            g.add(_iri(mc, ECRM + "P4_has_time-span", ts))
            g.add(_iri(ts, ECRM + "P4i_is_time-span_of", mc))

        pp_qid = wk.get("pub_place")
        if pp_qid:
            place = f"{sb}place/{pp_qid}"
            g.add(_iri(place, RDF_TYPE, ECRM + "E53_Place"))
            g.add(_lit(place, RDFS_LABEL, _label_service(world, pp_qid), "en"))
            g.add(_iri(place, OWL_SAMEAS, WD + pp_qid))
            g.add(_iri(mc, ECRM + "P7_took_place_at", place))
            g.add(_iri(place, ECRM + "P7i_witnessed", mc))

        ed_qid = wk.get("editor")
        if ed_qid:
            editor = f"{sb}person/{ed_qid}"
            eid = f"{sb}identifier/{ed_qid}"
            g.add(_iri(editor, RDF_TYPE, ECRM + "E21_Person"))
            g.add(_lit(editor, RDFS_LABEL, _label_service(world, ed_qid)))
            g.add(_iri(editor, OWL_SAMEAS, WD + ed_qid))
            g.add(_iri(editor, ECRM + "P1_is_identified_by", eid))
            g.add(_iri(eid, ECRM + "P1i_identifies", editor))
            g.add(_iri(eid, RDF_TYPE, ECRM + "E42_Identifier"))
            g.add(_lit(eid, RDFS_LABEL, ed_qid))
            g.add(_iri(eid, ECRM + "P2_has_type", id_type))
            g.add(_iri(id_type, ECRM + "P2i_is_type_of", eid))
            g.add(_iri(mc, ECRM + "P14_carried_out_by", editor))
            g.add(_iri(editor, ECRM + "P14i_performed", mc))

        ip = f"{sb}item_production/{qid}"
        item = f"{sb}item/{qid}"
        g.add(_iri(ip, RDF_TYPE, LRMOO + "F32_Item_Production_Event"))
        g.add(_lit(ip, RDFS_LABEL, f"Item production event of {label}", "en"))
        g.add(_iri(ip, LRMOO + "R27_materialized", manif))
        g.add(_iri(manif, LRMOO + "R27i_was_materialized_by", ip))
        g.add(_iri(ip, LRMOO + "R28_produced", item))
        g.add(_iri(item, LRMOO + "R28i_was_produced_by", ip))
        g.add(_iri(item, RDF_TYPE, LRMOO + "F5_Item"))
        g.add(_lit(item, RDFS_LABEL, f"Item of {label}", "en"))
        g.add(_iri(item, LRMOO + "R7_exemplifies", manif))
        g.add(_iri(manif, LRMOO + "R7i_is_exemplified_by", item))

        if wk.get("digital_copy"):
            digital = f"{sb}digital/{qid}"
            g.add(_iri(digital, RDF_TYPE, ECRM + "E73_Information_Object"))
            g.add(_lit(digital, RDFS_LABEL, f"Digital copy of {label}", "en"))
            g.add(_iri(digital, ECRM + "P138_represents", expr))
            g.add(_iri(expr, ECRM + "P138i_has_representation", digital))
            g.add(_iri(digital, RDFS_SEEALSO, wk["digital_copy"]))
    return g


def merge_triples(*graphs: set[Triple]) -> set[Triple]:
    """merge.py:34-77 semantics with the engine's deterministic label order."""
    from .model import INTRO, LRMOO_ONTO, OWL

    g: set[Triple] = set()
    for gr in graphs:
        g |= gr
    # one rdfs:label per subject, lang-tagged preferred, deterministic order
    by_subj: dict[str, list[Triple]] = {}
    for t in g:
        if t[1] == RDFS_LABEL:
            by_subj.setdefault(t[0], []).append(t)
    out = {t for t in g if t[1] != RDFS_LABEL}
    for s, cands in by_subj.items():
        cands.sort(key=lambda t: (t[3] is None, t[3] or "", t[2], t[4] or ""))
        out.add(cands[0])
    # ontology rewrite
    onto = {t[0] for t in out
            if t[1] == RDF_TYPE and t[2] == OWL + "Ontology"}
    out = {t for t in out if t[0] not in onto}
    all_uri = SAPPHO + "ontology/all"
    out.add(_iri(all_uri, RDF_TYPE, OWL + "Ontology"))
    out.add(_iri(all_uri, OWL + "imports", ECRM))
    out.add(_iri(all_uri, OWL + "imports", LRMOO_ONTO))
    out.add(_iri(all_uri, OWL + "imports", INTRO))
    return out


def precision_recall(engine: set, golden: set) -> tuple[float, float]:
    if not engine or not golden:
        return (0.0, 0.0)
    tp = len(engine & golden)
    return tp / len(engine), tp / len(golden)
