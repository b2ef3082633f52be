"""Pure-Python golden oracle for the mapping stages.

A tiny, network-free re-statement of the reference's emission semantics
(authors.py / works.py / relations.py) over the fixture :class:`World`.
Tests compare its triple set against the Spark stages' output — this is the
P/R ≥ 0.95 gate from BASELINE.json, evaluated at fixture scale.

Independent implementation detail: this module walks plain dicts and emits
5-tuples ``(subj, pred, obj, lang, dtype)``; it shares URI/namespace
constants with the Spark side (model.py) but no plan code.
"""

from __future__ import annotations

from .fixtures import World
from .model import (
    ECRM,
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

Triple = tuple[str, str, str, str | None, str | None]


def _iri(s: str, p: str, o: str) -> Triple:
    return (s, p, o, None, None)


def _lit(s: str, p: str, o: str, lang: str | None = None,
         dtype: str | None = None) -> Triple:
    return (s, p, o, lang, dtype)


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


def precision_recall(engine: set, golden: set) -> tuple[float, float]:
    if not engine or not golden:
        return (0.0, 0.0)
    tp = len(engine & golden)
    return tp / len(engine), tp / len(golden)
