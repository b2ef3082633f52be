"""Constant triple blocks (ontology headers + alignment axioms).

Mirrors the reference's ``create_graph``/``build_graph`` static emissions:
authors.py:148-179, works.py:159-231, relations.py:138-166. These are
O(1)-sized and unioned into each stage's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import (
    CRM,
    ECRM,
    EFRBROO,
    FRBROO,
    INTRO,
    LRMOO,
    OWL,
    RDF_TYPE,
    SAPPHO,
    const_triples,
)

OWL_ONTOLOGY = OWL + "Ontology"
OWL_IMPORTS = OWL + "imports"
OWL_EQ_CLASS = OWL + "equivalentClass"
OWL_EQ_PROP = OWL + "equivalentProperty"
OWL_INVERSE = OWL + "inverseOf"

# authors.py:153-156: ontology node
# authors.py:158-165: class equivalences; authors.py:167-179: property axioms
AUTHOR_CLASSES = [
    "E21_Person", "E67_Birth", "E69_Death", "E52_Time-Span", "E53_Place",
    "E36_Visual_Item", "E55_Type", "E42_Identifier",
]
AUTHOR_PROPS = [
    ("P1_is_identified_by", "P1i_identifies"),
    ("P2_has_type", "P2i_is_type_of"),
    ("P4_has_time-span", "P4i_is_time-span_of"),
    ("P7_took_place_at", "P7i_witnessed"),
    ("P65_shows_visual_item", "P65i_is_shown_by"),
    ("P98_brought_into_life", "P98i_was_born"),
    ("P100_was_death_of", "P100i_died_in"),
    ("P138_represents", "P138i_has_representation"),
]


def _equivalence_block(classes, props, ecrm_ns=ECRM, crm_ns=CRM):
    triples = []
    for cls in classes:
        triples.append((ecrm_ns + cls, OWL_EQ_CLASS, crm_ns + cls))
    for direct, inverse in props:
        triples.append((ecrm_ns + direct, OWL_INVERSE, ecrm_ns + inverse))
        triples.append((ecrm_ns + direct, OWL_EQ_PROP, crm_ns + direct))
        triples.append((ecrm_ns + inverse, OWL_INVERSE, ecrm_ns + direct))
        triples.append((ecrm_ns + inverse, OWL_EQ_PROP, crm_ns + inverse))
    return triples


def authors_header(spark: SparkSession) -> DataFrame:
    onto = SAPPHO + "ontology/authors"
    triples = [
        (onto, RDF_TYPE, OWL_ONTOLOGY),
        (onto, OWL_IMPORTS, ECRM),
    ]
    triples += _equivalence_block(AUTHOR_CLASSES, AUTHOR_PROPS)
    return const_triples(spark, triples)


# works.py:159-231 — WEMI classes + LRMoo/FRBRoo equivalences (subset shared
# with authors plus the work-specific ones)
WORK_ECRM_CLASSES = [
    "E21_Person", "E35_Title", "E42_Identifier", "E52_Time-Span",
    "E53_Place", "E55_Type", "E62_String", "E65_Creation",
]
WORK_LRMOO_CLASSES = [
    ("F1_Work", "F1_Work"),
    ("F2_Expression", "F2_Expression"),
    ("F3_Manifestation", "F3_Manifestation_Product_Type"),
    ("F5_Item", "F5_Item"),
    ("F27_Work_Creation", "F27_Work_Conception"),
    ("F28_Expression_Creation", "F28_Expression_Creation"),
    ("F30_Manifestation_Creation", "F30_Publication_Event"),
    ("F32_Item_Production_Event", "F32_Carrier_Production_Event"),
]
WORK_ECRM_PROPS = [
    ("P1_is_identified_by", "P1i_identifies"),
    ("P2_has_type", "P2i_is_type_of"),
    ("P4_has_time-span", "P4i_is_time-span_of"),
    ("P7_took_place_at", "P7i_witnessed"),
    ("P14_carried_out_by", "P14i_performed"),
    ("P102_has_title", "P102i_is_title_of"),
    ("P108_has_produced", "P108i_was_produced_by"),
    ("P128_carries", "P128i_is_carried_by"),
    ("P190_has_symbolic_content", None),
]
WORK_LRMOO_PROPS = [
    ("R3_is_realised_in", "R3i_realises"),
    ("R4_embodies", "R4i_is_embodied_in"),
    ("R7_is_materialized_in", "R7i_materializes"),
    ("R16_created", "R16i_was_created_by"),
    ("R17_created", "R17i_was_created_by"),
    ("R19_created_a_realisation_of", "R19i_was_realised_through"),
    ("R24_created", "R24i_was_created_through"),
]


def works_header(spark: SparkSession) -> DataFrame:
    onto = SAPPHO + "ontology/works"
    triples = [
        (onto, RDF_TYPE, OWL_ONTOLOGY),
        (onto, OWL_IMPORTS, ECRM),
        (onto, OWL_IMPORTS, LRMOO),
    ]
    for cls in WORK_ECRM_CLASSES:
        triples.append((ECRM + cls, OWL_EQ_CLASS, CRM + cls))
    for lrm, frbr in WORK_LRMOO_CLASSES:
        triples.append((LRMOO + lrm, OWL_EQ_CLASS, FRBROO + frbr))
        triples.append((LRMOO + lrm, OWL_EQ_CLASS, EFRBROO + frbr))
    for direct, inverse in WORK_ECRM_PROPS:
        triples.append((ECRM + direct, OWL_EQ_PROP, CRM + direct))
        if inverse:
            triples.append((ECRM + direct, OWL_INVERSE, ECRM + inverse))
            triples.append((ECRM + inverse, OWL_INVERSE, ECRM + direct))
            triples.append((ECRM + inverse, OWL_EQ_PROP, CRM + inverse))
    for direct, inverse in WORK_LRMOO_PROPS:
        triples.append((LRMOO + direct, OWL_INVERSE, LRMOO + inverse))
        triples.append((LRMOO + inverse, OWL_INVERSE, LRMOO + direct))
    return const_triples(spark, triples)


def relations_header(spark: SparkSession) -> DataFrame:
    """relations.py:154-166 — ontology node importing eCRM/LRMoo/INTRO."""
    onto = SAPPHO + "ontology/relations"
    triples = [
        (onto, RDF_TYPE, OWL_ONTOLOGY),
        (onto, OWL_IMPORTS, ECRM),
        (onto, OWL_IMPORTS, LRMOO),
        (onto, OWL_IMPORTS, INTRO.rstrip("#")),
    ]
    return const_triples(spark, triples)
