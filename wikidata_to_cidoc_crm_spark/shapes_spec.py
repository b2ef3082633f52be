"""Declarative transcription of the reference's SHACL shape files.

One :class:`~.shacl.Shape` per ``sh:NodeShape`` in
``/root/reference/src/wiki2crm/shapes/{author,work,relations}-shapes.ttl``;
each Prop cites the shape-file lines it implements. The reference validates
per module (authors graph vs author-shapes, etc. — authors.py:413-431,
works.py:600-619, relations.py:908-927); these lists mirror that split.

``sh:node <X>`` is compiled to "value is a target of shape X" — X's own
row in the list validates the inner constraints globally (the scalable
reading of shape conformance; see shacl.py docstring).
"""

from __future__ import annotations

from .model import ECRM, INTRO, LRMOO, LRMOO_ONTO, OWL, PROV_DERIVED, RDF_TYPE
from .model import RDFS_LABEL, RDFS_SEEALSO, OWL_SAMEAS, SAPPHO, XSD
from .shacl import WD_Q, Prop, Shape

E = ECRM
L = LRMOO
I = INTRO
XSD_DATE = XSD + "date"
XSD_GYEAR = XSD + "gYear"
ID_TYPE = SAPPHO + "id_type/wikidata"
GENDER_TYPE = SAPPHO + "gender_type/wikidata"
GENRE_TYPE = SAPPHO + "genre_type/wikidata"

# ------------------------------------------------------------- authors
AUTHOR_SHAPES: list[Shape] = [
    Shape("TimeSpanShape", "class", E + "E52_Time-Span", (
        Prop(RDFS_LABEL, datatype=XSD_DATE, min_count=1, max_count=1,
             ref="author-shapes.ttl:16-24"),
    ), ref="author-shapes.ttl:16-24"),
    Shape("PlaceShape", "class", E + "E53_Place", (
        Prop(OWL_SAMEAS, min_count=1, node_kind="IRI", starts_with=WD_Q,
             ref="author-shapes.ttl:30-45"),
        Prop(RDFS_LABEL, language_in=("en",), max_count=1,
             ref="author-shapes.ttl:46-50"),
    ), ref="author-shapes.ttl:27-50"),
    Shape("IdentifierShape", "class", E + "E42_Identifier", (
        Prop(RDFS_LABEL, pattern="^Q[0-9]+$", min_count=1, max_count=1,
             ref="author-shapes.ttl:56-61"),
        Prop(E + "P2_has_type", has_value=ID_TYPE, min_count=1, max_count=1,
             ref="author-shapes.ttl:62-67"),
    ), ref="author-shapes.ttl:53-67"),
    Shape("IdentifierTypeNodeShape", "node", ID_TYPE, (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="author-shapes.ttl:73-77"),
        Prop(RDFS_LABEL, language_in=("en",), has_literal=("Wikidata ID", "en"),
             min_count=1, max_count=1, ref="author-shapes.ttl:78-84"),
    ), ref="author-shapes.ttl:70-84"),
    Shape("GenderNodeShape", "prefix", SAPPHO + "gender/", (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="author-shapes.ttl:97-101"),
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="author-shapes.ttl:102-107"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1,
             ref="author-shapes.ttl:108-112"),
        Prop(E + "P2_has_type", has_value=GENDER_TYPE, min_count=1, max_count=1,
             ref="author-shapes.ttl:113-118"),
    ), ref="author-shapes.ttl:87-118"),
    Shape("GenderTypeNodeShape", "node", GENDER_TYPE, (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="author-shapes.ttl:124-128"),
        Prop(RDFS_LABEL, language_in=("en",),
             has_literal=("Wikidata Gender", "en"), min_count=1, max_count=1,
             ref="author-shapes.ttl:129-135"),
    ), ref="author-shapes.ttl:121-135"),
    Shape("BirthEventShape", "class", E + "E67_Birth", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="author-shapes.ttl:145-150"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="author-shapes.ttl:151-155"),
        Prop(E + "P98_brought_into_life", cls_any=(E + "E21_Person",),
             min_count=1, ref="author-shapes.ttl:157-161"),
        Prop(E + "P98i_was_born", inverse=True, min_count=1,
             ref="author-shapes.ttl:162-165"),
        Prop(E + "P4_has_time-span", node="TimeSpanShape", max_count=1,
             ref="author-shapes.ttl:167-171"),
        Prop(E + "P7_took_place_at", node="PlaceShape", max_count=1,
             ref="author-shapes.ttl:173-177"),
    ), ref="author-shapes.ttl:142-177"),
    Shape("DeathEventShape", "class", E + "E69_Death", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="author-shapes.ttl:183-188"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="author-shapes.ttl:189-193"),
        Prop(E + "P100_was_death_of", cls_any=(E + "E21_Person",), min_count=1,
             ref="author-shapes.ttl:194-198"),
        Prop(E + "P100i_died_in", inverse=True, min_count=1,
             ref="author-shapes.ttl:199-202"),
        Prop(E + "P4_has_time-span", node="TimeSpanShape", max_count=1,
             ref="author-shapes.ttl:203-207"),
        Prop(E + "P7_took_place_at", node="PlaceShape", max_count=1,
             ref="author-shapes.ttl:208-212"),
    ), ref="author-shapes.ttl:180-212"),
    Shape("VisualItemShape", "class", E + "E36_Visual_Item", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="author-shapes.ttl:222-227"),
        Prop(E + "P138_represents", cls_any=(E + "E21_Person",), min_count=1,
             ref="author-shapes.ttl:228-232"),
        Prop(E + "P138i_has_representation", inverse=True, min_count=1,
             ref="author-shapes.ttl:233-236"),
        Prop(RDFS_SEEALSO, node_kind="IRI", min_count=1, max_count=1,
             ref="author-shapes.ttl:237-242"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="author-shapes.ttl:243-247"),
    ), ref="author-shapes.ttl:219-247"),
    Shape("PersonShape", "class", E + "E21_Person", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="author-shapes.ttl:258-263"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, max_count=1,
             starts_with=WD_Q, ref="author-shapes.ttl:266-282"),
        Prop(E + "P1_is_identified_by", node="IdentifierShape",
             min_count=1, max_count=1, ref="author-shapes.ttl:285-290"),
        Prop(E + "P98i_was_born", node="BirthEventShape", max_count=1,
             ref="author-shapes.ttl:300-305"),
        Prop(E + "P100i_died_in", node="DeathEventShape", max_count=1,
             ref="author-shapes.ttl:306-311"),
        Prop(E + "P138i_has_representation", node="VisualItemShape",
             max_count=1, ref="author-shapes.ttl:314-319"),
    ), ref="author-shapes.ttl:253-319"),
    Shape("OntologyNodeShape", "node", SAPPHO + "ontology/authors", (
        Prop(RDF_TYPE, has_value=OWL + "Ontology", min_count=1,
             ref="author-shapes.ttl:328-332"),
        Prop(OWL + "imports", has_value=ECRM, min_count=1,
             ref="author-shapes.ttl:333-337"),
    ), ref="author-shapes.ttl:325-337"),
]

# ------------------------------------------------------------- works
WORK_SHAPES: list[Shape] = [
    Shape("YearTimeSpanShape", "class", E + "E52_Time-Span", (
        Prop(RDFS_LABEL, datatype=XSD_GYEAR, min_count=1, max_count=1,
             ref="work-shapes.ttl:19-27"),
    ), ref="work-shapes.ttl:19-27"),
    Shape("PlaceShape", "class", E + "E53_Place", (
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, starts_with=WD_Q,
             ref="work-shapes.ttl:33-52"),
        Prop(RDFS_LABEL, language_in=("en",), max_count=1,
             ref="work-shapes.ttl:53-57"),
    ), ref="work-shapes.ttl:30-57"),
    Shape("PersonRefShape", "class", E + "E21_Person", (
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, starts_with=WD_Q,
             ref="work-shapes.ttl:64-83"),
    ), ref="work-shapes.ttl:61-83"),
    Shape("IdentifierShape", "class", E + "E42_Identifier", (
        Prop(RDFS_LABEL, pattern="^Q[0-9]+$", min_count=1, max_count=1,
             ref="work-shapes.ttl:89-94"),
        Prop(E + "P2_has_type", has_value=ID_TYPE, min_count=1, max_count=1,
             ref="work-shapes.ttl:95-100"),
    ), ref="work-shapes.ttl:86-100"),
    Shape("IdentifierTypeNodeShape", "node", ID_TYPE, (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="work-shapes.ttl:106-110"),
        Prop(RDFS_LABEL, language_in=("en",), has_literal=("Wikidata ID", "en"),
             min_count=1, max_count=1, ref="work-shapes.ttl:111-117"),
    ), ref="work-shapes.ttl:103-117"),
    Shape("GenreNodeShape", "prefix", SAPPHO + "genre/", (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="work-shapes.ttl:130-134"),
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:135-140"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, starts_with=WD_Q,
             ref="work-shapes.ttl:141-160"),
        Prop(E + "P2_has_type", has_value=GENRE_TYPE, min_count=1, max_count=1,
             ref="work-shapes.ttl:161-166"),
    ), ref="work-shapes.ttl:120-166"),
    Shape("GenreTypeNodeShape", "node", GENRE_TYPE, (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="work-shapes.ttl:172-176"),
        Prop(RDFS_LABEL, language_in=("en",),
             has_literal=("Wikidata Genre", "en"), min_count=1, max_count=1,
             ref="work-shapes.ttl:177-183"),
    ), ref="work-shapes.ttl:169-183"),
    Shape("PublisherShape", "class", E + "E74_Group", (
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, starts_with=WD_Q,
             ref="work-shapes.ttl:189-208"),
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:209-214"),
    ), ref="work-shapes.ttl:186-214"),
    Shape("TitleShape", "class", E + "E35_Title", (
        Prop(RDFS_LABEL, language_in=("en", "de"), min_count=1, max_count=1,
             ref="work-shapes.ttl:223-228"),
        Prop(E + "P102_has_title", inverse=True, min_count=1,
             ref="work-shapes.ttl:229-232"),
    ), ref="work-shapes.ttl:220-232"),
    Shape("WorkShape", "class", L + "F1_Work", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:242-247"),
        Prop(L + "R3_is_realised_in", node="ExpressionShape",
             min_count=1, max_count=1, ref="work-shapes.ttl:249-254"),
        Prop(L + "R16i_was_created_by", node="WorkCreationShape",
             min_count=1, max_count=1, ref="work-shapes.ttl:256-261"),
    ), ref="work-shapes.ttl:239-261"),
    Shape("WorkCreationShape", "class", L + "F27_Work_Creation", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:267-272"),
        Prop(L + "R16_created", cls_any=(L + "F1_Work",), min_count=1,
             ref="work-shapes.ttl:273-277"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="work-shapes.ttl:278-282"),
        Prop(E + "P14_carried_out_by", node="PersonRefShape",
             ref="work-shapes.ttl:284-288"),
    ), ref="work-shapes.ttl:264-288"),
    Shape("ExpressionShape", "class", L + "F2_Expression", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:294-299"),
        Prop(E + "P1_is_identified_by", node="IdentifierShape",
             min_count=1, max_count=1, ref="work-shapes.ttl:301-306"),
        Prop(E + "P102_has_title", node="TitleShape", min_count=1, max_count=1,
             ref="work-shapes.ttl:308-313"),
        Prop(L + "R3i_realises", cls_any=(L + "F1_Work",), min_count=1,
             ref="work-shapes.ttl:321-325"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, max_count=1,
             starts_with=WD_Q, ref="work-shapes.ttl:327-347"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="work-shapes.ttl:348-352"),
        Prop(L + "R17i_was_created_by", node="ExpressionCreationShape",
             min_count=1, max_count=1, ref="work-shapes.ttl:354-359"),
        Prop(E + "P138i_has_representation", node="DigitalCopyShape",
             max_count=1, ref="work-shapes.ttl:361-366"),
    ), ref="work-shapes.ttl:291-366"),
    Shape("ExpressionCreationShape", "class", L + "F28_Expression_Creation", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:372-377"),
        Prop(L + "R17_created", cls_any=(L + "F2_Expression",), min_count=1,
             ref="work-shapes.ttl:378-382"),
        Prop(L + "R19_created_a_realisation_of", cls_any=(L + "F1_Work",),
             min_count=1, ref="work-shapes.ttl:383-387"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="work-shapes.ttl:388-392"),
        Prop(E + "P14_carried_out_by", node="PersonRefShape",
             ref="work-shapes.ttl:394-398"),
        Prop(E + "P4_has_time-span", node="YearTimeSpanShape", max_count=1,
             ref="work-shapes.ttl:400-405"),
    ), ref="work-shapes.ttl:369-405"),
    Shape("ManifestationShape", "class", L + "F3_Manifestation", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:411-416"),
        Prop(L + "R4_embodies", node="ExpressionShape", min_count=1,
             max_count=1, ref="work-shapes.ttl:417-422"),
        Prop(E + "P102_has_title", node="TitleShape", min_count=1, max_count=1,
             ref="work-shapes.ttl:424-429"),
        Prop(L + "R24i_was_created_through", node="ManifestationCreationShape",
             min_count=1, max_count=1, ref="work-shapes.ttl:431-436"),
        Prop(L + "R7i_is_exemplified_by", cls_any=(L + "F5_Item",),
             ref="work-shapes.ttl:438-442"),
    ), ref="work-shapes.ttl:408-442"),
    Shape("ManifestationCreationShape", "class", L + "F30_Manifestation_Creation", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:448-453"),
        Prop(L + "R24_created", cls_any=(L + "F3_Manifestation",), min_count=1,
             ref="work-shapes.ttl:454-458"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="work-shapes.ttl:459-463"),
        Prop(E + "P14_carried_out_by",
             cls_any=(E + "E21_Person", E + "E74_Group"),
             ref="work-shapes.ttl:465-469 (nodeOr PersonRef|Publisher)"),
        Prop(E + "P4_has_time-span", node="YearTimeSpanShape", max_count=1,
             ref="work-shapes.ttl:471-476"),
        Prop(E + "P7_took_place_at", node="PlaceShape", max_count=1,
             ref="work-shapes.ttl:477-482"),
    ), ref="work-shapes.ttl:445-482"),
    Shape("ItemProductionShape", "class", L + "F32_Item_Production_Event", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:488-493"),
        Prop(L + "R27_materialized", cls_any=(L + "F3_Manifestation",),
             min_count=1, max_count=1, ref="work-shapes.ttl:494-499"),
        Prop(L + "R28_produced", cls_any=(L + "F5_Item",),
             min_count=1, max_count=1, ref="work-shapes.ttl:500-505"),
    ), ref="work-shapes.ttl:485-505"),
    Shape("ItemShape", "class", L + "F5_Item", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:511-516"),
        Prop(L + "R7_exemplifies", cls_any=(L + "F3_Manifestation",),
             min_count=1, max_count=1, ref="work-shapes.ttl:517-522"),
        Prop(L + "R28i_was_produced_by",
             cls_any=(L + "F32_Item_Production_Event",), min_count=1,
             ref="work-shapes.ttl:523-527"),
    ), ref="work-shapes.ttl:508-527"),
    Shape("DigitalCopyShape", "class", E + "E73_Information_Object", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="work-shapes.ttl:536-541"),
        Prop(E + "P138_represents", cls_any=(L + "F2_Expression",),
             min_count=1, ref="work-shapes.ttl:542-546"),
        Prop(RDFS_SEEALSO, node_kind="IRI", min_count=1, max_count=1,
             ref="work-shapes.ttl:547-552"),
    ), ref="work-shapes.ttl:533-552"),
    Shape("OntologyNodeShape", "node", SAPPHO + "ontology/works", (
        Prop(RDF_TYPE, has_value=OWL + "Ontology", min_count=1,
             ref="work-shapes.ttl:561-565"),
        Prop(OWL + "imports", has_value=ECRM, min_count=1,
             ref="work-shapes.ttl:566-570"),
        Prop(OWL + "imports", has_value=LRMOO_ONTO, min_count=1,
             ref="work-shapes.ttl:571-575"),
    ), ref="work-shapes.ttl:558-575"),
]

# ------------------------------------------------------------- relations
_FEATURE_CLASSES = (
    I + "INT_Plot", I + "INT_Topic", I + "INT_Motif", I + "INT_Character",
    I + "INT18_Reference", I + "INT_Interpretation",
)


def _feature_shape(name: str, cls: str, ref: str) -> Shape:
    """Plot/Topic/Motif/Character features share one constraint block
    (relations-shapes.ttl:137-175)."""
    return Shape(name, "class", cls, (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1, ref=ref),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, starts_with=WD_Q, ref=ref),
        Prop(E + "P1_is_identified_by", node="IdentifierShape", min_count=1,
             ref=ref),
        Prop(I + "R22_providesSimilarityForRelation",
             cls_any=(I + "INT31_IntertextualRelation",), ref=ref),
    ), ref=ref)


RELATIONS_SHAPES: list[Shape] = [
    Shape("IdentifierShape", "class", E + "E42_Identifier", (
        Prop(RDFS_LABEL, language_in=("en",), pattern="^Q[0-9]+$",
             min_count=1, max_count=1, ref="relations-shapes.ttl:22-27"),
        Prop(E + "P2_has_type", has_value=ID_TYPE, min_count=1, max_count=1,
             ref="relations-shapes.ttl:28-32"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1,
             ref="relations-shapes.ttl:33-37"),
    ), ref="relations-shapes.ttl:19-37"),
    Shape("IdentifierTypeNodeShape", "node", ID_TYPE, (
        Prop(RDF_TYPE, has_value=E + "E55_Type", min_count=1,
             ref="relations-shapes.ttl:43"),
        Prop(RDFS_LABEL, language_in=("en",), has_literal=("Wikidata ID", "en"),
             min_count=1, max_count=1, ref="relations-shapes.ttl:44"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, starts_with=WD_Q,
             ref="relations-shapes.ttl:45-58"),
    ), ref="relations-shapes.ttl:40-58"),
    Shape("PersonNodeShape", "class", E + "E21_Person", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:67"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, max_count=1,
             starts_with=WD_Q, ref="relations-shapes.ttl:68-77"),
        Prop(E + "P1_is_identified_by", node="IdentifierShape", min_count=1,
             ref="relations-shapes.ttl:78"),
    ), ref="relations-shapes.ttl:64-78"),
    Shape("PlaceNodeShape", "class", E + "E53_Place", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:83"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, max_count=1,
             starts_with=WD_Q, ref="relations-shapes.ttl:84-93"),
        Prop(E + "P1_is_identified_by", node="IdentifierShape", min_count=1,
             ref="relations-shapes.ttl:94"),
    ), ref="relations-shapes.ttl:80-94"),
    Shape("ExpressionShape", "class", L + "F2_Expression", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:103"),
        Prop(OWL_SAMEAS, node_kind="IRI", min_count=1, max_count=1,
             starts_with=WD_Q, ref="relations-shapes.ttl:104-113"),
        Prop(I + "R18_showsActualization",
             cls_any=(I + "INT2_ActualizationOfFeature",),
             ref="relations-shapes.ttl:115"),
        Prop(I + "R24_hasRelatedEntity", inverse=True,
             cls_any=(I + "INT31_IntertextualRelation",),
             ref="relations-shapes.ttl:116"),
    ), ref="relations-shapes.ttl:100-116"),
    _feature_shape("PlotFeatureShape", I + "INT_Plot",
                   "relations-shapes.ttl:137-145"),
    _feature_shape("TopicFeatureShape", I + "INT_Topic",
                   "relations-shapes.ttl:148-155"),
    _feature_shape("MotifFeatureShape", I + "INT_Motif",
                   "relations-shapes.ttl:158-165"),
    _feature_shape("CharacterFeatureShape", I + "INT_Character",
                   "relations-shapes.ttl:168-175"),
    Shape("ReferenceFeatureShape", "class", I + "INT18_Reference", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:181"),
        Prop(I + "R22_providesSimilarityForRelation",
             cls_any=(I + "INT31_IntertextualRelation",),
             ref="relations-shapes.ttl:183"),
    ), ref="relations-shapes.ttl:178-183"),
    Shape("InterpretationFeatureShape", "class", I + "INT_Interpretation", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:193"),
        Prop(I + "R17i_featureIsActualizedIn",
             cls_any=(I + "INT2_ActualizationOfFeature",), min_count=1,
             ref="relations-shapes.ttl:195"),
    ), ref="relations-shapes.ttl:190-195"),
    Shape("ActualizationShape", "class", I + "INT2_ActualizationOfFeature", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:213"),
        Prop(I + "R17_actualizesFeature", cls_any=_FEATURE_CLASSES,
             min_count=1, ref="relations-shapes.ttl:198-219"),
        Prop(I + "R18i_actualizationFoundOn", cls_any=(L + "F2_Expression",),
             max_count=1, ref="relations-shapes.ttl:221"),
        Prop(I + "R24i_isRelatedEntity",
             cls_any=(I + "INT31_IntertextualRelation",),
             ref="relations-shapes.ttl:223"),
        Prop(I + "R21_identifies",
             cls_any=(I + "INT2_ActualizationOfFeature",
                      I + "INT31_IntertextualRelation"),
             ref="relations-shapes.ttl:225-230"),
        Prop(PROV_DERIVED, node_kind="IRI", ref="relations-shapes.ttl:232"),
        Prop(E + "P67_refers_to",
             cls_any=(E + "E21_Person", E + "E53_Place", L + "F2_Expression"),
             ref="relations-shapes.ttl:234-240"),
    ), ref="relations-shapes.ttl:210-240"),
    Shape("IntertextualRelationShape", "class",
          I + "INT31_IntertextualRelation", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:259"),
        Prop(I + "R24_hasRelatedEntity",
             cls_any=(L + "F2_Expression", I + "INT2_ActualizationOfFeature",
                      I + "INT21_TextPassage"),
             min_count=2, ref="relations-shapes.ttl:261-265"),
        Prop(I + "R21_identifies", inverse=True,
             cls_any=(I + "INT2_ActualizationOfFeature",), min_count=1,
             ref="relations-shapes.ttl:267-271"),
        Prop(I + "R22i_relationIsBasedOnSimilarity",
             cls_any=(I + "INT_Plot", I + "INT_Topic", I + "INT_Motif",
                      I + "INT_Character", I + "INT18_Reference"),
             ref="relations-shapes.ttl:273-281"),
    ), ref="relations-shapes.ttl:256-281"),
    Shape("TextPassageShape", "class", I + "INT21_TextPassage", (
        Prop(RDFS_LABEL, language_in=("en",), min_count=1, max_count=1,
             ref="relations-shapes.ttl:287"),
        Prop(PROV_DERIVED, node_kind="IRI", min_count=1, max_count=1,
             ref="relations-shapes.ttl:288"),
        Prop(I + "R30_hasTextPassage", inverse=True,
             cls_any=(L + "F2_Expression",), min_count=1,
             ref="relations-shapes.ttl:290"),
        Prop(I + "R24_hasRelatedEntity", inverse=True,
             cls_any=(I + "INT31_IntertextualRelation",), min_count=1,
             ref="relations-shapes.ttl:291"),
    ), ref="relations-shapes.ttl:284-291"),
    Shape("OntologyNodeShape", "node", SAPPHO + "ontology/relations", (
        Prop(RDF_TYPE, has_value=OWL + "Ontology", min_count=1,
             ref="relations-shapes.ttl:300"),
        Prop(OWL + "imports", has_value=ECRM, min_count=1,
             ref="relations-shapes.ttl:301"),
        Prop(OWL + "imports", has_value=LRMOO_ONTO, min_count=1,
             ref="relations-shapes.ttl:302"),
        Prop(OWL + "imports", has_value=INTRO, min_count=1,
             ref="relations-shapes.ttl:303"),
    ), ref="relations-shapes.ttl:297-303"),
]
