"""Property test: write_ttl → parse_ttl is the identity on triple sets."""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from wikidata_to_cidoc_crm_spark.sources.ttl import parse_ttl_file, write_ttl

iri = st.sampled_from([
    "https://sappho-digital.com/person/Q1",
    "https://sappho-digital.com/work/Q2",
    "http://erlangen-crm.org/current/E21_Person",
])
pred = st.sampled_from([
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://www.w3.org/2002/07/owl#sameAs",
])
text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "Zs"), max_codepoint=0x2FF),
    min_size=1, max_size=30,
).map(str.strip).filter(bool)

literal_triple = st.tuples(
    iri, pred, text,
    st.sampled_from([None, "en", "de"]),
    st.sampled_from([None, "http://www.w3.org/2001/XMLSchema#date"]),
).map(lambda t: (t[0], t[1], t[2], t[3], None if t[3] else t[4], False))

# plain literals whose value *looks like* an IRI must survive the roundtrip
# as literals (the obj_is_iri flag, not a string-prefix heuristic, decides)
url_literal_triple = st.tuples(iri, pred, iri).map(
    lambda t: (*t, None, None, False))

iri_triple = st.tuples(iri, pred, iri).map(lambda t: (*t, None, None, True))

triples = st.sets(
    st.one_of(literal_triple, iri_triple, url_literal_triple),
    min_size=1, max_size=25)


@settings(max_examples=50, deadline=None)
@given(triples)
def test_ttl_roundtrip(ts):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "g.ttl")
        write_ttl(ts, path)
        back = parse_ttl_file(path)
    assert back == ts
