"""Parity against the reference's SHIPPED golden output
(/root/reference/examples/outputs/authors.ttl, the 1-QID example for
Q469571 'Anna Louisa Karsch') — the strongest external anchor available:
the engine must reproduce the reference's actual published triples from
equivalent input statements."""

from __future__ import annotations

import pytest

from wikidata_to_cidoc_crm_spark.fixtures import LABEL_SCHEMA, STATEMENT_SCHEMA
from wikidata_to_cidoc_crm_spark.model import triples_to_python_set
from wikidata_to_cidoc_crm_spark.plans.authors import authors_stage
from wikidata_to_cidoc_crm_spark.sources.ttl import parse_ttl_file

GOLDEN = "/root/reference/examples/outputs/authors.ttl"

# the Wikidata facts behind the example (reverse-read from the golden file;
# equivalently what the authors SPARQL at authors.py:187-200 returns)
Q = "Q469571"
STATEMENTS = [
    (Q, "P21", "Q6581072", True, None),
    (Q, "P569", "1722-12-01T00:00:00Z", False, None),
    (Q, "P570", "1791-10-12T00:00:00Z", False, None),
    (Q, "P19", "Q659063", True, None),
    (Q, "P20", "Q64", True, None),
    (Q, "P18",
     "http://commons.wikimedia.org/wiki/Special:FilePath/Karschin%20bild.JPG",
     False, None),
]
LABELS = [
    (Q, "en", "Anna Louisa Karsch"),
    ("Q64", "en", "Berlin"),
    ("Q659063", "en", "Gmina Skąpe"),
    ("Q6581072", "en", "female"),
]


@pytest.mark.parametrize("golden_path", [GOLDEN])
def test_authors_matches_shipped_golden(spark, golden_path):
    golden = parse_ttl_file(golden_path)
    stmts = spark.createDataFrame(STATEMENTS, STATEMENT_SCHEMA)
    labels = spark.createDataFrame(LABELS, LABEL_SCHEMA)
    qids = spark.createDataFrame([(Q,)], "qid string")
    engine = triples_to_python_set(authors_stage(spark, qids, stmts, labels))
    missing = golden - engine
    extra = engine - golden
    assert not missing, f"missing vs shipped golden: {sorted(missing)[:10]}"
    assert not extra, f"extra vs shipped golden: {sorted(extra)[:10]}"
