"""wikidata_to_cidoc_crm_spark — a from-scratch PySpark-native KG-construction engine.

Rebuilds the query/data-processing capabilities of the reference
``laurauntner/wikidata-to-cidoc-crm`` (rdflib + SPARQL-endpoint ETL) as
distributed DataFrame stages:

* ``fixtures``   — deterministic synthetic interleaved-document corpus +
                   Wikidata dimension tables (replaces the SPARQL endpoint).
* ``linking``    — vectorized mention detection / entity-link scoring
                   (Arrow-batched, no per-row Python).
* ``plans``      — the mapping stages (authors / works / relations / merge /
                   align) emitting (subj, pred, obj) triples.
* ``operators``  — closures, connected components, pair joins, dedup,
                   similarity search, text analysis.
* ``streaming``  — Structured Streaming ingest variant.

Everything is built on the public Apache Spark DataFrame API; the reference
is used only as a behavioral specification (file:line citations in
docstrings point at /root/reference for parity checking).
"""

__version__ = "0.1.0"
