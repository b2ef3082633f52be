"""Mention detection + entity-link scoring (vectorized, Arrow-batched).

The engine-added stage in front of the reference's mapping logic
(BASELINE.json north_star): text spans of the interleaved documents are
matched against a **broadcast QID dictionary** (surface form → QID). The
reference's analogue is the VALUES-pinned SPARQL lookup (authors.py:189);
here the dictionary is a Spark broadcast and matching runs inside
``mapInPandas`` — one compiled automaton per Python worker, pandas
``str.extractall`` over each Arrow batch, **no per-row Python**.

Scale notes: the dictionary is dimension-sized (≤ millions of surfaces) so
it broadcasts; the document side streams through map tasks with no shuffle.
Skewed head entities produce skewed *mention* counts, which matters only in
downstream joins — handled there (broadcast dims / salted pair joins).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MENTION_SCHEMA = (
    "doc_id string, span_offset int, surface string, qid string, score double"
)

# per-worker compiled-pattern cache (keyed by broadcast id)
_PATTERN_CACHE: dict[int, object] = {}


def build_surface_table(entities: DataFrame) -> list[tuple[str, str, float]]:
    """Collect the dimension-sized dictionary: (surface, qid, score).

    Exact labels score 1.0, aliases 0.7, german labels 0.9. Ambiguous
    surfaces resolve to the lexicographically smallest QID (deterministic).
    """
    rows = entities.select("qid", "label_en", "label_de", "aliases").collect()
    table: dict[str, tuple[str, float]] = {}

    def put(surface: str | None, qid: str, score: float) -> None:
        if not surface:
            return
        cur = table.get(surface)
        if cur is None or score > cur[1] or (score == cur[1] and qid < cur[0]):
            table[surface] = (qid, score)

    for r in rows:
        put(r["label_en"], r["qid"], 1.0)
        put(r["label_de"], r["qid"], 0.9)
        for a in r["aliases"] or []:
            put(a, r["qid"], 0.7)
    return [(s, q, sc) for s, (q, sc) in sorted(table.items())]


def detect_mentions(
    spark: SparkSession,
    docs: DataFrame,
    entities: DataFrame,
    min_score: float = 0.0,
) -> DataFrame:
    """documents(doc_id, spans) → mentions(doc_id, span_offset, surface, qid, score).

    Plan shape: Parquet scan → Generate(explode spans) → Filter(kind='text')
    → ArrowEvalPython(mapInPandas) — a single no-shuffle map stage.
    """
    surfaces = build_surface_table(entities)
    bc = spark.sparkContext.broadcast(surfaces)

    def match_batches(batches):
        import pandas as pd  # noqa: F401 (worker-side)

        key = id(bc)
        cached = _PATTERN_CACHE.get(key)
        if cached is None:
            table = {s: (q, sc) for s, q, sc in bc.value}
            # longest-first alternation so overlapping surfaces prefer the
            # longer match (same behavior as a leftmost-longest automaton)
            alts = sorted(table, key=len, reverse=True)
            rx = re.compile(
                r"(?<![\w])("
                + "|".join(re.escape(s) for s in alts)
                + r")(?![\w])"
            ) if alts else None
            cached = (rx, table)
            _PATTERN_CACHE[key] = cached
        rx, table = cached
        for pdf in batches:
            if rx is None or pdf.empty:
                yield pdf.iloc[0:0].assign(surface="", qid="", score=0.0)[
                    ["doc_id", "span_offset", "surface", "qid", "score"]
                ]
                continue
            hits = pdf["text"].str.extractall(rx)
            if hits.empty:
                out = pdf.iloc[0:0].copy()
                out = out[["doc_id", "span_offset"]]
                out["surface"] = pd.Series(dtype="object")
                out["qid"] = pd.Series(dtype="object")
                out["score"] = pd.Series(dtype="float64")
                yield out
                continue
            hits = hits.reset_index()  # columns: level_0 (row idx), match, 0
            hits = hits.rename(columns={0: "surface"})
            base = pdf[["doc_id", "span_offset"]].reset_index()
            out = hits.merge(base, left_on="level_0", right_on="index")
            out["qid"] = out["surface"].map(lambda s: table[s][0])
            out["score"] = out["surface"].map(lambda s: table[s][1])
            yield out[["doc_id", "span_offset", "surface", "qid", "score"]]

    text_spans = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "text")
        .select(
            "doc_id",
            F.col("s.offset").alias("span_offset"),
            F.col("s.text").alias("text"),
        )
    )
    mentions = text_spans.mapInPandas(match_batches, schema=MENTION_SCHEMA)
    if min_score > 0:
        mentions = mentions.filter(F.col("score") >= min_score)
    return mentions.dropDuplicates(["doc_id", "span_offset", "qid"])


def linked_qids(mentions: DataFrame, entities: DataFrame, kind: str) -> DataFrame:
    """Distinct linked QIDs of one entity kind — the Spark analogue of the
    reference's QID input list (authors.py:236-249): downstream mapping
    stages consume this instead of a CSV."""
    return (
        mentions.select("qid")
        .distinct()
        .join(F.broadcast(entities.filter(F.col("kind") == kind).select("qid")), "qid", "left_semi")
    )
