"""Mention detection + entity-link scoring (vectorized, Arrow-batched).

The engine-added stage in front of the reference's mapping logic
(BASELINE.json north_star): text spans of the interleaved documents are
matched against a **broadcast QID dictionary** (surface form → QID). The
reference's analogue is the VALUES-pinned SPARQL lookup (authors.py:189);
here the dictionary is a Spark broadcast and matching runs inside
``mapInPandas`` — one token-hash index per Python worker (leftmost-longest,
Aho-Corasick-equivalent for word-boundary surfaces, dictionary-size
independent per token) applied per Arrow batch.

Scale notes: the dictionary is dimension-sized (≤ millions of surfaces) so
it broadcasts; the document side streams through map tasks with no shuffle.
Skewed head entities produce skewed *mention* counts, which matters only in
downstream joins — handled there (broadcast dims / salted pair joins).
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MENTION_SCHEMA = (
    "doc_id string, span_offset int, surface string, qid string, score double"
)

# per-worker compiled-pattern cache, keyed by a driver-issued monotonically
# increasing token (NOT id(bc): CPython reuses addresses after GC, which
# could serve a stale matcher for the wrong dictionary). Capped to the most
# recent entry so long-lived workers never grow unboundedly.
_PATTERN_CACHE: dict[int, object] = {}
_DICT_TOKENS = itertools.count()

# hard cap on the driver-collected dictionary: the broadcast pattern is only
# valid for dimension-sized data. ~10M surfaces ≈ a few GB broadcast — past
# that the linking design must switch to a co-partitioned token join.
MAX_SURFACES = 10_000_000


def build_surface_table(entities: DataFrame,
                        max_surfaces: int = MAX_SURFACES) -> list[tuple[str, str, float]]:
    """Collect the dimension-sized dictionary: (surface, qid, score).

    Exact labels score 1.0, aliases 0.7, german labels 0.9. Ambiguous
    surfaces resolve to the lexicographically smallest QID (deterministic).
    Raises if the dimension exceeds ``max_surfaces`` — an explicit guard so
    an unexpectedly fact-sized "dimension" fails loudly instead of OOMing
    the driver.
    """
    n = entities.count()
    if n > max_surfaces:
        raise ValueError(
            f"entity dimension has {n} rows > max_surfaces={max_surfaces}; "
            "the broadcast-dictionary linking path requires a dimension-"
            "sized table — use a token-join based matcher for fact-sized "
            "dictionaries")
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
    dict_token = next(_DICT_TOKENS)

    def match_batches(batches):
        import pandas as pd

        key = dict_token
        cached = _PATTERN_CACHE.get(key)
        if cached is None:
            # token-hash matcher: index surfaces by first token; at each text
            # position try candidate lengths longest-first (leftmost-longest,
            # regex/Aho-Corasick-equivalent for word-boundary matching) —
            # O(tokens × candidates-at-token), dictionary-size independent.
            table: dict[tuple, tuple] = {}
            by_first: dict[str, list] = {}
            for s, q, sc in bc.value:
                toks = tuple(t for t in re.split(r"\W+", s) if t)
                if not toks:
                    continue
                if toks not in table:
                    table[toks] = (s, q, sc)
                    by_first.setdefault(toks[0], []).append(toks)
            for lst in by_first.values():
                lst.sort(key=len, reverse=True)
            cached = (by_first, table)
            _PATTERN_CACHE.clear()  # cap: keep only the latest dictionary
            _PATTERN_CACHE[key] = cached
        by_first, table = cached
        tok_rx = re.compile(r"\W+")
        for pdf in batches:
            rows_doc, rows_off, rows_surface, rows_qid, rows_score = [], [], [], [], []
            for doc_id, off, text in zip(pdf["doc_id"], pdf["span_offset"], pdf["text"]):
                toks = [t for t in tok_rx.split(text) if t]
                i, n = 0, len(toks)
                while i < n:
                    cands = by_first.get(toks[i])
                    if cands:
                        for cand in cands:
                            ln = len(cand)
                            if i + ln <= n and tuple(toks[i:i + ln]) == cand:
                                s, q, sc = table[cand]
                                rows_doc.append(doc_id)
                                rows_off.append(off)
                                rows_surface.append(s)
                                rows_qid.append(q)
                                rows_score.append(sc)
                                i += ln - 1
                                break
                    i += 1
            yield pd.DataFrame({
                "doc_id": pd.Series(rows_doc, dtype="object"),
                "span_offset": pd.Series(rows_off, dtype="int32"),
                "surface": pd.Series(rows_surface, dtype="object"),
                "qid": pd.Series(rows_qid, dtype="object"),
                "score": pd.Series(rows_score, dtype="float64"),
            })

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
    # deterministic dedup per (doc, span, qid): keep the best-scoring match,
    # ties broken on surface — dropDuplicates would keep an arbitrary
    # surviving row, which is both nondeterministic across runs and
    # impossible to twin in an oracle
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "span_offset", "qid").orderBy(
        F.col("score").desc(), F.col("surface"))
    return (
        mentions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


def linked_qids(mentions: DataFrame, entities: DataFrame, kind: str) -> DataFrame:
    """Distinct linked QIDs of one entity kind — the Spark analogue of the
    reference's QID input list (authors.py:236-249): downstream mapping
    stages consume this instead of a CSV."""
    return (
        mentions.select("qid")
        .distinct()
        .join(F.broadcast(entities.filter(F.col("kind") == kind).select("qid")), "qid", "left_semi")
    )
