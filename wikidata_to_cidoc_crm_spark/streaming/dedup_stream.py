"""Custom stateful streaming operator: first-seen document dedup.

The training-data ingest path needs exact dedup over an unbounded document
stream — "emit a document only the first time its normalized-text
fingerprint appears". Spark has no built-in streaming distinct with
unbounded keys, so this is the canonical ``applyInPandasWithState`` shape
(SURVEY.md §2.8 / north-star custom stateful operator):

* key the stream by fingerprint (md5 of normalized text — same
  normalization as ``operators.dedup``),
* per key, keep one tiny state cell (first-seen flag / count),
* emit the row only when the key's state was empty.

Scale notes: state is per-fingerprint and O(1) bytes; the shuffle is on
the fingerprint (uniform by construction). A state-TTL (``GroupStateTimeout
.ProcessingTimeTimeout``) would bound the store for windows where exact
forever-dedup is not required; kept eventless here because the contract is
exact dedup.

The same function also runs in batch (``applyInPandas`` on a grouped
DataFrame with first-row-wins semantics) — used by the unit test twin.

``n_dups_seen`` CONTRACT: duplicates observed *up to and including the
emitting micro-batch* (rows beyond the winner in that batch). Because the
operator emits each fingerprint exactly once (append mode, first-seen), it
cannot report duplicates that arrive in later micro-batches — consumers
needing a running total should read the state-store count or aggregate the
raw stream separately. In batch mode / single-file ``availableNow`` runs
the whole input is one batch, so the value equals the total duplicate
count and matches ``batch_first_seen``'s ``count(*) - 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import normalize_text

# n_dups_seen = emission-time duplicate count (see module docstring): exact
# total only for batch / one-batch availableNow runs
OUT_SCHEMA = "fingerprint string, doc_id string, text string, n_dups_seen int"
STATE_SCHEMA = "seen int"


def _emit_first(key, pdf_iter, state: GroupState):
    import pandas as pd

    (fingerprint,) = key
    prior = state.get[0] if state.exists else 0
    # a fingerprint's rows may span multiple Arrow chunks within one
    # micro-batch (> spark.sql.execution.arrow.maxRecordsPerBatch
    # duplicates), so the winning doc_id must be the min across ALL chunks
    # — emitting from the first non-empty chunk would pick that chunk's
    # local min and diverge from the batch_first_seen twin
    batch_rows = 0
    first = None
    for pdf in pdf_iter:
        batch_rows += len(pdf)
        if prior == 0 and len(pdf) > 0:
            cand = pdf.sort_values(["doc_id"]).iloc[0]
            if first is None or str(cand["doc_id"]) < str(first["doc_id"]):
                first = cand
    state.update((prior + batch_rows,))
    if prior == 0 and first is not None:
        # n_dups_seen = duplicates observed at emission time (rows beyond
        # the winner in the emitting micro-batch; in batch mode the whole
        # dataset is one batch, so the twin's count(*)-1 is identical)
        yield pd.DataFrame({
            "fingerprint": [fingerprint],
            "doc_id": [str(first["doc_id"])],
            "text": [first["text"]],
            "n_dups_seen": [batch_rows - 1],
        })


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("fingerprint", F.md5(normalize_text(text_col)))


def streaming_first_seen(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: one output row per fingerprint, ever.

    ``docs`` must be a streaming DataFrame with (doc_id, text).
    """
    keyed = with_fingerprint(docs).select(
        "fingerprint", F.col("doc_id").cast("string").alias("doc_id"), "text")
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _emit_first,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_first_seen(docs: DataFrame) -> DataFrame:
    """Batch twin with identical semantics (first doc_id per fingerprint) —
    the oracle for the streaming operator in tests."""
    from pyspark.sql import Window

    keyed = with_fingerprint(docs).select(
        "fingerprint", F.col("doc_id").cast("string").alias("doc_id"), "text")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    wc = Window.partitionBy("fingerprint")
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wc))
        .filter(F.col("_rn") == 1)
        .select("fingerprint", "doc_id", "text",
                (F.col("_n") - 1).cast("int").alias("n_dups_seen"))
    )
