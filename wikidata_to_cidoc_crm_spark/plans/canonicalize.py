"""Canonicalization stage — duplicate-entity resolution (north rule).

Engine-added stage (the reference assumes Wikidata QIDs are already
canonical; a 10^12-document corpus linked against a noisy dictionary is
not): entities of the same class whose labels are near-duplicates are
blocked via MinHash-LSH over label shingles, verified by exact Jaccard,
clustered with connected components, and every triple's subject/object is
rewritten to the cluster representative (minimum URI). ``owl:sameAs``
links from the representative to the merged URIs record the merge.

Scale notes: LSH banding keeps candidate generation near-linear (no
all-pairs); the rewrite is two hash joins of the (small) canonical map
against the triple table — broadcast when the map is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import OWL_SAMEAS, RDF_TYPE, RDFS_LABEL, TRIPLE_KEY
from ..operators.components import connected_components
from ..operators.dedup import minhash_lsh_dedup
from ..session import lazy_checkpoint

# above this many (uri, canonical) rows the rewrite map no longer
# broadcasts safely (same rationale as relations.LABEL_BROADCAST_MAX)
CANONICAL_BROADCAST_MAX = 20_000_000


def entity_labels(triples: DataFrame, classes: list[str]) -> DataFrame:
    """(uri, label) for instances of the given classes.

    ONE scan of the triple table feeds both sides of the join (the
    type-filtered and label-filtered branches read a shared narrow
    checkpoint instead of scanning the full graph twice — the graph is
    data-proportional; this scan is the stage's dominant serial I/O)."""
    narrow = triples.filter(
        ((F.col("pred") == RDF_TYPE) & F.col("obj").isin(classes))
        | (F.col("pred") == RDFS_LABEL)
    ).select("subj", "pred", "obj").transform(lazy_checkpoint)
    typed = (
        narrow.filter(F.col("pred") == RDF_TYPE)
        .select(F.col("subj").alias("uri"), F.col("obj").alias("cls"))
        .distinct()
    )
    labels = narrow.filter(F.col("pred") == RDFS_LABEL).select(
        F.col("subj").alias("uri"), F.col("obj").alias("label"))
    return typed.join(labels, "uri").select("uri", "cls", "label")


def canonical_map(
    triples: DataFrame,
    classes: list[str],
    threshold: float = 0.9,
) -> DataFrame:
    """(uri, canonical): clusters of near-duplicate same-class entities.

    Blocking = MinHash-LSH over label word-shingles; verification = exact
    Jaccard ≥ threshold; clustering = connected components; representative
    = min URI (deterministic).
    """
    ents = entity_labels(triples, classes)
    # class-scoped ids so cross-class labels never merge
    docs = ents.select(
        F.concat_ws("\x1f", "cls", "uri").alias("doc_id"),
        F.col("label").alias("text"),
    )
    pairs = minhash_lsh_dedup(docs, id_col="doc_id", text_col="text",
                              num_hashes=16, bands=8, threshold=threshold, k=2)
    edges = pairs.select(
        F.element_at(F.split("a", "\x1f"), -1).alias("src"),
        F.element_at(F.split("b", "\x1f"), -1).alias("dst"),
    )
    comp = connected_components(edges)
    return comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("uri"), F.col("component").alias("canonical"))


def canonicalize_stage(
    spark: SparkSession,
    triples: DataFrame,
    classes: list[str] | None = None,
    threshold: float = 0.9,
    assume_distinct: bool = True,
) -> DataFrame:
    """Rewrite triples through the canonical map; add owl:sameAs merge links.

    ``assume_distinct`` (default) encodes the precondition that ``triples``
    is already a distinct set (the merge stage dedups); the output dedup
    then shuffles only the rewrite-touched fraction. Pass ``False`` for
    possibly-duplicated inputs to get the full-graph set-union dedup."""
    from ..model import ECRM, LRMOO

    classes = classes or [ECRM + "E21_Person", ECRM + "E53_Place",
                          LRMOO + "F2_Expression"]
    from ..model import dedupe_triples

    if not assume_distinct:
        triples = dedupe_triples(triples)
    cmap = canonical_map(triples, classes, threshold).localCheckpoint(eager=True)
    n_cmap = cmap.count()
    if n_cmap == 0:
        return triples
    # ONE canonical build side for both rewrite joins — identical subtrees
    # let Spark build the broadcast hash relation once and serve the
    # obj-side join via ReusedExchange (the map scales with data, so a
    # second single-threaded build is real serial cost). Identity rows for
    # the canonical targets are unioned in so a join MATCH means exactly
    # "this term is in the rewrite's domain ∪ range" — the collision
    # criterion for the delta-dedup below — while the joined value is
    # still the correctly rewritten term (itself, for a canonical).
    # The canonical map grows with the number of duplicate entities — i.e.
    # with the corpus, not with a dimension — so the broadcast is gated on
    # its size exactly like LABEL_BROADCAST_MAX: above the cap the rewrite
    # falls back to shuffle hash joins (keyed on subj/obj, uniform).
    cm = (
        cmap.select(F.col("uri").alias("__cu"), F.col("canonical").alias("__cc"))
        .unionByName(cmap.select(F.col("canonical").alias("__cu"),
                                 F.col("canonical").alias("__cc")))
        .distinct()
    )
    if n_cmap <= CANONICAL_BROADCAST_MAX:
        cm = F.broadcast(cm)
    rewritten = (
        triples.join(cm, F.col("subj") == F.col("__cu"), "left")
        .withColumn("_cs", F.col("__cc")).drop("__cu", "__cc")
        .join(cm, F.col("obj") == F.col("__cu"), "left")
        .withColumn("_co", F.col("__cc")).drop("__cu", "__cc")
        .select(
            F.coalesce("_cs", "subj").alias("subj"),
            "pred",
            F.when(F.col("obj_is_iri"), F.coalesce("_co", "obj"))
            .otherwise(F.col("obj")).alias("obj"),
            "obj_is_iri", "lang", "dtype",
            (F.col("_cs").isNotNull()
             | (F.col("obj_is_iri") & F.col("_co").isNotNull())).alias("_touched"),
        )
    )
    merge_links = cmap.select(
        F.col("canonical").alias("subj"),
        F.lit(OWL_SAMEAS).alias("pred"),
        F.col("uri").alias("obj"),
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dtype"),
    )
    # Delta-dedup: only triples incident to the rewrite's domain ∪ range
    # (post-rewrite: subj or IRI-obj is a canonical or was rewritten) can
    # collide — an untouched triple's terms avoid domain ∪ range entirely,
    # so it cannot equal any touched/merge-link triple, and the untouched
    # set is already distinct (the merge stage dedups). Shuffling ONLY the
    # touched fraction replaces the former full-graph dropDuplicates —
    # at 100 TB that's the difference between re-shuffling the whole graph
    # and shuffling the (duplicate-entity-proportional) delta. Both
    # branches re-scan the checkpointed input map-side; no extra shuffle.
    untouched = rewritten.filter(~F.col("_touched")).drop("_touched")
    touched = rewritten.filter(F.col("_touched")).drop("_touched")
    return untouched.unionByName(
        touched.unionByName(merge_links).dropDuplicates(TRIPLE_KEY))
