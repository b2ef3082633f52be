"""Triple-table sinks: Iceberg at cluster scale, parquet sandbox fallback.

The north rule materializes the graph into partitioned Iceberg triple
tables. This module holds the real ``writeTo`` code path; the sandbox has
no Iceberg catalog jars, so :func:`write_triples` probes the session for a
configured Iceberg catalog and otherwise writes the same layout as
bucket-partitioned parquet (identical partitioning key: subject hash
bucket). Pipeline code calls one function either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_BUCKETS = 64


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None.

    An Iceberg catalog is declared as ``spark.sql.catalog.<name> =
    org.apache.iceberg.spark.SparkCatalog``.
    """
    try:
        all_conf = dict(spark.sparkContext.getConf().getAll())
    except Exception:
        return None
    for k, v in all_conf.items():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 \
                and "iceberg" in (v or "").lower():
            return k.rsplit(".", 1)[-1]
    return None


def write_triples(df: DataFrame, name: str, path: str,
                  catalog: str | None = None) -> str:
    """Write a triple DataFrame as a bucket-partitioned table.

    With an Iceberg ``catalog``: ``writeTo(catalog.kg.<name>)`` partitioned
    by ``bucket(64, subj)`` (Iceberg's hash-bucket transform — the hidden-
    partitioning equivalent of the parquet layout below); resume reads the
    snapshot back. Without one: parquet partitioned by an explicit
    ``subj_bucket = xxhash64(subj) % 64`` column at ``path``.

    Returns the written target (table identifier or path).
    """
    spark = df.sparkSession
    catalog = catalog or iceberg_catalog(spark)
    if catalog:
        table = f"{catalog}.kg.{name}"
        # first write on a fresh catalog: the namespace must exist before
        # writeTo (Iceberg does not auto-create it)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.kg")
        (df.writeTo(table)
           .using("iceberg")
           .partitionedBy(F.bucket(TRIPLE_BUCKETS, F.col("subj")))
           .createOrReplace())
        return table
    out = df
    if "subj" in df.columns and "subj_bucket" not in df.columns:
        out = df.withColumn(
            "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(TRIPLE_BUCKETS)))
        out.write.mode("overwrite").partitionBy("subj_bucket").parquet(path)
    else:
        out.write.mode("overwrite").parquet(path)
    return path


def read_triples_table(spark: SparkSession, target: str) -> DataFrame:
    """Read back what :func:`write_triples` wrote (table id or path)."""
    if "/" not in target:
        df = spark.read.table(target)
    else:
        df = spark.read.parquet(target)
    return df.drop("subj_bucket") if "subj_bucket" in df.columns else df
