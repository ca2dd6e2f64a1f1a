"""Physical table maintenance on parquet (SURVEY §2.1 S5-S9).

The reference's stores (Pinecone upsert/delete, Mongo insertMany, HNSW
save/load) collapse to parquet layout operations here. The logical
rewrites are in plans/vector.py (S5-S7 as anti-join ∪ union); this
module is the WRITE side — how those rewrites hit disk safely.

Scale rules encoded below:
* partition by the delete/replace unit (``namespace``) so S7 is a
  partition drop (metadata-only at the table-format layer) and S5/S6
  rewrite only the touched partitions via dynamic partition overwrite,
  never the whole table;
* writes land via write-new-then-swap semantics (overwrite of a
  partition directory is atomic-enough for the single-writer batch
  jobs this engine targets; a table format like Iceberg/Delta slots in
  here unchanged at production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ("namespace",)
) -> None:
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def append_rows(df: DataFrame, path: str) -> None:
    """S9: Mongo insert/insertMany (sockets/chat/chatHandler.js:155-164;
    controllers/initController.js:48) -> append-mode write."""
    df.write.mode("append").parquet(path)


def _dynamic_overwrite(df: DataFrame, path: str, partition_col: str) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_by_key(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str = "namespace",
) -> None:
    """S5: Pinecone-style upsert (models/embeddingmodel.js:4-12): new
    records win by identity. Identity is (partition_col, key) — exactly
    Pinecone's namespace semantics, where the same id in two namespaces
    is two records; "moving" a key to another partition therefore
    inserts a new record and never deletes the old identity. Only
    partitions named in the updates are rewritten (dynamic overwrite);
    untouched partitions are never read back or rewritten, and a key
    match in a touched partition's sibling namespace is never
    clobbered."""
    current = spark.read.parquet(path)
    touched = (
        updates.select(partition_col).distinct()
    )
    touched_current = current.join(
        F.broadcast(touched), partition_col, "left_semi"
    )
    merged = touched_current.join(
        updates.select(partition_col, key), [partition_col, key], "left_anti"
    ).unionByName(updates)
    _dynamic_overwrite(merged, path, partition_col)


def delete_by_key(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    key: str,
    partition_col: str = "namespace",
) -> None:
    """S6: deleteOne(ids) (models/embeddingmodel.js:14-24) as a
    partition-scoped anti-join rewrite."""
    current = spark.read.parquet(path)
    victims = current.join(F.broadcast(ids), key, "left_semi")
    touched = victims.select(partition_col).distinct()
    survivors = (
        current.join(F.broadcast(touched), partition_col, "left_semi")
        .join(F.broadcast(ids), key, "left_anti")
    )
    _dynamic_overwrite(survivors, path, partition_col)


def drop_partition(
    spark: SparkSession, path: str, partition_col: str, value
) -> None:
    """S7: deleteAll() on a namespace (models/embeddingmodel.js:26-35) =
    deleting the partition directory via the Hadoop FileSystem API — a
    metadata/listing operation that never scans or rewrites other
    partitions (dynamic overwrite can't express this: an empty write
    touches no partitions). Under a table format (Iceberg/Delta) this
    becomes ALTER TABLE ... DROP PARTITION, same semantics."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(
        f"{path}/{partition_col}={value}"
    )
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def read_text_documents(
    spark: SparkSession, path: str, wholetext: bool = True
) -> DataFrame:
    """S2/S4: S3 text object -> utf-8 string
    (controllers/customTrainDataController.js:38-46;
    embeddingController.js:25): file source + decode, one row per file
    (wholetext) tagged with its path."""
    return (
        spark.read.option("wholetext", str(wholetext).lower())
        .text(path)
        .select(
            F.input_file_name().alias("source_path"),
            F.col("value").alias("text"),
        )
    )
