"""JDBC source/sink (SURVEY ops `src-jdbc`, `snk-jdbc-upsert`).

The reference reads its driving keys from Postgres
(``comments_pipeline.py:32-34``) and writes with per-row
``INSERT … ON CONFLICT DO NOTHING`` (``posts_pipeline.py:53-59``).
Engine form: `spark.read.jdbc` with a pushdown query, and
insert-if-absent as anti-join + batched append — one distributed
write instead of one round-trip per row.

No JDBC driver jar ships in this environment, so these are thin,
tested-by-inspection wrappers over the stock DataFrame reader/writer;
the anti-join idempotency logic itself is exercised via
``operators.incremental`` tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from tia_data_pipeline_spark.operators.incremental import incremental_append


def jdbc_read(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pushdown query read. With the partition_column bounds set the
    scan parallelizes into range-partitioned queries (the scale path;
    a single unpartitioned JDBC read is a one-task bottleneck)."""
    reader = spark.read.format("jdbc").option("url", url)
    if partition_column is not None:
        # Spark rejects `query` together with `partitionColumn`; the
        # partitioned form must wrap the SQL as a derived table.
        reader = (
            reader.option("dbtable", f"({query}) AS __src")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    else:
        reader = reader.option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_upsert_append(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """`ON CONFLICT DO NOTHING` as a distributed plan: key-dedup the
    batch, anti-join the target's key projection, append with JDBC
    batch inserts. Exactly-once requires a transactional target
    (Delta MERGE); this is the at-least-once-with-idempotent-retry
    form the reference itself provides."""
    to_insert = incremental_append(incoming, existing, keys)
    writer = (
        to_insert.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
