"""SparkSession factory.

The reference runs everything serially in one Python process (Airflow
SequentialExecutor — reference ``docker/airflow/airflow.cfg:24``); here a
single SparkSession is the engine. Defaults are chosen for correctness
parity with the DuckDB oracle (UTC session timezone — the reference's
Airflow default tz, ``docker/airflow/airflow.cfg:18``) and for scale
(AQE on, Arrow on, shuffle partitions sized to the local core count
rather than the 200 default — on a real cluster this is overridden to
~2-3x total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tia_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entry point serves tests, bench, and the driver harness;
    on a cluster, pass ``master=None`` with ``spark.master`` preset.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode = driver-only: its heap is the cluster memory.
        # Spark's 1g default GC-thrashes on text-heavy operators; size
        # to the host (only effective before the JVM starts).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Event-time parity: the oracle (DuckDB) and the reference (Airflow
        # UTC) both treat timestamps as UTC wall clock.
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # and broadcast conversion — the 100 TB posture is "declare the
        # plan, let the runtime re-plan".
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Never use the bypass-merge shuffle writer: it opens one file
        # PER REDUCE PARTITION per map task (M·R creates+deletes per
        # shuffle — 1024 for a 32×32 shuffle), and thread dumps showed
        # map tasks spending most of their runtime in
        # FileOutputStream.open from DiskBlockObjectWriter (round-11
        # profiling; a 32-partition groupBy wave dropped 0.58s → 0.28s
        # with the sort writer's single spill file + index per task).
        # At cluster scale reduce counts exceed the 200 default anyway,
        # so this also makes local runs exercise the same writer the
        # production path uses.
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        # Arrow for every pandas-UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # events.ts is parquet TIMESTAMP(isAdjustedToUTC=false, MICROS);
        # read it as TimestampType (an instant, UTC session tz) rather
        # than TIMESTAMP_NTZ so event-time functions and watermarks
        # apply. Also pinned per-session in catalog._ensure_session_confs
        # for caller-provided sessions.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # render NULL struct fields in to_json (DuckDB parity); also
        # pinned per-session in catalog._ensure_session_confs
        .config("spark.sql.jsonGenerator.ignoreNullFields", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
