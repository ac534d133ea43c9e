"""applyInPandasWithState: running per-user profile across micro-
batches must equal the batch aggregate over the full input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.streaming.stateful import running_user_profile
from tia_data_pipeline_spark.streaming.windows import events_stream


def test_running_profile_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    events = load_table(spark, SMOKE_SF, "events")
    events.repartition(5).write.parquet(src)

    q = (
        running_user_profile(events_stream(spark, src, max_files_per_trigger=2))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per user per micro-batch that touched
    # them — the LAST emission per user is the final state.
    out = spark.table("profiles").toPandas()
    final = out.groupby("user_id").apply(lambda g: g.iloc[-1], include_groups=False)
    got = {
        int(uid): (int(r["n_events"]), int(r["total_cents"]))
        for uid, r in final.iterrows()
    }

    expect = {
        r["user_id"]: (r["n"], r["cents"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert got == expect


def test_running_profile_survives_null_values(spark, tmp_path):
    """A NULL value must not kill the stream (astype('int64') on NaN
    raises inside applyInPandasWithState) — NULLs fold away exactly
    like F.sum skips them in the batch twin."""
    src = str(tmp_path / "events_null")
    events = load_table(spark, SMOKE_SF, "events").limit(50)
    with_null = events.unionByName(
        events.limit(1)
        .withColumn("event_id", F.col("event_id") + 1_000_000)
        .withColumn("value", F.lit(None).cast("double"))
    )
    with_null.write.parquet(src)

    q = (
        running_user_profile(events_stream(spark, src, max_files_per_trigger=2))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles_null")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.table("profiles_null").toPandas()
    final = out.groupby("user_id").apply(lambda g: g.iloc[-1], include_groups=False)
    got = {int(uid): (int(r["n_events"]), int(r["total_cents"])) for uid, r in final.iterrows()}
    expect = {
        r["user_id"]: (r["n"], r["cents"])
        for r in with_null.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.round(F.col("value") * 100).cast("bigint")), F.lit(0)
            ).alias("cents"),
        )
        .collect()
    }
    assert got == expect
