"""Index deletion lifecycle (VERDICT r8 missing #1): tombstones mask
probes immediately, deletes are idempotent (twice ≡ once), compaction
physically removes tombstoned rows AND the applied tombstones, and the
stats census reports the pending-deletion fraction. One suite per index
family (MinHash / SimHash / embedding) over the shared machinery in
operators/scale.py, plus the generic-layer edge cases (day-zero
tombstone reads, underscore partition dirs, non-local URI guard)."""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    # pair structure: doc 1 (base) has near-copies 11 and 12; doc 2
    # (far) has near-copy 13 — deleting doc 1 must drop pairs to 1
    # while pairs to 2 survive
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab) for _ in range(120))
    far = " ".join(rng.choice(vocab) for _ in range(120))
    hist = [(1, base), (2, far)]
    shard = [
        (11, base.replace("w1", "w199", 2)),
        (12, base),
        (13, far),
        (14, " ".join(f"z{i}" for i in range(120))),
    ]
    schema = "doc_id bigint, text string"
    return (
        spark.createDataFrame(hist, schema),
        spark.createDataFrame(shard, schema),
    )


def _ids(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "doc_id bigint")


class TestMinhashDelete:
    def _index(self, spark, hist, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import minhash_write_index

        path = str(tmp_path / "mh")
        minhash_write_index(hist, "text", "doc_id", path, n_shards=4)
        return path

    def test_probe_masks_tombstoned_ids(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_dedup_incremental,
            minhash_index_delete,
        )

        hist, shard = docs
        path = self._index(spark, hist, tmp_path)
        before = {
            (r["new_id"], r["dup_id"])
            for r in minhash_dedup_incremental(shard, path, threshold=0.5).collect()
        }
        assert {(11, 1), (12, 1), (13, 2)} <= before
        minhash_index_delete(_ids(spark, 1), path)
        after = {
            (r["new_id"], r["dup_id"])
            for r in minhash_dedup_incremental(shard, path, threshold=0.5).collect()
        }
        # every pair to the deleted doc is gone; pairs to doc 2 survive
        assert after == {p for p in before if p[1] != 1}
        assert (13, 2) in after

    def test_delete_twice_equals_once(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_index_delete,
            minhash_index_meta,
        )
        from tia_data_pipeline_spark.operators.scale import read_index_tombstones

        hist, _ = docs
        path = self._index(spark, hist, tmp_path)
        minhash_index_delete(_ids(spark, 1, 2), path)
        meta = minhash_index_meta(spark, path)
        ts1 = read_index_tombstones(
            spark, path, index_schema_json=meta["schema_json"], id_col="_id"
        ).count()
        # retried batch + overlapping later batch: no duplicate rows
        minhash_index_delete(_ids(spark, 1, 2), path)
        minhash_index_delete(_ids(spark, 2, 999), path)
        ts2 = read_index_tombstones(
            spark, path, index_schema_json=meta["schema_json"], id_col="_id"
        ).count()
        assert (ts1, ts2) == (2, 3)

    def test_null_ids_are_excluded(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_index_delete,
            minhash_index_stats,
        )

        hist, _ = docs
        path = self._index(spark, hist, tmp_path)
        ids = spark.createDataFrame([(None,), (1,)], "doc_id bigint")
        minhash_index_delete(ids, path)
        assert minhash_index_stats(spark, path)["tombstones"] == 1

    def test_compact_applies_tombstones(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_dedup_incremental,
            minhash_index_compact,
            minhash_index_delete,
            minhash_index_meta,
            minhash_index_stats,
            _read_index,
        )

        hist, shard = docs
        path = self._index(spark, hist, tmp_path)
        meta = minhash_index_meta(spark, path)
        bands = meta["bands"]
        total = _read_index(spark, path, meta).count()
        minhash_index_delete(_ids(spark, 1), path)

        stats = minhash_index_stats(spark, path)
        assert stats["tombstones"] == 1
        # doc 1 masks `bands` of the physical rows
        assert stats["tombstone_fraction"] == round(bands / total, 6)

        before_pairs = sorted(
            map(tuple, minhash_dedup_incremental(shard, path, threshold=0.5).collect())
        )
        out = minhash_index_compact(spark, path)
        # physical removal: the deleted doc's rows are gone...
        assert out["rows"] == total - bands
        left = _read_index(spark, path, minhash_index_meta(spark, path))
        assert left.filter(F.col("_id") == 1).count() == 0
        # ...the applied tombstones are gone...
        assert not os.path.isdir(os.path.join(path, "_tombstones"))
        post = minhash_index_stats(spark, path)
        assert post["tombstones"] == 0 and post["tombstone_fraction"] == 0.0
        # ...and probes are byte-identical before/after the removal
        after_pairs = sorted(
            map(tuple, minhash_dedup_incremental(shard, path, threshold=0.5).collect())
        )
        assert after_pairs == before_pairs

    def test_append_after_delete_stays_masked_until_compact(
        self, spark, docs, tmp_path
    ):
        """Tombstone-wins semantics: re-appending a deleted doc while
        the tombstone lives is probe-invisible; compaction drops the
        re-appended rows with the tombstone; a FRESH append after that
        re-indexes the doc."""
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_dedup_incremental,
            minhash_index_append,
            minhash_index_compact,
            minhash_index_delete,
        )

        hist, shard = docs
        path = self._index(spark, hist, tmp_path)
        minhash_index_delete(_ids(spark, 1), path)
        minhash_index_append(hist.filter("doc_id = 1"), path)
        masked = {
            (r["new_id"], r["dup_id"])
            for r in minhash_dedup_incremental(shard, path, threshold=0.5).collect()
        }
        assert not any(d == 1 for _, d in masked)
        minhash_index_compact(spark, path)
        minhash_index_append(hist.filter("doc_id = 1"), path)
        revived = {
            (r["new_id"], r["dup_id"])
            for r in minhash_dedup_incremental(shard, path, threshold=0.5).collect()
        }
        assert (12, 1) in revived


class TestSimhashDelete:
    @pytest.mark.slow
    def test_lifecycle(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            simhash_dedup_incremental,
            simhash_index_compact,
            simhash_index_delete,
            simhash_index_stats,
            simhash_write_index,
        )

        hist, shard = docs
        path = str(tmp_path / "sh")
        simhash_write_index(hist, "text", "doc_id", path, n_shards=4)
        before = {
            (r["new_id"], r["dup_id"])
            for r in simhash_dedup_incremental(shard, path, max_hamming=3).collect()
        }
        assert (12, 1) in before and (13, 2) in before
        simhash_index_delete(_ids(spark, 1), path)
        simhash_index_delete(_ids(spark, 1), path)  # idempotent
        masked = {
            (r["new_id"], r["dup_id"])
            for r in simhash_dedup_incremental(shard, path, max_hamming=3).collect()
        }
        assert masked == {p for p in before if p[1] != 1}
        st = simhash_index_stats(spark, path)
        assert st["tombstones"] == 1 and st["tombstone_fraction"] > 0
        simhash_index_compact(spark, path)
        post = simhash_index_stats(spark, path)
        assert post["tombstones"] == 0
        after = {
            (r["new_id"], r["dup_id"])
            for r in simhash_dedup_incremental(shard, path, max_hamming=3).collect()
        }
        assert after == masked


class TestEmbeddingDelete:
    def _data(self, spark):
        rng = random.Random(7)

        def vec(seed):
            r = random.Random(seed)
            return [r.uniform(-1, 1) for _ in range(8)]

        v1, v2 = vec(1), vec(2)
        near1 = [x + 0.001 for x in v1]
        hist = spark.createDataFrame(
            [(1, v1), (2, v2)], "vec_id bigint, embedding array<double>"
        )
        shard = spark.createDataFrame(
            [(11, near1), (12, v1), (13, v2), (14, vec(99))],
            "vec_id bigint, embedding array<double>",
        )
        _ = rng
        return hist, shard

    @pytest.mark.slow
    def test_lifecycle(self, spark, tmp_path):
        from tia_data_pipeline_spark.operators.similarity import (
            embedding_dedup_incremental,
            embedding_index_compact,
            embedding_index_delete,
            embedding_index_stats,
            embedding_write_index,
        )

        hist, shard = self._data(spark)
        path = str(tmp_path / "emb")
        embedding_write_index(hist, path, bits=2)
        before = {
            (r["new_id"], r["dup_id"])
            for r in embedding_dedup_incremental(shard, path, threshold=0.9).collect()
        }
        assert (12, 1) in before and (13, 2) in before
        ids = spark.createDataFrame([(1,)], "vec_id bigint")
        embedding_index_delete(ids, path)
        embedding_index_delete(ids, path)  # idempotent
        masked = {
            (r["new_id"], r["dup_id"])
            for r in embedding_dedup_incremental(shard, path, threshold=0.9).collect()
        }
        assert masked == {p for p in before if p[1] != 1}
        st = embedding_index_stats(spark, path)
        assert st["tombstones"] == 1 and st["tombstone_fraction"] > 0
        embedding_index_compact(spark, path)
        assert embedding_index_stats(spark, path)["tombstones"] == 0
        after = {
            (r["new_id"], r["dup_id"])
            for r in embedding_dedup_incremental(shard, path, threshold=0.9).collect()
        }
        assert after == masked


class TestGenericTombstoneLayer:
    def test_pre_tombstone_index_reads_as_zero(self, spark, docs, tmp_path):
        """Back-compat: an index written before the tombstone layer has
        no _tombstones dir at all — probes and stats treat it as zero
        tombstones instead of failing."""
        import shutil

        from tia_data_pipeline_spark.operators.dedup import (
            minhash_index_delete,
            minhash_index_stats,
            minhash_write_index,
        )

        hist, _ = docs
        path = str(tmp_path / "old")
        minhash_write_index(hist, "text", "doc_id", path, n_shards=4)
        minhash_index_delete(_ids(spark, 1), path)
        shutil.rmtree(os.path.join(path, "_tombstones"))
        st = minhash_index_stats(spark, path)
        assert st["tombstones"] == 0 and st["tombstone_fraction"] == 0.0

    def test_underscore_partition_dirs_are_data(self, spark, tmp_path):
        """ADVICE r8: `<col>=value` components are DATA partitions even
        when the column starts with an underscore (the IVF `_cell=K/`
        layout) — stats must census their files and compaction must not
        silently no-op."""
        from tia_data_pipeline_spark.operators.scale import (
            compact_partitioned_index,
            partitioned_index_stats,
        )

        path = str(tmp_path / "ivfish")
        df = spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "vec_id bigint, _cell int"
        )
        df.repartition(4).write.partitionBy("_cell").parquet(path)
        st = partitioned_index_stats(spark, path, partition_cols=("_cell",))
        assert st["rows"] == 30 and st["partitions"] == 3 and st["files"] > 0
        out = compact_partitioned_index(spark, path, partition_cols=("_cell",))
        assert out["rows"] == 30
        assert out["files_after"] == 3
        assert spark.read.parquet(path).count() == 30

    def test_compact_rejects_non_local_uri(self, spark):
        from tia_data_pipeline_spark.operators.scale import (
            compact_partitioned_index,
        )

        with pytest.raises(ValueError, match="local-FS-only"):
            compact_partitioned_index(
                spark, "s3a://bucket/idx", partition_cols=("band",)
            )


class TestScopedProbeCacheRelease:
    """VERDICT r8 wrong #3: the scoped probe forms must release the
    shard cache on exit — the daily-loop scenario the batch API is
    built for (matches the streaming loops' leak test)."""

    def test_minhash_scoped_releases_cache(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_dedup_incremental_scoped,
            minhash_write_index,
        )

        hist, shard = docs
        path = str(tmp_path / "mh")
        minhash_write_index(hist, "text", "doc_id", path, n_shards=4)
        spark.catalog.clearCache()  # isolate from session-lifetime caches
        jsc = spark.sparkContext._jsc.sc()
        before = len(jsc.getRDDStorageInfo())
        with minhash_dedup_incremental_scoped(shard, path, threshold=0.5) as pairs:
            got = {(r["new_id"], r["dup_id"]) for r in pairs.collect()}
        assert (12, 1) in got
        from tests.conftest import assert_cache_settles_to

        assert_cache_settles_to(jsc, before, "shard cache")

    def test_simhash_scoped_releases_cache(self, spark, docs, tmp_path):
        from tia_data_pipeline_spark.operators.dedup import (
            simhash_dedup_incremental_scoped,
            simhash_write_index,
        )

        hist, shard = docs
        path = str(tmp_path / "sh")
        simhash_write_index(hist, "text", "doc_id", path, n_shards=4)
        spark.catalog.clearCache()  # isolate from session-lifetime caches
        jsc = spark.sparkContext._jsc.sc()
        before = len(jsc.getRDDStorageInfo())
        with simhash_dedup_incremental_scoped(shard, path) as pairs:
            assert pairs.count() >= 1
        from tests.conftest import assert_cache_settles_to

        assert_cache_settles_to(jsc, before, "shard cache")

    def test_embedding_scoped_releases_cache(self, spark, tmp_path):
        from tia_data_pipeline_spark.operators.similarity import (
            embedding_dedup_incremental_scoped,
            embedding_write_index,
        )

        hist, shard = TestEmbeddingDelete()._data(spark)
        path = str(tmp_path / "emb")
        embedding_write_index(hist, path, bits=2)
        spark.catalog.clearCache()  # isolate from session-lifetime caches
        jsc = spark.sparkContext._jsc.sc()
        before = len(jsc.getRDDStorageInfo())
        with embedding_dedup_incremental_scoped(shard, path, threshold=0.9) as pairs:
            assert pairs.count() >= 1
        from tests.conftest import assert_cache_settles_to

        assert_cache_settles_to(jsc, before, "shard cache")


def test_stream_index_deletes_masks_and_replays_idempotently(spark, docs, tmp_path):
    """The deletion-request stream: streamed takedown ids tombstone the
    index per micro-batch; a replay of the same files tombstones
    nothing new; probes mask immediately."""
    from tia_data_pipeline_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index_stats,
        minhash_write_index,
    )
    from tia_data_pipeline_spark.streaming.dedup_serve import stream_index_deletes

    hist, shard = docs
    path = str(tmp_path / "mh")
    minhash_write_index(hist, "text", "doc_id", path, n_shards=4)
    req_dir = tmp_path / "requests"
    spark.createDataFrame([(1,)], "doc_id bigint").coalesce(1).write.parquet(
        str(req_dir / "a")
    )
    spark.createDataFrame([(1,), (2,)], "doc_id bigint").coalesce(1).write.parquet(
        str(req_dir / "b")
    )
    id_stream = (
        spark.readStream.schema("doc_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{req_dir}/*")
    )
    q = stream_index_deletes(
        id_stream,
        index_path=path,
        checkpoint=str(tmp_path / "ckpt"),
        family="minhash",
    )
    q.awaitTermination()
    st = minhash_index_stats(spark, path)
    assert st["tombstones"] == 2  # overlapping requests collapse
    assert minhash_dedup_incremental(shard, path, threshold=0.5).count() == 0
    with pytest.raises(ValueError, match="unknown index family"):
        stream_index_deletes(
            id_stream, index_path=path,
            checkpoint=str(tmp_path / "ckpt2"), family="nope",
        )


class TestReviewHardenings:
    """Round-9 review findings, pinned."""

    def test_noop_delete_never_creates_tombstone_dir(self, spark, docs, tmp_path):
        """An all-NULL or fully-replayed deletion batch must not create
        _tombstones on a pristine index (it would permanently demote
        every probe off the never-deleted fast path) nor grow files on
        replay."""
        from tia_data_pipeline_spark.operators.dedup import (
            minhash_index_delete,
            minhash_write_index,
        )

        hist, _ = docs
        path = str(tmp_path / "mh")
        minhash_write_index(hist, "text", "doc_id", path, n_shards=4)
        nulls = spark.createDataFrame([(None,)], "doc_id bigint")
        minhash_index_delete(nulls, path)
        assert not os.path.isdir(os.path.join(path, "_tombstones"))
        # a real delete creates it; replaying adds NO file
        minhash_index_delete(_ids(spark, 1), path)
        import glob

        files = lambda: len(  # noqa: E731
            glob.glob(os.path.join(path, "_tombstones", "*.parquet"))
        )
        n1 = files()
        minhash_index_delete(_ids(spark, 1), path)
        assert files() == n1 == 1

    def test_stream_deletes_respect_family_id_defaults(self, spark, tmp_path):
        """family='embedding' must accept the vec_id-keyed streams every
        other embedding API defaults to (review r9: a hardcoded
        forwarded 'doc_id' raised UNRESOLVED_COLUMN in foreachBatch)."""
        from tia_data_pipeline_spark.operators.similarity import (
            embedding_dedup_incremental,
            embedding_write_index,
        )
        from tia_data_pipeline_spark.streaming.dedup_serve import (
            stream_index_deletes,
        )

        hist, shard = TestEmbeddingDelete()._data(spark)
        path = str(tmp_path / "emb")
        embedding_write_index(hist, path, bits=2)
        req = tmp_path / "requests"
        spark.createDataFrame([(1,)], "vec_id bigint").coalesce(1).write.parquet(
            str(req / "a")
        )
        id_stream = spark.readStream.schema("vec_id bigint").parquet(f"{req}/*")
        q = stream_index_deletes(
            id_stream,
            index_path=path,
            checkpoint=str(tmp_path / "ckpt"),
            family="embedding",
        )
        q.awaitTermination()
        got = {
            (r["new_id"], r["dup_id"])
            for r in embedding_dedup_incremental(shard, path, threshold=0.9).collect()
        }
        assert not any(d == 1 for _, d in got)


class TestMassDeleteMask:
    """VERDICT r9 #4: the tombstone mask is size-conditional. Takedown-
    request-sized sets broadcast (the round-9 plan, unchanged and
    plan-asserted); a TTL/retention sweep past the broadcast budget
    routes through the Bloom membership split so the tombstone set is
    never shipped to every executor — definitely-live rows skip the
    shuffle and only the Bloom-possible sliver pays the exact
    shuffle-hash join. Both paths must be row-identical."""

    def _frames(self, spark, tmp_path):
        import pandas as pd

        base = pd.DataFrame(
            {"doc_id": range(10_000), "val": [i % 97 for i in range(10_000)]}
        )
        df_path = str(tmp_path / "rows")
        ts_path = str(tmp_path / "ts")
        spark.createDataFrame(base).write.parquet(df_path)
        # a 15% retention sweep — mass-deletion regime, NOT request-sized
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [i for i in range(10_000) if i % 7 == 0]})
        ).write.parquet(ts_path)
        return spark.read.parquet(df_path), spark.read.parquet(ts_path)

    def _plan(self, df):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def test_bloom_path_equals_broadcast_path(self, spark, tmp_path):
        from tia_data_pipeline_spark.operators.scale import tombstone_mask_join

        df, ts = self._frames(spark, tmp_path)
        small = tombstone_mask_join(df, ts, "doc_id", keep="live")
        big = tombstone_mask_join(
            df, ts, "doc_id", keep="live", broadcast_max_bytes=0
        )
        expect = {r["doc_id"] for r in small.collect()}
        assert expect == {i for i in range(10_000) if i % 7 != 0}
        assert {r["doc_id"] for r in big.collect()} == expect
        # keep="dead" (the text index's scalar-correction leg) too
        dead = tombstone_mask_join(
            df, ts, "doc_id", keep="dead", broadcast_max_bytes=0
        )
        assert {r["doc_id"] for r in dead.collect()} == {
            i for i in range(10_000) if i % 7 == 0
        }

    def test_request_sized_path_stays_broadcast(self, spark, tmp_path):
        from tia_data_pipeline_spark.operators.scale import tombstone_mask_join

        df, ts = self._frames(spark, tmp_path)
        p = self._plan(tombstone_mask_join(df, ts, "doc_id", keep="live"))
        assert "BroadcastHashJoin" in p and "LeftAnti" in p
        assert "ShuffledHashJoin" not in p and "SortMergeJoin" not in p

    def test_mass_delete_never_shuffles_the_full_relation_as_broadcast(
        self, spark, tmp_path
    ):
        """Past the budget the exact leg is a shuffle-hash join of the
        Bloom-possible sliver — the tombstone SET itself never appears
        under a BroadcastExchange (the word table that does broadcast
        is bounded by the filter bits, not the tombstone count)."""
        from tia_data_pipeline_spark.operators.scale import tombstone_mask_join

        df, ts = self._frames(spark, tmp_path)
        p = self._plan(
            tombstone_mask_join(
                df, ts, "doc_id", keep="live", broadcast_max_bytes=0
            )
        )
        assert "ShuffledHashJoin" in p  # the exact sliver leg
        assert "LeftAnti" not in p  # mask is a marked filter, not an anti-join

    def test_index_probe_routes_through_the_switch(self, spark, tmp_path):
        """End-to-end: anti_join_index_tombstones over a real index dir
        gives identical results through both regimes."""
        from tia_data_pipeline_spark.operators.scale import (
            anti_join_index_tombstones,
            append_index_tombstones,
        )

        df, _ = self._frames(spark, tmp_path)
        idx_path = str(tmp_path / "idx")
        df.write.parquet(idx_path)
        schema_json = df.schema.json()
        append_index_tombstones(
            df.filter("doc_id % 7 = 0").select("doc_id"),
            idx_path,
            index_schema_json=schema_json,
            id_col="doc_id",
        )
        read_back = spark.read.schema(df.schema).parquet(idx_path)
        small = anti_join_index_tombstones(
            read_back, idx_path, index_schema_json=schema_json, id_col="doc_id"
        )
        big = anti_join_index_tombstones(
            read_back,
            idx_path,
            index_schema_json=schema_json,
            id_col="doc_id",
            broadcast_max_bytes=0,
        )
        expect = {i for i in range(10_000) if i % 7 != 0}
        assert {r["doc_id"] for r in small.collect()} == expect
        assert {r["doc_id"] for r in big.collect()} == expect
