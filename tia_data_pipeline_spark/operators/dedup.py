"""Deduplication operators (exact + near-duplicate).

Extension tier (SURVEY §2.4): the reference's PK conflict-skip
(``posts_pipeline.py:57``) generalized to content-level dedup for
LLM-training pipelines. Everything is expression-level Spark — hashing,
shingling, MinHash, SimHash all run inside whole-stage codegen; no
Python UDFs.

Scale posture (100 TB):
- exact dedup shuffles 32-byte digests, never documents;
- MinHash-LSH bounds candidate pairs via banding, and a document-
  frequency cap keeps degenerate shingles from quadratic blowup;
- signatures are fixed-width arrays (k·8 bytes/doc), so the LSH
  self-join shuffles signatures, not text.
"""

from __future__ import annotations

import json
import random
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tia_data_pipeline_spark.functions.text import portable_round, tokens
from tia_data_pipeline_spark.operators.scale import fan_out

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def content_hash(col: Column) -> Column:
    """sha256 hex digest of a text column (matches DuckDB ``sha256``)."""
    return F.sha2(col, 256)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One survivor per distinct content hash (lowest id wins).

    Group-by on the digest: map-side partial min, 32-byte shuffle keys.

    NULL-text semantics (stated, identical to the SQL oracle): sha2 of
    a NULL text is NULL, and ALL NULL-hash rows group together — every
    document without text collapses to the single lowest-id survivor.
    Callers that must preserve NULL-text rows as distinct documents
    filter them out before deduping and union them back.
    """
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup detection
# ---------------------------------------------------------------------------

# Deterministic hash family h_i(x) = (a_i * x + b_i) mod P over
# x = pmod(xxhash64(shingle), 2^31). a_i < 2^31 keeps products < 2^62
# (no ANSI overflow); P is a Mersenne prime.
_MINHASH_P = (1 << 61) - 1
_X_MOD = 1 << 31


def _hash_family(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _X_MOD), rng.randrange(0, _X_MOD)) for _ in range(k)]


def md5_int_sql(s: str, digits: int = 7) -> str:
    """SQL fragment valid in BOTH Spark SQL and DuckDB: the first
    ``digits`` hex digits of md5(s) as a BIGINT (< 16^digits = 2^28 at
    the default) — the engine-portable shingle hash for the
    oracle-checkable MinHash path (same instr-digit construction as the
    SimHash bits below). 7 digits keeps a*x < 2^31 * 2^28 = 2^59, clear
    of ANSI-mode bigint overflow in the affine hash family."""
    terms = []
    for i in range(digits):
        d = f"(instr('0123456789abcdef', substr(md5({s}), {i + 1}, 1)) - 1)"
        terms.append(f"CAST({d} AS BIGINT) * {16 ** (digits - 1 - i)}")
    return "(" + " + ".join(terms) + ")"


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of a text column IN ORDER, repeats kept (JVM-side:
    split → zip n shifted slices → concat). The frequency-counting
    queries (bigram LM, collocations, repetition rules) need every
    occurrence; the set-semantics dedup family wraps this in
    :func:`word_shingles` for the distinct form.

    Construction note: the obvious ``transform(sequence(1, m),
    i -> concat(element_at(toks, i), …))`` is ~15× slower — higher-
    order functions don't codegen, and any non-lambda subexpression in
    the lambda body (here the whole tokenize chain) is RE-EVALUATED per
    element. ``arrays_zip`` of n shifted slices evaluates the token
    array O(n) times per row instead of O(tokens·n), and the lambda
    touches only its own variable. Short docs (< n tokens) return [].
    """
    toks = tokens(col)
    n_sh = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, n_sh) for j in range(n)])
    return F.when(n_sh < 1, F.array().cast("array<string>")).otherwise(
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]))
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles — :func:`word_ngrams` with set
    semantics, the dedup-family form (per-doc distinct makes the
    shingle→doc inverted index count document frequency)."""
    return F.array_distinct(word_ngrams(col, n))


def bucket_pairs(mem: Column, *, order_key: str | None = None) -> Column:
    """All unordered member pairs of a ``collect_list`` bucket column,
    expanded IN-EXPRESSION — the shared candidate-generation idiom of
    the whole dedup/similarity family (MinHash banding, n-gram
    inverted index, substring k-mers, embedding buckets, edit-distance
    verify). Grouping members and expanding pairs inside the array
    avoids the self-join that would re-execute the bucket's entire
    upstream lineage once per side; callers cap ``size(mem)`` FIRST —
    a bucket of b members expands to b·(b-1)/2 structs in one row.

    ``order_key=None``: members are scalars; pairs come back as
    ``struct(id_a, id_b)`` with ``id_a <= id_b`` via least/greatest.
    ``order_key='f'``: members are structs; pairs come back as
    ``struct(a, b)`` (full member structs) ordered by field ``f``."""
    if order_key is None:
        inner = lambda x, y: F.struct(  # noqa: E731
            F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b")
        )
    else:
        inner = lambda x, y: F.when(  # noqa: E731
            x[order_key] < y[order_key], F.struct(x.alias("a"), y.alias("b"))
        ).otherwise(F.struct(y.alias("a"), x.alias("b")))
    return F.flatten(
        F.transform(
            mem,
            lambda x, i: F.transform(
                F.slice(mem, i + 2, F.size(mem)), lambda y: inner(x, y)
            ),
        )
    )


def capped_bucket_members(
    keyed: DataFrame,
    keys: str | list[str],
    payload: Column | str,
    *,
    max_size: int,
    min_size: int = 2,
    distinct: bool = False,
    mem_col: str = "mem",
) -> DataFrame:
    """Bucket-member lists with the size cap applied BEFORE any list is
    materialized — the two-pass form of ``groupBy(key).agg(
    collect_list(payload)).filter(size(mem) <= cap)``.

    The one-pass form is a 100 TB scale-killer: ``collect_list``'s
    aggregation buffer is an in-memory array that is NOT spillable, so
    a corpus-stop shingle / million-copy boilerplate bucket
    materializes millions of elements in a single task *before* the
    size filter drops it — straggler at best, executor OOM at worst.
    Two passes instead:

    1. ``groupBy(keys).count()`` — 8-byte keys, map-side partial
       combine, so even a corpus-stop key aggregates to one count per
       input partition (no skew reaches the reduce side);
    2. left-semi join the surviving keys (``min_size <= n <=
       max_size``) back, THEN collect the member lists — a hot bucket's
       rows never enter a list buffer anywhere in the plan.

    Cost: the keyed lineage executes twice (count pass + collect pass)
    and one extra key-only shuffle. Catalyst prunes the count pass to
    the key columns, so heavy payloads (signatures, vectors) shuffle
    once, exactly as before. Callers whose lineage is CPU-expensive
    (simhash/minhash aggregates) pass the narrow *keyed* frame, not the
    raw corpus, so the recomputed leg is the cheap tail of the plan.

    ``distinct=True`` collects with set semantics (``collect_set``) and
    sizes buckets by ``countDistinct(payload)`` to match.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    payload_col = F.col(payload) if isinstance(payload, str) else payload
    size_agg = (
        F.countDistinct(payload_col) if distinct else F.count(F.lit(1))
    ).alias("_bsz")
    kept = (
        keyed.groupBy(*key_cols)
        .agg(size_agg)
        .filter((F.col("_bsz") >= min_size) & (F.col("_bsz") <= max_size))
        .select(*key_cols)
    )
    agg = F.collect_set(payload_col) if distinct else F.collect_list(payload_col)
    return (
        keyed.join(kept, on=key_cols, how="left_semi")
        .groupBy(*key_cols)
        .agg(agg.alias(mem_col))
    )


def minhash_signature(col: Column, k: int = 32, seed: int = 42, shingle_n: int = 3) -> Column:
    """k-component MinHash signature (array<bigint>) of a text column.

    Column-expression form for ad-hoc use; the *operator* path uses
    :func:`minhash_signature_frame` — this inline form duplicates the
    shingle pipeline k times in the plan (no CSE through higher-order
    functions), which is k× the work.
    """
    xs = F.transform(
        word_shingles(col, shingle_n), lambda s: F.pmod(F.xxhash64(s), F.lit(_X_MOD))
    )
    comps = [
        F.array_min(F.transform(xs, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MINHASH_P)))
        for a, b in _hash_family(k, seed)
    ]
    return F.array(*comps)


def minhash_signature_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 32,
    seed: int = 42,
    shingle_n: int = 3,
    *,
    portable: bool = False,
) -> DataFrame:
    """(id, sig) frame: shingle once, explode, then ONE grouped
    aggregate with k cheap `min((a·x+b) mod P)` aggregations — the
    shingle pipeline runs once per document instead of k times, and the
    whole thing stays in whole-stage codegen with map-side partial
    mins. Docs with zero shingles drop out (explode of empty array).

    ``portable=True`` swaps the shingle hash xxhash64 → md5-digit
    (:func:`md5_int_sql`): identical pipeline shape, but every value is
    reproducible in DuckDB, so the whole MinHash estimate becomes
    hash-checkable cross-engine (the declared `q_fuzzy_dedup` path);
    xxhash64 stays the production default (faster, JVM-native)."""
    # NULL ids are excluded at the source: groupBy would otherwise
    # MERGE every NULL-id document's shingles into one chimeric
    # signature, and the in-expression pair ordering downstream would
    # emit (id, NULL) pairs that every oracle's a.id < b.id drops
    src = fan_out(
        df.filter(F.col(id_col).isNotNull()).select(
            F.col(id_col), F.col(text_col)
        )
    )
    x = (
        F.expr(md5_int_sql("_sh"))
        if portable
        else F.pmod(F.xxhash64("_sh"), F.lit(_X_MOD))
    )
    ex = src.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_sh"),
    ).select("_id", x.alias("_x"))
    aggs = [
        F.min((F.lit(a) * F.col("_x") + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"_m{i}")
        for i, (a, b) in enumerate(_hash_family(k, seed))
    ]
    return ex.groupBy("_id").agg(*aggs).select(
        "_id", F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("_sig")
    )


def minhash_band_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    shingle_n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Banded MinHash signatures: one ``(_id, _sig, band, bucket)`` row
    per (document, band) — the shared candidate-keying frame of both
    the batch LSH dedup (:func:`minhash_near_duplicates`) and the
    persisted signature index (:func:`minhash_write_index` /
    :func:`minhash_dedup_incremental`). Two frames built with equal
    (k, bands, seed, shingle_n, portable) collide on exactly the same
    (band, bucket) keys, which is what makes an index written yesterday
    probeable by today's shard.

    ``portable=True`` keys buckets by the raw band slice (array of r
    signature components — DuckDB-reproducible); default keys by
    xxhash64 of the slice (8-byte keys, JVM-only)."""
    assert k % bands == 0, "k must divide into equal bands"
    r = k // bands
    sig = minhash_signature_frame(
        df, text_col, id_col, k, seed, shingle_n=shingle_n, portable=portable
    )

    def bucket_of(i: int):
        sl = F.slice("_sig", i * r + 1, r)
        return sl if portable else F.xxhash64(sl)

    return sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), bucket_of(i).alias("bucket"))
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.bucket")


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    portable: bool = False,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding.

    shingle → k minhashes → b bands of r=k/b rows → bucket-join within
    (band, bucket) → estimate Jaccard as matching-component fraction →
    filter ≥ threshold. Returns (id_a, id_b, est_jaccard), id_a < id_b.

    The candidate join keys on (band_idx, band_hash): only documents
    agreeing on a whole band collide, so the shuffle fan-out is bounded
    by the banding probability curve, not |docs|².

    ``portable=True``: md5-digit shingle hash and the band's raw value
    slice as the bucket key (instead of xxhash64 of it) — every
    intermediate is DuckDB-reproducible, so the estimate hash-matches a
    SQL oracle (`plans/llm.py::q_fuzzy_dedup`). Bucket keys grow from 8
    bytes to r·8 bytes; production default stays xxhash64.
    """
    banded = minhash_band_frame(
        df, text_col, id_col, k=k, bands=bands, seed=seed, portable=portable
    )

    # Candidate pairs WITHOUT a self-join (a self-join would execute the
    # whole signature lineage twice): group bucket members and expand
    # pairs in-expression. Hot buckets (degenerate near-identical
    # content) are capped — at scale an uncapped bucket is a quadratic
    # bomb; the cap is the same trade LSH banding already makes — and
    # the cap is applied two-pass (count → semi-join → collect) so a
    # million-copy boilerplate bucket never reaches a list buffer. The
    # banded frame persists first: the (band, bucket) keys derive from
    # _sig, so the count leg would otherwise re-execute the whole
    # minhash-signature aggregate (k·8 bytes/doc cached — exactly the
    # signature table a production LSH pipeline materializes).
    # max_bucket is a PARAMETER mirroring minhash_oracle_sql's, so a
    # non-default oracle value can never silently diverge from a
    # hardcoded operator literal.
    banded = banded.persist()
    members = capped_bucket_members(
        banded, ["band", "bucket"], F.struct("_id", "_sig"), max_size=max_bucket
    )
    pair_arr = bucket_pairs(F.col("mem"), order_key="_id")
    cand = (
        members.select(F.explode(pair_arr).alias("p"))
        .select(
            F.col("p.a._id").alias("id_a"),
            F.col("p.b._id").alias("id_b"),
            F.col("p.a._sig").alias("sig_a"),
            F.col("p.b._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(k))
    )
    return (
        cand.withColumn("est_jaccard", portable_round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def _minhash_sql_fragments(
    k: int, bands: int, seed: int, a_alias: str, b_alias: str
) -> tuple[str, str, str, str]:
    """The DuckDB fragments every MinHash oracle is built from —
    single-sourced so the batch (:func:`minhash_oracle_sql`) and
    incremental (:func:`minhash_incremental_oracle_sql`) forms can
    never drift: per-component ``min((a·x+b) mod P)`` aggregations,
    the signature list, the band-slice structs, and the
    matching-component fraction between signature aliases
    ``a_alias``/``b_alias``. Returns (mins, sig_list, band_structs,
    match_frac)."""
    assert k % bands == 0
    r = k // bands
    fam = _hash_family(k, seed)
    mins = ", ".join(
        f"min(({a} * x + {b}) % {_MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(fam)
    )
    sig_list = "[" + ", ".join(f"m{i}" for i in range(k)) + "]"
    band_structs = ", ".join(
        f"{{'band': {i}, 'key': sig[{i * r + 1}:{i * r + r}]}}" for i in range(bands)
    )
    match_frac = (
        f"len([i FOR i IN range(1, {k + 1}) "
        f"IF {a_alias}.sig[i] = {b_alias}.sig[i]]) / {float(k)}"
    )
    return mins, sig_list, band_structs, match_frac


def minhash_oracle_sql(
    table: str,
    shingles_sql: str,
    id_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = 1000,
) -> str:
    """DuckDB SQL reproducing :func:`minhash_near_duplicates` with
    ``portable=True`` value-for-value: same md5-digit shingle hash
    (:func:`md5_int_sql`), same affine family (same seed), same band
    slices as join keys, same hot-bucket cap, same rounded estimate.
    The signature/banding fragments are single-sourced in
    :func:`_minhash_sql_fragments` (shared with the incremental
    oracle) so the two hash-checked forms can never drift apart."""
    from tia_data_pipeline_spark.functions.text import portable_round_sql

    mins, sig_list, band_structs, match_frac = _minhash_sql_fragments(
        k, bands, seed, "sa", "sb"
    )
    return (
        f"WITH sh AS (SELECT {id_col} AS _id, unnest({shingles_sql}) AS s FROM {table}), "
        f"xs AS (SELECT _id, {md5_int_sql('s')} AS x FROM sh), "
        f"m AS (SELECT _id, {mins} FROM xs GROUP BY _id), "
        f"sigl AS (SELECT _id, {sig_list} AS sig FROM m), "
        f"banded AS (SELECT _id, u.band AS band, u.key AS key FROM ("
        f"  SELECT _id, unnest([{band_structs}]) AS u FROM sigl)), "
        f"hot AS (SELECT band, key FROM banded GROUP BY band, key "
        f"  HAVING count(*) > {max_bucket}), "
        f"ok AS (SELECT banded.* FROM banded ANTI JOIN hot USING (band, key)), "
        f"cand AS (SELECT DISTINCT a._id AS id_a, b._id AS id_b FROM ok a "
        f"  JOIN ok b ON a.band = b.band AND a.key = b.key AND a._id < b._id), "
        f"est AS (SELECT id_a, id_b, {portable_round_sql(match_frac, 6)} AS est_jaccard "
        f"  FROM cand JOIN sigl sa ON sa._id = id_a JOIN sigl sb ON sb._id = id_b) "
        f"SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}"
    )


# ---------------------------------------------------------------------------
# Incremental fuzzy dedup against a persisted MinHash signature index
# ---------------------------------------------------------------------------
#
# The production shape of daily-increment near-dup (the fuzzy twin of
# antijoin-incr / comments_pipeline.py:33's "yesterday's posts"
# semantics): dedupe TODAY'S SHARD against an index of signatures
# persisted yesterday, without rescanning history. Mirrors the IVF
# persisted-index pattern (operators/similarity.py::ivf_write_index):
# the collision key is a write-time partition column so a shard's probe
# prunes the scan to touched partitions, and a tiny side table makes
# the index self-describing (the probe derives its hash family from the
# index, so a parameter drift between writer and prober is impossible).

_MINHASH_META_DIR = "_minhash_meta"


def _band_shard(n_shards: int) -> Column:
    # bucket values are high-cardinality (xxhash64 or raw band slices),
    # far too many for one partition dir each; a stable shard of the
    # bucket makes (band, bshard) a bounded partition key that still
    # prunes: a probe touches only the shards its own buckets hash to.
    return F.pmod(F.xxhash64("bucket"), F.lit(n_shards)).alias("bshard")


def minhash_write_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    *,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    shingle_n: int = 3,
    portable: bool = False,
    n_shards: int | None = None,
) -> None:
    """Materialize the MinHash signature index: banded signature rows
    partitioned by ``band=…/bshard=…`` (the 100 TB serving shape — a
    daily shard's probe reads only the partitions its own buckets hash
    to, never the whole index), plus a one-row parquet meta table so
    :func:`minhash_dedup_incremental` reproduces the exact hash family.

    Index rows are (``_id``, ``_sig``, ``bucket``): k·8 bytes of
    signature per document per band — the same signature table the
    batch path materializes per run (minhash_near_duplicates persists
    it in-memory), made durable and reusable across runs."""
    if n_shards is None:
        # default: size the layout from the source relation's bytes
        # (guide §6 — round 11); explicit callers keep full control
        from tia_data_pipeline_spark.operators.scale import adaptive_index_shards

        n_shards = adaptive_index_shards(df, bands=bands)
    banded = minhash_band_frame(
        df, text_col, id_col, k=k, bands=bands, seed=seed,
        shingle_n=shingle_n, portable=portable,
    ).withColumn("bshard", _band_shard(n_shards))
    # one shuffle keyed by the partition columns: each task then owns
    # whole (band, bshard) groups and writes one file per dir instead
    # of every task writing a sliver into every dir (file-count blowup)
    banded.repartition("band", "bshard").write.partitionBy(
        "band", "bshard"
    ).mode("overwrite").parquet(path)
    spark = df.sparkSession
    # schema_json makes the index readable even when EMPTY (a valid
    # state: day-zero bootstrap, or a fully-filtered corpus) — a
    # partitioned write of zero rows leaves no data files, and a bare
    # read would fail schema inference; probes read with this schema.
    meta = [
        (
            int(k), int(bands), int(seed), int(shingle_n), bool(portable),
            int(n_shards), banded.schema.json(),
        )
    ]
    spark.createDataFrame(
        meta,
        "k int, bands int, seed int, shingle_n int, portable boolean, "
        "n_shards int, schema_json string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{_MINHASH_META_DIR}")


def minhash_index_meta(spark, path: str) -> dict:
    """Index meta side table → dict (one row on the driver — control
    plane, not a data collect)."""
    row = spark.read.parquet(f"{path}/{_MINHASH_META_DIR}").collect()[0]
    return {
        "k": int(row["k"]),
        "bands": int(row["bands"]),
        "seed": int(row["seed"]),
        "shingle_n": int(row["shingle_n"]),
        "portable": bool(row["portable"]),
        "n_shards": int(row["n_shards"]),
        "schema_json": row["schema_json"],
    }


def _read_index(spark, path: str, meta: dict) -> DataFrame:
    # explicit schema from the meta table: an EMPTY index (day-zero
    # bootstrap, fully-filtered corpus) has no data files to infer
    # from, and inference is a driver-side footer read we can skip on
    # a 100 TB index anyway
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(meta["schema_json"]))
    return spark.read.schema(schema).parquet(path)


def _touched_partition_filter(new_banded: DataFrame, n_shards: int):
    """Partition predicate for the index scan: the distinct
    (band, bshard) combinations the shard's own buckets hash to.
    Collected to the driver — bounded by bands × n_shards (hundreds),
    the same control-plane shape as IVF's driver-side cell pick — and
    stated as literals so the parquet scan plans PartitionFilters and
    never opens untouched partitions.

    The predicate is ONE flat ``isin`` over the encoded combo
    ``band · n_shards + bshard`` (injective: 0 ≤ bshard < n_shards),
    which references only partition columns so the file index still
    prunes — an OR-of-conjunctions chain is NOT equivalent in practice:
    Spark's column-node converter recurses per node and a full
    bands×n_shards chain (512 terms at the defaults) overflows the JVM
    stack before analysis even starts (found by the 8× stress)."""
    combos = sorted(
        (int(r["band"]), int(r["bshard"]))
        for r in new_banded.select("band", "bshard").distinct().collect()
    )
    if not combos:
        return F.lit(False)
    codes = [b * n_shards + s for b, s in combos]
    return (F.col("band") * F.lit(n_shards) + F.col("bshard")).isin(codes)


def minhash_dedup_incremental(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs of a NEW SHARD against the persisted index —
    no history rescan. Returns ``(new_id, dup_id, est_jaccard)`` with
    ``dup_id`` an indexed document, est ≥ ``threshold``.

    Plan: band the shard with the index's own hash family (from the
    meta table), prune the index scan to the shard's touched
    (band, bshard) partitions, hot-bucket-cap BOTH sides two-pass
    (count → semi-join: a corpus-stop bucket on either side never
    reaches the join), then equi-join on (band, bucket) and estimate
    Jaccard from the signatures. A pair colliding in several bands
    appears once (dropDuplicates — genuinely needed here, unlike the
    one-cell-per-vector cosine path). The index side excludes the
    shard's OWN ids entirely, so the output is identical whether or
    not the shard was already appended (replay-deterministic);
    duplicates WITHIN the shard are a deliberate non-goal here — the
    streaming loop computes them as an explicit leg, and a one-off
    batch uses :func:`minhash_near_duplicates` on the shard.

    At 100 TB: the index scan reads |touched partitions| /
    (bands × n_shards) of the index; the join shuffles signatures
    (k·8 B/row), never text; the shard side is a day's increment, so
    the whole probe is sized by the shard, not by history.

    Cache lifecycle: the shard's signature frame persists (consumed
    three times — touched-partition collect, hot-bucket count, probe
    join) and the CacheManager holds it until unpersist/clearCache/
    session end. A long-lived DAILY loop must therefore use
    :func:`minhash_dedup_incremental_scoped` (releases the cache on
    exit) or the streaming loop — calling THIS form per day
    accumulates one shard cache per probe in storage memory."""
    pairs, _ = _incremental_probe_parts(
        new_docs, index_path,
        text_col=text_col, id_col=id_col,
        threshold=threshold, max_bucket=max_bucket,
    )
    return pairs


def _incremental_probe_parts(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str,
    id_col: str,
    threshold: float,
    max_bucket: int,
) -> tuple[DataFrame, DataFrame]:
    """(pairs, persisted shard frame) — the shared core of the lazy
    and scoped probe forms, so the cache handle exists in exactly one
    place."""
    spark = new_docs.sparkSession
    meta = minhash_index_meta(spark, index_path)
    new_banded = (
        minhash_band_frame(
            new_docs, text_col, id_col,
            k=meta["k"], bands=meta["bands"], seed=meta["seed"],
            shingle_n=meta["shingle_n"], portable=meta["portable"],
        )
        .withColumn("bshard", _band_shard(meta["n_shards"]))
        # the shard frame is consumed three times (touched-partition
        # collect, its own hot-bucket count, the probe join) and its
        # signature aggregate is the CPU-heavy leg — persist the narrow
        # keyed frame (the two-pass-cap discipline).
        .persist()
    )
    pairs = _probe_pairs(
        new_banded, spark, index_path, meta,
        threshold=threshold, max_bucket=max_bucket,
    )
    return pairs, new_banded


@contextmanager
def minhash_dedup_incremental_scoped(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
):
    """:func:`minhash_dedup_incremental` with an EXACT cache lifecycle
    — the form a daily serving loop should call (review r8: the lazy
    form leaks one shard cache per probe in precisely that scenario):

        with minhash_dedup_incremental_scoped(shard, path) as pairs:
            pairs.write.parquet(out)   # consume INSIDE the scope

    The shard's persisted signature frame is released on scope exit
    (every exit path, matching the streaming loop's discipline);
    consuming ``pairs`` after exit recomputes signatures uncached."""
    pairs, new_banded = _incremental_probe_parts(
        new_docs, index_path,
        text_col=text_col, id_col=id_col,
        threshold=threshold, max_bucket=max_bucket,
    )
    try:
        yield pairs
    finally:
        new_banded.unpersist()


def _bucket_capped(df: DataFrame, max_bucket: int) -> DataFrame:
    """Two-pass hot-bucket cap over a banded frame: keep only rows
    whose (band, bucket) group holds ≤ ``max_bucket`` rows — count
    first, semi-join survivors, so a boilerplate bucket never reaches
    a join. The single cap implementation for every incremental-index
    probe/intra leg (MinHash and SimHash): cap-semantics changes land
    in one place."""
    ok = (
        df.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band", "bucket")
    )
    return df.join(ok, ["band", "bucket"], "left_semi")


def _probe_pairs(
    new_banded: DataFrame,
    spark,
    index_path: str,
    meta: dict,
    *,
    threshold: float,
    max_bucket: int,
) -> DataFrame:
    """Probe core shared by the batch operator and the streaming
    micro-batch loop: banded shard frame → pruned index scan →
    per-side two-pass hot-bucket caps → signature-estimate pairs.

    The index side EXCLUDES the shard's own ids (anti-join, not just a
    self-pair filter): the probe's output is then a pure function of
    (shard, index-minus-shard), so re-probing a shard that was already
    appended — including a foreachBatch replay that crashed between
    append and checkpoint commit — produces byte-identical pairs
    instead of crash-dependent extras (review r8, confirmed by repro).
    Intra-shard duplicates are a separate, explicitly-computed leg
    (:func:`_intra_pairs`), not an accident of replay ordering.

    Tombstoned ids (:func:`minhash_index_delete`) are masked off the
    index side BEFORE the hot-bucket caps — a deleted document neither
    pairs nor counts toward a bucket's population, exactly as if
    compaction had already removed its rows."""
    from tia_data_pipeline_spark.operators.scale import anti_join_index_tombstones

    pred = _touched_partition_filter(new_banded, meta["n_shards"])
    idx = anti_join_index_tombstones(
        _read_index(spark, index_path, meta).filter(pred),
        index_path,
        index_schema_json=meta["schema_json"],
        id_col="_id",
    ).join(new_banded.select("_id").distinct(), on="_id", how="left_anti")

    # two-pass hot-bucket caps, each side against its own count: an
    # index bucket over the cap is boilerplate history (skip it); a
    # shard bucket over the cap is boilerplate arriving today.
    probe = _bucket_capped(new_banded, max_bucket).select(
        "band", "bucket", F.col("_id").alias("new_id"), F.col("_sig").alias("sig_new")
    )
    hist = _bucket_capped(idx, max_bucket).select(
        "band", "bucket", F.col("_id").alias("dup_id"), F.col("_sig").alias("sig_old")
    )
    k = meta["k"]
    est = (
        F.size(
            F.filter(F.zip_with("sig_new", "sig_old", lambda x, y: x == y), lambda m: m)
        )
        / F.lit(float(k))
    )
    return (
        probe.join(hist, ["band", "bucket"])
        .select("new_id", "dup_id", portable_round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["new_id", "dup_id"])
    )


def _intra_pairs(
    new_banded: DataFrame, meta: dict, *, threshold: float, max_bucket: int
) -> DataFrame:
    """Duplicate pairs WITHIN one shard, canonical ``new_id < dup_id``
    — the explicit leg for duplicates that arrive together (same day,
    same batch): the index probe can never see them (the shard's own
    ids are excluded from its index side), so without this leg a
    same-shard duplicate would be lost forever (review r8, confirmed
    by repro). Depends only on the shard itself, so it is
    replay-deterministic by construction."""
    capped = _bucket_capped(new_banded, max_bucket)
    a = capped.select(
        "band", "bucket", F.col("_id").alias("new_id"), F.col("_sig").alias("sig_new")
    )
    b = capped.select(
        "band", "bucket", F.col("_id").alias("dup_id"), F.col("_sig").alias("sig_old")
    )
    est = (
        F.size(
            F.filter(F.zip_with("sig_new", "sig_old", lambda x, y: x == y), lambda m: m)
        )
        / F.lit(float(meta["k"]))
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("new_id") < F.col("dup_id"))
        .select("new_id", "dup_id", portable_round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["new_id", "dup_id"])
    )


def _append_delta(new_banded: DataFrame, spark, index_path: str, meta: dict) -> None:
    """Append core shared by the MinHash/SimHash appends and their
    streaming loops: anti-join already-indexed rows over the pruned
    scan (idempotent), write delta partitions.

    The anti-join keys on ``(_id, band)`` — the banded row key — not
    ``_id`` alone (round 11, the text-index partial-commit lesson): a
    doc's band rows span many ``(band, bshard)`` partitions, and a
    write job hard-killed INSIDE its commit can land a subset of them.
    An id-level anti-join would then skip the whole doc on retry,
    leaving it permanently short of band rows (silent recall loss at
    probe time); the row-level key makes the retry append exactly the
    missing rows. ``band`` is a partition column, so the wider key
    reads from directory metadata — the existing pruned scan, no extra
    I/O."""
    pred = _touched_partition_filter(new_banded, meta["n_shards"])
    existing = (
        _read_index(spark, index_path, meta)
        .filter(pred)
        .select("_id", "band")
        .distinct()
    )
    delta = new_banded.join(existing, on=["_id", "band"], how="left_anti")
    delta.repartition("band", "bshard").write.partitionBy("band", "bshard").mode(
        "append"
    ).parquet(index_path)


def minhash_index_append(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append a shard's signature rows to the index — idempotent
    (twice ≡ once): already-present ``(_id, band)`` rows are skipped
    via an anti-join against the touched partitions only (a doc's rows
    can live nowhere else — its (band, bshard) keys are a pure
    function of its text), so the retry cost is sized by the shard.
    Row-level, so a retry after a hard kill inside the write commit
    appends exactly the missing band rows (see :func:`_append_delta`).
    ``_id`` is non-null by the signature frame's own precondition, so
    plain-equality anti-join semantics are exact here."""
    spark = new_docs.sparkSession
    meta = minhash_index_meta(spark, index_path)
    new_banded = minhash_band_frame(
        new_docs, text_col, id_col,
        k=meta["k"], bands=meta["bands"], seed=meta["seed"],
        shingle_n=meta["shingle_n"], portable=meta["portable"],
    ).withColumn("bshard", _band_shard(meta["n_shards"]))
    # persist: the frame is consumed twice (touched-partition collect +
    # the append write) and the signature aggregate is the CPU-heavy
    # leg. Unlike the probe, append is EAGER (the write completes
    # inside this call), so the cache lifecycle can be exact — released
    # on every exit path.
    new_banded = new_banded.persist()
    try:
        _append_delta(new_banded, spark, index_path, meta)
    finally:
        new_banded.unpersist()


def minhash_index_delete(
    ids: DataFrame, index_path: str, *, id_col: str = "doc_id"
) -> None:
    """Tombstone documents out of the MinHash index (takedown /
    right-to-be-forgotten / corpus TTL — the deletion leg of the index
    lifecycle): masked immediately from every probe
    (:func:`minhash_dedup_incremental` anti-joins the tombstones off
    its index side), physically removed at the next
    :func:`minhash_index_compact`. Idempotent (twice ≡ once); deletion
    needs only the ids, never the original text — a takedown request
    doesn't ship the document back.

    At 100 TB the tombstone table is request-sized (≪ corpus), so the
    probe-side masking broadcasts and this append is a tiny delta
    write."""
    from tia_data_pipeline_spark.operators.scale import append_index_tombstones

    meta = minhash_index_meta(ids.sparkSession, index_path)
    append_index_tombstones(
        ids.select(F.col(id_col).alias("_id")),
        index_path,
        index_schema_json=meta["schema_json"],
        id_col="_id",
    )


def minhash_index_compact(spark, path: str) -> dict:
    """One file per (band, bshard) partition — run after a season of
    daily appends (see :func:`…operators.scale.compact_partitioned_index`
    for the swap semantics and object-store caveat). Applies pending
    tombstones: deleted documents' rows are dropped from the rewrite
    and the now-applied tombstone table goes with them."""
    from tia_data_pipeline_spark.operators.scale import compact_partitioned_index

    meta = minhash_index_meta(spark, path)
    return compact_partitioned_index(
        spark, path,
        partition_cols=("band", "bshard"),
        schema_json=meta["schema_json"],
        side_dirs=(_MINHASH_META_DIR,),
        tombstones_id_col="_id",
    )


def minhash_index_stats(spark, path: str) -> dict:
    """Health census of the MinHash index — fragmentation (compact
    due?), partition skew (caps earning their keep?), and the pending-
    tombstone fraction (deletion debt compaction will reclaim)."""
    from tia_data_pipeline_spark.operators.scale import partitioned_index_stats

    meta = minhash_index_meta(spark, path)
    return partitioned_index_stats(
        spark, path,
        partition_cols=("band", "bshard"),
        schema_json=meta["schema_json"],
        tombstones_id_col="_id",
    )


def minhash_incremental_oracle_sql(
    table: str,
    shingles_sql: str,
    id_col: str,
    *,
    history_pred: str,
    shard_pred: str,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = 1000,
) -> str:
    """DuckDB SQL reproducing :func:`minhash_dedup_incremental` over a
    portable-path index built from ``table WHERE history_pred`` and a
    shard ``table WHERE shard_pred`` — same md5-digit shingle hash,
    same affine family, same band slices as collision keys, same
    per-side hot-bucket caps, same rounded estimate. The persisted
    index is an execution strategy, not a semantics change, so the
    oracle states the plain two-relation form. Signature/banding
    fragments are single-sourced with the batch oracle via
    :func:`_minhash_sql_fragments`.

    The history side states ``history_pred AND NOT (shard_pred)``,
    mirroring the Spark probe's anti-join of the shard's OWN ids off
    the index side (replay determinism): when the predicates overlap —
    a shard re-probed after it was appended — both engines exclude the
    shard's documents from history BEFORE the hot-bucket caps, so the
    forms agree for overlapping predicates too, not just the disjoint
    ones the contract registers (ADVICE r8). Both predicates must be
    deterministic row predicates on ``table``."""
    from tia_data_pipeline_spark.functions.text import portable_round_sql

    mins, sig_list, band_structs, match_frac = _minhash_sql_fragments(
        k, bands, seed, "sn", "so"
    )

    def side(alias: str, pred: str) -> str:
        return (
            f"sh_{alias} AS (SELECT {id_col} AS _id, unnest({shingles_sql}) AS s "
            f"  FROM {table} WHERE {pred}), "
            f"xs_{alias} AS (SELECT _id, {md5_int_sql('s')} AS x FROM sh_{alias}), "
            f"m_{alias} AS (SELECT _id, {mins} FROM xs_{alias} GROUP BY _id), "
            f"sig_{alias} AS (SELECT _id, {sig_list} AS sig FROM m_{alias}), "
            f"b_{alias} AS (SELECT _id, u.band AS band, u.key AS key FROM ("
            f"  SELECT _id, unnest([{band_structs}]) AS u FROM sig_{alias})), "
            f"ok_{alias} AS (SELECT b_{alias}.* FROM b_{alias} ANTI JOIN ("
            f"  SELECT band, key FROM b_{alias} GROUP BY band, key "
            f"  HAVING count(*) > {max_bucket}) hot_{alias} USING (band, key))"
        )

    # coalesce(…, false): a NULL shard_pred row is NOT in the shard, so
    # the Spark anti-join keeps it in history — NOT (NULL) would drop it
    hist_pred = f"({history_pred}) AND NOT coalesce(({shard_pred}), false)"
    return (
        f"WITH {side('o', hist_pred)}, {side('n', shard_pred)}, "
        "cand AS (SELECT DISTINCT n._id AS new_id, o._id AS dup_id "
        "  FROM ok_n n JOIN ok_o o ON n.band = o.band AND n.key = o.key "
        "  AND n._id <> o._id), "
        f"est AS (SELECT new_id, dup_id, {portable_round_sql(match_frac, 6)} AS est_jaccard "
        "  FROM cand JOIN sig_n sn ON sn._id = new_id "
        "  JOIN sig_o so ON so._id = dup_id) "
        f"SELECT new_id, dup_id, est_jaccard FROM est WHERE est_jaccard >= {threshold}"
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index form — SQL-expressible oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int = 20,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs via inverted index.

    Jaccard is defined over the *capped* shingle universe: shingles in
    more than ``max_df`` documents are stop-shingles and excluded from
    both the overlap AND the set sizes (same universe on both, or the
    ratio could exceed 1). The cap is load-bearing at scale — a shingle
    shared by d documents contributes d·(d-1)/2 candidate pairs, so
    frequent shingles are a quadratic bomb; near-dup clusters have
    *rare* shingles (df ≈ cluster size), which the cap keeps.

    Plan shape (one pass, no self-join): explode shingles → hash to
    64-bit ids (8-byte shuffle keys instead of strings; collision odds
    ~|shingles|²/2⁶⁵ — negligible) → group ids per shingle → expand
    pairs in-expression → count shared per pair → join per-doc sizes.
    """
    shared, doc_sizes = _shingle_overlap_frames(df, text_col, id_col, n=n, max_df=max_df)
    ja = (
        shared.join(doc_sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(doc_sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            portable_round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return ja


def _shingle_overlap_frames(
    df: DataFrame, text_col: str, id_col: str, *, n: int, max_df: int
) -> tuple[DataFrame, DataFrame]:
    """Shared skeleton of the exact shingle-overlap family
    (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`): explode
    distinct word n-grams → hash to 64-bit shuffle keys → cap hot
    shingles → expand pairs in-expression. Returns ``(shared,
    doc_sizes)``: per-pair shared-shingle counts (id_a < id_b) and the
    per-doc set size over the capped universe (df=1 shingles count)."""
    src = fan_out(df.select(F.col(id_col), F.col(text_col)))
    # xxhash64 shingle ids on an oracle-checked path is a RECORDED
    # exception to the portable-hashing rule: the oracle groups by the
    # raw shingle STRING, so parity holds unless two distinct shingles
    # collide in 64 bits (~|shingles|²/2^65 — ≲1e-9 at 100 TB shingle
    # counts). md5_int_sql's 2^28 space is NOT a drop-in here (real
    # collision rates at corpus vocabulary sizes); raw-string keys
    # would shuffle full shingles instead of 8-byte ids.
    sh_ids = src.select(
        F.col(id_col).alias("_id"), F.explode(word_shingles(F.col(text_col), n)).alias("s")
    ).select("_id", F.xxhash64("s").alias("sh"))
    # Hot-shingle cap, two-pass (the capped_bucket_members discipline,
    # inlined because doc_sizes needs the df=1 singletons the helper's
    # min_size would drop): count document frequency over 8-byte keys
    # first — a corpus-stop shingle partial-aggregates map-side and is
    # dropped BEFORE any member list exists — then semi-join survivors
    # back. The CAPPED incidence frame (`surv`) persists: it feeds the
    # pair-collect leg AND doc_sizes directly (no explode of member
    # lists), so the corpus tokenize+shingle+hash runs once per query
    # instead of once per consumer. Re-measured round 11 AFTER the
    # sort-shuffle-writer fix, which flipped the round-8 verdict
    # (recompute 1.30 s vs persist 1.94 s then; now persist 0.93-1.10 s
    # vs recompute 1.38-1.58 s, interleaved at sf0.1 — the old number
    # was dominated by the bypass writer's per-file-create cost on the
    # extra materialization exchange). Footprint note for 100 TB: surv
    # is the df-capped (id, 8-byte shingle) incidence table — a
    # fraction of text bytes and spillable (MEMORY_AND_DISK), i.e. the
    # same artifact both consumers would otherwise each re-derive by a
    # full corpus scan; CacheManager holds it until unpersist/
    # clearCache/session end, like the signature-table persists.
    dfreq = sh_ids.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    surv = sh_ids.join(
        dfreq.filter(F.col("_df") <= max_df).select("sh"), on="sh", how="left_semi"
    ).persist()
    grouped = surv.groupBy("sh").agg(F.collect_list("_id").alias("mem"))
    doc_sizes = surv.groupBy("_id").agg(F.count("*").alias("n_sh"))
    pair_arr = bucket_pairs(F.col("mem"))
    shared = (
        grouped.filter(F.size("mem") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    return shared, doc_sizes


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.6,
    max_df: int = 20,
) -> DataFrame:
    """ASYMMETRIC shingle-containment pairs: ``|A∩B| / |A|`` per side,
    kept when either side's containment clears the threshold. Catches
    the small-doc-inside-big-doc duplication Jaccard structurally
    misses — a 100-shingle quote fully contained in a 10k-shingle page
    has Jaccard ≈ 0.01 but containment 1.0 (the FineWeb/RefinedWeb
    sub-document contamination case).

    Same single-pass inverted-index plan as :func:`ngram_jaccard_pairs`
    (shared skeleton, no self-join); both directions come from ONE
    unordered pair count joined to both size sides. Returns
    ``(id_a, id_b, shared, cont_a, cont_b)`` with 6-dp portable
    rounding applied before the threshold compare (identical boundary
    behavior on both engines)."""
    shared, doc_sizes = _shingle_overlap_frames(df, text_col, id_col, n=n, max_df=max_df)
    out = (
        shared.join(doc_sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(doc_sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn("cont_a", portable_round(F.col("shared") / F.col("na"), 6))
        .withColumn("cont_b", portable_round(F.col("shared") / F.col("nb"), 6))
        .filter(F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold)
        .select("id_a", "id_b", F.col("shared").cast("bigint").alias("shared"), "cont_a", "cont_b")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash (portable md5-bit construction — see plans/llm.py for oracle)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def _md5_bit_expr(tok: str, j: int) -> str:
    """SQL fragment (valid in BOTH Spark SQL and DuckDB) for bit j of a
    token's 32-bit md5-derived hash: hex digit j//4, bit j%4."""
    digit = f"(instr('0123456789abcdef', substr(md5({tok}), {j // 4 + 1}, 1)) - 1)"
    return f"(CAST(floor({digit} / {1 << (j % 4)}) AS INT) % 2)"


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Classic construction: each distinct token votes ±1 on every bit of
    its hash; fingerprint bit j is 1 iff the vote sum is positive. The
    token hash is md5-derived so the DuckDB oracle can reproduce it
    bit-for-bit (``plans/llm.py::q_simhash``).

    No fan-out repartition here, unlike the shingle-based operators:
    the map side is only tokenize+explode (cheap; md5 is computed once
    per exploded row and its 32 bit extractions CSE), so the vote
    aggregate's own exchange provides the parallelism — the explicit
    repartition was measured ~1.4x pure cost at sf0.1 (interleaved A/B,
    same method as the `_docs(fan=...)` split).
    """
    toked = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    votes = [
        F.expr(f"sum(2 * {_md5_bit_expr('tok', j)} - 1)").alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    scored = toked.groupBy("_id").agg(*votes)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return scored.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_oracle_sql(table: str, text_tokens_sql: str, id_col: str) -> str:
    """DuckDB SQL mirroring :func:`simhash` (same md5 bit construction,
    same tie rule score>0)."""
    votes = ", ".join(
        f"sum(2 * {_md5_bit_expr('tok', j)} - 1) AS v{j}" for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        f"SELECT _id AS {id_col}, {fp} AS simhash FROM ("
        f"  SELECT _id, {votes} FROM ("
        f"    SELECT {id_col} AS _id, unnest(list_distinct({text_tokens_sql})) AS tok "
        f"    FROM {table}) GROUP BY _id)"
    )


# ---------------------------------------------------------------------------
# SimHash persisted index (incremental hamming-distance dedup serving)
# ---------------------------------------------------------------------------
# Completes the incremental-serving trio (MinHash: minhash_write_index
# above; embeddings: similarity.embedding_write_index): dedupe today's
# shard against a PERSISTED fingerprint index without rescanning
# history — the daily-increment semantics of the reference's
# comments_pipeline.py:33 applied to the SimHash tier.

# Wider fingerprint than the 32-bit q_simhash default: 48 bits splits
# into 4 × 12-bit bands, which GUARANTEES any pair within hamming
# distance 3 shares at least one exact band (pigeonhole: 4 differing
# bits cannot each land in a distinct band of 4 when only ≤3 differ),
# stays strictly positive in a BIGINT so the div/mod band extraction is
# portable to DuckDB, and is 2^16× more selective per band than 8-bit
# bands of the 32-bit form — at 100 TB the band bucket count (2^12 per
# band) is what keeps collision groups sub-quadratic.
SIMHASH_INDEX_BITS = 48
SIMHASH_INDEX_BANDS = 4
_SIMHASH_META_DIR = "_simhash_meta"


def _simhash_fp_frame(df: DataFrame, text_col: str, id_col: str, bits: int) -> DataFrame:
    """(_id, _fp) fingerprint frame, the index form of :func:`simhash`:
    same md5-bit vote construction widened to ``bits``, NULL ids
    excluded at the source (a NULL id would form one chimeric vote
    group AND break the anti-join idempotence of the index append —
    same precondition as :func:`minhash_signature_frame`).

    No fan-out repartition: the map side is bare tokenize+explode and
    the vote aggregate's own exchange provides the parallelism (the
    measured `_docs(fan=False)` rule; see :func:`simhash`)."""
    if not 1 <= bits <= 62:
        raise ValueError("bits must be in [1, 62] (BIGINT, sign bit untouched)")
    toked = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    votes = [
        F.expr(f"sum(2 * {_md5_bit_expr('tok', j)} - 1)").alias(f"v{j}")
        for j in range(bits)
    ]
    scored = toked.groupBy("_id").agg(*votes)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return scored.select("_id", fp.alias("_fp"))


def simhash_band_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bits: int = SIMHASH_INDEX_BITS,
    bands: int = SIMHASH_INDEX_BANDS,
    n_shards: int = 64,
) -> DataFrame:
    """Banded fingerprints: one ``(_id, _fp, band, bucket, bshard)`` row
    per (document, band); ``bucket`` is the band's bit slice (extracted
    by div/mod — portable, fingerprints are non-negative), ``bshard``
    a bounded shard of the bucket so (band, bshard) is a stable
    partition key. Equal (bits, bands, n_shards) ⇒ identical collision
    keys, which is what makes yesterday's index probeable today."""
    assert bits % bands == 0, "bits must divide into equal bands"
    r = bits // bands
    sig = _simhash_fp_frame(df, text_col, id_col, bits)
    return sig.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(_fp div {1 << (r * b)}) % {1 << r}").alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "_id", "_fp", "bb.band", "bb.bucket",
        F.pmod(F.col("bb.bucket"), F.lit(n_shards)).alias("bshard"),
    )


def simhash_write_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    *,
    bits: int = SIMHASH_INDEX_BITS,
    bands: int = SIMHASH_INDEX_BANDS,
    n_shards: int | None = None,
) -> None:
    """Materialize the SimHash fingerprint index, ``band=…/bshard=…``
    partitioned (the persisted-index serving pattern shared with
    :func:`minhash_write_index`): a shard's probe reads only the
    partitions its own buckets shard to. Rows are (_id, _fp, bucket) —
    8 bytes of fingerprint per (document, band), far lighter than the
    MinHash index's k·8-byte signatures. The one-row meta side table
    carries the hash family and ``schema_json`` so probes can read an
    EMPTY index (day-zero bootstrap) with an explicit schema."""
    if n_shards is None:
        # default: size the layout from the source relation's bytes
        # (guide §6 — round 11); explicit callers keep full control
        from tia_data_pipeline_spark.operators.scale import adaptive_index_shards

        n_shards = adaptive_index_shards(df, bands=bands)
    banded = simhash_band_frame(
        df, text_col, id_col, bits=bits, bands=bands, n_shards=n_shards
    )
    # one shuffle keyed by the partition columns: each task owns whole
    # (band, bshard) groups — one file per dir, not a sliver per task
    banded.repartition("band", "bshard").write.partitionBy("band", "bshard").mode(
        "overwrite"
    ).parquet(path)
    spark = df.sparkSession
    meta = [(int(bits), int(bands), int(n_shards), banded.schema.json())]
    spark.createDataFrame(
        meta, "bits int, bands int, n_shards int, schema_json string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{_SIMHASH_META_DIR}")


def simhash_index_meta(spark, path: str) -> dict:
    """Meta side table → dict (one row on the driver — control plane)."""
    row = spark.read.parquet(f"{path}/{_SIMHASH_META_DIR}").collect()[0]
    return {
        "bits": int(row["bits"]),
        "bands": int(row["bands"]),
        "n_shards": int(row["n_shards"]),
        "schema_json": row["schema_json"],
    }


def _check_band_guarantee(meta: dict, max_hamming: int) -> None:
    """Recall contract shared by the batch operator and the streaming
    loop: B bands guarantee collision only for pairs with hamming ≤
    B-1 (pigeonhole: B differing bits can occupy all B bands); a
    larger ``max_hamming`` would silently miss pairs — rebuild the
    index with more bands instead."""
    if max_hamming > meta["bands"] - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {meta['bands']}-band "
            f"guarantee (hamming <= {meta['bands'] - 1})"
        )


def simhash_dedup_incremental(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs of a NEW SHARD against the persisted SimHash
    index — no history rescan. Returns ``(new_id, dup_id, hamming)``
    with ``dup_id`` an indexed document and hamming ≤ ``max_hamming``.

    Plan: band the shard with the index's own (bits, bands, n_shards)
    family, prune the index scan to the shard's touched (band, bshard)
    partitions (ONE flat ``isin`` over the encoded combo — the shared
    :func:`_touched_partition_filter`), two-pass hot-bucket caps on
    BOTH sides, equi-join on (band, bucket), then the hamming verify
    ``bit_count(xor)`` on the two 8-byte fingerprints. A pair within
    the band guarantee can collide in SEVERAL bands, so the final
    dropDuplicates is genuinely load-bearing here (unlike the
    one-cell-per-vector cosine path). The index side anti-joins the
    shard's OWN ids, so the probe is replay-deterministic: identical
    output whether or not the shard was already appended.

    At 100 TB: the index scan reads only touched partitions; the join
    shuffles 8-byte fingerprints, never text; cost is sized by the
    shard, not by history.

    Cache lifecycle matches :func:`minhash_dedup_incremental` (held by
    the CacheManager): a DAILY loop uses
    :func:`simhash_dedup_incremental_scoped` or the streaming loop."""
    pairs, _ = _simhash_probe_parts(
        new_docs, index_path,
        text_col=text_col, id_col=id_col,
        max_hamming=max_hamming, max_bucket=max_bucket,
    )
    return pairs


def _simhash_probe_parts(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str,
    id_col: str,
    max_hamming: int,
    max_bucket: int,
) -> tuple[DataFrame, DataFrame]:
    """(pairs, persisted shard frame) — shared core of the lazy and
    scoped forms (the :func:`_incremental_probe_parts` twin)."""
    spark = new_docs.sparkSession
    meta = simhash_index_meta(spark, index_path)
    _check_band_guarantee(meta, max_hamming)
    # persist: consumed 3× (touched-partition collect, hot count, probe
    # join)
    new_banded = simhash_band_frame(
        new_docs, text_col, id_col,
        bits=meta["bits"], bands=meta["bands"], n_shards=meta["n_shards"],
    ).persist()
    pairs = _simhash_probe_pairs(
        new_banded, spark, index_path, meta,
        max_hamming=max_hamming, max_bucket=max_bucket,
    )
    return pairs, new_banded


@contextmanager
def simhash_dedup_incremental_scoped(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
):
    """:func:`simhash_dedup_incremental` with an EXACT cache lifecycle
    — consume the yielded pairs inside the scope; the shard's persisted
    fingerprint frame is released on every exit path (the
    :func:`minhash_dedup_incremental_scoped` twin)."""
    pairs, new_banded = _simhash_probe_parts(
        new_docs, index_path,
        text_col=text_col, id_col=id_col,
        max_hamming=max_hamming, max_bucket=max_bucket,
    )
    try:
        yield pairs
    finally:
        new_banded.unpersist()


def _simhash_probe_shared(
    new_banded: DataFrame, meta: dict, *, max_bucket: int
) -> tuple:
    """Shard-side probe artifacts that depend ONLY on the shard and
    the hash family — shareable across every same-family index dir the
    shard probes (the takedown lifecycle probes two: masked and
    compacted): the touched-partition predicate (one driver collect),
    the shard's distinct ids, and the capped probe side."""
    return (
        _touched_partition_filter(new_banded, meta["n_shards"]),
        new_banded.select("_id").distinct(),
        _bucket_capped(new_banded, max_bucket).select(
            "band", "bucket", F.col("_id").alias("new_id"), F.col("_fp").alias("fp_new")
        ),
    )


def _simhash_probe_pairs(
    new_banded: DataFrame,
    spark,
    index_path: str,
    meta: dict,
    *,
    max_hamming: int,
    max_bucket: int,
    shared: tuple | None = None,
) -> DataFrame:
    """Probe core shared by the batch operator and the streaming
    micro-batch loop (the SimHash twin of :func:`_probe_pairs`): banded
    shard frame → pruned index scan → per-side two-pass hot-bucket caps
    → ``bit_count(xor)`` hamming verify. The index side EXCLUDES the
    shard's own ids (anti-join), so re-probing an already-appended
    shard — including a foreachBatch replay that crashed between append
    and checkpoint commit — emits byte-identical pairs. Tombstoned ids
    (:func:`simhash_index_delete`) are masked off the index side
    BEFORE the caps, exactly as if compaction had already removed
    their rows. ``shared`` carries precomputed shard-side artifacts
    (:func:`_simhash_probe_shared`) when one shard probes several
    same-family dirs."""
    from tia_data_pipeline_spark.operators.scale import anti_join_index_tombstones

    pred, shard_ids, probe = shared or _simhash_probe_shared(
        new_banded, meta, max_bucket=max_bucket
    )
    idx = anti_join_index_tombstones(
        _read_index(spark, index_path, meta).filter(pred),
        index_path,
        index_schema_json=meta["schema_json"],
        id_col="_id",
    ).join(shard_ids, on="_id", how="left_anti")
    # two-pass hot-bucket caps, each side against its own count (a hot
    # bucket is boilerplate — history's on the index side, today's on
    # the shard side; it never reaches the join)
    hist = _bucket_capped(idx, max_bucket).select(
        "band", "bucket", F.col("_id").alias("dup_id"), F.col("_fp").alias("fp_old")
    )
    hamming = F.bit_count(F.col("fp_new").bitwiseXOR(F.col("fp_old"))).cast("int")
    return (
        probe.join(hist, ["band", "bucket"])
        .select("new_id", "dup_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["new_id", "dup_id"])
    )


def simhash_dedup_incremental_multi(
    new_docs: DataFrame,
    index_paths: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> list[DataFrame]:
    """One shard probed against SEVERAL same-family index dirs (the
    takedown lifecycle: a masked dir and its physically-compacted
    sibling must yield identical pairs) — the shard's fingerprint frame
    (the CPU-heavy leg), its capped probe side, its distinct-id frame,
    and the touched-partition driver collect are computed ONCE and
    shared by every probe, instead of once per dir (guide §2.4: two
    operations keyed the same way share one derivation). Returns one
    pairs frame per path, same order. All dirs must share the hash
    family — the banded frame is family-keyed, so a mismatch would
    probe with wrong buckets; it raises instead.

    Cache lifecycle matches :func:`simhash_dedup_incremental` (held by
    the CacheManager until unpersist/clearCache/session end)."""
    spark = new_docs.sparkSession
    metas = [simhash_index_meta(spark, p) for p in index_paths]
    fams = {(m["bits"], m["bands"], m["n_shards"]) for m in metas}
    if len(fams) != 1:
        raise ValueError(f"index dirs disagree on the hash family: {sorted(fams)}")
    meta = metas[0]
    _check_band_guarantee(meta, max_hamming)
    new_banded = simhash_band_frame(
        new_docs, text_col, id_col,
        bits=meta["bits"], bands=meta["bands"], n_shards=meta["n_shards"],
    ).persist()
    pred, shard_ids, probe = _simhash_probe_shared(
        new_banded, meta, max_bucket=max_bucket
    )
    # the capped probe side persists too: every probe leg consumes it,
    # and caching it keeps the cap's count-exchange out of every run
    probe = probe.persist()
    return [
        _simhash_probe_pairs(
            new_banded, spark, p, m,
            max_hamming=max_hamming, max_bucket=max_bucket,
            shared=(pred, shard_ids, probe),
        )
        for p, m in zip(index_paths, metas)
    ]


def _simhash_intra_pairs(
    new_banded: DataFrame, *, max_hamming: int, max_bucket: int
) -> DataFrame:
    """Duplicate pairs WITHIN one shard, canonical ``new_id < dup_id``
    — the explicit same-batch leg of the streaming loop (the SimHash
    twin of :func:`_intra_pairs`): the index probe can never see these
    (the shard's own ids are excluded from its index side), so without
    this leg a same-shard duplicate is lost forever. Depends only on
    the shard itself ⇒ replay-deterministic by construction."""
    capped = _bucket_capped(new_banded, max_bucket)
    a = capped.select(
        "band", "bucket", F.col("_id").alias("new_id"), F.col("_fp").alias("fp_new")
    )
    b = capped.select(
        "band", "bucket", F.col("_id").alias("dup_id"), F.col("_fp").alias("fp_old")
    )
    hamming = F.bit_count(F.col("fp_new").bitwiseXOR(F.col("fp_old"))).cast("int")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("new_id") < F.col("dup_id"))
        .select("new_id", "dup_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["new_id", "dup_id"])
    )


def simhash_index_append(
    new_docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append a shard's fingerprint rows — idempotent (twice ≡ once):
    already-present ``(_id, band)`` rows are skipped via an anti-join
    against the touched partitions only (a doc's rows live nowhere
    else — its (band, bshard) keys are a pure function of its text);
    row-level, so a retry after a hard kill inside the write commit
    appends exactly the missing band rows (see :func:`_append_delta`).
    ``_id`` is non-null by the fingerprint frame's precondition, so
    plain-equality anti-join semantics are exact."""
    spark = new_docs.sparkSession
    meta = simhash_index_meta(spark, index_path)
    new_banded = simhash_band_frame(
        new_docs, text_col, id_col,
        bits=meta["bits"], bands=meta["bands"], n_shards=meta["n_shards"],
    ).persist()  # consumed 2×; append is EAGER, so the lifecycle is exact
    try:
        _append_delta(new_banded, spark, index_path, meta)
    finally:
        new_banded.unpersist()


def simhash_index_delete(
    ids: DataFrame, index_path: str, *, id_col: str = "doc_id"
) -> None:
    """Tombstone documents out of the SimHash index — the SimHash twin
    of :func:`minhash_index_delete` (same semantics: masked from every
    probe immediately, physically removed at the next compact,
    idempotent, ids-only)."""
    from tia_data_pipeline_spark.operators.scale import append_index_tombstones

    meta = simhash_index_meta(ids.sparkSession, index_path)
    append_index_tombstones(
        ids.select(F.col(id_col).alias("_id")),
        index_path,
        index_schema_json=meta["schema_json"],
        id_col="_id",
    )


def simhash_index_compact(spark, path: str) -> dict:
    """One file per (band, bshard) partition — the SimHash twin of
    :func:`minhash_index_compact`. Applies pending tombstones."""
    from tia_data_pipeline_spark.operators.scale import compact_partitioned_index

    meta = simhash_index_meta(spark, path)
    return compact_partitioned_index(
        spark, path,
        partition_cols=("band", "bshard"),
        schema_json=meta["schema_json"],
        side_dirs=(_SIMHASH_META_DIR,),
        tombstones_id_col="_id",
    )


def simhash_index_stats(spark, path: str) -> dict:
    """Health census of the SimHash index — the SimHash twin of
    :func:`minhash_index_stats`."""
    from tia_data_pipeline_spark.operators.scale import partitioned_index_stats

    meta = simhash_index_meta(spark, path)
    return partitioned_index_stats(
        spark, path,
        partition_cols=("band", "bshard"),
        schema_json=meta["schema_json"],
        tombstones_id_col="_id",
    )


def simhash_incremental_oracle_sql(
    table: str,
    text_tokens_sql: str,
    id_col: str,
    *,
    history_pred: str,
    shard_pred: str,
    bits: int = SIMHASH_INDEX_BITS,
    bands: int = SIMHASH_INDEX_BANDS,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> str:
    """DuckDB SQL reproducing :func:`simhash_dedup_incremental` over an
    index built from ``table WHERE history_pred`` and a shard ``table
    WHERE shard_pred`` — same md5-bit votes, same div/mod band slices,
    same per-side hot-bucket caps, same ``bit_count(xor)`` verify. The
    persisted index is an execution strategy, not a semantics change,
    so the oracle states the plain two-relation form. DuckDB's
    ``bit_count`` returns TINYINT → cast to INT to match Spark; the
    cross-engine agreement of bit_count∘xor on non-negative BIGINTs is
    fuzz-pinned in tests/test_dedup.py.

    The history side states ``history_pred AND NOT (shard_pred)``,
    mirroring the Spark probe's anti-join of the shard's OWN ids off
    the index side (replay determinism): for overlapping predicates
    both engines now exclude the shard's documents from history BEFORE
    the hot-bucket caps — previously the oracle only dropped self-pairs
    and the forms agreed only for disjoint predicates (ADVICE r8).
    Both predicates must be deterministic row predicates on
    ``table``."""
    assert bits % bands == 0
    r = bits // bands
    votes = ", ".join(
        f"sum(2 * {_md5_bit_expr('tok', j)} - 1) AS v{j}" for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(bits)
    )
    divisors = ", ".join(f"({b}, {1 << (r * b)}::BIGINT)" for b in range(bands))

    def side(alias: str, pred: str) -> str:
        return (
            f"tok_{alias} AS (SELECT {id_col} AS _id, "
            f"  unnest(list_distinct({text_tokens_sql})) AS tok "
            f"  FROM {table} WHERE ({pred}) AND {id_col} IS NOT NULL), "
            f"v_{alias} AS (SELECT _id, {votes} FROM tok_{alias} GROUP BY _id), "
            f"fp_{alias} AS (SELECT _id, {fp} AS _fp FROM v_{alias}), "
            f"b_{alias} AS (SELECT _id, _fp, band, (_fp // divisor) % {1 << r} AS bucket "
            f"  FROM fp_{alias} CROSS JOIN (VALUES {divisors}) AS bd(band, divisor)), "
            f"ok_{alias} AS (SELECT b_{alias}.* FROM b_{alias} ANTI JOIN ("
            f"  SELECT band, bucket FROM b_{alias} GROUP BY band, bucket "
            f"  HAVING count(*) > {max_bucket}) h_{alias} USING (band, bucket))"
        )

    # coalesce(…, false): a NULL shard_pred row is NOT in the shard, so
    # the Spark anti-join keeps it in history — NOT (NULL) would drop it
    hist_pred = f"({history_pred}) AND NOT coalesce(({shard_pred}), false)"
    return (
        f"WITH {side('o', hist_pred)}, {side('n', shard_pred)} "
        "SELECT DISTINCT n._id AS new_id, o._id AS dup_id, "
        "  bit_count(xor(n._fp, o._fp))::INT AS hamming "
        "FROM ok_n n JOIN ok_o o ON n.band = o.band AND n.bucket = o.bucket "
        f"WHERE bit_count(xor(n._fp, o._fp)) <= {max_hamming} "
        "  AND n._id <> o._id"
    )


# ---------------------------------------------------------------------------
# Substring-level overlap (char k-mer mod-p sketch — alignment-independent)
# ---------------------------------------------------------------------------


def char_kmer_sketch(col: Column, *, k: int = 32, mod: int = 16) -> Column:
    """Sampled char k-mer hashes of a text column: hash EVERY k-char
    window, keep the ~1/mod whose hash ≡ 0 (mod mod), distinct.

    The mod-p selection is the load-bearing choice: a fixed stride
    would sample windows at positions ≡ 0 (mod s) *of each document*,
    so the same substring at different offsets in two documents could
    sample disjoint window sets and the overlap would vanish. Selecting
    by the window's own content hash is offset-invariant — a shared
    substring of length L contributes the same ~(L-k+1)/mod sampled
    k-mers to both documents no matter where it sits.

    Per-row cost is O(len) window hashes (the lambda touches only its
    index variable plus a raw attribute reference — no re-evaluated
    computed chain), so callers fan the scan out first, same rule as
    the word-shingle assemblies. Documents shorter than ``k`` sketch to
    [].
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if mod < 1:
        raise ValueError("mod must be >= 1")
    n_pos = F.length(col) - (k - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), n_pos), lambda i: F.xxhash64(col.substr(i, F.lit(k)))
    )
    sampled = F.array_distinct(
        F.filter(hashes, lambda h: F.pmod(h, F.lit(mod)) == 0)
    )
    return F.when(n_pos < 1, F.array().cast("array<bigint>")).otherwise(sampled)


def substring_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 32,
    mod: int = 16,
    max_df: int = 20,
    min_shared: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Document pairs sharing long verbatim substrings — the
    substring-level contamination/boilerplate signal that word-shingle
    Jaccard misses when the shared block is a small fraction of each
    document (quote plagiarism, license blocks, copy-pasted passages).

    Evidence is counted in sampled char k-mers: a shared verbatim run
    of length L yields ~(L-k+1)/mod shared samples, so ``min_shared``
    sets the effective minimum run length (≈ k + mod·min_shared).
    Same inverted-index shape as :func:`ngram_jaccard_pairs` — explode
    the sketch, cap hot k-mers (mass-duplicated boilerplate belongs to
    the cheap digest pipeline), expand pairs in-expression, never a
    corpus self-join. Returns (id_a, id_b, shared).

    ``portable=True`` swaps the k-mer hash xxhash64 → md5-digit
    (:func:`md5_int_sql`, the q_fuzzy_dedup discipline), making the
    pair set reproducible in DuckDB for the oracle-checked contract
    query. Pipeline shape differs mechanically: positions explode to
    rows BEFORE hashing (a plain projection gets codegen CSE across
    the 7 digit extractions, which a higher-order lambda never would —
    7 md5 calls per k-mer vs 1), the 1/mod sampling filter runs
    before anything shuffles, and ``collect_set`` dedupes per-doc
    repeats inside the bucket aggregate instead of a per-doc
    ``array_distinct``, so both paths reach the wire with the same
    sampled-distinct volume. xxhash64 stays the production default
    (JVM-native, no md5 per position)."""
    src = fan_out(df.select(F.col(id_col), F.col(text_col)))
    if portable:
        n_pos = F.length(F.col(text_col)) - (k - 1)
        pos = src.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_t"),
            F.explode(
                F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("_i"),
        )
        hs = (
            pos.select(
                "_id", F.substring(F.col("_t"), F.col("_i"), F.lit(k)).alias("_km")
            )
            .select("_id", F.expr(md5_int_sql("_km")).alias("h"))
            .filter(F.pmod(F.col("h"), F.lit(mod)) == 0)
        )
        # The two-pass cap consumes hs twice (count + collect legs), and
        # the md5-per-position hash is the dominant cost of this path —
        # persist the NARROW (h, _id) frame (16 bytes/sample, 1/mod of
        # the k-mer stream) so the hash computes once; the q_triangles
        # persist discipline. Cache lifecycle: CacheManager holds it
        # until unpersist or session end (per-process driver/bench
        # sessions discard at exit; MEMORY_AND_DISK evicts under
        # pressure).
        # Measured 3.0 s → recomputed vs persisted at sf0.1.
        hs = hs.persist()
        grouped = capped_bucket_members(hs, "h", "_id", max_size=max_df, distinct=True)
    else:
        km = src.select(
            F.col(id_col).alias("_id"),
            F.explode(char_kmer_sketch(F.col(text_col), k=k, mod=mod)).alias("h"),
        )
        grouped = capped_bucket_members(km, "h", "_id", max_size=max_df)
    pair_arr = bucket_pairs(F.col("mem"))
    return (
        grouped.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").cast("bigint").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 32,
    mod: int = 16,
    max_df: int = 20,
    max_gap: int | None = None,
    min_anchors: int = 2,
    portable: bool = False,
) -> DataFrame:
    """WHERE the duplication lives, not just who pairs with whom: the
    span form of exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — training pipelines
    CUT duplicated byte ranges rather than drop whole documents).
    Returns ``(id_a, id_b, a_start, b_start, span_len, n_anchors)``:
    1-based char offsets of an aligned verbatim run in both documents.

    Construction (bounded, SQL-expressible — no suffix array needed):

    1. content-defined anchors: every position whose k-char window
       hash ≡ 0 (mod ``mod``) — offset-invariant, the
       :func:`char_kmer_sketch` argument, but POSITIONS are kept;
    2. hot-anchor cap, two-pass (a boilerplate k-mer in thousands of
       docs is the digest pipeline's job, and uncapped it is a
       quadratic bomb);
    3. anchor matches across documents on the k-mer hash, expanded
       in-expression per bucket (never a corpus self-join);
    4. DIAGONAL merge: matches of one verbatim run all satisfy
       ``pos_b − pos_a = const``; within a (pair, diagonal), runs are
       sessionized on anchor gaps ≤ ``max_gap`` (anchors in a true run
       are ~``mod`` chars apart; the default gap 8·mod splits a run
       with probability ≈ e⁻⁸ per anchor) and each run aggregates to
       one span with ≥ ``min_anchors`` anchors — span_len counts from
       the first anchor to the end of the last anchor's window, so the
       minimum reportable span is ≈ k + mod.

    Scale shape: anchors are ~len/mod rows of (8-byte hash, id, int)
    — the only corpus-sized relation; the match stream is bounded by
    the banding cap exactly like :func:`substring_overlap_pairs`; the
    sessionize is ONE shuffle on (id_a, id_b, diag) serving both
    window functions and the span aggregate. ``portable=True`` uses
    the md5-digit hash so spans hash-match the DuckDB oracle
    (plans/llm.py::q_dup_spans)."""
    if max_gap is None:
        max_gap = 8 * mod
    src = fan_out(df.select(F.col(id_col), F.col(text_col)))
    n_pos = F.length(F.col(text_col)) - (k - 1)
    pos = src.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.explode(
            F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("_i"),
    ).select("_id", "_i", F.substring(F.col("_t"), F.col("_i"), F.lit(k)).alias("_km"))
    h = F.expr(md5_int_sql("_km")) if portable else F.xxhash64("_km")
    anchors = (
        pos.select("_id", "_i", h.alias("h"))
        .filter(F.pmod(F.col("h"), F.lit(mod)) == 0)
        # persist the NARROW anchor frame: the two-pass cap consumes it
        # twice and the per-position hash dominates (the
        # substring_overlap_pairs discipline — md5 3.0→0.79 s at sf0.1)
        .persist()
    )
    members = capped_bucket_members(
        anchors, "h", F.struct("_id", "_i"), max_size=max_df
    )
    mt = (
        members.select(F.explode(bucket_pairs(F.col("mem"), order_key="_id")).alias("p"))
        # strict inequality drops same-document matches (self-repetition
        # is not cross-dup) and NULL-id rows, matching the oracle's
        # a._id < b._id join predicate
        .filter(F.col("p.a._id") < F.col("p.b._id"))
        .select(
            F.col("p.a._id").alias("id_a"),
            F.col("p.b._id").alias("id_b"),
            F.col("p.a._i").alias("pos_a"),
            F.col("p.b._i").alias("pos_b"),
            (F.col("p.b._i") - F.col("p.a._i")).alias("diag"),
        )
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    brk = F.when(
        (F.col("pos_a") - F.lag("pos_a").over(w)) > max_gap, F.lit(1)
    ).otherwise(F.lit(0))
    runs = mt.withColumn("brk", brk).withColumn(
        "run", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("id_a", "id_b", "diag", "run")
        .agg(
            # bigint: DuckDB range() yields BIGINT positions, so the
            # hash-checked schema states 64-bit offsets on both sides
            F.min("pos_a").cast("bigint").alias("a_start"),
            F.min("pos_b").cast("bigint").alias("b_start"),
            (F.max("pos_a") + F.lit(k) - F.min("pos_a")).cast("bigint").alias("span_len"),
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        )
        .filter(F.col("n_anchors") >= min_anchors)
        .select("id_a", "id_b", "a_start", "b_start", "span_len", "n_anchors")
    )


def cut_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 32,
    mod: int = 16,
    max_df: int = 20,
    max_gap: int | None = None,
    min_anchors: int = 2,
    portable: bool = False,
) -> DataFrame:
    """APPLY the duplicated spans: rebuild each affected document with
    its duplicated byte ranges removed — the surgery step of
    cut-not-drop dedup (:func:`duplicated_spans` finds WHERE the
    duplication lives; this removes it). Keep-first policy: a span is
    cut from the pair's LATER document (``id_b`` — ids are canonical
    ``id_a < id_b``), so the earliest copy of every duplicated run
    survives intact and no run is lost from the corpus.

    Returns one row per AFFECTED document: ``(doc_id, n_spans,
    cut_chars, kept_len, kept_hash)`` where n_spans counts MERGED
    cut intervals (overlapping spans from different pairs coalesce),
    cut_chars the characters removed, and kept_hash = md5 of the
    rebuilt text — byte-exact evidence of the surgery, reproducible in
    the DuckDB oracle (:func:`span_cut_oracle_sql`).

    Construction after the span extractor: (1) classic interval merge
    per doc — a window running-max of span ends marks group breaks,
    one sessionize shuffle on doc_id; (2) the kept text is assembled
    from the COMPLEMENT pieces (lag(end) → piece before each interval,
    plus the tail), concatenated in span order via a sorted collect of
    the per-interval pieces — intervals per doc are bounded by the
    span extractor's caps, so the collected arrays are small by
    construction. Untouched documents emit nothing (the caller unions
    them back if a full corpus rewrite is wanted)."""
    spans = duplicated_spans(
        df, text_col, id_col, k=k, mod=mod, max_df=max_df,
        max_gap=max_gap, min_anchors=min_anchors, portable=portable,
    )
    # DISTINCT before the merge windows: two pairs can contribute the
    # IDENTICAL (s, e) interval to one doc (e.g. the same duplicated
    # block shared with two earlier docs), and tied (s, e) sort keys
    # make the ROWS-frame running max evaluation-order-dependent —
    # the max and sum windows can then disagree on which tied row is
    # "first" and split one interval into two groups (found by the
    # sf0.001 parity check, doc with two co-located span sources).
    # After distinct, (s, e) is unique per doc and the order is total.
    cuts = spans.select(
        F.col("id_b").alias("_doc"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("span_len")).alias("e"),
    ).distinct()
    # interval merge: break a new group when this span starts past the
    # running max end of everything before it (ties on s ordered by e
    # for determinism; touching intervals s == prev_e stay merged)
    w = Window.partitionBy("_doc").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(0)), F.lit(1)).otherwise(
        F.lit(0)
    )
    merged = (
        cuts.withColumn("brk", brk)
        .withColumn(
            "grp", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("_doc", "grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    # complement pieces: text before each merged interval (from the
    # previous interval's end), plus the tail after the last interval
    w2 = Window.partitionBy("_doc").orderBy("s")
    ps = F.coalesce(F.lag("e").over(w2), F.lit(1))
    pieces = (
        merged.join(
            df.select(F.col(id_col).alias("_doc"), F.col(text_col).alias("_t")),
            "_doc",
        )
        .withColumn("ps", ps)
        .withColumn(
            "piece",
            F.expr("substring(_t, cast(ps as int), cast(s - ps as int))"),
        )
    )
    agg = pieces.groupBy("_doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("cut_chars"),
        F.min("_t").alias("_t"),
        F.max("e").alias("_last_e"),
        # sorted-by-s reassembly: collect_list order is undefined, the
        # array_sort on (s, piece) structs restores span order
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "piece"))),
                lambda x: x["piece"],
            ),
            "",
        ).alias("_head"),
    )
    kept = F.concat(
        F.col("_head"), F.expr("substring(_t, cast(_last_e as int))")
    )
    return agg.select(
        F.col("_doc").alias(id_col),
        "n_spans",
        "cut_chars",
        F.length(kept).cast("bigint").alias("kept_len"),
        F.md5(F.encode(kept, "UTF-8")).alias("kept_hash"),
    )


def span_cut_oracle_sql(
    table: str,
    id_col: str,
    text_col: str = "text",
    *,
    k: int = 32,
    mod: int = 16,
    max_df: int = 20,
    max_gap: int | None = None,
    min_anchors: int = 2,
) -> str:
    """DuckDB SQL reproducing :func:`cut_duplicated_spans` with
    ``portable=True`` byte-for-byte: the span CTE is the shared
    :func:`duplicated_spans_oracle_sql` text, then the same interval
    merge (running-max window), the same complement-piece assembly
    (``string_agg`` ordered by span start ≡ the sorted collect), and
    ``md5`` over the identical rebuilt string."""
    spans_sql = duplicated_spans_oracle_sql(
        table, id_col, text_col, k=k, mod=mod, max_df=max_df,
        max_gap=max_gap, min_anchors=min_anchors,
    )
    return (
        f"WITH spans AS ({spans_sql}), "
        "cuts AS (SELECT DISTINCT id_b AS _doc, b_start AS s, "
        "  b_start + span_len AS e FROM spans), "
        "m0 AS (SELECT *, CASE WHEN s > coalesce(max(e) OVER ("
        "    PARTITION BY _doc ORDER BY s, e "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "  THEN 1 ELSE 0 END AS brk FROM cuts), "
        "m1 AS (SELECT *, sum(brk) OVER (PARTITION BY _doc ORDER BY s, e "
        "  ROWS UNBOUNDED PRECEDING) AS grp FROM m0), "
        "merged AS (SELECT _doc, min(s) AS s, max(e) AS e FROM m1 "
        "  GROUP BY _doc, grp), "
        "p AS (SELECT _doc, s, e, coalesce(lag(e) OVER ("
        "  PARTITION BY _doc ORDER BY s), 1) AS ps FROM merged), "
        f"pieces AS (SELECT p._doc, s, e, d.{text_col} AS _t, "
        f"  substr(d.{text_col}, ps::INT, (s - ps)::INT) AS piece "
        f"  FROM p JOIN {table} d ON p._doc = d.{id_col}), "
        "agg AS (SELECT _doc, count(*)::BIGINT AS n_spans, "
        "  sum(e - s)::BIGINT AS cut_chars, min(_t) AS _t, "
        "  max(e) AS _last_e, string_agg(piece, '' ORDER BY s) AS _head "
        "  FROM pieces GROUP BY _doc) "
        f"SELECT _doc AS {id_col}, n_spans, cut_chars, "
        "  length(_head || substr(_t, _last_e::INT))::BIGINT AS kept_len, "
        "  md5(_head || substr(_t, _last_e::INT)) AS kept_hash FROM agg"
    )


def duplicated_spans_oracle_sql(
    table: str,
    id_col: str,
    text_col: str = "text",
    *,
    k: int = 32,
    mod: int = 16,
    max_df: int = 20,
    max_gap: int | None = None,
    min_anchors: int = 2,
) -> str:
    """DuckDB SQL reproducing :func:`duplicated_spans` with
    ``portable=True`` value-for-value: same md5-digit window hash, same
    mod sampling, same row-count bucket cap, same diagonal sessionize
    (lag/gap/sum windows), same span aggregation."""
    if max_gap is None:
        max_gap = 8 * mod
    md5i = md5_int_sql(f"substr({text_col}, i, {k})")
    return (
        f"WITH pos AS (SELECT {id_col} AS _id, {text_col}, "
        f"  unnest(range(1, greatest(length({text_col}) - {k - 1}, 0) + 1)) AS i "
        f"  FROM {table}), "
        f"anch AS (SELECT _id, i, h FROM ("
        f"  SELECT _id, i, {md5i} AS h FROM pos) WHERE h % {mod} = 0), "
        f"ok AS (SELECT anch.* FROM anch SEMI JOIN ("
        f"  SELECT h FROM anch GROUP BY h HAVING count(*) BETWEEN 2 AND {max_df}"
        f") kept USING (h)), "
        "mt AS (SELECT a._id AS id_a, b._id AS id_b, a.i AS pos_a, b.i AS pos_b, "
        "    b.i - a.i AS diag "
        "  FROM ok a JOIN ok b ON a.h = b.h AND a._id < b._id), "
        f"s AS (SELECT *, CASE WHEN pos_a - lag(pos_a) OVER "
        f"    (PARTITION BY id_a, id_b, diag ORDER BY pos_a) > {max_gap} "
        "    THEN 1 ELSE 0 END AS brk FROM mt), "
        "r AS (SELECT *, sum(brk) OVER (PARTITION BY id_a, id_b, diag "
        "    ORDER BY pos_a ROWS UNBOUNDED PRECEDING) AS run FROM s) "
        "SELECT id_a, id_b, min(pos_a) AS a_start, min(pos_b) AS b_start, "
        f"  (max(pos_a) + {k} - min(pos_a)) AS span_len, "
        "  count(*)::BIGINT AS n_anchors "
        "FROM r GROUP BY id_a, id_b, diag, run "
        f"HAVING count(*) >= {min_anchors}"
    )
