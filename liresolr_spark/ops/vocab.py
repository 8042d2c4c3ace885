"""Visual-word vocabulary (k-means) + IVF approximate nearest neighbor.

The reference maps SURF descriptors to a k-means "visual word" vocabulary
(clusters-surf.dat) and retrieves by querying those words as text
(ref: SolrSurfFeatureHistogramBuilder.java:6-24 builds the vocabulary;
SimilarRequestHandler.java:123-148 maps descriptors -> words -> BM25 text
query). SURVEY A8. The same structure is the classic IVF index for
embedding ANN: centroids = vocabulary, a vector's cell = its word, querying
probes the nprobe nearest cells then scores exactly inside them — the
two-phase candidates->exact shape again (ref: LireRequestHandler.java:458
candidates, :464-491 exact re-rank).

Spark-first: vocabulary trained with pyspark.ml KMeans (seeded,
distributed); assignment is a vectorized Arrow pass (one numpy matmul per
batch against the broadcast centroid matrix — no per-row Python); the IVF
probe is a partition-prunable equi-filter on the word column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from liresolr_spark.ops.similarity import cosine_topk


def train_visual_words(
    emb: DataFrame, k: int, seed: int = 42,
    vec_col: str = "embedding", max_iter: int = 20,
) -> np.ndarray:
    """Train the vocabulary: k-means over the embedding column. Returns the
    (k, dim) centroid matrix (the clusters-surf.dat analog — small, lives
    on the driver / in a broadcast, versioned alongside the index)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def assign_visual_words(
    emb: DataFrame, centers: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, word, dist): nearest-centroid assignment, vectorized — one
    numpy distance matrix per Arrow batch against the broadcast centroids
    (the descriptor->visual-word mapping, SimilarRequestHandler.java:131-142)."""
    spark = emb.sparkSession
    b_centers = spark.sparkContext.broadcast(centers.astype(np.float64))

    src = emb.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))

    def assign(batches):
        C = b_centers.value                      # (k, d)
        c_sq = (C * C).sum(axis=1)               # (k,)
        for pdf in batches:
            X = np.stack(pdf["v"].values)        # (n, d)
            # squared L2 via the expansion trick; argmin per row
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
            word = d2.argmin(axis=1)
            yield pd.DataFrame({
                "id": pdf["id"],
                "word": word.astype(np.int32),
                "dist": np.sqrt(np.maximum(d2[np.arange(len(word)), word], 0.0)),
            })

    return src.mapInPandas(assign, schema="id long, word int, dist double")


def ivf_topk(
    emb: DataFrame, centers: np.ndarray, query_vec: list[float], k: int,
    nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the nprobe centroids nearest the query, restrict the
    scan to vectors assigned to those cells, exact cosine top-k within.

    nprobe = num_centroids degenerates to the exact brute-force scan
    (property-tested); at scale the assignment is precomputed and the table
    is written partitioned by `word`, so the probe filter becomes partition
    pruning — only nprobe/k of the corpus is read."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centers - q[None, :]) ** 2).sum(axis=1)
    probes = [int(w) for w in np.argsort(d2)[:nprobe]]
    words = assign_visual_words(emb, centers, id_col, vec_col)
    cand_ids = words.filter(F.col("word").isin(probes)).select("id")
    cand = emb.join(
        cand_ids.withColumnRenamed("id", id_col).hint("broadcast"), id_col)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
