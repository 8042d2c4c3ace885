"""Visual-word vocabulary + IVF ANN (SURVEY A8 / the ANN scale path).

Safe-approximation property: IVF probing ALL cells must equal the exact
brute-force cosine top-k (same guarantee style as WAND-vs-exhaustive);
assignment must be the true nearest centroid (numpy cross-check).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [(int(i), rng.standard_normal(16).astype(float).tolist())
            for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def centers(spark, emb):
    from liresolr_spark.ops.vocab import train_visual_words

    c = train_visual_words(emb, k=6, seed=42)
    assert c.shape == (6, 16)
    return c


def test_assignment_is_true_nearest_centroid(spark, emb, centers):
    from liresolr_spark.ops.vocab import assign_visual_words

    got = {r["id"]: (r["word"], r["dist"])
           for r in assign_visual_words(emb, centers).collect()}
    rows = emb.collect()
    for r in rows:
        x = np.array(r["embedding"])
        d = np.sqrt(((centers - x[None, :]) ** 2).sum(axis=1))
        want_w = int(d.argmin())
        w, dist = got[r["vec_id"]]
        assert w == want_w, (r["vec_id"], w, want_w)
        assert abs(dist - d[want_w]) < 1e-9


def test_ivf_all_probes_equals_bruteforce(spark, emb, centers):
    from liresolr_spark.ops.similarity import cosine_topk
    from liresolr_spark.ops.vocab import ivf_topk

    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    want = [(r["id"], r["cosine"]) for r in cosine_topk(emb, q, 15).collect()]
    got = [(r["id"], r["cosine"])
           for r in ivf_topk(emb, centers, q, 15, nprobe=len(centers)).collect()]
    assert got == want


def test_ivf_probe_subset_is_recall_bounded(spark, emb, centers):
    """nprobe=1 must return the query's own cell-mates, all present in the
    exact scoring of that candidate set (sanity of the probe filter)."""
    from liresolr_spark.ops.vocab import assign_visual_words, ivf_topk

    q_row = emb.filter(F.col("vec_id") == 3).first()
    q = q_row["embedding"]
    got = ivf_topk(emb, centers, q, 10, nprobe=1).collect()
    assert 0 < len(got) <= 10
    words = {r["id"]: r["word"]
             for r in assign_visual_words(emb, centers).collect()}
    qcell = words[3]
    for r in got:
        assert words[r["id"]] == qcell


def test_ivf_build_query_matches_adhoc_and_prunes(spark, emb, centers,
                                                  tmp_path_factory):
    """The materialized build/query split must return exactly what the
    ad-hoc in-plan variant returns (same centroids, same nprobe), and the
    probe must reach the scan as a partition filter on `word` — the point
    of writing the table word-partitioned."""
    from liresolr_spark.ops.vocab import ivf_build, ivf_query, ivf_topk

    d = str(tmp_path_factory.mktemp("ivf")) + "/table"
    ivf_build(emb, centers, d)
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    for nprobe in (1, 2, len(centers)):
        want = [(r["id"], round(r["cosine"], 9))
                for r in ivf_topk(emb, centers, q, 12, nprobe=nprobe).collect()]
        got_df = ivf_query(spark, d, centers, q, 12, nprobe=nprobe)
        got = [(r["id"], round(r["cosine"], 9)) for r in got_df.collect()]
        assert got == want, nprobe
    plan = ivf_query(spark, d, centers, q, 5, nprobe=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "word" in plan
